"""QR payload decoding (vision/qr_decode.py, VERDICT r4 #9): encoder/
decoder roundtrips at the module level, Reed-Solomon damage recovery,
and the full camera-frame path through the finder detector — the
string the cortex speaks must carry the payload.

The encoder shares every table with the decoder (GF arithmetic, block
structure, masks, format placement), so these roundtrips pin the whole
chain's internal consistency; conformance against external codes is a
first-contact check (the encoder doubles as the debugging aid then).
"""

import numpy as np
import pytest

from trackiellm_tpu.vision import qr_decode as QD
from trackiellm_tpu.vision.qr import QRFinderDetector, detect_qr


class TestReedSolomon:
    def test_encode_then_correct_roundtrip(self):
        rng = np.random.default_rng(0)
        data = list(rng.integers(0, 256, 19))
        ecc = QD.rs_encode(data, 7)
        assert QD.rs_correct(data + ecc, 7) == data

    def test_corrects_errors_up_to_capacity(self):
        rng = np.random.default_rng(1)
        data = list(rng.integers(0, 256, 16))
        block = data + QD.rs_encode(data, 10)
        for pos, delta in ((2, 0x55), (9, 0xA1), (20, 0x03),
                           (13, 0xFF), (0, 0x80)):
            block[pos] ^= delta          # 5 errors = 10//2 capacity
        assert QD.rs_correct(list(block), 10) == data

    def test_too_many_errors_raises(self):
        rng = np.random.default_rng(2)
        data = list(rng.integers(0, 256, 19))
        block = data + QD.rs_encode(data, 7)
        bad = list(block)
        for pos in (0, 3, 6, 9, 12):     # 5 > 7//2
            bad[pos] ^= 0x5A
        with pytest.raises(ValueError):
            got = QD.rs_correct(bad, 7)
            # An RS decoder can mis-correct past capacity into a
            # DIFFERENT valid codeword; either a raise or a wrong
            # result is acceptable — but silently returning the
            # original data would mean the errors were ignored.
            assert got != data
            raise ValueError("mis-corrected (acceptable)")


class TestModuleRoundtrip:
    @pytest.mark.parametrize("version,level,mask", [
        (1, 0, 0), (1, 3, 5), (2, 0, 2), (2, 1, 7), (3, 2, 3),
        (4, 1, 1), (5, 2, 4), (6, 0, 6),
    ])
    def test_roundtrip(self, version, level, mask):
        # v1/H holds only 9 data codewords; size the payload to fit.
        text = "SALA 3" if (version, level) == (1, 3) \
            else "RUA AUGUSTA 123"
        mods = QD.encode_qr(text, version=version, level=level,
                            mask=mask)
        assert QD.decode_modules(mods) == text

    def test_numeric_and_byte_modes(self):
        assert QD.decode_modules(QD.encode_qr("0123456789",
                                              version=1)) == \
            "0123456789"
        txt = "olá, mundo!"  # utf-8 byte mode
        assert QD.decode_modules(QD.encode_qr(txt, version=2)) == txt

    def test_damaged_modules_recover_via_rs(self):
        text = "HELLO WORLD"
        mods = QD.encode_qr(text, version=2, level=2, mask=1)
        rng = np.random.default_rng(3)
        func = QD._function_mask(2)
        flipped = 0
        m2 = mods.copy()
        # 12 random module flips touch <= 12 of the 44 codewords;
        # the v2/Q single block corrects 11 — deterministic under
        # this seed, verified to land within capacity.
        while flipped < 12:
            r, c = rng.integers(0, mods.shape[0], 2)
            if func[r, c]:
                continue
            m2[r, c] = ~m2[r, c]
            flipped += 1
        assert QD.decode_modules(m2) == text

    def test_unsupported_size_raises(self):
        with pytest.raises(ValueError):
            QD.decode_modules(np.zeros((57, 57), bool))  # v10


class TestFramePath:
    def _frame(self, text, version=2, level=0, mask=0, module_px=6):
        img = QD.render_qr(QD.encode_qr(text, version=version,
                                        level=level, mask=mask),
                           module_px=module_px)
        return img

    def test_detect_then_decode(self):
        text = "PONTO DE ONIBUS 4512"
        img = self._frame(text)
        cands = detect_qr(img)
        assert len(cands) == 1
        assert QD.decode_qr_payload(img, cands[0]) == text

    def test_detector_string_carries_payload(self):
        text = "SALA 301"
        img = self._frame(text, version=1, level=1, mask=3)
        out = QRFinderDetector()(img)
        assert len(out) == 1
        assert out[0].endswith(":" + text), out

    def test_detection_survives_undecodable(self):
        """Heavy damage: the candidate must still be REPORTED
        (detection-only string), never dropped."""
        text = "QUALQUER COISA"
        img = self._frame(text).astype(np.float32)
        rng = np.random.default_rng(5)
        # Blank out the central data region (EC cannot recover this)
        # while keeping the three finder patterns intact.
        h, w = img.shape
        img[h // 3: 2 * h // 3, w // 3: 2 * w // 3] = 255.0
        img += rng.standard_normal(img.shape) * 4
        cands = detect_qr(img)
        if not cands:
            pytest.skip("detector lost the damaged code entirely")
        out = QRFinderDetector()(img)
        assert out and all(o.startswith("qr_code@") for o in out)

    def test_offset_position_decodes(self):
        text = "987654"
        small = self._frame(text, version=1)
        canvas = np.full((480, 640), 220, np.uint8)
        canvas[210:210 + small.shape[0], 400:400 + small.shape[1]] = \
            small
        cands = detect_qr(canvas)
        assert len(cands) == 1
        assert QD.decode_qr_payload(canvas, cands[0]) == text
