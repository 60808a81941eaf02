"""QR finder-pattern detection (vision/qr.py) — the concrete
barcode_fn filling the reference's QR/barcode hook surface
(tk_text_recognition.cpp:103-104, detection-only)."""

import numpy as np

from trackiellm_tpu.vision import qr

FINDER = np.array([
    [1, 1, 1, 1, 1, 1, 1],
    [1, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 1, 1, 0, 1],
    [1, 0, 1, 1, 1, 0, 1],
    [1, 0, 1, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 1],
    [1, 1, 1, 1, 1, 1, 1],
], np.float32)


def _draw_finder(img, y, x, module):
    pat = np.kron(FINDER, np.ones((module, module), np.float32))
    img[y:y + pat.shape[0], x:x + pat.shape[1]] = 1.0 - pat


def _qr_image(size=240, module=6):
    """White frame with three finder patterns in QR-corner layout."""
    img = np.ones((size, size), np.float32)
    span = 7 * module
    off = 30
    _draw_finder(img, off, off, module)
    _draw_finder(img, off, size - off - span, module)
    _draw_finder(img, size - off - span, off, module)
    return img


class TestFinderPatterns:
    def test_three_patterns_found(self):
        img = _qr_image()
        pats = qr.detect_finder_patterns(img)
        assert len(pats) == 3
        centers = sorted((round(p["x"]), round(p["y"])) for p in pats)
        # Center of a 7-module pattern at offset 30, module 6: 30+21=51.
        span = 7 * 6
        want = sorted([(51, 51), (51, 240 - 30 - span + 21),
                       (240 - 30 - span + 21, 51)])
        for (gx, gy), (wx, wy) in zip(centers, want):
            assert abs(gx - wx) <= 4 and abs(gy - wy) <= 4

    def test_blank_and_noise_are_clean(self):
        assert qr.detect_finder_patterns(
            np.ones((120, 120), np.float32)) == []
        noise = np.random.RandomState(0).rand(120, 120)
        assert len(qr.detect_qr(noise)) == 0

    def test_uint8_and_rgb_inputs(self):
        img = (_qr_image() * 255).astype(np.uint8)
        assert len(qr.detect_finder_patterns(img)) == 3
        rgb = np.stack([_qr_image()] * 3, axis=-1)
        assert len(qr.detect_finder_patterns(rgb)) == 3


class TestQRGrouping:
    def test_qr_bbox_covers_patterns(self):
        img = _qr_image()
        codes = qr.detect_qr(img)
        assert len(codes) == 1
        x0, y0, x1, y1 = codes[0]["bbox"]
        for cx, cy in codes[0]["centers"]:
            assert x0 <= cx <= x1 and y0 <= cy <= y1
        assert len(codes[0]["centers"]) == 3

    def test_two_patterns_do_not_group(self):
        img = np.ones((200, 200), np.float32)
        _draw_finder(img, 20, 20, 6)
        _draw_finder(img, 20, 130, 6)
        assert qr.detect_qr(img) == []


class TestPipelineHook:
    def test_barcode_fn_surface(self):
        det = qr.QRFinderDetector()
        out = det(_qr_image())
        assert len(out) == 1 and out[0].startswith("qr_code@[")

    def test_pipeline_reports_barcodes(self):
        """End to end through VisionPipeline: OCR flag + barcode_fn ->
        VisionResult.barcodes carries the detection."""
        from trackiellm_tpu.vision.pipeline import (AnalysisFlags,
                                                    VisionPipeline)

        pipe = VisionPipeline(
            detector_fn=None, depth_fn=None,
            ocr_fn=lambda crops: [""] * len(crops),
            barcode_fn=qr.QRFinderDetector())
        frame = (np.stack([_qr_image(240)] * 3, -1) * 255
                 ).astype(np.uint8)
        res = pipe.process_frame(frame, AnalysisFlags.OCR)
        assert res.barcodes and res.barcodes[0].startswith("qr_code@")


class TestTwoCodes:
    def test_two_codes_detect_separately(self):
        """Two same-scale QR codes in one frame must yield TWO
        candidates (scale-only grouping would merge all six finder
        patterns into one full-frame box)."""
        img = np.ones((240, 560), np.float32)
        span = 7 * 6
        for x0 in (20, 320):
            _draw_finder(img, 20, x0, 6)
            _draw_finder(img, 20, x0 + 160 - span, 6)
            _draw_finder(img, 180 - span + 20, x0, 6)
        codes = qr.detect_qr(img)
        assert len(codes) == 2, codes
        (a, b) = sorted(c["bbox"][0] for c in codes)
        assert b - a > 200  # genuinely separate boxes
