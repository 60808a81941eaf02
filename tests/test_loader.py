"""Model loader tests: format sniffing, GGUF parse + dequant (synthetic
files written by the test), safetensors/npz, cache eviction, registry.
"""

import json
import struct

import numpy as np
import pytest

from trackiellm_tpu.models import loader as L
from trackiellm_tpu.models.registry import (
    ModelId,
    ModelService,
    global_model_service,
)
from trackiellm_tpu.utils.errors import TrackieError


# ---------------------------------------------------------------------------
# Synthetic GGUF writer (test-only)
# ---------------------------------------------------------------------------

def _gguf_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _quant_q8_0(arr: np.ndarray) -> bytes:
    flat = arr.reshape(-1, 32)
    out = b""
    for block in flat:
        scale = np.abs(block).max() / 127.0 or 1e-8
        q = np.clip(np.round(block / scale), -127, 127).astype(np.int8)
        out += np.float16(scale).tobytes() + q.tobytes()
    return out


def _quant_q4_0(arr: np.ndarray) -> bytes:
    flat = arr.reshape(-1, 32)
    out = b""
    for block in flat:
        scale = np.abs(block).max() / 7.0 or 1e-8
        q = (np.clip(np.round(block / scale), -8, 7) + 8).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += np.float16(scale).tobytes() + packed.tobytes()
    return out


def write_gguf(path, tensors, metadata=None):
    """tensors: {name: (array, ggml_type)} or, for pre-quantized raw
    block data, {name: (raw_uint8, ggml_type, logical_shape)}."""
    metadata = metadata or {}
    align = 32
    body = b"GGUF" + struct.pack("<I", 3)
    body += struct.pack("<QQ", len(tensors), len(metadata))
    for k, v in metadata.items():
        body += _gguf_string(k)
        if isinstance(v, str):
            body += struct.pack("<I", 8) + _gguf_string(v)
        elif isinstance(v, int):
            if v < 0:  # int32 (type 5) for negative values
                body += struct.pack("<I", 5) + struct.pack("<i", v)
            else:
                body += struct.pack("<I", 4) + struct.pack("<I", v)
        elif isinstance(v, float):
            body += struct.pack("<I", 6) + struct.pack("<f", v)
        elif isinstance(v, (list, tuple)):
            # GGUF array value: type 9, then (elem_type, count, items).
            body += struct.pack("<I", 9)
            if all(isinstance(x, str) for x in v):
                body += struct.pack("<IQ", 8, len(v))
                for x in v:
                    body += _gguf_string(x)
            elif all(isinstance(x, int) for x in v):
                body += struct.pack("<IQ", 5, len(v))  # int32 elems
                for x in v:
                    body += struct.pack("<i", x)
            elif all(isinstance(x, float) for x in v):
                body += struct.pack("<IQ", 6, len(v))
                for x in v:
                    body += struct.pack("<f", x)
            else:
                raise TypeError(v)
        else:
            raise TypeError(v)

    blobs = []
    offset = 0
    for name, spec in tensors.items():
        if len(spec) == 3:  # pre-quantized raw block bytes
            raw_arr, gtype, shape = spec
            raw = np.asarray(raw_arr, np.uint8).tobytes()
            body += _gguf_string(name)
            dims = tuple(reversed(shape))
            body += struct.pack("<I", len(dims))
            body += struct.pack(f"<{len(dims)}Q", *dims)
            body += struct.pack("<I", gtype)
            body += struct.pack("<Q", offset)
            blobs.append(raw)
            offset += (len(raw) + align - 1) // align * align
            continue
        arr, gtype = spec
        if gtype == L.GGML_F32:
            raw = arr.astype(np.float32).tobytes()
        elif gtype == L.GGML_F16:
            raw = arr.astype(np.float16).tobytes()
        elif gtype == L.GGML_Q8_0:
            raw = _quant_q8_0(arr)
        elif gtype == L.GGML_Q4_0:
            raw = _quant_q4_0(arr)
        else:
            raise ValueError(gtype)
        body += _gguf_string(name)
        dims = tuple(reversed(arr.shape))  # GGUF stores innermost first
        body += struct.pack("<I", len(dims))
        body += struct.pack(f"<{len(dims)}Q", *dims)
        body += struct.pack("<I", gtype)
        body += struct.pack("<Q", offset)
        blobs.append(raw)
        offset += (len(raw) + align - 1) // align * align

    data_start = (len(body) + align - 1) // align * align
    with open(path, "wb") as f:
        f.write(body)
        f.write(b"\x00" * (data_start - len(body)))
        pos = 0
        for raw in blobs:
            f.write(raw)
            pos += len(raw)
            pad = (-pos) % align
            f.write(b"\x00" * pad)
            pos += pad


def write_safetensors(path, tensors):
    header = {}
    blob = b""
    for name, arr in tensors.items():
        raw = arr.tobytes()
        header[name] = {
            "dtype": {"float32": "F32", "float16": "F16",
                      "int8": "I8"}[str(arr.dtype)],
            "shape": list(arr.shape),
            "data_offsets": [len(blob), len(blob) + len(raw)],
        }
        blob += raw
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(blob)


# ---------------------------------------------------------------------------

class TestFormatDetection:
    def test_gguf(self, tmp_path):
        p = tmp_path / "m.gguf"
        write_gguf(str(p), {"w": (np.zeros((2, 32), np.float32),
                                  L.GGML_F32)})
        assert L.detect_format(str(p)) is L.ModelFormat.GGUF

    def test_safetensors(self, tmp_path):
        p = tmp_path / "m.safetensors"
        write_safetensors(str(p), {"w": np.zeros((2, 2), np.float32)})
        assert L.detect_format(str(p)) is L.ModelFormat.SAFETENSORS

    def test_npz(self, tmp_path):
        p = tmp_path / "m.npz"
        np.savez(p, w=np.zeros(3))
        assert L.detect_format(str(p)) is L.ModelFormat.NPZ

    def test_tflite_magic(self, tmp_path):
        p = tmp_path / "m.tflite"
        p.write_bytes(b"\x00\x00\x00\x00TFL3rest")
        assert L.detect_format(str(p)) is L.ModelFormat.TFLITE

    def test_unknown(self, tmp_path):
        p = tmp_path / "m.bin"
        p.write_bytes(b"\xff\xfe\xfd\xfc garbage")
        assert L.detect_format(str(p)) is L.ModelFormat.UNKNOWN

    def test_missing_file(self):
        with pytest.raises(TrackieError):
            L.detect_format("/nonexistent/model.gguf")


class TestGGUF:
    def test_metadata_and_directory(self, tmp_path):
        p = str(tmp_path / "m.gguf")
        write_gguf(p, {"tok": (np.ones((4, 32), np.float32), L.GGML_F32)},
                   metadata={"general.architecture": "llama",
                             "general.name": "test-model",
                             "llama.context_length": 4096})
        g = L.read_gguf_header(p)
        assert g.architecture == "llama"
        assert g.name == "test-model"
        assert g.metadata["llama.context_length"] == 4096
        assert g.tensors["tok"].shape == (4, 32)

    def test_f32_f16_roundtrip(self, tmp_path):
        p = str(tmp_path / "m.gguf")
        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 64)).astype(np.float32)
        b = rng.standard_normal((2, 32)).astype(np.float32)
        write_gguf(p, {"a": (a, L.GGML_F32), "b": (b, L.GGML_F16)})
        g = L.read_gguf_header(p)
        np.testing.assert_array_equal(L.load_gguf_tensor(g, "a"), a)
        np.testing.assert_allclose(L.load_gguf_tensor(g, "b"), b,
                                   atol=2e-3)

    def test_q8_0_dequant(self, tmp_path):
        p = str(tmp_path / "q8.gguf")
        rng = np.random.default_rng(1)
        w = rng.standard_normal((8, 64)).astype(np.float32)
        write_gguf(p, {"w": (w, L.GGML_Q8_0)})
        g = L.read_gguf_header(p)
        out = L.load_gguf_tensor(g, "w")
        assert out.shape == w.shape
        np.testing.assert_allclose(out, w, atol=np.abs(w).max() / 50)

    def test_q4_0_dequant(self, tmp_path):
        p = str(tmp_path / "q4.gguf")
        rng = np.random.default_rng(2)
        w = rng.standard_normal((4, 64)).astype(np.float32)
        write_gguf(p, {"w": (w, L.GGML_Q4_0)})
        g = L.read_gguf_header(p)
        out = L.load_gguf_tensor(g, "w")
        np.testing.assert_allclose(out, w, atol=np.abs(w).max() / 5)

    def test_k_quant_dequant_vs_scalar_reference(self):
        """The vectorized K-quant/legacy-quant dequantizers match an
        independent scalar transcription of ggml-quants.c's
        dequantize_row_* loops on random block bytes (the formats real
        Q4_K_M / Q5_K_M GGUF releases ship)."""
        rng = np.random.default_rng(7)

        def f16(b):  # two raw bytes -> float
            return float(np.frombuffer(bytes(b), np.float16)[0])

        def scale_min_k4(j, s):
            if j < 4:
                return s[j] & 63, s[j + 4] & 63
            return ((s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4),
                    (s[j + 4] >> 4) | ((s[j] >> 6) << 4))

        def ref_q4_1(b):
            d, m = f16(b[0:2]), f16(b[2:4])
            y = np.zeros(32)
            for j in range(16):
                y[j] = d * (b[4 + j] & 0xF) + m
                y[j + 16] = d * (b[4 + j] >> 4) + m
            return y

        def ref_q5_0(b):
            d = f16(b[0:2])
            qh = int(np.frombuffer(bytes(b[2:6]), np.uint32)[0])
            y = np.zeros(32)
            for j in range(16):
                q = int(b[6 + j])  # int() everywhere: uint8 - 16 wraps
                y[j] = d * (((q & 0xF) | (((qh >> j) & 1) << 4)) - 16)
                y[j + 16] = d * (((q >> 4)
                                  | (((qh >> (j + 16)) & 1) << 4)) - 16)
            return y

        def ref_q5_1(b):
            d, m = f16(b[0:2]), f16(b[2:4])
            qh = int(np.frombuffer(bytes(b[4:8]), np.uint32)[0])
            y = np.zeros(32)
            for j in range(16):
                y[j] = d * ((b[8 + j] & 0xF)
                            | (((qh >> j) & 1) << 4)) + m
                y[j + 16] = d * ((b[8 + j] >> 4)
                                 | (((qh >> (j + 16)) & 1) << 4)) + m
            return y

        def ref_q4_k(b):
            d, dmin = f16(b[0:2]), f16(b[2:4])
            s = b[4:16]
            y = np.zeros(256)
            qs = b[16:]
            for j in range(4):
                sc1, m1 = scale_min_k4(2 * j, s)
                sc2, m2 = scale_min_k4(2 * j + 1, s)
                for l in range(32):
                    q = qs[32 * j + l]
                    y[64 * j + l] = d * sc1 * (q & 0xF) - dmin * m1
                    y[64 * j + 32 + l] = d * sc2 * (q >> 4) - dmin * m2
            return y

        def ref_q5_k(b):
            d, dmin = f16(b[0:2]), f16(b[2:4])
            s, qh, qs = b[4:16], b[16:48], b[48:]
            y = np.zeros(256)
            u1, u2 = 1, 2
            for j in range(4):
                sc1, m1 = scale_min_k4(2 * j, s)
                sc2, m2 = scale_min_k4(2 * j + 1, s)
                for l in range(32):
                    q = qs[32 * j + l]
                    y[64 * j + l] = d * sc1 * (
                        (q & 0xF) + (16 if qh[l] & u1 else 0)) - dmin * m1
                    y[64 * j + 32 + l] = d * sc2 * (
                        (q >> 4) + (16 if qh[l] & u2 else 0)) - dmin * m2
                u1 <<= 2
                u2 <<= 2
            return y

        def ref_q2_k(b):
            sc, qs = b[:16], b[16:80]
            d, dmin = f16(b[80:82]), f16(b[82:84])
            y = np.zeros(256)
            i = 0
            is_ = 0
            for n in range(2):
                q = qs[32 * n:32 * n + 32]
                for shift in (0, 2, 4, 6):
                    s = sc[is_]
                    is_ += 1
                    for l in range(16):
                        y[i] = d * (s & 0xF) * ((q[l] >> shift) & 3) \
                            - dmin * (s >> 4)
                        i += 1
                    s = sc[is_]
                    is_ += 1
                    for l in range(16, 32):
                        y[i] = d * (s & 0xF) * ((q[l] >> shift) & 3) \
                            - dmin * (s >> 4)
                        i += 1
            return y

        def ref_q3_k(b):
            hm, qs, s12 = b[:32], b[32:96], b[96:108]
            d = f16(b[108:110])
            # aux shuffle per dequantize_row_q3_K
            a, bb, c = (int(np.frombuffer(bytes(s12[j:j + 4]),
                                          np.uint32)[0])
                        for j in (0, 4, 8))
            k1, k2 = 0x03030303, 0x0F0F0F0F
            aux = [(a & k2) | (((c >> 0) & k1) << 4),
                   (bb & k2) | (((c >> 2) & k1) << 4),
                   ((a >> 4) & k2) | (((c >> 4) & k1) << 4),
                   ((bb >> 4) & k2) | (((c >> 6) & k1) << 4)]
            sc = np.frombuffer(
                b"".join(int(x).to_bytes(4, "little") for x in aux),
                np.int8)
            y = np.zeros(256)
            i = 0
            is_ = 0
            m = 1
            for n in range(2):
                q = qs[32 * n:32 * n + 32]
                for shift in (0, 2, 4, 6):
                    dl = d * (int(sc[is_]) - 32)
                    is_ += 1
                    for l in range(16):
                        y[i] = dl * (((int(q[l]) >> shift) & 3)
                                     - (0 if hm[l] & m else 4))
                        i += 1
                    dl = d * (int(sc[is_]) - 32)
                    is_ += 1
                    for l in range(16, 32):
                        y[i] = dl * (((int(q[l]) >> shift) & 3)
                                     - (0 if hm[l] & m else 4))
                        i += 1
                    m <<= 1
            return y

        def ref_q6_k(b):
            ql, qh = b[:128], b[128:192]
            sc = np.frombuffer(bytes(b[192:208]), np.int8)
            d = f16(b[208:210])
            y = np.zeros(256)
            for n in range(2):
                for l in range(32):
                    is_ = l // 16
                    lo, hi = int(ql[64 * n + l]), int(ql[64 * n + 32 + l])
                    h = int(qh[32 * n + l])
                    q1 = ((lo & 0xF) | (((h >> 0) & 3) << 4)) - 32
                    q2 = ((hi & 0xF) | (((h >> 2) & 3) << 4)) - 32
                    q3 = ((lo >> 4) | (((h >> 4) & 3) << 4)) - 32
                    q4 = ((hi >> 4) | (((h >> 6) & 3) << 4)) - 32
                    y[128 * n + l] = d * sc[8 * n + is_] * q1
                    y[128 * n + 32 + l] = d * sc[8 * n + is_ + 2] * q2
                    y[128 * n + 64 + l] = d * sc[8 * n + is_ + 4] * q3
                    y[128 * n + 96 + l] = d * sc[8 * n + is_ + 6] * q4
            return y

        kv = [-127, -104, -83, -65, -49, -35, -22, -10,
              1, 13, 25, 38, 53, 69, 89, 113]  # kvalues_iq4nl

        def ref_iq4_nl(b):
            d = f16(b[0:2])
            y = np.zeros(32)
            for j in range(16):
                y[j] = d * kv[b[2 + j] & 0xF]
                y[j + 16] = d * kv[b[2 + j] >> 4]
            return y

        def ref_iq4_xs(b):
            d = f16(b[0:2])
            scales_h = int(np.frombuffer(bytes(b[2:4]), np.uint16)[0])
            scales_l, qs = b[4:8], b[8:136]
            y = np.zeros(256)
            for ib in range(8):
                # int() everywhere: np.uint8 wraps on the -32 below
                ls = (int(scales_l[ib // 2] >> (4 * (ib % 2))) & 0xF) \
                    | (((scales_h >> (2 * ib)) & 3) << 4)
                dl = d * (ls - 32)
                for j in range(16):
                    q = qs[16 * ib + j]
                    y[32 * ib + j] = dl * kv[q & 0xF]
                    y[32 * ib + 16 + j] = dl * kv[q >> 4]
            return y

        # (vectorized fn, scalar ref, bytes/block, elems/block,
        #  offsets of f16 scale fields to overwrite with finite values —
        #  random bytes can form inf/nan halves, which never compare).
        cases = [
            (L._dequant_q4_1, ref_q4_1, 20, 32, (0, 2)),
            (L._dequant_q5_0, ref_q5_0, 22, 32, (0,)),
            (L._dequant_q5_1, ref_q5_1, 24, 32, (0, 2)),
            (L._dequant_q2_k, ref_q2_k, 84, 256, (80, 82)),
            (L._dequant_q3_k, ref_q3_k, 110, 256, (108,)),
            (L._dequant_q4_k, ref_q4_k, 144, 256, (0, 2)),
            (L._dequant_q5_k, ref_q5_k, 176, 256, (0, 2)),
            (L._dequant_q6_k, ref_q6_k, 210, 256, (208,)),
            (L._dequant_iq4_nl, ref_iq4_nl, 18, 32, (0,)),
            (L._dequant_iq4_xs, ref_iq4_xs, 136, 256, (0,)),
        ]
        for vec_fn, ref_fn, block_bytes, per_block, f16_offs in cases:
            n_blocks = 5
            raw = rng.integers(0, 256, n_blocks * block_bytes,
                               dtype=np.uint8).reshape(n_blocks, -1)
            for i in range(n_blocks):
                for k, off in enumerate(f16_offs):
                    val = np.float16(rng.uniform(-2.0, 2.0))
                    raw[i, off:off + 2] = np.frombuffer(
                        val.tobytes(), np.uint8)
            raw = raw.reshape(-1)
            got = vec_fn(raw, n_blocks * per_block)
            want = np.concatenate([
                ref_fn(raw[i * block_bytes:(i + 1) * block_bytes])
                for i in range(n_blocks)])
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                       err_msg=vec_fn.__name__)

    def test_k_quant_gguf_end_to_end(self, tmp_path):
        """A GGUF carrying raw Q4_K and Q6_K tensor data loads through
        load_gguf_tensor (the published Q4_K_M tensor mix)."""
        rng = np.random.default_rng(11)
        for gtype, block_bytes, fn in ((L.GGML_Q4_K, 144, L._dequant_q4_k),
                                       (L.GGML_Q6_K, 210, L._dequant_q6_k)):
            n_blocks = 4  # 1024 elements = (4, 256)
            raw = rng.integers(0, 128, n_blocks * block_bytes,
                               dtype=np.uint8)  # <128 keeps f16 finite
            p = str(tmp_path / f"k{gtype}.gguf")
            write_gguf(p, {"w": (raw, gtype, (4, 256))})
            g = L.read_gguf_header(p)
            out = L.load_gguf_tensor(g, "w")
            assert out.shape == (4, 256)
            np.testing.assert_allclose(
                out.reshape(-1), fn(raw, 1024), rtol=1e-6)

    def test_validate(self, tmp_path):
        p = str(tmp_path / "ok.gguf")
        write_gguf(p, {"w": (np.zeros((2, 32), np.float32), L.GGML_F32)})
        assert L.validate_model(p)
        bad = tmp_path / "bad.gguf"
        bad.write_bytes(b"GGUF\x01\x00\x00\x00")  # v1: unsupported
        assert not L.validate_model(str(bad))


class TestLoaderFrontEnd:
    def test_load_safetensors(self, tmp_path):
        p = str(tmp_path / "m.safetensors")
        w = np.arange(12, dtype=np.float32).reshape(3, 4)
        write_safetensors(p, {"w": w})
        m = L.load_model(p)
        assert m.format is L.ModelFormat.SAFETENSORS
        np.testing.assert_array_equal(m.tensors["w"], w)

    def test_load_npz(self, tmp_path):
        p = str(tmp_path / "m.npz")
        np.savez(p, a=np.ones(3), b=np.zeros((2, 2)))
        m = L.load_model(p)
        assert set(m.tensors) == {"a", "b"}

    def test_onnx_loads_weights_only(self, tmp_path):
        # graphs are never executed, but initializers load (weights-only
        # ingestion via models/onnx_reader)
        from trackiellm_tpu.models.onnx_reader import write_onnx_initializers

        p = str(tmp_path / "m.onnx")
        write_onnx_initializers(p, {"w": np.ones((2, 2), np.float32)})
        m = L.load_model(p)
        assert m.format is L.ModelFormat.ONNX
        assert set(m.tensors) == {"w"}

    def test_onnx_without_graph_rejected(self, tmp_path):
        p = tmp_path / "m.onnx"
        p.write_bytes(b"\x08\x01")  # ir_version only, no GraphProto
        with pytest.raises(ValueError):
            L.load_model(str(p))

    def test_cache_lru_eviction(self, tmp_path):
        paths = []
        for i in range(3):
            p = str(tmp_path / f"m{i}.npz")
            np.savez(p, w=np.full((8,), float(i)))
            paths.append(p)
        cache = L.ModelCache(max_models=2)
        cache.preload(paths[:2])
        cache.get(paths[0])          # touch 0 -> 1 is LRU
        cache.get(paths[2])          # evicts 1
        assert cache.size == 2
        assert cache.evictions == 1

    def test_cache_memory_budget(self, tmp_path):
        p1 = str(tmp_path / "big1.npz")
        p2 = str(tmp_path / "big2.npz")
        np.savez(p1, w=np.zeros(1000, np.float32))
        np.savez(p2, w=np.zeros(1000, np.float32))
        cache = L.ModelCache(max_models=8, max_bytes=5000)
        cache.get(p1)
        cache.get(p2)
        assert cache.size == 1  # budget forced eviction


class TestModelService:
    def test_register_get_unload(self):
        svc = ModelService()
        svc.register(ModelId.MAIN_LLM, {"params": 1})
        assert svc.get(ModelId.MAIN_LLM) == {"params": 1}
        assert svc.unload(ModelId.MAIN_LLM)
        assert svc.try_get(ModelId.MAIN_LLM) is None

    def test_lazy_factory_called_once(self):
        svc = ModelService()
        calls = []
        svc.register_factory(ModelId.VAD, lambda: calls.append(1) or "vad")
        assert svc.get(ModelId.VAD) == "vad"
        assert svc.get(ModelId.VAD) == "vad"
        assert len(calls) == 1

    def test_global_singleton(self):
        assert global_model_service() is global_model_service()


class TestOptimize:
    def test_downcast_big_tensors(self, tmp_path):
        p = str(tmp_path / "opt.npz")
        np.savez(p, big=np.zeros((128, 128), np.float32),
                 small=np.zeros((4,), np.float32))
        m = L.load_model(p)
        opt = L.optimize_model(m)
        assert opt.tensors["big"].dtype == np.float16
        assert opt.tensors["small"].dtype == np.float32
        assert opt.size_bytes < m.size_bytes


class TestNativeCheckpointInspect:
    def test_describe_native_checkpoint(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from trackiellm_tpu.models import llm
        from trackiellm_tpu.models.checkpoint import save_checkpoint
        from trackiellm_tpu.models.loader import (ModelFormat,
                                                  describe, detect_format)

        cfg = llm.LLMConfig.tiny()
        params = llm.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32)
        path = str(tmp_path / "ck")
        save_checkpoint(path, params, cfg)
        assert detect_format(path) is ModelFormat.NATIVE
        info = describe(path)
        assert info["format"] == "native"
        assert info["config"]["config"]["dim"] == cfg.dim
        assert info["n_parameters"] > 0


class TestMXFP4:
    """MXFP4 dequant (ggml type 39 — gpt-oss GGUFs ship in it).

    The reference encoder here follows the OCP Microscaling spec
    directly (shared 2^(e-127) e8m0 scale, e2m1 element values), NOT
    the reader's halved-scale integer-table formulation — so the two
    agreeing validates the reader against the spec."""

    E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0],
                    np.float32)

    def _encode_block(self, e, codes):
        """e8m0 byte + 32 4-bit codes (sign<<3 | magnitude index)."""
        qs = bytearray(16)
        for j in range(16):
            qs[j] = (codes[j] & 0xF) | ((codes[j + 16] & 0xF) << 4)
        return bytes([e]) + bytes(qs)

    def _spec_value(self, e, code):
        mag = self.E2M1[code & 0x7]
        return float(2.0 ** (e - 127)) * (-mag if code & 0x8 else mag)

    def test_exact_representable_values(self, tmp_path):
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 16, size=(4, 32))
        exps = [127, 126, 130, 1]  # incl. a subnormal-range scale
        raw = b"".join(self._encode_block(e, c)
                       for e, c in zip(exps, codes))
        expected = np.array(
            [[self._spec_value(e, int(c)) for c in blk]
             for e, blk in zip(exps, codes)], np.float32).reshape(-1)

        path = str(tmp_path / "mx.gguf")
        write_gguf(path, {"t": (np.frombuffer(raw, np.uint8),
                                L.GGML_MXFP4, (4, 32))},
                   {"general.architecture": "llama"})
        g = L.read_gguf_header(path)
        got = L.load_gguf_tensor(g, "t").reshape(-1)
        np.testing.assert_array_equal(got, expected)

    def test_block_geometry_registered(self):
        per_block, block_bytes, _ = L._GGML_DEQUANT[L.GGML_MXFP4]
        assert (per_block, block_bytes) == (32, 17)


def permute_llama_qk(w: np.ndarray, n_heads: int) -> np.ndarray:
    """llama.cpp ``LlamaModel.permute`` (convert_hf_to_gguf): HF
    split-half q/k rows -> the ggml NORM-rope interleaved layout that
    REAL llama-family GGUFs carry. Synthetic fixtures apply it so the
    reader's inverse fold (``_deinterleave_rope_cols``) is pinned by
    oracle logits, not just roundtripped against itself."""
    shape = w.shape
    d = shape[0] // n_heads
    return (w.reshape(n_heads, 2, d // 2, *shape[1:])
            .swapaxes(1, 2).reshape(shape))
