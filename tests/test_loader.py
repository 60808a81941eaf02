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
    """tensors: {name: (array, ggml_type)}."""
    metadata = metadata or {}
    align = 32
    body = b"GGUF" + struct.pack("<I", 3)
    body += struct.pack("<QQ", len(tensors), len(metadata))
    for k, v in metadata.items():
        body += _gguf_string(k)
        if isinstance(v, str):
            body += struct.pack("<I", 8) + _gguf_string(v)
        elif isinstance(v, int):
            body += struct.pack("<I", 4) + struct.pack("<I", v)
        elif isinstance(v, float):
            body += struct.pack("<I", 6) + struct.pack("<f", v)
        else:
            raise TypeError(v)

    blobs = []
    offset = 0
    for name, (arr, gtype) in tensors.items():
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
