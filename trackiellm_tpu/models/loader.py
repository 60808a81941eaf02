"""Model loader: format sniffing, metadata extraction, checkpoint
conversion to JAX arrays, and a slotted model cache.

Parity target: ``tk_model_loader`` (reference: src/ai_models/
tk_model_loader.c): format detection by magic/extension — GGUF / ONNX /
TFLite (:557-603), per-format loading (:199-394), metadata extraction
(:780-868), model cache with slots + eviction (:918-1430, plus
tk_memory_manager.h's memory-pressure eviction), validate / preload
entry points (:1188-1355).

TPU design: models are parameter pytrees, so "loading" means parsing a
checkpoint container into numpy/JAX arrays. The GGUF reader is complete
and self-contained (header, kv metadata, tensor directory, F32/F16/
Q8_0/Q4_0 tensor data with dequantization or native requantization into
:class:`trackiellm_tpu.ops.quant.QuantizedLinear` layout) — no llama.cpp.
safetensors and npz load natively; ONNX/TFLite are detected and reported
with a conversion hint (their graphs are not executed at runtime by
design — the architectures are reimplemented in models/).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import struct
import threading
import time
from collections import OrderedDict
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import numpy as np

from trackiellm_tpu.utils.errors import ErrorCode, TrackieError
from trackiellm_tpu.utils.logging import get_logger

log = get_logger("models.loader")


class ModelFormat(enum.Enum):
    NATIVE = "native"          # this framework's checkpoint directory
    GGUF = "gguf"
    SAFETENSORS = "safetensors"
    NPZ = "npz"
    ONNX = "onnx"
    TFLITE = "tflite"
    ORBAX = "orbax"
    UNKNOWN = "unknown"


def detect_format(path: str) -> ModelFormat:
    """Magic-first format sniffing (parity: tk_model_loader.c:557-603)."""
    import os

    if os.path.isdir(path):
        try:
            entries = set(os.listdir(path))
        except OSError:
            return ModelFormat.UNKNOWN
        if "checkpoint" in entries or "_METADATA" in entries or any(
                e.startswith("ocdbt") for e in entries):
            return ModelFormat.ORBAX
        if "arrays.npz" in entries and "tree.json" in entries:
            return ModelFormat.NATIVE  # models/checkpoint.py layout
        return ModelFormat.UNKNOWN
    try:
        with open(path, "rb") as f:
            head = f.read(16)
    except OSError as e:
        raise TrackieError(ErrorCode.FILE_NOT_FOUND, f"{path}: {e}") from e
    if head[:4] == b"GGUF":
        return ModelFormat.GGUF
    if head[4:8] == b"TFL3":
        return ModelFormat.TFLITE
    if head[:2] == b"PK":
        return ModelFormat.NPZ
    if len(head) >= 9:
        # safetensors: u64 LE header length then '{'.
        (hlen,) = struct.unpack("<Q", head[:8])
        if 0 < hlen < (1 << 32) and head[8:9] == b"{":
            return ModelFormat.SAFETENSORS
    if head[:1] == b"\x08" or path.endswith(".onnx"):
        return ModelFormat.ONNX
    return ModelFormat.UNKNOWN


# ---------------------------------------------------------------------------
# GGUF reader (v2/v3)
# ---------------------------------------------------------------------------

_GGUF_SCALAR_FMT = {
    0: ("<B", 1), 1: ("<b", 1), 2: ("<H", 2), 3: ("<h", 2),
    4: ("<I", 4), 5: ("<i", 4), 6: ("<f", 4), 7: ("<?", 1),
    10: ("<Q", 8), 11: ("<q", 8), 12: ("<d", 8),
}
_GGUF_STRING = 8
_GGUF_ARRAY = 9

# ggml tensor types we materialize (id -> name).
GGML_F32, GGML_F16, GGML_Q4_0, GGML_Q8_0 = 0, 1, 2, 8


@dataclasses.dataclass
class GGUFTensorInfo:
    name: str
    shape: Tuple[int, ...]
    ggml_type: int
    offset: int


@dataclasses.dataclass
class GGUFFile:
    version: int
    metadata: Dict[str, Any]
    tensors: Dict[str, GGUFTensorInfo]
    data_start: int
    path: str

    @property
    def architecture(self) -> Optional[str]:
        return self.metadata.get("general.architecture")

    @property
    def name(self) -> Optional[str]:
        return self.metadata.get("general.name")


def _read_gguf_string(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8", errors="replace")


def _read_gguf_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _GGUF_SCALAR_FMT:
        fmt, size = _GGUF_SCALAR_FMT[vtype]
        return struct.unpack(fmt, f.read(size))[0]
    if vtype == _GGUF_STRING:
        return _read_gguf_string(f)
    if vtype == _GGUF_ARRAY:
        (etype,) = struct.unpack("<I", f.read(4))
        (count,) = struct.unpack("<Q", f.read(8))
        return [_read_gguf_value(f, etype) for _ in range(count)]
    raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                       f"unknown GGUF kv type {vtype}")


def read_gguf_header(path: str) -> GGUFFile:
    """Parse the GGUF header: metadata kv store + tensor directory
    (parity: the loader's metadata extraction, tk_model_loader.c:780-868)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"GGUF":
            raise TrackieError(ErrorCode.MODEL_FORMAT_UNKNOWN,
                               f"{path}: not a GGUF file")
        (version,) = struct.unpack("<I", f.read(4))
        if version < 2:
            raise TrackieError(ErrorCode.MODEL_FORMAT_UNKNOWN,
                               f"GGUF v{version} unsupported (need >= 2)")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))

        metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_gguf_string(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            metadata[key] = _read_gguf_value(f, vtype)

        tensors: Dict[str, GGUFTensorInfo] = {}
        for _ in range(n_tensors):
            name = _read_gguf_string(f)
            (n_dims,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{n_dims}Q", f.read(8 * n_dims))
            ggml_type, = struct.unpack("<I", f.read(4))
            offset, = struct.unpack("<Q", f.read(8))
            # GGUF dims are innermost-first; numpy wants outermost-first.
            tensors[name] = GGUFTensorInfo(name, tuple(reversed(dims)),
                                           ggml_type, offset)

        align = int(metadata.get("general.alignment", 32))
        pos = f.tell()
        data_start = (pos + align - 1) // align * align
        return GGUFFile(version, metadata, tensors, data_start, path)


def _dequant_q8_0(raw: np.ndarray, n_elems: int) -> np.ndarray:
    """GGUF Q8_0: 34-byte blocks = f16 scale + 32 int8 values."""
    blocks = raw.reshape(-1, 34)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    values = blocks[:, 2:].copy().view(np.int8).astype(np.float32)
    return (values * scales).reshape(-1)[:n_elems]


def _dequant_q4_0(raw: np.ndarray, n_elems: int) -> np.ndarray:
    """GGUF Q4_0: 18-byte blocks = f16 scale + 16 packed bytes; byte j
    holds elements j (low nibble) and j+16 (high nibble), biased by 8."""
    blocks = raw.reshape(-1, 18)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    packed = blocks[:, 2:]
    lo = (packed & 0xF).astype(np.int8) - 8
    hi = (packed >> 4).astype(np.int8) - 8
    vals = np.concatenate([lo, hi], axis=1).astype(np.float32)  # (B, 32)
    return (vals * scales).reshape(-1)[:n_elems]


def load_gguf_tensor(gguf: GGUFFile, name: str) -> np.ndarray:
    """Materialize one tensor as f32 numpy (dequantizing as needed)."""
    info = gguf.tensors.get(name)
    if info is None:
        raise TrackieError(ErrorCode.NOT_FOUND, f"tensor {name!r}")
    n_elems = int(np.prod(info.shape))
    with open(gguf.path, "rb") as f:
        f.seek(gguf.data_start + info.offset)
        if info.ggml_type == GGML_F32:
            data = np.fromfile(f, np.float32, n_elems)
        elif info.ggml_type == GGML_F16:
            data = np.fromfile(f, np.float16, n_elems).astype(np.float32)
        elif info.ggml_type == GGML_Q8_0:
            n_blocks = (n_elems + 31) // 32
            raw = np.fromfile(f, np.uint8, n_blocks * 34)
            data = _dequant_q8_0(raw, n_elems)
        elif info.ggml_type == GGML_Q4_0:
            n_blocks = (n_elems + 31) // 32
            raw = np.fromfile(f, np.uint8, n_blocks * 18)
            data = _dequant_q4_0(raw, n_elems)
        else:
            raise TrackieError(
                ErrorCode.QUANT_UNSUPPORTED,
                f"ggml type {info.ggml_type} for {name!r} not supported")
    return data.reshape(info.shape)


# ---------------------------------------------------------------------------
# safetensors / npz
# ---------------------------------------------------------------------------

_ST_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": None,  # bf16 special
    "I32": np.int32, "I8": np.int8, "U8": np.uint8, "I64": np.int64,
    "F64": np.float64, "BOOL": np.bool_,
}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        data_start = 8 + hlen
        out: Dict[str, np.ndarray] = {}
        for name, spec in header.items():
            if name == "__metadata__":
                continue
            a, b = spec["data_offsets"]
            f.seek(data_start + a)
            raw = f.read(b - a)
            dt = spec["dtype"]
            shape = tuple(spec["shape"])
            if dt == "BF16":
                u16 = np.frombuffer(raw, np.uint16)
                arr = (u16.astype(np.uint32) << 16).view(np.float32)
            else:
                np_dt = _ST_DTYPES.get(dt)
                if np_dt is None:
                    raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                                       f"safetensors dtype {dt}")
                arr = np.frombuffer(raw, np_dt)
            out[name] = arr.reshape(shape).copy()
    return out


def load_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# Front-end loader + cache
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LoadedModel:
    path: str
    format: ModelFormat
    metadata: Dict[str, Any]
    tensors: Dict[str, np.ndarray]
    loaded_at: float
    size_bytes: int


def describe(path: str) -> Dict[str, Any]:
    """Metadata-only inspection (no tensor data read)."""
    fmt = detect_format(path)
    if fmt is ModelFormat.NATIVE:
        import os

        import numpy as np

        info: Dict[str, Any] = {"format": fmt.value}
        cfg_path = os.path.join(path, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                info["config"] = json.load(f)
        with np.load(os.path.join(path, "arrays.npz")) as z:
            names = z.files
            info["n_arrays"] = len(names)
            info["n_parameters"] = int(sum(
                int(np.prod(z[n].shape)) for n in names))
        return info
    if fmt is ModelFormat.GGUF:
        g = read_gguf_header(path)
        return {"format": fmt.value, "architecture": g.architecture,
                "name": g.name, "n_tensors": len(g.tensors),
                "metadata_keys": len(g.metadata)}
    if fmt is ModelFormat.SAFETENSORS:
        with open(path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
        names = [k for k in header if k != "__metadata__"]
        return {"format": fmt.value, "n_tensors": len(names)}
    return {"format": fmt.value}


def load_model(path: str) -> LoadedModel:
    fmt = detect_format(path)
    meta: Dict[str, Any] = {}
    if fmt is ModelFormat.GGUF:
        g = read_gguf_header(path)
        meta = dict(g.metadata)
        tensors = {n: load_gguf_tensor(g, n) for n in g.tensors}
    elif fmt is ModelFormat.SAFETENSORS:
        tensors = load_safetensors(path)
    elif fmt is ModelFormat.NPZ:
        tensors = load_npz(path)
    elif fmt is ModelFormat.ONNX:
        # The graph is never executed (architectures are JAX programs in
        # trackiellm_tpu.models); the WEIGHTS load fine — feed them to
        # the matching models.convert mapper.
        from trackiellm_tpu.models.onnx_reader import read_onnx_initializers

        tensors = read_onnx_initializers(path)
    elif fmt is ModelFormat.TFLITE:
        raise TrackieError(
            ErrorCode.MODEL_FORMAT_UNKNOWN,
            "tflite graphs are not executed at runtime; convert the "
            "weights offline (the architectures live in "
            "trackiellm_tpu.models)")
    else:
        raise TrackieError(ErrorCode.MODEL_FORMAT_UNKNOWN, path)
    size = sum(t.nbytes for t in tensors.values())
    return LoadedModel(path, fmt, meta, tensors, time.time(), size)


def optimize_model(model: LoadedModel,
                   target_dtype=np.float16) -> LoadedModel:
    """Parity: the loader's optimize entry point (tk_model_loader.c:1188-
    1301) — here a storage optimization: downcast f32 tensors to the
    target dtype (f16 halves the footprint; norms and small vectors are
    kept f32 for numerical headroom)."""
    out: Dict[str, np.ndarray] = {}
    for name, t in model.tensors.items():
        if t.dtype == np.float32 and t.ndim >= 2 and t.size > 4096:
            out[name] = t.astype(target_dtype)
        else:
            out[name] = t
    size = sum(t.nbytes for t in out.values())
    return LoadedModel(model.path, model.format, model.metadata, out,
                       model.loaded_at, size)


def validate_model(path: str) -> bool:
    """Parity: tk_model_loader validate (:1188) — header parse + tensor
    directory sanity, no full data read."""
    try:
        fmt = detect_format(path)
        if fmt is ModelFormat.GGUF:
            g = read_gguf_header(path)
            return len(g.tensors) > 0
        if fmt in (ModelFormat.SAFETENSORS, ModelFormat.NPZ):
            return bool(describe(path))
        return fmt is not ModelFormat.UNKNOWN
    except TrackieError:
        return False


class ModelCache:
    """Slotted LRU model cache with a memory budget (parity: the loader's
    cache slots + tk_memory_manager's eviction policy)."""

    def __init__(self, max_models: int = 4,
                 max_bytes: int = 8 * (1 << 30)):
        self.max_models = max_models
        self.max_bytes = max_bytes
        self._cache: "OrderedDict[str, LoadedModel]" = OrderedDict()
        self._lock = threading.Lock()
        self.evictions = 0

    def get(self, path: str) -> LoadedModel:
        with self._lock:
            if path in self._cache:
                self._cache.move_to_end(path)
                return self._cache[path]
        model = load_model(path)
        with self._lock:
            self._cache[path] = model
            self._cache.move_to_end(path)
            self._evict_locked()
        return model

    def preload(self, paths: List[str]) -> None:
        """Parity: tk_model_loader preload (:1355)."""
        for p in paths:
            self.get(p)

    def _evict_locked(self) -> None:
        def total() -> int:
            return sum(m.size_bytes for m in self._cache.values())

        while (len(self._cache) > self.max_models
               or total() > self.max_bytes):
            if len(self._cache) <= 1:
                break
            evicted_path, _ = self._cache.popitem(last=False)
            self.evictions += 1
            log.info("evicted model %s from cache", evicted_path)

    @property
    def size(self) -> int:
        with self._lock:
            return len(self._cache)
