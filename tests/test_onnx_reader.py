"""Weights-only ONNX initializer reader (models/onnx_reader.py)."""

import numpy as np
import pytest

from trackiellm_tpu.models.onnx_reader import (
    read_onnx_initializers,
    write_onnx_initializers,
)


def test_roundtrip_multiple_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "conv.weight": rng.standard_normal((4, 3, 3, 3)).astype(np.float32),
        "conv.bias": rng.standard_normal((4,)).astype(np.float32),
        "emb": rng.standard_normal((7, 5)).astype(np.float16),
        "ids": np.arange(6, dtype=np.int64).reshape(2, 3),
        "mask": rng.integers(0, 255, (8,), dtype=np.uint8),
    }
    path = str(tmp_path / "model.onnx")
    write_onnx_initializers(path, tensors)
    got = read_onnx_initializers(path)
    assert set(got) == set(tensors)
    for name, want in tensors.items():
        assert got[name].dtype == want.dtype, name
        assert got[name].shape == want.shape, name
        np.testing.assert_array_equal(got[name], want)


def test_loader_surfaces_onnx_weights(tmp_path):
    from trackiellm_tpu.models.loader import ModelFormat, load_model

    tensors = {"w": np.ones((2, 2), np.float32)}
    path = str(tmp_path / "tiny.onnx")
    write_onnx_initializers(path, tensors)
    loaded = load_model(path)
    assert loaded.format is ModelFormat.ONNX
    np.testing.assert_array_equal(loaded.tensors["w"], tensors["w"])


def test_silero_shape_checkpoint_through_onnx(tmp_path):
    """A synthetic VAD-shaped checkpoint written as ONNX feeds the
    torch-layout converter (the ingestion path for published .onnx
    weights: read initializers -> name-map -> JAX params)."""
    from trackiellm_tpu.models.convert import vad_from_torch
    from trackiellm_tpu.models.vad import VADConfig

    cfg = VADConfig()
    rng = np.random.default_rng(1)
    n_frames = 4  # matches vad.CHUNK layout only loosely; shapes suffice
    state = {
        "conv1.weight": rng.standard_normal(
            (cfg.conv_ch, cfg.n_mels)).astype(np.float32),
        "conv1.bias": rng.standard_normal(cfg.conv_ch).astype(np.float32),
        "conv2.weight": rng.standard_normal(
            (cfg.conv_ch, cfg.conv_ch * n_frames)).astype(np.float32),
        "conv2.bias": rng.standard_normal(cfg.conv_ch).astype(np.float32),
        "gru.weight_ih": rng.standard_normal(
            (3 * cfg.hidden, cfg.conv_ch)).astype(np.float32),
        "gru.weight_hh": rng.standard_normal(
            (3 * cfg.hidden, cfg.hidden)).astype(np.float32),
        "gru.bias_ih": rng.standard_normal(3 * cfg.hidden).astype(np.float32),
        "gru.bias_hh": rng.standard_normal(3 * cfg.hidden).astype(np.float32),
        "out.weight": rng.standard_normal((1, cfg.hidden)).astype(np.float32),
        "out.bias": rng.standard_normal(1).astype(np.float32),
    }
    path = str(tmp_path / "vad.onnx")
    write_onnx_initializers(path, state)
    loaded = read_onnx_initializers(path)
    params, got_cfg = vad_from_torch(loaded)
    assert got_cfg.hidden == cfg.hidden
    np.testing.assert_allclose(np.asarray(params["conv1"]["b"]),
                               state["conv1.bias"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["gru_wi"]["w"]),
                               state["gru.weight_ih"].T, rtol=1e-6)


def _varint(v: int) -> bytes:
    # protobuf varint; negatives encode as 64-bit two's complement
    if v < 0:
        v += 1 << 64
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _wrap_model(tensor_msg: bytes) -> bytes:
    graph = _key(5, 2) + _varint(len(tensor_msg)) + tensor_msg
    return _key(7, 2) + _varint(len(graph)) + graph


def test_nonpacked_float_data_entries(tmp_path):
    """float_data written one entry per field (wire type 5) must keep
    the real 32-bit patterns (ADVICE round 2: they were zeroed)."""
    import struct

    vals = [1.5, -2.25, 3.0e-7]
    t = _key(8, 2) + _varint(1) + b"w"          # name
    t += _key(2, 0) + _varint(1)                 # data_type = FLOAT
    t += _key(1, 0) + _varint(3)                 # dims = [3]
    for v in vals:
        (bits,) = struct.unpack("<I", struct.pack("<f", v))
        t += _key(4, 5) + struct.pack("<I", bits)
    path = str(tmp_path / "nonpacked.onnx")
    with open(path, "wb") as f:
        f.write(_wrap_model(t))
    got = read_onnx_initializers(path)
    np.testing.assert_array_equal(got["w"], np.asarray(vals, np.float32))


def test_negative_int64_varints_sign_fold(tmp_path):
    """Negative int32/int64_data varints are 64-bit two's-complement on
    the wire; the reader must sign-fold them (ADVICE round 2)."""
    vals = [-1, -300, 7]
    t = _key(8, 2) + _varint(1) + b"i"
    t += _key(2, 0) + _varint(7)                 # data_type = INT64
    t += _key(1, 0) + _varint(3)
    for v in vals:
        t += _key(7, 0) + _varint(v)
    path = str(tmp_path / "negint.onnx")
    with open(path, "wb") as f:
        f.write(_wrap_model(t))
    got = read_onnx_initializers(path)
    assert got["i"].dtype == np.int64
    np.testing.assert_array_equal(got["i"], np.asarray(vals, np.int64))
