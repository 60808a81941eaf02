"""whisper.cpp GGML ingestion (models/ggml_reader + whisper_from_ggml).

The writer here independently reproduces whisper.cpp's
convert-pt-to-ggml.py recipe (squeeze, conv-bias (n,1) reshape,
reversed dims, f16 for matrices with the converter's f32 exception
list, raw data with no alignment) so the reader is validated against
the format spec, not against itself.
"""

import struct

import numpy as np
import jax
import pytest

from tests.test_convert import TestWhisperFromTorch as _WhisperStateBuilder
from tests.test_loader import _quant_q8_0

GGML_MAGIC = 0x67676D6C

_HPARAM_ORDER = (
    "n_vocab", "n_audio_ctx", "n_audio_state", "n_audio_head",
    "n_audio_layer", "n_text_ctx", "n_text_state", "n_text_head",
    "n_text_layer", "n_mels", "ftype",
)

# convert-pt-to-ggml.py keeps these f32 even in f16 models.
_F32_EXCEPTIONS = {
    "encoder.conv1.bias", "encoder.conv2.bias",
    "encoder.positional_embedding", "decoder.positional_embedding",
}


def write_ggml_whisper(path, state, hparams, filters, vocab,
                       qtensors=None):
    """Test-side writer following whisper.cpp's converter exactly."""
    with open(path, "wb") as f:
        f.write(struct.pack("<i", GGML_MAGIC))
        for k in _HPARAM_ORDER:
            f.write(struct.pack("<i", hparams[k]))
        f.write(struct.pack("<2i", *filters.shape))
        f.write(np.asarray(filters, "<f4").tobytes())
        f.write(struct.pack("<i", len(vocab)))
        for tok in vocab:
            f.write(struct.pack("<i", len(tok)) + tok)
        for name, arr in state.items():
            data = np.asarray(arr, np.float32).squeeze()
            if name in ("encoder.conv1.bias", "encoder.conv2.bias"):
                data = data.reshape(data.shape[0], 1)
            qtype = (qtensors or {}).get(name)
            if qtype == "q8_0":
                ftype, payload = 8, _quant_q8_0(data)
            elif data.ndim < 2 or name in _F32_EXCEPTIONS:
                ftype, payload = 0, data.astype("<f4").tobytes()
            else:
                ftype, payload = 1, data.astype("<f2").tobytes()
            nm = name.encode()
            f.write(struct.pack("<3i", data.ndim, len(nm), ftype))
            for i in range(data.ndim):
                f.write(struct.pack("<i", data.shape[data.ndim - 1 - i]))
            f.write(nm + payload)


def _tiny_file(tmp_path, qtensors=None, hparam_override=None):
    from trackiellm_tpu.models import whisper as W

    cfg = W.WhisperConfig.test()
    ref = W.init_whisper(jax.random.PRNGKey(7), cfg)
    for grp in ("enc", "dec", "cross"):
        for name in ("bq", "bv", "bo"):
            ref[grp][name] = jax.random.normal(
                jax.random.PRNGKey(hash((grp, name)) & 0xFFFF),
                ref[grp][name].shape) * 0.01
    state = _WhisperStateBuilder()._to_torch_state(ref, cfg)
    # Pre-round matrices through f16 so the writer's f16 cast is
    # lossless and the roundtrip can be compared exactly.
    for name, arr in state.items():
        a = np.asarray(arr, np.float32)
        if a.squeeze().ndim >= 2 and name not in _F32_EXCEPTIONS:
            state[name] = a.astype(np.float16).astype(np.float32)
        else:
            state[name] = a
    # The encoder's sinusoidal buffer is present in real files (and
    # ignored by the converter path).
    state["encoder.positional_embedding"] = np.zeros(
        (cfg.n_audio_ctx, cfg.d_model), np.float32)

    hparams = {
        "n_vocab": cfg.vocab_size, "n_audio_ctx": cfg.n_audio_ctx,
        "n_audio_state": cfg.d_model, "n_audio_head": cfg.n_heads,
        "n_audio_layer": cfg.n_audio_layers, "n_text_ctx": cfg.n_text_ctx,
        "n_text_state": cfg.d_model, "n_text_head": cfg.n_heads,
        "n_text_layer": cfg.n_text_layers, "n_mels": cfg.n_mels,
        "ftype": 1,
    }
    hparams.update(hparam_override or {})
    filters = np.arange(cfg.n_mels * 6, dtype=np.float32).reshape(
        cfg.n_mels, 6) / 100.0
    vocab = [b"he", b"llo", b" wor", b"ld", "ç".encode(), b"!"]
    path = str(tmp_path / "ggml-test.bin")
    write_ggml_whisper(path, state, hparams, filters, vocab,
                       qtensors=qtensors)
    return path, state, cfg, filters


class TestGGMLWhisper:
    def test_roundtrip_matches_torch_route(self, tmp_path):
        from trackiellm_tpu.models.convert import (
            whisper_from_ggml, whisper_from_torch)

        path, state, cfg, filters = _tiny_file(tmp_path)
        ref_params, _ = whisper_from_torch(state)
        params, got_cfg, tok, got_filters = whisper_from_ggml(path)

        assert got_cfg.n_mels == cfg.n_mels
        assert got_cfg.d_model == cfg.d_model
        assert got_cfg.n_audio_layers == cfg.n_audio_layers
        assert got_cfg.n_text_layers == cfg.n_text_layers
        # Shape derivation alone would give d64 -> 1 head; the hparams
        # must win (cfg.test uses 2 heads of d32).
        assert got_cfg.n_heads == cfg.n_heads == 2
        np.testing.assert_array_equal(got_filters, filters)

        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_params))
        flat_got = dict(jax.tree_util.tree_leaves_with_path(params))
        assert flat_ref.keys() == flat_got.keys()
        for key, leaf in flat_ref.items():
            np.testing.assert_allclose(
                np.asarray(flat_got[key]), np.asarray(leaf),
                rtol=1e-6, err_msg=str(key))

    def test_embedded_vocab_tokenizer(self, tmp_path):
        from trackiellm_tpu.models.convert import whisper_from_ggml

        path, _, _, _ = _tiny_file(tmp_path)
        _, _, tok, _ = whisper_from_ggml(path)
        assert tok.decode([0, 1, 2, 3, 5]) == "hello world!"
        assert tok.decode_token(4) == "ç"
        # Specials beyond the stored vocab decode to nothing.
        assert tok.decode([0, 50_000, 1]) == "hello"

    def test_quantized_tensor(self, tmp_path):
        from trackiellm_tpu.models.ggml_reader import read_ggml_whisper

        name = "decoder.token_embedding.weight"
        path, state, _, _ = _tiny_file(tmp_path, qtensors={name: "q8_0"})
        g = read_ggml_whisper(path)
        orig = np.asarray(state[name], np.float32)
        got = g.tensors[name]
        assert got.shape == orig.shape
        # q8_0 is lossy; the error bound is scale/2 per element.
        scale = np.abs(orig).max() / 127.0
        assert np.abs(got - orig).max() <= scale * 0.51 + 1e-7

    def test_hparam_mismatch_raises(self, tmp_path):
        from trackiellm_tpu.models.convert import whisper_from_ggml
        from trackiellm_tpu.utils.errors import TrackieError

        path, _, _, _ = _tiny_file(
            tmp_path, hparam_override={"n_mels": 128})
        with pytest.raises(TrackieError, match="n_mels"):
            whisper_from_ggml(path)

    def test_detect_and_describe(self, tmp_path):
        from trackiellm_tpu.models.loader import (
            ModelFormat, describe, detect_format)

        path, _, cfg, _ = _tiny_file(tmp_path)
        assert detect_format(path) is ModelFormat.GGML
        info = describe(path)
        assert info["architecture"] == "whisper"
        assert info["hparams"]["n_mels"] == cfg.n_mels
        assert info["hparams"]["n_audio_layer"] == cfg.n_audio_layers

    def test_bad_magic_raises(self, tmp_path):
        from trackiellm_tpu.models.ggml_reader import read_ggml_whisper
        from trackiellm_tpu.utils.errors import TrackieError

        p = tmp_path / "not_ggml.bin"
        p.write_bytes(b"XXXX" + b"\x00" * 64)
        with pytest.raises(TrackieError, match="magic"):
            read_ggml_whisper(str(p))

    def test_transcribe_through_asr(self, tmp_path):
        """The GGML route drives WhisperASR end-to-end (wiring check:
        params + hparams-derived config + embedded tokenizer)."""
        from trackiellm_tpu.audio.asr import WhisperASR
        from trackiellm_tpu.models.convert import whisper_from_ggml

        path, _, _, _ = _tiny_file(tmp_path)
        params, cfg, tok, _ = whisper_from_ggml(path)
        asr = WhisperASR(params, cfg, tokenizer=tok, max_tokens=4)
        out = asr.transcribe(
            np.zeros(int(0.2 * 16000), np.float32))
        assert isinstance(out, str)

    def test_load_model_frontend(self, tmp_path):
        from trackiellm_tpu.models.loader import (ModelFormat, load_model)

        path, state, _, _ = _tiny_file(tmp_path)
        m = load_model(path)
        assert m.format is ModelFormat.GGML
        assert m.metadata["hparams"]["n_mels"] == 80
        assert "encoder.conv1.weight" in m.tensors
        assert m.size_bytes > 0
