"""TrOCR (models/trocr.py) vs the transformers oracle.

VisionEncoderDecoderModel with a ViT encoder (trocr-base class) and a
DeiT encoder (trocr-small class, distillation token): encoder
features, teacher-forced decoder logits and greedy ids must all match
exactly. This is the OCR stage's published-checkpoint route (VERDICT
r3 item 4) — parity target: the reference's Tesseract engine
(src/vision/tk_text_recognition.cpp:71-104)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import trocr as T

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


def _build_oracle(encoder: str):
    from transformers import (TrOCRConfig, ViTConfig,
                              VisionEncoderDecoderConfig,
                              VisionEncoderDecoderModel)

    if encoder == "vit":
        enc = ViTConfig(hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        image_size=32, patch_size=8, num_channels=3)
    else:
        from transformers import DeiTConfig

        enc = DeiTConfig(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         image_size=32, patch_size=8, num_channels=3)
    dec = TrOCRConfig(vocab_size=100, d_model=32, decoder_layers=2,
                      decoder_attention_heads=4, decoder_ffn_dim=64,
                      max_position_embeddings=64,
                      use_learned_position_embeddings=True,
                      layernorm_embedding=True, scale_embedding=False,
                      activation_function="gelu",
                      decoder_start_token_id=2, eos_token_id=2,
                      pad_token_id=1)
    cfg = VisionEncoderDecoderConfig.from_encoder_decoder_configs(enc,
                                                                  dec)
    cfg.decoder_start_token_id = 2
    cfg.pad_token_id = 1
    torch.manual_seed(3 if encoder == "vit" else 4)
    model = VisionEncoderDecoderModel(cfg).eval()
    # Randomize instead of default init where init is degenerate
    # (layernorms stay 1/0 — that's fine; biases get noise).
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim >= 2:
                p.normal_(0.0, 0.08)
            elif "bias" in name:
                p.normal_(0.0, 0.02)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return model, state, cfg.to_dict()


@pytest.fixture(scope="module", params=["vit", "deit"])
def oracle(request):
    model, state, cfgdict = _build_oracle(request.param)
    params, cfg = C.trocr_from_hf(state, cfgdict)
    px = np.random.RandomState(7).rand(3, 32, 32).astype(np.float32)
    return model, params, cfg, px, request.param


class TestTrOCROracle:
    def test_config_inference(self, oracle):
        _, _, cfg, _, kind = oracle
        assert cfg.enc_dim == 32 and cfg.enc_layers == 2
        assert cfg.n_prefix == (2 if kind == "deit" else 1)
        assert cfg.d_model == 32 and cfg.dec_layers == 2
        assert cfg.decoder_start_id == 2 and cfg.eos_id == 2
        assert cfg.layernorm_embedding and not cfg.scale_embedding

    def test_encoder_features_match(self, oracle):
        model, params, cfg, px, _ = oracle
        with torch.no_grad():
            want = model.encoder(
                torch.from_numpy(px)[None]).last_hidden_state[0].numpy()
        got = np.asarray(T.encode(params, cfg, jnp.asarray(px)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_teacher_forced_logits_match(self, oracle):
        model, params, cfg, px, _ = oracle
        ids = np.array([2, 5, 9, 33, 7], np.int64)
        with torch.no_grad():
            want = model(pixel_values=torch.from_numpy(px)[None],
                         decoder_input_ids=torch.from_numpy(ids)[None]
                         ).logits[0].numpy()
        enc = T.encode(params, cfg, jnp.asarray(px))
        got = np.asarray(T.decoder_logits(
            params, cfg, enc, jnp.asarray(ids, jnp.int32)))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)

    def test_greedy_ids_match(self, oracle):
        """Full-budget greedy: every step's argmax must agree with a
        manual torch greedy loop (no early-EOS divergence hiding)."""
        model, params, cfg, px, _ = oracle
        n = cfg.max_len
        with torch.no_grad():
            enc_t = model.encoder(
                torch.from_numpy(px)[None]).last_hidden_state
            ids = [2]
            for _ in range(n):
                logits = model.decoder(
                    input_ids=torch.tensor([ids]),
                    encoder_hidden_states=enc_t).logits
                ids.append(int(logits[0, -1].argmax()))
        enc = T.encode(params, cfg, jnp.asarray(px))
        got = np.asarray(T.greedy_ids(params, cfg, enc))
        np.testing.assert_array_equal(got, np.asarray(ids[1:]))

    def test_prefix_is_load_bearing(self, oracle):
        """Zeroing the prefix tokens (CLS/DIST) must change encoder
        features — guards against silently dropping them."""
        model, params, cfg, px, _ = oracle
        base = np.asarray(T.encode(params, cfg, jnp.asarray(px)))
        broken = dict(params)
        broken["enc"] = dict(params["enc"],
                             prefix=jnp.zeros_like(
                                 params["enc"]["prefix"]))
        changed = np.asarray(T.encode(broken, cfg, jnp.asarray(px)))
        assert np.abs(base - changed).max() > 1e-3


class TestTrOCREngine:
    def test_engine_decodes_crops(self, oracle):
        _, params, cfg, _, _ = oracle

        def decode_ids(ids):
            return "".join(chr(97 + int(i) % 26) for i in ids)

        eng = T.TrOCREngine(params, cfg, decode_ids)
        crops = [np.random.RandomState(i).rand(20, 60)
                 for i in range(3)]
        texts = eng(crops)
        assert len(texts) == 3
        assert all(isinstance(t, str) for t in texts)

    def test_engine_plugs_into_vision_pipeline(self, oracle):
        """The engine satisfies the pipeline's ocr_fn surface: batch of
        crops in, list of texts out — the OCR auto-trigger path runs
        it end to end (tk_text_recognition parity surface)."""
        _, params, cfg, _, _ = oracle
        eng = T.TrOCREngine(params, cfg, lambda ids: "x" * len(ids))
        batch = np.stack([np.random.RandomState(9).rand(32, 128)] * 2)
        texts = eng(batch)
        assert len(texts) == 2
