"""AST sound classifier (models/ast.py) vs the transformers oracle.

The ambient-sound stage's published-checkpoint route (the TrOCR move
applied to audio): an HF ``ASTForAudioClassification`` converts through
``convert.ast_from_hf`` and the JAX forward must match its logits
exactly — strided overlapping patch conv, CLS+DIST prefixes, the ViT
stack and the (CLS+DIST)/2 pooled head all load-bearing. Parity
target: the reference's ONNX sound classifier
(src/audio/tk_sound_classifier.c:14, classes h:31-39)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import ast as ast_model
from trackiellm_tpu.models import convert as C

pytestmark = pytest.mark.slow  # model-zoo tier: excluded from `make smoke`

LABELS = ["Smoke detector, smoke alarm", "Siren", "Water tap, faucet",
          "Dog", "Speech"]


def _build_oracle(fstride=8, tstride=8):
    from transformers import ASTConfig, ASTForAudioClassification

    hf_cfg = ASTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, patch_size=8, frequency_stride=fstride,
        time_stride=tstride, max_length=64, num_mel_bins=16,
        num_labels=len(LABELS),
        id2label={i: n for i, n in enumerate(LABELS)},
        label2id={n: i for i, n in enumerate(LABELS)})
    torch.manual_seed(5)
    model = ASTForAudioClassification(hf_cfg).eval()
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim >= 2:
                p.normal_(0.0, 0.08)
            elif "bias" in name:
                p.normal_(0.0, 0.02)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return model, state, hf_cfg.to_dict()


@pytest.fixture(scope="module", params=[(8, 8), (8, 4)])
def oracle(request):
    f, t = request.param
    model, state, cfgdict = _build_oracle(f, t)
    params, cfg, labels = C.ast_from_hf(state, cfgdict)
    spec = np.random.RandomState(3).randn(64, 16).astype(np.float32)
    return model, params, cfg, labels, spec


class TestASTOracle:
    def test_config_and_labels(self, oracle):
        _, _, cfg, labels, _ = oracle
        assert cfg.dim == 32 and cfg.n_layers == 2
        assert cfg.n_labels == len(LABELS)
        assert labels == LABELS

    def test_logits_match_oracle(self, oracle):
        model, params, cfg, _, spec = oracle
        with torch.no_grad():
            want = model(torch.from_numpy(spec)[None]).logits[0].numpy()
        got = np.asarray(ast_model.ast_logits(params, cfg,
                                              jnp.asarray(spec)))
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    def test_overlapping_patches_load_bearing(self, oracle):
        """With stride < patch the conv windows overlap; a naive
        non-overlapping reshape would change the token count — pin the
        geometry."""
        _, _, cfg, _, _ = oracle
        assert cfg.n_patches == cfg.f_dim * cfg.t_dim
        if cfg.tstride < cfg.patch:
            assert cfg.t_dim > (cfg.n_frames // cfg.patch)

    def test_geometry_mismatch_raises(self, oracle):
        from trackiellm_tpu.utils.errors import TrackieError

        model, _, _, _, _ = oracle
        _, state, cfgdict = _build_oracle()
        cfgdict["max_length"] = 128  # lies about the frame extent
        with pytest.raises(TrackieError, match="position embeddings"):
            C.ast_from_hf(state, cfgdict)


class TestSoundClassifierEngine:
    def test_label_mapping_and_threshold(self, oracle):
        _, params, cfg, labels, spec = oracle
        eng = ast_model.ASTSoundClassifier(
            params, cfg, labels, threshold=0.5,
            features_fn=lambda audio: spec)
        assert set(eng._class_ids) == {"alarm", "siren",
                                       "water_running", "dog_bark"}
        out = eng(np.zeros(16000, np.float32))
        assert out is None or out in eng._class_ids

    def test_forced_alarm_detection(self, oracle):
        """Bias the head so the alarm label saturates: the engine must
        report 'alarm' — pins the id mapping direction."""
        _, params, cfg, labels, spec = oracle
        boosted = dict(params)
        hb = np.asarray(params["head_b"]).copy()
        hb[0] = 20.0  # label 0 = smoke alarm
        boosted["head_b"] = jnp.asarray(hb)
        eng = ast_model.ASTSoundClassifier(
            boosted, cfg, labels, features_fn=lambda audio: spec)
        assert eng(np.zeros(8000, np.float32)) == "alarm"

    def test_features_shape(self):
        cfg = ast_model.ASTConfig.tiny()
        feats = ast_model.ast_features(
            np.random.RandomState(0).randn(16000).astype(np.float32),
            cfg)
        assert feats.shape == (cfg.n_frames, cfg.n_mels)
        assert np.isfinite(feats).all()

    def test_pipeline_sound_fn_surface(self, oracle):
        """Plugs into the audio pipeline's sound_fn contract: window
        in, class name or None out (passive-listening parity)."""
        from trackiellm_tpu.audio.pipeline import AudioPipeline

        _, params, cfg, labels, spec = oracle
        eng = ast_model.ASTSoundClassifier(
            params, cfg, labels, features_fn=lambda audio: spec)
        pipe = AudioPipeline(sound_fn=eng)
        assert pipe.sound_fn is eng
