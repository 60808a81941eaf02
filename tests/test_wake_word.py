"""Wake-word validation harness (VERDICT round-2 item 10): the conv
KWS, trained a few hundred steps in-test on a synthetic keyword /
imposter set, must achieve low false-accept AND false-reject — and
beat the energy fallback, which by construction cannot separate
same-energy sounds (Porcupine's contract: keyword spotting, not
loudness detection — src/audio/tk_wake_word_porcupine.c:15)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.audio.wake_word import (
    PhraseWakeWord,
    WakeWordConfig,
    init_wake_word,
    train_wake_word,
    wake_word_score,
)
from trackiellm_tpu.ops.mel import log_mel_spectrogram

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

SR = 16_000
WINDOW = 76 * 160 + 240  # NeuralWakeWord's ring size


def _tone_pair(rng, f1, f2, amp=0.1):
    """Two-tone 'phrase': f1 then f2, fixed RMS, jittered phase+noise."""
    t = np.arange(WINDOW // 2) / SR
    a = amp * np.sin(2 * np.pi * f1 * t + rng.uniform(0, 6.28))
    b = amp * np.sin(2 * np.pi * f2 * t + rng.uniform(0, 6.28))
    x = np.concatenate([a, b])[:WINDOW]
    return (x + 0.02 * rng.standard_normal(WINDOW)).astype(np.float32)


def _keyword(rng):
    return _tone_pair(rng, 600.0, 1100.0)


def _imposter(rng, kind):
    if kind == 0:                       # reversed phrase (order test)
        return _tone_pair(rng, 1100.0, 600.0)
    if kind == 1:                       # single mid tone
        return _tone_pair(rng, 850.0, 850.0)
    if kind == 2:                       # same-RMS white noise burst
        return (0.1 * rng.standard_normal(WINDOW)).astype(np.float32)
    # near-silence (the detector must not fire on quiet rooms)
    return (0.001 * rng.standard_normal(WINDOW)).astype(np.float32)


def _mel(audio):
    m = log_mel_spectrogram(jnp.asarray(audio), n_mels=40)
    return m[:, -76:]


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    train_x, train_y = [], []
    for i in range(48):
        train_x.append(_mel(_keyword(rng)))
        train_y.append(1)
        train_x.append(_mel(_imposter(rng, i % 4)))
        train_y.append(0)
    cfg = WakeWordConfig()
    params = init_wake_word(jax.random.PRNGKey(1), cfg)
    params = train_wake_word(params, cfg, jnp.stack(train_x),
                             jnp.asarray(train_y), steps=300)
    return params, cfg


class TestWakeWordFAFR:
    def test_kws_beats_energy_fallback(self, trained):
        params, cfg = trained
        rng = np.random.default_rng(99)  # held-out set
        kw = [_keyword(rng) for _ in range(24)]
        imp = [_imposter(rng, i % 4) for i in range(24)]

        kw_scores = [float(wake_word_score(params, cfg, _mel(a)))
                     for a in kw]
        imp_scores = [float(wake_word_score(params, cfg, _mel(a)))
                      for a in imp]
        fr = sum(s < cfg.sensitivity for s in kw_scores) / len(kw)
        fa = sum(s >= cfg.sensitivity for s in imp_scores) / len(imp)

        # The energy fallback on the same held-out set: every clip is
        # equally loud, so it accepts (nearly) everything.
        def energy_rate(clips):
            # Threshold tuned to the set's loudness (clip power 0.005)
            # — the fairest possible energy detector still cannot
            # separate same-loudness sounds.
            hits = 0
            for a in clips:
                det = PhraseWakeWord(energy_threshold=0.002)
                fired = any(det(a[i:i + 1600])
                            for i in range(0, len(a) - 1600, 1600))
                hits += fired
            return hits / len(clips)

        fa_energy = energy_rate(imp)
        fr_energy = 1.0 - energy_rate(kw)

        assert fr <= 0.15, f"false-reject {fr} (scores {kw_scores[:5]})"
        assert fa <= 0.15, f"false-accept {fa} (scores {imp_scores[:5]})"
        # Strictly better than loudness detection.
        assert fa + fr < fa_energy + fr_energy
        # The fallback accepts every LOUD imposter (3 of 4 kinds).
        assert fa_energy > 0.6

    def test_streaming_wrapper_fires_on_keyword(self, trained):
        from trackiellm_tpu.audio.wake_word import NeuralWakeWord

        params, cfg = trained
        rng = np.random.default_rng(7)
        det = NeuralWakeWord(params, cfg)
        fired = False
        audio = np.concatenate([np.zeros(3200, np.float32),
                                _keyword(rng)])
        for i in range(0, len(audio) - 1600, 1600):
            fired = det(audio[i:i + 1600]) or fired
        assert fired

    def test_streaming_wrapper_quiet_no_fire(self, trained):
        from trackiellm_tpu.audio.wake_word import NeuralWakeWord

        params, cfg = trained
        det = NeuralWakeWord(params, cfg)
        audio = np.zeros(WINDOW, np.float32)
        assert not any(det(audio[i:i + 1600])
                       for i in range(0, len(audio) - 1600, 1600))


class TestBundledDefaultArtifact:
    """The committed pretrained spotter (VERDICT r4 #6): loads from the
    package, separates held-out keyword/imposter clips, and round-trips
    through save/load exactly."""

    def test_loads_and_separates(self):
        # Evaluate with the TRAINER's own generators (single source of
        # truth for the clip distribution — review round-5 finding:
        # drifting test-local copies would score the artifact on a
        # distribution it was never trained on).
        from tools.train_wake_word_default import imposter, keyword, mel

        from trackiellm_tpu.audio.wake_word import load_default_wake_word

        det = load_default_wake_word()
        rng = np.random.default_rng(123)  # fresh held-out clips
        kw_scores = [float(wake_word_score(det.params, det.cfg,
                                           mel(keyword(rng))))
                     for _ in range(8)]
        imp_scores = [float(wake_word_score(det.params, det.cfg,
                                            mel(imposter(rng, i % 4))))
                      for i in range(8)]
        assert sum(s >= det.cfg.sensitivity for s in kw_scores) >= 7, \
            kw_scores
        assert sum(s >= det.cfg.sensitivity for s in imp_scores) <= 1, \
            imp_scores

    def test_save_load_roundtrip(self, trained, tmp_path):
        from trackiellm_tpu.audio.wake_word import (load_wake_word,
                                                    save_wake_word)

        params, cfg = trained
        p = str(tmp_path / "ww.npz")
        save_wake_word(p, params, cfg)
        params2, cfg2 = load_wake_word(p)
        assert cfg2 == cfg
        rng = np.random.default_rng(5)
        m = _mel(_keyword(rng))
        np.testing.assert_allclose(
            float(wake_word_score(params, cfg, m)),
            float(wake_word_score(params2, cfg2, m)), rtol=1e-6)


class TestOpenWakeWordVerifierHead:
    """Geometry-chained ingestion of the openwakeword per-keyword
    verifier (a plain dense stack; the staged half of the openwakeword
    route — the embedding tower stays a first-contact decision)."""

    def _stack_state(self, rng, dims=(96 * 16, 128, 64, 1),
                     transpose=False, shuffle=True):
        state = {}
        names = []
        for i in range(len(dims) - 1):
            w = rng.standard_normal((dims[i], dims[i + 1])).astype(
                np.float32) * 0.1
            b = rng.standard_normal(dims[i + 1]).astype(np.float32) * 0.1
            state[f"model/dense_{i}/kernel:0"] = w.T if transpose else w
            state[f"model/dense_{i}/bias:0"] = b
            names.append((w, b))
        if shuffle:
            keys = list(state)
            rng.shuffle(keys)
            state = {k: state[k] for k in keys}
        return state, names

    def _ref(self, layers, x):
        import jax.nn

        h = x
        for i, (w, b) in enumerate(layers):
            h = h @ w + b
            if i + 1 < len(layers):
                h = np.maximum(h, 0.0)
        return float(jax.nn.sigmoid(jnp.asarray(h[0])))

    def test_chains_by_geometry(self):
        from trackiellm_tpu.models.convert import (
            openwakeword_verifier_from_onnx)

        rng = np.random.default_rng(0)
        state, layers = self._stack_state(rng)
        head = openwakeword_verifier_from_onnx(state)
        x = rng.standard_normal(96 * 16).astype(np.float32) * 0.2
        got = head(x)
        assert abs(got - self._ref(layers, x)) < 1e-5

    def test_transposed_export_chains_too(self):
        from trackiellm_tpu.models.convert import (
            openwakeword_verifier_from_onnx)

        rng = np.random.default_rng(1)
        state, layers = self._stack_state(rng, transpose=True)
        head = openwakeword_verifier_from_onnx(state)
        x = rng.standard_normal(96 * 16).astype(np.float32) * 0.2
        assert abs(head(x) - self._ref(layers, x)) < 1e-5

    def test_nonchaining_inventory_fails_loudly(self):
        from trackiellm_tpu.models.convert import (
            openwakeword_verifier_from_onnx)
        from trackiellm_tpu.utils.errors import TrackieError

        with pytest.raises(TrackieError):
            openwakeword_verifier_from_onnx(
                {"w": np.zeros((4, 5), np.float32)})

    def test_through_onnx_file(self, tmp_path):
        from trackiellm_tpu.models.convert import (
            openwakeword_verifier_from_onnx)
        from trackiellm_tpu.models.onnx_reader import (
            read_onnx_initializers, write_onnx_initializers)

        rng = np.random.default_rng(2)
        state, layers = self._stack_state(rng, dims=(32, 16, 1),
                                          shuffle=False)
        p = str(tmp_path / "verifier.onnx")
        write_onnx_initializers(p, state)
        head = openwakeword_verifier_from_onnx(read_onnx_initializers(p))
        x = rng.standard_normal(32).astype(np.float32)
        assert abs(head(x) - self._ref(layers, x)) < 1e-5
