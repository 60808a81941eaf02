"""Wake-word detection.

Parity target: the reference's Porcupine wrapper with per-keyword
sensitivity (reference: src/audio/tk_wake_word_porcupine.c:15,
tk_audio_pipeline.h:88). Porcupine is a proprietary blob; the rebuild
ships a small conv keyword spotter over log-mel windows (the standard
open KWS architecture) with the same sensitivity-thresholded streaming
interface.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from trackiellm_tpu.ops.mel import log_mel_spectrogram


class WakeWordConfig(NamedTuple):
    n_mels: int = 40
    n_frames: int = 76       # ~0.76 s window
    ch: int = 16
    sensitivity: float = 0.5

    @classmethod
    def default(cls) -> "WakeWordConfig":
        return cls()


def _conv_init(key, kh, kw, cin, cout):
    s = 1.0 / math.sqrt(kh * kw * cin)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                                    -s, s),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_wake_word(key: jax.Array,
                   cfg: WakeWordConfig = WakeWordConfig()) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    s = 1.0 / math.sqrt(2 * cfg.ch)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 1, cfg.ch // 2),
        "conv2": _conv_init(ks[1], 3, 3, cfg.ch // 2, cfg.ch),
        # Head reads TWO temporal-half poolings (order sensitivity: a
        # phrase and its reversal must be separable — a single global
        # mean pool cannot tell "ba-dum" from "dum-ba").
        "out_w": jax.random.uniform(ks[2], (2 * cfg.ch, 1), jnp.float32,
                                    -s, s),
        "out_b": jnp.zeros((1,), jnp.float32),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def wake_word_score(params: Dict[str, Any], cfg: WakeWordConfig,
                    log_mel: jnp.ndarray) -> jnp.ndarray:
    """(n_mels, n_frames) window -> keyword probability scalar.

    Pooling is over (mel, time) per TIME HALF, concatenated — keeps
    phrase order visible to the head (out_w is (2*ch, 1); a legacy
    (ch, 1) head falls back to one global pool)."""
    x = log_mel[None, :, :, None]
    for name in ("conv1", "conv2"):
        p = params[name]
        x = lax.conv_general_dilated(
            x, p["w"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + p["b"]
        x = jax.nn.relu(x)
    if params["out_w"].shape[0] == 2 * x.shape[-1]:
        half = x.shape[2] // 2
        pooled = jnp.concatenate([
            jnp.mean(x[:, :, :half], axis=(1, 2))[0],
            jnp.mean(x[:, :, half:], axis=(1, 2))[0]])
    else:  # legacy single-pool checkpoints
        pooled = jnp.mean(x, axis=(1, 2))[0]
    return jax.nn.sigmoid(pooled @ params["out_w"] + params["out_b"])[0]


def train_wake_word(params: Dict[str, Any], cfg: WakeWordConfig,
                    mels: jnp.ndarray, labels: jnp.ndarray,
                    steps: int = 300, lr: float = 3e-3) -> Dict[str, Any]:
    """Fit the conv KWS on (B, n_mels, n_frames) log-mel windows with
    0/1 labels (BCE). The Porcupine replacement has no ingestible
    published weights (proprietary blob, tk_wake_word_porcupine.c:15),
    so deployments TRAIN the spotter on recorded keyword/imposter
    windows; tests/test_wake_word.py validates FA/FR on a synthetic
    set this way."""
    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, batch, y):
        scores = jax.vmap(lambda m: wake_word_score(p, cfg, m))(batch)
        eps = 1e-6
        s = jnp.clip(scores, eps, 1 - eps)
        return -jnp.mean(y * jnp.log(s) + (1 - y) * jnp.log(1 - s))

    @jax.jit
    def step(p, o, batch, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, y)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    y = labels.astype(jnp.float32)
    for _ in range(steps):
        params, opt_state, _ = step(params, opt_state, mels, y)
    return params


class NeuralWakeWord:
    """Streaming wrapper: ring-buffers audio, scores a sliding window."""

    def __init__(self, params, cfg: WakeWordConfig = WakeWordConfig(),
                 sample_rate: int = 16_000, hop: int = 160):
        self.params = params
        self.cfg = cfg
        self._window = np.zeros(cfg.n_frames * hop + 240, np.float32)

    def __call__(self, chunk: np.ndarray) -> bool:
        return self.process(chunk)

    def process(self, chunk: np.ndarray) -> bool:
        n = len(chunk)
        self._window = np.roll(self._window, -n)
        self._window[-n:] = chunk
        mel = log_mel_spectrogram(jnp.asarray(self._window),
                                  n_mels=self.cfg.n_mels)
        score = float(wake_word_score(self.params, self.cfg,
                                      mel[:, -self.cfg.n_frames:]))
        return score >= self.cfg.sensitivity


class PhraseWakeWord:
    """Deterministic fallback/testing detector: triggers on an energy
    burst pattern (N consecutive loud chunks). Lets the full pipeline
    run hardware-free, like the reference's TK_MOCK_SENSORS builds."""

    def __init__(self, consecutive: int = 3, energy_threshold: float = 0.01):
        self.consecutive = consecutive
        self.energy_threshold = energy_threshold
        self._streak = 0

    def __call__(self, chunk: np.ndarray) -> bool:
        return self.process(chunk)

    def process(self, chunk: np.ndarray) -> bool:
        e = float(np.mean(np.square(np.asarray(chunk, np.float32))))
        self._streak = self._streak + 1 if e > self.energy_threshold else 0
        if self._streak >= self.consecutive:
            self._streak = 0
            return True
        return False


# ---------------------------------------------------------------------------
# Persistence + the bundled default artifact
# ---------------------------------------------------------------------------

_DEFAULT_ARTIFACT = "wake_word_default.npz"


def save_wake_word(path: str, params: Dict[str, Any],
                   cfg: WakeWordConfig) -> None:
    """Persist a trained spotter as one npz (weights + config row)."""
    flat = {f"{k}.{kk}": np.asarray(v)
            for k, lay in params.items()
            if isinstance(lay, dict) for kk, v in lay.items()}
    flat.update({k: np.asarray(v) for k, v in params.items()
                 if not isinstance(v, dict)})
    flat["_config"] = np.asarray(
        [cfg.n_mels, cfg.n_frames, cfg.ch, cfg.sensitivity], np.float32)
    np.savez(path, **flat)


def load_wake_word(path: str):
    """Load a :func:`save_wake_word` artifact -> (params, cfg)."""
    with np.load(path) as z:
        c = z["_config"]
        cfg = WakeWordConfig(n_mels=int(c[0]), n_frames=int(c[1]),
                             ch=int(c[2]), sensitivity=float(c[3]))
        params: Dict[str, Any] = {}
        for k in z.files:
            if k == "_config":
                continue
            if "." in k:
                top, sub = k.split(".", 1)
                params.setdefault(top, {})[sub] = jnp.asarray(z[k])
            else:
                params[k] = jnp.asarray(z[k])
    return params, cfg


def load_default_wake_word(sample_rate: int = 16_000) -> "NeuralWakeWord":
    """The bundled pretrained spotter (models/pretrained/), trained by
    ``tools/train_wake_word_default.py`` on the synthetic keyword
    prototype set with held-out FA/FR recorded in BASELINE.md — so
    ``demo`` runs REAL keyword spotting out of the box instead of the
    energy fallback (the reference ships working Porcupine weights,
    tk_wake_word_porcupine.c:15; its proprietary blob cannot be
    ingested, so the rebuild ships a trained open artifact instead).
    Deployments retrain on recorded audio of their actual phrase with
    the same tool."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models", "pretrained",
        _DEFAULT_ARTIFACT)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"bundled wake-word artifact missing: {path} — run "
            "tools/train_wake_word_default.py")
    params, cfg = load_wake_word(path)
    return NeuralWakeWord(params, cfg, sample_rate=sample_rate)


# ---------------------------------------------------------------------------
# openwakeword verifier head
# ---------------------------------------------------------------------------

class VerifierHead:
    """An openwakeword per-keyword VERIFIER model: a plain dense stack
    over speech-embedding windows (Flatten -> Dense+ReLU ... ->
    Dense(1) -> sigmoid). Ingested from the published per-keyword ONNX
    by :func:`trackiellm_tpu.models.convert.openwakeword_verifier_from_onnx`.

    Scope note (ROADMAP deferral, narrowed round 5): this covers the
    HEAD only. The Google speech-embedding tower inside openwakeword
    has no offline-pinnable topology; scoring raw audio end-to-end
    still needs that tower ingested on first real-file contact —
    until then the head validates the staged ingestion path and
    serves deployments that compute embeddings upstream."""

    def __init__(self, layers):
        # layers: list of (w (in, out), b (out,)) jnp arrays.
        self.layers = [(jnp.asarray(w, jnp.float32),
                        jnp.asarray(b, jnp.float32))
                       for w, b in layers]
        self.in_dim = int(self.layers[0][0].shape[0])

    def __call__(self, embeddings) -> float:
        x = jnp.asarray(embeddings, jnp.float32).reshape(-1)
        if x.shape[0] != self.in_dim:
            raise ValueError(
                f"verifier expects {self.in_dim} flattened embedding "
                f"values, got {x.shape[0]}")
        for i, (w, b) in enumerate(self.layers):
            x = x @ w + b
            if i + 1 < len(self.layers):
                x = jax.nn.relu(x)
        return float(jax.nn.sigmoid(x[0]))
