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
