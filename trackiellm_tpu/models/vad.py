"""Streaming voice-activity detection (Silero-class), JAX.

Parity target: the reference's Silero VAD ONNX session with speech-prob
threshold + SPEECH_STARTED/ENDED events (reference:
src/sensors/tk_vad_silero.c:25, tk_vad_silero.h:64-75, threshold control
:204; cortex config: 0.8 prob / 500 ms silence, tk_cortex_main.c:881-882).

Architecture: per-chunk log-mel features -> 2 conv layers -> GRU (the
streaming state) -> sigmoid speech probability. One chunk = 512 samples
(32 ms @ 16 kHz, Silero's framing). The GRU hidden state is explicit —
a pure (prob, state) step function that jits once and streams forever.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.ops.mel import mel_filterbank

CHUNK_SAMPLES = 512  # 32 ms @ 16 kHz


class VADConfig(NamedTuple):
    n_mels: int = 32
    n_fft: int = 256
    hop: int = 128
    conv_ch: int = 32
    hidden: int = 64

    @classmethod
    def default(cls) -> "VADConfig":
        return cls()


def _dft_power_bases(n_fft: int):
    n_freqs = n_fft // 2 + 1
    window = np.hanning(n_fft + 1)[:-1]
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return ((np.cos(ang) * window[:, None]).astype(np.float32),
            (np.sin(ang) * window[:, None]).astype(np.float32))


def init_vad(key: jax.Array, cfg: VADConfig = VADConfig()) -> Dict[str, Any]:
    k = iter(jax.random.split(key, 8))
    nxt = lambda: next(k)  # noqa: E731

    def dense(kk, cin, cout):
        s = 1.0 / math.sqrt(cin)
        return {"w": jax.random.uniform(kk, (cin, cout), jnp.float32, -s, s),
                "b": jnp.zeros((cout,), jnp.float32)}

    n_frames = (CHUNK_SAMPLES - cfg.n_fft) // cfg.hop + 1  # frames per chunk
    return {
        "conv1": dense(nxt(), cfg.n_mels, cfg.conv_ch),
        "conv2": dense(nxt(), cfg.conv_ch * n_frames, cfg.conv_ch),
        "gru_wi": dense(nxt(), cfg.conv_ch, 3 * cfg.hidden),
        "gru_wh": dense(nxt(), cfg.hidden, 3 * cfg.hidden),
        "out": dense(nxt(), cfg.hidden, 1),
    }


def init_state(cfg: VADConfig = VADConfig()) -> jnp.ndarray:
    return jnp.zeros((cfg.hidden,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def vad_step(params: Dict[str, Any], cfg: VADConfig, chunk: jnp.ndarray,
             state: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One 512-sample chunk -> (speech_prob scalar, new_state)."""
    cos_b, sin_b = _dft_power_bases(cfg.n_fft)
    n_frames = (CHUNK_SAMPLES - cfg.n_fft) // cfg.hop + 1
    idx = (jnp.arange(n_frames) * cfg.hop)[:, None] + jnp.arange(cfg.n_fft)
    frames = chunk[idx]  # (F, n_fft)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im
    fb = jnp.asarray(mel_filterbank(cfg.n_mels, cfg.n_fft, 16_000))
    feats = jnp.log10(jnp.maximum(power @ fb, 1e-10))  # (F, n_mels)

    h1 = jax.nn.relu(feats @ params["conv1"]["w"] + params["conv1"]["b"])
    flat = h1.reshape(-1)
    h2 = jax.nn.relu(flat @ params["conv2"]["w"] + params["conv2"]["b"])

    hidden = state.shape[0]
    gates = h2 @ params["gru_wi"]["w"] + params["gru_wi"]["b"]
    hg = state @ params["gru_wh"]["w"] + params["gru_wh"]["b"]
    r = jax.nn.sigmoid(gates[:hidden] + hg[:hidden])
    z = jax.nn.sigmoid(gates[hidden:2 * hidden] + hg[hidden:2 * hidden])
    n = jnp.tanh(gates[2 * hidden:] + r * hg[2 * hidden:])
    new_state = (1 - z) * n + z * state

    prob = jax.nn.sigmoid(new_state @ params["out"]["w"]
                          + params["out"]["b"])[0]
    return prob, new_state


class NeuralVAD:
    """Streaming wrapper over the neural VAD: carries the GRU state and
    re-chunks arbitrary-length input to the model's 512-sample frames
    (the pipeline feeds 100 ms = 1600-sample chunks). Returns the max
    speech probability across the frames of the chunk."""

    def __init__(self, params, cfg: VADConfig = VADConfig()):
        self.params = params
        self.cfg = cfg
        self.state = init_state(cfg)
        self._leftover = np.zeros(0, np.float32)

    def __call__(self, chunk) -> float:
        data = np.concatenate([self._leftover,
                               np.asarray(chunk, np.float32)])
        n_frames = len(data) // CHUNK_SAMPLES
        prob = 0.0
        for i in range(n_frames):
            frame = jnp.asarray(
                data[i * CHUNK_SAMPLES:(i + 1) * CHUNK_SAMPLES])
            p, self.state = vad_step(self.params, self.cfg, frame,
                                     self.state)
            prob = max(prob, float(p))
        self._leftover = data[n_frames * CHUNK_SAMPLES:]
        return prob

    def reset(self) -> None:
        self.state = init_state(self.cfg)
        self._leftover = np.zeros(0, np.float32)


class EnergyVAD:
    """Deterministic fallback VAD (log-energy hysteresis) — used when no
    trained weights are present and by tests that need a *predictable*
    speech gate. Same streaming interface as the neural VAD."""

    def __init__(self, energy_threshold: float = 1e-3):
        self.energy_threshold = energy_threshold

    def __call__(self, chunk: np.ndarray) -> float:
        e = float(np.mean(np.square(np.asarray(chunk, np.float32))))
        return 1.0 if e > self.energy_threshold else 0.0
