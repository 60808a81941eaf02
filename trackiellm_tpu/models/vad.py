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


class SileroConfig(NamedTuple):
    """Topology of the published Silero VAD v5 ONNX graph (16 kHz
    branch) — see docs/REAL_WEIGHTS.md for the initializer name table.
    Flags marked UNVERIFIED there: ``stft_pad`` (reflect padding) and
    the encoder strides."""

    context: int = 64
    n_fft: int = 256
    hop: int = 128
    stft_pad: int = 64
    n_freqs: int = 129
    enc_ch: Tuple[int, ...] = (128, 64, 64, 128)
    enc_strides: Tuple[int, ...] = (1, 2, 2, 1)
    hidden: int = 128


def init_silero(key: jax.Array,
                cfg: SileroConfig = SileroConfig()) -> Dict[str, Any]:
    """Random init in the exact published layout (tests / distillation
    targets)."""
    ks = iter(jax.random.split(key, 16))
    cos_b, sin_b = _dft_power_bases(cfg.n_fft)
    basis = np.concatenate([cos_b.T, sin_b.T], axis=0)  # (258, 256)
    params: Dict[str, Any] = {"stft_basis": jnp.asarray(basis)}
    cin = cfg.n_freqs
    for i, cout in enumerate(cfg.enc_ch):
        s = 1.0 / math.sqrt(cin * 3)
        params[f"enc{i}_w"] = jax.random.uniform(
            next(ks), (cout, cin, 3), jnp.float32, -s, s)
        params[f"enc{i}_b"] = jnp.zeros((cout,), jnp.float32)
        cin = cout
    h = cfg.hidden
    s = 1.0 / math.sqrt(h)
    for name, shape in (("lstm_wi", (4 * h, cfg.enc_ch[-1])),
                        ("lstm_wh", (4 * h, h))):
        params[name] = jax.random.uniform(next(ks), shape, jnp.float32,
                                          -s, s)
    params["lstm_bi"] = jnp.zeros((4 * h,), jnp.float32)
    params["lstm_bh"] = jnp.zeros((4 * h,), jnp.float32)
    params["head_w"] = jax.random.uniform(next(ks), (h,), jnp.float32,
                                          -s, s)
    params["head_b"] = jnp.zeros((), jnp.float32)
    return params


def silero_init_state(cfg: SileroConfig = SileroConfig()):
    return (jnp.zeros((cfg.hidden,), jnp.float32),
            jnp.zeros((cfg.hidden,), jnp.float32),
            jnp.zeros((cfg.context,), jnp.float32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def silero_step(params: Dict[str, Any], cfg: SileroConfig,
                chunk: jnp.ndarray, state) -> Tuple[jnp.ndarray, tuple]:
    """One 512-sample chunk through the Silero-v5 topology:
    context-carry -> STFT-conv magnitude -> 4 reparam convs -> LSTM
    cell -> sigmoid head. Returns (prob, (h, c, context))."""
    h_prev, c_prev, ctx = state
    x = jnp.concatenate([ctx, chunk])                  # (context+512,)
    if cfg.stft_pad:
        x = jnp.pad(x, (cfg.stft_pad, cfg.stft_pad), mode="reflect")
    n = x.shape[0]
    n_frames = (n - cfg.n_fft) // cfg.hop + 1
    idx = (jnp.arange(n_frames) * cfg.hop)[:, None] + jnp.arange(cfg.n_fft)
    frames = x[idx]                                    # (F, n_fft)
    spec = frames @ params["stft_basis"].T             # (F, 258)
    re = spec[:, :cfg.n_freqs]
    im = spec[:, cfg.n_freqs:]
    mag = jnp.sqrt(re * re + im * im + 1e-12)          # (F, 129)

    feat = mag.T[None]                                 # (1, C, T)
    for i, stride in enumerate(cfg.enc_strides):
        feat = jax.lax.conv_general_dilated(
            feat, params[f"enc{i}_w"], (stride,), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        feat = jax.nn.relu(feat + params[f"enc{i}_b"][None, :, None])
    feat = jnp.mean(feat[0], axis=-1)                  # (128,)

    hid = cfg.hidden
    gates = (feat @ params["lstm_wi"].T + params["lstm_bi"]
             + h_prev @ params["lstm_wh"].T + params["lstm_bh"])
    i_g = jax.nn.sigmoid(gates[:hid])
    f_g = jax.nn.sigmoid(gates[hid:2 * hid])
    g_g = jnp.tanh(gates[2 * hid:3 * hid])
    o_g = jax.nn.sigmoid(gates[3 * hid:])
    c_new = f_g * c_prev + i_g * g_g
    h_new = o_g * jnp.tanh(c_new)

    prob = jax.nn.sigmoid(h_new @ params["head_w"] + params["head_b"])
    new_ctx = chunk[-cfg.context:]
    return prob, (h_new, c_new, new_ctx)


class SileroVAD:
    """Streaming wrapper over the Silero-v5-exact topology — same
    interface as :class:`NeuralVAD` (the pipeline's vad_fn contract)."""

    def __init__(self, params, cfg: SileroConfig = SileroConfig()):
        self.params = params
        self.cfg = cfg
        self.state = silero_init_state(cfg)
        self._leftover = np.zeros(0, np.float32)

    def __call__(self, chunk) -> float:
        data = np.concatenate([self._leftover,
                               np.asarray(chunk, np.float32)])
        n_frames = len(data) // CHUNK_SAMPLES
        prob = 0.0
        for i in range(n_frames):
            frame = jnp.asarray(
                data[i * CHUNK_SAMPLES:(i + 1) * CHUNK_SAMPLES])
            p, self.state = silero_step(self.params, self.cfg, frame,
                                        self.state)
            prob = max(prob, float(p))
        self._leftover = data[n_frames * CHUNK_SAMPLES:]
        return prob

    def reset(self) -> None:
        self.state = silero_init_state(self.cfg)
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
