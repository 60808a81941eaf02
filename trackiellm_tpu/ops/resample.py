"""Polyphase audio resampling (e.g. 48 kHz mic -> 16 kHz model rate).

Parity target: the audio pipeline's implicit rate conversion between the
2 s @ 48 kHz device ring buffer (reference: src/cortex/tk_cortex_main.c:543)
and the 16 kHz chunks the VAD/ASR consume (tk_cortex_main.c:875).

TPU design: a windowed-sinc polyphase filter expressed as a single strided
convolution — for a rational ratio L/M the resampler is a matmul of frame
windows against L filter phases, so it lands on the MXU and jits with
static shapes per (in_len, ratio).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _polyphase_filters(up: int, down: int, taps_per_phase: int = 16,
                       beta: float = 8.555) -> np.ndarray:
    """Kaiser-windowed sinc filter bank, shape (up, taps_per_phase)."""
    n_taps = up * taps_per_phase
    cutoff = 1.0 / max(up, down)  # normalized to Nyquist of the upsampled rate
    t = np.arange(n_taps) - (n_taps - 1) / 2.0
    h = np.sinc(t * cutoff) * cutoff * up
    h *= np.kaiser(n_taps, beta)
    # Split into `up` phases: phase p holds taps p, p+up, p+2*up, ...
    return h.reshape(taps_per_phase, up).T.astype(np.float32).copy()


@functools.partial(jax.jit, static_argnames=("up", "down"))
def resample_poly(audio: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Resample 1-D f32 audio by rational factor ``up/down``.

    Common calls: ``resample_poly(x, 1, 3)`` for 48k->16k,
    ``resample_poly(x, 3, 1)`` for 16k->48k playback.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return audio

    filters = jnp.asarray(_polyphase_filters(up, down))  # (up, T)
    taps = filters.shape[1]
    half = taps // 2

    n_in = audio.shape[0]
    n_out = (n_in * up) // down
    padded = jnp.pad(audio, (half, taps))

    # Output sample k is produced at upsampled index k*down = q*up + p.
    k = jnp.arange(n_out)
    q = (k * down) // up            # input-sample anchor
    p = (k * down) % up             # filter phase
    # Gather each output's input window: (n_out, taps).
    win_idx = q[:, None] + jnp.arange(taps)[None, :]
    windows = padded[win_idx]
    # Phase filter per output sample, applied time-reversed (convolution).
    coeffs = filters[p][:, ::-1]
    return jnp.sum(windows * coeffs, axis=-1)
