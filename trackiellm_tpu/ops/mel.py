"""Log-mel spectrogram (Whisper-compatible) as one jit region.

Parity target: the mel front-end whisper.cpp computes on CPU before
`whisper_full` (reference: src/audio/tk_asr_whisper.c:142 uses whisper.cpp,
which owns the mel transform). Here it is TPU-native: framing is a strided
gather, the DFT is an explicit real-DFT **matmul** against precomputed
cos/sin bases — on TPU a (frames x n_fft) @ (n_fft x freqs) matmul rides
the MXU and beats an FFT butterfly for Whisper's small n_fft=400 — and the
mel filterbank is a second matmul. Everything fuses into one program.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Whisper front-end constants (openai/whisper audio.py conventions).
SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80


def _hz_to_mel(hz: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_mels: int = N_MELS, n_fft: int = N_FFT, sample_rate: int = SAMPLE_RATE
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_freqs, n_mels)."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel(np.array(0.0)), _hz_to_mel(np.array(sample_rate / 2.0)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_freqs, n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        # Slaney area normalization
        fb[:, m] *= 2.0 / max(hz_pts[m + 2] - hz_pts[m], 1e-9)
    return fb


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int = N_FFT):
    """Real-DFT cos/sin bases with a Hann window folded in:
    (n_fft, n_freqs) each. Window fusion saves one elementwise pass."""
    n_freqs = n_fft // 2 + 1
    window = np.hanning(n_fft + 1)[:-1].astype(np.float64)
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


@functools.partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = N_MELS,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
) -> jnp.ndarray:
    """Whisper-style log10 mel spectrogram.

    ``audio``: f32 mono at 16 kHz, shape (n_samples,). Returns
    ``(n_mels, n_frames)`` with Whisper's dynamic-range clamp
    (max - 8) and (x+4)/4 scaling.
    """
    # Reflect-pad n_fft//2 on both sides (center framing).
    pad = n_fft // 2
    audio = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (audio.shape[0] - n_fft) // hop

    # Frame via gather of strided windows: (n_frames, n_fft).
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = audio[idx]
    # Whisper drops the final STFT column (openai/whisper audio.py).
    frames = frames[:-1]

    cos_b, sin_b = _dft_bases(n_fft)
    re = frames @ jnp.asarray(cos_b)  # (n_frames, n_freqs) — MXU
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im

    mel = power @ jnp.asarray(mel_filterbank(n_mels, n_fft))  # MXU
    log_mel = jnp.log10(jnp.maximum(mel, 1e-10))
    log_mel = jnp.maximum(log_mel, jnp.max(log_mel) - 8.0)
    log_mel = (log_mel + 4.0) / 4.0
    return log_mel.T  # (n_mels, n_frames)
