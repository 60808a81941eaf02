"""Text-to-speech: acoustic model + neural vocoder, TPU-native JAX.

Parity target: the reference's Piper TTS integration (reference:
src/audio/tk_tts_piper.c:106-237 — context create, synth-to-buffer and
synth-to-callback, voice params incl. speaking rate, model info). Piper
is a VITS model over espeak-ng phonemes; the rebuild uses the same
two-stage neural-TTS decomposition in XLA-friendly form:

  - Acoustic model: character/phoneme embedding -> conv encoder ->
    duration predictor -> *static-shape length regulation* (a masked
    frame->token gather instead of a dynamic repeat — the TPU version of
    FastSpeech's length regulator) -> conv decoder -> mel frames.
  - Vocoder: HiFiGAN-style generator — transposed-conv upsampling
    (4*5*8 = hop 160 @ 16 kHz) with residual conv stacks -> waveform.

Both stages are single jit regions with fixed (max_chars, max_frames)
buckets; real lengths ride masks.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Character inventory (grapheme fallback; a phonemizer can map into the
# same id space later). Includes pt-BR accented letters — the product
# language (text_to_ids lowercases, so lowercase forms suffice).
TTS_CHARSET = (" abcdefghijklmnopqrstuvwxyzáàâãéêíóôõúüç"
               "0123456789.,!?'-:;")


def text_to_ids(text: str, max_chars: int):
    import numpy as np

    ids = [TTS_CHARSET.index(c) if c in TTS_CHARSET else 0
           for c in text.lower()][:max_chars]
    n = len(ids)
    arr = np.zeros((max_chars,), np.int32)
    arr[:n] = ids
    return arr, n


class TTSConfig(NamedTuple):
    vocab_size: int = len(TTS_CHARSET)
    d_model: int = 128
    n_mels: int = 80
    hop: int = 160            # samples per mel frame @ 16 kHz
    max_chars: int = 128
    max_frames: int = 512     # ~5.1 s of speech
    upsample: Tuple[int, ...] = (4, 5, 8)
    voc_ch: int = 128

    @classmethod
    def default(cls) -> "TTSConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "TTSConfig":
        return cls(d_model=32, max_chars=32, max_frames=64, voc_ch=32)


def _dense(key, cin, cout):
    s = 1.0 / math.sqrt(cin)
    return {"w": jax.random.uniform(key, (cin, cout), jnp.float32, -s, s),
            "b": jnp.zeros((cout,), jnp.float32)}


def _conv1d_init(key, k, cin, cout):
    s = 1.0 / math.sqrt(k * cin)
    return {"w": jax.random.uniform(key, (k, cin, cout), jnp.float32, -s, s),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_tts(key: jax.Array, cfg: TTSConfig = TTSConfig()) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 24))
    nxt = lambda: next(ks)  # noqa: E731
    d = cfg.d_model
    c = cfg.voc_ch
    params: Dict[str, Any] = {
        "emb": jax.random.normal(nxt(), (cfg.vocab_size, d)) * 0.1,
        "enc1": _conv1d_init(nxt(), 5, d, d),
        "enc2": _conv1d_init(nxt(), 5, d, d),
        "dur1": _dense(nxt(), d, d // 2),
        "dur2": _dense(nxt(), d // 2, 1),
        "dec1": _conv1d_init(nxt(), 5, d, d),
        "dec2": _conv1d_init(nxt(), 5, d, d),
        "mel_out": _dense(nxt(), d, cfg.n_mels),
        "voc_in": _conv1d_init(nxt(), 7, cfg.n_mels, c),
    }
    ch = c
    for i, _ in enumerate(cfg.upsample):
        params[f"voc_up{i}"] = _conv1d_init(nxt(), 8, ch, ch // 2)
        params[f"voc_res{i}a"] = _conv1d_init(nxt(), 3, ch // 2, ch // 2)
        params[f"voc_res{i}b"] = _conv1d_init(nxt(), 3, ch // 2, ch // 2)
        ch //= 2
    params["voc_out"] = _conv1d_init(nxt(), 7, ch, 1)
    return params


def _conv1d(x, p, stride=1):
    out = lax.conv_general_dilated(
        x[None], p["w"], (stride,), "SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)[0]
    return out + p["b"]


def _upsample_conv(x, p, factor):
    """Nearest-neighbor upsample + conv (artifact-free alternative to
    conv_transpose, standard HiFiGAN variant)."""
    x = jnp.repeat(x, factor, axis=0)
    return _conv1d(x, p)


@functools.partial(jax.jit, static_argnames=("cfg",))
def acoustic_forward(params: Dict[str, Any], cfg: TTSConfig,
                     char_ids: jnp.ndarray, n_chars: jnp.ndarray,
                     rate: jnp.ndarray = jnp.float32(1.0),
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(max_chars,) ids + true length -> ((max_frames, n_mels) mel,
    n_frames). ``rate`` scales durations (Piper voice-rate parity)."""
    mask = (jnp.arange(cfg.max_chars) < n_chars)[:, None]
    x = params["emb"][char_ids] * mask
    x = jax.nn.relu(_conv1d(x, params["enc1"])) * mask
    x = x + jax.nn.relu(_conv1d(x, params["enc2"])) * mask

    # Durations in frames per token: softplus keeps them positive; +2
    # biases toward intelligible pacing even untrained.
    h = jax.nn.relu(x @ params["dur1"]["w"] + params["dur1"]["b"])
    dur = (jax.nn.softplus(h @ params["dur2"]["w"] + params["dur2"]["b"])
           [:, 0] + 2.0) / jnp.maximum(rate, 1e-3)
    dur = jnp.where(mask[:, 0], dur, 0.0)

    # Static-shape length regulation: frame t copies token
    # argmax(cum_dur > t) via a (max_frames, max_chars) comparison.
    ends = jnp.cumsum(dur)                      # (S,)
    t_idx = jnp.arange(cfg.max_frames, dtype=jnp.float32)
    tok_of_frame = jnp.sum(
        (t_idx[:, None] >= ends[None, :]).astype(jnp.int32), axis=1)
    tok_of_frame = jnp.clip(tok_of_frame, 0, cfg.max_chars - 1)
    frames = x[tok_of_frame]                    # (T, d)
    n_frames = jnp.minimum(ends[jnp.maximum(n_chars - 1, 0)],
                           cfg.max_frames).astype(jnp.int32)
    fmask = (jnp.arange(cfg.max_frames) < n_frames)[:, None]

    y = jax.nn.relu(_conv1d(frames, params["dec1"])) * fmask
    y = y + jax.nn.relu(_conv1d(y, params["dec2"])) * fmask
    mel = (y @ params["mel_out"]["w"] + params["mel_out"]["b"]) * fmask
    return mel, n_frames


@functools.partial(jax.jit, static_argnames=("cfg",))
def vocoder_forward(params: Dict[str, Any], cfg: TTSConfig,
                    mel: jnp.ndarray) -> jnp.ndarray:
    """(max_frames, n_mels) -> (max_frames * hop,) waveform in [-1, 1]."""
    x = jax.nn.leaky_relu(_conv1d(mel, params["voc_in"]), 0.1)
    for i, f in enumerate(cfg.upsample):
        x = jax.nn.leaky_relu(_upsample_conv(x, params[f"voc_up{i}"], f), 0.1)
        r = jax.nn.leaky_relu(_conv1d(x, params[f"voc_res{i}a"]), 0.1)
        x = x + _conv1d(r, params[f"voc_res{i}b"])
    wav = jnp.tanh(_conv1d(x, params["voc_out"]))[:, 0]
    return wav


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames_chunk"))
def vocoder_forward_chunk(params: Dict[str, Any], cfg: TTSConfig,
                          mel_chunk: jnp.ndarray,
                          n_frames_chunk: int) -> jnp.ndarray:
    """Vocode a (n_frames_chunk, n_mels) mel slice. Same weights and
    math as vocoder_forward, compiled once per (static) chunk shape."""
    del n_frames_chunk
    return vocoder_forward.__wrapped__(params, cfg, mel_chunk)


# Short-clause latency buckets: (max_chars, max_frames), small -> full.
# Every TTS weight is shape-independent of the (max_chars, max_frames)
# statics, so a short first clause can run a ~2x cheaper acoustic
# program with the SAME params. The frame budget is 8 frames/char —
# conservative above trained Piper-class durations (~5-7 frames/char at
# rate 1); a clause that could outgrow its bucket takes the next one.
LATENCY_BUCKETS = ((32, 256), (64, 320))


def bucket_config(cfg: TTSConfig, n_chars: int) -> TTSConfig:
    """Smallest compile bucket that safely covers ``n_chars`` of text
    (falls back to ``cfg`` itself). Mel output for the valid frames is
    identical across buckets: padding positions are masked to zero, so
    the convolutions see the same neighborhood everywhere valid."""
    for mc, mf in LATENCY_BUCKETS:
        if (n_chars <= mc < cfg.max_chars and mf < cfg.max_frames
                and 8 * n_chars <= mf):
            return cfg._replace(max_chars=mc, max_frames=mf)
    return cfg


def synthesize_streaming(params: Dict[str, Any], cfg: TTSConfig, text: str,
                         rate: float = 1.0, frontend=None,
                         chunk_frames: int = 64, overlap: int = 8):
    """Generator: text -> successive waveform chunks (np.ndarray @
    16 kHz). The first chunk is audible after ONE acoustic pass + a
    small-chunk vocoder pass + a ~40 KB fetch, instead of the full
    512-frame vocoder + 328 KB download — the time-to-first-sample path
    for streamed speech.

    Parity: tk_tts_piper.c:106-237 synth-to-callback (the reference
    streams audio chunks to a callback; this is the pull version).

    The vocoder is convolutional, so each chunk is computed with
    ``overlap`` extra mel frames on each side and the edges discarded;
    with overlap >= the vocoder's receptive field (~5 frames) interior
    samples match the one-shot vocoder_forward output exactly (tested).
    """
    import numpy as np

    # Short clauses drop into a cheaper compile bucket (same weights) —
    # this is the time-to-first-audio path, so the acoustic pass size
    # matters more than one extra program variant.
    probe_ids, probe_n = (frontend or text_to_ids)(text, cfg.max_chars)
    cfg = bucket_config(cfg, probe_n)
    ids, n = (frontend or text_to_ids)(text, cfg.max_chars)
    mel, n_frames_dev = acoustic_forward(params, cfg, jnp.asarray(ids),
                                         jnp.int32(n), jnp.float32(rate))
    n_frames = int(n_frames_dev)
    hop = cfg.hop
    start = 0
    while start < n_frames:
        end = min(start + chunk_frames, n_frames)
        lo = max(start - overlap, 0)
        hi = min(end + overlap, cfg.max_frames)
        # static shape per (chunk+overlap) bucket: pad to the full
        # chunk+2*overlap window so at most 2 vocoder variants compile.
        # Clamped to max_frames: a small model (or small max_frames
        # config) must degrade to one whole-buffer window, not ask
        # dynamic_slice for more frames than the mel buffer holds.
        win = min(chunk_frames + 2 * overlap, cfg.max_frames)
        mel_win = lax.dynamic_slice(
            mel, (jnp.int32(min(lo, cfg.max_frames - win)), 0),
            (win, cfg.n_mels))
        off = lo if lo <= cfg.max_frames - win else cfg.max_frames - win
        wav_win = vocoder_forward_chunk(params, cfg, mel_win, win)
        first = (start - off) * hop
        last = (end - off) * hop
        yield np.asarray(wav_win[first:last])
        start = end


def synthesize(params: Dict[str, Any], cfg: TTSConfig, text: str,
               rate: float = 1.0, frontend=None):
    """Text -> (waveform np.ndarray @ 16 kHz, n_samples). Parity:
    tk_tts_piper synth-to-buffer. ``frontend`` maps text ->
    (ids, n) — defaults to the grapheme charset; pass
    audio.phonemizer.PhonemeFrontend for phonemic input (the model must
    then be built with vocab_size=PhonemeFrontend.vocab_size)."""
    import numpy as np

    import jax

    ids, n = (frontend or text_to_ids)(text, cfg.max_chars)
    mel, n_frames = acoustic_forward(params, cfg, jnp.asarray(ids),
                                     jnp.int32(n), jnp.float32(rate))
    wav = vocoder_forward(params, cfg, mel)
    # one host round trip for both values (int(n_frames) first would
    # pay a second relay sync before the waveform fetch)
    wav_np, n_frames_np = jax.device_get((wav, n_frames))
    n_samples = int(n_frames_np) * cfg.hop
    return wav_np[:n_samples], n_samples
