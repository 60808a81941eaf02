"""Whisper-family encoder-decoder ASR, TPU-native JAX.

Parity target: the reference's whisper.cpp integration — GGML
Whisper-tiny, greedy sampling, full-segment transcription, language
switch (reference: src/audio/tk_asr_whisper.c:90-91, 142-175, 238, 386).

Architecture (Whisper shape): 2-layer conv subsampling over the 80-mel
spectrogram, sinusoidal positions, pre-LN transformer encoder; decoder
with learned positions, causal self-attention + cross-attention, tied
input/output embedding. All per-layer weights are stacked and the
forward is `lax.scan` over layers (one compiled block, like the LLM).
Decode keeps a self-attention KV cache plus precomputed per-layer cross
K/V — one jit per decode step, greedy loop on host.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from trackiellm_tpu.ops.attention import attention_xla


class WhisperConfig(NamedTuple):
    n_mels: int = 80
    d_model: int = 384
    n_heads: int = 6
    n_audio_layers: int = 4
    n_text_layers: int = 4
    n_audio_ctx: int = 1500  # 30 s of mel frames / 2
    n_text_ctx: int = 448
    vocab_size: int = 51865

    @classmethod
    def tiny(cls) -> "WhisperConfig":
        return cls()

    @classmethod
    def base(cls) -> "WhisperConfig":
        """openai/whisper-base (d512/h8/6+6 layers)."""
        return cls(d_model=512, n_heads=8, n_audio_layers=6,
                   n_text_layers=6)

    @classmethod
    def small(cls) -> "WhisperConfig":
        """openai/whisper-small (d768/h12/12+12 layers)."""
        return cls(d_model=768, n_heads=12, n_audio_layers=12,
                   n_text_layers=12)

    @classmethod
    def medium(cls) -> "WhisperConfig":
        """openai/whisper-medium (d1024/h16/24+24 layers)."""
        return cls(d_model=1024, n_heads=16, n_audio_layers=24,
                   n_text_layers=24)

    @classmethod
    def large_v3(cls) -> "WhisperConfig":
        """openai/whisper-large-v3 (d1280/h20/32+32 layers, 128 mel
        bins, +1 vocab entry for the <|yue|> language token). The mel
        frontend (ops/mel.py) is n_mels-parameterized; conversion
        derives all of this from shapes (whisper_config_from_torch)."""
        return cls(n_mels=128, d_model=1280, n_heads=20,
                   n_audio_layers=32, n_text_layers=32,
                   vocab_size=51866)

    @classmethod
    def test(cls) -> "WhisperConfig":
        return cls(n_mels=80, d_model=64, n_heads=2, n_audio_layers=2,
                   n_text_layers=2, n_audio_ctx=100, n_text_ctx=32,
                   vocab_size=320)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _dense(key, cin, cout):
    s = 1.0 / math.sqrt(cin)
    return jax.random.uniform(key, (cin, cout), jnp.float32, -s, s)


def _layer_stack(key, n, d):
    """Stacked transformer-layer params: self-attn + (optional cross) +
    MLP, all (n, ...)."""
    ks = jax.random.split(key, 12)

    def stack(k, cin, cout):
        return jnp.stack([_dense(jax.random.fold_in(k, i), cin, cout)
                          for i in range(n)])

    return {
        "ln1": jnp.ones((n, d)), "ln1_b": jnp.zeros((n, d)),
        "wq": stack(ks[0], d, d), "wk": stack(ks[1], d, d),
        "wv": stack(ks[2], d, d), "wo": stack(ks[3], d, d),
        # q/v/out projection biases (the standard Whisper layout has
        # them; key has none). Zeros when randomly initialised.
        "bq": jnp.zeros((n, d)), "bv": jnp.zeros((n, d)),
        "bo": jnp.zeros((n, d)),
        "ln2": jnp.ones((n, d)), "ln2_b": jnp.zeros((n, d)),
        "w1": stack(ks[4], d, 4 * d), "b1": jnp.zeros((n, 4 * d)),
        "w2": stack(ks[5], 4 * d, d), "b2": jnp.zeros((n, d)),
    }


def _cross_stack(key, n, d):
    ks = jax.random.split(key, 5)

    def stack(k, cin, cout):
        return jnp.stack([_dense(jax.random.fold_in(k, i), cin, cout)
                          for i in range(n)])

    return {
        "ln": jnp.ones((n, d)), "ln_b": jnp.zeros((n, d)),
        "wq": stack(ks[0], d, d), "wk": stack(ks[1], d, d),
        "wv": stack(ks[2], d, d), "wo": stack(ks[3], d, d),
        "bq": jnp.zeros((n, d)), "bv": jnp.zeros((n, d)),
        "bo": jnp.zeros((n, d)),
    }


def init_whisper(key: jax.Array, cfg: WhisperConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    d = cfg.d_model
    return {
        "conv1_w": jax.random.normal(ks[0], (3, cfg.n_mels, d)) * 0.02,
        "conv1_b": jnp.zeros((d,)),
        "conv2_w": jax.random.normal(ks[1], (3, d, d)) * 0.02,
        "conv2_b": jnp.zeros((d,)),
        "enc": _layer_stack(ks[2], cfg.n_audio_layers, d),
        "enc_ln": jnp.ones((d,)), "enc_ln_b": jnp.zeros((d,)),
        "tok_emb": jax.random.normal(ks[3], (cfg.vocab_size, d)) * 0.02,
        "pos_emb": jax.random.normal(ks[4], (cfg.n_text_ctx, d)) * 0.01,
        "dec": _layer_stack(ks[5], cfg.n_text_layers, d),
        "cross": _cross_stack(ks[6], cfg.n_text_layers, d),
        "dec_ln": jnp.ones((d,)), "dec_ln_b": jnp.zeros((d,)),
    }


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * w + b


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal positions for the audio encoder."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


def _mha(q, k, v, n_heads, causal):
    s, d = q.shape
    hd = d // n_heads
    qh = q.reshape(s, n_heads, hd).transpose(1, 0, 2)
    kh = k.reshape(-1, n_heads, hd).transpose(1, 0, 2)
    vh = v.reshape(-1, n_heads, hd).transpose(1, 0, 2)
    out = attention_xla(qh, kh, vh, causal=causal)
    return out.transpose(1, 0, 2).reshape(s, d)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _conv1d(x, w, b, stride=1):
    """(T, Cin) x (K, Cin, Cout) 'same' 1-D conv."""
    out = lax.conv_general_dilated(
        x[None], w, (stride,), "SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)[0]
    return out + b


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Dict[str, Any], cfg: WhisperConfig,
           mel: jnp.ndarray) -> jnp.ndarray:
    """(n_mels, T) log-mel -> (T//2, d_model) audio features."""
    x = mel.T  # (T, n_mels)
    x = jax.nn.gelu(_conv1d(x, params["conv1_w"], params["conv1_b"]))
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"],
                            stride=2))
    t = x.shape[0]
    x = x + jnp.asarray(_sinusoids(t, cfg.d_model))

    def layer(x, lp):
        h = _ln(x, lp["ln1"], lp["ln1_b"])
        attn = _mha(h @ lp["wq"] + lp["bq"], h @ lp["wk"],
                    h @ lp["wv"] + lp["bv"], cfg.n_heads, causal=False)
        x = x + attn @ lp["wo"] + lp["bo"]
        h = _ln(x, lp["ln2"], lp["ln2_b"])
        x = x + (jax.nn.gelu(h @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"])
        return x, None

    x, _ = lax.scan(layer, x, params["enc"])
    return _ln(x, params["enc_ln"], params["enc_ln_b"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class DecoderCache(NamedTuple):
    k: jnp.ndarray  # (L, n_text_ctx, D) self-attn keys
    v: jnp.ndarray
    cross_k: jnp.ndarray  # (L, T_audio, D)
    cross_v: jnp.ndarray
    length: jnp.ndarray  # scalar int32


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_decoder_cache(params: Dict[str, Any], cfg: WhisperConfig,
                       audio_feats: jnp.ndarray) -> DecoderCache:
    """Precompute per-layer cross K/V from the encoded audio."""
    def per_layer(_, cp):
        h = _ln(audio_feats, cp["ln"], cp["ln_b"])
        return None, (h @ cp["wk"], h @ cp["wv"] + cp["bv"])

    _, (ck, cv) = lax.scan(per_layer, None, params["cross"])
    shape = (cfg.n_text_layers, cfg.n_text_ctx, cfg.d_model)
    return DecoderCache(
        k=jnp.zeros(shape), v=jnp.zeros(shape),
        cross_k=ck, cross_v=cv, length=jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(params: Dict[str, Any], cfg: WhisperConfig,
                token: jnp.ndarray, cache: DecoderCache,
                ) -> Tuple[jnp.ndarray, DecoderCache]:
    """One decoder step -> (vocab logits, cache+1)."""
    pos = cache.length
    x = params["tok_emb"][token][None] + params["pos_emb"][pos][None]

    def layer(carry, inputs):
        x = carry
        lp, cp, k_l, v_l, ck_l, cv_l = inputs
        h = _ln(x, lp["ln1"], lp["ln1_b"])
        q = h @ lp["wq"] + lp["bq"]
        k = h @ lp["wk"]
        v = h @ lp["wv"] + lp["bv"]
        k_l = lax.dynamic_update_slice(k_l, k, (pos, 0))
        v_l = lax.dynamic_update_slice(v_l, v, (pos, 0))
        # Masked self-attention over the cache prefix.
        hd = cfg.head_dim
        qh = q.reshape(1, cfg.n_heads, hd).transpose(1, 0, 2)
        kh = k_l.reshape(-1, cfg.n_heads, hd).transpose(1, 0, 2)
        vh = v_l.reshape(-1, cfg.n_heads, hd).transpose(1, 0, 2)
        scores = jnp.einsum("hqd,hkd->hqk", qh, kh) / math.sqrt(hd)
        mask = jnp.arange(cfg.n_text_ctx)[None, None, :] <= pos
        scores = jnp.where(mask, scores, -1e30)
        attn = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, -1), vh)
        x = (x + attn.transpose(1, 0, 2).reshape(1, -1) @ lp["wo"]
             + lp["bo"])

        # Cross-attention to the audio.
        h = _ln(x, cp["ln"], cp["ln_b"])
        attn = _mha(h @ cp["wq"] + cp["bq"], ck_l, cv_l, cfg.n_heads,
                    causal=False)
        x = x + attn @ cp["wo"] + cp["bo"]

        h = _ln(x, lp["ln2"], lp["ln2_b"])
        x = x + (jax.nn.gelu(h @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"])
        return x, (k_l, v_l)

    x, (new_k, new_v) = lax.scan(
        layer, x,
        (params["dec"], params["cross"], cache.k, cache.v,
         cache.cross_k, cache.cross_v))
    x = _ln(x, params["dec_ln"], params["dec_ln_b"])
    logits = (x @ params["tok_emb"].T)[0]  # tied embedding
    return logits, DecoderCache(new_k, new_v, cache.cross_k, cache.cross_v,
                                pos + 1)


# ---------------------------------------------------------------------------
# Greedy transcription loop (host)
# ---------------------------------------------------------------------------

# Special-token layout (Whisper multilingual convention, scaled to any
# vocab): sot/eot/language/task live at the top of the vocab.
def special_tokens(cfg: WhisperConfig) -> Dict[str, int]:
    return {
        "eot": cfg.vocab_size - 1,
        "sot": cfg.vocab_size - 2,
        "transcribe": cfg.vocab_size - 3,
        "no_timestamps": cfg.vocab_size - 4,
        "lang_base": cfg.vocab_size - 104,  # 100 language slots
    }


def transcribe_tokens_host(params: Dict[str, Any], cfg: WhisperConfig,
                           mel: jnp.ndarray, max_tokens: int = 64,
                           language: int = 0) -> list:
    """Greedy decode with a host-side loop (one dispatch + one device
    sync per token). Reference semantics; kept as the oracle for
    :func:`transcribe_tokens`' single-dispatch device loop.

    Parity: whisper.cpp greedy sampling (tk_asr_whisper.c:90-91) and the
    language-switch API (:386) via the ``language`` slot id.
    """
    sp = special_tokens(cfg)
    feats = encode(params, cfg, mel)
    cache = make_decoder_cache(params, cfg, feats)

    out = []
    prompt = [sp["sot"], sp["lang_base"] + language, sp["transcribe"],
              sp["no_timestamps"]]
    logits = None
    for t in prompt:
        logits, cache = decode_step(params, cfg, jnp.int32(t), cache)
    for _ in range(max_tokens):
        tok = int(jnp.argmax(logits))
        if tok == sp["eot"] or int(cache.length) >= cfg.n_text_ctx - 1:
            break
        out.append(tok)
        logits, cache = decode_step(params, cfg, jnp.int32(tok), cache)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "max_tokens"))
def _transcribe_device(params: Dict[str, Any], cfg: WhisperConfig,
                       mel: jnp.ndarray, language: jnp.ndarray,
                       max_tokens: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole greedy transcription as ONE compiled program.

    encode -> cross-KV -> 4 prompt steps -> ``lax.while_loop`` greedy
    decode, entirely on device. Returns ``(buf, count)`` where
    ``buf[:count]`` are the emitted text tokens. One host dispatch and
    one device->host sync total — on TPU-over-relay this removes the
    per-token dispatch latency that made the host loop's RTF ~0.36
    (see PERF_NOTES.md round-2 ASR section).
    """
    sp = special_tokens(cfg)
    feats = encode(params, cfg, mel)
    cache = make_decoder_cache(params, cfg, feats)

    prompt = jnp.stack([
        jnp.int32(sp["sot"]),
        jnp.int32(sp["lang_base"]) + language.astype(jnp.int32),
        jnp.int32(sp["transcribe"]),
        jnp.int32(sp["no_timestamps"]),
    ])

    def prompt_step(cache, t):
        logits, cache = decode_step(params, cfg, t, cache)
        return cache, logits

    cache, prompt_logits = lax.scan(prompt_step, cache, prompt)
    logits = prompt_logits[-1]

    buf = jnp.zeros((max_tokens,), jnp.int32)
    count = jnp.int32(0)
    done = jnp.bool_(False)

    def cond(carry):
        _, _, _, count, done = carry
        return jnp.logical_and(~done, count < max_tokens)

    def body(carry):
        logits, cache, buf, count, _ = carry
        tok = jnp.argmax(logits).astype(jnp.int32)
        stop = jnp.logical_or(tok == sp["eot"],
                              cache.length >= cfg.n_text_ctx - 1)

        def do_stop(_):
            return logits, cache, buf, count, jnp.bool_(True)

        def do_emit(_):
            b = buf.at[count].set(tok)
            lg, cc = decode_step(params, cfg, tok, cache)
            return lg, cc, b, count + 1, jnp.bool_(False)

        return lax.cond(stop, do_stop, do_emit, None)

    _, _, buf, count, _ = lax.while_loop(
        cond, body, (logits, cache, buf, count, done))
    return buf, count


def transcribe_tokens(params: Dict[str, Any], cfg: WhisperConfig,
                      mel: jnp.ndarray, max_tokens: int = 64,
                      language: int = 0) -> list:
    """Greedy decode -> list of token ids (text tokens only).

    Single device dispatch (:func:`_transcribe_device`); token-identical
    to :func:`transcribe_tokens_host` (tested in tests/test_audio.py).
    """
    buf, count = _transcribe_device(
        params, cfg, mel, jnp.int32(language), max_tokens)
    n = int(count)
    return np.asarray(buf[:n]).tolist() if n else []
