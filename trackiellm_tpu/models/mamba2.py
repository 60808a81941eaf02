"""Mamba-2 (SSD — state-space duality) family — TPU-native.

The second-generation selective SSM (Codestral-Mamba / Falcon-class
checkpoints; llama.cpp's mamba2 arch): per-HEAD scalar decay
A (h,) instead of Mamba-1's per-channel (I, N) matrix, grouped B/C
(n_groups shared across heads, the GQA analogue), a gated RMSNorm
before the output projection, and head-structured state (H, P, N).

TPU-first: same associative-scan formulation as models/mamba.py —
the scalar per-head decay broadcasts over (P, N), so the recurrence
h_t = a_t[h] * h_{t-1} + (dt_t[h] * x_t[h,p]) B_t[h,n] runs as ONE
`jax.lax.associative_scan` over the sequence (the oracle's chunked
SSD algorithm is a hand-scheduled equivalent; XLA fuses the scan
fine at inference sizes). Chunk state folds into the first element —
chunked prefill exact. Oracle: transformers Mamba2Mixer.torch_forward.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from trackiellm_tpu.models.mamba import _rms, _ssm_assoc


class Mamba2Config(NamedTuple):
    vocab_size: int = 32768
    dim: int = 4096
    n_layers: int = 64
    n_heads: int = 128
    head_dim: int = 64           # P; d_inner = n_heads * head_dim
    d_state: int = 128           # N
    n_groups: int = 8            # G: B/C shared per group
    d_conv: int = 4              # K
    norm_eps: float = 1e-5
    dt_limit: Tuple[float, float] = (0.0, float("inf"))
    max_seq: int = 4096

    @property
    def d_inner(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.n_groups * self.d_state

    @classmethod
    def test(cls) -> "Mamba2Config":
        return cls(vocab_size=96, dim=32, n_layers=2, n_heads=4,
                   head_dim=8, d_state=16, n_groups=2, d_conv=4,
                   max_seq=64)


class Mamba2Cache(NamedTuple):
    conv: jnp.ndarray    # (L, K-1, conv_dim)
    ssm: jnp.ndarray     # (L, H, P, N) float32
    length: jnp.ndarray

    @classmethod
    def create(cls, cfg: Mamba2Config, dtype=jnp.float32,
               max_seq: Optional[int] = None) -> "Mamba2Cache":
        del max_seq
        return cls(
            conv=jnp.zeros((cfg.n_layers, cfg.d_conv - 1, cfg.conv_dim),
                           dtype),
            ssm=jnp.zeros((cfg.n_layers, cfg.n_heads, cfg.head_dim,
                           cfg.d_state), jnp.float32),
            length=jnp.int32(0))


def _gated_norm(y, gate, w, eps):
    """MambaRMSNormGated: silu-gate in f32, THEN rms-normalize."""
    y32 = y.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32))
    ms = jnp.mean(jnp.square(y32), axis=-1, keepdims=True)
    return (y32 * jax.lax.rsqrt(ms + eps)) * w


def _mixer_seq2(layer, cfg: Mamba2Config, x_seq: jnp.ndarray,
                conv_init: jnp.ndarray, ssm_init: jnp.ndarray,
                last_idx: jnp.ndarray,
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    s = x_seq.shape[0]
    k = cfg.d_conv
    h_heads, p, n, g = cfg.n_heads, cfg.head_dim, cfg.d_state, cfg.n_groups
    i_sz = cfg.d_inner

    proj = x_seq @ layer["w_in"]
    if "b_in" in layer:
        proj = proj + layer["b_in"]
    gate, xbc, dt = jnp.split(proj, [i_sz, i_sz + cfg.conv_dim], axis=-1)

    x_cat = jnp.concatenate([conv_init.astype(xbc.dtype), xbc], axis=0)
    conv = layer["conv_b"]
    for j in range(k):
        conv = conv + x_cat[j: j + s] * layer["conv_w"][j]
    xbc = jax.nn.silu(conv)                            # (S, conv_dim)
    x, B, C = jnp.split(xbc, [i_sz, i_sz + g * n], axis=-1)

    dt = jax.nn.softplus(dt.astype(jnp.float32) + layer["dt_bias"])
    lo, hi = cfg.dt_limit
    if lo != 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)                      # (S, H)
    A = -jnp.exp(layer["A_log"].astype(jnp.float32))   # (H,)
    dA = jnp.exp(dt * A)                               # (S, H)

    rep = h_heads // g
    x3 = x.astype(jnp.float32).reshape(s, h_heads, p)
    B3 = jnp.repeat(B.astype(jnp.float32).reshape(s, g, n), rep, axis=1)
    C3 = jnp.repeat(C.astype(jnp.float32).reshape(s, g, n), rep, axis=1)

    a = dA[:, :, None, None]                           # (S, H, 1, 1)
    b = (dt[:, :, None] * x3)[..., None] * B3[:, :, None, :]  # (S,H,P,N)
    b = b.at[0].add(a[0] * ssm_init)
    a = jnp.broadcast_to(a, b.shape)
    _, hs = jax.lax.associative_scan(_ssm_assoc, (a, b))   # (S,H,P,N)
    y = jnp.einsum("shpn,shn->shp", hs, C3)
    y = y + x3 * layer["d"][None, :, None]
    y = y.reshape(s, i_sz)
    y = _gated_norm(y, gate, layer["gate_norm"], cfg.norm_eps)
    out = y.astype(x_seq.dtype) @ layer["w_out"]

    conv_state = jax.lax.dynamic_slice(
        x_cat, (last_idx + 1, 0), (k - 1, cfg.conv_dim))
    ssm_state = hs[last_idx]
    return out, conv_state, ssm_state


def _seq_forward2(params, cfg: Mamba2Config, tokens, n_valid, cache):
    last = jnp.maximum(n_valid.astype(jnp.int32) - 1, 0)
    x = params["tok_emb"][tokens.astype(jnp.int32)]

    def layer_fn(x, inputs):
        layer, conv_l, ssm_l = inputs
        h = _rms(x, layer["norm"], cfg.norm_eps)
        out, conv_s, ssm_s = _mixer_seq2(layer, cfg, h, conv_l, ssm_l,
                                         last)
        return x + out, (conv_s, ssm_s)

    x, (convs, ssms) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.conv, cache.ssm))
    x_last = x[last]
    logits = (_rms(x_last[None], params["out_norm"], cfg.norm_eps)
              @ params["lm_head"]).astype(jnp.float32)[0]
    return logits, Mamba2Cache(conv=convs.astype(cache.conv.dtype),
                               ssm=ssms,
                               length=cache.length
                               + n_valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Dict[str, Any], cfg: Mamba2Config,
            tokens: jnp.ndarray, length: jnp.ndarray,
            cache: Mamba2Cache) -> Tuple[jnp.ndarray, Mamba2Cache]:
    zero = Mamba2Cache.create(cfg, dtype=cache.conv.dtype)
    return _seq_forward2(params, cfg, tokens, length, zero)


@functools.partial(jax.jit, static_argnames=("cfg",))
def extend(params: Dict[str, Any], cfg: Mamba2Config,
           tokens: jnp.ndarray, n_valid: jnp.ndarray,
           cache: Mamba2Cache) -> Tuple[jnp.ndarray, Mamba2Cache]:
    return _seq_forward2(params, cfg, tokens, n_valid, cache)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(params: Dict[str, Any], cfg: Mamba2Config,
                token: jnp.ndarray, cache: Mamba2Cache,
                ) -> Tuple[jnp.ndarray, Mamba2Cache]:
    """One token, O(1) state update — a width-1 _mixer_seq2 would work
    but pays the scan machinery; this is the direct recurrence."""
    x = params["tok_emb"][token][None]
    k = cfg.d_conv
    h_heads, p, n, g = cfg.n_heads, cfg.head_dim, cfg.d_state, cfg.n_groups
    i_sz = cfg.d_inner

    def layer_fn(x, inputs):
        layer, conv_l, ssm_l = inputs
        h_in = _rms(x, layer["norm"], cfg.norm_eps)
        proj = h_in @ layer["w_in"]
        if "b_in" in layer:
            proj = proj + layer["b_in"]
        gate, xbc, dt = jnp.split(proj[0],
                                  [i_sz, i_sz + cfg.conv_dim])
        x_cat = jnp.concatenate([conv_l.astype(xbc.dtype), xbc[None]],
                                axis=0)                # (K, conv_dim)
        conv = (x_cat * layer["conv_w"]).sum(0) + layer["conv_b"]
        xbc_a = jax.nn.silu(conv)
        xi, B, C = jnp.split(xbc_a, [i_sz, i_sz + g * n])
        dt = jax.nn.softplus(dt.astype(jnp.float32) + layer["dt_bias"])
        lo, hi = cfg.dt_limit
        if lo != 0.0 or hi != float("inf"):
            dt = jnp.clip(dt, lo, hi)                  # (H,)
        A = -jnp.exp(layer["A_log"].astype(jnp.float32))
        dA = jnp.exp(dt * A)                           # (H,)
        rep = h_heads // g
        x3 = xi.astype(jnp.float32).reshape(h_heads, p)
        B2 = jnp.repeat(B.astype(jnp.float32).reshape(g, n), rep, axis=0)
        C2 = jnp.repeat(C.astype(jnp.float32).reshape(g, n), rep, axis=0)
        ssm = (dA[:, None, None] * ssm_l
               + (dt[:, None] * x3)[..., None] * B2[:, None, :])
        y = jnp.einsum("hpn,hn->hp", ssm, C2)
        y = y + x3 * layer["d"][:, None]
        y = _gated_norm(y.reshape(1, i_sz), gate[None],
                        layer["gate_norm"], cfg.norm_eps)
        out = y.astype(x.dtype) @ layer["w_out"]
        return x + out, (x_cat[1:], ssm)

    x, (convs, ssms) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.conv, cache.ssm))
    logits = (_rms(x, params["out_norm"], cfg.norm_eps)
              @ params["lm_head"]).astype(jnp.float32)[0]
    return logits, Mamba2Cache(conv=convs.astype(cache.conv.dtype),
                               ssm=ssms, length=cache.length + 1)
