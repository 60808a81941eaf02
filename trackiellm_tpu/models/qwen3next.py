"""Qwen3-Next: hybrid Gated-DeltaNet / gated-attention family.

The 2025 Qwen3-Next-80B-A3B architecture mixes, in a 3:1 pattern,
linear-attention **Gated DeltaNet** layers (causal conv + per-head
gated delta-rule state, O(1) memory per token) with **gated full
attention** layers (GQA + per-head zero-centered QK RMSNorm + partial
rotary + sigmoid output gating), over a Qwen-MoE MLP stack (softmax
top-k renormalized + sigmoid-gated shared expert) and zero-centered
RMSNorms throughout.

v1 design notes (correct-first; the optimization path is known):

- **Exact-length prefill** (no bucket padding): the delta-rule state is
  a recurrence — padded positions would corrupt it. One traced program
  per prompt length; the Mamba module's chunk-fold trick is the
  follow-up for bucketed ingestion.
- The delta recurrence runs as ONE ``lax.scan`` over time inside each
  linear layer (the reference's ``torch_recurrent_gated_delta_rule``
  semantics, vectorized over heads). The chunk-parallel form
  (``torch_chunk_gated_delta_rule``) is the throughput follow-up.
- Layers are heterogeneous, so the stack is a per-layer list (an
  unrolled loop in the traced program), not a scanned stack.

Oracle: transformers ``Qwen3NextForCausalLM`` — teacher-forced logits
and cached decode pinned exact in tests/test_qwen3next.py. Parity:
the reference serves whatever llama.cpp loads
(src/ai_models/tk_model_loader.c:199); qwen3-next is the current
frontier open-weight family in that ecosystem.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.models.llm import _linear


class Qwen3NextConfig(NamedTuple):
    vocab_size: int = 2048
    dim: int = 64
    n_layers: int = 4
    layer_types: Tuple[str, ...] = ("l", "l", "l", "f")  # l=linear f=full
    # full attention
    n_heads: int = 4
    n_kv_heads: int = 2
    head_dim: int = 16
    partial_rotary_factor: float = 0.25
    rope_theta: float = 10000.0
    # gated deltanet (linear attention)
    lin_k_heads: int = 2
    lin_v_heads: int = 4
    lin_dk: int = 16
    lin_dv: int = 16
    conv_k: int = 4
    # MLP / MoE (n_experts=0 -> dense MLP of hidden_dim)
    hidden_dim: int = 128
    n_experts: int = 0
    n_experts_used: int = 2
    moe_hidden: int = 0
    shared_hidden: int = 0
    norm_topk: bool = True
    norm_eps: float = 1e-6
    max_seq: int = 512

    @property
    def conv_dim(self) -> int:
        return 2 * self.lin_k_heads * self.lin_dk \
            + self.lin_v_heads * self.lin_dv

    @classmethod
    def tiny(cls) -> "Qwen3NextConfig":
        return cls()


def _norm(x, w, eps):
    """Zero-centered RMSNorm: weights store w, the scale is (1 + w) —
    all in f32 before the cast (Qwen3NextRMSNorm)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (xf * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _gated_norm(x, w, gate, eps):
    """Norm-then-gate (Qwen3NextRMSNormGated: plain weight, f32 silu
    gate)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    xf = w.astype(jnp.float32) * xf
    return (xf * jax.nn.silu(gate.astype(jnp.float32))).astype(x.dtype)


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


def _rope(x, positions, cfg: Qwen3NextConfig):
    """Partial split-half rotary on the leading rotary dims."""
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    half = rot // 2
    freqs = 1.0 / (cfg.rope_theta
                   ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = positions[:, None].astype(jnp.float32) * freqs   # (S, half)
    cos = jnp.cos(ang)[:, None, :]
    sin = jnp.sin(ang)[:, None, :]
    xr = x[..., :rot].astype(jnp.float32)
    x1, x2 = jnp.split(xr, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1).astype(x.dtype)
    return jnp.concatenate([out, x[..., rot:]], axis=-1)


# ---------------------------------------------------------------------------
# Full-attention layer (gated)
# ---------------------------------------------------------------------------

def fuse_projections(params, cfg: Qwen3NextConfig):
    """Concatenate each layer's input projections into ONE matmul
    (``w_in``): linear layers fold [wq|wk|wv|wz|wb|wa], attention
    layers [wq|wk|wv]. At decode (S=1) every projection is a thin
    (1, D) x (D, N) whose cost is the WEIGHT stream; one wide matrix
    replaces six separate DMA streams per DeltaNet layer, the
    fused-linear-decode lever VERDICT r4 #5b names. Output slicing is
    free (the rows were already regrouped to global order at
    conversion). Dense (bf16/f32) trees only — the measured-right
    dtype at this family's ~1B scale (BASELINE.md row 10); quantized
    banks keep the split layout."""
    from trackiellm_tpu.ops.quant import QuantizedLinear

    layers = []
    for lt, lp in zip(cfg.layer_types, params["layers"]):
        keys = (("wq", "wk", "wv", "wz", "wb", "wa") if lt == "l"
                else ("wq", "wk", "wv"))
        if any(isinstance(lp[k], QuantizedLinear) for k in keys):
            layers.append(lp)
            continue
        lp = dict(lp)
        lp["w_in"] = jnp.concatenate([lp.pop(k) for k in keys],
                                     axis=1)
        layers.append(lp)
    return {**params, "layers": layers}


def _attn_layer(lp, cfg: Qwen3NextConfig, x, positions, k_cache, v_cache,
                kv_len):
    """x (S, D); cache (S_cache, Hk, hd) holds keys/values for
    positions [0, kv_len); this call appends S new positions starting
    at kv_len. Returns (out, new_k, new_v)."""
    s = x.shape[0]
    h, hk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    if "w_in" in lp:
        y = _linear(x, lp["w_in"])
        qd = h * 2 * hd
        kvd = hk * hd
        qg = y[:, :qd].reshape(s, h, 2 * hd)
        k = y[:, qd: qd + kvd].reshape(s, hk, hd)
        v = y[:, qd + kvd:].reshape(s, hk, hd)
    else:
        qg = _linear(x, lp["wq"]).reshape(s, h, 2 * hd)
        k = _linear(x, lp["wk"]).reshape(s, hk, hd)
        v = _linear(x, lp["wv"]).reshape(s, hk, hd)
    q, gate = qg[..., :hd], qg[..., hd:]
    q = _norm(q, lp["q_norm"], cfg.norm_eps)
    k = _norm(k, lp["k_norm"], cfg.norm_eps)
    q = _rope(q, positions, cfg)
    k = _rope(k, positions, cfg)

    new_k = jax.lax.dynamic_update_slice(k_cache, k, (kv_len, 0, 0))
    new_v = jax.lax.dynamic_update_slice(v_cache, v, (kv_len, 0, 0))

    rep = h // hk
    qh = q.reshape(s, hk, rep, hd)
    scores = jnp.einsum("sgrd,tgd->grst", qh.astype(jnp.float32),
                        new_k.astype(jnp.float32)) / math.sqrt(hd)
    t_idx = jnp.arange(new_k.shape[0])[None, None, None, :]
    q_pos = positions[None, None, :, None]
    mask = t_idx <= q_pos
    scores = jnp.where(mask, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("grst,tgd->sgrd", p,
                     new_v.astype(jnp.float32)).reshape(s, h * hd)
    out = out.astype(x.dtype) * jax.nn.sigmoid(
        gate.reshape(s, h * hd).astype(jnp.float32)).astype(x.dtype)
    return _linear(out, lp["wo"]), new_k, new_v


# ---------------------------------------------------------------------------
# Gated DeltaNet layer (linear attention)
# ---------------------------------------------------------------------------

def _delta_layer(lp, cfg: Qwen3NextConfig, x, conv_state, rec_state,
                 length, real):
    """x (S, D); ``length``/``real`` mark the real prefix (padding
    semantics: see forward). conv_state (conv_dim, K-1) holds the
    PREVIOUS inputs; rec_state (Hv, dk, dv). Returns (out,
    new_conv_state, new_rec)."""
    s = x.shape[0]
    hk, hv = cfg.lin_k_heads, cfg.lin_v_heads
    dk, dv = cfg.lin_dk, cfg.lin_dv

    if "w_in" in lp:
        # One fused weight stream (see fuse_projections); slice order
        # matches the concat: [q | k | v | z | b | a].
        y = _linear(x, lp["w_in"])
        o = 0
        widths = (hk * dk, hk * dk, hv * dv, hv * dv, hv, hv)
        cuts = []
        for wdt in widths:
            cuts.append(y[:, o: o + wdt])
            o += wdt
        q, k, v, z, b, a = cuts
        z = z.reshape(s, hv, dv)
    else:
        q = _linear(x, lp["wq"])          # (S, hk*dk)
        k = _linear(x, lp["wk"])
        v = _linear(x, lp["wv"])
        z = _linear(x, lp["wz"]).reshape(s, hv, dv)
        b = x @ lp["wb"]                  # (S, hv)
        a = x @ lp["wa"]

    mixed = jnp.concatenate([q, k, v], axis=-1)      # (S, conv_dim)
    hist = jnp.concatenate([conv_state.T, mixed], axis=0)  # (K-1+S, C)
    # Conv window ending at the LAST REAL input: hist[K-1+t] is
    # input[t], so the K-1 rows before the first pad start at
    # hist[length].
    new_conv_state = jax.lax.dynamic_slice(
        hist, (length, 0), (cfg.conv_k - 1, cfg.conv_dim)).T
    # Depthwise causal conv as K shifted multiply-adds (Mamba trick).
    w = lp["conv_w"]                                  # (conv_dim, K)
    acc = jnp.zeros((s, cfg.conv_dim), jnp.float32)
    for j in range(cfg.conv_k):
        acc = acc + hist[j: j + s].astype(jnp.float32) \
            * w[:, j].astype(jnp.float32)
    mixed = jax.nn.silu(acc).astype(x.dtype)

    kd = hk * dk
    q = mixed[:, :kd].reshape(s, hk, dk)
    k = mixed[:, kd: 2 * kd].reshape(s, hk, dk)
    v = mixed[:, 2 * kd:].reshape(s, hv, dv)

    beta = jax.nn.sigmoid(b.astype(jnp.float32))      # (S, hv)
    g = -jnp.exp(lp["a_log"].astype(jnp.float32)) \
        * jax.nn.softplus(a.astype(jnp.float32)
                          + lp["dt_bias"].astype(jnp.float32))
    # Padded positions are recurrence no-ops: decay exp(0)=1, beta=0.
    beta = jnp.where(real[:, None], beta, 0.0)
    g = jnp.where(real[:, None], g, 0.0)
    rep = hv // hk
    q = jnp.repeat(q, rep, axis=1)                    # (S, hv, dk)
    k = jnp.repeat(k, rep, axis=1)
    q = _l2norm(q.astype(jnp.float32))
    k = _l2norm(k.astype(jnp.float32))
    q = q / math.sqrt(dk)
    v = v.astype(jnp.float32)

    if s >= 8:
        core, rec = _chunk_gated_delta(
            q.transpose(1, 0, 2), k.transpose(1, 0, 2),
            v.transpose(1, 0, 2), g.T, beta.T,
            rec_state.astype(jnp.float32))
        core = core.transpose(1, 0, 2)                # (S, hv, dv)
    else:
        def step(state, inputs):
            q_t, k_t, v_t, g_t, b_t = inputs          # (hv, dk) ...
            state = state * jnp.exp(g_t)[:, None, None]
            kv_mem = jnp.einsum("hkv,hk->hv", state, k_t)
            delta = (v_t - kv_mem) * b_t[:, None]
            state = state + k_t[:, :, None] * delta[:, None, :]
            out_t = jnp.einsum("hkv,hk->hv", state, q_t)
            return state, out_t

        rec, core = jax.lax.scan(
            step, rec_state.astype(jnp.float32), (q, k, v, g, beta))
    core = _gated_norm(core.astype(x.dtype), lp["o_norm"], z,
                       cfg.norm_eps)                   # (S, hv, dv)
    return _linear(core.reshape(s, hv * dv), lp["wo"]), \
        new_conv_state, rec


def _chunk_gated_delta(q, k, v, g, beta, state0, chunk: int = 64):
    """Chunk-parallel gated delta rule — TPU-first prefill: in-chunk
    work is dense matmuls + one unit-lower triangular solve (MXU),
    with ONE sequential carry per chunk instead of per token. Exactly
    the recurrence's math, reassociated (the reference's
    ``torch_chunk_gated_delta_rule``; equality vs the per-token scan is
    pinned in tests).

    q, k: (H, T, dk) — already l2-normed, q pre-scaled by 1/sqrt(dk);
    v: (H, T, dv); g, beta: (H, T); state0 (H, dk, dv) f32.
    Returns (out (H, T, dv) f32, final state)."""
    h, t, dk = k.shape
    dv = v.shape[-1]
    c = min(chunk, max(8, t))
    pad = (-t) % c
    if pad:
        zf = lambda x, w: jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * w)  # noqa: E731
        q, k, v = zf(q, 1), zf(k, 1), zf(v, 1)
        g, beta = zf(g, 0), zf(beta, 0)
    n = (t + pad) // c
    qc = q.reshape(h, n, c, dk)
    kc = k.reshape(h, n, c, dk)
    vc = v.reshape(h, n, c, dv)
    gc = jnp.cumsum(g.reshape(h, n, c), axis=-1)       # in-chunk decay
    bc = beta.reshape(h, n, c)
    v_beta = vc * bc[..., None]
    k_beta = kc * bc[..., None]

    tri_lo = jnp.tril(jnp.ones((c, c), bool), -1)      # strict lower
    decay = jnp.where(
        jnp.tril(jnp.ones((c, c), bool)),
        jnp.exp(gc[..., :, None] - gc[..., None, :]), 0.0)
    a = jnp.where(tri_lo, -(jnp.einsum("hncd,hnkd->hnck", k_beta, kc)
                            * decay), 0.0)
    # attn = (I - A)^{-1} for unit-lower-triangular (I - A).
    eye = jnp.eye(c, dtype=a.dtype)
    inv = jax.scipy.linalg.solve_triangular(
        eye - a, jnp.broadcast_to(eye, a.shape), lower=True,
        unit_diagonal=True)
    u = jnp.einsum("hnck,hnkd->hncd", inv, v_beta)
    w = jnp.einsum("hnck,hnkd->hncd", inv,
                   k_beta * jnp.exp(gc)[..., None])

    intra_mask = jnp.tril(jnp.ones((c, c), bool))

    def chunk_step(state, inputs):
        q_i, k_i, u_i, w_i, g_i, d_i = inputs
        v_prime = jnp.einsum("hcd,hdv->hcv", w_i, state)
        v_new = u_i - v_prime
        attn_inter = jnp.einsum(
            "hcd,hdv->hcv", q_i * jnp.exp(g_i)[..., None], state)
        intra = jnp.where(intra_mask,
                          jnp.einsum("hcd,hkd->hck", q_i, k_i) * d_i,
                          0.0)
        out_i = attn_inter + jnp.einsum("hck,hkv->hcv", intra, v_new)
        g_last = g_i[:, -1]
        state = state * jnp.exp(g_last)[:, None, None] \
            + jnp.einsum(
                "hcd,hcv->hdv",
                k_i * jnp.exp(g_last[:, None] - g_i)[..., None], v_new)
        return state, out_i

    seq = (qc.transpose(1, 0, 2, 3), kc.transpose(1, 0, 2, 3),
           u.transpose(1, 0, 2, 3), w.transpose(1, 0, 2, 3),
           gc.transpose(1, 0, 2), decay.transpose(1, 0, 2, 3))
    state, outs = jax.lax.scan(chunk_step, state0, seq)
    out = outs.transpose(1, 0, 2, 3).reshape(h, t + pad, dv)
    return out[:, :t], state


# ---------------------------------------------------------------------------
# MLP / MoE
# ---------------------------------------------------------------------------

def _expert(bank, e: int):
    """Slice expert ``e`` from a dense (E, K, N) bank or a per-expert
    QuantizedLinear stack."""
    from trackiellm_tpu.ops.quant import QuantizedLinear

    if isinstance(bank, QuantizedLinear):
        return QuantizedLinear(values=bank.values[e],
                               scales=bank.scales[e])
    return bank[e]


def _mlp(lp, cfg: Qwen3NextConfig, x):
    if "moe_gate" not in lp:
        gu = _linear(x, lp["w_gu"])
        gate, up = jnp.split(gu, 2, axis=-1)
        return _linear(jax.nn.silu(gate) * up, lp["w_down"])
    logits = (x @ lp["moe_gate"]).astype(jnp.float32)
    scores = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(scores, cfg.n_experts_used)
    if cfg.norm_topk:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    from trackiellm_tpu.models.llm import _moe_use_routed

    if _moe_use_routed(x.shape[0], lp["w_gu"]):
        # Sorted grouped-matmul dispatch (K/E of the dense FLOPs; the
        # llm.py _moe_routed pattern — advisor r4: the dense loop
        # wastes ~E/k of the MoE FLOPs at the published 80B-A3B
        # expert counts and unrolls E matmuls into the program).
        K = cfg.n_experts_used
        flat_expert = topi.reshape(-1)                   # (S*K,)
        order = jnp.argsort(flat_expert, stable=True)
        src_tok = order // K
        xs = jnp.take(x, src_tok, axis=0)                # (S*K, D)
        group_sizes = jnp.bincount(
            flat_expert, length=cfg.n_experts).astype(jnp.int32)
        gu = jax.lax.ragged_dot(xs, lp["w_gu"], group_sizes,
                                preferred_element_type=jnp.float32)
        gate, up = jnp.split(gu, 2, axis=-1)
        ys = jax.lax.ragged_dot(
            (jax.nn.silu(gate) * up).astype(x.dtype),
            lp["w_down"], group_sizes,
            preferred_element_type=jnp.float32)          # (S*K, D)
        wts = jnp.take(topv.reshape(-1), order)
        out = jnp.zeros((x.shape[0], cfg.dim), jnp.float32).at[
            src_tok].add(ys * wts[:, None])
    else:
        # Dense-all-experts (decode sizes / quantized banks): every
        # expert computes, weighted by the zero-off-top-k (S, E)
        # matrix; exactness-tested against the routed path.
        weights = jnp.sum(jax.nn.one_hot(topi, cfg.n_experts,
                                         dtype=jnp.float32)
                          * topv[..., None], axis=-2)     # (S, E)
        out = jnp.zeros((x.shape[0], cfg.dim), jnp.float32)
        for e in range(cfg.n_experts):
            gu = _linear(x, _expert(lp["w_gu"], e))
            gate, up = jnp.split(gu, 2, axis=-1)
            y = _linear(jax.nn.silu(gate) * up,
                        _expert(lp["w_down"], e))
            out = out + weights[:, e: e + 1] * y.astype(jnp.float32)
    sg = jax.nn.sigmoid((x @ lp["shared_gate"]).astype(jnp.float32))
    gu = _linear(x, lp["shared_gu"])
    gate, up = jnp.split(gu, 2, axis=-1)
    shared = _linear(jax.nn.silu(gate) * up, lp["shared_down"])
    return (out + sg * shared.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Cache + forward
# ---------------------------------------------------------------------------

def create_cache(cfg: Qwen3NextConfig, dtype=jnp.float32):
    """Per-layer hybrid state: (k, v) for full-attention layers;
    (conv, rec) for linear layers. `length` counts ingested tokens."""
    states: List[Dict[str, Any]] = []
    for lt in cfg.layer_types:
        if lt == "f":
            states.append({
                "k": jnp.zeros((cfg.max_seq, cfg.n_kv_heads,
                                cfg.head_dim), dtype),
                "v": jnp.zeros((cfg.max_seq, cfg.n_kv_heads,
                                cfg.head_dim), dtype),
            })
        else:
            states.append({
                "conv": jnp.zeros((cfg.conv_dim, cfg.conv_k - 1),
                                  dtype),
                "rec": jnp.zeros((cfg.lin_v_heads, cfg.lin_dk,
                                  cfg.lin_dv), jnp.float32),
            })
    return {"layers": states, "length": jnp.int32(0)}


def forward(params, cfg: Qwen3NextConfig, tokens: jnp.ndarray, cache,
            length=None):
    """tokens (S,); ``length`` (traced scalar) marks how many are REAL
    — padded tail positions are inert: their K/V rows land past the
    advanced length (overwritten by the next call, masked meanwhile —
    the llm.py stale-row contract), the conv window is sliced at the
    last real input, and the delta recurrence sees g=0/beta=0 no-ops.
    None = every position is real. Returns (all_logits (S, V),
    new_cache); rows at/after ``length`` are junk."""
    s = tokens.shape[0]
    if length is None:
        length = jnp.int32(s)
    start = cache["length"]
    positions = start + jnp.arange(s)
    real = jnp.arange(s) < length
    x = params["tok_emb"][tokens]
    new_states = []
    for li, lt in enumerate(cfg.layer_types):
        lp = params["layers"][li]
        st = cache["layers"][li]
        h = _norm(x, lp["attn_norm"], cfg.norm_eps)
        if lt == "f":
            out, nk, nv = _attn_layer(lp, cfg, h, positions,
                                      st["k"], st["v"], start)
            new_states.append({"k": nk, "v": nv})
        else:
            out, nc, nr = _delta_layer(lp, cfg, h, st["conv"],
                                       st["rec"], length, real)
            new_states.append({"conv": nc, "rec": nr})
        x = x + out
        h = _norm(x, lp["mlp_norm"], cfg.norm_eps)
        x = x + _mlp(lp, cfg, h)
    x = _norm(x, params["out_norm"], cfg.norm_eps)
    logits = _linear(x, params["lm_head"])
    return logits, {"layers": new_states, "length": start + length}


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(params, cfg: Qwen3NextConfig, tokens, length, cache):
    """Padded-chunk ingestion (the Mamba session contract): (last-real
    logits, cache)."""
    logits, cache = forward(params, cfg, tokens, cache, length=length)
    return jax.lax.dynamic_index_in_dim(logits, length - 1, axis=0,
                                        keepdims=False), cache


extend = prefill  # recurrent state: continuation IS another prefill


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(params, cfg: Qwen3NextConfig, token, cache):
    logits, cache = forward(params, cfg,
                            jnp.asarray(token, jnp.int32)[None], cache)
    return logits[0], cache


class Cache:
    """Factory shim matching the Mamba session's cache contract."""

    @staticmethod
    def create(cfg: Qwen3NextConfig, dtype=jnp.float32):
        return create_cache(cfg, dtype)


def greedy_generate(params, cfg: Qwen3NextConfig, prompt: np.ndarray,
                    n_tokens: int) -> List[int]:
    """Host greedy loop (tests / smoke); the production session is
    :class:`trackiellm_tpu.models.mamba.MambaRunner` with
    ``model=qwen3next`` (the recurrent-family session contract —
    strictly sequential, no rollback)."""
    cache = create_cache(cfg)
    ids = jnp.asarray(prompt, jnp.int32)
    logits, cache = prefill(params, cfg, ids, jnp.int32(len(prompt)),
                            cache)
    out = []
    tok = jnp.argmax(logits).astype(jnp.int32)
    for _ in range(n_tokens):
        out.append(int(tok))
        logits, cache = decode_step(params, cfg, tok, cache)
        tok = jnp.argmax(logits).astype(jnp.int32)
    return out


def quantize_params(params: Dict[str, Any], bits: int = 4,
                    group: int = 256) -> Dict[str, Any]:
    """Quantize the big per-layer matrices of the hybrid tree (the
    attention/DeltaNet projections, dense-MLP banks and lm_head carry
    ~95% of the bytes; norms, conv kernels, dt/A and the small b/a
    projections stay high-precision, matching the Mamba policy).
    Decode is weight-bandwidth-bound, so Q4 is a direct tok/s lever."""
    from trackiellm_tpu.ops.quant import quantize_q4, quantize_q8

    quantize = quantize_q4 if bits == 4 else quantize_q8

    def q(w):
        return quantize(jnp.asarray(w, jnp.float32), group)

    from trackiellm_tpu.ops.quant import QuantizedLinear

    def q_bank(w):
        """(E, K, N) MoE expert bank -> per-expert quantized stack (the
        dominant bytes of the published 80B-A3B shape)."""
        qs = [q(w[e]) for e in range(w.shape[0])]
        return QuantizedLinear(
            values=jnp.stack([x.values for x in qs]),
            scales=jnp.stack([x.scales for x in qs]))

    out = dict(params)
    layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for name in ("wq", "wk", "wv", "wz", "wo", "w_gu", "w_down",
                     "shared_gu", "shared_down"):
            if name not in nlp or isinstance(nlp[name], dict):
                continue
            arr = nlp[name]
            if not hasattr(arr, "ndim"):
                continue
            if arr.ndim == 2 and min(arr.shape) >= group:
                nlp[name] = q(arr)
            elif arr.ndim == 3 and min(arr.shape[1:]) >= group:
                nlp[name] = q_bank(arr)
        layers.append(nlp)
    out["layers"] = layers
    out["lm_head"] = q(params["lm_head"])
    return out
