"""Context parallelism: exact ring attention over a ``cp`` mesh axis.

Long-context prefill is quadratic in sequence and linear in activation
memory — the axis that saturates one chip first. Here the SEQUENCE is
sharded: each device holds an S/P block of Q, K and V, and K/V blocks
rotate around the ring with ``jax.lax.ppermute`` (one neighbor hop per
step, the cheapest ICI collective) while each device folds the visiting
block into its queries' attention with an online-softmax accumulator
(the flash-attention recurrence: running row-max m, normalizer l,
weighted accumulator). After P hops every (q, k) pair has been scored
exactly once — bit-for-the-same-math as single-device causal attention,
tested against it.

Causality falls out of the GLOBAL position mask, computed per hop from
position vectors that ride the ring with their K/V blocks — so ANY
token-to-device assignment is exact. The default assignment is the
load-balanced zig-zag (:func:`zigzag_permutation`): each device owns a
front half-block plus its mirrored tail half-block, equalizing causal
work per hop (contiguous blocks waste 2x — the first device masks off
nearly everything it receives while the last computes it all).

`cp_lm_forward` runs the full dense-model forward with the sequence
sharded end to end (embedding lookup through lm_head) — activations
per chip scale 1/P, so max context scales P-fold. Differentiable
(ppermute/scan transpose cleanly), so it also serves long-context
fine-tuning.

The reference has no distributed compute (SURVEY.md section 2.10);
this module is part of the rebuild's beyond-reference scaling story.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from trackiellm_tpu.models import llm as llm_model


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, scale: float,
                   q_pos: jnp.ndarray = None,
                   k_pos: jnp.ndarray = None,
                   gqa_rep: int = 1,
                   softcap: float = 0.0,
                   window=None) -> jnp.ndarray:
    """Exact causal attention with S sharded over ``axis_name``.

    q: LOCAL (Sb, Hq, Dh) block; k, v: LOCAL (Sb, Hkv, Dh) blocks —
    call inside shard_map. ``gqa_rep`` = Hq/Hkv: K/V ride the ring in
    their NARROW kv-head form and repeat to the full head count inside
    each hop, so ICI bytes per hop stay 1/gqa_rep of the naive
    pre-repeated layout (review round-3 catch — K/V rotation bandwidth
    is the dominant cost of exactly the long-context regime this
    module exists for). Returns the local (Sb, Hq, Dh) output in f32.

    ``q_pos``/``k_pos`` (local (Sb,) global position vectors) support
    ARBITRARY token-to-device assignments: the causal mask is computed
    from the actual positions, and k_pos rides the ring with its K/V
    block. Default: contiguous blocks in device order. The zig-zag
    assignment (:func:`zigzag_permutation`) balances causal work across
    devices — with contiguous blocks device 0 masks off almost
    everything it receives while the last device computes almost all
    of it (2x the minimal FLOPs end to end); zig-zag gives every
    device an equal mix of early and late rows.

    ``softcap``: Gemma-2 attention logit soft-capping (0 = off), applied
    to raw scores before masking — identical placement to
    ops/attention. ``window``: sliding window (0/None = unbounded;
    may be a TRACED scalar so alternating-window configs can select it
    per layer inside a scan), masked as ``q_pos - k_pos < window`` from
    the global position vectors, so it is assignment-exact too.
    """
    n_dev = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    sb = q.shape[0]
    q32 = q.astype(jnp.float32) * scale
    if q_pos is None:
        q_pos = me * sb + jnp.arange(sb)                   # global rows
    if k_pos is None:
        k_pos = q_pos

    def hop(carry, r):
        kb, vb, k_pos, m, l, acc = carry
        kbh = jnp.repeat(kb, gqa_rep, axis=1) if gqa_rep > 1 else kb
        vbh = jnp.repeat(vb, gqa_rep, axis=1) if gqa_rep > 1 else vb
        scores = jnp.einsum("qhd,khd->hqk", q32, kbh.astype(jnp.float32))
        if softcap > 0.0:
            scores = softcap * jnp.tanh(scores / softcap)
        causal = q_pos[None, :, None] >= k_pos[None, None, :]
        if window is not None:
            win = jnp.int32(window)
            causal &= (win == 0) | (
                q_pos[None, :, None] - k_pos[None, None, :] < win)
        scores = jnp.where(causal, scores, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))    # (H, Sb)
        # exp(-inf - -inf) guards: a fully-masked row keeps m = -inf;
        # correction exp(m - m_new) with both -inf must be 1.
        corr = jnp.exp(jnp.where(m == m_new, 0.0, m - m_new))
        p = jnp.exp(scores - m_new[..., None])              # (H, Sb, Sk)
        p = jnp.where(causal, p, 0.0)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = (acc * corr[..., None]
               + jnp.einsum("hqk,khd->hqd", p, vbh.astype(jnp.float32)))
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        k_pos = jax.lax.ppermute(k_pos, axis_name, perm)
        return (kb, vb, k_pos, m_new, l, acc), None

    h = q.shape[1]
    m0 = jnp.full((h, sb), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((h, sb), jnp.float32)
    acc0 = jnp.zeros((h, sb, q.shape[2]), jnp.float32)
    (_, _, _, _, l, acc), _ = jax.lax.scan(
        hop, (k, v, k_pos, m0, l0, acc0), jnp.arange(n_dev))
    out = acc / jnp.maximum(l, 1e-30)[..., None]            # (H, Sb, Dh)
    return out.transpose(1, 0, 2)                           # (Sb, H, Dh)


def zigzag_permutation(s: int, n_dev: int) -> jnp.ndarray:
    """Token order that gives device d rows [d*h, (d+1)*h) AND the
    mirrored tail [s-(d+1)*h, s-d*h), h = s/(2*cp) — every device then
    owns an equal mix of early (cheap) and late (expensive) causal
    rows, so ring hops do balanced useful work instead of device 0
    masking everything off."""
    half = s // (2 * n_dev)
    parts = []
    for d in range(n_dev):
        parts.append(jnp.arange(d * half, (d + 1) * half))
        parts.append(jnp.arange(s - (d + 1) * half, s - d * half))
    return jnp.concatenate(parts)


def cp_lm_forward(params: Dict[str, Any], cfg: llm_model.LLMConfig,
                  mesh: Mesh, tokens: jnp.ndarray,
                  zigzag: bool = True) -> jnp.ndarray:
    """Full dense-model forward, (S,) tokens -> (S, V) logits, with the
    sequence sharded over the mesh's ``cp`` axis end to end.

    ``zigzag`` (default): load-balanced block assignment via
    :func:`zigzag_permutation`; logits come back in natural order
    either way. MoE configs work (the MLP is token-local, so sequence
    sharding does not touch the router)."""
    from trackiellm_tpu.parallel import layers as shared_layers

    (s,) = tokens.shape
    n_dev = mesh.shape["cp"]
    assert s % n_dev == 0, (s, n_dev)
    if zigzag and s % (2 * n_dev):
        zigzag = False
    rep = cfg.n_heads // cfg.n_kv_heads
    scale = llm_model._attn_scale(cfg)
    half = s // (2 * n_dev)
    if zigzag:
        perm = zigzag_permutation(s, n_dev)
        tokens = tokens[perm]

    from jax.experimental.shard_map import shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), P("cp")),
        out_specs=P("cp", None), check_rep=False)
    def run(prm, toks):
        me = jax.lax.axis_index("cp")
        sb = toks.shape[0]
        if zigzag:
            positions = jnp.concatenate([
                me * half + jnp.arange(half),
                s - (me + 1) * half + jnp.arange(half)])
        else:
            positions = me * sb + jnp.arange(sb)
        freqs = llm_model._freqs(prm, cfg, s)
        x = prm["tok_emb"][toks]

        def ring_core(q, k, v, li):
            # Per-layer (possibly alternating) window rides the traced
            # layer index; the hop mask applies it from GLOBAL
            # positions, so zig-zag assignments stay exact.
            win = shared_layers.layer_windows(cfg, li)
            return ring_attention(q, k, v, "cp", scale,
                                  q_pos=positions, k_pos=positions,
                                  gqa_rep=rep, softcap=cfg.attn_softcap,
                                  window=win)

        def layer_fn(x, inputs):
            layer, li = inputs
            # Shared config-aware body (family zoo); the MLP is
            # token-local so it needs no cross-device exchange under
            # sequence sharding.
            x, _ = shared_layers.transformer_layer(
                x, layer, li, cfg, freqs, positions, attn_core=ring_core)
            return x, None

        x, _ = jax.lax.scan(layer_fn, x,
                            (prm["layers"], jnp.arange(cfg.n_layers)))
        return llm_model._output_logits(prm, cfg, x)

    out = run(params, tokens)
    if zigzag:
        out = jnp.zeros_like(out).at[perm].set(out)
    return out
