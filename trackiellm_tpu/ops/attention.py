"""Attention kernels: flash prefill (Pallas) + cached decode.

Parity target: llama.cpp's attention over its KV cache, which the
reference's LLM runner drives token-by-token (reference:
src/ai_models/tk_runner_streaming.c:13-84), and whisper.cpp's
encoder/decoder attention.

TPU design:
  - Prefill uses a Pallas flash-attention kernel: online softmax over
    (block_q, block_k) tiles, O(seq) VMEM, MXU for both matmuls. Grid is
    (heads, q_blocks, k_blocks) with k innermost so the running max /
    denominator / accumulator live in VMEM scratch across k steps.
    Causal q/k tile pairs that are fully masked are skipped via
    predication.
  - Decode (one query token against a length-masked KV cache) is a pure
    XLA program: at batch~1 it is bandwidth-bound on the cache read and
    XLA emits a near-roofline fused gather+softmax+weighted-sum; the 7B
    weight streams, not attention, dominate the decode step.
  - Grouped-query attention (Mistral: 32 q heads / 8 kv heads) is handled
    in the kernel index maps — kv tiles are reused across the head group,
    not materialized per q head.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# XLA reference attention (oracle + CPU path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("causal", "window", "softcap",
                                    "scale", "chunk"))
def attention_xla(
    q: jnp.ndarray,  # (H, Sq, D)
    k: jnp.ndarray,  # (Hk, Sk, D)
    v: jnp.ndarray,  # (Hk, Sk, D)
    causal: bool = True,
    window: int = 0,  # sliding window; 0 = unbounded (Mistral parity)
    softcap: float = 0.0,  # Gemma-2 attn logit soft-capping; 0 = off
    scale: float = 0.0,    # query scale override; 0 = 1/sqrt(D)
    sinks=None,            # gpt-oss attention sinks: (H,) per-head logit
    chunk: int = 0,        # Llama-4 chunked attention: same aligned
                           # chunk only (floor(q/C)==floor(k/C)); 0=off
) -> jnp.ndarray:
    h, sq, d = q.shape
    hk = k.shape[0]
    scale = scale or 1.0 / math.sqrt(d)
    if hk != h:
        rep = h // hk
        k = jnp.repeat(k, rep, axis=0)
        v = jnp.repeat(v, rep, axis=0)
    s = jnp.einsum("hqd,hkd->hqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if softcap > 0.0:
        s = softcap * jnp.tanh(s / softcap)
    if causal:
        sk = k.shape[1]
        qi = jnp.arange(sq)[:, None] + (sk - sq)  # align ends
        ki = jnp.arange(sk)[None, :]
        mask = ki <= qi
        if window > 0:
            mask &= ki > qi - window
        if chunk > 0:
            mask &= (ki // chunk) == (qi // chunk)
        s = jnp.where(mask, s, NEG_INF)
    if sinks is not None:
        # gpt-oss attention sinks (transformers GptOssAttention
        # eager_attention_forward): one extra per-head logit joins the
        # softmax and is dropped after — its probability mass simply
        # shrinks every real weight.
        col = jnp.broadcast_to(
            sinks.astype(jnp.float32)[:, None, None], (h, sq, 1))
        p = jax.nn.softmax(jnp.concatenate([s, col], axis=-1),
                           axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hqk,hkd->hqd", p, v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (prefill)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, causal: bool, block_q: int, block_k: int,
                  window: int = 0, softcap: float = 0.0, sinks_ref=None):
    """Flash-attention grid body. When ``sinks_ref`` is bound (the
    gpt-oss variant routes the extra (1,) per-head sink logit in as a
    trailing SMEM input), the finalization step folds it into the
    softmax denominator — mathematically the same as appending one
    always-visible column before the online softmax."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    # Read outside the pl.when bodies: program_id inside a when-branch
    # falls to plain-XLA lowering under interpret mode, which has no
    # rule for it.
    sink = sinks_ref[pl.program_id(0)] if sinks_ref is not None else None

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Causal: skip tiles entirely above the diagonal; with a sliding
    # window also skip tiles entirely below it.
    run = True if not causal else (ki * block_k <= (qi + 1) * block_q - 1)
    if causal and window > 0:
        run = run & ((ki + 1) * block_k - 1 >= qi * block_q - window + 1)

    @pl.when(run)
    def _():
        q = q_ref[0].astype(jnp.float32)          # (bq, d)
        k = k_ref[0].astype(jnp.float32)          # (bk, d)
        v = v_ref[0].astype(jnp.float32)          # (bk, d)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)

        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = cols <= rows
            if window > 0:
                mask &= cols > rows - window
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]                      # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                     # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)            # (bq, 1)

        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[:]
        denom = l_ref[:, :1]
        if sinks_ref is not None:
            m = m_ref[:, :1]
            m_tot = jnp.maximum(m, sink)
            alpha = jnp.exp(m - m_tot)
            denom = denom * alpha + jnp.exp(sink - m_tot)
            acc = acc * alpha
        o_ref[0] = (acc / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_sinks(q_ref, k_ref, v_ref, sinks_ref, o_ref,
                        m_ref, l_ref, acc_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  sinks_ref=sinks_ref, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret", "window",
                     "softcap", "scale"),
)
def flash_attention(
    q: jnp.ndarray,  # (H, S, D)
    k: jnp.ndarray,  # (Hk, S, D)
    v: jnp.ndarray,  # (Hk, S, D)
    causal: bool = True,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    window: int = 0,
    softcap: float = 0.0,
    scale: float = 0.0,
    sinks=None,       # (H,) gpt-oss per-head sink logits
) -> jnp.ndarray:
    h, s, d = q.shape
    hk = k.shape[0]
    rep = h // hk
    scale = scale or 1.0 / math.sqrt(d)
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0, (
        "pad seq to a multiple of the attention block size")

    grid = (h, s // block_q, s // block_k)
    kw = dict(scale=scale, causal=causal, block_q=block_q, block_k=block_k,
              window=window, softcap=softcap)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda hh, qi, ki: (hh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda hh, qi, ki: (hh // rep, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda hh, qi, ki: (hh // rep, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, k, v]
    if sinks is not None:
        kernel = functools.partial(_flash_kernel_sinks, **kw)
        # The whole (H,) sink vector rides in SMEM (Mosaic requires
        # rank-1 blocks to cover the array or tile by 128); the
        # finalization step reads sinks_ref[program_id(0)].
        in_specs.append(pl.BlockSpec((h,), lambda hh, qi, ki: (0,),
                                     memory_space=pltpu.SMEM))
        operands.append(sinks.astype(jnp.float32))
    else:
        kernel = functools.partial(_flash_kernel, **kw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda hh, qi, ki: (hh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * s * s * d,
            bytes_accessed=(h + 2 * hk) * s * d * 2 + h * s * d * 2,
            transcendentals=h * s * s,
        ),
        interpret=interpret,
    )(*operands)


def prefill_attention(q, k, v, causal: bool = True,
                      window: int = 0, softcap: float = 0.0,
                      scale: float = 0.0, sinks=None,
                      chunk: int = 0) -> jnp.ndarray:
    """Dispatch: Pallas flash on TPU, XLA oracle elsewhere. Chunked
    attention (Llama-4) always takes the XLA path — the flash kernel's
    tile-skip logic doesn't know the chunk mask (a dedicated kernel is
    only worth it past the 8192-token chunk width)."""
    from trackiellm_tpu.ops.backend import on_tpu
    s = q.shape[1]
    if chunk > 0:
        return attention_xla(q, k, v, causal=causal, window=window,
                             softcap=softcap, scale=scale, sinks=sinks,
                             chunk=chunk)
    if on_tpu() and s >= 256 and s % 256 == 0:
        return flash_attention(q, k, v, causal=causal, window=window,
                               softcap=softcap, scale=scale, sinks=sinks)
    return attention_xla(q, k, v, causal=causal, window=window,
                         softcap=softcap, scale=scale, sinks=sinks)


# ---------------------------------------------------------------------------
# Cached decode attention (single new token, length-masked cache)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("window", "softcap",
                                             "scale", "chunk"))
def decode_attention(
    q: jnp.ndarray,        # (H, D) — the new token's query
    k_cache: jnp.ndarray,  # (S_max, Hk, D)
    v_cache: jnp.ndarray,  # (S_max, Hk, D)
    cur_len: jnp.ndarray,  # scalar int32: valid prefix length (incl. new tok)
    window: int = 0,       # sliding window; 0 = attend to everything
    softcap: float = 0.0,  # Gemma-2 attn logit soft-capping; 0 = off
    scale: float = 0.0,    # query scale override; 0 = 1/sqrt(D)
    sinks=None,            # gpt-oss attention sinks: (H,) per-head logit
    chunk: int = 0,        # Llama-4 chunked attention; 0 = off
) -> jnp.ndarray:
    h, d = q.shape
    s_max, hk, _ = k_cache.shape
    rep = h // hk
    scale = scale or 1.0 / math.sqrt(d)

    # Keep the big cache operands in their storage dtype and let the
    # MXU accumulate in f32 (preferred_element_type): materializing f32
    # copies of the (S, Hk, D) views costs ~4 MB of extra HBM traffic
    # per layer at bucket 256 — measured ~0.3 ms/token across 32 layers.
    qg = q.reshape(hk, rep, d).astype(k_cache.dtype)
    s = jnp.einsum("grd,sgd->grs", qg, k_cache,
                   preferred_element_type=jnp.float32) * scale  # (Hk,rep,S)
    if softcap > 0.0:
        s = softcap * jnp.tanh(s / softcap)
    idx = jnp.arange(s_max)[None, None, :]
    mask = idx < cur_len
    if window > 0:
        mask &= idx >= cur_len - window
    if chunk > 0:
        # Query position is cur_len - 1; keep keys in its chunk.
        mask &= idx >= ((cur_len - 1) // chunk) * chunk
    s = jnp.where(mask, s, NEG_INF)
    if sinks is not None:
        col = sinks.astype(jnp.float32).reshape(hk, rep, 1)
        p = jax.nn.softmax(jnp.concatenate([s, col], axis=-1),
                           axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("grs,sgd->grd", p.astype(v_cache.dtype), v_cache,
                     preferred_element_type=jnp.float32)
    return out.reshape(h, d).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("window", "softcap", "scale"))
def paged_decode_attention(
    q: jnp.ndarray,         # (H, D)
    k_pages: jnp.ndarray,   # (n_pages, page_size, Hk, D) — global page pool
    v_pages: jnp.ndarray,   # (n_pages, page_size, Hk, D)
    page_table: jnp.ndarray,  # (pages_per_seq,) int32 page ids for this seq
    cur_len: jnp.ndarray,     # scalar int32
    window: int = 0,
    softcap: float = 0.0,
    scale: float = 0.0,
    sinks=None,
) -> jnp.ndarray:
    """Decode attention over a paged KV pool: the sequence's pages are
    gathered through ``page_table`` (the paged-KV layout lets the runtime
    grow many conversations inside one preallocated pool — the TPU
    analogue of llama.cpp's KV cells)."""
    page_size = k_pages.shape[1]
    k_seq = k_pages[page_table].reshape(-1, *k_pages.shape[2:])
    v_seq = v_pages[page_table].reshape(-1, *v_pages.shape[2:])
    del page_size
    return decode_attention(q, k_seq, v_seq, cur_len, window=window,
                            softcap=softcap, scale=scale, sinks=sinks)
