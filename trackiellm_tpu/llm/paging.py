"""Paged KV cache: page-pool allocator + paged decode.

Parity target: the north star requires "an honest single-chip paged KV
cache" (BASELINE.json) — the TPU analogue of llama.cpp's KV cells /
vLLM's PagedAttention. Many conversations share one preallocated page
pool; each sequence holds a page table; pages return to the free list
when a conversation ends, so memory scales with *live tokens*, not
(max_seq x max_conversations).

Device side: the pools are (L, n_pages, page_size, Hk, D) buffers; one
jitted ``decode_step_paged`` writes the new token's KV into
table[len // page_size] at slot ``len % page_size`` and attends over the
gathered pages (ops/attention.paged_decode_attention semantics, fused
into the layer scan). Host side: :class:`PagedKVPool` manages the free
list and tables.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError


class QuantPool(NamedTuple):
    """int8-quantized page pool: values + per-(cell, head) f32 scales.

    The TPU analogue of llama.cpp's quantized KV cache (`-ctk q8_0`,
    ggml type GGML_TYPE_Q8_0 KV cells): each (token-cell, kv-head) row
    of D values stores int8 with one f32 amax/127 scale — 2x the
    conversations per pool byte, and every page gather reads HALF the
    HBM bytes (the dequant multiply is VPU-cheap next to the
    bandwidth). Scale overhead: 4/(D) per value (~0.8% at D=128).
    Construct via ``PagedKVPool(..., dtype=jnp.int8)``."""
    vals: jnp.ndarray   # int8 (L, P, page, Hk, D)
    scale: jnp.ndarray  # f32  (L, P, page, Hk)


def _quant_cells(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8: (..., D) -> (int8 (..., D), f32 scale
    (...,)). Round-to-nearest; amax/127 keeps the codebook symmetric
    (no zero-point — K/V are zero-centered post-RMSNorm/rope)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0 + 1e-8
    q = jnp.round(xf / scale[..., None])
    return q.astype(jnp.int8), scale


def _dequant_cells(vals: jnp.ndarray, scale: jnp.ndarray,
                   dtype) -> jnp.ndarray:
    return (vals.astype(jnp.float32)
            * scale[..., None].astype(jnp.float32)).astype(dtype)


def _pool_vals(pool) -> jnp.ndarray:
    """The (L, P, page, Hk, D) value array of either pool layout."""
    return pool.vals if isinstance(pool, QuantPool) else pool


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step_paged(
    params: Dict[str, Any],
    cfg: llm_model.LLMConfig,
    token: jnp.ndarray,        # scalar int32
    pool_k: jnp.ndarray,       # (L, P, page, Hk, D)
    pool_v: jnp.ndarray,
    table: jnp.ndarray,        # (max_pages,) int32 — this sequence's pages
    seq_len: jnp.ndarray,      # scalar int32 — tokens so far
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step over a paged pool. Returns (logits, pool_k,
    pool_v); the caller advances its host-side length."""
    page_size = _pool_vals(pool_k).shape[2]
    pos = seq_len
    page_idx = table[pos // page_size]
    slot = pos % page_size
    freqs = llm_model._freqs(params, cfg, pos + 1)
    x = params["tok_emb"][token][None]
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim

    def layer_fn(carry, inputs):
        x = carry
        layer, pk_l, pv_l, li = inputs  # (P, page, Hk, D)
        h = llm_model._attn_in(x, layer, cfg)
        qkv = llm_model._linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(1, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        q, k = llm_model._qk_norm(q, k, layer, cfg)
        freqs_li = llm_model._layer_freqs(cfg, li, freqs)
        q = llm_model.apply_rope(q, pos[None], freqs_li)
        k = llm_model.apply_rope(k, pos[None], freqs_li)
        q, k = llm_model._post_rope_qk(q, k, pos[None], li, cfg)

        if isinstance(pk_l, QuantPool):
            kq, ks = _quant_cells(k[None])   # (1,1,Hk,D)/(1,1,Hk)
            vq, vs = _quant_cells(v[None])
            pk_l = QuantPool(
                jax.lax.dynamic_update_slice(pk_l.vals, kq,
                                             (page_idx, slot, 0, 0)),
                jax.lax.dynamic_update_slice(pk_l.scale, ks,
                                             (page_idx, slot, 0)))
            pv_l = QuantPool(
                jax.lax.dynamic_update_slice(pv_l.vals, vq,
                                             (page_idx, slot, 0, 0)),
                jax.lax.dynamic_update_slice(pv_l.scale, vs,
                                             (page_idx, slot, 0)))
            k_seq = _dequant_cells(pk_l.vals[table], pk_l.scale[table],
                                   x.dtype).reshape(-1, cfg.n_kv_heads,
                                                    cfg.head_dim)
            v_seq = _dequant_cells(pv_l.vals[table], pv_l.scale[table],
                                   x.dtype).reshape(-1, cfg.n_kv_heads,
                                                    cfg.head_dim)
        else:
            pk_l = jax.lax.dynamic_update_slice(
                pk_l, k[None].astype(pk_l.dtype), (page_idx, slot, 0, 0))
            pv_l = jax.lax.dynamic_update_slice(
                pv_l, v[None].astype(pv_l.dtype), (page_idx, slot, 0, 0))

            # Gather this sequence's pages -> contiguous view.
            k_seq = pk_l[table].reshape(-1, cfg.n_kv_heads, cfg.head_dim)
            v_seq = pv_l[table].reshape(-1, cfg.n_kv_heads, cfg.head_dim)
        attn = llm_model._decode_attn(cfg, li, q[0], k_seq, v_seq, pos + 1,
                                      layer=layer)
        x = llm_model._layer_tail(x, h, attn.reshape(1, -1), layer,
                                  cfg, li=li)
        return x, (pk_l, pv_l)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], pool_k, pool_v,
                      jnp.arange(cfg.n_layers)))
    logits = llm_model._output_logits(params, cfg, x)[0]
    return logits, new_k, new_v


@functools.partial(jax.jit, static_argnames=("cfg",))
def copy_prefill_into_pages(
    cfg: llm_model.LLMConfig,
    pool_k: jnp.ndarray, pool_v: jnp.ndarray,
    table: jnp.ndarray, seq_cache: llm_model.KVCache,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter a prefilled contiguous cache into this sequence's pages.
    Copies whole pages (padded tail slots are length-masked later)."""
    page_size = _pool_vals(pool_k).shape[2]
    max_pages = table.shape[0]
    s_pad = max_pages * page_size
    # Pad/trim the contiguous cache to the table's capacity.
    k_src = seq_cache.k[:, :s_pad].reshape(
        cfg.n_layers, max_pages, page_size, cfg.n_kv_heads, cfg.head_dim)
    v_src = seq_cache.v[:, :s_pad].reshape(
        cfg.n_layers, max_pages, page_size, cfg.n_kv_heads, cfg.head_dim)
    if isinstance(pool_k, QuantPool):
        kq, ks = _quant_cells(k_src)
        vq, vs = _quant_cells(v_src)
        pool_k = QuantPool(pool_k.vals.at[:, table].set(kq),
                           pool_k.scale.at[:, table].set(ks))
        pool_v = QuantPool(pool_v.vals.at[:, table].set(vq),
                           pool_v.scale.at[:, table].set(vs))
    else:
        pool_k = pool_k.at[:, table].set(k_src.astype(pool_k.dtype))
        pool_v = pool_v.at[:, table].set(v_src.astype(pool_v.dtype))
    return pool_k, pool_v


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def gather_pages_to_cache(
    cfg: llm_model.LLMConfig,
    pool_k: jnp.ndarray, pool_v: jnp.ndarray,
    table: jnp.ndarray,        # (W,) int32 — pages to stage, pad = trash 0
    length: jnp.ndarray,       # scalar int32 — valid tokens in the prefix
    dtype=None,                # static: scratch dtype (quantized pools)
) -> llm_model.KVCache:
    """Stage a page chain into a contiguous :class:`KVCache` (capacity
    ``W * page_size``) so :func:`models.llm.extend` can chunk-prefill a
    suffix after a SHARED cached prefix (prefix caching). One bandwidth
    copy replaces the prefix's prefill FLOPs entirely. Quantized pools
    dequantize into a ``dtype`` scratch."""
    page = _pool_vals(pool_k).shape[2]
    w = table.shape[0]
    if isinstance(pool_k, QuantPool):
        k = _dequant_cells(pool_k.vals[:, table], pool_k.scale[:, table],
                           dtype)
        v = _dequant_cells(pool_v.vals[:, table], pool_v.scale[:, table],
                           dtype)
    else:
        k, v = pool_k[:, table], pool_v[:, table]
    k = k.reshape(cfg.n_layers, w * page, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(cfg.n_layers, w * page, cfg.n_kv_heads, cfg.head_dim)
    return llm_model.KVCache(k=k, v=v, length=length)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_pages"))
def decode_step_batch_paged(
    params: Dict[str, Any],
    cfg: llm_model.LLMConfig,
    tokens: jnp.ndarray,       # (B,) int32
    active: jnp.ndarray,       # (B,) bool
    pool_k: jnp.ndarray,       # (L, P, page, Hk, D)
    pool_v: jnp.ndarray,
    tables: jnp.ndarray,       # (B, max_pages) int32
    lengths: jnp.ndarray,      # (B,) int32
    attn_pages: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched decode over ONE shared page pool with per-slot tables —
    continuous batching with paged memory (vLLM-style). Inactive slots
    write nothing. Returns (logits (B, V), pool_k, pool_v).

    ``attn_pages`` (static) bounds the per-slot page gather (the paged
    twin of decode_step_batch's attn_len): without it every step
    gathers max_seq/page_size pages per slot even for short
    conversations. Must cover max(lengths)+1 tokens."""
    b = tokens.shape[0]
    page_size = _pool_vals(pool_k).shape[2]
    pos = lengths
    page_idx = jnp.take_along_axis(
        tables, (pos // page_size)[:, None], axis=1)[:, 0]  # (B,)
    slot = pos % page_size
    # Inactive slots write into the reserved trash page 0 (the allocator
    # never hands it out), so their no-op writes cannot collide with a
    # live sequence's cell in the scatter.
    page_idx = jnp.where(active, page_idx, 0)
    slot = jnp.where(active, slot, 0)
    freqs = llm_model._freqs(params, cfg, jnp.max(pos) + 1)
    x = params["tok_emb"][tokens]
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim

    def layer_fn(carry, inputs):
        x = carry
        layer, pk_l, pv_l, li = inputs
        h = llm_model._attn_in(x, layer, cfg)
        qkv = llm_model._linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(b, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        q, k = llm_model._qk_norm(q, k, layer, cfg)
        freqs_li = llm_model._layer_freqs(cfg, li, freqs)
        def rope_row(qq, kk, p):
            qr = llm_model.apply_rope(qq[None], p[None], freqs_li)
            kr = llm_model.apply_rope(kk[None], p[None], freqs_li)
            qr, kr = llm_model._post_rope_qk(qr, kr, p[None], li, cfg)
            return qr[0], kr[0]

        q, k = jax.vmap(rope_row)(q, k, pos)

        # Scatter each active slot's KV into its (page, slot) cell.
        if isinstance(pk_l, QuantPool):
            kq, ks = _quant_cells(k)   # (B,Hk,D)/(B,Hk)
            vq, vs = _quant_cells(v)
            pk_l = QuantPool(pk_l.vals.at[page_idx, slot].set(kq),
                             pk_l.scale.at[page_idx, slot].set(ks))
            pv_l = QuantPool(pv_l.vals.at[page_idx, slot].set(vq),
                             pv_l.scale.at[page_idx, slot].set(vs))
        else:
            pk_l = pk_l.at[page_idx, slot].set(k.astype(pk_l.dtype))
            pv_l = pv_l.at[page_idx, slot].set(v.astype(pv_l.dtype))

        def one_slot(qq, table, p):
            tv = table[:attn_pages] if attn_pages else table
            if isinstance(pk_l, QuantPool):
                k_seq = _dequant_cells(pk_l.vals[tv], pk_l.scale[tv],
                                       x.dtype)
                v_seq = _dequant_cells(pv_l.vals[tv], pv_l.scale[tv],
                                       x.dtype)
            else:
                k_seq, v_seq = pk_l[tv], pv_l[tv]
            k_seq = k_seq.reshape(-1, cfg.n_kv_heads, cfg.head_dim)
            v_seq = v_seq.reshape(-1, cfg.n_kv_heads, cfg.head_dim)
            return llm_model._decode_attn(cfg, li, qq, k_seq, v_seq, p + 1,
                                          layer=layer)

        attn = jax.vmap(one_slot)(q, tables, pos)
        x = llm_model._layer_tail(x, h, attn.reshape(b, -1), layer,
                                  cfg, li=li)
        return x, (pk_l, pv_l)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], pool_k, pool_v,
                      jnp.arange(cfg.n_layers)))
    logits = llm_model._output_logits(params, cfg, x)
    return logits, new_k, new_v


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps",
                                              "attn_pages"))
def decode_steps_batch_paged(
    params: Dict[str, Any],
    cfg: llm_model.LLMConfig,
    tokens: jnp.ndarray,       # (B,) int32
    active: jnp.ndarray,       # (B,) bool
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    tables: jnp.ndarray,       # (B, max_pages) int32
    lengths: jnp.ndarray,      # (B,) int32
    n_steps: int,
    attn_pages: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``n_steps`` greedy paged batch-decode steps as ONE program —
    the paged twin of models/llm.py decode_steps_batch.

    Gather-once / scatter-back: each slot's pages are gathered into a
    contiguous (L, B, S, Hk, D) scratch ONCE, the whole chunk runs as
    dense batched decode over the scratch, and only the ``n_steps``
    freshly written KV cells are scattered back into their pages. The
    scratch is transient chunk memory; the pool remains the system of
    record. Measured perf-NEUTRAL vs the scan-of-paged-steps version
    (175.7 vs 177.5 tok/s at B=8 — XLA already pipelined the per-step
    gathers); kept because it reuses decode_steps_batch instead of
    duplicating the chunk loop. The caller must have pre-grown every
    active slot's table to cover ``lengths + n_steps``.
    ``attn_pages`` (static) bounds the gather: only the first
    ``attn_pages`` pages of each table are staged, so the transient
    scratch scales with live context (attn_pages*page per slot), not
    max_seq — without it a memory-constrained config could OOM on a
    scratch the size of B full dense caches (ADVICE round 2). Must
    cover ``max(lengths) + n_steps`` tokens.
    Returns (produced (n_steps, B), pool_k, pool_v)."""
    b, max_pages = tables.shape
    page = _pool_vals(pool_k).shape[2]
    if attn_pages and attn_pages < max_pages:
        tables = tables[:, :attn_pages]
        max_pages = attn_pages

    # Gather: (L, P, page, Hk, D)[:, (B, max_pages)] -> contiguous.
    quantized = isinstance(pool_k, QuantPool)
    if quantized:
        dt = params["tok_emb"].dtype
        sk = _dequant_cells(pool_k.vals[:, tables],
                            pool_k.scale[:, tables], dt)
        sv = _dequant_cells(pool_v.vals[:, tables],
                            pool_v.scale[:, tables], dt)
    else:
        sk, sv = pool_k[:, tables], pool_v[:, tables]
    sk = sk.reshape(
        cfg.n_layers, b, max_pages * page, cfg.n_kv_heads, cfg.head_dim)
    sv = sv.reshape(
        cfg.n_layers, b, max_pages * page, cfg.n_kv_heads, cfg.head_dim)
    scratch = llm_model.BatchedKVCache(sk, sv, lengths)

    produced, scratch = llm_model.decode_steps_batch(
        params, cfg, tokens, active, scratch, n_steps)

    # Scatter back only the cells this chunk wrote: slot b's step j
    # landed at contiguous position lengths[b] + j. (Quantized pools
    # re-quantize ONLY these freshly written rows — settled cells never
    # round-trip, so there is no accumulation drift.)
    steps = jnp.arange(n_steps)
    pos = lengths[:, None] + steps[None, :]                 # (B, k)
    idx = pos[None, :, :, None, None]                       # broadcast
    new_k = jnp.take_along_axis(scratch.k, idx, axis=2)     # (L,B,k,Hk,D)
    new_v = jnp.take_along_axis(scratch.v, idx, axis=2)
    page_idx = jnp.take_along_axis(tables, pos // page, axis=1)
    slot_in = pos % page
    # Inactive slots never advanced; route their (unchanged-garbage)
    # cells to the reserved trash page 0.
    page_idx = jnp.where(active[:, None], page_idx, 0)
    slot_in = jnp.where(active[:, None], slot_in, 0)
    if quantized:
        kq, ks = _quant_cells(new_k)
        vq, vs = _quant_cells(new_v)
        pool_k = QuantPool(pool_k.vals.at[:, page_idx, slot_in].set(kq),
                           pool_k.scale.at[:, page_idx, slot_in].set(ks))
        pool_v = QuantPool(pool_v.vals.at[:, page_idx, slot_in].set(vq),
                           pool_v.scale.at[:, page_idx, slot_in].set(vs))
    else:
        pool_k = pool_k.at[:, page_idx, slot_in].set(new_k)
        pool_v = pool_v.at[:, page_idx, slot_in].set(new_v)
    return produced, pool_k, pool_v


class PagedKVPool:
    """Host-side page allocator over device pools.

    Memory: n_pages x page_size tokens TOTAL across all live sequences
    (vs max_seq per sequence contiguous) — the elasticity that lets one
    chip hold many idle conversations.
    """

    def __init__(self, cfg: llm_model.LLMConfig, n_pages: int = 64,
                 page_size: int = 128, dtype=jnp.bfloat16,
                 compute_dtype=None):
        """``dtype=jnp.int8`` stores the pool quantized (:class:`
        QuantPool` — symmetric per-(cell, head) int8, the llama.cpp
        `-ctk q8_0` parity feature): half the pool bytes, half the
        gather bandwidth. ``compute_dtype`` is the dequantized scratch/
        attention dtype (default bfloat16 for quantized pools, else
        ``dtype`` itself)."""
        self.cfg = cfg
        self.page_size = page_size
        self.n_pages = n_pages
        self.quantized = jnp.dtype(dtype) == jnp.int8
        self.compute_dtype = compute_dtype or (
            jnp.bfloat16 if self.quantized else dtype)
        shape = (cfg.n_layers, n_pages, page_size, cfg.n_kv_heads,
                 cfg.head_dim)
        if self.quantized:
            self.pool_k = QuantPool(jnp.zeros(shape, jnp.int8),
                                    jnp.zeros(shape[:-1], jnp.float32))
            self.pool_v = QuantPool(jnp.zeros(shape, jnp.int8),
                                    jnp.zeros(shape[:-1], jnp.float32))
        else:
            self.pool_k = jnp.zeros(shape, dtype)
            self.pool_v = jnp.zeros(shape, dtype)
        # Page 0 is reserved as the trash page for inactive batch slots.
        self._free: List[int] = list(range(1, n_pages))
        self._tables: Dict[int, List[int]] = {}
        self._lengths: Dict[int, int] = {}
        self._next_seq = 1
        # Prefix cache (vLLM-style): FULL prompt pages are registered
        # under an exact token hash-chain key; later sequences whose
        # prompt starts with the same token pages SHARE those physical
        # pages (refcounted) and only prefill the suffix. A registered
        # page whose refcount drops to 0 stays resident as LRU-evictable
        # cache — reclaimed only when the free list empties.
        self._hash_to_page: Dict[Any, int] = {}
        self._page_to_key: Dict[int, Any] = {}
        self._page_refs: Dict[int, int] = {}      # registered pages only
        self._evictable: "OrderedDict[int, None]" = OrderedDict()
        self.prefix_stats = {"hits": 0, "tokens_reused": 0, "evictions": 0}

    # -- allocation ---------------------------------------------------------

    @property
    def free_pages(self) -> int:
        """Allocatable pages: truly free + cache-resident evictables."""
        return len(self._free) + len(self._evictable)

    def ensure_capacity(self, seq_id: int) -> None:
        """Grow the sequence's table if the next token crosses a page
        boundary."""
        length = self._lengths[seq_id]
        if length % self.page_size == 0 and length // self.page_size >= len(
                self._tables[seq_id]):
            self._tables[seq_id].append(self._alloc_page())

    def pages_needed_for(self, seq_ids, n: int) -> int:
        """Pages the given sequences would need to decode ``n`` more
        tokens each (chunk admission check; None entries skipped)."""
        need = 0
        for s in seq_ids:
            if s is None:
                continue
            covered = len(self._tables[s]) * self.page_size
            short = self._lengths[s] + n - covered
            if short > 0:
                need += (short + self.page_size - 1) // self.page_size
        return need

    def ensure_capacity_for(self, seq_id: int, n: int) -> None:
        """Pre-grow the table so ``n`` more tokens fit — required before
        a multi-step device chunk (tables are static inside it)."""
        target = self._lengths[seq_id] + n
        while len(self._tables[seq_id]) * self.page_size < target:
            self._tables[seq_id].append(self._alloc_page())

    def batch_decode_step(self, params, tokens, seq_ids) -> jnp.ndarray:
        """One batched step over the shared pool. ``seq_ids`` may contain
        None for inactive slots. Returns (B, V) logits."""
        b = len(seq_ids)
        active = [s is not None for s in seq_ids]
        for s, a in zip(seq_ids, active):
            if a:
                self.ensure_capacity(s)
        max_pages = self.cfg.max_seq // self.page_size
        tables = jnp.stack([
            self._table_array(s) if a else jnp.zeros((max_pages,), jnp.int32)
            for s, a in zip(seq_ids, active)])
        lengths = jnp.asarray([self._lengths[s] if a else 0
                               for s, a in zip(seq_ids, active)], jnp.int32)
        toks = jnp.asarray([t if t is not None else 0 for t in tokens],
                           jnp.int32)
        logits, self.pool_k, self.pool_v = decode_step_batch_paged(
            params, self.cfg, toks, jnp.asarray(active), self.pool_k,
            self.pool_v, tables, lengths)
        for s, a in zip(seq_ids, active):
            if a:
                self._lengths[s] += 1
        return logits

    def batch_decode_steps(self, params, tokens, seq_ids,
                           n_steps: int) -> jnp.ndarray:
        """``n_steps`` greedy steps over the shared pool in ONE device
        program + one host fetch (the server's paged steady-state fast
        path). Raises DEVICE_OOM before touching the device if the pool
        cannot pre-grow every active slot (callers fall back to the
        single-step path, which has preemption handling). Returns
        produced tokens (n_steps, B) on device. ``tokens`` may be a
        host list (ints / None for inactive slots) or a device (B,)
        int32 row — the pipelined server feeds the previous chunk's
        last produced row without a host sync."""
        active = [s is not None for s in seq_ids]
        if self.pages_needed_for(seq_ids, n_steps) > self.free_pages:
            raise TrackieError(ErrorCode.DEVICE_OOM,
                               "KV page pool exhausted")
        for s, a in zip(seq_ids, active):
            if a:
                self.ensure_capacity_for(s, n_steps)
        max_pages = self.cfg.max_seq // self.page_size
        tables = jnp.stack([
            self._table_array(s) if a else jnp.zeros((max_pages,), jnp.int32)
            for s, a in zip(seq_ids, active)])
        lengths = jnp.asarray([self._lengths[s] if a else 0
                               for s, a in zip(seq_ids, active)], jnp.int32)
        if isinstance(tokens, jnp.ndarray):
            toks = tokens
        else:
            toks = jnp.asarray([t if t is not None else 0 for t in tokens],
                               jnp.int32)
        # Static page bound for the chunk's gather scratch: cover the
        # longest active slot + the chunk, bucketed to powers of two so
        # growth costs O(log) recompiles, capped at the full table.
        max_len = max((self._lengths[s] for s, a in zip(seq_ids, active)
                       if a), default=0)
        need = -(-(max_len + n_steps) // self.page_size)
        attn_pages = 1
        while attn_pages < need:
            attn_pages *= 2
        attn_pages = min(attn_pages, max_pages)
        produced, self.pool_k, self.pool_v = decode_steps_batch_paged(
            params, self.cfg, toks, jnp.asarray(active), self.pool_k,
            self.pool_v, tables, lengths, n_steps, attn_pages=attn_pages)
        for s, a in zip(seq_ids, active):
            if a:
                self._lengths[s] += n_steps
        return produced

    def _alloc_page(self) -> int:
        if self._free:
            return self._free.pop()
        if self._evictable:
            # Reclaim the least-recently-cached page: its prefix-cache
            # entry dies with it (no sequence references it — only
            # ref==0 pages enter the evictable list).
            page, _ = self._evictable.popitem(last=False)
            key = self._page_to_key.pop(page, None)
            if key is not None:
                self._hash_to_page.pop(key, None)
            self._page_refs.pop(page, None)
            self.prefix_stats["evictions"] += 1
            return page
        raise TrackieError(ErrorCode.DEVICE_OOM,
                           "KV page pool exhausted")

    # -- prefix cache ---------------------------------------------------------

    @staticmethod
    def _chain_key(prev: Any, chunk: Sequence[int]) -> Any:
        # Exact nested-tuple keys (not hashes): a hash collision would
        # silently share WRONG pages; tuples cost O(cached tokens) host
        # memory and guarantee correctness.
        return (prev, tuple(int(t) for t in chunk))

    def acquire_prefix(self, ids: Sequence[int]) -> Tuple[List[int], int]:
        """Longest cached full-page prefix of ``ids``; the matched pages'
        refcounts are taken IMMEDIATELY (removed from the evictable
        list) so no allocation between match and sequence creation can
        reclaim them. Returns ``(pages, matched_tokens)``; the caller
        owns the refs — pass the pages to :meth:`create_sequence` as
        ``shared_pages`` or give them back via :meth:`release_prefix`.

        At least one token is always left to prefill (the admission
        needs last-token logits), so a fully cached prompt matches all
        but its final page."""
        limit = (len(ids) - 1) // self.page_size
        pages: List[int] = []
        key: Any = None
        for i in range(limit):
            key = self._chain_key(
                key, ids[i * self.page_size:(i + 1) * self.page_size])
            page = self._hash_to_page.get(key)
            if page is None:
                break
            self._page_refs[page] = self._page_refs.get(page, 0) + 1
            self._evictable.pop(page, None)
            pages.append(page)
        if pages:
            self.prefix_stats["hits"] += 1
            self.prefix_stats["tokens_reused"] += len(pages) * self.page_size
        return pages, len(pages) * self.page_size

    def release_prefix(self, pages: Sequence[int]) -> None:
        """Give back refs taken by :meth:`acquire_prefix` without having
        created a sequence (rejected / backlogged admission)."""
        for page in pages:
            self._decref(page)

    def _decref(self, page: int) -> None:
        refs = self._page_refs.get(page)
        if refs is None:
            self._free.append(page)  # plain owned page
            return
        refs -= 1
        self._page_refs[page] = refs
        if refs <= 0:
            # Stays resident as cache; reclaimable under pressure.
            self._evictable[page] = None
            self._evictable.move_to_end(page)

    def _register_prompt_pages(self, table: List[int], n_shared: int,
                               ids: Sequence[int]) -> None:
        """Register this sequence's FULL prompt pages in the prefix
        cache. Shared pages (already registered) only refresh the chain
        key; fresh full pages become cached (ref 1 held by this
        sequence). Duplicate content registered concurrently by another
        sequence keeps the first page (this one stays plain-owned)."""
        key: Any = None
        full = len(ids) // self.page_size
        for i in range(full):
            key = self._chain_key(
                key, ids[i * self.page_size:(i + 1) * self.page_size])
            if i < n_shared:
                continue  # matched page — already registered
            page = table[i]
            if key in self._hash_to_page or page in self._page_to_key:
                continue
            self._hash_to_page[key] = page
            self._page_to_key[page] = key
            self._page_refs[page] = self._page_refs.get(page, 0) + 1

    def create_sequence(self, prefill_cache: Optional[llm_model.KVCache]
                        = None, length: int = 0,
                        shared_pages: Optional[List[int]] = None,
                        register_ids: Optional[Sequence[int]] = None) -> int:
        """New sequence; optionally seeded from a contiguous prefill.

        ``shared_pages``: refs from :meth:`acquire_prefix` covering the
        first ``len(shared_pages) * page_size`` tokens — the sequence
        reads them but never writes them (decode writes land at
        positions >= length, i.e. in its own fresh pages). Only the
        suffix region of ``prefill_cache`` is scattered; the shared
        region of the scatter routes to the trash page.

        ``register_ids``: the prompt token ids; full prompt pages are
        registered in the prefix cache for future sequences."""
        shared = list(shared_pages or [])
        n_shared = len(shared)
        seq_id = self._next_seq
        self._next_seq += 1
        n_pages = max((length + self.page_size - 1) // self.page_size, 1)
        n_fresh = n_pages - n_shared
        if self.free_pages < n_fresh:
            raise TrackieError(ErrorCode.DEVICE_OOM,
                               "KV page pool exhausted")
        fresh = [self._alloc_page() for _ in range(n_fresh)]
        pages = shared + fresh
        self._tables[seq_id] = pages
        self._lengths[seq_id] = length
        if prefill_cache is not None and length > 0:
            # Scatter only the fresh suffix pages: shared positions
            # route to trash page 0 (their cache region is a replay of
            # what the pool already holds). Table width = this
            # sequence's pages, so the copy scales with the sequence,
            # not the cache capacity.
            write = [0] * n_shared + fresh
            self.pool_k, self.pool_v = copy_prefill_into_pages(
                self.cfg, self.pool_k, self.pool_v,
                jnp.asarray(write, jnp.int32), prefill_cache)
        if register_ids is not None:
            self._register_prompt_pages(pages, n_shared, register_ids)
        return seq_id

    def gathered_prefix_cache(self, pages: Sequence[int], matched_len: int,
                              total_len: int) -> llm_model.KVCache:
        """Stage a shared prefix into a contiguous cache sized (in
        power-of-two page buckets) to also hold ``total_len`` tokens —
        the input to a suffix :func:`models.llm.extend`."""
        max_pages = self.cfg.max_seq // self.page_size
        need = max(-(-total_len // self.page_size), 1)
        w = 1
        while w < need:
            w *= 2
        w = min(w, max_pages)
        table = list(pages) + [0] * (w - len(pages))
        return gather_pages_to_cache(
            self.cfg, self.pool_k, self.pool_v,
            jnp.asarray(table[:w], jnp.int32), jnp.int32(matched_len),
            dtype=self.compute_dtype)

    def free_sequence(self, seq_id: int) -> None:
        pages = self._tables.pop(seq_id, [])
        for page in pages:
            self._decref(page)
        self._lengths.pop(seq_id, None)

    def length(self, seq_id: int) -> int:
        return self._lengths[seq_id]

    def _table_array(self, seq_id: int) -> jnp.ndarray:
        """Fixed-width table (static shape): live pages then a repeat of
        the last page (never read thanks to length masking)."""
        pages = self._tables[seq_id]
        max_pages = self.cfg.max_seq // self.page_size
        padded = pages + [pages[-1]] * (max_pages - len(pages))
        return jnp.asarray(padded, jnp.int32)

    # -- decode ----------------------------------------------------------------

    def decode_step(self, params, token: int, seq_id: int) -> jnp.ndarray:
        """One token for one sequence; grows the table on page boundary."""
        self.ensure_capacity(seq_id)
        length = self._lengths[seq_id]
        logits, self.pool_k, self.pool_v = decode_step_paged(
            params, self.cfg, jnp.int32(token), self.pool_k, self.pool_v,
            self._table_array(seq_id), jnp.int32(length))
        self._lengths[seq_id] = length + 1
        return logits
