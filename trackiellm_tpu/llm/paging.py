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
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError


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
    page_size = pool_k.shape[2]
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
        h = llm_model._rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        qkv = llm_model._linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(1, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        q, k = llm_model._qk_norm(q, k, layer, cfg)
        q = llm_model.apply_rope(q, pos[None], freqs)
        k = llm_model.apply_rope(k, pos[None], freqs)

        pk_l = jax.lax.dynamic_update_slice(
            pk_l, k[None].astype(pk_l.dtype), (page_idx, slot, 0, 0))
        pv_l = jax.lax.dynamic_update_slice(
            pv_l, v[None].astype(pv_l.dtype), (page_idx, slot, 0, 0))

        # Gather this sequence's pages -> contiguous view.
        k_seq = pk_l[table].reshape(-1, cfg.n_kv_heads, cfg.head_dim)
        v_seq = pv_l[table].reshape(-1, cfg.n_kv_heads, cfg.head_dim)
        attn = llm_model._decode_attn(cfg, li, q[0], k_seq, v_seq, pos + 1,
                                      layer=layer)
        x = llm_model._attn_residual(x, attn.reshape(1, -1), layer, cfg)
        x = llm_model._mlp(x, layer, cfg)
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
    page_size = pool_k.shape[2]
    max_pages = table.shape[0]
    s_pad = max_pages * page_size
    # Pad/trim the contiguous cache to the table's capacity.
    k_src = seq_cache.k[:, :s_pad].reshape(
        cfg.n_layers, max_pages, page_size, cfg.n_kv_heads, cfg.head_dim)
    v_src = seq_cache.v[:, :s_pad].reshape(
        cfg.n_layers, max_pages, page_size, cfg.n_kv_heads, cfg.head_dim)
    pool_k = pool_k.at[:, table].set(k_src.astype(pool_k.dtype))
    pool_v = pool_v.at[:, table].set(v_src.astype(pool_v.dtype))
    return pool_k, pool_v


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
    page_size = pool_k.shape[2]
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
        h = llm_model._rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        qkv = llm_model._linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(b, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        q, k = llm_model._qk_norm(q, k, layer, cfg)
        q = jax.vmap(lambda qq, p: llm_model.apply_rope(
            qq[None], p[None], freqs)[0])(q, pos)
        k = jax.vmap(lambda kk, p: llm_model.apply_rope(
            kk[None], p[None], freqs)[0])(k, pos)

        # Scatter each active slot's KV into its (page, slot) cell.
        pk_l = pk_l.at[page_idx, slot].set(k.astype(pk_l.dtype))
        pv_l = pv_l.at[page_idx, slot].set(v.astype(pv_l.dtype))

        def one_slot(qq, table, p):
            tv = table[:attn_pages] if attn_pages else table
            k_seq = pk_l[tv].reshape(-1, cfg.n_kv_heads, cfg.head_dim)
            v_seq = pv_l[tv].reshape(-1, cfg.n_kv_heads, cfg.head_dim)
            return llm_model._decode_attn(cfg, li, qq, k_seq, v_seq, p + 1,
                                          layer=layer)

        attn = jax.vmap(one_slot)(q, tables, pos)
        x = llm_model._attn_residual(x, attn.reshape(b, -1), layer, cfg)
        x = llm_model._mlp(x, layer, cfg)
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
    page = pool_k.shape[2]
    if attn_pages and attn_pages < max_pages:
        tables = tables[:, :attn_pages]
        max_pages = attn_pages

    # Gather: (L, P, page, Hk, D)[:, (B, max_pages)] -> contiguous.
    sk = pool_k[:, tables].reshape(
        cfg.n_layers, b, max_pages * page, cfg.n_kv_heads, cfg.head_dim)
    sv = pool_v[:, tables].reshape(
        cfg.n_layers, b, max_pages * page, cfg.n_kv_heads, cfg.head_dim)
    scratch = llm_model.BatchedKVCache(sk, sv, lengths)

    produced, scratch = llm_model.decode_steps_batch(
        params, cfg, tokens, active, scratch, n_steps)

    # Scatter back only the cells this chunk wrote: slot b's step j
    # landed at contiguous position lengths[b] + j.
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
                 page_size: int = 128, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.page_size = page_size
        self.n_pages = n_pages
        shape = (cfg.n_layers, n_pages, page_size, cfg.n_kv_heads,
                 cfg.head_dim)
        self.pool_k = jnp.zeros(shape, dtype)
        self.pool_v = jnp.zeros(shape, dtype)
        # Page 0 is reserved as the trash page for inactive batch slots.
        self._free: List[int] = list(range(1, n_pages))
        self._tables: Dict[int, List[int]] = {}
        self._lengths: Dict[int, int] = {}
        self._next_seq = 1

    # -- allocation ---------------------------------------------------------

    @property
    def free_pages(self) -> int:
        return len(self._free)

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
        if not self._free:
            raise TrackieError(ErrorCode.DEVICE_OOM,
                               "KV page pool exhausted")
        return self._free.pop()

    def create_sequence(self, prefill_cache: Optional[llm_model.KVCache]
                        = None, length: int = 0) -> int:
        """New sequence; optionally seeded from a contiguous prefill."""
        seq_id = self._next_seq
        self._next_seq += 1
        n_pages = max((length + self.page_size - 1) // self.page_size, 1)
        if len(self._free) < n_pages:
            raise TrackieError(ErrorCode.DEVICE_OOM,
                               "KV page pool exhausted")
        pages = [self._alloc_page() for _ in range(n_pages)]
        self._tables[seq_id] = pages
        self._lengths[seq_id] = length
        if prefill_cache is not None and length > 0:
            self.pool_k, self.pool_v = copy_prefill_into_pages(
                self.cfg, self.pool_k, self.pool_v,
                jnp.asarray(pages, jnp.int32), prefill_cache)
        return seq_id

    def free_sequence(self, seq_id: int) -> None:
        pages = self._tables.pop(seq_id, [])
        self._free.extend(pages)
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
