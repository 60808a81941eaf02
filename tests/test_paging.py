"""Paged KV cache tests: pool allocation/freeing, paged decode exactness
vs contiguous, multi-sequence interleaving."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.llm.paging import PagedKVPool
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.utils.errors import TrackieError

CFG = llm_model.LLMConfig.tiny()._replace(max_seq=128, sliding_window=128)


@pytest.fixture(scope="module")
def params():
    return llm_model.init_params(jax.random.PRNGKey(0), CFG,
                                 dtype=jnp.float32)


class TestPoolManagement:
    def test_alloc_and_free(self):
        # Page 0 is reserved as the trash page: 9 pages -> 8 usable.
        pool = PagedKVPool(CFG, n_pages=9, page_size=16, dtype=jnp.float32)
        s1 = pool.create_sequence(length=0)
        assert pool.free_pages == 7
        s2 = pool.create_sequence(length=20)  # needs 2 pages
        assert pool.free_pages == 5
        pool.free_sequence(s1)
        pool.free_sequence(s2)
        assert pool.free_pages == 8

    def test_exhaustion(self):
        pool = PagedKVPool(CFG, n_pages=3, page_size=16, dtype=jnp.float32)
        pool.create_sequence(length=30)  # 2 pages
        with pytest.raises(TrackieError):
            pool.create_sequence(length=1)

    def test_memory_elasticity(self):
        """Many short conversations fit where contiguous caches would
        not: 8 sequences of <=16 tokens in a 128-token (+trash) pool."""
        pool = PagedKVPool(CFG, n_pages=9, page_size=16, dtype=jnp.float32)
        seqs = [pool.create_sequence(length=0) for _ in range(8)]
        assert pool.free_pages == 0
        for s in seqs[:4]:
            pool.free_sequence(s)
        assert pool.free_pages == 4


class TestPrefixCache:
    """vLLM-style prefix caching: full prompt pages register under an
    exact token hash-chain; later prompts sharing those pages reuse the
    physical pages (refcounted, LRU-evicted under pressure)."""

    def test_register_acquire_share_and_release(self):
        pool = PagedKVPool(CFG, n_pages=9, page_size=16, dtype=jnp.float32)
        ids = list(range(40))  # 2 full pages + a partial third
        s1 = pool.create_sequence(length=40, register_ids=ids)
        pages1 = list(pool._tables[s1])
        shared, matched = pool.acquire_prefix(ids)
        assert matched == 32 and shared == pages1[:2]
        assert pool.prefix_stats["hits"] == 1
        s2 = pool.create_sequence(length=40, shared_pages=shared,
                                  register_ids=ids)
        assert pool._tables[s2][:2] == pages1[:2]  # physical sharing
        assert pool._tables[s2][2] != pages1[2]
        # 9 pages - trash - (s1: 3) - (s2: 1 fresh) = 4 allocatable.
        assert pool.free_pages == 4
        pool.free_sequence(s1)
        pool.free_sequence(s2)
        # Everything allocatable again (registered pages as evictables).
        assert pool.free_pages == 8

    def test_divergent_suffix_matches_common_pages_only(self):
        pool = PagedKVPool(CFG, n_pages=9, page_size=16, dtype=jnp.float32)
        ids = list(range(40))
        s1 = pool.create_sequence(length=40, register_ids=ids)
        other = ids[:32] + [500, 501, 502]  # shares 2 full pages
        shared, matched = pool.acquire_prefix(other)
        assert matched == 32
        pool.release_prefix(shared)
        # Divergence inside the first page: nothing matches.
        shared, matched = pool.acquire_prefix([99] + ids[1:])
        assert shared == [] and matched == 0
        pool.free_sequence(s1)

    def test_exact_page_boundary_leaves_last_token(self):
        """A fully cached prompt still matches all but its final page:
        admission needs last-token logits from a real forward."""
        pool = PagedKVPool(CFG, n_pages=9, page_size=16, dtype=jnp.float32)
        ids = list(range(32))  # exactly 2 pages
        s1 = pool.create_sequence(length=32, register_ids=ids)
        shared, matched = pool.acquire_prefix(ids)
        assert matched == 16 and len(shared) == 1
        pool.release_prefix(shared)
        pool.free_sequence(s1)

    def test_lru_eviction_under_pressure(self):
        pool = PagedKVPool(CFG, n_pages=4, page_size=16, dtype=jnp.float32)
        ids = list(range(32))
        s1 = pool.create_sequence(length=32, register_ids=ids)
        pool.free_sequence(s1)
        assert pool.free_pages == 3  # 1 free + 2 cache-resident
        # Cache survives while the pool has room...
        shared, matched = pool.acquire_prefix(ids)
        assert matched == 16
        pool.release_prefix(shared)
        # ...and is reclaimed page-by-page when the free list empties.
        s2 = pool.create_sequence(length=48)  # needs all 3 pages
        assert pool.prefix_stats["evictions"] == 2
        shared, matched = pool.acquire_prefix(ids)
        assert shared == [] and matched == 0
        pool.free_sequence(s2)

    def test_shared_pages_never_rewritten(self, params):
        """Admitting a second sequence over shared pages must not
        disturb the first sequence's cache contents (the scatter routes
        shared positions to the trash page)."""
        toks = jnp.arange(40, dtype=jnp.int32) % CFG.vocab_size
        seed = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        _, seed = llm_model.prefill(params, CFG, toks, jnp.int32(40), seed)
        pool = PagedKVPool(CFG, n_pages=16, page_size=16,
                           dtype=jnp.float32)
        ids = [int(t) for t in toks]
        s1 = pool.create_sequence(prefill_cache=seed, length=40,
                                  register_ids=ids)
        before = np.asarray(pool.pool_k[:, pool._tables[s1]])
        shared, matched = pool.acquire_prefix(ids)
        assert matched == 32
        pool.create_sequence(prefill_cache=seed, length=40,
                             shared_pages=shared, register_ids=ids)
        after = np.asarray(pool.pool_k[:, pool._tables[s1]])
        np.testing.assert_array_equal(before, after)

    def test_gathered_prefix_matches_contiguous(self, params):
        """gather_pages_to_cache staging: decode over a staged shared
        prefix must match the contiguous chain exactly."""
        toks = jnp.arange(32, dtype=jnp.int32) % CFG.vocab_size
        ref_cache = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        ref_logits, ref_cache = llm_model.prefill(
            params, CFG, toks, jnp.int32(32), ref_cache)

        pool = PagedKVPool(CFG, n_pages=16, page_size=16,
                           dtype=jnp.float32)
        ids = [int(t) for t in toks]
        seed = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        _, seed = llm_model.prefill(params, CFG, toks, jnp.int32(32), seed)
        pool.create_sequence(prefill_cache=seed, length=32,
                             register_ids=ids)
        shared, matched = pool.acquire_prefix(ids)
        staged = pool.gathered_prefix_cache(shared, matched, 64)
        assert staged.k.shape[1] == 64 and int(staged.length) == matched
        # Re-extend the unmatched tail over the staged prefix; the
        # last-token logits must match the full contiguous prefill.
        tail = toks[matched:]
        logits, staged = llm_model.extend(
            params, CFG, tail, jnp.int32(32 - matched), staged,
            attn_len=64)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-3, atol=2e-3)


class TestQuantizedPool:
    """int8 paged KV (llama.cpp -ctk q8_0 parity): symmetric per-(cell,
    head) quantization, dequantized attention reads."""

    def test_quant_roundtrip_error_bound(self):
        from trackiellm_tpu.llm.paging import _dequant_cells, _quant_cells
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 64),
                              jnp.float32) * 3.0
        q, s = _quant_cells(x)
        back = _dequant_cells(q, s, jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        # Round-to-nearest symmetric int8: error <= scale/2 per value.
        assert float(jnp.max(jnp.abs(back - x) / amax)) <= 0.5 / 127 + 1e-6

    def test_int8_paged_close_to_dense(self, params):
        """int8 pool decode chain tracks the f32 contiguous chain: same
        greedy tokens, logits within quantization tolerance."""
        toks = jax.random.randint(jax.random.PRNGKey(7), (10,), 0,
                                  CFG.vocab_size, jnp.int32)
        ref_cache = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        ref_logits, ref_cache = llm_model.prefill(
            params, CFG, toks, jnp.int32(10), ref_cache)
        seed = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        _, seed = llm_model.prefill(params, CFG, toks, jnp.int32(10), seed)

        pool = PagedKVPool(CFG, n_pages=16, page_size=16, dtype=jnp.int8,
                           compute_dtype=jnp.float32)
        assert pool.quantized and pool.pool_k.vals.dtype == jnp.int8
        seq = pool.create_sequence(prefill_cache=seed, length=10)

        tok = int(jnp.argmax(ref_logits))
        agree = 0
        for step in range(12):  # crosses a page boundary
            ref_logits, ref_cache = llm_model.decode_step(
                params, CFG, jnp.int32(tok), ref_cache)
            paged_logits = pool.decode_step(params, tok, seq)
            np.testing.assert_allclose(
                np.asarray(paged_logits), np.asarray(ref_logits),
                rtol=0.15, atol=0.15,
                err_msg=f"diverged beyond int8 tolerance at step {step}")
            agree += int(jnp.argmax(paged_logits)) == int(
                jnp.argmax(ref_logits))
            tok = int(jnp.argmax(ref_logits))
        assert agree >= 10  # greedy path essentially tracks f32

    def test_int8_batched_matches_single_paged(self, params):
        """Batched int8 paged decode must match per-sequence int8 paged
        decode (same quantization points, same f32 compute)."""
        pool_a = PagedKVPool(CFG, n_pages=16, page_size=16,
                             dtype=jnp.int8, compute_dtype=jnp.float32)
        pool_b = PagedKVPool(CFG, n_pages=16, page_size=16,
                             dtype=jnp.int8, compute_dtype=jnp.float32)
        toks = (jnp.arange(6, dtype=jnp.int32) + 9) % CFG.vocab_size
        c = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        logits, c = llm_model.prefill(params, CFG, toks, jnp.int32(6), c)
        sa = pool_a.create_sequence(prefill_cache=c, length=6)
        sb = pool_b.create_sequence(prefill_cache=c, length=6)
        tok = int(jnp.argmax(logits))
        for step in range(8):
            ref = pool_a.decode_step(params, tok, sa)
            batched = pool_b.batch_decode_step(
                params, [tok, None], [sb, None])
            np.testing.assert_allclose(
                np.asarray(batched[0]), np.asarray(ref),
                rtol=2e-3, atol=2e-3, err_msg=f"step {step}")
            tok = int(jnp.argmax(ref))

    def test_int8_pool_is_half_the_bytes(self):
        bf = PagedKVPool(CFG, n_pages=8, page_size=16,
                         dtype=jnp.bfloat16)
        q = PagedKVPool(CFG, n_pages=8, page_size=16, dtype=jnp.int8)
        bf_bytes = bf.pool_k.nbytes
        q_bytes = q.pool_k.vals.nbytes + q.pool_k.scale.nbytes
        assert q_bytes < 0.55 * bf_bytes  # ~0.503 at D=64

    def test_int8_prefix_cache_staging(self, params):
        """gathered_prefix_cache over an int8 pool dequantizes the
        shared pages; extending a suffix over it stays within int8
        tolerance of the full f32 prefill."""
        toks = jnp.arange(32, dtype=jnp.int32) % CFG.vocab_size
        ref_cache = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        ref_logits, _ = llm_model.prefill(
            params, CFG, toks, jnp.int32(32), ref_cache)
        pool = PagedKVPool(CFG, n_pages=16, page_size=16, dtype=jnp.int8,
                           compute_dtype=jnp.float32)
        ids = [int(t) for t in toks]
        seed = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        _, seed = llm_model.prefill(params, CFG, toks, jnp.int32(32), seed)
        pool.create_sequence(prefill_cache=seed, length=32,
                             register_ids=ids)
        shared, matched = pool.acquire_prefix(ids)
        staged = pool.gathered_prefix_cache(shared, matched, 64)
        assert staged.k.dtype == jnp.float32
        logits, _ = llm_model.extend(
            params, CFG, toks[matched:], jnp.int32(32 - matched), staged,
            attn_len=64)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   rtol=0.15, atol=0.15)


class TestPagedDecodeExactness:
    def test_matches_contiguous_decode(self, params):
        """Prefill -> paged decode chain must match the contiguous-cache
        decode chain token for token."""
        toks = jax.random.randint(jax.random.PRNGKey(5), (10,), 0,
                                  CFG.vocab_size, jnp.int32)
        # Contiguous reference.
        ref_cache = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        ref_logits, ref_cache = llm_model.prefill(
            params, CFG, toks, jnp.int32(10), ref_cache)

        # Paged: seed from the same prefill.
        seed_cache = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        _, seed_cache = llm_model.prefill(params, CFG, toks, jnp.int32(10),
                                          seed_cache)
        pool = PagedKVPool(CFG, n_pages=16, page_size=16,
                           dtype=jnp.float32)
        seq = pool.create_sequence(prefill_cache=seed_cache, length=10)

        tok = int(jnp.argmax(ref_logits))
        for step in range(12):  # crosses a page boundary at 16
            ref_logits, ref_cache = llm_model.decode_step(
                params, CFG, jnp.int32(tok), ref_cache)
            paged_logits = pool.decode_step(params, tok, seq)
            np.testing.assert_allclose(
                np.asarray(paged_logits), np.asarray(ref_logits),
                rtol=2e-3, atol=2e-3,
                err_msg=f"diverged at step {step}")
            tok = int(jnp.argmax(ref_logits))
        assert pool.length(seq) == 22
        assert len(pool._tables[seq]) == 2  # grew across the boundary

    def test_interleaved_sequences_independent(self, params):
        """Two interleaved conversations in one pool must each match
        their own isolated chain."""
        pool = PagedKVPool(CFG, n_pages=16, page_size=16,
                           dtype=jnp.float32)

        refs = {}
        seqs = {}
        for name, start_tok in (("a", 3), ("b", 40)):
            toks = (jnp.arange(6, dtype=jnp.int32) + start_tok
                    ) % CFG.vocab_size
            c = llm_model.KVCache.create(CFG, dtype=jnp.float32)
            logits, c = llm_model.prefill(params, CFG, toks, jnp.int32(6), c)
            refs[name] = (logits, c)
            seed = llm_model.KVCache.create(CFG, dtype=jnp.float32)
            _, seed = llm_model.prefill(params, CFG, toks, jnp.int32(6),
                                        seed)
            seqs[name] = pool.create_sequence(prefill_cache=seed, length=6)

        toks = {n: int(jnp.argmax(refs[n][0])) for n in refs}
        caches = {n: refs[n][1] for n in refs}
        for step in range(6):
            for n in ("a", "b"):  # interleave
                ref_logits, caches[n] = llm_model.decode_step(
                    params, CFG, jnp.int32(toks[n]), caches[n])
                paged = pool.decode_step(params, toks[n], seqs[n])
                np.testing.assert_allclose(
                    np.asarray(paged), np.asarray(ref_logits),
                    rtol=2e-3, atol=2e-3,
                    err_msg=f"seq {n} diverged at step {step}")
                toks[n] = int(jnp.argmax(ref_logits))


class TestBatchedPagedDecode:
    def test_matches_per_sequence_paged(self, params):
        """Batched paged decode (shared pool, per-slot tables) must match
        per-sequence paged decode exactly, with an inactive slot mixed in."""
        pool_a = PagedKVPool(CFG, n_pages=16, page_size=16,
                             dtype=jnp.float32)
        pool_b = PagedKVPool(CFG, n_pages=16, page_size=16,
                             dtype=jnp.float32)

        seeds = {}
        for name, start in (("a", 1), ("b", 30)):
            toks = (jnp.arange(6, dtype=jnp.int32) + start) % CFG.vocab_size
            c = llm_model.KVCache.create(CFG, dtype=jnp.float32)
            logits, c = llm_model.prefill(params, CFG, toks, jnp.int32(6), c)
            seeds[name] = (int(jnp.argmax(logits)), c)

        sa1 = pool_a.create_sequence(prefill_cache=seeds["a"][1], length=6)
        sb1 = pool_a.create_sequence(prefill_cache=seeds["b"][1], length=6)
        sa2 = pool_b.create_sequence(prefill_cache=seeds["a"][1], length=6)
        sb2 = pool_b.create_sequence(prefill_cache=seeds["b"][1], length=6)

        tok_a, tok_b = seeds["a"][0], seeds["b"][0]
        for step in range(12):  # crosses a page boundary
            ref_a = pool_a.decode_step(params, tok_a, sa1)
            ref_b = pool_a.decode_step(params, tok_b, sb1)
            batched = pool_b.batch_decode_step(
                params, [tok_a, tok_b, None], [sa2, sb2, None])
            np.testing.assert_allclose(np.asarray(batched[0]),
                                       np.asarray(ref_a),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"a diverged at {step}")
            np.testing.assert_allclose(np.asarray(batched[1]),
                                       np.asarray(ref_b),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"b diverged at {step}")
            tok_a = int(jnp.argmax(ref_a))
            tok_b = int(jnp.argmax(ref_b))
        assert pool_b.length(sa2) == 18
