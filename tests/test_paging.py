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
