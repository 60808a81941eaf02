"""LLM core tests: prefill/decode consistency, quantization, generation.

Strategy mirrors the reference's runner tests (behavioral, no real
weights — tests/rust_tests/src/runner_logic_test.rs): random-init tiny
config, then check internal consistency (decode continues prefill
exactly) rather than golden outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm


CFG = llm.LLMConfig.tiny()


def _params(dtype=jnp.float32):
    return llm.init_params(jax.random.PRNGKey(0), CFG, dtype=dtype)


class TestLLMCore:
    def test_prefill_shapes(self):
        params = _params()
        cache = llm.KVCache.create(CFG, dtype=jnp.float32)
        tokens = jnp.arange(16, dtype=jnp.int32)
        logits, cache = llm.prefill(params, CFG, tokens, jnp.int32(16), cache)
        assert logits.shape == (CFG.vocab_size,)
        assert int(cache.length) == 16

    def test_decode_continues_prefill(self):
        """Logits from prefill(n+1 tokens) must match prefill(n) + one
        decode_step of token n — the cache path is exact."""
        params = _params()
        toks = jax.random.randint(jax.random.PRNGKey(1), (9,), 0,
                                  CFG.vocab_size, jnp.int32)

        cache_a = llm.KVCache.create(CFG, dtype=jnp.float32)
        ref_logits, _ = llm.prefill(params, CFG, toks, jnp.int32(9), cache_a)

        cache_b = llm.KVCache.create(CFG, dtype=jnp.float32)
        _, cache_b = llm.prefill(params, CFG, toks[:8], jnp.int32(8), cache_b)
        step_logits, cache_b = llm.decode_step(params, CFG, toks[8], cache_b)

        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-3, atol=2e-3)
        assert int(cache_b.length) == 9

    def test_prefill_padding_invariant(self):
        """Padding the prompt bucket must not change the last-token logits."""
        params = _params()
        toks = jax.random.randint(jax.random.PRNGKey(2), (10,), 0,
                                  CFG.vocab_size, jnp.int32)
        cache = llm.KVCache.create(CFG, dtype=jnp.float32)
        a, _ = llm.prefill(params, CFG, toks, jnp.int32(10), cache)
        padded = jnp.concatenate([toks, jnp.zeros(22, jnp.int32)])
        b, _ = llm.prefill(params, CFG, padded, jnp.int32(10), cache)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    def test_greedy_generation_deterministic(self):
        params = _params()
        cache = llm.KVCache.create(CFG, dtype=jnp.float32)
        toks = jnp.arange(4, dtype=jnp.int32)
        logits, cache = llm.prefill(params, CFG, toks, jnp.int32(4), cache)
        first = jnp.argmax(logits).astype(jnp.int32)
        out1, _ = llm.generate_greedy(params, CFG, first, cache, 8)
        out2, _ = llm.generate_greedy(params, CFG, first, cache, 8)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert out1.shape == (8,)

    def test_quantized_params_close_to_fp(self):
        params = _params()
        qparams = llm.quantize_params(params, bits=8, group=64)
        toks = jnp.arange(6, dtype=jnp.int32)
        cache = llm.KVCache.create(CFG, dtype=jnp.float32)
        ref, _ = llm.prefill(params, CFG, toks, jnp.int32(6), cache)
        q, _ = llm.prefill(qparams, CFG, toks, jnp.int32(6), cache)
        # Q8 roundtrip keeps logits close in distribution.
        ref_n = np.asarray(ref) - np.asarray(ref).mean()
        q_n = np.asarray(q) - np.asarray(q).mean()
        corr = np.corrcoef(ref_n, q_n)[0, 1]
        assert corr > 0.99

    def test_rope_positions(self):
        """Same token at different positions must produce different keys."""
        freqs = llm._rope_freqs(CFG)
        x = jnp.ones((1, 2, CFG.head_dim))
        a = llm.apply_rope(x, jnp.array([0]), freqs)
        b = llm.apply_rope(x, jnp.array([5]), freqs)
        assert float(jnp.max(jnp.abs(a - b))) > 1e-3
        # Position 0 is identity.
        np.testing.assert_allclose(np.asarray(a), np.asarray(x), atol=1e-6)


class TestChunkedExtend:
    def test_extend_matches_full_prefill(self):
        """prefill(A) + extend(B) must produce the same next-token logits
        as prefill(A+B)."""
        params = _params()
        toks = jax.random.randint(jax.random.PRNGKey(7), (14,), 0,
                                  CFG.vocab_size, jnp.int32)

        cache_full = llm.KVCache.create(CFG, dtype=jnp.float32)
        ref, cache_full = llm.prefill(params, CFG, toks, jnp.int32(14),
                                      cache_full)

        cache = llm.KVCache.create(CFG, dtype=jnp.float32)
        _, cache = llm.prefill(params, CFG, toks[:8], jnp.int32(8), cache)
        chunk = jnp.concatenate([toks[8:], jnp.zeros(10, jnp.int32)])
        out, cache = llm.extend(params, CFG, chunk, jnp.int32(6), cache)

        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
        assert int(cache.length) == 14
        # And decode continues identically from both caches.
        nxt = jnp.argmax(ref).astype(jnp.int32)
        a, _ = llm.decode_step(params, CFG, nxt, cache_full)
        b, _ = llm.decode_step(params, CFG, nxt, cache)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


class TestAttnBuckets:
    def test_bucketed_decode_matches_full(self):
        cfg = llm.LLMConfig.tiny()._replace(max_seq=512, sliding_window=512)
        params = llm.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(4), (9,), 0,
                                  cfg.vocab_size, jnp.int32)
        c1 = llm.KVCache.create(cfg, dtype=jnp.float32)
        c2 = llm.KVCache.create(cfg, dtype=jnp.float32)
        _, c1 = llm.prefill(params, cfg, toks, jnp.int32(9), c1)
        _, c2 = llm.prefill(params, cfg, toks, jnp.int32(9), c2)
        a, _ = llm.decode_step(params, cfg, toks[0], c1)
        b, _ = llm.decode_step(params, cfg, toks[0], c2, attn_len=64)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
