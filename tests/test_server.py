"""Batched serving tests: batched decode correctness vs single-sequence
decode, slot insertion, and the continuous-batching server."""

import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.llm.server import LLMServer
from trackiellm_tpu.llm.tokenizer import ByteTokenizer
from trackiellm_tpu.models import llm as llm_model

CFG = llm_model.LLMConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llm_model.init_params(jax.random.PRNGKey(0), CFG,
                                 dtype=jnp.float32)


class TestBatchedDecode:
    def test_matches_single_sequence(self, params):
        """decode_step_batch on two slots with different histories must
        match two independent decode_step chains exactly."""
        toks_a = jnp.arange(6, dtype=jnp.int32)
        toks_b = jnp.arange(3, dtype=jnp.int32) + 40

        # Independent single-sequence paths.
        ca = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        cb = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        la, ca = llm_model.prefill(params, CFG, toks_a, jnp.int32(6), ca)
        lb, cb = llm_model.prefill(params, CFG, toks_b, jnp.int32(3), cb)
        na, nb = jnp.argmax(la), jnp.argmax(lb)
        ref_a, ca = llm_model.decode_step(params, CFG, na.astype(jnp.int32),
                                          ca)
        ref_b, cb = llm_model.decode_step(params, CFG, nb.astype(jnp.int32),
                                          cb)

        # Batched path: prefill separately, insert into slots, one step.
        batch = llm_model.BatchedKVCache.create(CFG, 2, dtype=jnp.float32)
        sa = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        sb = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        _, sa = llm_model.prefill(params, CFG, toks_a, jnp.int32(6), sa)
        _, sb = llm_model.prefill(params, CFG, toks_b, jnp.int32(3), sb)
        batch = llm_model.insert_sequence(batch, CFG, 0, sa)
        batch = llm_model.insert_sequence(batch, CFG, 1, sb)
        tokens = jnp.asarray([int(na), int(nb)], jnp.int32)
        logits, batch = llm_model.decode_step_batch(
            params, CFG, tokens, jnp.array([True, True]), batch)

        np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(ref_a),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(ref_b),
                                   rtol=2e-3, atol=2e-3)
        assert batch.lengths.tolist() == [7, 4]

    def test_attn_len_bucket_is_exact(self, params):
        """Bounding the batched KV attention reads with a static bucket
        must not change logits (masking already hides rows >= length)."""
        batch = llm_model.BatchedKVCache.create(CFG, 2, dtype=jnp.float32)
        for slot, n in ((0, 6), (1, 3)):
            s = llm_model.KVCache.create(CFG, dtype=jnp.float32)
            _, s = llm_model.prefill(
                params, CFG, jnp.arange(n, dtype=jnp.int32), jnp.int32(n), s)
            batch = llm_model.insert_sequence(batch, CFG, slot, s)
        toks = jnp.asarray([5, 9], jnp.int32)
        act = jnp.array([True, True])
        full, _ = llm_model.decode_step_batch(params, CFG, toks, act, batch)
        bucket = max(8, CFG.max_seq // 2)
        lim, _ = llm_model.decode_step_batch(params, CFG, toks, act, batch,
                                             attn_len=bucket)
        np.testing.assert_allclose(np.asarray(lim), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)

    def test_inactive_slot_untouched(self, params):
        batch = llm_model.BatchedKVCache.create(CFG, 2, dtype=jnp.float32)
        s = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        _, s = llm_model.prefill(params, CFG, jnp.arange(4, dtype=jnp.int32),
                                 jnp.int32(4), s)
        batch = llm_model.insert_sequence(batch, CFG, 0, s)
        before_k = np.asarray(batch.k[:, 1])
        _, batch = llm_model.decode_step_batch(
            params, CFG, jnp.asarray([5, 0], jnp.int32),
            jnp.array([True, False]), batch)
        assert batch.lengths.tolist() == [5, 0]
        np.testing.assert_array_equal(np.asarray(batch.k[:, 1]), before_k)


class TestLLMServer:
    def test_concurrent_requests_complete(self, params):
        server = LLMServer(params, CFG, batch_slots=2,
                           tokenizer=ByteTokenizer(CFG.vocab_size),
                           cache_dtype=jnp.float32)
        try:
            futures = [server.submit(f"pergunta {i}", max_tokens=6)
                       for i in range(5)]  # more requests than slots
            results = [f.result(timeout=120) for f in futures]
            assert len(results) == 5
            assert all(isinstance(r, str) for r in results)
            assert server.stats["completed"] == 5
            assert server.stats["tokens"] >= 5
        finally:
            server.close()

    def test_server_matches_runner_greedy(self, params):
        """The served greedy continuation must equal the interactive
        runner's for the same prompt."""
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner

        tok = ByteTokenizer(CFG.vocab_size)
        runner = LLMRunner(params, CFG, tok,
                           GenerationConfig(max_tokens=8, temperature=0.0),
                           cache_dtype=jnp.float32)
        expected = runner.generate("ola")

        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32)
        try:
            got = server.generate("ola", max_tokens=8)
        finally:
            server.close()
        assert got == expected

    def test_chunked_matches_single_step(self, params):
        """The chunk_steps device fast path must produce byte-identical
        results to the per-step loop, across max_tokens both below and
        above the chunk size (mixed chunk + single-step tails)."""
        tok = ByteTokenizer(CFG.vocab_size)
        cases = [("ola", 5), ("tudo bem", 8), ("longa resposta", 19)]
        single = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=1)
        try:
            want = [single.generate(p, max_tokens=m) for p, m in cases]
        finally:
            single.close()
        chunked = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                            cache_dtype=jnp.float32, chunk_steps=4)
        try:
            got = [chunked.generate(p, max_tokens=m) for p, m in cases]
            assert chunked.stats["decode_steps"] >= 4
        finally:
            chunked.close()
        assert got == want

    def test_burst_admission_matches_serial(self, params):
        """A burst of 2x-slots greedy requests — exercising the
        vmapped admission-wave prefill (prefill_batch) AND chunking
        while the backlog is non-empty — produces byte-identical
        outputs to one-at-a-time serving on the per-step path."""
        tok = ByteTokenizer(CFG.vocab_size)
        prompts = [f"pergunta {i} sobre a cena" for i in range(6)]
        serial = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=1)
        try:
            want = [serial.generate(p, max_tokens=9) for p in prompts]
        finally:
            serial.close()
        burst = LLMServer(params, CFG, batch_slots=3, tokenizer=tok,
                          cache_dtype=jnp.float32, chunk_steps=4)
        try:
            futs = [burst.submit(p, max_tokens=9) for p in prompts]
            got = [f.result(timeout=120) for f in futs]
            assert burst.stats["decode_steps"] >= 4  # chunks ran
        finally:
            burst.close()
        assert got == want

    def test_pipelined_chunks_match_single_step(self, params):
        """Long generations drive the speculative chunk pipeline (chunk
        N+1 dispatched on chunk N's device tokens before N's fetch) —
        output must stay byte-identical to the per-step loop, including
        the budget-bounded final chunk."""
        tok = ByteTokenizer(CFG.vocab_size)
        cases = [("descreva a cena", 37), ("outra pergunta", 29)]
        single = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=1)
        try:
            want = [single.generate(p, max_tokens=m) for p, m in cases]
        finally:
            single.close()
        piped = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                          cache_dtype=jnp.float32, chunk_steps=4)
        try:
            futs = [piped.submit(p, max_tokens=m) for p, m in cases]
            got = [f.result(timeout=120) for f in futs]
            assert piped.stats["decode_steps"] >= 28
        finally:
            piped.close()
        assert got == want

    def test_pipeline_offset_stays_constant(self, params):
        """The speculative budget offset must stay at k (exactly one
        chunk in flight per check): an accumulating offset exits the
        pipeline ~halfway through a long generation and pays the
        non-pipelined fetch stall it exists to hide (regression:
        round-3 review finding)."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=4)
        seen = []
        orig = server._can_chunk
        server._can_chunk = lambda offset=0: (
            seen.append(offset) or orig(offset=offset))
        try:
            server.generate("historia longa", max_tokens=41)
        finally:
            server.close()
        spec = [o for o in seen if o > 0]
        assert spec and max(spec) == 4  # never 2k/3k/...
        # 41 tokens at k=4 should keep the pipeline live for most
        # chunks: ~9 speculative checks, all True but the last.
        assert len(spec) >= 8

    def test_pipelined_paged_matches_single_step(self, params):
        """The paged pipeline (device token row fed across chunks, pool
        lengths advanced at dispatch) must match the per-step paged
        loop byte-for-byte across several speculative chunks."""
        tok = ByteTokenizer(CFG.vocab_size)
        cases = [("descreva a cena", 37), ("outra pergunta", 29)]
        single = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=1,
                           paged=True, page_size=16)
        try:
            want = [single.generate(p, max_tokens=m) for p, m in cases]
        finally:
            single.close()
        piped = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                          cache_dtype=jnp.float32, chunk_steps=4,
                          paged=True, page_size=16)
        try:
            futs = [piped.submit(p, max_tokens=m) for p, m in cases]
            got = [f.result(timeout=120) for f in futs]
            assert piped.stats["decode_steps"] >= 28
        finally:
            piped.close()
        assert got == want

    def test_pipelined_eos_mid_chunk_matches(self, params):
        """EOS landing mid-chunk while a speculative chunk is in flight:
        the finished slot's in-flight rows are junk and must be
        discarded; the surviving slot's in-flight tokens must be kept.
        eos_id is picked from the serial run's own token stream so the
        stop genuinely fires inside a pipelined chunk."""
        tok = ByteTokenizer(CFG.vocab_size)
        prompts = ["fala comigo", "conta uma historia"]
        # Raw greedy token chain for prompt 0 (prefill + decode_step),
        # to pick an eos that truncates it mid-stream: position 10 is
        # inside the 3rd k=4 chunk, with the 4th speculatively in
        # flight when the finish is discovered.
        ids = tok.encode(prompts[0], add_bos=True)
        cache = llm_model.KVCache.create(CFG, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            params, CFG, jnp.asarray(ids, jnp.int32),
            jnp.int32(len(ids)), cache)
        chain = []
        nxt = jnp.argmax(logits).astype(jnp.int32)
        for _ in range(12):
            chain.append(int(nxt))
            logits, cache = llm_model.decode_step(params, CFG, nxt, cache)
            nxt = jnp.argmax(logits).astype(jnp.int32)
        eos = chain[10]
        assert eos not in chain[:10]  # fires exactly at position 10
        etok = ByteTokenizer(CFG.vocab_size)
        etok.eos_id = eos
        single = LLMServer(params, CFG, batch_slots=2, tokenizer=etok,
                           cache_dtype=jnp.float32, chunk_steps=1)
        try:
            want = [single.generate(p, max_tokens=30) for p in prompts]
        finally:
            single.close()
        assert want[0] == tok.decode(chain[:10])  # eos actually fired
        piped = LLMServer(params, CFG, batch_slots=2, tokenizer=etok,
                          cache_dtype=jnp.float32, chunk_steps=4)
        try:
            futs = [piped.submit(p, max_tokens=30) for p in prompts]
            got = [f.result(timeout=120) for f in futs]
        finally:
            piped.close()
        assert got == want

    def test_decode_steps_batch_matches_loop(self, params):
        """decode_steps_batch == n manual decode_step_batch calls with
        argmax feedback (tokens and final cache lengths)."""
        batch = llm_model.BatchedKVCache.create(CFG, 2, dtype=jnp.float32)
        for slot, n in ((0, 5), (1, 3)):
            s = llm_model.KVCache.create(CFG, dtype=jnp.float32)
            _, s = llm_model.prefill(
                params, CFG, jnp.arange(n, dtype=jnp.int32) + slot,
                jnp.int32(n), s)
            batch = llm_model.insert_sequence(batch, CFG, slot, s)
        active = jnp.array([True, True])
        toks = jnp.asarray([9, 11], jnp.int32)

        ref_cache, ref_toks, cur = batch, [], toks
        for _ in range(4):
            logits, ref_cache = llm_model.decode_step_batch(
                params, CFG, cur, active, ref_cache)
            cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ref_toks.append(np.asarray(cur))

        produced, got_cache = llm_model.decode_steps_batch(
            params, CFG, toks, active, batch, 4)
        np.testing.assert_array_equal(np.asarray(produced),
                                      np.stack(ref_toks))
        assert got_cache.lengths.tolist() == ref_cache.lengths.tolist()

    def test_paged_chunked_matches_paged_single_step(self, params):
        """The paged device-chunk fast path must match the paged
        per-step loop byte-for-byte, including page pre-growth."""
        tok = ByteTokenizer(CFG.vocab_size)
        cases = [("ola paged", 6), ("resposta longa paged", 19)]
        single = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=8, n_pages=40, chunk_steps=1)
        try:
            want = [single.generate(p, max_tokens=m) for p, m in cases]
        finally:
            single.close()
        chunked = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                            cache_dtype=jnp.float32, paged=True,
                            page_size=8, n_pages=40, chunk_steps=4)
        try:
            got = [chunked.generate(p, max_tokens=m) for p, m in cases]
        finally:
            chunked.close()
        assert got == want

    def test_paged_chunk_falls_back_when_pool_tight(self, params):
        """With too few free pages to pre-grow a full chunk, the server
        must fall back to the single-step path (which owns preemption)
        and still complete every request."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=8, n_pages=6, chunk_steps=4)
        try:
            futs = [server.submit(f"p{i}", max_tokens=10)
                    for i in range(3)]
            outs = [f.result(timeout=120) for f in futs]
            assert all(isinstance(o, str) for o in outs)
        finally:
            server.close()

    def test_on_token_streams_full_text(self, params):
        """on_token pieces concatenate to exactly the future's text on
        BOTH the chunked (pipelined) and per-step paths, and a raising
        callback is disarmed without killing the request or the loop."""
        tok = ByteTokenizer(CFG.vocab_size)
        for chunk in (1, 4):
            server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                               cache_dtype=jnp.float32,
                               chunk_steps=chunk)
            try:
                pieces = []
                fut = server.submit("descreva a cena", max_tokens=13,
                                    on_token=pieces.append)
                text = fut.result(timeout=120)
                assert "".join(pieces) == text

                def boom(_):
                    raise RuntimeError("client bug")

                fut2 = server.submit("outra", max_tokens=7,
                                     on_token=boom)
                assert isinstance(fut2.result(timeout=120), str)
            finally:
                server.close()

    def test_oversized_max_tokens_fails_request_not_server(self, params):
        """max_tokens leaving no prompt room fails ITS future with
        CONTEXT_OVERFLOW; the serve loop keeps serving others."""
        from trackiellm_tpu.utils.errors import TrackieError

        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32)
        try:
            bad = server.submit("ola", max_tokens=CFG.max_seq - 1)
            with pytest.raises(TrackieError):
                bad.result(timeout=60)
            assert server.generate("tudo bem", max_tokens=5)  # loop alive
        finally:
            server.close()

    def test_close_fails_pending(self, params):
        """submit() after close fails FAST (no Future left to hang on a
        dead serve loop)."""
        server = LLMServer(params, CFG, batch_slots=1,
                           tokenizer=ByteTokenizer(CFG.vocab_size),
                           cache_dtype=jnp.float32)
        server.close()
        with pytest.raises(RuntimeError):
            server.submit("x")


class TestServeLoopDeath:
    def test_mid_admission_failure_fails_all_futures(self, params):
        """The loop dying MID-ADMISSION (prefill raises while requests
        are popped from the queue but not yet slot-bound) must fail
        every submitted future promptly — round-3 regression: such
        requests lived only in _admit's locals, their futures hung
        until an external SIGTERM."""

        class _Boom:
            """models.llm with a prefill that always raises."""

            def __getattr__(self, name):
                return getattr(llm_model, name)

            @staticmethod
            def prefill(*a, **k):
                raise RuntimeError("boom")

            @staticmethod
            def prefill_batch(*a, **k):
                raise RuntimeError("boom")

        server = LLMServer(params, CFG, batch_slots=4,
                           tokenizer=ByteTokenizer(CFG.vocab_size),
                           cache_dtype=jnp.float32, model=_Boom())
        try:
            t0 = time.monotonic()
            futs = []
            for p in ("a", "bb", "ccc"):
                try:
                    futs.append(server.submit(p, max_tokens=4))
                except RuntimeError:
                    pass  # loop already died: the fail-fast contract
            assert futs  # at least the first request went in
            for f in futs:
                with pytest.raises(RuntimeError, match="boom"):
                    f.result(timeout=10)
            assert time.monotonic() - t0 < 5.0, "futures settled slowly"
            with pytest.raises(RuntimeError):  # fails fast from now on
                server.submit("late")
        finally:
            server.close()


class TestPagedServer:
    def test_paged_matches_dense_greedy(self, params):
        tok = ByteTokenizer(CFG.vocab_size)
        dense = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                          cache_dtype=jnp.float32)
        try:
            expected = dense.generate("ola mundo", max_tokens=6)
        finally:
            dense.close()

        paged = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                          cache_dtype=jnp.float32, paged=True,
                          page_size=32, n_pages=17)
        try:
            got = paged.generate("ola mundo", max_tokens=6)
            # Pool pages were released when the request finished.
            assert paged.pool.free_pages == 16
        finally:
            paged.close()
        assert got == expected

    def test_paged_concurrent(self, params):
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=32, n_pages=33)
        try:
            futures = [server.submit(f"q{i}", max_tokens=5)
                       for i in range(4)]
            results = [f.result(timeout=120) for f in futures]
            assert len(results) == 4
            assert server.pool.free_pages == 32  # everything released
        finally:
            server.close()


class TestServerPrefixCache:
    def test_prefix_cache_matches_uncached_greedy(self, params):
        """Requests sharing a long prompt prefix through the prefix
        cache must produce byte-identical greedy output to a server
        with the cache off. The second prompt's 25-token unmatched
        suffix also regression-tests the staged-capacity sizing: a
        naive bucket (64 rows at offset 32 over a 64-capacity stage)
        would clamp the write and corrupt the shared prefix."""
        tok = ByteTokenizer(CFG.vocab_size)
        base = "sistema: voce ajuda pessoas cegas. "  # 35 chars + BOS
        prompts = [base + "primeiro", base + "segundo caminho la",
                   base + "primeiro"]
        plain = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                          cache_dtype=jnp.float32, paged=True,
                          page_size=16, n_pages=33, prefix_cache=False)
        try:
            expected = [plain.generate(p, max_tokens=6) for p in prompts]
        finally:
            plain.close()
        cached = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=16, n_pages=33)
        try:
            got = [cached.generate(p, max_tokens=6) for p in prompts]
            stats = cached.pool.prefix_stats
            assert stats["hits"] >= 2  # 2nd and 3rd requests matched
            assert stats["tokens_reused"] >= 64
        finally:
            cached.close()
        assert got == expected

    def test_prefix_cache_concurrent_same_prompt(self, params):
        """A burst of identical prompts: the first registers, later
        admissions share pages; all complete and the pool drains back
        to fully allocatable (cache-resident pages count as free)."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=16, n_pages=33)
        prompt = "a" * 40
        try:
            futures = [server.submit(prompt, max_tokens=5)
                       for _ in range(4)]
            results = [f.result(timeout=120) for f in futures]
            assert len(set(results)) == 1  # greedy: all identical
            assert server.pool.free_pages == 32
        finally:
            server.close()


class TestChunkedPrefill:
    def test_chunked_admission_matches_whole_prompt(self, params):
        """Sarathi-style chunked-prefill admission (prefill_chunk>0)
        must be byte-identical to whole-prompt admission for a mix of
        long and short prompts, dense AND paged."""
        tok = ByteTokenizer(CFG.vocab_size)
        prompts = ["p" * 90 + " primeira pergunta longa",
                   "curta",
                   "q" * 70 + " segunda longa"]
        for paged in (False, True):
            kw = dict(paged=True, page_size=16, n_pages=65) if paged \
                else dict(paged=False)
            ref = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                            cache_dtype=jnp.float32, **kw)
            try:
                expected = [ref.generate(p, max_tokens=6)
                            for p in prompts]
            finally:
                ref.close()
            chunked = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                                cache_dtype=jnp.float32,
                                prefill_chunk=64, **kw)
            try:
                futs = [chunked.submit(p, max_tokens=6) for p in prompts]
                got = [f.result(timeout=120) for f in futs]
                assert chunked.stats.get("prefill_chunks", 0) >= 2, \
                    "long prompts should have taken the job path"
            finally:
                chunked.close()
            assert got == expected, f"paged={paged}"

    def test_chunked_prefill_with_prefix_cache(self, params):
        """A long shared prefix through the job path: the prefix cache
        stages matched pages and the job chunk-prefills only the
        suffix; output identical to the uncached whole-prompt server."""
        tok = ByteTokenizer(CFG.vocab_size)
        base = "s" * 80
        prompts = [base + " rota um", base + " rota dois bem diferente"]
        ref = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                        cache_dtype=jnp.float32, paged=True,
                        page_size=16, n_pages=65, prefix_cache=False)
        try:
            expected = [ref.generate(p, max_tokens=6) for p in prompts]
        finally:
            ref.close()
        srv = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                        cache_dtype=jnp.float32, paged=True,
                        page_size=16, n_pages=65, prefill_chunk=64)
        try:
            got = [srv.generate(p, max_tokens=6) for p in prompts]
            assert srv.pool.prefix_stats["hits"] >= 1
        finally:
            srv.close()
        assert got == expected

    def test_decode_progresses_between_job_chunks(self, params):
        """An active stream must keep emitting tokens while a long
        prompt admits through the job path (the whole point of chunked
        prefill): with a 300-char prompt split into >= 4 chunks, the
        already-running request's stream callback must fire between
        job chunks, not only after admission completes."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=16, n_pages=65, prefill_chunk=16,
                           chunk_steps=1)
        events = []
        try:
            first = server.submit("fluxo ativo", max_tokens=48,
                                  on_token=lambda t: events.append("tok"))
            while not events:  # first request is decoding
                time.sleep(0.005)
            events.append("admit")
            long_fut = server.submit("z" * 220, max_tokens=2)
            long_fut.add_done_callback(lambda f: events.append("done"))
            long_fut.result(timeout=120)
            first.result(timeout=120)
        finally:
            server.close()
        # The long prompt is ~14 16-token chunks; with one decode step
        # interleaved per chunk, the active stream emits ~a-token-per-
        # chunk between the long submit ("admit") and its completion
        # ("done", fired from the serve thread). A whole-prompt
        # admission stall would leave only the ~3 tokens of the
        # pickup + shared-decode window there.
        window = events[events.index("admit") + 1:events.index("done")]
        assert window.count("tok") >= 8, events
        assert server.stats.get("prefill_chunks", 0) >= 10


@pytest.mark.slow  # full-model compile; covered by the slow tier
class TestMLAServer:
    """DeepSeek-class MLA through the continuous-batching server: the
    batched absorbed-decode twin must match the single-sequence MLA
    session byte for byte (ref: the reference serves one llama.cpp
    context per process — batched MLA serving is beyond-parity)."""

    @pytest.fixture(scope="class")
    def mla_setup(self):
        from trackiellm_tpu.models import mla
        cfg = mla.MLAConfig.tiny()
        params = mla.init_params(jax.random.PRNGKey(3), cfg,
                                 dtype=jnp.float32)
        return mla, cfg, params

    def test_mla_server_matches_runner_greedy(self, mla_setup):
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        mla, cfg, params = mla_setup
        tok = ByteTokenizer(cfg.vocab_size)
        prompts = ["ola deepseek", "segunda conversa aqui"]
        expected = []
        for p in prompts:
            runner = LLMRunner(params, cfg, tok,
                               GenerationConfig(max_tokens=6,
                                                temperature=0.0),
                               cache_dtype=jnp.float32, model=mla)
            expected.append(runner.generate(p))
        server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, model=mla)
        try:
            futs = [server.submit(p, max_tokens=6) for p in prompts]
            got = [f.result(timeout=180) for f in futs]
        finally:
            server.close()
        assert got == expected

    def test_mla_chunked_matches_per_step(self, mla_setup):
        mla, cfg, params = mla_setup
        tok = ByteTokenizer(cfg.vocab_size)
        single = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, model=mla,
                           chunk_steps=1)
        try:
            expected = [single.generate(f"q{i}", max_tokens=9)
                        for i in range(2)]
        finally:
            single.close()
        chunked = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                            cache_dtype=jnp.float32, model=mla,
                            chunk_steps=3)
        try:
            futs = [chunked.submit(f"q{i}", max_tokens=9)
                    for i in range(2)]
            got = [f.result(timeout=180) for f in futs]
        finally:
            chunked.close()
        assert got == expected

    def test_mla_rejects_paged(self, mla_setup):
        from trackiellm_tpu.utils.errors import TrackieError
        mla, cfg, params = mla_setup
        with pytest.raises(TrackieError):
            LLMServer(params, cfg, batch_slots=1, model=mla, paged=True)

    def test_mla_mesh_matches_single_device(self, mla_setup):
        """Tensor-parallel MLA serving (VERDICT r4 #4b): head-parallel
        projections, replicated latent cache — greedy identity vs the
        single-device MLA server on the virtual 8-mesh."""
        from jax.sharding import Mesh

        mla, cfg, params = mla_setup
        tok = ByteTokenizer(cfg.vocab_size)
        prompts = ["ola deepseek", "segunda conversa"]
        single = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, model=mla)
        try:
            want = [single.generate(p, max_tokens=6) for p in prompts]
        finally:
            single.close()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                    ("dp", "fsdp", "tp"))
        meshed = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, model=mla,
                           mesh=mesh)
        try:
            got = [meshed.generate(p, max_tokens=6) for p in prompts]
        finally:
            meshed.close()
        assert got == want


class TestQuantizedKVServer:
    def test_int8_kv_serves(self, params):
        """cache_dtype=int8 forces paged mode, stores the pool
        quantized, and serves concurrent requests end to end (compute
        in f32 via compute_dtype for CPU determinism)."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.int8, page_size=32,
                           n_pages=33)
        server.pool.compute_dtype = jnp.float32
        try:
            assert server.paged and server.pool.quantized
            futs = [server.submit(f"pergunta {i}", max_tokens=5)
                    for i in range(3)]
            outs = [f.result(timeout=120) for f in futs]
            assert all(isinstance(o, str) for o in outs)
            assert server.pool.free_pages == 32
        finally:
            server.close()

    def test_int8_rejects_dense(self, params):
        from trackiellm_tpu.utils.errors import TrackieError
        with pytest.raises(TrackieError):
            LLMServer(params, CFG, batch_slots=1, cache_dtype=jnp.int8,
                      paged=False)

    def test_int8_mesh_matches_single_device(self, params):
        """int8 paged KV under the tp mesh (VERDICT r4 #4a): values
        and per-(cell, head) scales shard the same KV-head axis —
        greedy identity vs the single-device int8 server."""
        from jax.sharding import Mesh

        tok = ByteTokenizer(CFG.vocab_size)
        prompts = ["pergunta a", "pergunta b"]
        single = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.int8, page_size=32,
                           n_pages=33)
        single.pool.compute_dtype = jnp.float32
        try:
            want = [single.generate(p, max_tokens=6) for p in prompts]
        finally:
            single.close()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                    ("dp", "fsdp", "tp"))
        meshed = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.int8, page_size=32,
                           n_pages=33, mesh=mesh)
        meshed.pool.compute_dtype = jnp.float32
        try:
            assert meshed.paged and meshed.pool.quantized
            got = [meshed.generate(p, max_tokens=6) for p in prompts]
        finally:
            meshed.close()
        assert got == want


class TestRepetitionPenalty:
    def test_sampled_path_penalizes_repeats(self, params):
        """With a huge penalty and near-zero temperature the sampled
        path must avoid repeating recent tokens, while the plain greedy
        chain (penalty off) is free to repeat."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                           cache_dtype=jnp.float32, seed=3)
        try:
            fut = server.submit("aaaa", max_tokens=12, temperature=0.01,
                                repetition_penalty=5.0)
            fut.result(timeout=120)
            # reach into the last slot's history: no token appears > 2x
            # in a 12-token run under a 5x penalty at ~greedy temp
            gen = server._slots[0].generated
            assert len(gen) == 12
            assert max(gen.count(t) for t in set(gen)) <= 3
        finally:
            server.close()


class TestPagedPoolPressure:
    def test_oom_preempts_slot_not_loop(self, params):
        """Pool exhaustion during decode must preempt only the affected
        slot (retry via backlog) — never kill the serve loop. Two
        32-token prompts (one full page each) in a pool with 3 usable
        pages: the second slot's page-boundary growth hits OOM, gets
        preempted, and completes after the first finishes."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=32, n_pages=4)
        try:
            f1 = server.submit("a" * 31, max_tokens=8)
            f2 = server.submit("b" * 31, max_tokens=8)
            r1 = f1.result(timeout=120)
            r2 = f2.result(timeout=120)
            assert isinstance(r1, str) and isinstance(r2, str)
            assert server._thread.is_alive()
            # The pool must be fully free again after both complete.
            assert server.pool.free_pages == server.pool.n_pages - 1
        finally:
            server.close()

    def test_never_fitting_prompt_rejected(self, params):
        """A prompt larger than the whole pool fails its own future with
        DEVICE_OOM instead of wedging the backlog."""
        from trackiellm_tpu.utils.errors import TrackieError

        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=32, n_pages=3)
        try:
            fut = server.submit("x" * 200, max_tokens=4)
            with pytest.raises(TrackieError):
                fut.result(timeout=60)
            # The server still serves fitting requests afterwards.
            ok = server.generate("hi", max_tokens=4, timeout=120)
            assert isinstance(ok, str)
        finally:
            server.close()


class TestAutoMemoryMode:
    """paged='auto' picks dense when the dense KV layout fits the
    budget (dense chunks measured faster), paged when it wouldn't
    (VERDICT round-2 item 4's auto-selection)."""

    def _mk(self, **kw):
        import jax

        from trackiellm_tpu.models import llm as llm_model

        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        return LLMServer(params, cfg, batch_slots=2,
                         cache_dtype=jnp.float32, **kw)

    def test_auto_prefers_dense_when_it_fits(self):
        s = self._mk()
        try:
            assert s.paged is False and s.cache is not None
        finally:
            s.close()

    def test_auto_pages_under_tight_budget(self):
        s = self._mk(kv_memory_budget_bytes=1024)
        try:
            assert s.paged is True and s.pool is not None
            out = s.generate("ola", max_tokens=4)
            assert isinstance(out, str)
        finally:
            s.close()


class TestQkvBiasPagedParity:
    def test_paged_matches_dense_with_qkv_bias(self):
        """Qwen2-style QKV biases must flow through the PAGED decode
        paths identically to dense (regression: the paged layer bodies
        skipped the bias add until round 3)."""
        cfg = CFG._replace(qkv_bias=True)
        params = llm_model.init_params(jax.random.PRNGKey(4), cfg,
                                       dtype=jnp.float32)
        assert "wqkv_bias" in params["layers"]
        tok = ByteTokenizer(cfg.vocab_size)
        outs = {}
        for label, kw in (("dense", {}),
                          ("paged", dict(paged=True, page_size=16)),
                          ("paged_chunked", dict(paged=True, page_size=16,
                                                 chunk_steps=4))):
            server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                               cache_dtype=jnp.float32,
                               **({"chunk_steps": 1} | kw))
            try:
                outs[label] = server.generate("ola mundo", max_tokens=9)
            finally:
                server.close()
        assert outs["paged"] == outs["dense"]
        assert outs["paged_chunked"] == outs["dense"]


class TestCancellation:
    def test_cancel_frees_slot_midstream(self, params):
        """Cancelling a future mid-generation frees the slot (no
        decode-to-budget); queued-then-cancelled requests never admit;
        other requests are unaffected."""
        import threading

        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=1)
        try:
            started = threading.Event()
            pieces = []

            def first_piece(p):
                pieces.append(p)
                started.set()

            long_fut = server.submit("historia muito longa",
                                     max_tokens=200,
                                     on_token=first_piece)
            assert started.wait(timeout=120)
            queued = server.submit("nunca admitida", max_tokens=50)
            queued.cancel()
            long_fut.cancel()
            # The ONLY slot frees -> this completes promptly.
            text = server.generate("curta", max_tokens=5, timeout=120)
            assert isinstance(text, str)
            assert server.stats["completed"] >= 2  # long (cancelled
            # mid-stream, finished early) + the short one; the queued
            # cancel never admitted.
        finally:
            server.close()


class TestServedToolCalls:
    def test_grammar_constrained_request(self, params):
        """submit(tool_names=...) yields VALID tool-call JSON naming a
        known tool — including under a tight budget (budget-forced
        closure) — while a plain greedy request shares the batch."""
        import json

        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=4)
        try:
            plain_want = server.generate("ola", max_tokens=8)
            futs = [server.submit("Navegue ate a porta", max_tokens=60,
                                  tool_names=["navigate", "describe"]),
                    server.submit("ola", max_tokens=8)]
            tool_text = futs[0].result(timeout=180)
            plain = futs[1].result(timeout=180)
            obj = json.loads(tool_text)
            assert obj["tool_call"]["name"] in ("navigate", "describe")
            assert isinstance(obj["tool_call"]["arguments"], dict)
            assert plain == plain_want  # greedy slot unaffected

            tight = server.generate("va", max_tokens=7,
                                    tool_names=["navigate"])
            obj2 = json.loads(tight)  # closure keeps it valid JSON
            assert "tool_call" in obj2
        finally:
            server.close()

    def test_grammar_contract_matches_runner(self, params):
        """Served constrained output honors the SAME contract as the
        interactive runner's force_tool_call: parseable JSON with a
        known tool name and a dict of arguments. (Byte identity does
        not apply — the runner renders tool descriptions into its
        prompt, so the logits differ and the grammar's whitespace
        freedom diverges.)"""
        import json

        from trackiellm_tpu.llm.runner import (GenerationConfig,
                                               LLMRunner, ToolDefinition)

        tok = ByteTokenizer(CFG.vocab_size)
        tools = [ToolDefinition("go", "move", {}),
                 ToolDefinition("stop", "halt", {})]
        runner = LLMRunner(params, CFG, tok,
                           GenerationConfig(max_tokens=50,
                                            temperature=0.0),
                           cache_dtype=jnp.float32)
        want = json.loads(runner.generate("Navigate", tools=tools,
                                          force_tool_call=True))
        server = LLMServer(params, CFG, batch_slots=1, tokenizer=tok,
                           cache_dtype=jnp.float32)
        try:
            got = json.loads(server.generate(
                "Navigate", max_tokens=50, tool_names=["go", "stop"]))
        finally:
            server.close()
        for obj in (want, got):
            assert obj["tool_call"]["name"] in ("go", "stop")
            assert isinstance(obj["tool_call"]["arguments"], dict)


class TestStopSequences:
    """llama.cpp server "stop" parity: generation ends at the first
    occurrence of any stop string; the result truncates BEFORE the
    match; streamed pieces never leak a stop fragment and concatenate
    to exactly the final text."""

    def _full_text(self, server, prompt, n=48):
        return server.generate(prompt, max_tokens=n)

    def test_stop_truncates_and_streams_exactly(self, params):
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=4)
        try:
            full = self._full_text(server, "ola")
            assert len(full) > 10
            stop = full[6:9]  # guaranteed to occur
            expect = full[: full.find(stop)]
            pieces = []
            text = server.generate("ola", max_tokens=48, stop=[stop],
                                   top_k=40)
            assert text == expect
            fut = server.submit("ola", max_tokens=48, stop=[stop],
                                on_token=pieces.append)
            streamed_result = fut.result(timeout=300)
            assert streamed_result == expect
            assert "".join(pieces) == expect
            for p in pieces:
                assert stop not in p
        finally:
            server.close()

    def test_stop_absent_is_identity(self, params):
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=4)
        try:
            full = self._full_text(server, "bom dia")
            pieces = []
            fut = server.submit("bom dia", max_tokens=48,
                                stop=["ZQX_NEVER"],
                                on_token=pieces.append)
            assert fut.result(timeout=300) == full
            assert "".join(pieces) == full
        finally:
            server.close()

    def test_multiple_stops_first_wins(self, params):
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=4)
        try:
            full = self._full_text(server, "x")
            s_late, s_early = full[12:15], full[4:7]
            want_cut = min(full.find(s_late), full.find(s_early))
            text = server.generate("x", max_tokens=48,
                                   stop=[s_late, s_early])
            assert text == full[:want_cut]
        finally:
            server.close()


class TestMambaServer:
    """Recurrent (SSM) models through the continuous-batching server:
    per-slot (conv, ssm) states replace KV slots — O(1) state per slot,
    no paging needed by construction (models/mamba.py batched surface).
    Outputs must match the single-sequence MambaRunner byte for byte."""

    @pytest.fixture(scope="class")
    def mamba_setup(self):
        from trackiellm_tpu.models import mamba
        cfg = mamba.MambaConfig.test()._replace(max_seq=256)
        params = mamba.init_params(cfg, 7)
        return mamba, cfg, params

    def test_mamba_server_matches_runner_greedy(self, mamba_setup):
        from trackiellm_tpu.llm.runner import GenerationConfig
        mamba, cfg, params = mamba_setup
        tok = ByteTokenizer(cfg.vocab_size)
        prompts = ["ola mamba", "segunda conversa"]
        expected = []
        for p in prompts:
            runner = mamba.MambaRunner(
                params, cfg, tokenizer=tok,
                gen_config=GenerationConfig(max_tokens=6,
                                            temperature=0.0))
            expected.append(runner.generate(p))
        server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, model=mamba)
        try:
            futs = [server.submit(p, max_tokens=6) for p in prompts]
            got = [f.result(timeout=180) for f in futs]
        finally:
            server.close()
        assert got == expected

    def test_mamba_chunked_matches_per_step(self, mamba_setup):
        mamba, cfg, params = mamba_setup
        tok = ByteTokenizer(cfg.vocab_size)
        single = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, model=mamba,
                           chunk_steps=1)
        try:
            expected = [single.generate(f"pergunta {i}", max_tokens=9)
                        for i in range(2)]
        finally:
            single.close()
        chunked = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                            cache_dtype=jnp.float32, model=mamba,
                            chunk_steps=3)
        try:
            futs = [chunked.submit(f"pergunta {i}", max_tokens=9)
                    for i in range(2)]
            got = [f.result(timeout=180) for f in futs]
        finally:
            chunked.close()
        assert got == expected

    def test_batched_step_matches_single(self, mamba_setup):
        """decode_step_batch slot semantics == single decode_step."""
        mamba, cfg, params = mamba_setup
        import numpy as _np
        rng = _np.random.default_rng(0)
        ids = rng.integers(3, 90, 10).astype(_np.int32)
        padded = _np.zeros(16, _np.int32)
        padded[:10] = ids
        logits, seq = mamba.prefill(params, cfg, jnp.asarray(padded),
                                    jnp.int32(10),
                                    mamba.MambaCache.create(cfg))
        bat = mamba.BatchedMambaCache.create(cfg, 2, dtype=jnp.float32)
        bat = mamba.insert_sequence(bat, cfg, 0, seq)
        active = jnp.asarray([True, False])
        t0 = int(jnp.argmax(logits))
        bl, bat = mamba.decode_step_batch(
            params, cfg, jnp.asarray([t0, 0], jnp.int32), active, bat)
        sl, seq2 = mamba.decode_step(params, cfg, jnp.int32(t0), seq)
        _np.testing.assert_allclose(_np.asarray(bl[0]), _np.asarray(sl),
                                    atol=2e-5, rtol=1e-5)
        # inactive slot state untouched
        _np.testing.assert_array_equal(
            _np.asarray(bat.ssm[:, 1]), 0.0)
        assert int(bat.lengths[1]) == 0 and int(bat.lengths[0]) == 11


class TestPagedMeshServer:
    """Paged KV under a tensor-parallel mesh (VERDICT r3 item 6): the
    pool shards the KV-head axis (pages unsharded, gathers local);
    the serve loop's paged programs run GSPMD-partitioned."""

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                    ("dp", "fsdp", "tp"))

    def test_paged_mesh_serves_and_chunk_matches_per_step(self, params):
        tok = ByteTokenizer(CFG.vocab_size)
        mesh = self._mesh()
        prompts = ["ola", "descreva a cena"]
        outs = {}
        for label, chunk in (("per_step", 1), ("chunked", 4)):
            server = LLMServer(params, CFG, batch_slots=2,
                               tokenizer=tok, cache_dtype=jnp.float32,
                               chunk_steps=chunk, mesh=mesh,
                               paged=True, page_size=32)
            try:
                assert server.paged and server.pool is not None
                outs[label] = [server.generate(p, max_tokens=9)
                               for p in prompts]
            finally:
                server.close()
        assert outs["chunked"] == outs["per_step"]
        assert any(outs["per_step"])

    def test_paged_mesh_matches_single_device_paged(self, params):
        """Greedy identity vs the single-device paged server. The tiny
        f32 config keeps logit margins far from psum-reorder ties; if
        this ever flakes on near-ties, the per-step-vs-chunked test
        above is the hard invariant."""
        tok = ByteTokenizer(CFG.vocab_size)
        single = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=32)
        try:
            want = [single.generate(p, max_tokens=8)
                    for p in ("ola", "tudo bem")]
        finally:
            single.close()
        meshed = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=32, mesh=self._mesh())
        try:
            got = [meshed.generate(p, max_tokens=8)
                   for p in ("ola", "tudo bem")]
        finally:
            meshed.close()
        assert got == want

    def test_prefix_cache_composes_with_mesh(self, params):
        """A repeated prompt under paged+mesh reuses prefix pages."""
        tok = ByteTokenizer(CFG.vocab_size)
        server = LLMServer(params, CFG, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, paged=True,
                           page_size=8, mesh=self._mesh())
        try:
            a = server.generate("uma frase longa o bastante", max_tokens=4)
            b = server.generate("uma frase longa o bastante", max_tokens=4)
            assert a == b
            assert server.pool.prefix_stats["hits"] >= 1
        finally:
            server.close()

    def test_auto_under_mesh_stays_dense(self, params):
        server = LLMServer(params, CFG, batch_slots=2,
                           tokenizer=ByteTokenizer(CFG.vocab_size),
                           cache_dtype=jnp.float32, mesh=self._mesh())
        try:
            assert not server.paged and server.cache is not None
        finally:
            server.close()
