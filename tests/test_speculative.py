"""Prompt-lookup speculative decoding: greedy equivalence + rollback.

The contract under test (llm/speculative.py): speculative generation
emits EXACTLY the plain greedy decode_step sequence — proposals only
change how many forward passes it takes, never the text — and the
cache it leaves behind is interchangeable with the plain loop's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackiellm_tpu.llm import sampling
from trackiellm_tpu.llm.speculative import (SpecStats, propose_ngram,
                                            speculative_generate)
from trackiellm_tpu.models import llm as llm_model


class TestProposeNgram:
    def test_matches_recent_bigram(self):
        #           0  1  2  3  4  5  6
        hist = [5, 7, 9, 5, 7, 9, 5, 7]
        # tail (5, 7) last occurred at 3..4 -> followed by 9, 5, 7
        assert propose_ngram(hist, 3, max_ngram=2) == [9, 5, 7]

    def test_prefers_longest_ngram(self):
        hist = [1, 2, 3, 8, 2, 3, 9, 1, 2, 3]
        # trigram (1,2,3) matches position 0 -> follows with 8
        assert propose_ngram(hist, 1, max_ngram=3) == [8]

    def test_no_match_returns_empty(self):
        assert propose_ngram([1, 2, 3, 4, 5], 4) == []

    def test_short_history(self):
        assert propose_ngram([3], 4) == []
        assert propose_ngram([], 4) == []


def _setup(seed=0):
    cfg = llm_model.LLMConfig.tiny()
    params = llm_model.init_params(jax.random.PRNGKey(seed), cfg,
                                   dtype=jnp.float32)
    return cfg, params


def _prefill(params, cfg, prompt):
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    padded = np.zeros((32,), np.int32)
    padded[:len(prompt)] = prompt
    logits, cache = llm_model.prefill(params, cfg, jnp.asarray(padded),
                                      jnp.int32(len(prompt)), cache)
    return int(jnp.argmax(logits)), cache


def _plain_greedy(params, cfg, first, cache, n):
    toks, tok = [], first
    for _ in range(n):
        logits, cache = llm_model.decode_step(params, cfg, jnp.int32(tok),
                                              cache)
        tok = int(jnp.argmax(logits))
        toks.append(tok)
    return toks, cache


PROMPTS = [
    [5, 9, 11, 5, 9, 11, 5, 9, 11, 5, 9],     # periodic — proposals fire
    [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],        # pi digits — mostly plain
    [7, 7, 7, 7, 7, 7],                        # constant
]


class TestGreedyEquivalence:
    @pytest.mark.parametrize("prompt", PROMPTS)
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_plain_decode(self, prompt, seed):
        cfg, params = _setup(seed)
        n = 24
        first, cache_a = _prefill(params, cfg, prompt)
        want, cache_a = _plain_greedy(params, cfg, first, cache_a, n)

        _, cache_b = _prefill(params, cfg, prompt)
        got, cache_b, stats = speculative_generate(
            params, cfg, prompt, first, cache_b, n)
        assert got == want, stats.as_dict()
        assert int(cache_b.length) == int(cache_a.length)

    def test_acceptance_happens_on_periodic_output(self):
        """Greedy decode of a random tiny model falls into a cycle;
        once the cycle is in the history, prompt-lookup proposals must
        start being ACCEPTED (this pins the accept path, not just the
        reject path)."""
        cfg, params = _setup(0)
        prompt = [5, 9, 11, 5, 9, 11, 5, 9, 11, 5, 9]
        first, cache = _prefill(params, cfg, prompt)
        _, cache, stats = speculative_generate(
            params, cfg, prompt, first, cache, 48)
        assert stats.passes > 0
        assert stats.accepted > 0, stats.as_dict()
        # fewer forward passes than tokens — the point of the exercise
        assert stats.passes + stats.plain_steps < 48

    def test_cache_usable_after_speculation(self):
        """The cache left by speculative_generate must continue exactly
        like the plain loop's (rollback really masked the rejects)."""
        cfg, params = _setup(1)
        prompt = [2, 4, 2, 4, 2, 4, 2]
        n = 16
        first, cache_a = _prefill(params, cfg, prompt)
        want, cache_a = _plain_greedy(params, cfg, first, cache_a, n + 4)

        _, cache_b = _prefill(params, cfg, prompt)
        got, cache_b, _ = speculative_generate(
            params, cfg, prompt, first, cache_b, n)
        more, cache_b = _plain_greedy(params, cfg, got[-1], cache_b, 4)
        assert got + more == want

    def test_stats_dict(self):
        s = SpecStats()
        s.proposed = 10
        s.accepted = 4
        assert s.as_dict()["acceptance"] == 0.4


# ---------------------------------------------------------------------------
# Runner integration: GenerationConfig(speculative=True)
# ---------------------------------------------------------------------------

from trackiellm_tpu.llm.runner import (GenerationConfig,  # noqa: E402
                                       LLMRunner)
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


def _runner(seed=0, **gen_kwargs):
    cfg = llm_model.LLMConfig.tiny()
    params = llm_model.init_params(jax.random.PRNGKey(seed), cfg,
                                   dtype=jnp.float32)
    gen_kwargs.setdefault("temperature", 0.0)
    gen_kwargs.setdefault("max_tokens", 40)
    return LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                     GenerationConfig(**gen_kwargs),
                     cache_dtype=jnp.float32)


class TestRunnerSpeculative:
    @pytest.mark.parametrize("prompt", [
        "abc abc abc abc ab",          # periodic prompt
        "the quick brown fox",         # free text (greedy may loop)
    ])
    def test_text_identical_to_plain(self, prompt):
        plain = _runner(seed=2).generate(prompt)
        spec = _runner(seed=2, speculative=True).generate(prompt)
        assert spec == plain

    def test_invariants_and_continuation(self):
        r = _runner(seed=2, speculative=True)
        r.generate("abc abc abc abc ab")
        assert r._host_len == len(r._committed_ids)
        assert not r._pending_spec
        # the cache must be continuable exactly like the plain runner's
        p = _runner(seed=2)
        p.generate("abc abc abc abc ab")
        r.add_tool_response("t", {"ok": 1})
        p.add_tool_response("t", {"ok": 1})
        more_spec = [r.generate_next_token() for _ in range(6)]
        more_plain = [p.generate_next_token() for _ in range(6)]
        assert more_spec == more_plain

    def test_stop_string_identical(self):
        kw = dict(seed=2, max_tokens=48)
        plain = _runner(**kw).generate("xyz xyz xyz xy")
        # pick a stop string that actually occurs in the plain output
        stop = plain[len(plain) // 2: len(plain) // 2 + 3]
        if not stop:
            pytest.skip("degenerate output")
        a = _runner(**kw, stop_strings=(stop,)).generate("xyz xyz xyz xy")
        b = _runner(**kw, stop_strings=(stop,),
                    speculative=True).generate("xyz xyz xyz xy")
        assert a == b

    def test_max_tokens_identical(self):
        for n in (1, 3, 7, 20):
            a = _runner(seed=5, max_tokens=n).generate("qq qq qq qq q")
            b = _runner(seed=5, max_tokens=n,
                        speculative=True).generate("qq qq qq qq q")
            assert a == b, n

    def test_sampled_speculation_arms_and_stays_consistent(self):
        """temperature > 0 speculation (rejection-sampling verify):
        passes fire on repetitive context and every invariant of the
        greedy path holds — this is the production cortex's 0.7 case
        (VERDICT r4 #2)."""
        r = _runner(seed=0, speculative=True, temperature=0.7,
                    spec_min_ngram=1, max_tokens=32)
        out = r.generate("abc abc abc abc ab")
        assert r.spec_stats["passes"] > 0, r.spec_stats
        assert r._host_len == len(r._committed_ids)
        assert not r._pending_spec
        assert isinstance(out, str)
        # cache must be continuable (tool-response re-injection)
        r.add_tool_response("t", {"ok": 1})
        more = [r.generate_next_token() for _ in range(4)]
        assert all(m is None or isinstance(m, str) for m in more)

    def test_sampled_speculation_deterministic_per_seed(self):
        a = _runner(seed=4, speculative=True, temperature=0.7,
                    spec_min_ngram=1, max_tokens=24
                    ).generate("qq qq qq qq q")
        b = _runner(seed=4, speculative=True, temperature=0.7,
                    spec_min_ngram=1, max_tokens=24
                    ).generate("qq qq qq qq q")
        assert a == b

    def test_speculation_saves_forward_passes(self):
        """Count device passes via decode_step/extend call wrappers.
        Pins the byte 1..3-gram proposer explicitly (the auto default
        demands 3..8-byte matches, which this random-weight scenario
        rarely produces)."""
        r = _runner(seed=2, speculative=True, max_tokens=32,
                    spec_min_ngram=1, spec_ngram=3)
        calls = {"decode": 0, "extend": 0}
        orig_decode = llm_model.decode_step
        orig_extend = llm_model.extend

        def count_decode(*a, **k):
            calls["decode"] += 1
            return orig_decode(*a, **k)

        def count_extend(*a, **k):
            calls["extend"] += 1
            return orig_extend(*a, **k)

        llm_model.decode_step = count_decode
        llm_model.extend = count_extend
        try:
            out = r.generate("abc abc abc abc ab")
        finally:
            llm_model.decode_step = orig_decode
            llm_model.extend = orig_extend
        n = len(r._generated_ids)
        passes = calls["decode"] + calls["extend"]
        assert passes < n, (passes, n, out)


class TestDraftModel:
    """Two-model speculative decoding (speculative_generate_draft)."""

    @pytest.mark.parametrize("prompt", PROMPTS)
    def test_matches_plain_decode_weak_draft(self, prompt):
        """A different-weights draft (low/erratic acceptance) must
        still produce byte-identical target output."""
        from trackiellm_tpu.llm.speculative import (
            speculative_generate_draft)

        cfg, params = _setup(0)
        draft_cfg = cfg._replace(n_layers=1)
        draft_params = llm_model.init_params(jax.random.PRNGKey(9),
                                             draft_cfg,
                                             dtype=jnp.float32)
        n = 24
        first, cache_a = _prefill(params, cfg, prompt)
        want, cache_a = _plain_greedy(params, cfg, first, cache_a, n)
        _, cache_b = _prefill(params, cfg, prompt)
        got, cache_b, stats = speculative_generate_draft(
            params, cfg, draft_params, draft_cfg, prompt, first,
            cache_b, n)
        assert got == want, stats.as_dict()
        assert int(cache_b.length) == int(cache_a.length)

    def test_self_draft_accepts_everything(self):
        """Target-as-draft: every proposal must be accepted (the two
        greedy chains are the same chain), so rounds emit k+1 tokens
        and the pass count collapses."""
        from trackiellm_tpu.llm.speculative import (
            speculative_generate_draft)

        cfg, params = _setup(0)
        prompt = [5, 9, 11, 5, 9, 11, 5, 9]
        n = 24
        first, cache_a = _prefill(params, cfg, prompt)
        want, _ = _plain_greedy(params, cfg, first, cache_a, n)
        _, cache = _prefill(params, cfg, prompt)
        got, cache, stats = speculative_generate_draft(
            params, cfg, params, cfg, prompt, first, cache, n,
            max_propose=7)
        assert got == want
        assert stats.acceptance == 1.0, stats.as_dict()
        assert stats.passes == 3  # ceil(24 / (7+1))


class TestAutoMode:
    """speculative="auto": self-gating on a rolling acceptance window —
    the worst case rides the production k-token lookahead path, so
    auto can be on by default (VERDICT r3 item 8)."""

    @pytest.mark.parametrize("prompt", [
        "abc abc abc abc ab",
        "the quick brown fox",
    ])
    def test_auto_identical_to_plain(self, prompt):
        plain = _runner(seed=2, lookahead=4).generate(prompt)
        auto = _runner(seed=2, speculative="auto", lookahead=4,
                       spec_probe_interval=8).generate(prompt)
        assert auto == plain

    def test_cooldown_engages_below_threshold(self):
        """With an unreachable acceptance threshold the gate MUST trip
        as soon as the window fills, bounding verify passes to the
        probe cadence (deterministically — real acceptance on random
        weights is whatever it is, so the threshold forces the trip)."""
        r = _runner(seed=5, speculative="auto", max_tokens=60,
                    lookahead=4, spec_probe_interval=16,
                    spec_min_ngram=1, spec_ngram=3,
                    spec_min_acceptance=1.01)  # acceptance <= 1 always
        r.generate("abc abc abc abc ab")  # proposals fire constantly
        assert r._n_emitted >= 30
        # Window fill (4 passes) + <= 2 passes per 16-token probe
        # cycle, vs ~one pass per token ungated.
        assert r.spec_stats["passes"] <= 14, r.spec_stats
        assert r._spec_cooldown >= 0

    def test_auto_continuation_invariants(self):
        r = _runner(seed=2, speculative="auto", lookahead=4,
                    spec_probe_interval=4)
        r.generate("abc abc abc abc ab")
        assert r._host_len == len(r._committed_ids)
        assert not r._pending_spec
        p = _runner(seed=2, lookahead=4)
        p.generate("abc abc abc abc ab")
        r.add_tool_response("t", {"ok": 1})
        p.add_tool_response("t", {"ok": 1})
        assert r._host_len == p._host_len

    def test_ngram_granularity_defaults(self):
        """Byte-level tokenizers demand longer n-gram evidence than
        piece tokenizers (the round-3 0.22-acceptance diagnosis)."""
        from trackiellm_tpu.llm.tokenizer import VocabTokenizer

        rb = _runner(seed=0, speculative=True)
        assert rb._spec_min_ngram == 3 and rb._spec_max_ngram == 8

        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        pieces = [f"w{i}" for i in range(cfg.vocab_size - 4)]
        rv = LLMRunner(params, cfg, VocabTokenizer(pieces),
                       GenerationConfig(temperature=0.0,
                                        speculative=True),
                       cache_dtype=jnp.float32)
        assert rv._spec_min_ngram == 1 and rv._spec_max_ngram == 3

    def test_explicit_min_ngram_respected(self):
        r = _runner(seed=0, speculative=True, spec_min_ngram=2,
                    spec_ngram=5)
        assert r._spec_min_ngram == 2 and r._spec_max_ngram == 5

    def test_dry_context_rides_chunk_path(self):
        """A context with no n-gram matches must not decay auto mode
        into the serial loop: after a short miss streak the cooldown
        engages and tokens come from the lookahead chunk path."""
        r = _runner(seed=3, speculative="auto", max_tokens=40,
                    lookahead=4, spec_probe_interval=16)
        plain = _runner(seed=3, lookahead=4, max_tokens=40)
        a = r.generate("the quick brown fox")  # no 3..8-byte repeats
        p = plain.generate("the quick brown fox")
        assert a == p
        # Serial decode steps are bounded by the miss streak per probe
        # cycle; with 40 tokens that is a handful, not one per token.
        assert r.spec_stats["passes"] <= 6, r.spec_stats


class TestRejectionSamplingKernel:
    """sampling.spec_verify_sampled must preserve the production
    sampler's distribution exactly (the Leviathan point-mass scheme):
    the marginal law of each emitted token equals plain sequential
    sampling through the same processing chain."""

    V, B, W, N = 48, 4, 8, 20000
    KW = dict(top_k=16, top_p=0.9, min_p=0.05, repetition_penalty=1.0)

    def _setup(self, seed=0, temp=0.8, likely_proposal=False,
               scale=2.0, kw=None):
        self.KW = kw or dict(top_k=16, top_p=0.9, min_p=0.05,
                             repetition_penalty=1.0)
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(
            rng.standard_normal((self.B, self.V)).astype(np.float32)
            * scale)
        if likely_proposal:
            # 2nd-most-likely token per position: inside every filter,
            # accepted often enough for conditional statistics.
            proposal = jnp.asarray(np.argsort(
                np.asarray(logits), axis=-1)[:self.B - 1, -2],
                jnp.int32)
        else:
            proposal = jnp.asarray(
                rng.integers(0, self.V, self.B - 1), jnp.int32)
        recent = jnp.full((self.B, self.W), -1, jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(seed + 1), self.N)
        vf = jax.vmap(lambda k: sampling.spec_verify_sampled(
            logits, proposal, jnp.int32(self.B - 1), k,
            jnp.float32(temp), recent, **self.KW))
        verdicts = np.asarray(vf(keys))         # (N, 2) stacked
        return (logits, np.asarray(proposal), verdicts[:, 0],
                verdicts[:, 1], temp)

    def _ref_probs(self, logits, pos, temp):
        proc = sampling._process_chain(
            logits[pos], jnp.float32(temp), self.KW["top_k"],
            self.KW["top_p"], self.KW["min_p"], None, None,
            self.KW["repetition_penalty"])
        lg = np.asarray(proc, np.float64)
        lg -= lg.max()
        p = np.exp(lg)
        return p / p.sum()

    @staticmethod
    def _tv(emp_tokens, probs, v):
        emp = np.bincount(emp_tokens, minlength=v) / len(emp_tokens)
        return 0.5 * np.abs(emp - probs).sum()

    def test_first_token_marginal(self):
        logits, prop, n_accs, toks, temp = self._setup()
        first = np.where(n_accs >= 1, prop[0], toks)
        tv = self._tv(first, self._ref_probs(logits, 0, temp), self.V)
        assert tv < 0.05, tv  # ~0.02 sampling noise at N=20k

    def test_second_token_conditional(self):
        """Given position 0 accepted, the second emitted token's law
        must equal plain sampling at position 1 (acceptance at 0 is
        independent of position 1's draw)."""
        logits, prop, n_accs, toks, temp = self._setup(
            seed=3, likely_proposal=True, scale=1.0, temp=1.2,
            kw=dict(top_k=32, top_p=0.98, min_p=0.0,
                    repetition_penalty=1.0))
        sel = n_accs >= 1
        second = np.where(n_accs >= 2, prop[1], toks)[sel]
        assert len(second) > 1000  # enough statistics
        tv = self._tv(second, self._ref_probs(logits, 1, temp), self.V)
        assert tv < 0.08, tv

    def test_low_temperature_approaches_greedy(self):
        logits, prop, n_accs, toks, temp = self._setup(seed=5,
                                                       temp=0.01)
        first = np.where(n_accs >= 1, prop[0], toks)
        argmax0 = int(np.argmax(np.asarray(logits[0])))
        assert (first == argmax0).mean() > 0.999

    def test_all_rejected_never_emits_proposal_token(self):
        """On rejection at position 0 the residual excludes the
        proposal token by construction."""
        logits, prop, n_accs, toks, _ = self._setup(seed=7)
        rejected_first = toks[n_accs == 0]
        assert not np.any(rejected_first == prop[0])


class TestAutoMinTokensRidesChunkPath:
    def test_min_tokens_floor_uses_chunk_path(self, monkeypatch):
        """auto + min_tokens=max_tokens (the app-e2e harness shape —
        forced-length greedy): speculation can never arm, so every
        token must ride the k-lookahead chunk path, not the serial
        loop (round-5 regression: 418 vs 236 ms reply p50)."""
        r = _runner(seed=2, speculative="auto", max_tokens=16,
                    min_tokens=16, lookahead=4)
        plain = _runner(seed=2, speculative=False, max_tokens=16,
                        min_tokens=16, lookahead=4)
        calls = {"auto": 0, "plain": 0}
        orig = llm_model.decode_step

        def count_auto(*a, **k):
            calls["auto"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(llm_model, "decode_step", count_auto)
        out_auto = r.generate("abc abc abc abc ab")
        monkeypatch.setattr(llm_model, "decode_step", lambda *a, **k: (
            calls.__setitem__("plain", calls["plain"] + 1)
            or orig(*a, **k)))
        out_plain = plain.generate("abc abc abc abc ab")
        assert out_auto == out_plain
        # Chunked decode dispatches decode_chunk_greedy, not per-token
        # decode_step: the auto path must match plain's call count.
        assert calls["auto"] == calls["plain"], calls
