"""Runner-layer tests: tokenizer, grammar acceptor, sampling, streaming
session, grammar-constrained tool calls.

Mirrors the reference's runner/grammar behavior (tool_call.gbnf forces
the JSON shape; tk_llm_runner streams token-by-token) using a tiny
random-weight model — constrained output must be valid tool-call JSON
*regardless of weights*, which is exactly the property the grammar layer
must guarantee.
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.llm.grammar import JsonAcceptor, ToolCallGrammar
from trackiellm_tpu.llm.runner import (
    GenerationConfig,
    LLMRunner,
    ToolDefinition,
)
from trackiellm_tpu.llm.tokenizer import ByteTokenizer, VocabTokenizer
from trackiellm_tpu.llm import sampling
from trackiellm_tpu.models import llm as llm_model


class TestByteTokenizer:
    def test_roundtrip(self):
        tok = ByteTokenizer()
        text = "Hello, wörld! 🦾"
        assert tok.decode(tok.encode(text)) == text

    def test_bos(self):
        tok = ByteTokenizer()
        ids = tok.encode("a", add_bos=True)
        assert ids[0] == tok.bos_id and len(ids) == 2


class TestVocabTokenizer:
    def test_longest_match(self):
        tok = VocabTokenizer(["he", "hello", "l", "o", " ", "wor", "d"])
        ids = tok.encode("hello world")
        assert tok.decode(ids) == "hello world"
        # "hello" must win over "he"+"l"+"l"+"o"
        assert len(ids) == 5  # hello | ' ' | wor | l | d


class TestJsonAcceptor:
    @pytest.mark.parametrize("doc", [
        '{}',
        '{"a":1}',
        '{"a":[1,2,{"b":null}],"c":"x\\"y","d":true,"e":-1.5e3}',
        '{ "spaced" : [ ] }',
    ])
    def test_accepts_valid(self, doc):
        acc = JsonAcceptor()
        for ch in doc:
            assert acc.feed(ch), f"rejected at {ch!r} in {doc!r}"
        assert acc.done

    @pytest.mark.parametrize("doc", ['{"a"}', '{,}', '{"a":}', '[1]', '{]'])
    def test_rejects_invalid(self, doc):
        acc = JsonAcceptor()
        ok = all(acc.feed(ch) for ch in doc)
        assert not (ok and acc.done)

    def test_prefix_not_done(self):
        acc = JsonAcceptor()
        for ch in '{"a": [1, 2':
            assert acc.feed(ch)
        assert not acc.done

    def test_no_trailing(self):
        acc = JsonAcceptor()
        for ch in "{}":
            acc.feed(ch)
        assert acc.done
        assert not acc.feed("x")


class TestToolCallGrammar:
    def test_full_valid_call(self):
        g = ToolCallGrammar(["get_weather", "set_alarm"])
        doc = '{"tool_call":{"name":"set_alarm","arguments":{"time":"07:00"}}}'
        assert g.feed_text(doc)
        assert g.done
        parsed = json.loads(doc)
        assert parsed["tool_call"]["name"] == "set_alarm"

    def test_rejects_unknown_tool(self):
        g = ToolCallGrammar(["get_weather"])
        assert not g.feed_text('{"tool_call":{"name":"rm_rf"')

    def test_rejects_wrong_skeleton(self):
        g = ToolCallGrammar(["t"])
        assert not g.feed_text('{"function":')

    def test_name_prefix_probing(self):
        g = ToolCallGrammar(["describe_scene", "describe_object"])
        assert g.feed_text('{"tool_call":{"name":"describe_')
        assert g.allows("s")
        assert g.allows("o")
        assert not g.allows("x")

    def test_token_mask_byte_tokenizer(self):
        tok = ByteTokenizer()
        g = ToolCallGrammar(["go"])
        mask = g.token_mask(tok)
        # At the start only '{' is legal.
        assert mask[ord("{")]
        assert sum(mask) == 1

    def test_mask_after_done_is_eos(self):
        tok = ByteTokenizer()
        g = ToolCallGrammar(["go"])
        g.feed_text('{"tool_call":{"name":"go","arguments":{}}}')
        assert g.done
        mask = g.token_mask(tok)
        assert mask[tok.eos_id] and sum(mask) == 1


class TestSampling:
    def test_greedy(self):
        logits = jnp.array([0.1, 5.0, 0.2])
        assert int(sampling.greedy(logits)) == 1

    def test_greedy_mask(self):
        logits = jnp.array([0.1, 5.0, 0.2])
        mask = jnp.array([True, False, True])
        assert int(sampling.greedy(logits, mask)) == 2

    def test_temperature_sampling_respects_mask(self, rng):
        logits = jnp.zeros(16)
        mask = jnp.zeros(16, bool).at[7].set(True)
        for i in range(8):
            t = sampling.sample(logits, jax.random.fold_in(rng, i),
                                jnp.float32(1.0), mask=mask)
            assert int(t) == 7

    def test_top_k_limits_support(self, rng):
        logits = jnp.arange(16.0)
        seen = set()
        for i in range(64):
            t = sampling.sample(logits, jax.random.fold_in(rng, i),
                                jnp.float32(5.0), top_k=3, top_p=1.0)
            seen.add(int(t))
        assert seen <= {13, 14, 15}

    def test_min_p_prunes_unlikely_tokens(self, rng):
        """min_p keeps only tokens with prob >= min_p * max_prob
        (llama.cpp min-p semantics, pre-temperature)."""
        # probs ~ softmax([4, 0, 3.9, ...]) — token 1's ratio to the
        # max is e^-4 ~= 0.018 < 0.1; token 2's is e^-0.1 ~= 0.90.
        logits = jnp.zeros(8).at[0].set(4.0).at[2].set(3.9)
        seen = set()
        for i in range(64):
            t = sampling.sample(logits, jax.random.fold_in(rng, i),
                                jnp.float32(5.0), top_k=0, top_p=1.0,
                                min_p=0.1)
            seen.add(int(t))
        assert seen <= {0, 2}
        assert seen == {0, 2}  # high temp would spread without min_p

    def test_min_p_zero_is_off(self, rng):
        logits = jnp.zeros(8)
        seen = {int(sampling.sample(logits, jax.random.fold_in(rng, i),
                                    jnp.float32(1.0), top_k=0,
                                    top_p=1.0, min_p=0.0))
                for i in range(64)}
        assert len(seen) > 4

    def test_repetition_penalty_shifts_distribution(self, rng):
        logits = jnp.zeros(8).at[3].set(2.0)
        recent = jnp.full((4,), -1, jnp.int32).at[0].set(3)
        counts = {i: 0 for i in range(8)}
        for i in range(100):
            t = sampling.sample(logits, jax.random.fold_in(rng, i),
                                jnp.float32(1.0), top_k=0, top_p=1.0,
                                recent_tokens=recent,
                                repetition_penalty=4.0)
            counts[int(t)] += 1
        # Heavy penalty: token 3 loses its edge.
        assert counts[3] < 60


class TestLLMRunnerSession:
    @pytest.fixture(scope="class")
    def runner(self):
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        return LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                         GenerationConfig(max_tokens=24, temperature=0.8,
                                          seed=1),
                         cache_dtype=jnp.float32)

    def test_streaming_generation(self, runner):
        out = runner.generate("Hello")
        assert isinstance(out, str)
        assert runner.text == out

    def test_forced_tool_call_is_valid_json(self, runner):
        tools = [ToolDefinition("go", "move", {"dir": "direction"}),
                 ToolDefinition("stop", "halt", {})]
        runner.gen.max_tokens = 200
        out = runner.generate(
            "Navigate", tools=tools, force_tool_call=True)
        # Random weights, but the grammar guarantees the shape.
        obj = json.loads(out)
        assert obj["tool_call"]["name"] in ("go", "stop")
        assert isinstance(obj["tool_call"]["arguments"], dict)
        assert runner.parse_tool_call()["name"] in ("go", "stop")

    def test_tool_response_reinjection(self, runner):
        runner.prepare_generation("hi")
        base_len = int(runner.cache.length)
        runner.add_tool_response("go", {"ok": True})
        assert int(runner.cache.length) > base_len
        # Generation can continue after the injection.
        piece = runner.generate_next_token()
        assert piece is None or isinstance(piece, str)

    def test_reset(self, runner):
        runner.generate("hello")
        runner.reset()
        assert int(runner.cache.length) == 0
        assert runner.text == ""

    def test_prompt_builder_lists_tools(self, runner):
        tools = [ToolDefinition("read_text", "OCR the scene", {})]
        p = runner.build_prompt("sys", "ctx", "what do you see?", tools)
        assert "read_text" in p and "tool_call" in p and "[INST]" in p

    def test_text_equals_whole_sequence_decode(self):
        """Byte-level tokens forming multibyte UTF-8 must assemble into
        whole characters: generate()'s streamed pieces concatenate to
        exactly tokenizer.decode(generated_ids), never per-byte U+FFFD
        replacements (regression: MLA-server-vs-runner identity caught
        the per-token decode splitting 2-byte chars)."""
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(6), cfg,
                                       dtype=jnp.float32)
        tok = ByteTokenizer(cfg.vocab_size)
        pieces = []
        r = LLMRunner(params, cfg, tok,
                      GenerationConfig(max_tokens=12, temperature=0.0),
                      cache_dtype=jnp.float32)
        out = r.generate("segunda conversa aqui",
                         on_token=pieces.append)
        assert out == tok.decode(r._generated_ids)
        assert "".join(pieces) == out
        # The probe prompt's greedy chain includes a 2-byte character
        # under these weights; keep the regression honest.
        assert any(ord(c) > 127 and c != "�" for c in out)


class TestPrefixPriming:
    """LLMRunner.prime(): mid-utterance prompt-prefix prefill (the
    streaming-ASR integration point)."""

    @pytest.fixture(scope="class")
    def setup(self):
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        return cfg, params

    def _runner(self, cfg, params):
        return LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                         GenerationConfig(max_tokens=10, temperature=0.0,
                                          seed=1),
                         cache_dtype=jnp.float32)

    def test_primed_matches_unprimed(self, setup):
        cfg, params = setup
        prompt = "[INST] sys\n\nUser: o que ha a frente? [/INST]"
        plain = self._runner(cfg, params).generate(prompt)

        primed = self._runner(cfg, params)
        primed.prime(prompt[:24])   # stable prefix known mid-utterance
        out = primed.generate(prompt)
        assert out == plain
        assert int(primed.cache.length) == len(
            primed.tokenizer.encode(prompt, add_bos=True)) + 10

    def test_incremental_reprime_then_generate(self, setup):
        cfg, params = setup
        prompt = "[INST] sys\n\nUser: onde estou agora? [/INST]"
        plain = self._runner(cfg, params).generate(prompt)

        r = self._runner(cfg, params)
        r.prime(prompt[:12])
        r.prime(prompt[:30])  # stable prefix grew: extends, no restart
        len_after_primes = int(r.cache.length)
        assert len_after_primes == len(
            r.tokenizer.encode(prompt[:30], add_bos=True))
        assert r.generate(prompt) == plain

    def test_mismatched_prime_falls_back(self, setup):
        cfg, params = setup
        prompt = "[INST] sys\n\nUser: pergunta final [/INST]"
        plain = self._runner(cfg, params).generate(prompt)
        r = self._runner(cfg, params)
        r.prime("[INST] outra coisa completamente")
        assert r.generate(prompt) == plain  # full re-prefill, same text


class TestPipelinedGreedyEOS:
    def test_eos_lookahead_discard_preserves_cache_state(self):
        """The pipelined greedy path dispatches a lookahead step before
        it knows the sampled token is EOS. On EOS the lookahead must be
        DISCARDED: cache length, host mirror, and committed ids must
        equal the pre-EOS state, and a following turn must extend from
        it exactly as the serial path would."""
        import jax
        import jax.numpy as jnp

        from trackiellm_tpu.models import llm as llm_model

        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        tok = ByteTokenizer(cfg.vocab_size)

        class EOSLogitsRunner(LLMRunner):
            """Force EOS as the argmax after two emitted tokens by
            patching the logits the sampler sees."""

            def generate_next_token(self):
                if (self._n_emitted >= 2 and self._next_logits is not None
                        and not self._done):
                    self._next_logits = (self._next_logits.at[:]
                                         .set(-1e9)
                                         .at[self.tokenizer.eos_id]
                                         .set(1e9))
                return super().generate_next_token()

        r = EOSLogitsRunner(params, cfg, tok,
                            GenerationConfig(max_tokens=16,
                                             temperature=0.0,
                                             lookahead=1),
                            cache_dtype=jnp.float32)
        out = r.generate("ola")
        assert len(r._generated_ids) == 2  # stopped at the forced EOS
        # EOS was never committed: cache mirrors exactly the emitted
        # tokens on top of the prompt.
        prompt_len = len(r._committed_ids) - 2
        assert int(r.cache.length) == prompt_len + 2
        assert r._host_len == int(r.cache.length)
        # The conversation continues cleanly from that state.
        more = r.chat("tudo bem?")
        assert isinstance(more, str)
        assert int(r.cache.length) == r._host_len


class TestChatAppendOnly:
    def test_multi_turn_reuses_cache(self):
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(3), cfg,
                                       dtype=jnp.float32)
        r = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                      GenerationConfig(max_tokens=4, temperature=0.0),
                      cache_dtype=jnp.float32)
        a = r.chat("oi")
        len_after_1 = r._host_len
        b = r.chat("tudo bem?")
        assert isinstance(a, str) and isinstance(b, str)
        # Second turn appended rather than restarting from zero.
        assert r._host_len > len_after_1
        assert len(r._chat_turns) == 2

    def test_window_overflow_restarts(self):
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(3), cfg,
                                       dtype=jnp.float32)
        r = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                      GenerationConfig(max_tokens=8, temperature=0.0),
                      cache_dtype=jnp.float32)
        for i in range(6):
            r.chat(f"mensagem numero {i} com algum texto extra aqui")
        # Never exceeds the window.
        assert r._host_len < cfg.max_seq
        assert len(r._chat_turns) == 6


class TestGrammarFuzz:
    def test_random_valid_json_accepted(self):
        """Property: any json.dumps output for the arguments object must
        be accepted by the acceptor and marked done."""
        import random

        rng = random.Random(0)

        def rand_value(depth=0):
            kinds = ["str", "int", "float", "bool", "null"]
            if depth < 2:
                kinds += ["obj", "arr"]
            k = rng.choice(kinds)
            if k == "str":
                return "".join(rng.choice("abc xyz\"\\/\n\t")
                               for _ in range(rng.randrange(6)))
            if k == "int":
                return rng.randrange(-10**6, 10**6)
            if k == "float":
                return rng.uniform(-1e6, 1e6)
            if k == "bool":
                return rng.random() < 0.5
            if k == "null":
                return None
            if k == "arr":
                return [rand_value(depth + 1)
                        for _ in range(rng.randrange(4))]
            return {f"k{i}": rand_value(depth + 1)
                    for i in range(rng.randrange(4))}

        for _ in range(50):
            obj = {f"k{i}": rand_value() for i in range(rng.randrange(4))}
            doc = json.dumps(obj)
            acc = JsonAcceptor()
            for ch in doc:
                assert acc.feed(ch), f"rejected {doc!r} at {ch!r}"
            assert acc.done, doc

    def test_random_mutations_never_accepted_as_done(self):
        """Property: single-character corruption either gets rejected or
        leaves the acceptor not-done — json.loads agrees in every case we
        mark done."""
        import random

        rng = random.Random(1)
        base = '{"a":[1,2.5,null],"b":{"c":"tx t","d":true},"e":-3e2}'
        for _ in range(200):
            pos = rng.randrange(len(base))
            ch = rng.choice('{}[]":,0123456789abtfn')
            doc = base[:pos] + ch + base[pos + 1:]
            acc = JsonAcceptor()
            ok = all(acc.feed(c) for c in doc)
            if ok and acc.done:
                json.loads(doc)  # must not raise

    def test_closure_always_valid(self):
        """Property: closure() from any valid prefix yields valid JSON."""
        import random

        rng = random.Random(2)
        base = '{"a":[1,2.5,null],"b":{"c":"tx t","d":true},"e":-3e2}'
        for cut in range(1, len(base)):
            acc = JsonAcceptor()
            ok = all(acc.feed(c) for c in base[:cut])
            assert ok
            closure = acc.closure()
            json.loads(base[:cut] + closure)  # must parse


class TestCancellation:
    def test_should_stop_cancels_between_tokens(self):
        """A true should_stop halts generation at the next token
        boundary — the shutdown path for hosts (cortex) that must not
        block on a long reply."""
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        runner = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                           GenerationConfig(max_tokens=32,
                                            temperature=0.0),
                           cache_dtype=jnp.float32)
        seen = []

        def stop_after_three():
            return len(seen) >= 3

        out = runner.generate("ola", on_token=seen.append,
                              should_stop=stop_after_three)
        assert len(seen) == 3
        assert out == "".join(seen)


class TestStopStringCacheCommit:
    def test_stop_string_commits_final_token(self):
        """A stop-string-terminated turn must still commit its final
        sampled token to the KV cache — a following chat() extends from
        a cache consistent with every token actually generated."""
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        tok = ByteTokenizer(cfg.vocab_size)
        # Pick a stop string the model will definitely emit: the second
        # generated piece of an unconstrained greedy run.
        probe = LLMRunner(params, cfg, tok,
                          GenerationConfig(max_tokens=4, temperature=0.0),
                          cache_dtype=jnp.float32)
        probe_text = probe.generate("abcdef")
        assert len(probe_text) >= 2, "probe generation ended at EOS"
        stop = probe_text[1]
        runner = LLMRunner(
            params, cfg, tok,
            GenerationConfig(max_tokens=16, temperature=0.0,
                             stop_strings=(stop,)),
            cache_dtype=jnp.float32)
        out = runner.generate("abcdef")
        assert len(runner._generated_ids) < 16, "stop string never fired"
        assert stop not in out
        n_prompt = len(tok.encode("abcdef", add_bos=True))
        # cache history = prompt + every generated token (including the
        # one carrying the stop string), with host mirror in sync.
        assert runner._host_len == n_prompt + len(runner._generated_ids)
        assert int(runner.cache.length) == runner._host_len


class TestSentencePieceBPE:
    """Score-merge BPE must reproduce llama.cpp segmentation (reference:
    src/ai_models/tk_runner_streaming.c:13-46 inherits llama.cpp's
    llm_tokenizer_spm), which greedy longest-match does NOT."""

    def test_bpe_beats_greedy_on_scored_vocab(self):
        from trackiellm_tpu.models.convert import tokenizer_from_pieces

        # llama layout: 0 unk, 1 bos, 2 eos, then content pieces.
        pieces = ["<unk>", "<s>", "</s>", "▁", "a", "b", "c",
                  "ab", "bc"]
        scores = [0, 0, 0, -1.0, -1.0, -1.0, -1.0, -2.0, -1.5]
        bpe = tokenizer_from_pieces(pieces, scores=scores)
        greedy = tokenizer_from_pieces(pieces)  # no scores -> greedy

        # Greedy eats the longest early piece: '▁','ab','c'.
        g = greedy.encode("abc")
        assert [greedy._raw[i] for i in g] == ["▁", "ab", "c"]
        # BPE merges the highest-scoring pair first: 'bc' (-1.5) beats
        # 'ab' (-2.0), so llama.cpp segments '▁','a','bc'.
        b = bpe.encode("abc")
        assert [bpe._raw[i] for i in b] == ["▁", "a", "bc"]

    def test_tie_breaks_leftmost(self):
        from trackiellm_tpu.models.convert import tokenizer_from_pieces

        pieces = ["<unk>", "<s>", "</s>", "▁", "a", "b",
                  "ab", "ba"]
        scores = [0, 0, 0, -1.0, -1.0, -1.0, -2.0, -2.0]
        tok = tokenizer_from_pieces(pieces, scores=scores)
        # "aba": pairs (a,b)->ab and (b,a)->ba tie at -2.0; leftmost
        # merges first -> 'ab','a'.
        ids = tok.encode("aba")
        assert [tok._raw[i] for i in ids] == ["▁", "ab", "a"]

    def test_byte_fallback(self):
        from trackiellm_tpu.models.convert import tokenizer_from_pieces

        pieces = (["<unk>", "<s>", "</s>", "▁", "o", "l", "ol"]
                  + [f"<0x{i:02X}>" for i in range(256)])
        scores = [0.0] * len(pieces)
        tok = tokenizer_from_pieces(pieces, scores=scores)
        ids = tok.encode("olá")  # 'á' not in vocab -> 2 UTF-8 bytes
        raws = [tok._raw[i] for i in ids]
        assert raws[:2] == ["▁", "ol"]
        assert raws[2:] == ["<0xC3>", "<0xA1>"]
        # Byte tokens reassemble through decode.
        assert tok.decode(ids) == " olá"

    @staticmethod
    def _naive_spm_bpe(text, index, scores):
        """Direct transcription of sentencepiece/llama.cpp greedy merge:
        repeatedly scan ALL adjacent pairs, merge the one whose
        concatenation is a vocab piece with the highest score (leftmost
        on ties). O(n^2) but obviously correct — the oracle for the
        heap + linked-list implementation."""
        syms = list(text)
        while True:
            best = None  # (score, -pos) maximized
            for i in range(len(syms) - 1):
                tid = index.get(syms[i] + syms[i + 1])
                if tid is None:
                    continue
                cand = (scores[tid], -i)
                if best is None or cand > best[0]:
                    best = (cand, i)
            if best is None:
                return syms
            i = best[1]
            syms[i: i + 2] = [syms[i] + syms[i + 1]]

    def test_matches_naive_reference_on_random_vocabs(self):
        """Property test: the heap-based merge loop must agree with the
        naive rescan-everything reference on random scored vocabs."""
        import random

        from trackiellm_tpu.models.convert import tokenizer_from_pieces

        rng = random.Random(42)
        alphabet = "abcde"
        for trial in range(40):
            # Random multi-char pieces with random scores.
            n_pieces = rng.randint(3, 20)
            content = sorted({
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(2, 4)))
                for _ in range(n_pieces)})
            pieces = (["<unk>", "<s>", "</s>"] + list(alphabet)
                      + content)
            scores = [0.0] * 3 + [0.0] * len(alphabet) + [
                round(rng.uniform(-10, -1), 3) for _ in content]
            tok = tokenizer_from_pieces(pieces, scores=scores,
                                        add_space_prefix=False)
            text = "".join(rng.choice(alphabet)
                           for _ in range(rng.randint(1, 30)))
            got = [tok._raw[i] for i in tok.encode(text)]
            want = self._naive_spm_bpe(text, tok._index, tok._scores)
            assert got == want, (trial, text, got, want)

    def test_roundtrip_with_marker_vocab(self):
        from trackiellm_tpu.models.convert import tokenizer_from_pieces

        pieces = (["<unk>", "<s>", "</s>", "▁olá", "▁mundo",
                   "▁", "m", "u", "n", "d", "o"]
                  + [f"<0x{i:02X}>" for i in range(256)])
        scores = [0.0, 0.0, 0.0, -1.0, -2.0, -3.0] + [-4.0] * 5 \
            + [0.0] * 256
        tok = tokenizer_from_pieces(pieces, scores=scores)
        ids = tok.encode("olá mundo", add_bos=True)
        assert ids[0] == tok.bos_id
        assert tok.decode(ids) == " olá mundo"


class TestChunkedPrefill:
    def test_oversized_prompt_matches_single_prefill(self, monkeypatch):
        """A prompt larger than the biggest prefill bucket must produce
        IDENTICAL logits to a single oversized prefill (chunked prefill
        with cross-chunk attention), and no truncation warning fires.
        The reference never truncates mid-prompt (4096/2048 contract,
        tk_cortex_main.c:1334)."""
        import trackiellm_tpu.llm.runner as runner_mod

        cfg = llm_model.LLMConfig.tiny()._replace(max_seq=2048,
                                                  sliding_window=2048)
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        tok = ByteTokenizer(cfg.vocab_size)
        runner = LLMRunner(params, cfg, tok,
                           GenerationConfig(max_tokens=8, temperature=0.0),
                           cache_dtype=jnp.float32)

        warnings = []
        monkeypatch.setattr(runner_mod.log, "warning",
                            lambda *a, **k: warnings.append(a))
        # Force chunking: cap prefill buckets at 512 so a ~1501-token
        # prompt runs as prefill(512) + extend chunks.
        monkeypatch.setattr(runner_mod, "PREFILL_BUCKETS",
                            (64, 128, 256, 512))
        prompt = "x" * 1500  # 1501 ids with bos > 512-bucket
        runner.prepare_generation(prompt)
        assert not warnings, warnings
        chunked_logits = np.asarray(runner._next_logits)
        n = runner._host_len
        assert n == 1501  # every token kept — no content loss

        # Oracle: one oversized prefill of the same ids.
        ids = tok.encode(prompt, add_bos=True)
        assert len(ids) == n
        padded = np.zeros(2048, np.int32)
        padded[: len(ids)] = ids
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        want, _ = llm_model.prefill(params, cfg, jnp.asarray(padded),
                                    jnp.int32(len(ids)), cache)
        np.testing.assert_allclose(chunked_logits, np.asarray(want),
                                   rtol=2e-3, atol=2e-3)

    def test_window_overflow_still_truncates_with_warning(self,
                                                          monkeypatch):
        import trackiellm_tpu.llm.runner as runner_mod

        cfg = llm_model.LLMConfig.tiny()  # max_seq 256
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        runner = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                           GenerationConfig(max_tokens=16,
                                            temperature=0.0),
                           cache_dtype=jnp.float32)
        warnings = []
        monkeypatch.setattr(runner_mod.log, "warning",
                            lambda *a, **k: warnings.append(a))
        runner.prepare_generation("y" * 1000)
        assert warnings and "truncated" in warnings[0][0]
        assert runner._host_len <= cfg.max_seq - 16 - 1


class TestGrammarMaskCaching:
    def test_masks_cached_per_state(self):
        tok = ByteTokenizer()
        g = ToolCallGrammar(["navigate"])
        m1 = g.token_mask(tok)
        m2 = g.token_mask(tok)
        assert m1 is m2  # same acceptor state -> shared cached mask
        g.feed_text("{")
        m3 = g.token_mask(tok)
        assert m3 is not m1

    def test_steady_state_under_1ms_at_32k_vocab(self):
        """VERDICT target: tool-call decode mask overhead < 1 ms/token
        at a 32k vocab. Cached states make the steady-state cost a dict
        lookup; this drives a realistic full tool call twice and times
        the second (cache-warm) pass."""
        import time

        class FakeTok:
            """32k-vocab tokenizer: 256 byte pieces cycled + filler
            multi-char pieces (mimics a real SP vocab's shape)."""

            vocab_size = 32000
            bos_id, eos_id, pad_id = 1, 2, 0

            def __init__(self):
                self._pieces = []
                for t in range(self.vocab_size):
                    b = t % 256
                    if 32 <= b < 127:
                        self._pieces.append(chr(b) * (1 + t // 8192))
                    else:
                        self._pieces.append("�")

            def decode_token(self, t):
                return self._pieces[t]

        tok = FakeTok()
        doc = '{"tool_call":{"name":"navigate","arguments":{"dir":"left","dist":2.5}}}'

        def drive():
            g = ToolCallGrammar(["navigate"])
            masks = 0
            for ch in doc:
                g.token_mask(tok)
                assert g.feed_char(ch)
                masks += 1
            return masks

        g_warm = ToolCallGrammar(["navigate"])
        for ch in doc:  # warm the shared cache? caches are per-instance
            g_warm.token_mask(tok)
            g_warm.feed_char(ch)

        # Per-instance cache: a fresh grammar pays misses again, so the
        # meaningful number is the amortized per-token cost over a turn.
        t0 = time.perf_counter()
        n = drive()
        dt = (time.perf_counter() - t0) / n * 1e3
        # Amortized budget: generous 5x the 1 ms target for CI noise on
        # the miss-heavy first pass...
        assert dt < 5.0, f"{dt:.2f} ms/token amortized (first pass)"

        # Steady state (cache-warm same instance): strictly < 1 ms.
        g = ToolCallGrammar(["navigate"])
        for ch in doc:
            g.token_mask(tok)
            g.feed_char(ch)
        g.reset()
        t0 = time.perf_counter()
        for ch in doc:
            g.token_mask(tok)
            g.feed_char(ch)
        dt = (time.perf_counter() - t0) / len(doc) * 1e3
        assert dt < 1.0, f"{dt:.3f} ms/token cache-warm"


class TestKTokenLookahead:
    """The k-token chunk lookahead (GenerationConfig.lookahead > 1) must
    be byte- and cache-state-identical to the serial greedy path for
    every terminal: max_tokens, EOS mid-chunk, stop string mid-chunk,
    external cancellation, and window exhaustion — and conversations
    must continue correctly from the reconciled cache."""

    def _make(self, lookahead, tok=None, max_seq=None, **gen_kw):
        import jax
        import jax.numpy as jnp
        from trackiellm_tpu.models import llm as llm_model

        cfg = llm_model.LLMConfig.tiny()
        if max_seq:
            cfg = cfg._replace(max_seq=max_seq, sliding_window=max_seq)
        params = llm_model.init_params(jax.random.PRNGKey(7), cfg,
                                       dtype=jnp.float32)
        tok = tok or ByteTokenizer(cfg.vocab_size)
        gen_kw.setdefault("temperature", 0.0)
        gen_kw.setdefault("max_tokens", 24)
        r = LLMRunner(params, cfg, tok,
                      GenerationConfig(lookahead=lookahead, **gen_kw),
                      cache_dtype=jnp.float32)
        return r

    def _assert_state_equal(self, a, b):
        import numpy as np

        assert a._generated_text == b._generated_text
        assert a._generated_ids == b._generated_ids
        assert a._committed_ids == b._committed_ids
        assert int(a.cache.length) == int(b.cache.length)
        assert a._host_len == b._host_len
        n = int(a.cache.length)
        np.testing.assert_allclose(
            np.asarray(a.cache.k)[:, :n], np.asarray(b.cache.k)[:, :n],
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(a.cache.v)[:, :n], np.asarray(b.cache.v)[:, :n],
            rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("max_tokens", [1, 5, 8, 13, 24])
    def test_matches_serial_at_budget(self, max_tokens):
        a = self._make(8, max_tokens=max_tokens)
        b = self._make(1, max_tokens=max_tokens)
        ta = a.generate("ola, tudo bem?")
        tb = b.generate("ola, tudo bem?")
        assert ta == tb
        self._assert_state_equal(a, b)

    def test_eos_mid_chunk_rolls_back(self):
        # Find what the model naturally emits, then declare the 4th
        # generated token to be EOS — it lands mid-chunk for k=8.
        probe = self._make(1, max_tokens=12)
        probe.generate("ola")
        ids = probe._generated_ids
        assert len(ids) >= 5
        # Pick a token whose FIRST occurrence is mid-chunk for k=8.
        eos_pos = next(j for j in range(2, 7) if ids[j] not in ids[:j])

        def mk_tok():
            t = ByteTokenizer(512)
            t.eos_id = ids[eos_pos]
            return t

        a = self._make(8, tok=mk_tok(), max_tokens=12)
        b = self._make(1, tok=mk_tok(), max_tokens=12)
        ta = a.generate("ola")
        tb = b.generate("ola")
        assert ta == tb
        assert len(a._generated_ids) == eos_pos  # stopped before the EOS
        self._assert_state_equal(a, b)
        # Conversation continues identically from the rolled-back state.
        ca = a.chat("e agora?")
        cb = b.chat("e agora?")
        assert ca == cb
        self._assert_state_equal(a, b)

    def test_stop_string_mid_chunk(self):
        probe = self._make(1, max_tokens=12)
        probe.generate("ola")
        text = probe._generated_text
        assert len(text) >= 4
        stop = text[2:4]  # completes on an early token, mid-chunk
        a = self._make(8, max_tokens=12, stop_strings=(stop,))
        b = self._make(1, max_tokens=12, stop_strings=(stop,))
        ta = a.generate("ola")
        tb = b.generate("ola")
        assert ta == tb
        assert stop not in ta
        self._assert_state_equal(a, b)
        ca = a.chat("mais")
        cb = b.chat("mais")
        assert ca == cb
        self._assert_state_equal(a, b)

    def test_external_cancel_mid_chunk(self):
        counts = {}
        runners = {}
        for k in (8, 1):
            r = self._make(k, max_tokens=24)
            seen = []
            r.generate("ola",
                       on_token=lambda p, s=seen: s.append(p),
                       should_stop=lambda s=seen: len(s) >= 3)
            counts[k] = len(seen)
            runners[k] = r
        assert counts[8] == counts[1] == 3
        self._assert_state_equal(runners[8], runners[1])

    def test_window_tail_falls_back(self):
        # max_seq small enough that chunks stop fitting near the end:
        # the runner must switch to the serial path and still match it.
        a = self._make(8, max_seq=64, max_tokens=48)
        b = self._make(1, max_seq=64, max_tokens=48)
        ta = a.generate("oi")
        tb = b.generate("oi")
        assert ta == tb
        self._assert_state_equal(a, b)

    def test_tool_response_after_lookahead_generation(self):
        a = self._make(8, max_tokens=10)
        b = self._make(1, max_tokens=10)
        a.generate("use a tool")
        b.generate("use a tool")
        a.add_tool_response("scan", {"ok": 1})
        b.add_tool_response("scan", {"ok": 1})
        while a.generate_next_token() is not None:
            pass
        while b.generate_next_token() is not None:
            pass
        self._assert_state_equal(a, b)


class TestMinTokens:
    """GenerationConfig.min_tokens suppresses EOS until the floor is
    reached (HF min_new_tokens semantics) on every decode path, and the
    k-token lookahead stays byte-identical to the serial path."""

    _mk = TestKTokenLookahead._make
    _eq = TestKTokenLookahead._assert_state_equal

    def _eos_probe(self, lookahead=1, max_tokens=12):
        """Find a token the model naturally emits early, to declare as
        EOS (same trick as TestKTokenLookahead)."""
        probe = self._mk(lookahead, max_tokens=max_tokens)
        probe.generate("ola")
        ids = probe._generated_ids
        assert len(ids) >= 5
        pos = next(j for j in range(2, 7) if ids[j] not in ids[:j])
        return ids, pos

    @staticmethod
    def _tok_with_eos(eid):
        t = ByteTokenizer(512)
        t.eos_id = eid
        return t

    def test_floor_pushes_past_natural_eos(self):
        ids, pos = self._eos_probe()
        tok = lambda: self._tok_with_eos(ids[pos])  # noqa: E731
        # Without the floor, generation stops at the natural EOS.
        base = self._mk(1, tok=tok(), max_tokens=16)
        base.generate("ola")
        assert len(base._generated_ids) == pos
        # With the floor, EOS is masked and decode continues.
        for k in (1, 4, 8):
            r = self._mk(k, tok=tok(), max_tokens=16, min_tokens=10)
            r.generate("ola")
            n = len(r._generated_ids)
            assert n >= 10, f"lookahead={k}: {n} < min_tokens"
            eid = ids[pos]
            assert eid not in r._generated_ids[:10]

    def test_chunked_matches_serial_with_floor(self):
        ids, pos = self._eos_probe()
        tok = lambda: self._tok_with_eos(ids[pos])  # noqa: E731
        # Floor boundary lands mid-chunk for k=8 (min_tokens=10).
        a = self._mk(8, tok=tok(), max_tokens=20, min_tokens=10)
        b = self._mk(1, tok=tok(), max_tokens=20, min_tokens=10)
        ta = a.generate("ola")
        tb = b.generate("ola")
        assert ta == tb
        self._eq(a, b)

    def test_floor_at_budget_means_full_budget(self):
        ids, pos = self._eos_probe()
        tok = self._tok_with_eos(ids[pos])
        r = self._mk(4, tok=tok, max_tokens=12, min_tokens=12)
        r.generate("ola")
        assert len(r._generated_ids) == 12

    def test_sampled_path_respects_floor(self):
        ids, pos = self._eos_probe()
        tok = self._tok_with_eos(ids[pos])
        r = self._mk(1, tok=tok, max_tokens=12, min_tokens=8,
                     temperature=0.7, seed=3)
        r.generate("ola")
        assert len(r._generated_ids) >= 8
        assert ids[pos] not in r._generated_ids[:8]


class TestPrefixCacheReuse:
    """Cross-turn prefix caching: prepare_generation rolls the cache
    back to the longest shared token prefix and extends only the delta
    — output and cache state must be byte-identical to a fresh prefill
    (the cortex rebuilds its full prompt every turn; reuse removes the
    ~300 ms full re-prefill per reply)."""

    _mk = TestKTokenLookahead._make
    _eq = TestKTokenLookahead._assert_state_equal

    def _long_prompt(self, tail):
        head = "sistema: voce e um assistente de navegacao. " * 3
        return head + tail

    def test_repeat_prompt_reuses_and_matches_fresh(self):
        a = self._mk(4, max_tokens=8)
        b = self._mk(4, max_tokens=8)
        p = self._long_prompt("o que ha na minha frente?")
        a.generate(p)          # turn 1 fills the cache
        ta = a.generate(p)     # turn 2: near-total prefix reuse
        tb = b.generate(p)
        tb = b.generate(p)
        assert ta == tb
        self._eq(a, b)

    def test_shared_head_different_tail(self):
        a = self._mk(4, max_tokens=8)
        b = self._mk(4, max_tokens=8)
        a.generate(self._long_prompt("primeira pergunta?"))
        b.generate(self._long_prompt("primeira pergunta?"))
        # Second turn shares only the system head with turn 1.
        p2 = self._long_prompt("ha obstaculos a esquerda?")
        fresh = self._mk(4, max_tokens=8)
        ta = a.generate(p2)
        tb = b.generate(p2)
        tf = fresh.generate(p2)
        assert ta == tb == tf
        self._eq(a, b)

    def test_short_prefix_falls_back_to_prefill(self):
        r = self._mk(4, max_tokens=6)
        r.generate("oi")
        fresh = self._mk(4, max_tokens=6)
        t = r.generate("tchau entao amigo")   # tiny LCP -> fresh path
        tf = fresh.generate("tchau entao amigo")
        assert t == tf

    def test_reuse_then_conversation_continues(self):
        a = self._mk(4, max_tokens=8)
        b = self._mk(4, max_tokens=8)
        p = self._long_prompt("como esta o caminho?")
        a.generate(p)
        a.generate(p)          # reuse path
        b.generate(p)
        b.generate(p)
        ca = a.chat("e agora?")
        cb = b.chat("e agora?")
        assert ca == cb
        self._eq(a, b)
