"""Streaming LLM runner: the conversational session API.

Parity target: ``tk_llm_runner_t`` (reference: src/ai_models/
tk_model_runner.h:38-225) — a stateful session over a preloaded model:
``prepare_generation`` (prompt prefill + optional tool grammar),
``generate_next_token`` (streaming sampling), ``add_tool_response``
(re-inject tool output), ``reset`` (clear context) — plus the Rust
ToolManager's prompt construction from tool definitions
(src/ai_models/src/tool_manager.rs:21-30).

TPU design: the device holds params + KV cache; prefill runs at bucketed
lengths so one compiled program serves each bucket; the host loop only
samples (one int32 device->host per token) and applies the grammar mask.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.llm import sampling
from trackiellm_tpu.llm.grammar import JsonGrammar, ToolCallGrammar
from trackiellm_tpu.llm.tokenizer import ByteTokenizer, Tokenizer
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError
from trackiellm_tpu.utils.logging import get_logger

log = get_logger("llm.runner")

PREFILL_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)
EXTEND_BUCKETS = (16, 64, 256, 1024)
ATTN_BUCKETS = (256, 512, 1024, 2048, 4096)


@dataclasses.dataclass
class GenerationConfig:
    """Sampling knobs (defaults mirror tk_cortex_main.c:911-916)."""

    max_tokens: int = 512
    temperature: float = 0.7
    top_k: int = 40
    top_p: float = 0.95
    # llama.cpp min-p filter: drop tokens with prob < min_p * max_prob
    # (pre-temperature, llama.cpp's default chain position). 0 = off.
    min_p: float = 0.0
    repetition_penalty: float = 1.1
    repeat_window: int = 64
    seed: int = 0
    stop_strings: tuple = ()
    # Greedy unconstrained decode runs as k-token device chunks with
    # one host fetch per chunk (llm_model.decode_chunk_greedy): the
    # non-pipelining relay fetch is paid once per k tokens instead of
    # per token. Output is byte-identical to the serial path — EOS/
    # stop-string/budget events inside a chunk roll the cache back
    # (rows past ``length`` are stale-masked). 1 = one-step lookahead.
    # Measured on the chip (tools/measure_runner_decode.py, 7B Q4):
    # 33.6 tok/s at k=1 -> 100.8 at k=4, 97.6 at k=8, 91.1 at k=16.
    lookahead: int = 4
    # Prompt-lookup speculative decoding (llm/speculative.py):
    # unconstrained generations verify n-gram proposals in one
    # extend() pass. Greedy (temperature <= 0): emitted text is
    # EXACTLY the plain greedy sequence. Sampled (temperature > 0):
    # rejection-sampling verification preserves the production
    # sampler's distribution exactly (sampling.spec_verify_sampled —
    # the Leviathan scheme with point-mass drafts), so the cortex's
    # temperature-0.7 requests accelerate too.
    # ``"auto"`` self-gates: a rolling acceptance window disables
    # speculation when it falls below ``spec_min_acceptance`` (the
    # measured break-even — a verify pass costs ~1 extend vs the
    # decode step it replaces) and re-probes every
    # ``spec_probe_interval`` emitted tokens, so the worst case
    # converges to the plain loop within a few passes. DEFAULT "auto"
    # (round 5): measured on-chip at the cortex's temperature 0.7 on
    # memorized-corpus replay, auto 51.6 tok/s vs plain 22.3 at
    # acceptance 0.483 (tools/measure_spec_acceptance.py run_sampled);
    # greedy workloads keep the k-lookahead fast path during cooldowns.
    speculative: Any = "auto"  # False | True | "auto"
    spec_max_propose: int = 7
    spec_ngram: int = 3
    # Minimum n-gram match length before a proposal fires. 0 = auto by
    # tokenizer granularity: byte-level tokenizers need longer matches
    # (a 3-BYTE match is weak evidence — the round-3 measured 0.22
    # acceptance came from byte-level branching at shared prefixes),
    # piece/BPE tokenizers accept 1. When auto raises min above
    # spec_ngram, max rises with it (byte-level: 8-gram down to 3).
    spec_min_ngram: int = 0
    spec_min_acceptance: float = 0.125
    spec_probe_interval: int = 64
    # Suppress EOS until at least this many tokens have been emitted
    # (HF ``min_new_tokens`` semantics; llama.cpp ``--ignore-eos`` is
    # the max_tokens-sized special case). The EOS logit is masked to
    # -inf so sampling/argmax picks the runner-up — on the k-token
    # lookahead path the mask runs inside the device chunk program
    # (models/llm.py decode_chunk_greedy suppress_until).
    min_tokens: int = 0


@dataclasses.dataclass
class ToolDefinition:
    """A callable tool advertised to the model (parity: Rust
    ToolDefinition, src/ai_models/src/tool_manager.rs)."""

    name: str
    description: str
    parameters: Dict[str, str]  # arg name -> description
    # Optional JSON Schema for the arguments object: when set, the
    # tool-call grammar forces arguments that CONFORM to it (typed tool
    # calls — llama.cpp json_schema_to_grammar parity; see
    # trackiellm_tpu/llm/schema.py), not just any JSON object.
    schema: Optional[Dict[str, Any]] = None

    def render(self) -> str:
        args = ", ".join(f"{k}: {v}" for k, v in self.parameters.items())
        return f"- {self.name}({args}): {self.description}"


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise TrackieError(
        ErrorCode.CONTEXT_OVERFLOW,
        f"sequence of {n} tokens exceeds the largest bucket {buckets[-1]}",
    )


class LLMRunner:
    """Stateful conversational session over a parameter pytree."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: llm_model.LLMConfig,
        tokenizer: Optional[Tokenizer] = None,
        gen_config: Optional[GenerationConfig] = None,
        cache_dtype=jnp.bfloat16,
        model=None,
    ):
        """``model``: the model module driving this session — any
        module exposing the llm.py forward surface (prefill /
        decode_step / extend / decode_chunk_greedy / KVCache). Defaults
        to models.llm; pass models.mla for DeepSeek-V2 checkpoints
        (convert.deepseek_v2_from_hf), whose MLACache plays the KVCache
        role."""
        self.params = params
        self.cfg = cfg
        self._m = model or llm_model
        self.tokenizer = tokenizer or ByteTokenizer(
            n_special_pad_to=cfg.vocab_size)
        self.gen = gen_config or GenerationConfig()
        self._cache_dtype = cache_dtype
        self.cache = self._m.KVCache.create(cfg, dtype=cache_dtype)
        self._key = jax.random.PRNGKey(self.gen.seed)
        self._grammar: Optional[ToolCallGrammar] = None
        self._next_logits: Optional[jnp.ndarray] = None
        self._primed_ids: Optional[List[int]] = None
        self._host_len = 0
        self._chat_turns: List[tuple] = []
        self._generated_ids: List[int] = []
        self._generated_text: str = ""
        self._n_emitted = 0
        self._done = False
        # Every token id committed to the KV cache, in order (mirror of
        # the cache text; len == _host_len). Speculative n-gram lookup
        # searches this.
        self._committed_ids: List[int] = []
        # Buffered future tokens from a speculative verify pass.
        self._pending_spec: List[int] = []
        self._spec_index = 0
        self._spec_offset = 0
        self._spec_accepted = 0
        # Honest speculative accounting (tools/measure_spec_acceptance):
        # per-session totals of verify passes, proposed and accepted
        # tokens.
        self.spec_stats = {"passes": 0, "proposed": 0, "accepted": 0}
        # Adaptive gating ("auto" mode): rolling per-pass acceptance
        # fractions + a cooldown counter of emitted tokens to skip
        # speculation for after the window drops below break-even.
        # _spec_misses counts consecutive no-proposal tokens — each
        # costs a SERIAL decode step, so a dry context must also
        # trigger the cooldown (onto the lookahead chunk path).
        self._spec_recent: List[float] = []
        self._spec_cooldown = 0
        self._spec_misses = 0
        # n-gram granularity: byte-level tokenizers need longer
        # matches than piece/BPE tokenizers (see GenerationConfig).
        byte_level = isinstance(self.tokenizer, ByteTokenizer)
        self._spec_min_ngram = self.gen.spec_min_ngram or (
            3 if byte_level else 1)
        self._spec_max_ngram = max(self.gen.spec_ngram,
                                   8 if byte_level
                                   and not self.gen.spec_min_ngram
                                   else self.gen.spec_ngram)
        # k-token lookahead chunk state (greedy unconstrained path):
        # fetched-but-unemitted tokens, and the dispatched-ahead chunk.
        self._la_buf: List[int] = []
        self._la_idx = 0
        self._la_offset = 0
        self._la_next: Optional[tuple] = None
        # Cap on per-dispatch prompt tokens while priming mid-utterance
        # (prime() docstring has the rationale).
        self._prime_max_dispatch = 256
        # min_tokens EOS-ban masks, built lazily (host bool vector for
        # the sampled path, device copy for the greedy paths).
        self._eos_ban_np: Optional[np.ndarray] = None
        self._eos_ban_jnp: Optional[jnp.ndarray] = None
        # Incremental UTF-8 assembly for byte-level tokenizers: a
        # multibyte character split across byte tokens must not decode
        # each byte separately (that yields U+FFFD replacements;
        # pieces must concatenate to exactly tokenizer.decode(ids)).
        self._utf8 = None

    def _piece(self, tid: int) -> str:
        """One token's text piece. Byte-level tokenizers buffer through
        an incremental UTF-8 decoder; others decode directly."""
        if hasattr(self.tokenizer, "token_bytes"):
            if self._utf8 is None:
                import codecs

                self._utf8 = codecs.getincrementaldecoder(
                    "utf-8")("replace")
            return self._utf8.decode(self.tokenizer.token_bytes(tid))
        return self.tokenizer.decode_token(tid)

    def _flush_text(self) -> str:
        """Flush the UTF-8 assembler at end of generation (a trailing
        incomplete multibyte becomes U+FFFD, matching
        ``tokenizer.decode``'s errors='replace'). Returns the tail
        piece, already appended to the generated text."""
        if self._utf8 is None:
            return ""
        tail = self._utf8.decode(b"", True)
        if tail:
            self._generated_text += tail
        return tail

    def _eos_ban_host(self) -> np.ndarray:
        if self._eos_ban_np is None:
            ban = np.ones(self.cfg.vocab_size, bool)
            ban[self.tokenizer.eos_id] = False
            self._eos_ban_np = ban
        return self._eos_ban_np

    def _eos_ban_dev(self) -> jnp.ndarray:
        if self._eos_ban_jnp is None:
            self._eos_ban_jnp = jnp.asarray(self._eos_ban_host())
        return self._eos_ban_jnp

    # ------------------------------------------------------------------
    # Session API (tk_llm_runner parity)
    # ------------------------------------------------------------------

    def count_tokens(self, text: str) -> int:
        """Exact token count under this runner's tokenizer (the cortex
        uses it to budget the context string precisely instead of the
        chars/4 heuristic)."""
        return len(self.tokenizer.encode(text))

    @property
    def max_prompt_tokens(self) -> int:
        """Largest prompt that still leaves room to generate. With
        chunked prefill this is the full window minus the generation
        budget (not one prefill bucket)."""
        return max(self.cfg.max_seq - self.gen.max_tokens - 1, 16)

    def build_prompt(self, system: str, context: str, user: str,
                     tools: Sequence[ToolDefinition] = ()) -> str:
        """Instruction-format prompt with optional tool list (parity:
        ToolManager::generate_prompt)."""
        parts = [system]
        if tools:
            parts.append(
                "You may call one tool by replying ONLY with JSON of the "
                'form {"tool_call":{"name":"<tool>","arguments":{...}}}.\n'
                "Available tools:\n" + "\n".join(t.render() for t in tools)
            )
        if context:
            parts.append(f"Context:\n{context}")
        # Hoisted join: a backslash escape inside an f-string expression
        # is a SyntaxError before Python 3.12.
        body = "\n\n".join(parts)
        return f"[INST] {body}\n\nUser: {user} [/INST]"

    def prepare_generation(self, prompt: str,
                           tools: Sequence[ToolDefinition] = (),
                           force_tool_call: bool = False,
                           response_schema: Optional[Dict[str, Any]] = None,
                           json_mode: bool = False) -> None:
        """Tokenize + prefill the prompt; arm the tool grammar if asked.

        Prompts larger than the biggest prefill bucket run as
        **incremental chunked prefill**: the first bucket goes through
        prefill(), the remainder through extend() chunks with
        attn-bucketed cross-chunk attention — identical logits to a
        single oversized prefill, no content loss. Only a prompt that
        cannot fit the model window at all (max_seq minus the generation
        budget — the reference's hard 4096 contract,
        tk_cortex_main.c:1334) is middle-cut, with a warning.
        """
        self._drop_pending_lookahead()
        ids = self.tokenizer.encode(prompt, add_bos=True)
        hard_limit = max(self.cfg.max_seq - self.gen.max_tokens - 1, 16)
        if len(ids) > hard_limit:
            # True window overflow: keep the system/instruction head and
            # the (most important) query tail.
            head = hard_limit // 4
            tail = hard_limit - head
            log.warning("prompt of %d tokens exceeds the %d-token window "
                        "budget; truncated", len(ids), hard_limit)
            ids = ids[:head] + ids[-tail:]

        primed = self._primed_ids
        self._primed_ids = None
        if (primed and len(primed) <= len(ids)
                and ids[: len(primed)] == primed):
            # The primed cache already holds this prompt's prefix (the
            # streaming-ASR stable transcript prefilled mid-utterance):
            # only the remainder is processed here.
            rest = ids[len(primed):]
            logits = self._next_logits
            pos = 0
            chunk_cap = EXTEND_BUCKETS[-1]
            while pos < len(rest):
                chunk = rest[pos: pos + chunk_cap]
                logits = self._extend_ids(chunk)
                pos += len(chunk)
            self._next_logits = logits
        else:
            if primed:
                log.info("primed prefix did not match the final prompt; "
                         "falling back to prefix-cache reuse")
            self._prefill_with_prefix_reuse(ids)
        self._arm_generation_state(tools, force_tool_call,
                                   response_schema, json_mode)

    def _arm_generation_state(self, tools: Sequence[ToolDefinition],
                              force_tool_call: bool,
                              response_schema: Optional[Dict[str, Any]],
                              json_mode: bool) -> None:
        """Reset per-reply state + arm the constrained-decoding grammar
        (shared by prepare_generation and the multimodal path,
        llm/vlm.py)."""
        self._generated_ids = []
        self._generated_text = ""
        self._n_emitted = 0
        self._done = False
        self._utf8 = None
        if force_tool_call:
            if not tools:
                raise TrackieError(ErrorCode.TOOL_CALL_INVALID,
                                   "force_tool_call requires tools")
            if response_schema is not None or json_mode:
                raise TrackieError(
                    ErrorCode.INVALID_ARGUMENT,
                    "force_tool_call and JSON response mode are exclusive")
            self._grammar = ToolCallGrammar(
                [t.name for t in tools],
                {t.name: t.schema for t in tools
                 if t.schema is not None})
        elif response_schema is not None or json_mode:
            # JSON response mode (llama.cpp response_format parity):
            # the reply itself must be valid JSON — conforming to
            # ``response_schema`` when given, else any JSON object.
            self._grammar = JsonGrammar(response_schema)
        else:
            self._grammar = None

    # Minimum shared-prefix length worth rolling back to instead of a
    # fresh bucketed prefill (below this, prefill() is just as cheap).
    PREFIX_REUSE_MIN = 32

    def _prefill_with_prefix_reuse(self, ids) -> None:
        """Prompt ingestion with cross-turn prefix caching: when the new
        prompt shares a long token prefix with what the cache already
        holds (system prompt + stable context + conversation history —
        the cortex rebuilds the full prompt every turn), roll
        ``cache.length`` back to the shared prefix and extend only the
        delta. Rows past ``length`` are stale-masked (the same proven
        rollback contract as the k-token lookahead), so reuse is exact.
        Measured motivation: the production cortex paid a full ~300 ms
        7B prefill per reply for a prompt whose head barely changed
        (tools/measure_app_e2e.py; llm leg 348 of 504 ms)."""
        committed = self._committed_ids
        lcp = 0
        limit = min(len(committed), len(ids))
        while lcp < limit and committed[lcp] == ids[lcp]:
            lcp += 1
        # Keep at least one prompt token to extend: the next-logits for
        # the final position must be recomputed.
        lcp = min(lcp, len(ids) - 1)
        if lcp < self.PREFIX_REUSE_MIN:
            self._ingest_ids(ids)
            return
        self._drop_pending_lookahead()
        self.cache = self.cache._replace(length=jnp.int32(lcp))
        self._host_len = lcp
        del self._committed_ids[lcp:]
        self._pending_spec = []
        rest = ids[lcp:]
        logits = None
        pos = 0
        chunk_cap = EXTEND_BUCKETS[-1]
        while pos < len(rest):
            chunk = rest[pos: pos + chunk_cap]
            logits = self._extend_ids(chunk)
            pos += len(chunk)
        self._next_logits = logits
        log.info("prefix-cache reuse: %d/%d prompt tokens already in "
                 "cache; extended %d", lcp, len(ids), len(rest))

    def _ingest_ids(self, ids, max_dispatch: Optional[int] = None) -> None:
        """Fresh-cache prompt ingestion: bucketed prefill of the head,
        chunked extend of the remainder (shared by prepare_generation
        and prime).

        ``max_dispatch`` caps the size of each device program. The
        final-prompt path wants the biggest buckets (fewest launches);
        ``prime()`` passes a cap so mid-utterance prefill runs as short
        chunks the final ASR pass can interleave with — one 1024-token
        prefill program was measured holding the device through
        end-of-speech and pushing transcript latency past 1 s
        (tools/measure_app_e2e.py run-to-run outliers)."""
        self._drop_pending_lookahead()
        buckets = ([b for b in PREFILL_BUCKETS if b <= self.cfg.max_seq]
                   or [self.cfg.max_seq])
        if max_dispatch is not None:
            buckets = ([b for b in buckets if b <= max_dispatch]
                       or buckets[:1])
        n = len(ids)
        first_n = min(n, buckets[-1])
        bucket = _bucket_for(first_n, buckets)
        padded = np.zeros(bucket, np.int32)
        padded[:first_n] = ids[:first_n]
        # Reuse the allocated KV buffers across turns (resetting length
        # masks any stale entries) — re-creating the cache zero-fills
        # ~1 GB per turn at 7B scale, a measurable chunk of the
        # frame->response latency.
        self.cache = self.cache._replace(length=jnp.int32(0))
        logits, self.cache = self._m.prefill(
            self.params, self.cfg, jnp.asarray(padded), jnp.int32(first_n),
            self.cache)
        self._host_len = first_n  # host mirror of cache.length
        self._committed_ids = [int(i) for i in ids[:first_n]]
        self._pending_spec = []
        pos = first_n
        chunk_cap = EXTEND_BUCKETS[-1]
        if max_dispatch is not None:
            chunk_cap = min(chunk_cap, max_dispatch)
        while pos < n:
            chunk = ids[pos: pos + chunk_cap]
            logits = self._extend_ids(chunk)
            pos += len(chunk)
        self._next_logits = logits

    def prime(self, prompt_prefix: str) -> None:
        """Prefill a prompt PREFIX before the full prompt is known.

        The streaming-ASR integration point (audio/streaming_asr.py):
        as the LocalAgreement stable transcript grows mid-utterance,
        the cortex can prime the runner with the prompt-so-far; the
        following prepare_generation()/generate() whose tokenized
        prompt starts with the primed ids extends ONLY the remainder —
        the bulk of prompt processing happens while the user is still
        speaking. A non-matching final prompt falls back to a full
        re-prefill (correctness never depends on the prime).
        Re-priming with a longer prefix extends incrementally when the
        previous prime is its prefix.

        Dispatches are capped at ``self._prime_max_dispatch`` tokens
        (default 256): priming happens while speech is still flowing —
        short device programs keep the final ASR pass interleavable
        (see _ingest_ids)."""
        ids = self.tokenizer.encode(prompt_prefix, add_bos=True)
        prev = self._primed_ids
        if (prev and len(prev) <= len(ids)
                and ids[: len(prev)] == prev):
            rest = ids[len(prev):]
            pos = 0
            chunk_cap = min(EXTEND_BUCKETS[-1], self._prime_max_dispatch)
            while pos < len(rest):
                chunk = rest[pos: pos + chunk_cap]
                self._next_logits = self._extend_ids(chunk)
                pos += len(chunk)
        else:
            self._ingest_ids(ids, max_dispatch=self._prime_max_dispatch)
        self._primed_ids = list(ids)

    def _attn_bucket(self) -> Optional[int]:
        """Smallest attention bucket covering the live prefix (+1 for the
        token being written). None when the window itself is small."""
        return self._attn_bucket_for(self._host_len + 1)

    def _attn_bucket_for(self, need: int) -> Optional[int]:
        if self.cfg.max_seq <= ATTN_BUCKETS[0]:
            return None
        for b in ATTN_BUCKETS:
            if b >= need and b <= self.cfg.max_seq:
                return b
        return None

    def _extend_ids(self, ids) -> jnp.ndarray:
        """Append token ids to the live cache via one bucketed extend()
        pass (attn-bucketed over the covered prefix); returns the logits
        at the last appended token and advances the host length."""
        self._drop_pending_spec()  # never extend over buffered tokens
        self._drop_pending_lookahead()
        bucket = _bucket_for(len(ids), EXTEND_BUCKETS)
        padded = np.zeros(bucket, np.int32)
        padded[: len(ids)] = ids
        logits, self.cache = self._m.extend(
            self.params, self.cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), self.cache,
            attn_len=self._attn_bucket_for(self._host_len + bucket))
        self._host_len += len(ids)
        self._committed_ids.extend(int(i) for i in ids)
        return logits

    def generate_next_token(self) -> Optional[str]:
        """Sample and return the next token's text, or None when finished
        (EOS, grammar completion, stop string, or max_tokens)."""
        if self._done or (self._next_logits is None
                          and not self._pending_spec):
            return None
        # With a lookahead chunk buffered, the cache is tentatively
        # ahead of what was emitted — bound the window check by the
        # EMITTED position so the tail tokens still stream out.
        eff_len = (self._la_offset + self._la_idx if self._la_buf
                   else self._host_len)
        if (self._n_emitted >= self.gen.max_tokens
                or eff_len >= self.cfg.max_seq - 1):
            self._done = True
            self._drop_pending_spec()
            self._drop_pending_lookahead()
            return None
        if self._pending_spec:
            return self._emit_spec_token()
        if self._la_buf:
            # Auto-speculation cooldown counts EMITTED tokens: buffered
            # chunk tokens bypass the fast-path branch below, so they
            # decrement here (exactly once per token — the fast path
            # only runs when this buffer is empty).
            if self.gen.speculative == "auto" and self._spec_cooldown > 0:
                self._spec_cooldown -= 1
            return self._greedy_chunk_step()

        # Budget-forced closure: if a constrained generation is about to
        # exhaust its token budget, emit the grammar's minimal valid
        # completion instead of truncating into invalid JSON (the
        # reference's GBNF sampling has no recovery for this).
        if self._grammar is not None and not self._grammar.done:
            closure = self._grammar.closure()
            closure_ids = self.tokenizer.encode(closure)
            remaining = self.gen.max_tokens - self._n_emitted
            if closure and len(closure_ids) >= remaining - 1:
                assert self._grammar.feed_text(closure)
                # Route through the incremental UTF-8 assembler so a
                # pending partial multibyte (buffered from earlier byte
                # tokens) surfaces as U+FFFD *before* the closure, in
                # stream order — bypassing it would make the pending
                # bytes pop out at final flush, AFTER the closing
                # braces (invalid JSON trailing data).
                if self._utf8 is not None:
                    piece = self._utf8.decode(closure.encode("utf-8"))
                else:
                    piece = closure
                self._generated_text += piece
                self._generated_ids.extend(closure_ids)
                self._n_emitted = self.gen.max_tokens
                self._extend_ids(closure_ids)
                self._done = True
                return piece

        spec = self.gen.speculative
        # A token that CANNOT speculate (cooldown, or min_tokens not
        # yet reached — the arming condition below requires it) must
        # ride the k-token lookahead FAST path, not the serial loop:
        # the worst case of auto-speculation is the production chunk
        # path, with a probe pass every spec_probe_interval tokens.
        # (Round-5 regression fix: min_tokens-floored greedy runs —
        # the app-e2e harness shape — decoded SERIALLY under the new
        # auto default, 418 vs 236 ms reply p50.)
        spec_eligible = (self._n_emitted >= self.gen.min_tokens
                        and self._spec_cooldown <= 0)
        if (self._grammar is None and self.gen.temperature <= 0
                and (not spec
                     or (spec == "auto" and not spec_eligible))):
            if spec == "auto" and self._spec_cooldown > 0:
                self._spec_cooldown -= 1
            if self.gen.lookahead > 1:
                return self._greedy_chunk_step()
            return self._greedy_step_pipelined()
        # Entering the sampled/speculative flow: discard any
        # pre-dispatched lookahead chunk — its (cache, offset) snapshot
        # goes stale the moment this flow advances the cache, and a
        # later cooldown re-entering _greedy_chunk_step must not
        # consume it.
        self._la_next = None

        mask = None
        if self._grammar is not None:
            mask = np.array(self._grammar.token_mask(self.tokenizer), bool)
        if self._n_emitted < self.gen.min_tokens:
            ban = self._eos_ban_host()
            mask = ban if mask is None else (mask & ban)
        if mask is not None:
            mask = jnp.asarray(mask)

        if self.gen.temperature <= 0:
            token = sampling.greedy(self._next_logits, mask)
        else:
            self._key, sub = jax.random.split(self._key)
            recent = np.full(self.gen.repeat_window, -1, np.int32)
            tail = self._generated_ids[-self.gen.repeat_window:]
            recent[: len(tail)] = tail
            token = sampling.sample(
                self._next_logits, sub,
                jnp.float32(self.gen.temperature),
                top_k=self.gen.top_k, top_p=self.gen.top_p,
                min_p=self.gen.min_p,
                mask=mask, recent_tokens=jnp.asarray(recent),
                repetition_penalty=self.gen.repetition_penalty,
            )
        tid = int(token)

        if tid == self.tokenizer.eos_id:
            self._done = True
            return None

        piece = self._piece(tid)
        if self._grammar is not None:
            self._grammar.feed_text(piece)
            if self._grammar.done:
                self._done = True

        self._generated_ids.append(tid)
        self._generated_text += piece
        self._n_emitted += 1

        for stop in self.gen.stop_strings:
            if stop and stop in self._generated_text:
                # Mark done but FALL THROUGH to the commit below: the
                # final sampled token must still enter the KV cache, or
                # a following chat()/add_tool_response() would extend
                # from a cache whose history is one token short of what
                # was generated. (The visible text is still truncated
                # at the stop string — that is display-level.)
                self._done = True
                self._generated_text = self._generated_text.split(stop)[0]
                break

        if not self._done:
            # Speculation works at ANY temperature: greedy passes use
            # exact argmax-prefix acceptance; sampled passes use
            # rejection-sampling verification (distribution-preserving
            # — sampling.spec_verify_sampled), so the production
            # cortex's temperature-0.7 requests benefit too.
            if (self.gen.speculative == "auto"
                    and self.gen.temperature > 0
                    and self._spec_cooldown > 0):
                # Sampled tokens never ride the greedy fast path, so
                # the acceptance-window cooldown counts down here.
                self._spec_cooldown -= 1
            if (self._spec_allowed() and self._grammar is None
                    and self._n_emitted >= self.gen.min_tokens):
                if self._start_speculative_pass(tid):
                    self._spec_misses = 0
                    return piece
                if (self.gen.speculative == "auto"
                        and self.gen.temperature <= 0):
                    # No proposal fired: this token pays a serial
                    # decode step. A dry streak means the context has
                    # nothing to look up — get back on the chunk path.
                    # GREEDY ONLY: at temperature > 0 there is no
                    # lookahead chunk path to return to, misses cost
                    # nothing (host-side n-gram scan), and a cooldown
                    # would just disable the feature — only the
                    # acceptance window gates sampled auto mode.
                    self._spec_misses += 1
                    if self._spec_misses >= 2:
                        self._spec_misses = 0
                        self._spec_cooldown = self.gen.spec_probe_interval
            self._next_logits, self.cache = self._m.decode_step(
                self.params, self.cfg, jnp.int32(tid), self.cache,
                attn_len=self._attn_bucket())
            self._host_len += 1
            self._committed_ids.append(tid)
        else:
            # Commit the final token to the cache so the conversation can
            # continue (e.g. tool response after a tool call).
            _, self.cache = self._m.decode_step(
                self.params, self.cfg, jnp.int32(tid), self.cache,
                attn_len=self._attn_bucket())
            self._host_len += 1
            self._committed_ids.append(tid)
            self._next_logits = None
        return piece

    def _greedy_step_pipelined(self) -> Optional[str]:
        """Greedy unconstrained token with a one-step lookahead: the
        next decode_step is dispatched with the DEVICE token before the
        id is fetched, so the (non-pipelining, 15-30 ms) value fetch
        overlaps the next step's compute instead of serializing with it
        — the interactive-runner analogue of the batch server's chunk
        path (measured 26 -> ~2-3x tok/s on the relay; PERF_NOTES.md).

        Terminal reconciliation keeps state byte-identical to the
        serial path: on EOS the lookahead cache is DISCARDED (the
        serial path never commits EOS; the speculatively-written KV row
        sits past ``cache.length``, invisible to masked attention and
        overwritten by the next real commit). Stop-string and
        max-token turns commit the final token — exactly what the
        lookahead already did."""
        mask = (self._eos_ban_dev()
                if self._n_emitted < self.gen.min_tokens else None)
        token_dev = sampling.greedy(self._next_logits, mask)
        nxt_logits, nxt_cache = self._m.decode_step(
            self.params, self.cfg, token_dev.astype(jnp.int32),
            self.cache, attn_len=self._attn_bucket())
        tid = int(token_dev)  # fetch overlaps the dispatched step
        if tid == self.tokenizer.eos_id:
            self._done = True
            return None  # lookahead discarded; cache state unchanged
        piece = self._piece(tid)
        self._generated_ids.append(tid)
        self._generated_text += piece
        self._n_emitted += 1
        self.cache = nxt_cache
        self._host_len += 1
        self._committed_ids.append(tid)
        self._next_logits = nxt_logits
        for stop in self.gen.stop_strings:
            if stop and stop in self._generated_text:
                self._done = True
                self._generated_text = self._generated_text.split(stop)[0]
                self._next_logits = None
                break
        return piece

    # ------------------------------------------------------------------
    # k-token lookahead (greedy, unconstrained only)
    # ------------------------------------------------------------------

    def _dispatch_chunk(self, logits, cache, offset: int,
                        emitted_before: int) -> None:
        """Dispatch a k-step greedy chunk from (logits, cache) at host
        position ``offset`` without fetching its result.
        ``emitted_before`` = tokens already emitted (or committed ahead
        of this chunk) this generation — it anchors the min_tokens EOS
        suppression boundary inside the chunk."""
        k = self.gen.lookahead
        # ALWAYS pass eos_id (suppress_until=0 is a no-op mask): eos_id
        # None vs int forks the compiled program, and the fork was a
        # measured restart-to-ready cost — the app (min_tokens>0) and a
        # plain restart (min_tokens=0) each paid a full cold compile of
        # their own chunk variant. suppress_until is a traced scalar,
        # so ONE program serves every min_tokens boundary including 0.
        sup = (max(0, min(k, self.gen.min_tokens - emitted_before))
               if self.gen.min_tokens > 0 else 0)
        toks, lg, new_cache = self._m.decode_chunk_greedy(
            self.params, self.cfg, logits, cache, k,
            attn_len=self._attn_bucket_for(offset + k),
            eos_id=self.tokenizer.eos_id,
            suppress_until=jnp.int32(sup))
        self._la_next = (toks, lg, new_cache, offset)

    def _greedy_chunk_step(self) -> Optional[str]:
        """Emit one token from the k-token lookahead pipeline.

        VERDICT round-2 item 2: the serial greedy path pays the
        non-pipelining 15-30 ms relay fetch per token (~35 tok/s vs the
        94 tok/s kernel ceiling). Here k greedy steps run as ONE device
        program; the k token ids come back in ONE fetch, and the next
        chunk is dispatched BEFORE that fetch so the fetch overlaps its
        compute. Chunks are committed tentatively (cache advanced k);
        terminal events reconcile by rolling ``cache.length`` back —
        the rows past length are stale-masked, the same proven pattern
        as the EOS-discard one-step lookahead below. Output text and
        final cache state are byte-identical to the serial path
        (tests/test_llm_runner.py pins this)."""
        k = self.gen.lookahead
        if not self._la_buf:
            if self._la_next is None:
                if self._host_len + k > self.cfg.max_seq - 1:
                    # Window tail: not enough room for a full chunk.
                    return self._greedy_step_pipelined()
                self._dispatch_chunk(self._next_logits, self.cache,
                                     self._host_len, self._n_emitted)
            toks_dev, logits_dev, cache_dev, offset = self._la_next
            self._la_next = None
            # Pre-dispatch the successor so the fetch below overlaps
            # its compute (fetches do not pipeline; dispatches do).
            # The in-flight chunk's k tokens precede it; if a terminal
            # event inside that chunk invalidates the count, the
            # successor is discarded by the rollback anyway.
            if offset + 2 * k <= self.cfg.max_seq - 1:
                self._dispatch_chunk(logits_dev, cache_dev, offset + k,
                                     self._n_emitted + k)
            toks = [int(t) for t in np.asarray(toks_dev)]
            # Tentative commit of the whole chunk.
            self.cache = cache_dev
            self._next_logits = logits_dev
            self._host_len = offset + k
            self._committed_ids.extend(toks)
            self._la_buf = toks
            self._la_idx = 0
            self._la_offset = offset

        idx = self._la_idx
        tid = self._la_buf[idx]
        self._la_idx += 1
        if tid == self.tokenizer.eos_id:
            # Serial path never commits EOS.
            self._rollback_lookahead(self._la_offset + idx)
            self._done = True
            return None
        piece = self._piece(tid)
        self._generated_ids.append(tid)
        self._generated_text += piece
        self._n_emitted += 1
        for stop in self.gen.stop_strings:
            if stop and stop in self._generated_text:
                # Serial path commits the final token (see the
                # stop-string comment in generate_next_token).
                self._done = True
                self._generated_text = self._generated_text.split(stop)[0]
                self._rollback_lookahead(self._la_offset + idx + 1)
                break
        if not self._done and self._la_idx >= len(self._la_buf):
            self._la_buf = []
            self._la_idx = 0
        return piece

    def _rollback_lookahead(self, new_len: int) -> None:
        """Roll the tentatively-committed chunk back to ``new_len``
        tokens and discard any dispatched-ahead chunk."""
        self.cache = self.cache._replace(length=jnp.int32(new_len))
        self._host_len = new_len
        del self._committed_ids[new_len:]
        self._la_buf = []
        self._la_idx = 0
        self._la_next = None
        self._next_logits = None

    def _drop_pending_lookahead(self) -> None:
        """Reconcile lookahead state to cover exactly the emitted
        tokens (generation end / external stop / cache mutation)."""
        if self._la_buf and self._la_idx < len(self._la_buf):
            self._rollback_lookahead(self._la_offset + self._la_idx)
        else:
            self._la_buf = []
            self._la_idx = 0
            self._la_next = None

    # ------------------------------------------------------------------
    # Prompt-lookup speculative decoding (greedy, unconstrained only)
    # ------------------------------------------------------------------

    def _spec_allowed(self) -> bool:
        """Speculation eligibility. In "auto" mode a cooldown (counted
        down by the fast-path branch in generate_next_token, which owns
        cooldown tokens) suppresses speculation until the next probe."""
        if not self.gen.speculative:
            return False
        if self.gen.speculative != "auto":
            return True
        return self._spec_cooldown <= 0

    def _start_speculative_pass(self, tid: int) -> bool:
        """After emitting ``tid``, try to verify an n-gram proposal in
        ONE extend() pass instead of a decode_step (llm/speculative.py
        has the algorithm; this is the streaming-runner adaptation).
        Buffers the resulting future tokens — ``tid`` plus all accepted
        proposals land in the cache now; buffered tokens are then
        emitted one per generate_next_token() call with plain-loop
        semantics (EOS / stop strings / max_tokens behave identically).
        Returns False when no proposal fired (caller decode_steps)."""
        from trackiellm_tpu.llm.speculative import propose_ngram

        proposal = propose_ngram(self._committed_ids + [tid],
                                 self.gen.spec_max_propose,
                                 max_ngram=self._spec_max_ngram,
                                 min_ngram=self._spec_min_ngram)
        if not proposal:
            return False
        bucket = EXTEND_BUCKETS[0]
        proposal = proposal[: bucket - 1]
        if self._host_len + bucket >= self.cfg.max_seq:
            return False
        chunk = [tid] + proposal
        padded = np.zeros(bucket, np.int32)
        padded[: len(chunk)] = chunk
        offset = self._host_len
        logits, cache = self._m.extend(
            self.params, self.cfg, jnp.asarray(padded),
            jnp.int32(len(chunk)), self.cache,
            attn_len=self._attn_bucket_for(offset + bucket),
            all_logits=True)
        if self.gen.temperature <= 0:
            greedy = np.asarray(
                jnp.argmax(logits[: len(chunk)], axis=-1))
            accepted = 0
            while (accepted < len(proposal)
                   and int(greedy[accepted]) == proposal[accepted]):
                accepted += 1
            pending = [int(g) for g in greedy[: accepted + 1]]
        else:
            # Rejection-sampling verification (distribution-preserving
            # at any temperature — sampling.spec_verify_sampled). The
            # repetition-penalty window at position i is the emitted
            # history (which already includes ``tid``) plus the
            # accepted proposals before i — deterministic per position
            # because accepted tokens ARE the proposal prefix.
            kpad = bucket - 1
            prop = np.zeros(kpad, np.int32)
            prop[: len(proposal)] = proposal
            rec = np.full((bucket, self.gen.repeat_window), -1,
                          np.int32)
            hist = self._generated_ids
            for i in range(len(proposal) + 1):
                t = (hist + proposal[:i])[-self.gen.repeat_window:]
                rec[i, : len(t)] = t
            self._key, sub = jax.random.split(self._key)
            verdict = np.asarray(sampling.spec_verify_sampled(
                logits, jnp.asarray(prop), jnp.int32(len(proposal)),
                sub, jnp.float32(self.gen.temperature),
                jnp.asarray(rec), top_k=self.gen.top_k,
                top_p=self.gen.top_p, min_p=self.gen.min_p,
                repetition_penalty=self.gen.repetition_penalty))
            accepted = int(verdict[0])  # ONE stacked fetch per pass
            pending = proposal[:accepted] + [int(verdict[1])]
        self.spec_stats["passes"] += 1
        self.spec_stats["proposed"] += len(proposal)
        self.spec_stats["accepted"] += accepted
        if self.gen.speculative == "auto":
            self._spec_recent.append(accepted / len(proposal))
            if len(self._spec_recent) > 8:
                self._spec_recent.pop(0)
            if (len(self._spec_recent) >= 4
                    and (sum(self._spec_recent) / len(self._spec_recent)
                         < self.gen.spec_min_acceptance)):
                self._spec_cooldown = self.gen.spec_probe_interval
                self._spec_recent = self._spec_recent[-2:]
        # Cache now holds tid + the accepted proposals; the rejected
        # tail past `length` is stale-masked (models/llm.py contract).
        self.cache = cache._replace(
            length=jnp.int32(offset + 1 + accepted))
        self._host_len = offset + 1 + accepted
        self._committed_ids.extend(chunk[: 1 + accepted])
        self._spec_offset = offset
        self._spec_accepted = accepted
        self._spec_index = 0
        self._pending_spec = pending
        self._next_logits = None
        return True

    def _emit_spec_token(self) -> Optional[str]:
        """Pop one buffered speculative token with the exact semantics
        of the plain sample-then-commit path."""
        if (self.gen.speculative == "auto"
                and self.gen.temperature > 0
                and self._spec_cooldown > 0):
            # Sampled-auto cooldown counts EMITTED tokens; buffered
            # tokens bypass the main-body decrement.
            self._spec_cooldown -= 1
        idx = self._spec_index
        tid = self._pending_spec[idx]
        self._spec_index += 1
        last = self._spec_index >= len(self._pending_spec)
        in_cache = idx < self._spec_accepted  # bonus token is not

        if tid == self.tokenizer.eos_id:
            # Plain path never commits EOS: roll back to the tokens
            # emitted before it.
            new_len = self._spec_offset + 1 + idx
            self.cache = self.cache._replace(length=jnp.int32(new_len))
            self._host_len = new_len
            del self._committed_ids[new_len:]
            self._pending_spec = []
            self._spec_index = 0
            self._next_logits = None
            self._done = True
            return None

        piece = self._piece(tid)
        self._generated_ids.append(tid)
        self._generated_text += piece
        self._n_emitted += 1

        for stop in self.gen.stop_strings:
            if stop and stop in self._generated_text:
                self._done = True
                self._generated_text = self._generated_text.split(stop)[0]
                break

        if self._done:
            # Commit this token, drop everything after it (plain path
            # commits the final token; see the stop-string comment).
            if in_cache:
                new_len = self._spec_offset + 2 + idx
                self.cache = self.cache._replace(length=jnp.int32(new_len))
                self._host_len = new_len
                del self._committed_ids[new_len:]
            else:  # bonus token: commit via decode_step
                _, self.cache = self._m.decode_step(
                    self.params, self.cfg, jnp.int32(tid), self.cache,
                    attn_len=self._attn_bucket())
                self._host_len += 1
                self._committed_ids.append(tid)
            self._pending_spec = []
            self._spec_index = 0
            self._next_logits = None
        elif last:
            # Bonus token: not in the cache yet — either chain another
            # speculative pass from it or decode_step it (both commit).
            # The chain honors the auto-mode acceptance cooldown:
            # without the _spec_allowed() gate, rejecting contexts
            # would keep paying a full verify extend per token because
            # every pass ends in a bonus token that re-chains (review
            # round-5 finding).
            self._pending_spec = []
            self._spec_index = 0
            if not (self._spec_allowed()
                    and self._start_speculative_pass(tid)):
                self._next_logits, self.cache = self._m.decode_step(
                    self.params, self.cfg, jnp.int32(tid), self.cache,
                    attn_len=self._attn_bucket())
                self._host_len += 1
                self._committed_ids.append(tid)
        return piece

    def _drop_pending_spec(self) -> None:
        """Roll the cache back to cover exactly the emitted tokens when
        generation ends with speculative tokens still buffered."""
        if not self._pending_spec:
            return
        new_len = self._spec_offset + 1 + self._spec_index
        self.cache = self.cache._replace(length=jnp.int32(new_len))
        self._host_len = new_len
        del self._committed_ids[new_len:]
        self._pending_spec = []
        self._spec_index = 0
        self._next_logits = None

    def generate(self, prompt: str, tools: Sequence[ToolDefinition] = (),
                 force_tool_call: bool = False,
                 on_token: Optional[Callable[[str], None]] = None,
                 should_stop: Optional[Callable[[], bool]] = None,
                 response_schema: Optional[Dict[str, Any]] = None,
                 json_mode: bool = False) -> str:
        """Run a full generation, streaming pieces to ``on_token``.
        ``should_stop`` is polled between tokens — a shutting-down host
        (cortex stop flag) cancels mid-generation instead of blocking
        its caller for the rest of the reply. ``json_mode`` /
        ``response_schema`` constrain the reply to valid (schema'd)
        JSON (llama.cpp response_format parity)."""
        self.prepare_generation(prompt, tools, force_tool_call,
                                response_schema=response_schema,
                                json_mode=json_mode)
        while (piece := self.generate_next_token()) is not None:
            if on_token:
                on_token(piece)
            if should_stop is not None and should_stop():
                self._done = True
                break
        # An external stop can land with speculative or lookahead tokens
        # buffered; roll the cache back to exactly the emitted text.
        self._drop_pending_spec()
        self._drop_pending_lookahead()
        tail = self._flush_text()
        if tail and on_token:
            on_token(tail)
        return self._generated_text

    def chat(self, user_text: str, system: Optional[str] = None,
             on_token: Optional[Callable[[str], None]] = None) -> str:
        """Multi-turn conversation with append-only KV reuse: the first
        turn prefills; later turns ``extend`` the cache with only the new
        exchange instead of re-prefilling the whole history (the
        reference keeps its llama.cpp context warm across turns the same
        way — re-prefill per turn would cost 50-200 ms at 7B scale).

        Falls back to a fresh prefill over the recent history when the
        window would overflow."""
        first = self._host_len == 0
        new_ids = self.tokenizer.encode(f"\n[INST] {user_text} [/INST]")
        fits = (self._host_len + len(new_ids) + self.gen.max_tokens
                < self.cfg.max_seq - 1)
        if first or not fits:
            history = "\n".join(
                f"[INST] {u} [/INST] {a}" for u, a in self._chat_turns[-4:])
            prompt = "\n".join(p for p in (
                f"[INST] {system} [/INST]" if system else "",
                history,
                f"[INST] {user_text} [/INST]") if p)
            self.prepare_generation(prompt)
        else:
            self._next_logits = self._extend_ids(new_ids)
            self._generated_ids = []
            self._generated_text = ""
            self._n_emitted = 0
            self._done = False
            self._grammar = None
            self._utf8 = None
        while (piece := self.generate_next_token()) is not None:
            if on_token:
                on_token(piece)
        tail = self._flush_text()
        if tail and on_token:
            on_token(tail)
        self._chat_turns.append((user_text, self._generated_text))
        return self._generated_text

    def add_tool_response(self, tool_name: str, response: Any) -> None:
        """Re-inject a tool's output into the context (parity:
        tk_llm_runner_add_tool_response, tk_runner_helpers.c:78-126)."""
        text = f"\nTool {tool_name} returned: {json.dumps(response)}\n"
        ids = self.tokenizer.encode(text)
        self._next_logits = self._extend_ids(ids)
        self._done = False
        self._grammar = None

    @property
    def text(self) -> str:
        return self._generated_text

    def parse_tool_call(self) -> Optional[Dict[str, Any]]:
        """If the generation is a tool call, parse it (decision-engine
        front half; full parsing lives in cortex/decision.py)."""
        try:
            obj = json.loads(self._generated_text)
            call = obj.get("tool_call")
            if isinstance(call, dict) and "name" in call:
                return {"name": call["name"],
                        "arguments": call.get("arguments", {})}
        except (json.JSONDecodeError, AttributeError):
            pass
        return None

    def reset(self) -> None:
        """Clear the conversation (parity: llama_kv_cache_clear via
        tk_llm_runner reset, tk_runner_helpers.c:128-133)."""
        self.cache = self._m.KVCache.create(self.cfg,
                                              dtype=self._cache_dtype)
        self._next_logits = None
        self._host_len = 0
        self._chat_turns = []
        self._generated_ids = []
        self._generated_text = ""
        self._done = False
        self._grammar = None
        self._utf8 = None
        self._committed_ids = []
        self._primed_ids = None
        self._pending_spec = []
        self._spec_index = 0
        self._la_buf = []
        self._la_idx = 0
        self._la_next = None
