"""Prompt-lookup (n-gram) speculative decoding.

Single-model self-speculation: propose the continuation of the longest
recent n-gram match in the already-seen context (prompt + generated
tokens), then verify all proposals in ONE parallel ``extend`` pass.
Greedy decoding accepts the longest proposal prefix that matches the
model's own argmax at each position, plus one bonus token from the
last accepted position — so a fully-accepted pass emits k+1 tokens for
one weight stream instead of k+1. Repetitive spans (tool-call JSON,
quoted context, code) decode at chunk speed; the worst case degrades
to exactly the plain decode loop.

KV rollback is free under this runtime's cache contract: entries past
``cache.length`` are stale-masked and overwritten as real tokens
arrive (models/llm.py ``extend`` docstring), so rejecting proposals is
just setting ``length`` lower — no copies.

Reference: accelerates the decode loop the reference inherits from
llama.cpp (src/ai_models/tk_runner_streaming.c:60-84). Speculative
decoding itself is TPU-side headroom beyond the reference; the honest
speedup measurement needs trained weights (acceptance rate on real
text), so bench.py does not claim it — correctness (greedy
equivalence) is what the tests pin down.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from trackiellm_tpu.models import llm as llm_model


def propose_ngram(history: Sequence[int], max_propose: int,
                  max_ngram: int = 3, min_ngram: int = 1) -> List[int]:
    """Propose a continuation by matching the most recent n-gram
    against earlier context (prompt-lookup decoding).

    Scans for the PREVIOUS occurrence of the last ``n`` tokens (longest
    n first) and returns up to ``max_propose`` tokens that followed it.
    Pure host-side list work — no device math.
    """
    h = list(history)
    ln = len(h)
    for n in range(min(max_ngram, ln - 1), min_ngram - 1, -1):
        tail = h[ln - n:]
        # most recent earlier occurrence first
        for start in range(ln - n - 1, -1, -1):
            if h[start:start + n] == tail:
                follow = h[start + n: start + n + max_propose]
                if follow:
                    return follow
                break
    return []


class SpecStats:
    """Counters for observability (cortex perf counters consume these)."""

    def __init__(self) -> None:
        self.passes = 0          # speculative verify passes
        self.plain_steps = 0     # fallback single-token steps
        self.proposed = 0
        self.accepted = 0

    @property
    def acceptance(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0

    def as_dict(self) -> Dict[str, float]:
        return {"passes": self.passes, "plain_steps": self.plain_steps,
                "proposed": self.proposed, "accepted": self.accepted,
                "acceptance": round(self.acceptance, 4)}


def speculative_generate(
    params: Dict[str, Any],
    cfg: llm_model.LLMConfig,
    history: Sequence[int],
    first_token: int,
    cache: llm_model.KVCache,
    n_tokens: int,
    attn_len: Optional[int] = None,
    max_propose: int = 7,
    max_ngram: int = 3,
) -> Tuple[List[int], llm_model.KVCache, SpecStats]:
    """Greedy-generate ``n_tokens`` continuing from ``first_token``
    (sampled after prefill, not yet written to the cache), using
    n-gram proposals verified in bucketed ``extend`` passes.

    ``history`` is the full visible context (prompt ids + any already
    generated), used only for n-gram lookup. Returns the generated
    tokens (first_token's successors), the advanced cache, and stats.

    One compiled verify variant: chunks are padded to the static bucket
    ``max_propose + 1``; plain fallback steps use decode_step (same
    compiled variant the normal runner uses).
    """
    bucket = max_propose + 1
    hist: List[int] = list(history) + [int(first_token)]
    out: List[int] = []
    stats = SpecStats()
    tok = int(first_token)  # pending: emitted but not yet in the cache

    while len(out) < n_tokens:
        proposal = propose_ngram(hist, max_propose, max_ngram=max_ngram)
        if proposal:
            chunk = [tok] + proposal
            n_valid = len(chunk)
            padded = np.zeros((bucket,), np.int32)
            padded[:n_valid] = chunk
            offset = int(cache.length)
            logits, cache = llm_model.extend(
                params, cfg, jnp.asarray(padded), jnp.int32(n_valid),
                cache, attn_len=attn_len, all_logits=True)
            greedy = np.asarray(jnp.argmax(logits, axis=-1))  # (bucket,)
            stats.passes += 1
            stats.proposed += len(proposal)
            accepted = 0
            while (accepted < len(proposal)
                   and int(greedy[accepted]) == proposal[accepted]):
                accepted += 1
            stats.accepted += accepted
            emitted = [int(g) for g in greedy[:accepted + 1]]
            emitted = emitted[: n_tokens - len(out)]
            # Tokens truly in the cache: tok + the accepted proposals
            # that precede each emitted token — i.e. offset +
            # len(emitted) entries (the last emitted token is pending,
            # exactly like decode_step's sampled token). This both
            # rolls back the rejected tail AND trims over-generation on
            # the final pass, keeping cache text == emitted text.
            cache = cache._replace(
                length=jnp.int32(offset + len(emitted)))
        else:
            logits, cache = llm_model.decode_step(
                params, cfg, jnp.int32(tok), cache, attn_len=attn_len)
            stats.plain_steps += 1
            emitted = [int(jnp.argmax(logits))]
            emitted = emitted[: n_tokens - len(out)]
        out.extend(emitted)
        hist.extend(emitted)
        tok = emitted[-1] if emitted else tok
    return out, cache, stats


def speculative_generate_draft(
    params: Dict[str, Any],
    cfg: llm_model.LLMConfig,
    draft_params: Dict[str, Any],
    draft_cfg: llm_model.LLMConfig,
    history: Sequence[int],
    first_token: int,
    cache: llm_model.KVCache,
    n_tokens: int,
    draft_cache: Optional[llm_model.KVCache] = None,
    attn_len: Optional[int] = None,
    draft_attn_len: Optional[int] = None,
    max_propose: int = 7,
) -> Tuple[List[int], llm_model.KVCache, SpecStats]:
    """Two-model speculative decoding: a small DRAFT model proposes
    ``max_propose`` greedy tokens per round (ONE device dispatch via
    ``decode_chunk_greedy``), the target verifies them all in ONE
    bucketed ``extend`` pass, and both caches roll back rejected tails
    by just lowering ``length`` (stale-row contract). Output is
    byte-identical to the target's plain greedy loop (tested); the
    speedup is acceptance-dependent — at acceptance ``a`` each round
    emits ``a*k + 1`` tokens for one draft chunk + one target pass
    instead of ``a*k + 1`` full target steps.

    ``history``: the token ids already in the target ``cache`` (the
    prompt); the draft cache is primed with the same ids when
    ``draft_cache`` is None. The two models must share a tokenizer /
    vocab (assert below) — e.g. a GGUF loaded twice, once with
    ``max_layers`` truncation as the draft.
    """
    assert cfg.vocab_size == draft_cfg.vocab_size, (
        "draft and target must share a vocabulary")
    bucket = max_propose + 1
    if draft_cache is None:
        draft_cache = llm_model.KVCache.create(
            draft_cfg, dtype=cache.k.dtype)
        if len(history):
            _, draft_cache = llm_model.prefill(
                draft_params, draft_cfg,
                jnp.asarray(list(history), jnp.int32),
                jnp.int32(len(history)), draft_cache)
    out: List[int] = []
    stats = SpecStats()
    tok = int(first_token)  # pending: emitted but not yet in any cache

    while len(out) < n_tokens:
        k = min(max_propose, n_tokens - len(out))
        # Draft: ingest the pending token, then k greedy tokens in one
        # chunk program. (k < max_propose only on the final round —
        # decode_chunk_greedy compiles per n_tokens, so rounds reuse
        # the max_propose variant until the tail.)
        d_logits, draft_cache = llm_model.decode_step(
            draft_params, draft_cfg, jnp.int32(tok), draft_cache,
            attn_len=draft_attn_len)
        d_offset = int(draft_cache.length)
        proposal_arr, _, draft_cache = llm_model.decode_chunk_greedy(
            draft_params, draft_cfg, d_logits, draft_cache,
            n_tokens=k, attn_len=draft_attn_len)
        proposal = [int(t) for t in np.asarray(proposal_arr)]

        chunk = [tok] + proposal
        n_valid = len(chunk)
        padded = np.zeros((bucket,), np.int32)
        padded[:n_valid] = chunk
        offset = int(cache.length)
        logits, cache = llm_model.extend(
            params, cfg, jnp.asarray(padded), jnp.int32(n_valid),
            cache, attn_len=attn_len, all_logits=True)
        greedy = np.asarray(jnp.argmax(logits, axis=-1))
        stats.passes += 1
        stats.proposed += len(proposal)
        accepted = 0
        while (accepted < len(proposal)
               and int(greedy[accepted]) == proposal[accepted]):
            accepted += 1
        stats.accepted += accepted
        emitted = [int(g) for g in greedy[:accepted + 1]]
        emitted = emitted[: n_tokens - len(out)]
        # Target cache: offset + len(emitted) real entries (the last
        # emitted token stays pending). Draft cache: the ingested tok +
        # the accepted proposals = the same count past ITS offset.
        cache = cache._replace(length=jnp.int32(offset + len(emitted)))
        draft_cache = draft_cache._replace(
            length=jnp.int32(d_offset - 1 + len(emitted)))
        out.extend(emitted)
        tok = emitted[-1]
    return out, cache, stats
