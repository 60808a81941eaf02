"""Device-side token sampling: temperature / top-k / top-p / repetition
penalty, plus masked (grammar-constrained) sampling.

Parity target: llama.cpp's sampling chain, which the reference drives
with temperature 0.7 and default top-k/top-p (reference:
src/cortex/tk_cortex_main.c:913-916, src/ai_models/tk_runner_streaming.c:
60-84). Everything here is one fused jit program per step; only the
sampled int32 crosses back to the host.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "top_p", "min_p", "repetition_penalty"))
def sample(
    logits: jnp.ndarray,       # (V,) f32
    key: jax.Array,
    temperature: jnp.ndarray,  # scalar; <= 0 handled by greedy() on host
    top_k: int = 40,
    top_p: float = 0.95,
    min_p: float = 0.0,
    mask: Optional[jnp.ndarray] = None,          # (V,) bool — grammar mask
    recent_tokens: Optional[jnp.ndarray] = None,  # (W,) int32, -1 padded
    repetition_penalty: float = 1.0,
) -> jnp.ndarray:
    """Sample one token id. Order of operations matches llama.cpp:
    repetition penalty -> grammar mask -> min-p -> temperature ->
    top-k -> top-p. min-p (llama.cpp's modern default filter) drops
    tokens whose probability is below ``min_p * max_prob``, evaluated
    on the PRE-temperature distribution — llama.cpp's default sampler
    chain places min_p before the temperature stage, and the ratio
    test is not temperature-invariant."""
    logits = _process_chain(logits, temperature, top_k, top_p, min_p,
                            mask, recent_tokens, repetition_penalty)
    return jax.random.categorical(key, logits).astype(jnp.int32)


def _process_chain(logits, temperature, top_k, top_p, min_p, mask,
                   recent_tokens, repetition_penalty):
    """The full llama.cpp-ordered processing chain, returning FINAL
    logits (categorical over these == the production sampler). Shared
    by :func:`sample` and the speculative rejection verifier so the
    two can never drift."""
    v = logits.shape[0]

    if recent_tokens is not None and repetition_penalty != 1.0:
        counts = jnp.zeros((v + 1,), jnp.float32).at[
            jnp.where(recent_tokens >= 0, recent_tokens, v)
        ].add(1.0)[:v]
        seen = counts > 0
        penalized = jnp.where(logits > 0, logits / repetition_penalty,
                              logits * repetition_penalty)
        logits = jnp.where(seen, penalized, logits)

    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    if min_p > 0.0:
        # prob_i / prob_max = exp(logit_i - logit_max): no softmax
        # normalizer needed for the ratio test.
        keep = (logits - jnp.max(logits)) >= math.log(min_p)
        logits = jnp.where(keep, logits, NEG_INF)

    logits = logits / jnp.maximum(temperature, 1e-6)

    if 0 < top_k < v:
        kth = jax.lax.top_k(logits, top_k)[0][-1]
        logits = jnp.where(logits >= kth, logits, NEG_INF)

    if top_p < 1.0:
        sorted_logits = jnp.sort(logits)[::-1]
        probs = jax.nn.softmax(sorted_logits)
        cum = jnp.cumsum(probs)
        # Keep tokens while cumulative prob (exclusive) < top_p.
        cutoff_idx = jnp.sum((cum - probs) < top_p) - 1
        cutoff = sorted_logits[jnp.maximum(cutoff_idx, 0)]
        logits = jnp.where(logits >= cutoff, logits, NEG_INF)

    return logits


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "top_p", "min_p", "repetition_penalty"))
def spec_verify_sampled(
    logits: jnp.ndarray,        # (B, V) f32 — verify-pass all-logits
    proposal: jnp.ndarray,      # (B-1,) int32, padded past n_prop
    n_prop: jnp.ndarray,        # traced scalar — real proposal count
    key: jax.Array,
    temperature: jnp.ndarray,   # scalar > 0
    recent: jnp.ndarray,        # (B, W) int32, -1 padded, per position
    top_k: int = 40,
    top_p: float = 0.95,
    min_p: float = 0.0,
    repetition_penalty: float = 1.0,
) -> tuple:
    """Rejection-sampling speculative verification for POINT-MASS
    drafts (prompt-lookup / greedy draft-model proposals), exact w.r.t.
    the production sampler's distribution.

    Leviathan et al.'s scheme with draft q = delta(proposal_i): accept
    proposal_i with probability p_i(proposal_i); on the first reject,
    resample from the residual norm(max(0, p - q)) — which for a point
    mass is p_i with proposal_i's probability zeroed and renormalized.
    If all n_prop accept, a bonus token samples from the next
    position's full distribution. The marginal law of the emitted
    tokens equals plain sequential sampling (tested statistically in
    tests/test_speculative.py). p_i is the FULL production chain
    (repetition penalty / min-p / temperature / top-k / top-p) via
    ``_process_chain`` — the same final logits ``sample`` draws from.

    Shapes are static per extend-bucket ``B`` (ONE compiled variant
    regardless of the live proposal length); rows at/past ``n_prop+1``
    are junk from the padded extend and never selected. Returns ONE
    stacked int32 (2,) array [n_accepted, final_token] so the caller
    pays a single host fetch per verify pass (two separate device
    scalars would be two non-pipelining relay round trips —
    PERF_NOTES); each pass emits n_accepted + 1 tokens.
    """
    kpad = proposal.shape[0]
    proc = jax.vmap(
        lambda lg, rec: _process_chain(
            lg, temperature, top_k, top_p, min_p, None, rec,
            repetition_penalty))(logits, recent)       # (B, V)
    ukey, skey = jax.random.split(key)
    u = jax.random.uniform(ukey, (kpad,))
    logp = jax.nn.log_softmax(proc[:kpad], axis=-1)
    p_prop = jnp.exp(jnp.take_along_axis(
        logp, proposal[:, None], axis=1)[:, 0])        # (B-1,)
    idx = jnp.arange(kpad)
    accept = (u < p_prop) & (idx < n_prop)
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
    last = proc[n_acc]                                  # (V,)
    # Residual for the rejected position: proposal's mass removed.
    rejected_tok = proposal[jnp.minimum(n_acc, kpad - 1)]
    resid = last.at[rejected_tok].set(NEG_INF)
    final_logits = jnp.where(n_acc == n_prop, last, resid)
    tok = jax.random.categorical(skey, final_logits).astype(jnp.int32)
    return jnp.stack([n_acc.astype(jnp.int32), tok])


@jax.jit
def greedy(logits: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    return jnp.argmax(logits).astype(jnp.int32)
