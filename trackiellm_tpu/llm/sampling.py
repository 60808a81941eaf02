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

    return jax.random.categorical(key, logits).astype(jnp.int32)


@jax.jit
def greedy(logits: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    return jnp.argmax(logits).astype(jnp.int32)
