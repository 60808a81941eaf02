"""Evaluation: perplexity over packed batches (the training loop's
companion; also the token-level parity metric once real weights land —
BASELINE.json's "token parity" config)."""

from __future__ import annotations

import math
from typing import Iterable

import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.parallel.train import lm_loss


def evaluate_perplexity(params, cfg: llm_model.LLMConfig,
                        batches: Iterable) -> dict:
    """Mean next-token NLL and perplexity over an iterable of (B, S)
    int32 batches."""
    total_nll = 0.0
    n_batches = 0
    for batch in batches:
        # moe_aux_coef=0: perplexity is a pure cross-entropy — the MoE
        # load-balancing term is a TRAINING regularizer, not NLL.
        total_nll += float(lm_loss(params, cfg, jnp.asarray(batch),
                                   moe_aux_coef=0.0))
        n_batches += 1
    if n_batches == 0:
        return {"nll": float("nan"), "perplexity": float("nan"),
                "batches": 0}
    nll = total_nll / n_batches
    return {"nll": nll, "perplexity": math.exp(min(nll, 30.0)),
            "batches": n_batches}
