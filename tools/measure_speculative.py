#!/usr/bin/env python
"""Measure prompt-lookup speculative decoding on the real chip.

Zero-egress caveat: weights are random, so this is NOT the trained-
weights acceptance number — but untrained greedy decoding degenerates
into repetition, which is exactly the pattern n-gram lookup predicts,
so the mechanism (propose -> one extend() verify pass -> multi-commit)
exercises for real and the speedup is honestly measurable for this
output distribution. Reports tok/s and acceptance for A (plain greedy)
vs B (speculative) with byte-identical outputs asserted.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner  # noqa: E402
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402

N_TOKENS = 96


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=512,
                                                    sliding_window=512)
    params = llm_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=4)
    tok = ByteTokenizer(cfg.vocab_size)
    prompt = f"descreva a cena a sua frente com detalhes ({seed})"

    results = {}
    for label, spec in (("greedy", False), ("speculative", True)):
        runner = LLMRunner(
            params, cfg, tok,
            GenerationConfig(max_tokens=N_TOKENS, temperature=0.0,
                             speculative=spec))
        out = runner.generate(prompt)  # warm compile + text
        t0 = time.perf_counter()
        out = runner.generate(prompt + " agora")
        dt = time.perf_counter() - t0
        n = len(runner._generated_ids)
        results[label] = {"out": out, "tok_s": round(n / dt, 1),
                          "n_tokens": n}

    assert results["greedy"]["out"] == results["speculative"]["out"], \
        "speculative output diverged from plain greedy"
    print(json.dumps({
        "config": "prompt_lookup_speculative_7b_q4_random_weights",
        "greedy_tok_s": results["greedy"]["tok_s"],
        "speculative_tok_s": results["speculative"]["tok_s"],
        "n_tokens": results["greedy"]["n_tokens"],
        "exact_match": True,
        "note": "random weights; repetitive degenerate output — "
                "trained-weight acceptance still unmeasured (zero egress)",
    }))


if __name__ == "__main__":
    main()
