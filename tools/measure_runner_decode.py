#!/usr/bin/env python
"""Measure the INTERACTIVE decode path (LLMRunner.generate) on the real
chip — the cortex's actual per-token loop, not bench.py's device-side
batch loop (VERDICT round-2 weak #2: 35 tok/s vs the 94 tok/s ceiling).

A/B over GenerationConfig.lookahead depths with byte-identical output
asserted between every pair. Honest timing per PERF_NOTES.md: fresh
time-seeded weights per process, wall-clock around generate() (which
ends on a host-side fetch of real token ids — a value sync by
construction).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner  # noqa: E402
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402

N_TOKENS = 96
DEPTHS = (1, 4, 8, 16)


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=512,
                                                    sliding_window=512)
    params = llm_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=4)
    tok = ByteTokenizer(cfg.vocab_size)
    prompt = f"descreva a cena a sua frente com detalhes ({seed})"

    results = {}
    outputs = {}
    for k in DEPTHS:
        runner = LLMRunner(
            params, cfg, tok,
            GenerationConfig(max_tokens=N_TOKENS, temperature=0.0,
                             lookahead=k))
        runner.generate(prompt)  # warm compile
        best = 0.0
        for rep in range(3):
            t0 = time.perf_counter()
            out = runner.generate(prompt + " agora")
            dt = time.perf_counter() - t0
            n = len(runner._generated_ids)
            best = max(best, n / dt)
        results[k] = round(best, 1)
        outputs[k] = out

    base = outputs[DEPTHS[0]]
    for k in DEPTHS[1:]:
        assert outputs[k] == base, f"lookahead={k} output diverged"
    print(json.dumps({
        "config": "llm_runner_generate_7b_q4_interactive",
        "n_tokens": N_TOKENS,
        "tok_s_by_lookahead": {str(k): v for k, v in results.items()},
        "exact_match": True,
    }))


if __name__ == "__main__":
    main()
