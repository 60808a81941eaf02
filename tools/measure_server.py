#!/usr/bin/env python
"""Measure REAL LLMServer aggregate throughput (7B Q4, continuous
batching) — not the raw decode-step kernel (tools/measure_batch.py),
but the full serve loop with admission, bookkeeping, and host fetches.

A/Bs the steady-state device-chunk fast path (chunk_steps=8, one host
fetch per 8 steps) against the per-step loop (chunk_steps=1, one
non-pipelining relay round trip per step). Honest timing per
PERF_NOTES.md: fresh time-seeded weights + prompts, wall clock over
Future completion (value arrival on host IS the sync).
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

from trackiellm_tpu.llm.server import LLMServer  # noqa: E402
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402

MAX_TOKENS = 48
N_REQUESTS = 16


def run(server, seed: int) -> dict:
    prompts = [f"pergunta numero {seed}-{i}: o que ha a minha frente?"
               for i in range(N_REQUESTS)]
    # warmup: compile prefill + decode programs outside the timed
    # window — a FULL burst, so the admission-wave prefill_batch
    # program (group sizes up to batch_slots) and the chunk program
    # compile here, not inside the measurement.
    warm = [server.submit(p + " (warmup)", max_tokens=MAX_TOKENS)
            for p in prompts[: server.batch]]
    for f in warm:
        f.result(timeout=900.0)  # cold paged-chunk compile is minutes
    t0 = time.perf_counter()
    futs = [server.submit(p, max_tokens=MAX_TOKENS) for p in prompts]
    outs = [f.result(timeout=600) for f in futs]
    dt = time.perf_counter() - t0
    toks = N_REQUESTS * MAX_TOKENS
    assert all(isinstance(o, str) for o in outs)
    return {"aggregate_tok_s": round(toks / dt, 1),
            "wall_s": round(dt, 2),
            "decode_steps": server.stats["decode_steps"]}


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=512,
                                                    sliding_window=512)
    params = llm_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=4)
    tok = ByteTokenizer(cfg.vocab_size)

    for label, chunk, paged in (("per_step", 1, False),
                                ("chunk8", 8, False),
                                ("paged_per_step", 1, True),
                                ("paged_chunk8", 8, True)):
        # page_size=128 (the server default): the page-size sweep
        # (tools/measure_paged_sweep.py) measured 128 ~2x faster than
        # the 64 used in round 2 (fewer table entries, longer
        # contiguous gather runs), and 256 pathological at max_seq=512
        # (9-page pool -> preemption thrash).
        kw = dict(paged=True, page_size=128) if paged else {}
        server = LLMServer(params, cfg, batch_slots=8, tokenizer=tok,
                           chunk_steps=chunk, **kw)
        try:
            res = run(server, seed)
        finally:
            server.close()
        print(json.dumps({"config": f"llm_server_b8_{label}", **res}),
              flush=True)


if __name__ == "__main__":
    main()
