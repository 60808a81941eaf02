#!/usr/bin/env python
"""Measure decode-stall during long-prompt admission (chunked prefill).

The metric that motivates Sarathi-style scheduling: while a ~1.5k-token
prompt prefills, what is the WORST inter-token gap an already-streaming
request observes? Whole-prompt admission stalls it for the full prefill;
`prefill_chunk=N` bounds the stall to ~one chunk.

One active stream decodes with host-timestamped `on_token` pieces; a
long prompt is submitted mid-stream; we report the max/p50 inter-token
gap inside the admission window, prefill_chunk=0 vs 256, plus the long
request's own admission-to-done time (the cost side: chunking trades a
little TTFT on the long prompt for bounded stalls on everyone else).

Honest timing per PERF_NOTES.md: fresh time-seeded weights/prompts;
`on_token` host arrival is the sync (a value fetch precedes each piece).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trackiellm_tpu.llm.server import LLMServer  # noqa: E402
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402

PREFIX_CHARS = 1500
STREAM_TOKENS = 192


def run(server, seed: int) -> dict:
    long_prompt = (f"documento {seed}: " + "contexto longo. " * 200
                   )[:PREFIX_CHARS]
    # Warmup: compile decode, per-step path, prefill AND the job's
    # extend buckets outside the timed window.
    server.generate(f"aquecimento {seed}", max_tokens=8)
    server.generate(long_prompt + " aquecer", max_tokens=8)

    stamps = []
    fut = server.submit(f"fluxo {seed}: descreva a cena a frente",
                        max_tokens=STREAM_TOKENS,
                        on_token=lambda t: stamps.append(
                            time.perf_counter()))
    while len(stamps) < 16:  # steady decode before the disturbance
        time.sleep(0.002)
    t_submit = time.perf_counter()
    long_fut = server.submit(long_prompt + f" pergunta {seed}",
                             max_tokens=8)
    long_fut.result(timeout=900)
    t_done = time.perf_counter()
    fut.result(timeout=900)

    # Inter-token gaps inside the admission window.
    window = [s for s in stamps if t_submit <= s <= t_done]
    pre = [s for s in stamps if s < t_submit]
    gaps = [1e3 * (b - a) for a, b in zip(window, window[1:])]
    baseline = [1e3 * (b - a) for a, b in zip(pre, pre[1:])]
    if window and pre:
        gaps.append(1e3 * (window[0] - pre[-1]))  # the stall straddling
    return {
        "admission_window_ms": round(1e3 * (t_done - t_submit), 1),
        "max_gap_ms": round(max(gaps), 1) if gaps else None,
        "p50_gap_ms": round(sorted(gaps)[len(gaps) // 2], 1)
        if gaps else None,
        "baseline_gap_ms": round(sorted(baseline)[len(baseline) // 2], 1)
        if baseline else None,
        "tokens_in_window": len(window),
        "prefill_chunks": server.stats.get("prefill_chunks", 0),
    }


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=2048,
                                                    sliding_window=2048)
    params = llm_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=4)
    tok = ByteTokenizer(cfg.vocab_size)

    for label, chunk in (("whole_prompt", 0), ("chunk256", 256)):
        server = LLMServer(params, cfg, batch_slots=4, tokenizer=tok,
                           chunk_steps=8, paged=True, page_size=128,
                           n_pages=96, prefix_cache=False,
                           prefill_chunk=chunk)
        try:
            res = run(server, seed)
        finally:
            server.close()
        print(json.dumps(
            {"config": f"admission_stall_{label}_1.5k", **res}),
            flush=True)


if __name__ == "__main__":
    main()
