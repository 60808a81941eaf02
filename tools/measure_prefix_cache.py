#!/usr/bin/env python
"""Measure prefix-cache admission latency on the REAL paged LLMServer.

The reference's deployment shape: every conversation opens with the
same long system prompt (tk_cortex_main.c builds one fixed preamble);
vLLM-style prefix caching makes that preamble's prefill a one-time
cost per pool lifetime instead of per-request. This tool times
admission-to-completion for short-generation requests behind a shared
~L-token system prefix, prefix cache OFF vs ON (first request in the
ON arm pays the registering prefill; later requests stage the cached
pages and extend only the unique suffix).

Honest timing per PERF_NOTES.md: fresh time-seeded weights and
prompts (the relay memoizes identical executions), Future completion
as the sync.
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

MAX_TOKENS = 8
N_REQUESTS = 8
PREFIX_CHARS = 1500  # ~1501 tokens with BOS under ByteTokenizer


def run(server, seed: int, prefix: str) -> dict:
    # Warmup compiles every program OUTSIDE the timed window — incl.
    # the ON arm's gather/extend suffix path (warmup prompts share the
    # measured prefix's LENGTH but not its content: fresh-seeded).
    warm_prefix = f"{prefix[:-12]} warmup {seed} "[:len(prefix)]
    for i in range(2):
        server.generate(warm_prefix + f"aquecimento {i}",
                        max_tokens=MAX_TOKENS)
    lat = []
    for i in range(N_REQUESTS):
        t0 = time.perf_counter()
        out = server.generate(prefix + f"pergunta {seed}-{i}: o que vejo?",
                              max_tokens=MAX_TOKENS)
        lat.append(time.perf_counter() - t0)
        assert isinstance(out, str)
    lat_ms = sorted(1e3 * x for x in lat)
    stats = dict(server.pool.prefix_stats) if server.prefix_cache else {}
    return {"p50_ms": round(lat_ms[len(lat_ms) // 2], 1),
            "first_ms": round(1e3 * lat[0], 1),
            "steady_ms": round(sum(lat_ms[:N_REQUESTS // 2])
                               / (N_REQUESTS // 2), 1),
            **stats}


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=2048,
                                                    sliding_window=2048)
    params = llm_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=4)
    tok = ByteTokenizer(cfg.vocab_size)
    prefix = (f"sistema {seed}: voce e o trackie, assistente para pessoas "
              "cegas. regras: ") + "seja breve e claro. " * 74
    prefix = prefix[:PREFIX_CHARS]

    for label, on in (("off", False), ("on", True)):
        server = LLMServer(params, cfg, batch_slots=4, tokenizer=tok,
                           chunk_steps=8, paged=True, page_size=128,
                           n_pages=96, prefix_cache=on)
        try:
            res = run(server, seed, prefix)
        finally:
            server.close()
        print(json.dumps(
            {"config": f"prefix_cache_{label}_1.5k_prefix", **res}),
            flush=True)


if __name__ == "__main__":
    main()
