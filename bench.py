#!/usr/bin/env python
"""Headline benchmark: Mistral-7B-class Q4 decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Baseline: the reference runs Mistral-7B Q4 GGUF through llama.cpp on
embedded CPU/iGPU hardware (Orange Pi 5 / Jetson class, README.md:79-107);
it publishes no numbers (BASELINE.md), so vs_baseline is computed against
4.0 tok/s — the well-known llama.cpp ballpark for 7B Q4 on that class of
device — as the stand-in until a measured reference lands.

Method: random-init Q4 weights with a time-derived seed (decode speed is
weight-value-independent; fresh weights defeat any execution memoization
in the serving stack), prefill a 128-token bucket, then time the
PRODUCTION decode path: k-token greedy lookahead chunks
(``decode_chunk_greedy``, k=4 — LLMRunner.generate's default), with the
token array value-fetched once per chunk. The emitted chain is byte-
identical to the serial decode_step loop (tested,
tests/test_llm_runner.py); the chunk program just stops paying the
non-pipelining ~2.6 ms relay fetch per token (PERF_NOTES.md round-3:
per-step loop ~94 tok/s, chunked ~101).
"""

import json
import time

import jax

# Persistent compile cache: repeat bench runs skip the (remote, sometimes
# slow) TPU compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.models import llm as llm_model  # noqa: E402

REFERENCE_TOKS_PER_S = 4.0  # llama.cpp 7B Q4 on the reference's hw class
N_WARMUP = 4
N_DECODE = 32
BENCH_MAX_SEQ = 1024


def main() -> None:
    cfg = llm_model.LLMConfig.mistral_7b()._replace(
        max_seq=BENCH_MAX_SEQ, sliding_window=BENCH_MAX_SEQ)
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    params = llm_model.init_params_quantized(key, cfg, bits=4)
    cache = llm_model.KVCache.create(cfg)

    tokens = jax.random.randint(key, (128,), 0, cfg.vocab_size, jnp.int32)
    logits, cache = llm_model.prefill(params, cfg, tokens, jnp.int32(128),
                                      cache)
    logits.block_until_ready()

    import numpy as np

    # Bucketed attention: the live prefix (128 prompt + <56 generated)
    # fits the 256 bucket, so decode reads 34 MB of cache instead of
    # 134 MB per token (the runner picks this bucket automatically).
    K = 4  # GenerationConfig.lookahead default
    for _ in range(N_WARMUP):
        toks, logits, cache = llm_model.decode_chunk_greedy(
            params, cfg, logits, cache, n_tokens=K, attn_len=256)
        np.asarray(toks)  # value fetch = the only trustworthy sync here

    t0 = time.perf_counter()
    for _ in range(N_DECODE // K):
        toks, logits, cache = llm_model.decode_chunk_greedy(
            params, cfg, logits, cache, n_tokens=K, attn_len=256)
        np.asarray(toks)  # per-chunk fetch, exactly the runner's cadence
    dt = time.perf_counter() - t0

    toks_per_s = N_DECODE / dt
    print(json.dumps({
        "metric": "mistral7b_q4_decode_tok_s",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / REFERENCE_TOKS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
