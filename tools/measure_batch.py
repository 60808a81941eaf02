#!/usr/bin/env python
"""Measure batched decode throughput (7B Q4, continuous-batching layout):
aggregate tok/s at several batch sizes. Honest timing per PERF_NOTES.md.
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

from trackiellm_tpu.models import llm as llm_model  # noqa: E402

STEPS = 16


def main() -> None:
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=512,
                                                    sliding_window=512)
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    params = llm_model.init_params_quantized(key, cfg, bits=4)

    for batch in (8, 16, 32):
        cache = llm_model.BatchedKVCache.create(cfg, batch)
        # Give each slot a distinct short history.
        for b in range(batch):
            seq = llm_model.KVCache.create(cfg)
            toks = jax.random.randint(jax.random.fold_in(key, b), (64,),
                                      0, cfg.vocab_size, jnp.int32)
            _, seq = llm_model.prefill(params, cfg, toks, jnp.int32(64), seq)
            cache = llm_model.insert_sequence(cache, cfg, b, seq)

        active = jnp.ones((batch,), bool)
        tokens = jnp.arange(batch, dtype=jnp.int32) + 7

        def run(tokens, cache, n):
            # attn_len buckets measured SLOWER here (849 vs 1087
            # tok/s at B=32 with attn_len=256): the slice materializes
            # per-layer copies. Full masked cache reads stay.
            for _ in range(n):
                logits, cache = llm_model.decode_step_batch(
                    params, cfg, tokens, active, cache)
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return tokens, cache

        tokens, cache = run(tokens, cache, 2)  # warm/compile
        int(tokens[0])
        t0 = time.perf_counter()
        tokens, cache = run(tokens, cache, STEPS)
        int(tokens[0])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "batch": batch,
            "aggregate_tok_s": round(batch * STEPS / dt, 1),
            "per_step_ms": round(dt / STEPS * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
