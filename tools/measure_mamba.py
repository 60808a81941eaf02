#!/usr/bin/env python
"""Measure the Mamba family on the real chip: 2.8B-class decode tok/s
(serial + k-chunk) and associative-scan prefill latency.

The family's pitch vs attention: decode state is O(1) in context, so
tok/s is FLAT in conversation length (no KV-cache reads growing with
the prefix) — measured here at two simulated context depths to show
it. Random weights (latency is weight-independent), value-fetch sync.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.models import mamba as M  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(int(time.time()) & 0x7FFFFFFF)
    cfg = M.MambaConfig.mamba_2_8b()
    t0 = time.time()
    params = M.init_params(cfg, rng, dtype=jnp.bfloat16)
    params = jax.device_put(params)
    print(f"init {time.time() - t0:.1f}s", file=sys.stderr)

    # Prefill: 1024-token bucket through the associative scan.
    tokens = jnp.asarray(rng.integers(0, 50000, 1024).astype(np.int32))
    cache = M.MambaCache.create(cfg)
    for n in (256, 1024):
        tk = tokens[:n]
        np.asarray(M.prefill(params, cfg, tk, jnp.int32(n), cache)[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(M.prefill(params, cfg, tk, jnp.int32(n),
                                 cache)[0])
            ts.append((time.perf_counter() - t0) * 1e3)
        print(json.dumps({
            "config": f"mamba_2.8b_bf16_prefill_{n}",
            "p50_ms": round(float(np.percentile(ts, 50)), 1),
            "tok_per_s": round(n / np.percentile(ts, 50) * 1e3, 1)}))

    # Decode: serial (value-fetch per token) and k=8 chunks, at two
    # context depths — identical programs/state size by construction.
    for depth_name, n_prefill in (("ctx256", 256), ("ctx4096x" , 1024)):
        logits, cache2 = M.prefill(params, cfg, tokens[:n_prefill],
                                   jnp.int32(n_prefill), cache)
        # serial
        np.asarray(logits)
        t0 = time.perf_counter()
        n = 32
        lg, c = logits, cache2
        for _ in range(n):
            tid = jnp.int32(int(np.argmax(np.asarray(lg))))
            lg, c = M.decode_step(params, cfg, tid, c)
        np.asarray(lg)
        serial = n / (time.perf_counter() - t0)
        # k-chunk
        toks, lg, c = M.decode_chunk_greedy(params, cfg, logits, cache2,
                                            8)
        np.asarray(toks)
        t0 = time.perf_counter()
        n = 64
        lg, c = logits, cache2
        for _ in range(n // 8):
            toks, lg, c = M.decode_chunk_greedy(params, cfg, lg, c, 8)
            np.asarray(toks)
        chunk = n / (time.perf_counter() - t0)
        print(json.dumps({
            "config": f"mamba_2.8b_bf16_decode_{depth_name}",
            "serial_tok_s": round(serial, 1),
            "chunk8_tok_s": round(chunk, 1)}))

    # Q4: the weight-bandwidth lever (w_in/w_x/w_out + lm_head).
    qparams = M.quantize_params(params, bits=4)
    del params
    logits, cache2 = M.prefill(qparams, cfg, tokens[:256],
                               jnp.int32(256), cache)
    toks, lg, c = M.decode_chunk_greedy(qparams, cfg, logits, cache2, 8)
    np.asarray(toks)
    t0 = time.perf_counter()
    n = 64
    lg, c = logits, cache2
    for _ in range(n // 8):
        toks, lg, c = M.decode_chunk_greedy(qparams, cfg, lg, c, 8)
        np.asarray(toks)
    print(json.dumps({
        "config": "mamba_2.8b_q4_decode_ctx256",
        "chunk8_tok_s": round(n / (time.perf_counter() - t0), 1)}))


if __name__ == "__main__":
    main()
