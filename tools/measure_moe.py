#!/usr/bin/env python
"""A/B the MoE prefill formulations on the real chip, one mode per
process (hard requirement: jax 0.9 dedupes identical re-jitted
functions, so in-process env-lever A/Bs silently measure one arm twice
— see PERF_NOTES round-3 and the verify skill).

Usage:
  python tools/measure_moe.py              # orchestrates both modes
  python tools/measure_moe.py --mode 0|1   # one arm (internal)

Defaults to the geometry where the routed win was established
(D=2048, H=7168, E=8 top-2, L=8, T=2048 bf16): dense 115.9 ms vs
routed 90.0 ms p50 (1.29x).
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(mode: str, dim: int, hidden: int, seq: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackiellm_tpu.models import llm

    cfg = llm.LLMConfig(
        vocab_size=8192, dim=dim, n_layers=8, n_heads=8, n_kv_heads=4,
        head_dim=128, hidden_dim=hidden, max_seq=2 * seq,
        n_experts=8, n_experts_used=2)
    params = llm.init_params(jax.random.PRNGKey(int(time.time()) % 9999),
                             cfg, dtype=jnp.bfloat16)
    tokens = jnp.asarray(
        np.random.default_rng(int(time.time())).integers(
            0, cfg.vocab_size, seq), jnp.int32)

    @jax.jit
    def run(params, tokens):
        cache = llm.KVCache.create(cfg, dtype=jnp.bfloat16)
        logits, _ = llm.prefill(params, cfg, tokens, jnp.int32(seq), cache)
        return logits.sum()

    float(run(params, tokens))  # compile + sync (value fetch)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(run(params,
                  (tokens + int(time.perf_counter_ns()) % 3)
                  % cfg.vocab_size))
        times.append(time.perf_counter() - t0)
    label = {"0": "dense-all-experts", "1": "routed"}[mode]
    print(f"mode={label} T={seq} D={dim} H={hidden} "
          f"p50={sorted(times)[len(times) // 2] * 1e3:.1f} ms "
          f"min={min(times) * 1e3:.1f} ms", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["0", "1"])
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--hidden", type=int, default=7168)
    ap.add_argument("--seq", type=int, default=2048)
    args = ap.parse_args()
    if args.mode is not None:
        os.environ["TRACKIE_MOE_ROUTED"] = args.mode
        run_one(args.mode, args.dim, args.hidden, args.seq)
        return
    for mode in ("0", "1"):
        env = dict(os.environ, TRACKIE_MOE_ROUTED=mode)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode,
             "--dim", str(args.dim), "--hidden", str(args.hidden),
             "--seq", str(args.seq)],
            env=env, check=True)


if __name__ == "__main__":
    main()
