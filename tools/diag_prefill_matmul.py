#!/usr/bin/env python
"""Where is the prefill/extend crossover between the Pallas W4A8 kernel
and XLA dequant-then-matmul?

VERDICT OF THIS PROBE: **unreliable — do not use its numbers.** Its
isolated chained matmuls report 54 ms for a 4096x4096 M=128 pallas
call, while the SAME call inside the full 32-layer prefill costs
~0.4 ms (in-model prefill@128 = 50 ms total, value-fetch synced).
This re-confirms PERF_NOTES.md: isolated matmul microbenches through
the relay are meaningless; only full-model A/Bs decide. The live A/B
lever is TRACKIE_PREFILL_XLA_M (ops/quant.py) measured through
in-model prefill timing. Kept as a cautionary example.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from trackiellm_tpu.ops import quant  # noqa: E402

REPS = 8


def chain(fn, x0, n):
    """Feed a cheap transform of the output back as input so every rep
    truly executes (no replay)."""
    x = x0
    outs = []
    for _ in range(n):
        y = fn(x)
        outs.append(y[0, :8])
        # fold output back into the next input (data dependence)
        x = x + y[:, : x.shape[1]] * 1e-6
    return x, jnp.stack(outs)


def bench(shape, m):
    k, n = shape
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
    qw = quant.quantize_q4(w)
    x0 = jax.random.normal(jax.random.fold_in(key, 1), (m, k), jnp.float32)

    pallas_fn = jax.jit(lambda x: quant.quantized_matmul(x, qw))
    xla_fn = jax.jit(lambda x: quant.quantized_matmul_xla(x, qw))

    out = {}
    for label, fn in (("pallas", pallas_fn), ("xla_dequant", xla_fn)):
        run = jax.jit(lambda x: chain(fn, x, REPS))
        r = run(x0)
        float(r[1][0, 0])  # warm + compile
        t0 = time.perf_counter()
        r = run(x0 * 1.0001)
        float(r[1][0, 0])
        dt = (time.perf_counter() - t0) / REPS
        gbs = (k * n * 0.5) / dt / 1e9  # Q4 weight bytes / pass
        out[label] = (dt * 1e3, gbs)
        print(f"  K={k} N={n} M={m} {label:12s} {dt*1e3:7.2f} ms "
              f"({gbs:6.1f} GB/s eff)", flush=True)
    return out


def main() -> None:
    for m in (32, 128, 256):
        print(f"M = {m}:")
        bench((4096, 4096), m)
        bench((4096, 14336), m)


if __name__ == "__main__":
    main()
