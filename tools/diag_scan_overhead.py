#!/usr/bin/env python
"""Isolate per-scan-iteration / per-execution / per-grid-step overheads.

Hypotheses from diag_overhead.py (near-empty pallas chain = 59 us/iter,
pure-XLA rmsnorm chain = 66 us/iter):
  H1: lax.scan iterations cost ~60 us each in this environment
  H2: each program EXECUTION costs ~4 ms through the relay
  H3: pallas grid steps are the expensive unit

Probes (every timed execution uses fresh inputs; value-fetch sync):
  scanN    — jit(scan of N trivial f32 map iterations), N in {8,64,512}
             -> slope = per-iteration cost, intercept = per-execution
  unroll64 — same body unrolled in Python (no scan) — scan vs inline
  grid64   — one pallas call, grid=(64,), near-empty kernel
  back2back— 8 independent executions of the SAME trivial program vs 1
             (measures whether independent executions pipeline)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

N_OUTER = 8


def timed(fn, shape=(8, 128), label="", n_outer=N_OUTER):
    key = jax.random.PRNGKey(int(time.time() * 1e6) & 0x7FFFFFFF)
    xs = [jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)
          for i in range(n_outer + 1)]
    float(jnp.sum(fn(xs[0])))
    t0 = time.perf_counter()
    outs = [fn(xi) for xi in xs[1:]]
    float(sum(jnp.sum(o) for o in outs))
    dt = time.perf_counter() - t0
    per_exec_ms = dt / n_outer * 1e3
    print(f"{label:22s} {per_exec_ms:9.3f} ms/exec", flush=True)
    return per_exec_ms


def body(x):
    return x * 1.0000001 + 0.0000001


def main() -> None:
    for n in (8, 64, 512):
        fn = jax.jit(lambda x, n=n: jax.lax.scan(
            lambda c, _: (body(c), ()), x, None, length=n)[0])
        timed(fn, label=f"scan{n}")

    def unrolled(x):
        for _ in range(64):
            x = body(x)
        return x

    timed(jax.jit(unrolled), label="unroll64")

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def grid64(x):
        return pl.pallas_call(
            k,
            grid=(64,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    timed(jax.jit(grid64), label="pallas grid=(64,)")

    trivial = jax.jit(body)
    timed(trivial, label="1 exec trivial", n_outer=1)
    timed(trivial, label="8 exec trivial", n_outer=8)
    timed(trivial, label="64 exec trivial", n_outer=64)


if __name__ == "__main__":
    main()
