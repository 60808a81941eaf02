#!/usr/bin/env python
"""Measure Pallas per-grid-step and per-call overhead on the real chip.

Method: one jit program containing a CHAIN of N dependent kernel calls
(each call consumes the previous output), so the relay cannot memoize
and per-call host dispatch is excluded. Varying the tile size changes
the number of grid steps per call at constant bytes streamed — the
timing slope vs steps is the per-step cost; the residual at few-steps
is stream time + per-call overhead. A separate near-empty kernel chain
isolates the pure per-call cost.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.ops import quant  # noqa: E402

N_CHAIN = 64
K, N = 4096, 4096  # wo decode shape: packed (2048, 4096) = 8.39 MB


def chain_q4(params_w, params_s, x, tile_n, tile_k):
    def body(x, _):
        y = quant.q4_matmul_pallas(x, params_w, params_s,
                                   tile_n=tile_n, tile_k=tile_k)
        # renormalize so the chain stays finite; result feeds next call
        y = y / (jnp.max(jnp.abs(y)) + 1e-6)
        return y.astype(jnp.float32), ()

    y, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
    return y


N_OUTER = 8


def time_fn(fn, *args, label=""):
    """The last positional arg must be the chain input x; the relay
    memoizes identical whole-program executions, so every timed call
    gets a DIFFERENT random x (warmup uses yet another one)."""
    *fixed, x = args
    key = jax.random.PRNGKey(int(time.time() * 1e6) & 0x7FFFFFFF)
    xs = [jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
          for i in range(N_OUTER + 1)]
    out = fn(*fixed, xs[0])
    float(jnp.sum(out))  # value fetch: block_until_ready lies via the relay
    t0 = time.perf_counter()
    outs = [fn(*fixed, xi) for xi in xs[1:]]
    float(sum(jnp.sum(o) for o in outs))
    dt = time.perf_counter() - t0
    per_call_us = dt / (N_CHAIN * N_OUTER) * 1e6
    print(f"{label:28s} {per_call_us:9.1f} us/call", flush=True)
    return per_call_us


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    w = jax.random.normal(key, (K, N), jnp.float32) / 64.0
    qw = quant.quantize_q4(w, 256)
    x = jax.random.normal(key, (1, K), jnp.float32)

    print(f"--- q4 matmul {K}x{N} (8.4 MB packed), chain of {N_CHAIN},"
          " varying grid steps ---", flush=True)
    results = {}
    for tile_n, tile_k in ((4096, 1024), (4096, 512), (2048, 512),
                           (1024, 512), (512, 512), (512, 256)):
        steps = (N // tile_n) * (2048 // tile_k)
        fn = jax.jit(functools.partial(chain_q4, tile_n=tile_n,
                                       tile_k=tile_k))
        us = time_fn(fn, qw.values, qw.scales, x,
                     label=f"tiles=({tile_k},{tile_n}) steps={steps}")
        results[steps] = us

    # Linear fit: us_per_call = a * steps + b
    import numpy as np
    ks = np.array(sorted(results))
    vs = np.array([results[s] for s in ks])
    a, b = np.polyfit(ks, vs, 1)
    mb = 2048 * N / 1e6
    print(f"fit: {a:.2f} us/step + {b:.1f} us/call base "
          f"(stream {mb:.1f} MB -> {mb / b * 1e3:.0f} GB/s if base were "
          "pure stream)", flush=True)

    # Near-empty kernel chain: pure per-call overhead
    def tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    from jax.experimental import pallas as pl

    def chain_tiny(x):
        def body(x, _):
            y = pl.pallas_call(
                tiny_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)
            return y, ()

        y, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return y

    xt = jnp.zeros((8, 128), jnp.float32)
    time_fn(jax.jit(chain_tiny), xt, label="near-empty pallas call")

    # XLA-op chain for comparison (norm-like glue)
    def chain_norm(x):
        def body(x, _):
            ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            y = x * jax.lax.rsqrt(ms + 1e-5)
            return y, ()

        y, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return y

    xn = jnp.ones((1, 4096), jnp.float32)
    time_fn(jax.jit(chain_norm), xn, label="rmsnorm XLA op")


if __name__ == "__main__":
    main()
