#!/usr/bin/env python
"""Does Mosaic re-DMA an input block whose index map repeats between
grid steps? The Q4 kernels pass scale blocks indexed by ni only, so the
SAME (ngh, TN) block is named by every K step of one N tile. If Mosaic
re-copies it each step, the scale stream is paid K-steps times (est.
+18% decode traffic at 7B); if it elides repeats, the current layout is
already right (and the K-indexed redesign is moot — it is also illegal
for gpt < 8 sublane blocks).

Method: two scans over 32 fresh (4096 x 14336) Q4 matmuls with
IDENTICAL weight bytes, differing only in group size: g=256 (16+16
scale rows) vs g=64 (64+64 rows, 4x the scale bytes). Per-step scale
blocks are 0.92 MB vs 3.7 MB. If re-DMAed every one of the 8 K steps,
g=64 pays ~+22 MB/layer (+60% time); if elided, ~+2.8 MB (+9%).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.ops import quant  # noqa: E402

L = 32
K = 4096
N = 14336
HALF = K // 2
N_ITERS = 24


def build(key, g):
    packed = jax.random.randint(key, (HALF, N), 0, 255,
                                jnp.int32).astype(jnp.uint8)
    scales = (jax.random.uniform(jax.random.fold_in(key, 1),
                                 (K // g, N)) * 0.01 + 0.001)
    return packed, scales


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    x0 = jax.random.normal(key, (1, K), jnp.float32) * 0.02

    for g in (256, 64):
        ws = [build(jax.random.fold_in(key, 100 * g + i), g)
              for i in range(L)]
        packed = jnp.stack([w[0] for w in ws])
        scales = jnp.stack([w[1] for w in ws])
        del ws

        @jax.jit
        def scan_fn(x, packed, scales):
            def body(x, pw):
                p, s = pw
                y = quant.q4_matmul_pallas_i8(x, p, s,
                                              tile_n=N, tile_k=256)
                return x + y[:, :K] * 1e-3, None
            x, _ = jax.lax.scan(body, x, (packed, scales))
            return x

        out = scan_fn(x0, packed, scales)
        jax.device_get(out)
        t0 = time.perf_counter()
        x = x0
        for _ in range(N_ITERS):
            x = scan_fn(x, packed, scales)
        jax.device_get(x)
        dt = (time.perf_counter() - t0) / N_ITERS
        bytes_min = L * (HALF * N + (K // g) * N * 4)
        print(f"g={g:3d}  {dt * 1e3:7.2f} ms/pass  "
              f"(min stream {bytes_min / 1e6:.0f} MB -> "
              f"{bytes_min / dt / 1e9:5.1f} GB/s)", flush=True)
        del packed, scales


if __name__ == "__main__":
    main()
