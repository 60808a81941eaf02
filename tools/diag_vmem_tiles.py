"""Probe which q4_matmul_pallas_i8 tile plans COMPILE on the real TPU
at prefill-sized M — Mosaic's scoped-vmem stack runs ~1.5x the
_vmem_estimate at wide blocks, and the compile OOM boundary (16 MB
scoped) must be mapped empirically so _pick_tiles_for's budget is set
from evidence.

Trigger: app-loop prime at M=256 (mistral-7b down-proj K=14336 N=4096)
picked (512, 2048) -> 'Scoped allocation 16.84M > 16.00M' compile OOM
(HTTP 500 through the relay, prime silently skipped).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from trackiellm_tpu.ops import quant

# (M, K, N, G, tile_k, tile_n) — mistral-7b matmul shapes at the
# prime-path M plus the current picker outputs for each.
CASES = [
    # K=14336 down-proj
    (256, 14336, 4096, 256, 512, 2048),    # picker @ m=256 — the OOM
    (256, 14336, 4096, 256, 256, 2048),
    (128, 14336, 4096, 256, 256, 4096),    # picker @ m=128 (in use)
    # K=4096 square (o-proj / qkv)
    (256, 4096, 4096, 256, 512, 2048),     # picker @ m=256
    (256, 4096, 4096, 256, 1024, 1024),
    # gate-up fused
    (256, 4096, 28672, 256, 1024, 1024),   # picker @ m=256
    # lm_head
    (256, 4096, 32000, 256, 1024, 1280),   # picker @ m=256
]

rng = np.random.default_rng(0)
for (M, K, N, G, tk, tn) in CASES:
    half = K // 2
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    packed = jnp.asarray(rng.integers(0, 255, (half, N)), jnp.uint8)
    scales = jnp.asarray(
        rng.standard_normal((K // G, N)) * 0.01, jnp.float32)
    est = quant._vmem_estimate(M, tk, tn, half, G, 2) / 1e6
    t0 = time.time()
    try:
        f = jax.jit(lambda a, b, c, tn=tn, tk=tk:
                    quant.q4_matmul_pallas_i8(a, b, c,
                                              tile_n=tn, tile_k=tk))
        f.lower(x, packed, scales).compile()
        print(f"M={M:4d} K={K:6d} N={N:6d} tk={tk:5d} tn={tn:5d} "
              f"est={est:6.2f}M  OK   ({time.time()-t0:.1f}s)", flush=True)
    except Exception as ex:
        msg = str(ex)
        line = next((l for l in msg.splitlines()
                     if "exceeded" in l or "Scoped" in l), msg[:100])
        print(f"M={M:4d} K={K:6d} N={N:6d} tk={tk:5d} tn={tn:5d} "
              f"est={est:6.2f}M  OOM  ({time.time()-t0:.1f}s) "
              f"{line.strip()[:130]}", flush=True)
