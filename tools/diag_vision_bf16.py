#!/usr/bin/env python
"""A/B the vision model forwards in f32 vs bf16 activations on the TPU.

The conv stacks in models/detector.py and models/depth.py follow the
activation dtype (weights are cast to ``x.dtype``, accumulation stays
f32 via preferred_element_type), so feeding bf16 letterboxed input runs
the whole backbone in bf16. This probe answers whether that halves the
32/38 ms forward latencies measured in tools/diag_vision.py or whether
they are overhead-bound.

Timing hygiene per PERF_NOTES.md: fresh random frame per iteration and
a value-fetch sync (the relay memoizes identical executions and
block_until_ready lies).
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

from trackiellm_tpu.models import depth as depth_model  # noqa: E402
from trackiellm_tpu.models import detector as det_model  # noqa: E402

N = 8


def timed(label, fn, n=N):
    fn(0)
    fn(1)
    t0 = time.perf_counter()
    for i in range(n):
        fn(i + 2)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:18s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    ks = jax.random.split(key, 2)
    det_cfg = det_model.DetectorConfig.v8n()
    det_params = det_model.init_detector(ks[0], det_cfg)
    dep_cfg = depth_model.DepthConfig.small()
    dep_params = depth_model.init_depth(ks[1], dep_cfg)

    det_fwd = jax.jit(
        lambda p, x: det_model.detector_forward(p, det_cfg, x))
    dep_fwd = jax.jit(
        lambda p, x: depth_model.depth_forward(p, dep_cfg, x))

    rng = np.random.default_rng(int(time.time()))
    frames = [rng.random((3, 640, 640), np.float32) for _ in range(N + 2)]
    frames384 = [f[:, :384, :384].copy() for f in frames]

    det_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a is not None and a.dtype == jnp.float32 else a, det_params)
    dep_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a is not None and a.dtype == jnp.float32 else a, dep_params)

    def det_f32(i):
        b, c = det_fwd(det_params, jnp.asarray(frames[i]))
        return float(b[0, 0]) + float(c[0, 0])

    def det_b16(i):
        b, c = det_fwd(det_bf16, jnp.asarray(frames[i], jnp.bfloat16))
        return float(b[0, 0]) + float(c[0, 0])

    def dep_f32(i):
        d = dep_fwd(dep_params, jnp.asarray(frames384[i]))
        return float(d[0, 0])

    def dep_b16(i):
        d = dep_fwd(dep_bf16, jnp.asarray(frames384[i], jnp.bfloat16))
        return float(d[0, 0])

    timed("det_fwd f32", det_f32)
    timed("det_fwd bf16", det_b16)
    timed("depth_fwd f32", dep_f32)
    timed("depth_fwd bf16", dep_b16)

    # numeric drift check: same frame through both paths
    x = jnp.asarray(frames[0])
    b32, c32 = det_fwd(det_params, x)
    b16, c16 = det_fwd(det_bf16, x.astype(jnp.bfloat16))
    rel = float(jnp.max(jnp.abs(c32 - c16.astype(jnp.float32))))
    print(f"cls-prob max abs diff f32 vs bf16: {rel:.4f}")


if __name__ == "__main__":
    main()
