#!/usr/bin/env python
"""On-TPU Pallas-vs-XLA numerics gate.

The CPU test suite exercises only the ``*_xla`` oracle paths
(tests/conftest.py forces JAX_PLATFORMS=cpu), so a Mosaic regression in
the TPU kernels could ship with green CI. This gate runs every
production Pallas kernel against its XLA oracle ON THE REAL CHIP with
tolerance asserts and prints one PASS/FAIL line; bench.py runs it as a
preamble each round (TRACKIE_SKIP_NUMERICS_GATE=1 skips).

Kernels gated (the ones quantized_matmul / prefill_attention actually
dispatch to on TPU):
  - q8_matmul_pallas            (W8 f32-activation matmul)
  - q4_matmul_pallas            (W4 f32-activation matmul, TRACKIE_Q4_F32A)
  - q4_matmul_pallas_i8         (W4A8 int8-MXU default; decode m=1 AND
                                 prefill m=8 shapes)
  - flash_attention             (causal / sliding window / softcap /
                                 attention sinks variants)

Tolerances are relative-Frobenius against the XLA oracle computed on
the same chip: the oracle itself runs f32 matmuls as bf16 passes on
TPU, so agreement is ~1e-3; the W4A8 kernel adds bounded activation-
quantization error (tests/test_ops.py::TestQ4Int8Kernel pins 2e-2 in
interpret mode).
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(verbose: bool = True):
    """Run all checks; returns (ok, results) where results is a list of
    (name, rel_err, tol, passed)."""
    import jax
    import jax.numpy as jnp

    from trackiellm_tpu.ops import attention, quant

    results = []

    def check(name, out, ref, tol):
        out = np.asarray(out, np.float64)
        ref = np.asarray(ref, np.float64)
        denom = np.linalg.norm(ref) or 1.0
        rel = float(np.linalg.norm(out - ref) / denom)
        ok = math.isfinite(rel) and rel < tol
        results.append((name, rel, tol, ok))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'} {name}: rel={rel:.2e} "
                  f"(tol {tol:.0e})", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m, kk, n, g = 8, 2048, 2048, 64
    x = jax.random.normal(k1, (m, kk), jnp.float32)
    w = jax.random.normal(k2, (kk, n), jnp.float32) * 0.05

    # --- quantized matmuls ---
    q8 = quant.quantize_q8(w, group=g)
    ref8 = quant.quantized_matmul_xla(x, q8)
    tk, tn = quant._pick_tiles_for(q8.k, q8.n, g, m, halves=1)
    check("q8_pallas m=8",
          quant.q8_matmul_pallas(x, q8.values, q8.scales,
                                 tile_n=tn, tile_k=tk),
          ref8, 2e-2)

    q4 = quant.quantize_q4(w, group=g)
    ref4 = quant.quantized_matmul_xla(x, q4)
    half = q4.k // 2
    tk, tn = quant._pick_tiles_for(half, q4.n, g, m, halves=2)
    check("q4_pallas_f32a m=8",
          quant.q4_matmul_pallas(x, q4.values, q4.scales,
                                 tile_n=tn, tile_k=tk),
          ref4, 2e-2)

    for mm in (1, 8):
        xm = x[:mm]
        refm = quant.quantized_matmul_xla(xm, q4)
        tk, tn = quant._pick_tiles_for(half, q4.n, g, mm, halves=2,
                                       max_wide_w=9_000_000,
                                       max_wide_n=14336)
        check(f"q4_pallas_i8 m={mm}",
              quant.q4_matmul_pallas_i8(xm, q4.values, q4.scales,
                                        tile_n=tn, tile_k=tk),
              refm, 4e-2)

    # --- flash attention variants ---
    h, hk, s, d = 8, 2, 256, 128
    q = jax.random.normal(k3, (h, s, d), jnp.float32)
    kc = jax.random.normal(k4, (hk, s, d), jnp.float32)
    vc = jax.random.normal(k5, (hk, s, d), jnp.float32)
    sinks = jax.random.normal(key, (h,), jnp.float32)
    variants = [
        ("causal", {}),
        ("window", {"window": 128}),
        ("softcap", {"softcap": 50.0}),
        ("sinks", {"sinks": sinks}),
    ]
    for vname, kw in variants:
        check(f"flash_{vname}",
              attention.flash_attention(q, kc, vc, causal=True, **kw),
              attention.attention_xla(q, kc, vc, causal=True, **kw),
              2e-2)

    ok = all(r[3] for r in results)
    worst = max(r[1] for r in results)
    line = (f"NUMERICS_GATE {'PASS' if ok else 'FAIL'} "
            f"({sum(r[3] for r in results)}/{len(results)} kernels, "
            f"max_rel={worst:.2e}, "
            f"platform={jax.devices()[0].platform})")
    print(line, file=sys.stderr, flush=True)
    if not ok:
        for name, rel, tol, passed in results:
            if not passed:
                print(f"NUMERICS_GATE FAIL {name}: rel={rel:.3e} "
                      f"tol={tol:.0e}", file=sys.stderr, flush=True)
    return ok, results


def main() -> None:
    import jax

    if jax.devices()[0].platform == "cpu":
        print("NUMERICS_GATE SKIP (no TPU attached; the CPU suite "
              "already covers the XLA paths + interpret-mode kernels)",
              file=sys.stderr)
        return
    ok, _ = run()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
