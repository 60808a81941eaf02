"""Fused per-layer transformer blocks (Pallas): norm + matmuls + glue
in ONE kernel launch.

Why: decode on this stack is CALL-overhead-bound, not bandwidth-bound.
Measured (tools/diag_overhead.py, tools/diag_scan_overhead.py): a chained
near-empty pallas call costs ~55 us and even single chained XLA ops cost
tens of us, while the Q4 weight stream itself runs at several hundred
GB/s. The shipped decode layer is 4 pallas calls + ~8 XLA glue ops;
fusing the MLP half (rmsnorm -> gate/up matmul -> silu*up -> down matmul
-> residual add) into one launch removes one pallas call and ~6 glue ops
per layer. (Parity: the reference's llama.cpp MLP runs as separate GGML
ops, src/ai_models/tk_runner_streaming.c:60-84 — fusion is the TPU-side
redesign, not a translation.)

Layout contract (matches ops.quant): Q4 weights pack two int4 values per
byte across the K halves — packed[k, n] holds w[k, n] (low nibble) and
w[k + K/2, n] (high nibble); scales are (K/G, N) f32. The hidden
dimension is processed in PAIRED tiles (j, j + H/2) so each w_down
packed tile is read exactly once (its low nibbles are the pair's first
member, its high nibbles the second).

Constraint: tile_h == group (the w_down scale row then maps 1:1 to the
tile pair). For Mistral-7B Q4 @ group 256 this gives 28 grid steps —
the same DMA volume and step count as the unfused two-kernel MLP, minus
one launch and all the inter-kernel XLA glue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackiellm_tpu.ops.quant import QuantizedLinear, quantized_matmul_xla


def _rms(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * scale


def fused_mlp_xla(x: jnp.ndarray, norm_scale: jnp.ndarray,
                  w_gu: QuantizedLinear, w_down: QuantizedLinear,
                  eps: float) -> jnp.ndarray:
    """Oracle path: x + down(silu(gate) * up) over rmsnorm(x)."""
    h2 = _rms(x.astype(jnp.float32), norm_scale.astype(jnp.float32), eps)
    gu = quantized_matmul_xla(h2, w_gu)
    gate, up = jnp.split(gu, 2, axis=-1)
    out = quantized_matmul_xla(jax.nn.silu(gate) * up, w_down)
    return (x.astype(jnp.float32) + out).astype(x.dtype)


def _q4_dot(x_lo, x_hi, packed_ref, scales_ref, group: int):
    """(M, K/2)+(M, K/2) @ q4-packed (K/2, T) -> (M, T) f32 over the
    mixed-bias packing (quant.quantize_q4): low nibble biased +8 (fold
    into per-group scalar), high nibble two's complement = q*16 (1/16
    folded into the scale selection)."""
    raw = packed_ref[:]
    lo = (raw.astype(jnp.int32) & 0xF).astype(jnp.float32)     # q + 8
    hi = ((raw & 0xF0).astype(jnp.int8)                        # q * 16
          ).astype(jnp.int32).astype(jnp.float32)
    half = packed_ref.shape[0]
    gpt = half // group
    n_groups = scales_ref.shape[0]  # 2 * gpt
    acc = jnp.zeros((x_lo.shape[0], packed_ref.shape[1]), jnp.float32)
    for j in range(gpt):
        sl = slice(j * group, (j + 1) * group)
        xl = x_lo[:, sl]
        xh = x_hi[:, sl]
        part_lo = jnp.dot(xl, lo[sl, :], preferred_element_type=jnp.float32)
        part_hi = jnp.dot(xh, hi[sl, :], preferred_element_type=jnp.float32)
        bias_lo = 8.0 * jnp.sum(xl, axis=1, keepdims=True)
        onehot_lo = (jax.lax.broadcasted_iota(jnp.int32, (1, n_groups), 1)
                     == j).astype(jnp.float32)
        onehot_hi = (jax.lax.broadcasted_iota(jnp.int32, (1, n_groups), 1)
                     == gpt + j).astype(jnp.float32) * (1.0 / 16.0)
        s_lo = jnp.dot(onehot_lo, scales_ref[:],
                       preferred_element_type=jnp.float32)
        s_hi = jnp.dot(onehot_hi, scales_ref[:],
                       preferred_element_type=jnp.float32)
        acc += (part_lo - bias_lo) * s_lo
        acc += part_hi * s_hi
    return acc


def _fused_mlp_kernel(x_ref, norm_ref, glo_ref, ghi_ref, ulo_ref, uhi_ref,
                      sglo_ref, sghi_ref, sulo_ref, suhi_ref,
                      wd_ref, sd_ref,
                      o_ref, h2lo_ref, h2hi_ref, acc_ref,
                      *, group: int, eps: float):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        h2 = _rms(xf, norm_ref[:].astype(jnp.float32), eps)
        half = h2.shape[1] // 2
        h2lo_ref[:] = h2[:, :half]
        h2hi_ref[:] = h2[:, half:]
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h2_lo = h2lo_ref[:]
    h2_hi = h2hi_ref[:]

    gate_lo = _q4_dot(h2_lo, h2_hi, glo_ref, sglo_ref, group)
    up_lo = _q4_dot(h2_lo, h2_hi, ulo_ref, sulo_ref, group)
    gate_hi = _q4_dot(h2_lo, h2_hi, ghi_ref, sghi_ref, group)
    up_hi = _q4_dot(h2_lo, h2_hi, uhi_ref, suhi_ref, group)

    h_lo = gate_lo * jax.nn.sigmoid(gate_lo) * up_lo   # silu(g) * u
    h_hi = gate_hi * jax.nn.sigmoid(gate_hi) * up_hi

    # w_down pair tile: low nibbles = hidden rows [j*T, (j+1)*T)
    # (h_lo's columns), high nibbles = rows [H/2 + j*T, ...) (h_hi's).
    raw = wd_ref[:]
    dn_lo = (raw.astype(jnp.int32) & 0xF).astype(jnp.float32)   # q + 8
    dn_hi = ((raw & 0xF0).astype(jnp.int8)                      # q * 16
             ).astype(jnp.int32).astype(jnp.float32)
    dot_lo = jnp.dot(h_lo, dn_lo, preferred_element_type=jnp.float32)
    dot_hi = jnp.dot(h_hi, dn_hi, preferred_element_type=jnp.float32)
    # w_down scale rows for this pair (tile_h == group): row j (low
    # nibbles) and row nj + j (high nibbles), picked by one-hot matmul —
    # a (1, sublanes) dynamic slice is not TPU-legal.
    n_sd = sd_ref.shape[0]
    oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (1, n_sd), 1)
             == j).astype(jnp.float32)
    oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (1, n_sd), 1)
             == nj + j).astype(jnp.float32) * (1.0 / 16.0)
    s_lo = jnp.dot(oh_lo, sd_ref[:], preferred_element_type=jnp.float32)
    s_hi = jnp.dot(oh_hi, sd_ref[:], preferred_element_type=jnp.float32)
    bias_lo = 8.0 * jnp.sum(h_lo, axis=1, keepdims=True)
    acc_ref[:] += (dot_lo - bias_lo) * s_lo + dot_hi * s_hi

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = (x_ref[:].astype(jnp.float32)
                    + acc_ref[:]).astype(o_ref.dtype)


def fused_mlp_q4_pallas(x: jnp.ndarray, norm_scale: jnp.ndarray,
                        gu_packed: jnp.ndarray, gu_scales: jnp.ndarray,
                        down_packed: jnp.ndarray, down_scales: jnp.ndarray,
                        eps: float = 1e-5,
                        interpret: bool = False) -> jnp.ndarray:
    """One-launch MLP block: x (M, D) -> x + down(silu·up)(rmsnorm(x)).

    gu_packed (D/2, 2H) u8, gu_scales (D/G, 2H) f32;
    down_packed (H/2, D) u8, down_scales (H/G, D) f32.
    Tile size along hidden == group size (see module docstring).
    """
    m, d = x.shape
    two_h = gu_packed.shape[1]
    h = two_h // 2
    g = d // gu_scales.shape[0]
    th = g                       # tile_h == group
    assert down_scales.shape[0] == h // g
    assert (h // 2) % th == 0, (h, th)
    nj = (h // 2) // th
    d_half = d // 2
    ng = d // g                  # gu scale rows

    grid = (nj,)

    def col_tile(base_blocks):
        # (D/2, th) column tile of gu_packed at block col base + j
        return pl.BlockSpec((d_half, th),
                            lambda j, b=base_blocks: (0, b + j),
                            memory_space=pltpu.VMEM)

    def scale_tile(base_blocks):
        return pl.BlockSpec((ng, th),
                            lambda j, b=base_blocks: (0, b + j),
                            memory_space=pltpu.VMEM)

    h2b = (h // 2) // th         # blocks in half the hidden dim
    hb = h // th                 # blocks in the full hidden dim

    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, group=g, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),           # x
            pl.BlockSpec((1, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),           # norm scale
            col_tile(0),                                      # gate lo
            col_tile(h2b),                                    # gate hi
            col_tile(hb),                                     # up lo
            col_tile(hb + h2b),                               # up hi
            scale_tile(0), scale_tile(h2b),
            scale_tile(hb), scale_tile(hb + h2b),
            pl.BlockSpec((th, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),           # w_down tile
            pl.BlockSpec((h // g, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),           # sd (full)
        ],
        out_specs=pl.BlockSpec((m, d), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, d_half), jnp.float32),   # h2 lo
            pltpu.VMEM((m, d_half), jnp.float32),   # h2 hi
            pltpu.VMEM((m, d), jnp.float32),        # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * 3 * h,
            bytes_accessed=(d_half * two_h + (h // 2) * d
                            + ng * two_h * 4 + (h // g) * d * 4
                            + m * d * 8),
            transcendentals=m * h,
        ),
        interpret=interpret,
    )(x, norm_scale.reshape(1, d),
      gu_packed, gu_packed, gu_packed, gu_packed,      # 4 column views
      gu_scales, gu_scales, gu_scales, gu_scales,
      down_packed, down_scales)
    return out


def use_fused_mlp() -> bool:
    """Opt-in gate (TRACKIE_FUSED_MLP=1). Measured A/B on the v5e: the
    one-launch fusion is perf-neutral (84.1 vs 83.6 tok/s) — launch
    overhead is NOT the decode bottleneck — and its group-width column
    tiles (256 B contiguous runs) stream w_gu/w_down worse than the
    wide-tile unfused kernels under the DMA-aware tile picker. Kept for
    future wide-tile fusion work."""
    import os

    return os.environ.get("TRACKIE_FUSED_MLP") == "1"


def _can_fuse(x: jnp.ndarray, w_gu, w_down) -> bool:
    if not isinstance(w_gu, QuantizedLinear) or not isinstance(
            w_down, QuantizedLinear):
        return False
    if w_gu.values.dtype != jnp.uint8 or w_down.values.dtype != jnp.uint8:
        return False
    m, d = x.shape
    if m > 8:
        return False
    h = w_gu.values.shape[1] // 2
    g = d // w_gu.scales.shape[0]
    if w_down.scales.shape[0] * g != h:
        return False  # mismatched group sizes
    if (h // 2) % g != 0 or (d // 2) % g != 0:
        return False
    # TPU tiling legality: hidden tiles are (d/2, g) / (g, d) blocks
    if g % 128 != 0 or d % 256 != 0:
        return False
    return True


def fused_mlp(x: jnp.ndarray, norm_scale: jnp.ndarray,
              w_gu, w_down, eps: float) -> jnp.ndarray:
    """Dispatching front end: Pallas fused kernel on TPU for small-M Q4,
    XLA oracle otherwise. Drop-in for the norm->gu->silu->down->residual
    block in models.llm.

    Callers should gate on :func:`use_fused_mlp` (models.llm._mlp_block
    does) — when the gate is off, the composable per-matmul Pallas path
    is faster than this kernel's fallback oracle."""
    from trackiellm_tpu.ops.backend import on_tpu

    if on_tpu() and _can_fuse(x, w_gu, w_down):
        return fused_mlp_q4_pallas(
            x, norm_scale, w_gu.values, w_gu.scales,
            w_down.values, w_down.scales, eps=eps)
    return fused_mlp_xla(x, norm_scale, w_gu, w_down, eps)
