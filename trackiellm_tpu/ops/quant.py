"""Group-quantized weights + fused dequant-matmul Pallas kernels.

Parity target: llama.cpp's GGUF Q8_0/Q4_0 weight formats and their
dequant-matmul kernels, which the reference's LLM runner rides for the
Mistral-7B decode loop (reference: src/ai_models/tk_model_runner.h:38-225,
tk_runner_streaming.c:60-84 — llama.cpp owns the kernels).

TPU design: decode matvec is HBM-bandwidth-bound, so the win is reading
1 byte (Q8) or 0.5 byte (Q4) per weight instead of 2-4. The Pallas kernels
stream int8/packed-int4 weight tiles HBM->VMEM, dequantize on the VPU
(convert + per-group scale), and feed the MXU — the f32 weights never
exist in HBM. Group scales are laid out as (K/G, N) so a (TILE_K, TILE_N)
weight tile needs a single (TILE_K/G, TILE_N) scale tile.

Q4 packing: two int4 values share one uint8 *across the K halves* —
packed[k, n] holds w[k, n] (low nibble) and w[k + K/2, n] (high nibble).
This keeps unpacking free of sublane interleaving: the kernel computes
x_lo @ W_lo + x_hi @ W_hi with two clean tiles.

All kernels have an XLA reference path (`*_xla`) used on CPU (tests) and
as a numerics oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_GROUP = 256


def _on_tpu() -> bool:
    from trackiellm_tpu.ops.backend import on_tpu
    return on_tpu()


# ---------------------------------------------------------------------------
# Quantized weight containers (pytrees — live inside model param trees)
# ---------------------------------------------------------------------------

class QuantizedLinear(NamedTuple):
    """Group-quantized (K, N) weight. ``bits`` is static metadata."""

    values: jnp.ndarray  # int8: (K, N) for Q8; packed uint8 (K//2, N) for Q4
    scales: jnp.ndarray  # f32 (K // group, N)

    @property
    def group_size(self) -> int:
        k = self.values.shape[0] * (2 if self.values.dtype == jnp.uint8 else 1)
        return k // self.scales.shape[0]

    @property
    def k(self) -> int:
        return self.values.shape[0] * (2 if self.values.dtype == jnp.uint8 else 1)

    @property
    def n(self) -> int:
        return self.values.shape[1]


def quantize_q8(w: jnp.ndarray, group: int = DEFAULT_GROUP) -> QuantizedLinear:
    """Symmetric int8 group quantization of a (K, N) weight (GGUF Q8_0
    semantics: per-group absmax scale, values in [-127, 127])."""
    k, n = w.shape
    assert k % group == 0, f"K={k} not divisible by group={group}"
    wg = w.astype(jnp.float32).reshape(k // group, group, n)
    scale = jnp.max(jnp.abs(wg), axis=1) / 127.0  # (K/G, N)
    safe = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wg / safe[:, None, :]), -127, 127).astype(jnp.int8)
    return QuantizedLinear(values=q.reshape(k, n), scales=scale)


def quantize_q4(w: jnp.ndarray, group: int = DEFAULT_GROUP) -> QuantizedLinear:
    """Symmetric int4 group quantization, values in [-8, 7], packed two per
    uint8 across the K halves (see module docstring).

    MIXED-BIAS nibble encoding, chosen so BOTH nibbles unpack with one
    8-bit-lane AND + a same-width bitcast (no i32 round trip, no vector
    shift — neither lowers cheaply in Mosaic):
      - low nibble  = q_lo + 8 (biased [0, 15]) — ``packed & 0x0F``
        read as i8 gives q_lo + 8; the bias folds into a per-group
        scalar correction (x @ (q+8) s == (x @ q) s + 8 s sum(x)).
      - high nibble = q_hi two's-complement — ``packed & 0xF0`` read as
        i8 gives EXACTLY q_hi * 16; the 1/16 folds into the scale
        application. No bias correction needed for this half at all.
    """
    k, n = w.shape
    assert k % group == 0 and (k // 2) % group == 0
    wg = w.astype(jnp.float32).reshape(k // group, group, n)
    scale = jnp.max(jnp.abs(wg), axis=1) / 7.0
    safe = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wg / safe[:, None, :]), -8, 7).astype(jnp.int32)
    q = q.reshape(k, n)
    lo = (q[: k // 2] + 8).astype(jnp.uint8)        # biased to [0, 15]
    hi = (q[k // 2:] & 0xF).astype(jnp.uint8)       # two's complement
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return QuantizedLinear(values=packed, scales=scale)


def dequantize(qw: QuantizedLinear) -> jnp.ndarray:
    """Reference dequantization to f32 (K, N)."""
    if qw.values.dtype == jnp.int8:
        k, n = qw.values.shape
        g = k // qw.scales.shape[0]
        vals = qw.values.astype(jnp.float32).reshape(-1, g, n)
        return (vals * qw.scales[:, None, :]).reshape(k, n)
    # Q4 packed (mixed-bias: lo biased +8, hi two's complement)
    packed = qw.values
    half, n = packed.shape
    k = half * 2
    g = k // qw.scales.shape[0]
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (((packed >> 4) & 0xF).astype(jnp.int32) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    return (q.reshape(-1, g, n) * qw.scales[:, None, :]).reshape(k, n)


# ---------------------------------------------------------------------------
# XLA reference matmul
# ---------------------------------------------------------------------------

def quantized_matmul_xla(x: jnp.ndarray, qw: QuantizedLinear) -> jnp.ndarray:
    """Oracle path: dequantize then matmul (used on CPU / for testing)."""
    w = dequantize(qw)
    return jnp.matmul(
        x.astype(jnp.float32), w, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# Pallas Q8 kernel
# ---------------------------------------------------------------------------

def _select_scale_row(s_ref, gid, factor: float = 1.0) -> jnp.ndarray:
    """Pick row ``gid`` of the (n_groups, TN) scale block as a (1, TN)
    vector via a one-hot matmul — Mosaic rejects dynamic sublane slices
    whose alignment it can't prove, but a tiny static-shape dot is free.
    (A VPU mask+sublane-reduce variant was A/B'd at -1.5%: the one-hot
    MXU dot stays.) ``factor`` scales the selected row for free (folded
    into the one-hot) — used for the high nibble's 1/16."""
    n_groups = s_ref.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, n_groups), 1)
              == gid).astype(jnp.float32) * factor
    return jnp.dot(onehot, s_ref[:], preferred_element_type=jnp.float32)


def _q8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group: int):
    """Grid (nN, nK); K is the innermost (sequential) axis so the VMEM
    accumulator carries across K tiles of one N tile.

    Within a quantization group the scale is constant along K, so
    ``x_g @ (w_g * s_g) == (x_g @ w_g) * s_g`` — the kernel runs one raw
    dot per group and applies the (1, TN) scale row to the (M, TN)
    partial product, which is cheaper than materializing a dequantized
    (TK, TN) tile and keeps every shape static."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpt = w_ref.shape[0] // group  # groups per K tile
    for j in range(gpt):
        sl = slice(j * group, (j + 1) * group)
        part = jnp.dot(
            x_ref[:, sl].astype(jnp.float32),
            w_ref[sl, :].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        s_g = _select_scale_row(s_ref, k_idx * gpt + j)
        acc_ref[:] += part * s_g

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def q8_matmul_pallas(
    x: jnp.ndarray,
    values: jnp.ndarray,
    scales: jnp.ndarray,
    tile_n: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8-dequant matmul: (M, K) @ q8(K, N) -> (M, N) f32."""
    m, k = x.shape
    n = values.shape[1]
    g = k // scales.shape[0]
    tile_k = min(tile_k, k)
    tile_n = min(tile_n, n)
    assert k % tile_k == 0 and n % tile_n == 0 and tile_k % g == 0

    grid = (n // tile_n, k // tile_k)
    return pl.pallas_call(
        functools.partial(_q8_kernel, group=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tile_k), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, tile_n), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=k * n + (k // g) * n * 4 + m * k * 4 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, values, scales)


# ---------------------------------------------------------------------------
# Pallas Q4 kernel (half-split packing)
# ---------------------------------------------------------------------------

def _q4_kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, o_ref, acc_ref,
               *, group: int):
    """f32-activation path over the MIXED-BIAS packing (quantize_q4):
    low nibble is biased [0, 15] — its -8 folds into a per-group scalar
    correction (``x @ (q+8) s == (x @ q) s + 8 s sum(x)``); the high
    nibble is two's complement read as i8 (= q*16, one 8-bit AND), its
    1/16 folded into the scale row selection. (bf16 dots were tried and
    are SLOWER here: i32->bf16 conversion forces a sublane relayout,
    i32->f32 does not.)"""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[:]
    lo = (packed.astype(jnp.int32) & 0xF).astype(jnp.float32)  # q+8
    hi = ((packed & 0xF0).astype(jnp.int8)                     # q*16
          ).astype(jnp.int32).astype(jnp.float32)
    gpt = w_ref.shape[0] // group
    for j in range(gpt):
        sl = slice(j * group, (j + 1) * group)
        gid = k_idx * gpt + j
        x_lo = xlo_ref[:, sl].astype(jnp.float32)
        x_hi = xhi_ref[:, sl].astype(jnp.float32)
        part_lo = jnp.dot(x_lo, lo[sl, :],
                          preferred_element_type=jnp.float32)
        part_hi = jnp.dot(x_hi, hi[sl, :],
                          preferred_element_type=jnp.float32)
        bias_lo = 8.0 * jnp.sum(x_lo, axis=1, keepdims=True)  # (M, 1)
        acc_ref[:] += (part_lo - bias_lo) * _select_scale_row(slo_ref, gid)
        acc_ref[:] += part_hi * _select_scale_row(shi_ref, gid,
                                                  factor=1.0 / 16.0)

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def q4_matmul_pallas(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    tile_n: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int4-dequant matmul: (M, K) @ q4(K, N) -> (M, N) f32.

    ``tile_k`` tiles the *packed* K/2 axis; each kernel step therefore
    consumes 2*tile_k logical K rows (one from each half).
    """
    m, k = x.shape
    half = packed.shape[0]
    n = packed.shape[1]
    assert half * 2 == k
    g = k // scales.shape[0]
    tile_k = min(tile_k, half)
    tile_n = min(tile_n, n)
    assert half % tile_k == 0 and n % tile_n == 0 and tile_k % g == 0

    x_lo, x_hi = x[:, :half], x[:, half:]
    s_lo, s_hi = scales[: half // g], scales[half // g:]

    grid = (n // tile_n, half // tile_k)
    n_groups_half = half // g
    return pl.pallas_call(
        functools.partial(_q4_kernel, group=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tile_k), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_k), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups_half, tile_n), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups_half, tile_n), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=half * n + (k // g) * n * 4 + m * k * 4 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_lo, x_hi, packed, s_lo, s_hi)


# ---------------------------------------------------------------------------
# Pallas Q4 kernel v2: in-kernel double-buffered HBM streaming
# ---------------------------------------------------------------------------

def _q4_stream_kernel(xlo_ref, xhi_ref, w_hbm, slo_ref, shi_ref, o_ref,
                      acc_ref, wbuf, sem, *, group: int, tile_k: int,
                      tile_n: int):
    """Grid is (nN,) only: each program streams the ENTIRE K dimension
    of its N tile through a 2-slot VMEM buffer with manual async DMA.
    Compared with the grid-tiled v1 this trades ~K/tile_k Mosaic grid
    steps (~3 us each in this environment) for an in-kernel fori_loop
    (~ns each), and overlaps each chunk's DMA with the previous chunk's
    dequant+dot."""
    ni = pl.program_id(0)
    half = w_hbm.shape[0]
    n_chunks = half // tile_k
    gpt = tile_k // group
    col0 = pl.multiple_of(ni * tile_n, 128)

    def get_dma(slot, idx):
        row0 = pl.multiple_of(idx * tile_k, 128)
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(row0, tile_k), pl.ds(col0, tile_n)],
            wbuf.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0).start()
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(slot, i).wait()
        packed = wbuf[slot].astype(jnp.int32)
        lo = ((packed & 0xF) - 8).astype(jnp.float32)
        hi = ((((packed >> 4) & 0xF) ^ 8) - 8).astype(jnp.float32)
        for j in range(gpt):
            sl = pl.ds(pl.multiple_of(i * tile_k, 128) + j * group, group)
            gid = i * gpt + j
            part_lo = jnp.dot(xlo_ref[:, sl].astype(jnp.float32),
                              lo[j * group:(j + 1) * group, :],
                              preferred_element_type=jnp.float32)
            part_hi = jnp.dot(xhi_ref[:, sl].astype(jnp.float32),
                              hi[j * group:(j + 1) * group, :],
                              preferred_element_type=jnp.float32)
            acc_ref[:] += part_lo * _select_scale_row(slo_ref, gid)
            acc_ref[:] += part_hi * _select_scale_row(shi_ref, gid)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def q4_matmul_pallas_v2(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    tile_n: int = 2048,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int4-dequant matmul with in-kernel HBM streaming.

    EXPERIMENTAL — measured SLOWER than the grid-tiled v1 on this v5e
    (47-59 GB/s vs 61 on the w_gu shape): Mosaic's automatic grid
    pipelining outperforms this manual double-buffer. Kept as the
    starting point for a future fused-layer streaming kernel; the
    dispatcher ships v1."""
    m, k = x.shape
    half, n = packed.shape
    assert half * 2 == k
    g = k // scales.shape[0]
    tile_k = min(tile_k, half)
    tile_n = min(tile_n, n)
    assert half % tile_k == 0 and n % tile_n == 0 and tile_k % g == 0

    x_lo, x_hi = x[:, :half], x[:, half:]
    s_lo, s_hi = scales[: half // g], scales[half // g:]
    n_groups_half = half // g

    return pl.pallas_call(
        functools.partial(_q4_stream_kernel, group=g, tile_k=tile_k,
                          tile_n=tile_n),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m, half), lambda ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, half), lambda ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights stay in HBM
            pl.BlockSpec((n_groups_half, tile_n), lambda ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups_half, tile_n), lambda ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda ni: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, tile_n), jnp.float32),
            pltpu.VMEM((2, tile_k, tile_n), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=half * n + (k // g) * n * 4 + m * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_lo, x_hi, packed, s_lo, s_hi)


# ---------------------------------------------------------------------------
# Dispatching front-end
# ---------------------------------------------------------------------------

def _pick_tile(dim: int, preferred: int, align: int = 128) -> int:
    """Largest multiple of ``align`` that divides ``dim``, capped at
    ``preferred``; falls back to ``dim`` itself (full-dim blocks are
    always legal)."""
    t = min(preferred, dim)
    t -= t % align
    while t >= align:
        if dim % t == 0:
            return t
        t -= align
    return dim


# VMEM is 16 MB; Mosaic double-buffers each input block. Large tiles
# minimize grid steps (each step costs ~3 us of launch overhead in this
# environment — the dominant cost for decode matvecs, PERF_NOTES.md),
# but the x/scale/accumulator footprint grows with M, so the picker
# estimates the whole working set and shrinks until it fits.
# Mosaic's real scoped-vmem stack runs ~1.5x _vmem_estimate at wide
# blocks against a 16 MB hard limit, and the compile-OOM boundary was
# probed on-chip (tools/diag_vmem_tiles.py): est 10.91M compiles, est
# 11.40M OOMs ("Scoped allocation 16.84M > 16.00M" — the M=256 prime
# chunk's down-proj). 10.5*1024^2 keeps every probed-OK plan and
# rejects the failing one; g=256 decode-sized (m<=8) picks unchanged.
_VMEM_BUDGET = int(10.5 * 1024 * 1024)
_MAX_TILE_N = 4096


def _vmem_estimate(m: int, tile_k: int, tile_n: int, k_rows: int,
                   g: int, halves: int) -> int:
    w = 2 * tile_k * tile_n                      # packed/int8, x2 buffers
    scales = 2 * halves * (k_rows // g) * tile_n * 4
    x = 2 * halves * m * tile_k * 4
    acc = m * tile_n * 4
    out = 2 * m * tile_n * 4
    return w + scales + x + acc + out


def _pick_tiles_for(k_rows: int, n: int, g: int, m: int,
                    halves: int, max_wide_w: int = 4_500_000,
                    max_wide_n: int = 1 << 30) -> Tuple[int, int]:
    """Choose (tile_k, tile_n) within VMEM, preferring WIDE tiles.

    DMA efficiency dominates the decode matvec: a (tile_k, tile_n)
    block of a row-major (K, N) array is tile_k strided runs of tile_n
    bytes, and short runs (1-2 KB at the old square-ish tiles) stream
    HBM below peak (wide tiles measured +2.9% end-to-end). Mosaic's
    real scoped-stack use runs ~2x the estimator at very wide blocks
    (a (256, 16000) plan estimated ~10 MB but compiled to 23.8 MB
    scoped), so the double-buffered weight block is capped at
    ``max_wide_w`` bytes and the width at ``max_wide_n`` (the i8
    kernel's activations are 4x smaller, so its caller raises both).
    ``k_rows`` is the stored row count (packed rows for Q4)."""
    for tn in (n, n // 2, n // 4):
        if tn < 128 or tn > max_wide_n or n % tn or tn % 128:
            continue
        tk = max(_pick_tile(k_rows, k_rows, align=g), g)
        while tk > g and (2 * tk * tn > max_wide_w or _vmem_estimate(
                m, tk, tn, k_rows, g, halves) > _VMEM_BUDGET):
            tk = max(_pick_tile(k_rows, tk // 2, align=g), g)
        if (2 * tk * tn <= max_wide_w
                and _vmem_estimate(m, tk, tn, k_rows, g, halves)
                <= _VMEM_BUDGET):
            return tk, tn
    # Narrow fallback (small VMEM vs huge rows): old square-ish search.
    tile_n = _pick_tile(n, _MAX_TILE_N)
    tile_k = max(_pick_tile(k_rows, k_rows, align=g), g)
    while (_vmem_estimate(m, tile_k, tile_n, k_rows, g, halves)
           > _VMEM_BUDGET):
        if tile_k > g and tile_k >= tile_n:
            tile_k = max(_pick_tile(k_rows, tile_k // 2, align=g), g)
        elif tile_n > 512:
            tile_n = _pick_tile(n, tile_n // 2)
        elif tile_k > g:
            tile_k = max(_pick_tile(k_rows, tile_k // 2, align=g), g)
        else:
            break
    return tile_k, tile_n


def quantized_matmul(x: jnp.ndarray, qw: QuantizedLinear) -> jnp.ndarray:
    """(…, K) @ quantized (K, N) -> (…, N) f32. Dispatches to the Pallas
    kernel on TPU and the XLA oracle elsewhere.

    The Q4 TPU path defaults to the W4A8 int8-MXU kernel (nibbles never
    leave 8-bit lanes; llama.cpp parity — it also runs Q4 weights
    against Q8_0-quantized activations). ``TRACKIE_Q4_F32A=1`` opts back
    into the f32-activation kernel (exact activations, slower unpack)."""
    import os

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    m = x2.shape[0]
    g = qw.group_size
    # TRACKIE_PREFILL_XLA_M: route m >= this to XLA dequant-then-matmul
    # (prefill/extend A/B lever; isolated microbenches are meaningless
    # through the relay, so the threshold is set by full-model timing).
    # Hard Pallas M cap (VMEM: the (M, tile_k) activation block scales
    # with M). 512 measured FASTER than the XLA dequant path in-model
    # (PERF_NOTES round-3: bucket-512 prefill 188 -> 103 ms, and the
    # batched admission wave rides the same kernels at M = B*bucket).
    # TRACKIE_PREFILL_XLA_M routes m >= it to XLA dequant-then-matmul
    # (the A/B lever; isolated microbenches are meaningless through the
    # relay, so thresholds are set by full-model timing).
    pallas_max_m = int(os.environ.get("TRACKIE_PALLAS_MAX_M", "512"))
    xla_m = int(os.environ.get("TRACKIE_PREFILL_XLA_M",
                               str(pallas_max_m + 1)))
    if not _on_tpu() or m > pallas_max_m or m >= xla_m:
        out = quantized_matmul_xla(x2, qw)
    elif qw.values.dtype == jnp.int8:
        tile_k, tile_n = _pick_tiles_for(qw.k, qw.n, g, m, halves=1)
        out = q8_matmul_pallas(x2, qw.values, qw.scales,
                               tile_n=tile_n, tile_k=tile_k)
    else:
        half = qw.k // 2
        if os.environ.get("TRACKIE_Q4_F32A") == "1":
            tile_k, tile_n = _pick_tiles_for(half, qw.n, g, m, halves=2)
            out = q4_matmul_pallas(x2, qw.values, qw.scales,
                                   tile_n=tile_n, tile_k=tile_k)
        else:
            # i8 activations leave VMEM headroom for bigger weight
            # tiles (fewer grid steps / DMA issues); 14336-wide is the
            # measured compile-safe limit (16000-wide OOMs the Mosaic
            # scoped stack). TRACKIE_Q4_WIDE_W overrides the
            # double-buffered weight-block byte cap (A/B lever for
            # probing the Mosaic scoped-stack boundary).
            wide_w = int(os.environ.get("TRACKIE_Q4_WIDE_W",
                                        "9000000"))
            tile_k, tile_n = _pick_tiles_for(
                half, qw.n, g, m, halves=2,
                max_wide_w=wide_w, max_wide_n=14336)
            out = q4_matmul_pallas_i8(x2, qw.values, qw.scales,
                                      tile_n=tile_n, tile_k=tile_k)
    return out.reshape(*lead, qw.n)


# ---------------------------------------------------------------------------
# Pallas Q4 kernel, int8-MXU path (W4A8)
# ---------------------------------------------------------------------------

def quantize_activations_q8(x: jnp.ndarray, group: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-(row, group) symmetric int8 activation quantization for the
    W4A8 kernel. Returns (x_i8 (M, K), sx (M, K/G) f32 scales,
    sxsum (M, K/G) f32 = sx * sum(x_i8) per group — the bias-fold term).
    """
    m, k = x.shape
    xg = x.astype(jnp.float32).reshape(m, k // group, group)
    sx = jnp.max(jnp.abs(xg), axis=2) / 127.0            # (M, K/G)
    safe = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(xg / safe[:, :, None]), -127, 127)
    sxsum = sx * jnp.sum(xq, axis=2)                     # (M, K/G)
    return (xq.astype(jnp.int8).reshape(m, k),
            sx.astype(jnp.float32), sxsum.astype(jnp.float32))


def _select_col(ref, gid) -> jnp.ndarray:
    """Pick column ``gid`` of an (M, n_groups) block as (M, 1) via a
    one-hot matmul — Mosaic rejects dynamic lane slices it can't prove
    128-aligned (same workaround as _select_scale_row, lane axis)."""
    n_groups = ref.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (n_groups, 1), 0)
              == gid).astype(jnp.float32)
    return jnp.dot(ref[:], onehot, preferred_element_type=jnp.float32)


def _q4_kernel_i8(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref,
                  sxlo_ref, sxhi_ref, sumlo_ref, o_ref, acc_ref,
                  *, group: int):
    """W4A8 over the MIXED-BIAS packing: both nibbles unpack with ONE
    8-bit-lane AND + a same-width bitcast (measured-legal in Mosaic; no
    i32 round trip, no vector shift), then int8 MXU dots. Per group g:
      lo (biased):  s_g * (sx_g * (x_i8 @ (q+8)) - 8 * sxsum_g)
      hi (two's c): (s_g/16) * sx_g * (x_i8 @ q*16)   — no bias term
    The activation scale sx and the folds are (M, TN) vector math on
    the accumulator."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[:]
    lo = (packed & 0xF).astype(jnp.int8)       # q + 8, 8-bit ops only
    hi = (packed & 0xF0).astype(jnp.int8)      # q * 16
    gpt = w_ref.shape[0] // group
    for j in range(gpt):
        sl = slice(j * group, (j + 1) * group)
        gid = k_idx * gpt + j
        dot_lo = jnp.dot(xlo_ref[:, sl], lo[sl, :],
                         preferred_element_type=jnp.int32).astype(jnp.float32)
        dot_hi = jnp.dot(xhi_ref[:, sl], hi[sl, :],
                         preferred_element_type=jnp.int32).astype(jnp.float32)
        s_lo = _select_scale_row(slo_ref, gid)            # (1, TN)
        s_hi = _select_scale_row(shi_ref, gid, factor=1.0 / 16.0)
        sx_lo = _select_col(sxlo_ref, gid)                # (M, 1)
        sx_hi = _select_col(sxhi_ref, gid)
        sum_lo = _select_col(sumlo_ref, gid)
        acc_ref[:] += (dot_lo * sx_lo - 8.0 * sum_lo) * s_lo
        acc_ref[:] += (dot_hi * sx_hi) * s_hi

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def q4_matmul_pallas_i8(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    tile_n: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused W4A8 matmul: (M, K) f32 @ q4(K, N) -> (M, N) f32 via int8
    MXU dots over the mixed-bias packing — the default TPU decode path
    (llama.cpp also runs Q4 matmuls against Q8-quantized activations);
    ~0.5% relative activation-quantization error vs the f32 path."""
    m, k = x.shape
    half, n = packed.shape
    assert half * 2 == k
    g = k // scales.shape[0]
    tile_k = min(tile_k, half)
    tile_n = min(tile_n, n)
    assert half % tile_k == 0 and n % tile_n == 0 and tile_k % g == 0

    xq, sx, sxsum = quantize_activations_q8(x, g)
    x_lo, x_hi = xq[:, :half], xq[:, half:]
    ngh = half // g                                       # groups per half
    sx_lo, sx_hi = sx[:, :ngh], sx[:, ngh:]
    sum_lo = sxsum[:, :ngh]       # hi half is two's complement: no fold
    s_lo, s_hi = scales[:ngh], scales[ngh:]

    grid = (n // tile_n, half // tile_k)
    return pl.pallas_call(
        functools.partial(_q4_kernel_i8, group=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tile_k), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_k), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, tile_n), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, tile_n), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ngh), lambda ni, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ngh), lambda ni, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ngh), lambda ni, ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=half * n + (k // g) * n * 4 + m * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_lo, x_hi, packed, s_lo, s_hi, sx_lo, sx_hi, sum_lo)
