#!/usr/bin/env python
"""Attribute the per-layer decode cost (0.30 ms/layer vs 0.137 ms
theoretical weight stream at 819 GB/s).

Variants (7B Q4 W4A8 geometry, 32 scan layers, host loop, value-fetch
sync, fresh seeds):

  full       — decode_step as shipped (norms+rope+attention+KV+4 matmuls)
  matmul4    — scan body = the same 4 quantized matvecs ONLY (no norm,
               rope, attention, KV update); same weight bytes
  matmul1    — scan body = ONE giant fused matvec per layer with the
               same total packed bytes (K=4096, N=53248): the grid-step
               floor at maximal amortization
  The gap full-matmul4 = XLA glue; matmul4-matmul1 = per-call overhead
  + tile-plan inefficiency; matmul1 vs 0.137 ms = kernel stream gap.
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

from trackiellm_tpu.models import llm as llm_model  # noqa: E402
from trackiellm_tpu.ops import quant  # noqa: E402

N_WARMUP = 4
N_DECODE = 32
L = 32
DIM = 4096


def bench_loop(fn, state):
    out = state
    for _ in range(N_WARMUP):
        out = fn(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(N_DECODE):
        out = fn(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / N_DECODE


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    cfg = llm_model.LLMConfig.mistral_7b()._replace(
        max_seq=1024, sliding_window=1024)

    # --- full decode step -------------------------------------------------
    t = time.perf_counter()
    params = llm_model.init_params_quantized(key, cfg, bits=4)
    jax.block_until_ready(params["lm_head"])
    print(f"[init {time.perf_counter() - t:.0f}s]", flush=True)
    cache = llm_model.KVCache.create(cfg)
    tokens = jax.random.randint(key, (128,), 0, cfg.vocab_size, jnp.int32)
    t = time.perf_counter()
    _, cache = llm_model.prefill(params, cfg, tokens, jnp.int32(128), cache)
    print(f"[prefill {time.perf_counter() - t:.0f}s]", flush=True)

    skip = os.environ.get("DIAG_SKIP", "").split(",")
    step = functools.partial(llm_model.decode_step, attn_len=256)

    def full_fn(state):
        tok, cache = state
        logits, cache = step(params, cfg, tok, cache)
        return jnp.argmax(logits).astype(jnp.int32), cache

    if "full" not in skip:
        dt = bench_loop(full_fn, (jnp.int32(5), cache))
        print(f"full      {dt * 1e3:7.2f} ms/token  {1 / dt:7.2f} tok/s",
              flush=True)

    # --- 4 matmuls only ---------------------------------------------------
    layers = params["layers"]

    @jax.jit
    def matmul4(x, layers):
        def body(x, layer):
            qkv = quant.quantized_matmul(x, layer["wqkv"])
            x = x + quant.quantized_matmul(
                qkv[:, :DIM] * 1e-3, layer["wo"])
            gu = quant.quantized_matmul(x, layer["w_gu"])
            gate, up = jnp.split(gu, 2, axis=-1)
            x = x + quant.quantized_matmul(
                (gate * up * 1e-6).astype(x.dtype), layer["w_down"])
            return x.astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, layers)
        return x

    x0 = jax.random.normal(key, (1, DIM), jnp.bfloat16) * 0.02

    def m4_fn(x):
        return matmul4(x, layers)

    if "matmul4" not in skip:
        dt4 = bench_loop(m4_fn, x0)
        print(f"matmul4   {dt4 * 1e3:7.2f} ms/token  (glue = full - this)",
              flush=True)

    # --- 1 giant matmul with the same bytes per layer ----------------------
    # per-layer packed bytes: (6144+4096+28672*2)*4096/2 ≈ 109.2 MB
    # real per-layer packed bytes = 12.6M (wqkv) + 8.4M (wo) + 58.7M
    # (w_gu) + 29.4M (w_down) ≈ 109.1 MB; at K=4096 (half rows 2048)
    # that is N = 109.1e6 / 2048 ≈ 53248 columns.
    n_total = 53248
    del params, layers, cache, full_fn, matmul4, m4_fn  # free 3.9 GB HBM
    big = []
    for i in range(L):
        w8 = jax.random.randint(
            jax.random.fold_in(key, i), (DIM // 2, n_total), 0, 255,
            jnp.int32).astype(jnp.uint8)
        sc = (jax.random.uniform(
            jax.random.fold_in(key, 1000 + i),
            (DIM // quant.DEFAULT_GROUP, n_total)) * 0.01 + 0.001)
        big.append(quant.QuantizedLinear(values=w8, scales=sc))
    big = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *big)

    @jax.jit
    def matmul1(x, big):
        def body(x, layer):
            y = quant.quantized_matmul(x, layer)
            return (x + y[:, :DIM] * 1e-3).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, big)
        return x

    dt1 = bench_loop(lambda x: matmul1(x, big), x0)
    bytes_per_layer = (DIM // 2) * n_total + \
        (DIM // quant.DEFAULT_GROUP) * n_total * big.scales.dtype.itemsize
    gbs = bytes_per_layer * L / dt1 / 1e9
    print(f"matmul1   {dt1 * 1e3:7.2f} ms/token  ({gbs:6.1f} GB/s effective)",
          flush=True)

    # --- HBM ceiling: XLA's own bf16 matvec over the same byte volume ------
    # 8 layers x (4096, 26624) bf16 = 218 MB/layer; XLA's matvec kernels
    # are the best available streaming baseline on this stack. This is
    # the honest "speed of light" for a weight-streaming decode step.
    del big
    n_bf = 26624
    bf_l = 8
    wbf = jnp.stack([
        (jax.random.normal(jax.random.fold_in(key, 5000 + i),
                           (DIM, n_bf), jnp.bfloat16) * 0.02)
        for i in range(bf_l)])

    @jax.jit
    def bf16_stream(x, wbf):
        def body(x, w):
            y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
            return (x + y[:, :DIM] * 1e-3).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, wbf)
        return x

    dtb = bench_loop(lambda x: bf16_stream(x, wbf), x0)
    gbs_b = DIM * n_bf * 2 * bf_l / dtb / 1e9
    print(f"bf16x{bf_l}    {dtb * 1e3:7.2f} ms/pass   ({gbs_b:6.1f} GB/s "
          "XLA ceiling)", flush=True)


if __name__ == "__main__":
    main()
