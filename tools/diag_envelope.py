#!/usr/bin/env python
"""Measure the REAL HBM stream envelope + decode composition on this chip.

Everything is timed with fresh per-call inputs and value-fetch syncs.

  envelope_pallas  — pallas kernel streaming a 512 MB u8 array, grid-
                     pipelined, output = scaled tile sums (depends on a
                     fresh scalar input per call)
  envelope_xla     — XLA reduction over the same array times a fresh
                     scalar (one full read)
  decode32/16/8    — today's 7B-Q4 decode host loop at 32/16/8 layers
                     (slope = per-layer cost, intercept = fixed)
  greedy_chunks    — generate_greedy in 16-token chunks (1 execution per
                     16 tokens) vs the host loop (2 executions/token):
                     isolates per-execution relay overhead
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
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from trackiellm_tpu.models import llm as llm_model  # noqa: E402

MB = 1024 * 1024
STREAM_BYTES = 512 * MB
ROWS, COLS = STREAM_BYTES // 4096, 4096
TILE_R = 1024


def _stream_kernel(x_ref, w_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # u8 -> i32 -> f32 (Mosaic has no u8->f32 cast); full-block store
    # (scalar stores to VMEM are not lowerable)
    val = (jnp.sum(w_ref[:].astype(jnp.int32).astype(jnp.float32))
           * x_ref[0, 0])
    acc_ref[:] = acc_ref[:] + val

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@jax.jit
def stream_pallas(x, w):
    return pl.pallas_call(
        _stream_kernel,
        grid=(ROWS // TILE_R,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_R, COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, w)


@jax.jit
def stream_xla(x, w):
    return jnp.sum(w.astype(jnp.float32)) * x[0, 0]


def time_stream(fn, w, label, n=6):
    key = jax.random.PRNGKey(int(time.time() * 1e3) & 0x7FFFFFFF)
    xs = [jax.random.normal(jax.random.fold_in(key, i), (1, 1), jnp.float32)
          for i in range(n + 1)]
    float(jnp.sum(fn(xs[0], w)))
    t0 = time.perf_counter()
    outs = [fn(xi, w) for xi in xs[1:]]
    float(sum(jnp.sum(o) for o in outs))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:18s} {dt * 1e3:8.2f} ms  "
          f"{STREAM_BYTES / dt / 1e9:7.1f} GB/s", flush=True)


def time_decode(params, cfg, label, n_tokens=32):
    cache = llm_model.KVCache.create(cfg)
    key = jax.random.PRNGKey(int(time.time() * 1e3) & 0x7FFFFFFF)
    tokens = jax.random.randint(key, (128,), 0, cfg.vocab_size, jnp.int32)
    logits, cache = llm_model.prefill(params, cfg, tokens, jnp.int32(128),
                                      cache)
    tok = jnp.argmax(logits).astype(jnp.int32)
    for _ in range(4):
        logits, cache = llm_model.decode_step(params, cfg, tok, cache,
                                              attn_len=256)
        tok = jnp.argmax(logits).astype(jnp.int32)
    int(tok)
    t0 = time.perf_counter()
    for _ in range(n_tokens):
        logits, cache = llm_model.decode_step(params, cfg, tok, cache,
                                              attn_len=256)
        tok = jnp.argmax(logits).astype(jnp.int32)
    int(tok)
    dt = (time.perf_counter() - t0) / n_tokens
    print(f"{label:18s} {dt * 1e3:8.2f} ms/token  {1 / dt:7.2f} tok/s",
          flush=True)
    return dt


def time_greedy_chunks(params, cfg, label, chunk=16, n_chunks=3):
    cache = llm_model.KVCache.create(cfg)
    key = jax.random.PRNGKey(int(time.time() * 1e3) & 0x7FFFFFFF)
    tokens = jax.random.randint(key, (128,), 0, cfg.vocab_size, jnp.int32)
    logits, cache = llm_model.prefill(params, cfg, tokens, jnp.int32(128),
                                      cache)
    tok = jnp.argmax(logits).astype(jnp.int32)
    out, cache = llm_model.generate_greedy(params, cfg, tok, cache,
                                           n_tokens=chunk, attn_len=256)
    tok = out[-1]
    int(tok)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out, cache = llm_model.generate_greedy(params, cfg, tok, cache,
                                               n_tokens=chunk, attn_len=256)
        tok = out[-1]
    int(tok)
    dt = (time.perf_counter() - t0) / (n_chunks * chunk)
    print(f"{label:18s} {dt * 1e3:8.2f} ms/token  {1 / dt:7.2f} tok/s",
          flush=True)


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)

    w_u8 = jax.random.randint(key, (ROWS, COLS), 0, 255, jnp.int32
                              ).astype(jnp.uint8)
    time_stream(stream_pallas, w_u8, "envelope_pallas")
    time_stream(stream_xla, w_u8, "envelope_xla")
    del w_u8

    for n_layers in (32, 16, 8):
        cfg = llm_model.LLMConfig.mistral_7b()._replace(
            max_seq=1024, sliding_window=1024, n_layers=n_layers)
        params = llm_model.init_params_quantized(key, cfg, bits=4)
        dt = time_decode(params, cfg, f"decode L={n_layers}")
        if n_layers == 32:
            time_greedy_chunks(params, cfg, "greedy chunks=16")
        del params


if __name__ == "__main__":
    main()
