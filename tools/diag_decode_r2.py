#!/usr/bin/env python
"""Round-2 decode cost attribution on the real chip (7B Q4).

A/B variants of the decode step, all timed with the bench.py method
(host-driven loop, token feedback, growing cache — defeats relay
memoization):

  base        — decode_step as shipped (today: ~83.6 tok/s)
  donate      — same program, KV cache donated (in-place update instead
                of a full-cache copy per step)
  no_lmhead   — decode_step minus final norm + lm_head (isolates the
                "fixed" cost the round-1 diagnostic attributed to it)
  no_attn     — attention read replaced by a zero vector (cache write
                and scan carry kept) — isolates decode_attention cost
  donate4096  — donation A/B at the e2e max_seq=4096 cache size
                (512 MB KV: the copy should hurt much more there)
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
from trackiellm_tpu.ops.quant import quantized_matmul  # noqa: E402

N_WARMUP = 4
N_DECODE = 32


def time_loop(step_fn, params, cfg, cache, first_logits, label):
    tok = jnp.argmax(first_logits).astype(jnp.int32)
    for _ in range(N_WARMUP):
        logits, cache = step_fn(params, cfg, tok, cache)
        tok = jnp.argmax(logits).astype(jnp.int32)
    int(tok)
    t0 = time.perf_counter()
    for _ in range(N_DECODE):
        logits, cache = step_fn(params, cfg, tok, cache)
        tok = jnp.argmax(logits).astype(jnp.int32)
    int(tok)
    dt = (time.perf_counter() - t0) / N_DECODE
    print(f"{label:14s} {dt * 1e3:8.2f} ms/token  {1.0 / dt:7.2f} tok/s",
          flush=True)
    return dt


def decode_step_no_lmhead(params, cfg, token, cache, attn_len=None):
    """decode_step with the final norm+lm_head removed (returns a fake
    (V,) logits vector built from x so argmax feedback still works)."""
    pos = cache.length
    freqs = llm_model._rope_freqs(cfg)
    x = params["tok_emb"][token][None]

    def layer_fn(carry, inputs):
        x = carry
        layer, k_cache_l, v_cache_l = inputs
        qd = cfg.n_heads * cfg.head_dim
        kvd = cfg.n_kv_heads * cfg.head_dim
        h = llm_model._rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        qkv = llm_model._linear(h, layer["wqkv"])
        q = qkv[:, :qd].reshape(1, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        q = llm_model.apply_rope(q, pos[None], freqs)
        k = llm_model.apply_rope(k, pos[None], freqs)
        k_cache_l = jax.lax.dynamic_update_slice(
            k_cache_l, k.astype(k_cache_l.dtype), (pos, 0, 0))
        v_cache_l = jax.lax.dynamic_update_slice(
            v_cache_l, v.astype(v_cache_l.dtype), (pos, 0, 0))
        from trackiellm_tpu.ops.attention import decode_attention
        k_view = k_cache_l[:attn_len] if attn_len else k_cache_l
        v_view = v_cache_l[:attn_len] if attn_len else v_cache_l
        attn = decode_attention(q[0], k_view, v_view, pos + 1, window=0)
        x = x + llm_model._linear(attn.reshape(1, -1).astype(x.dtype),
                                  layer["wo"])
        h2 = llm_model._rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        gu = llm_model._linear(h2, layer["w_gu"]).astype(jnp.float32)
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + llm_model._linear((jax.nn.silu(gate) * up).astype(x.dtype),
                                  layer["w_down"])
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v))
    fake = jnp.tile(x[0], cfg.vocab_size // cfg.dim + 1)[:cfg.vocab_size]
    return fake.astype(jnp.float32), llm_model.KVCache(new_k, new_v, pos + 1)


def decode_step_no_attn(params, cfg, token, cache, attn_len=None):
    """decode_step with the attention read replaced by zeros (cache
    write + carry kept): isolates decode_attention's cost."""
    pos = cache.length
    freqs = llm_model._rope_freqs(cfg)
    x = params["tok_emb"][token][None]

    def layer_fn(carry, inputs):
        x = carry
        layer, k_cache_l, v_cache_l = inputs
        qd = cfg.n_heads * cfg.head_dim
        kvd = cfg.n_kv_heads * cfg.head_dim
        h = llm_model._rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        qkv = llm_model._linear(h, layer["wqkv"])
        q = qkv[:, :qd].reshape(1, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        q = llm_model.apply_rope(q, pos[None], freqs)
        k = llm_model.apply_rope(k, pos[None], freqs)
        k_cache_l = jax.lax.dynamic_update_slice(
            k_cache_l, k.astype(k_cache_l.dtype), (pos, 0, 0))
        v_cache_l = jax.lax.dynamic_update_slice(
            v_cache_l, v.astype(v_cache_l.dtype), (pos, 0, 0))
        attn = (q * 1e-9).reshape(1, -1)  # keep q live, skip cache read
        x = x + llm_model._linear(attn.astype(x.dtype), layer["wo"])
        h2 = llm_model._rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        gu = llm_model._linear(h2, layer["w_gu"]).astype(jnp.float32)
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + llm_model._linear((jax.nn.silu(gate) * up).astype(x.dtype),
                                  layer["w_down"])
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v))
    logits = llm_model._linear(
        llm_model._rms_norm(x, params["out_norm"], cfg.norm_eps),
        params["lm_head"])[0]
    return logits.astype(jnp.float32), llm_model.KVCache(new_k, new_v,
                                                         pos + 1)


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)

    for max_seq, variants in (
        (1024, ("base", "donate", "no_lmhead", "no_attn")),
        (4096, ("base", "donate")),
    ):
        cfg = llm_model.LLMConfig.mistral_7b()._replace(
            max_seq=max_seq, sliding_window=max_seq)
        params = llm_model.init_params_quantized(key, cfg, bits=4)
        attn_len = 256

        base = jax.jit(
            functools.partial(llm_model.decode_step.__wrapped__,
                              attn_len=attn_len),
            static_argnames=("cfg",))
        donate = jax.jit(
            functools.partial(llm_model.decode_step.__wrapped__,
                              attn_len=attn_len),
            static_argnames=("cfg",), donate_argnums=(3,))
        no_lm = jax.jit(
            functools.partial(decode_step_no_lmhead, attn_len=attn_len),
            static_argnames=("cfg",))
        no_at = jax.jit(
            functools.partial(decode_step_no_attn, attn_len=attn_len),
            static_argnames=("cfg",))
        fns = {"base": base, "donate": donate, "no_lmhead": no_lm,
               "no_attn": no_at}

        print(f"--- max_seq={max_seq} ---", flush=True)
        for name in variants:
            cache = llm_model.KVCache.create(cfg)
            tokens = jax.random.randint(key, (128,), 0, cfg.vocab_size,
                                        jnp.int32)
            logits, cache = llm_model.prefill(params, cfg, tokens,
                                              jnp.int32(128), cache)
            logits.block_until_ready()
            time_loop(fns[name], params, cfg, cache, logits, name)
        del params


if __name__ == "__main__":
    main()
