#!/usr/bin/env python
"""Attribute the ~1.0 ms layer-independent decode intercept.

Variants (7B Q4, attn bucket 256, host loop, value-fetch sync):
  base      — decode_step as shipped
  no_embed  — token embedding replaced by a token-dependent constant
              row (tests the XLA single-row gather from the 262 MB
              bf16 table — a classic bad lowering)
  embed_dot — embedding via one-hot (1, V) @ (V, D) matmul instead of
              gather (the standard TPU workaround if gather is slow)
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

N_WARMUP = 4
N_DECODE = 32


def make_variant(embed_mode):
    def step(params, cfg, token, cache, attn_len=None):
        pos = cache.length
        freqs = llm_model._rope_freqs(cfg)
        if embed_mode == "gather":
            x = params["tok_emb"][token][None]
        elif embed_mode == "none":
            x = jnp.full((1, cfg.dim), 1e-4, params["tok_emb"].dtype) * (
                1.0 + token.astype(jnp.float32) * 1e-6)
        else:  # onehot
            onehot = (jnp.arange(cfg.vocab_size) == token).astype(
                params["tok_emb"].dtype)[None]
            x = jnp.matmul(onehot, params["tok_emb"],
                           preferred_element_type=jnp.float32).astype(
                params["tok_emb"].dtype)

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
            x = llm_model._mlp_block(x, layer["mlp_norm"], layer["w_gu"],
                                     layer["w_down"], cfg.norm_eps)
            return x, (k_cache_l, v_cache_l)

        x, (new_k, new_v) = jax.lax.scan(
            layer_fn, x, (params["layers"], cache.k, cache.v))
        logits = llm_model._linear(
            llm_model._rms_norm(x, params["out_norm"], cfg.norm_eps),
            params["lm_head"])[0]
        return logits.astype(jnp.float32), llm_model.KVCache(new_k, new_v,
                                                             pos + 1)

    return jax.jit(functools.partial(step, attn_len=256),
                   static_argnames=("cfg",))


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    cfg = llm_model.LLMConfig.mistral_7b()._replace(
        max_seq=1024, sliding_window=1024)
    params = llm_model.init_params_quantized(key, cfg, bits=4)

    for mode in ("gather", "none", "onehot"):
        fn = make_variant(mode)
        cache = llm_model.KVCache.create(cfg)
        tokens = jax.random.randint(key, (128,), 0, cfg.vocab_size,
                                    jnp.int32)
        logits, cache = llm_model.prefill(params, cfg, tokens,
                                          jnp.int32(128), cache)
        tok = jnp.argmax(logits).astype(jnp.int32)
        for _ in range(N_WARMUP):
            logits, cache = fn(params, cfg, tok, cache)
            tok = jnp.argmax(logits).astype(jnp.int32)
        int(tok)
        t0 = time.perf_counter()
        for _ in range(N_DECODE):
            logits, cache = fn(params, cfg, tok, cache)
            tok = jnp.argmax(logits).astype(jnp.int32)
        int(tok)
        dt = (time.perf_counter() - t0) / N_DECODE
        print(f"embed={mode:7s} {dt * 1e3:7.2f} ms/token "
              f"{1 / dt:7.2f} tok/s", flush=True)


if __name__ == "__main__":
    main()
