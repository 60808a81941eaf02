#!/usr/bin/env python
"""On-chip decode/prefill throughput for the Qwen3-Next hybrid family
(models/qwen3next.py) at a ~1B-class shape.

Honest timing per PERF_NOTES: fresh time-seeded weights, value-fetch
sync (block_until_ready is unreliable through the relay). The per-step
decode path is dispatch-pipelined by chaining on-device argmax tokens
(no per-token host fetch); the wall ends on ONE fetch of the final
token.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.models import qwen3next as Q  # noqa: E402

# ~0.9B dense-MLP hybrid: 9 linear + 3 full layers (the 3:1 pattern),
# GQA 16/2 heads of 128, DeltaNet 8 k-heads / 16 v-heads of 128.
CFG = Q.Qwen3NextConfig(
    vocab_size=32000, dim=2048, n_layers=12,
    layer_types=("l", "l", "l", "f") * 3,
    n_heads=16, n_kv_heads=2, head_dim=128,
    lin_k_heads=8, lin_v_heads=16, lin_dk=128, lin_dv=128, conv_k=4,
    hidden_dim=8192, n_experts=0, max_seq=2048)

PREFILL_T = 1024
N_DECODE = 64


def _init(seed: int):
    key = jax.random.PRNGKey(seed)

    def R(k, *shape, s=0.02):
        return jax.random.normal(k, shape, jnp.bfloat16) * s

    keys = iter(jax.random.split(key, 40 * CFG.n_layers + 8))
    layers = []
    d = CFG.dim
    for lt in CFG.layer_types:
        lp = {"attn_norm": jnp.zeros((d,), jnp.bfloat16),
              "mlp_norm": jnp.zeros((d,), jnp.bfloat16)}
        if lt == "f":
            lp.update(
                wq=R(next(keys), d, CFG.n_heads * 2 * CFG.head_dim),
                wk=R(next(keys), d, CFG.n_kv_heads * CFG.head_dim),
                wv=R(next(keys), d, CFG.n_kv_heads * CFG.head_dim),
                wo=R(next(keys), CFG.n_heads * CFG.head_dim, d),
                q_norm=jnp.zeros((CFG.head_dim,), jnp.bfloat16),
                k_norm=jnp.zeros((CFG.head_dim,), jnp.bfloat16))
        else:
            kd = CFG.lin_k_heads * CFG.lin_dk
            vd = CFG.lin_v_heads * CFG.lin_dv
            lp.update(
                wq=R(next(keys), d, kd), wk=R(next(keys), d, kd),
                wv=R(next(keys), d, vd), wz=R(next(keys), d, vd),
                wb=R(next(keys), d, CFG.lin_v_heads),
                wa=R(next(keys), d, CFG.lin_v_heads),
                conv_w=R(next(keys), CFG.conv_dim, CFG.conv_k, s=0.2),
                dt_bias=jnp.ones((CFG.lin_v_heads,), jnp.float32),
                a_log=jnp.zeros((CFG.lin_v_heads,), jnp.float32),
                o_norm=jnp.ones((CFG.lin_dv,), jnp.bfloat16),
                wo=R(next(keys), vd, d))
        lp["w_gu"] = R(next(keys), d, 2 * CFG.hidden_dim)
        lp["w_down"] = R(next(keys), CFG.hidden_dim, d)
        layers.append(lp)
    return {
        "tok_emb": R(next(keys), CFG.vocab_size, d),
        "layers": layers,
        "out_norm": jnp.zeros((d,), jnp.bfloat16),
        "lm_head": R(next(keys), d, CFG.vocab_size),
    }


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    params = _init(seed)
    bits = int(os.environ.get("TRACKIE_Q3N_BITS", "0"))
    label = "bf16"
    if bits:
        params = Q.quantize_params(params, bits=bits)
        label = f"q{bits}"
    if os.environ.get("TRACKIE_Q3N_FUSED", "0") == "1":
        # Fused input projections (VERDICT r4 #5b lever): one weight
        # stream per layer instead of six. One mode per PROCESS
        # (PERF_NOTES env-lever rule).
        params = Q.fuse_projections(params, CFG)
        label += "_fused"
    jax.block_until_ready(params["out_norm"])

    cache = Q.create_cache(CFG, dtype=jnp.bfloat16)
    prompt = jnp.asarray(
        np.random.default_rng(seed).integers(0, CFG.vocab_size,
                                             PREFILL_T), jnp.int32)

    # Prefill (chunk-parallel delta kernel + attention) — warm, then
    # fresh-weight timing with a value-fetch sync.
    t0 = time.perf_counter()
    logits, cache = Q.prefill(params, CFG, prompt,
                              jnp.int32(PREFILL_T), cache)
    _ = int(jnp.argmax(logits))
    compile_s = time.perf_counter() - t0
    cache = Q.create_cache(CFG, dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    logits, cache = Q.prefill(params, CFG, prompt,
                              jnp.int32(PREFILL_T), cache)
    tok = jnp.argmax(logits).astype(jnp.int32)
    _ = int(tok)
    prefill_s = time.perf_counter() - t0

    # Decode: chain argmax tokens on device; one final fetch.
    def chain(tok, cache, n):
        for _ in range(n):
            lg, cache = Q.decode_step(params, CFG, tok, cache)
            tok = jnp.argmax(lg).astype(jnp.int32)
        return tok, cache

    tok2, cache = chain(tok, cache, 2)  # warm decode program
    _ = int(tok2)
    t0 = time.perf_counter()
    tok3, cache = chain(tok2, cache, N_DECODE)
    _ = int(tok3)
    decode_s = time.perf_counter() - t0

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params))
    print(json.dumps({
        "config": f"qwen3next_hybrid_0p9b_{label}",
        "n_params_m": round(n_params / 1e6, 1),
        "layer_types": "".join(CFG.layer_types),
        "prefill_tokens": PREFILL_T,
        "prefill_ms": round(prefill_s * 1e3, 1),
        "prefill_tok_s": round(PREFILL_T / prefill_s, 1),
        "decode_tok_s": round(N_DECODE / decode_s, 1),
        "first_compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
