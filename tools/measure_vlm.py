#!/usr/bin/env python
"""Measure the LLaVA vision leg on the real chip: CLIP ViT-L/14-336
encode+project latency (f32 and bf16 towers) and the marginal cost of
splicing 576 image tokens into a 7B prompt (the embeds-prefill path vs
a text-only prefill of the same bucket).

Random weights (latency is weight-independent), honest timing (fresh
time-seeded params, value-fetch sync). Prints one JSON line per row;
paste results into BASELINE.md.
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

from trackiellm_tpu.models import clip as clip_model  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402

VIT_L_336 = clip_model.CLIPVisionConfig(
    image_size=336, patch_size=14, dim=1024, n_layers=24, n_heads=16,
    hidden_dim=4096, proj_dim=4096)  # projector to the 7B's dim


def _t(fn, n=20):
    """Honest timing: value-fetch sync (block_until_ready does not
    round-trip through the axon relay — observed 0.04 ms 'latencies').
    Only a tiny slice is fetched: the full result stays on device (a
    (576, 4096) f32 fetch would cost ~1 s of relay bandwidth and swamp
    the number); the slice is computed AFTER the full program ran, so
    nothing is dead-code-eliminated."""
    def run():
        out = fn()
        return np.asarray(out[:1].ravel()[:8])

    run()  # compile + warm
    run()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50)), float(np.min(ts))


def main() -> None:
    rng = np.random.default_rng(int(time.time()) & 0x7FFFFFFF)
    cfg = VIT_L_336
    px = jnp.asarray(rng.normal(size=(3, 336, 336)).astype(np.float32))

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        params = clip_model.init_params(cfg, rng, dtype=dtype)
        params = jax.device_put(params)
        p50, mn = _t(lambda: clip_model.encode_and_project(params, cfg, px))
        print(json.dumps({
            "config": f"clip_vit_l_336_encode_project_{name}",
            "n_image_tokens": cfg.n_image_tokens,
            "p50_ms": round(p50, 2), "min_ms": round(mn, 2)}))
        del params

    # Marginal prefill cost of the image run: a 1024-bucket prefill with
    # embeds (576 image tokens + text) vs the plain token path.
    lcfg = llm_model.LLMConfig.mistral_7b()._replace(
        max_seq=2048, sliding_window=2048)
    lparams = llm_model.init_params_quantized(
        jax.random.PRNGKey(rng.integers(1 << 30)), lcfg, bits=4)
    tokens = jnp.asarray(rng.integers(0, 1000, 1024).astype(np.int32))
    length = jnp.int32(700)
    cache = llm_model.KVCache.create(lcfg)

    p50_tok, mn_tok = _t(lambda: llm_model.prefill(
        lparams, lcfg, tokens, length, cache)[0], n=10)
    embeds = llm_model.embed_tokens(lparams, tokens)
    p50_emb, mn_emb = _t(lambda: llm_model.prefill(
        lparams, lcfg, tokens, length, cache, embeds=embeds)[0], n=10)
    print(json.dumps({
        "config": "7b_q4_prefill_1024_bucket",
        "token_path_p50_ms": round(p50_tok, 2),
        "embeds_path_p50_ms": round(p50_emb, 2),
        "note": "embeds path = multimodal prefill body; delta is the "
                "embedding-injection overhead (expected ~0)"}))


if __name__ == "__main__":
    main()
