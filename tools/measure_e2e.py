#!/usr/bin/env python
"""Measure BASELINE config 5: camera-frame -> spoken-response latency on
the real chip with full-size architectures (YOLOv8n 640 + MiDaS-small 384
+ Mistral-7B Q4 + TTS), wired exactly like production (VisionPipeline ->
ContextualReasoner -> LLM prefill/decode -> TTS).

Random weights (latency is weight-independent); every run perturbs the
frame and prompt so nothing in the stack can replay; stage boundaries are
host value-fetches (honest sync). Prints one JSON line.
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

from trackiellm_tpu.cortex.reasoner import ContextualReasoner  # noqa: E402
from trackiellm_tpu.models import depth as depth_model  # noqa: E402
from trackiellm_tpu.models import detector as det_model  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402
from trackiellm_tpu.models import tts as tts_model  # noqa: E402
from trackiellm_tpu.vision.pipeline import AnalysisFlags, VisionPipeline  # noqa: E402

N_ANSWER_TOKENS = 12  # short spoken reply
RUNS = 5


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    ks = jax.random.split(key, 4)

    print("building models...", file=sys.stderr)
    det_cfg = det_model.DetectorConfig.v8n()
    det_params = det_model.init_detector(ks[0], det_cfg)
    dep_cfg = depth_model.DepthConfig.small()
    dep_params = depth_model.init_depth(ks[1], dep_cfg)
    llm_cfg = llm_model.LLMConfig.mistral_7b()._replace(
        max_seq=1024, sliding_window=1024)
    llm_params = llm_model.init_params_quantized(ks[2], llm_cfg, bits=4)
    tts_cfg = tts_model.TTSConfig.default()
    tts_params = tts_model.init_tts(ks[3], tts_cfg)

    pipe = VisionPipeline(
        detector_fn=lambda chw: det_model.detector_forward(
            det_params, det_cfg, chw),
        depth_fn=lambda chw: depth_model.depth_forward(
            dep_params, dep_cfg, chw),
    )
    reasoner = ContextualReasoner()
    rng = np.random.default_rng(int(time.time()))
    # Preallocate the KV cache once; turns reuse it with length reset
    # (stale entries are length-masked), like the production runner.
    kv = llm_model.KVCache.create(llm_cfg)

    def one_pass(seed: int) -> float:
        frame = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        t0 = time.perf_counter()

        # 1. vision (detection + depth + fusion; host fetches results)
        result = pipe.process_frame(
            frame, AnalysisFlags.DETECTION | AnalysisFlags.DEPTH)
        reasoner.update_vision_context(result.objects)

        # 2. LLM: context -> prefill (128 bucket) -> short greedy decode
        context = reasoner.generate_context_string(
            user_query=f"o que vejo agora? ({seed})", token_budget=96)
        ids = np.frombuffer(context.encode()[:120], np.uint8).astype(np.int32)
        padded = np.zeros(128, np.int32)
        padded[:len(ids)] = ids % llm_cfg.vocab_size
        cache = llm_model.KVCache(kv.k, kv.v, jnp.int32(0))
        logits, cache = llm_model.prefill(
            llm_params, llm_cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), cache)
        tok = jnp.argmax(logits).astype(jnp.int32)
        for _ in range(N_ANSWER_TOKENS):
            logits, cache = llm_model.decode_step(llm_params, llm_cfg, tok,
                                                  cache, attn_len=256)
            tok = jnp.argmax(logits).astype(jnp.int32)
        int(tok)  # value fetch: decode really finished

        # 3. TTS first chunk
        wav, n = tts_model.synthesize(tts_params, tts_cfg,
                                      "ha uma xicara na mesa a sua frente.")
        float(wav[0])  # value fetch
        return time.perf_counter() - t0

    print("warmup (compiles)...", file=sys.stderr)
    one_pass(0)
    latencies = sorted(one_pass(i + 1) * 1e3 for i in range(RUNS))
    p50 = latencies[len(latencies) // 2]
    print(json.dumps({
        "config": "frame_to_spoken_response_e2e",
        "p50_ms": round(p50, 1),
        "runs_ms": [round(v, 1) for v in latencies],
        "answer_tokens": N_ANSWER_TOKENS,
    }))


if __name__ == "__main__":
    main()
