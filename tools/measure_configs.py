#!/usr/bin/env python
"""Measure the BASELINE.json configs 1-3 on the real chip: YOLO frame
latency, Whisper RTF, TTS synthesis, depth frame. Full-size
architectures, random weights (latency is weight-independent), honest
timing (fresh time-seeded params, value-fetch sync).

Prints one JSON line per config; paste results into BASELINE.md.
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

from trackiellm_tpu.models import depth as depth_model  # noqa: E402
from trackiellm_tpu.models import detector as det_model  # noqa: E402
from trackiellm_tpu.models import tts as tts_model  # noqa: E402
from trackiellm_tpu.models import whisper as whisper_model  # noqa: E402
from trackiellm_tpu.ops.mel import log_mel_spectrogram  # noqa: E402
from trackiellm_tpu.ops.nms import boxes_to_original, decode_and_nms  # noqa: E402
from trackiellm_tpu.ops.preprocess import (  # noqa: E402
    imagenet_normalize_chw,
    letterbox_preprocess,
)

KEY = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)


def sync(x) -> float:
    """Value fetch — the only honest sync through this stack."""
    return float(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32))


def timeit(fn, reps=5):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_yolo():
    cfg = det_model.DetectorConfig.v8n()
    params = det_model.init_detector(KEY, cfg)
    frame = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (480, 640, 3),
                                          dtype=np.uint8))

    def step():
        chw, meta = letterbox_preprocess(frame, 640, 640)
        boxes, cls = det_model.detector_forward(params, cfg, chw)
        det = decode_and_nms(boxes, cls, score_thresh=0.25, max_out=20)
        out = boxes_to_original(det.boxes, meta)
        sync(out)

    dt = timeit(step)
    print(json.dumps({"config": "yolov8n_frame_640",
                      "latency_ms": round(dt * 1e3, 2),
                      "fps": round(1 / dt, 1)}))


def bench_depth():
    cfg = depth_model.DepthConfig.small()
    params = depth_model.init_depth(KEY, cfg)
    frame = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (480, 640, 3),
                                          dtype=np.uint8))

    def step():
        chw = imagenet_normalize_chw(frame, cfg.img_size, cfg.img_size)
        rel = depth_model.depth_forward(params, cfg, chw)
        metric = depth_model.relative_to_metric(rel)
        sync(metric)

    dt = timeit(step)
    print(json.dumps({"config": "midas_small_depth_384",
                      "latency_ms": round(dt * 1e3, 2),
                      "fps": round(1 / dt, 1)}))


def bench_whisper(seconds=5.0):
    cfg = whisper_model.WhisperConfig.tiny()._replace(n_audio_ctx=500)
    params = whisper_model.init_whisper(KEY, cfg)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal(int(16000 * seconds))
        .astype(np.float32) * 0.05)

    def step():
        mel = log_mel_spectrogram(audio)
        mel = jnp.pad(mel, ((0, 0), (0, cfg.n_audio_ctx * 2 - mel.shape[1])))
        toks = whisper_model.transcribe_tokens(params, cfg, mel,
                                               max_tokens=32)
        return toks

    dt = timeit(step, reps=3)
    print(json.dumps({"config": "whisper_tiny_asr_5s",
                      "latency_ms": round(dt * 1e3, 1),
                      "rtf": round(dt / seconds, 3)}))


def bench_tts():
    cfg = tts_model.TTSConfig.default()
    params = tts_model.init_tts(KEY, cfg)
    text = "ha um degrau descendo a sua frente, cuidado."

    def step():
        wav, n = tts_model.synthesize(params, cfg, text)
        return n

    dt = timeit(step, reps=3)
    # Duration of the produced audio for real-time-factor context.
    _, n = tts_model.synthesize(params, cfg, text)
    audio_s = n / 16000.0
    print(json.dumps({"config": "tts_synthesis",
                      "latency_ms": round(dt * 1e3, 1),
                      "audio_s": round(audio_s, 2),
                      "rtf": round(dt / max(audio_s, 1e-9), 3)}))


def bench_dpt(size="tiny_256"):
    """DPT-SwinV2 (the reference's exact depth family). Params init on
    CPU (hundreds of tiny on-device programs are relay-pathological)."""
    from trackiellm_tpu.models import dpt as dpt_model

    cfg = getattr(dpt_model.DPTSwinConfig, size)()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = dpt_model.init_dpt(KEY, cfg)
    params = jax.device_put(params, jax.devices()[0])
    img = jnp.asarray(np.random.default_rng(int(time.time()))
                      .standard_normal((3, cfg.image_size,
                                        cfg.image_size), np.float32))

    def step():
        return dpt_model.relative_to_metric(
            dpt_model.dpt_forward(params, cfg, img))

    dt = timeit(step, reps=5)
    print(json.dumps({"config": f"dpt_swinv2_{size}",
                      "latency_ms": round(dt * 1e3, 1),
                      "fps": round(1.0 / dt, 1)}))


def bench_embed():
    """MiniLM-class embedder (models/embedder.py) at the retrieval
    (B=1) and backfill (B=32) shapes."""
    from trackiellm_tpu.models import embedder as emb_model

    cfg = emb_model.EmbedderConfig.minilm_l6()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = emb_model.init_embedder(KEY, cfg)
    params = jax.device_put(params, jax.devices()[0])
    rng = np.random.default_rng(int(time.time()))
    for b, t in ((1, 64), (32, 64)):
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)),
                          jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)

        def step():
            return emb_model.embed_forward(params, cfg, ids, mask)

        dt = timeit(step, reps=5)
        print(json.dumps({"config": f"embed_b{b}_t{t}",
                          "latency_ms": round(dt * 1e3, 2),
                          "texts_per_s": round(b / dt, 1)}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "yolo"):
        bench_yolo()
    if which in ("all", "depth"):
        bench_depth()
    if which in ("all", "whisper"):
        bench_whisper()
    if which in ("all", "tts"):
        bench_tts()
    if which == "dpt":
        bench_dpt(sys.argv[2] if len(sys.argv) > 2 else "tiny_256")
    if which == "embed":
        bench_embed()
