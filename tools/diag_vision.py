#!/usr/bin/env python
"""Attribute the vision-stage latency measured by tools/measure_e2e.py
(139 ms p50 through VisionPipeline vs ~31 ms round-1 component sum).

Times each sub-stage with a value-fetch sync and a fresh random frame
per iteration (the relay memoizes identical executions):

  upload    — host uint8 frame -> device
  det_fwd   — letterbox+normalize + YOLOv8n-640 forward + NMS decode
  dep_fwd   — imagenet-normalize + MiDaS-small-384 forward + metric
  fusion    — box/depth fusion stats
  fetch     — ONE device_get of (boxes, scores, classes, valid, stats,
              384x384 f32 depth map)
  fetch_nodepth — same minus the depth map (is the 590 KB download the
              cost?)
  pipeline  — full VisionPipeline.process_frame (sum check)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from trackiellm_tpu.models import depth as depth_model  # noqa: E402
from trackiellm_tpu.models import detector as det_model  # noqa: E402
from trackiellm_tpu.ops.nms import boxes_to_original, decode_and_nms  # noqa: E402
from trackiellm_tpu.ops.preprocess import (  # noqa: E402
    imagenet_normalize_chw, letterbox_preprocess)
from trackiellm_tpu.vision import object_analysis as oa  # noqa: E402
from trackiellm_tpu.vision.pipeline import (  # noqa: E402
    AnalysisFlags, VisionPipeline)

N = 8


def timed(label, fn, n=N):
    fn(0)  # warmup / compile
    fn(1)
    t0 = time.perf_counter()
    for i in range(n):
        fn(i + 2)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:14s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    ks = jax.random.split(key, 2)
    det_cfg = det_model.DetectorConfig.v8n()
    det_params = det_model.init_detector(ks[0], det_cfg)
    dep_cfg = depth_model.DepthConfig.small()
    dep_params = depth_model.init_depth(ks[1], dep_cfg)

    rng = np.random.default_rng(int(time.time()))
    frames = [rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
              for _ in range(N + 4)]

    def upload(i):
        dev = jnp.asarray(frames[i])
        int(dev[0, 0, 0])

    timed("upload", upload)

    dev_frames = [jnp.asarray(f) for f in frames]
    jax.block_until_ready(dev_frames)

    state = {}

    def det_fwd(i):
        chw, meta = letterbox_preprocess(dev_frames[i], 640, 640)
        raw_boxes, cls_probs = det_model.detector_forward(
            det_params, det_cfg, chw)
        det = decode_and_nms(raw_boxes, cls_probs, score_thresh=0.5,
                             iou_thresh=0.45, max_out=32)
        cam = boxes_to_original(det.boxes, meta)
        state["det"] = (cam, det.scores, det.classes, det.valid)
        int(det.classes[0])

    timed("det_fwd", det_fwd)

    def dep_fwd(i):
        chw = imagenet_normalize_chw(dev_frames[i], 384, 384)
        rel = depth_model.depth_forward(dep_params, dep_cfg, chw)
        metric = rel * 0.1 + 0.5  # stand-in for relative_to_metric shape
        state["depth"] = metric
        float(metric[0, 0])

    timed("dep_fwd", dep_fwd)

    def fusion(i):
        cam, scores, classes, valid = state["det"]
        scale = jnp.asarray([384 / 640, 384 / 480] * 2, jnp.float32)
        stats = oa.fuse_boxes_with_depth(cam * scale, valid, state["depth"])
        state["stats"] = stats
        float(stats[0, 0])

    timed("fusion", fusion)

    def fetch(i):
        jax.device_get((state["det"], state["depth"], state["stats"]))

    timed("fetch", fetch)

    def fetch_nodepth(i):
        jax.device_get((state["det"], state["stats"]))

    timed("fetch_nodepth", fetch_nodepth)

    pipe = VisionPipeline(
        detector_fn=lambda chw: det_model.detector_forward(
            det_params, det_cfg, chw),
        depth_fn=lambda chw: depth_model.depth_forward(
            dep_params, dep_cfg, chw),
    )

    def pipeline(i):
        pipe.process_frame(frames[i],
                           AnalysisFlags.DETECTION | AnalysisFlags.DEPTH)

    timed("pipeline", pipeline)


if __name__ == "__main__":
    main()
