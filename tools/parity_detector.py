#!/usr/bin/env python
"""Detector accuracy parity: run real YOLOv8n weights through the
product detection path and score mAP@0.5 against expected boxes.

One-command contract (VERDICT round-2 item 3): point it at a real
checkpoint + images + a ground-truth JSON and it emits the metric and
a PARITY-RESULTS.md row; any missing file fails with a clear message.

Usage:
  python tools/parity_detector.py --checkpoint yolov8n.pt \
      --images tests/data/imgs/ --expected expected_boxes.json
  # no --expected: dumps detections JSON (for building the GT file or
  # eyeballing against ONNX Runtime output)

Checkpoint formats: ultralytics .pt (torch), .safetensors/.npz state
dict, or weights-only .onnx (initializer names must follow the torch
layout models/convert.py::detector_from_torch expects — use
tools/inspect_checkpoint.py to list names).

Expected-boxes JSON:
  {"image.jpg": [{"box": [x1,y1,x2,y2], "cls": 41}, ...], ...}
(pixel coordinates in the original image; cls = COCO-80 index).

Reference parity target: ONNX Runtime YOLO session + decode+NMS
(src/vision/tk_object_detector.c:83, :261; NMS stub :309).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_common import (  # noqa: E402
    die, emit, load_image, load_state_dict, mean_ap, record, require_file,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="YOLOv8n weights (.pt/.safetensors/.npz/.onnx)")
    ap.add_argument("--images", required=True,
                    help="image file, directory, or glob")
    ap.add_argument("--expected", default=None,
                    help="ground-truth boxes JSON (omit to dump detections)")
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--input-size", type=int, default=640,
                    help="letterbox input size (640 for real v8n; the "
                    "weights don't encode it — fully convolutional)")
    ap.add_argument("--no-record", action="store_true",
                    help="don't append to PARITY-RESULTS.md")
    args = ap.parse_args()

    ckpt = require_file(
        args.checkpoint, "detector checkpoint",
        "expected a YOLOv8n ultralytics .pt or torch-layout state dict")
    if os.path.isdir(args.images):
        paths = sorted(
            p for p in glob.glob(os.path.join(args.images, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    else:
        paths = sorted(glob.glob(args.images))
    if not paths:
        die(f"no images found under {args.images!r}")

    import jax.numpy as jnp  # deferred: argparse errors stay fast

    from trackiellm_tpu.models import detector as det_model
    from trackiellm_tpu.models.convert import detector_from_torch
    from trackiellm_tpu.vision.pipeline import AnalysisFlags, VisionPipeline

    state = load_state_dict(ckpt)
    try:
        params, cfg = detector_from_torch(state)
    except KeyError as e:
        die(f"checkpoint {ckpt!r} is missing expected tensor {e}; "
            "list its names with tools/inspect_checkpoint.py and check "
            "models/convert.py::detector_from_torch's layout table")

    pipe = VisionPipeline(
        detector_fn=lambda chw: det_model.detector_forward(
            params, cfg, chw))
    pipe.update_thresholds(confidence=args.conf)
    pipe.config.detector_input = args.input_size

    dets = {}
    for p in paths:
        img = load_image(p)
        result = pipe.process_frame(jnp.asarray(img),
                                    AnalysisFlags.DETECTION)
        name = os.path.basename(p)
        dets[name] = [{"box": [float(v) for v in o.box],
                       "score": float(o.confidence),
                       "cls": int(o.class_id), "label": o.label}
                      for o in result.objects]
        print(f"{name}: {len(dets[name])} objects", file=sys.stderr)

    if not args.expected:
        emit({"tool": "parity_detector", "checkpoint": ckpt,
              "detections": dets,
              "note": "no --expected given; dumped detections only"})
        return

    gt_raw = json.loads(open(require_file(
        args.expected, "expected-boxes JSON")).read())
    gt = {img: [{"box": g["box"], "cls": g["cls"]} for g in boxes]
          for img, boxes in gt_raw.items()}
    missing = set(gt) - set(dets)
    if missing:
        die(f"expected file references images not given: {sorted(missing)}")
    scores = mean_ap(dets, gt, iou_thresh=args.iou)
    payload = {"tool": "parity_detector", "checkpoint": ckpt,
               "n_images": len(paths), "mAP@%.2f" % args.iou:
               round(scores["mAP"], 4),
               "per_class": {str(k): round(v, 4)
                             for k, v in scores["per_class"].items()}}
    emit(payload)
    if not args.no_record:
        record("parity_detector", ckpt, f"mAP@{args.iou:.2f}",
               round(scores["mAP"], 4), f"{len(paths)} images")


if __name__ == "__main__":
    main()
