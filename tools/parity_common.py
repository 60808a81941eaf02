"""Shared plumbing for the accuracy-parity harness (tools/parity_*.py).

The zero-egress build environment has no real checkpoints, so parity vs
the reference stack (ONNX Runtime + llama.cpp + whisper.cpp) cannot be
*executed* here — but the day a real checkpoint appears, each
tools/parity_*.py must be a one-command event (VERDICT round-2 item 3):
it takes real file paths, fails informatively on missing ones, and
emits the metric plus a PARITY-RESULTS.md row.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
from typing import Dict, List, Sequence

RESULTS_FILE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "PARITY-RESULTS.md")

_HEADER = """# PARITY-RESULTS — measured accuracy parity vs the reference stack

Appended by tools/parity_{detector,asr,llm,depth,vad,tts}.py runs
against real checkpoints. Empty table = no real checkpoints have
been available yet (zero-egress environment).

| date | tool | checkpoint | metric | value | details |
|---|---|---|---|---|---|
"""


def die(msg: str) -> None:
    print(f"ERROR: {msg}", file=sys.stderr)
    raise SystemExit(2)


def require_file(path: str, what: str, hint: str = "") -> str:
    if not path:
        die(f"missing required path for {what}. {hint}")
    if not os.path.exists(path):
        die(f"{what} not found: {path!r}. {hint}")
    return path


def record(tool: str, checkpoint: str, metric: str, value,
           details: str = "") -> None:
    """Append one row to PARITY-RESULTS.md (created on first use)."""
    if not os.path.exists(RESULTS_FILE):
        with open(RESULTS_FILE, "w") as f:
            f.write(_HEADER)
    date = datetime.date.today().isoformat()
    with open(RESULTS_FILE, "a") as f:
        f.write(f"| {date} | {tool} | {os.path.basename(checkpoint)} "
                f"| {metric} | {value} | {details} |\n")


def emit(payload: Dict) -> None:
    print(json.dumps(payload))


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance (words or chars)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def wer(ref: str, hyp: str) -> float:
    """Word error rate of hyp against ref (0.0 = exact)."""
    r = ref.split()
    if not r:
        return 0.0 if not hyp.split() else 1.0
    return edit_distance(r, hyp.split()) / len(r)


def iou_xyxy(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(ix2 - ix1, 0.0), max(iy2 - iy1, 0.0)
    inter = iw * ih
    area_a = max(a[2] - a[0], 0.0) * max(a[3] - a[1], 0.0)
    area_b = max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def average_precision(detections: List[Dict], n_gt: int,
                      iou_thresh: float = 0.5) -> float:
    """VOC-style all-point-interpolated AP for ONE class.

    ``detections``: [{"score": s, "box": xyxy, "image": id}] across all
    images; ``n_gt`` total ground-truth boxes of this class. Each
    detection dict must carry "gt_boxes": the same-class GT boxes of
    its image (matched greedily, each GT used once per image).
    """
    if n_gt == 0:
        return 0.0
    detections = sorted(detections, key=lambda d: -d["score"])
    matched: Dict = {}
    tp, fp = [], []
    for d in detections:
        best, best_iou = None, iou_thresh
        for gi, g in enumerate(d["gt_boxes"]):
            key = (d["image"], gi)
            if key in matched:
                continue
            i = iou_xyxy(d["box"], g)
            if i >= best_iou:
                best, best_iou = key, i
        if best is not None:
            matched[best] = True
            tp.append(1); fp.append(0)
        else:
            tp.append(0); fp.append(1)
    # precision/recall curve -> all-point interpolation
    ap = 0.0
    cum_tp = cum_fp = 0
    best_prec_at = []
    for t, f in zip(tp, fp):
        cum_tp += t
        cum_fp += f
        best_prec_at.append((cum_tp / (cum_tp + cum_fp), cum_tp / n_gt))
    # integrate precision envelope over recall
    prev_recall = 0.0
    for i in range(len(best_prec_at)):
        prec_tail = max(p for p, _ in best_prec_at[i:])
        recall = best_prec_at[i][1]
        ap += prec_tail * (recall - prev_recall)
        prev_recall = recall
    return ap


def mean_ap(per_image_dets: Dict[str, List[Dict]],
            per_image_gt: Dict[str, List[Dict]],
            iou_thresh: float = 0.5) -> Dict:
    """mAP@iou over classes present in GT.

    dets: image -> [{"box": xyxy, "score": s, "cls": c}]
    gt:   image -> [{"box": xyxy, "cls": c}]
    """
    classes = sorted({g["cls"] for boxes in per_image_gt.values()
                      for g in boxes})
    aps = {}
    for c in classes:
        dets_c = []
        n_gt = 0
        for img, gts in per_image_gt.items():
            gt_boxes = [g["box"] for g in gts if g["cls"] == c]
            n_gt += len(gt_boxes)
            for d in per_image_dets.get(img, []):
                if d["cls"] == c:
                    dets_c.append({"score": d["score"], "box": d["box"],
                                   "image": img, "gt_boxes": gt_boxes})
        aps[c] = average_precision(dets_c, n_gt, iou_thresh)
    m = sum(aps.values()) / len(aps) if aps else 0.0
    return {"mAP": m, "per_class": aps, "iou": iou_thresh}


# ---------------------------------------------------------------------------
# Checkpoint ingestion helpers
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict:
    """Load a name->array state dict from .pt/.pth (torch), .safetensors,
    .npz, or .onnx (weights-only initializer read)."""
    import numpy as np

    ext = os.path.splitext(path)[1].lower()
    if ext in (".pt", ".pth", ".bin"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict):
            for key in ("model_state_dict", "state_dict", "model"):
                if key in obj and isinstance(obj[key], dict):
                    obj = obj[key]
                    break
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        return {k: v.detach().cpu().numpy() if hasattr(v, "detach")
                else np.asarray(v) for k, v in obj.items()
                if hasattr(v, "shape") or hasattr(v, "detach")}
    if ext == ".safetensors":
        from trackiellm_tpu.models.loader import load_safetensors

        return load_safetensors(path)
    if ext == ".npz":
        import numpy as np

        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if ext == ".onnx":
        from trackiellm_tpu.models.onnx_reader import read_onnx_initializers

        return read_onnx_initializers(path)
    die(f"unsupported checkpoint format {ext!r} for {path}")


def load_image(path: str):
    """Image file -> HWC uint8 RGB numpy array."""
    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def load_wav(path: str, target_sr: int = 16_000):
    """WAV/npy -> mono f32 at target_sr."""
    import numpy as np

    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
        ch = w.getnchannels()
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        die(f"unsupported WAV sample width {width} in {path}")
    audio = np.frombuffer(raw, dtype).astype(np.float32)
    if width == 1:
        audio = (audio - 128.0) / 128.0
    else:
        audio = audio / float(2 ** (8 * width - 1))
    if ch > 1:
        audio = audio.reshape(-1, ch).mean(axis=1)
    if sr != target_sr:
        import jax.numpy as jnp

        from trackiellm_tpu.ops.resample import resample_poly

        audio = np.asarray(resample_poly(jnp.asarray(audio), target_sr, sr))
    return audio
