"""Box decode + non-maximum suppression, as fixed-shape TPU programs.

Parity target: the reference's detector postprocess — CUDA NMS kernel
(reference: src/gpu/extensions/cuda/tk_cuda_tensor_ops.cu:101-452) and the
(stubbed) CPU decode+NMS in src/vision/tk_object_detector.c:303-357, plus
Metal's anchor-gen/box-decode/NMS-mask kernels
(src/gpu/metal/tk_metal_kernels.metal:760-855).

TPU design: NMS is data-dependent, which fights XLA — so it is recast as a
*fixed-shape masked* computation: top-K pre-select, a dense KxK IoU matrix
(one MXU-friendly batched op), and a K-step `lax.fori_loop` greedy
suppression over mask vectors. K=256 costs a 256x256 f32 matrix — trivial
on-chip — and the whole postprocess stays inside one jit region with the
detector forward, so no host round-trip per frame (the reference crosses
the GPU->CPU boundary here).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Detections(NamedTuple):
    """Fixed-shape detection set; ``valid`` masks real rows."""

    boxes: jnp.ndarray  # (max_out, 4) xyxy in letterbox pixels
    scores: jnp.ndarray  # (max_out,)
    classes: jnp.ndarray  # (max_out,) int32
    valid: jnp.ndarray  # (max_out,) bool


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between two xyxy box sets: (N,4),(M,4) -> (N,M)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float = 0.45,
    max_out: int = 32,
) -> Detections:
    """Greedy NMS over K score-sorted candidates, fixed output shape.

    ``boxes`` (K,4) xyxy, ``scores`` (K,) — rows with score 0 are inert.
    Suppression runs as a K-iteration mask loop: iteration *i* (a surviving
    box, in score order) knocks out every lower-scored box overlapping it
    above ``iou_thresh``.
    """
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]

    iou = pairwise_iou(boxes_s, boxes_s)
    idx = jnp.arange(k)
    lower = idx[None, :] > idx[:, None]  # j strictly after i in score order

    def body(i, suppressed):
        active = jnp.logical_not(suppressed[i]) & (scores_s[i] > 0)
        kill = active & lower[i] & (iou[i] > iou_thresh)
        return suppressed | kill

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    keep = jnp.logical_not(suppressed) & (scores_s > 0)

    # Select the first max_out kept rows (already score-ordered).
    kept_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep, kept_rank, max_out)  # overflow rows -> dumped
    out_scores = jnp.zeros((max_out + 1,), scores.dtype).at[slot].set(scores_s)
    out_boxes = jnp.zeros((max_out + 1, 4), boxes.dtype).at[slot].set(boxes_s)
    out_order = jnp.full((max_out + 1,), -1, jnp.int32).at[slot].set(order)
    valid = out_scores[:max_out] > 0
    return Detections(
        boxes=out_boxes[:max_out],
        scores=out_scores[:max_out],
        classes=out_order[:max_out],  # caller rewrites with real class ids
        valid=valid,
    )


@functools.partial(
    jax.jit, static_argnames=("pre_topk", "max_out", "class_aware")
)
def decode_and_nms(
    boxes_xyxy: jnp.ndarray,
    class_scores: jnp.ndarray,
    score_thresh: float = 0.5,
    iou_thresh: float = 0.45,
    pre_topk: int = 256,
    max_out: int = 32,
    class_aware: bool = True,
) -> Detections:
    """Full detector postprocess: score-filter -> top-K -> NMS.

    ``boxes_xyxy`` (A,4) decoded boxes, ``class_scores`` (A,C) per-class
    probabilities. Class-aware NMS uses the standard coordinate-offset
    trick (boxes shifted by class_id * diag) so one suppression pass
    handles all classes without per-class loops.
    """
    best_cls = jnp.argmax(class_scores, axis=-1).astype(jnp.int32)
    best_score = jnp.max(class_scores, axis=-1)
    best_score = jnp.where(best_score >= score_thresh, best_score, 0.0)

    k = min(pre_topk, boxes_xyxy.shape[0])
    top_scores, top_idx = jax.lax.top_k(best_score, k)
    top_boxes = boxes_xyxy[top_idx]
    top_cls = best_cls[top_idx]

    if class_aware:
        # Shift per class so cross-class IoU is exactly zero.
        span = jnp.max(top_boxes) + 1.0
        nms_boxes = top_boxes + (top_cls.astype(top_boxes.dtype) * span)[:, None]
    else:
        nms_boxes = top_boxes

    det = nms_fixed(nms_boxes, top_scores, iou_thresh, max_out)
    # Recover unshifted boxes + class ids via the survivor indices
    # (det.classes holds indices into the score-sorted candidate list,
    # which nms_fixed stored from its `order`).
    sel = jnp.maximum(det.classes, 0)
    boxes_out = jnp.where(det.valid[:, None], top_boxes[sel], 0.0)
    cls_out = jnp.where(det.valid, top_cls[sel], -1)
    return Detections(boxes=boxes_out, scores=det.scores, classes=cls_out,
                      valid=det.valid)


@jax.jit
def boxes_to_original(boxes: jnp.ndarray, meta: jnp.ndarray) -> jnp.ndarray:
    """Map letterbox-space xyxy boxes back to camera pixels using the
    ``[scale, pad_x, pad_y]`` meta from
    :func:`trackiellm_tpu.ops.preprocess.letterbox_preprocess`."""
    scale, pad_x, pad_y = meta[0], meta[1], meta[2]
    shift = jnp.stack([pad_x, pad_y, pad_x, pad_y])
    return (boxes - shift) / scale
