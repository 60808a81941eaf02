"""Object/depth fusion and per-object attributes.

Parity target: the Rust vision crate's ``fuse_object_and_depth_data``
producing EnrichedObjects with metric distances (reference:
src/vision/src/object_analysis.rs:58-134), the C-side fuse step
(tk_vision_pipeline.c:653), and the attribute classifier attaching
"color:x" tags (src/vision/tk_attribute_classifier.c,
tk_vision_pipeline.h:179).

TPU design: all N boxes are fused in one fixed-shape masked program —
per-box region masks built from broadcasted iotas, masked statistics
reduced in one pass. No per-object host loop.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def fuse_boxes_with_depth(
    boxes: jnp.ndarray,       # (N, 4) xyxy in depth-map pixel coords
    valid: jnp.ndarray,       # (N,) bool
    depth_metric: jnp.ndarray,  # (H, W) meters
) -> jnp.ndarray:
    """Per-box distance estimates: returns (N, 2) [mean_m, min_m] over
    the central 50% region of each box (central crop rejects background
    pixels at the box edges — same intent as the Rust fusion's interior
    sampling)."""
    h, w = depth_metric.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 2.0)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 2.0)

    # (N, H, W) central-region masks.
    in_x = (xs[None] >= (cx - bw * 0.25)[:, None, None]) & (
        xs[None] <= (cx + bw * 0.25)[:, None, None])
    in_y = (ys[None] >= (cy - bh * 0.25)[:, None, None]) & (
        ys[None] <= (cy + bh * 0.25)[:, None, None])
    mask = in_x & in_y & valid[:, None, None]

    d = depth_metric[None]
    count = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1)
    mean = jnp.sum(jnp.where(mask, d, 0.0), axis=(1, 2)) / count
    mn = jnp.min(jnp.where(mask, d, jnp.inf), axis=(1, 2))
    mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    return jnp.stack([mean, mn], axis=-1)


@functools.partial(jax.jit, static_argnames=())
def box_color_stats(
    image_hwc: jnp.ndarray,   # (H, W, 3) f32 [0,1] camera frame
    boxes: jnp.ndarray,       # (N, 4) xyxy in image pixels
    valid: jnp.ndarray,       # (N,) bool
) -> jnp.ndarray:
    """Per-box mean RGB over the central region -> (N, 3)."""
    h, w = image_hwc.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 2.0)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 2.0)
    in_x = (xs[None] >= (cx - bw * 0.25)[:, None, None]) & (
        xs[None] <= (cx + bw * 0.25)[:, None, None])
    in_y = (ys[None] >= (cy - bh * 0.25)[:, None, None]) & (
        ys[None] <= (cy + bh * 0.25)[:, None, None])
    mask = (in_x & in_y & valid[:, None, None])[..., None]
    count = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1)
    return jnp.sum(jnp.where(mask, image_hwc[None], 0.0), axis=(1, 2)) / count


_COLOR_NAMES = (
    (0.0, "red"), (30.0, "orange"), (55.0, "yellow"), (90.0, "green"),
    (150.0, "cyan"), (210.0, "blue"), (270.0, "purple"), (330.0, "pink"),
    (360.0, "red"),
)


def rgb_to_color_name(rgb: np.ndarray) -> str:
    """Host-side color naming from a mean RGB triple (parity: the
    attribute classifier's 'color:x' tags)."""
    r, g, b = float(rgb[0]), float(rgb[1]), float(rgb[2])
    mx, mn = max(r, g, b), min(r, g, b)
    v, d = mx, mx - mn
    if v < 0.15:
        return "black"
    if d < 0.08:
        return "white" if v > 0.7 else "gray"
    if mx == r:
        hue = 60.0 * (((g - b) / d) % 6.0)
    elif mx == g:
        hue = 60.0 * ((b - r) / d + 2.0)
    else:
        hue = 60.0 * ((r - g) / d + 4.0)
    for bound, name in _COLOR_NAMES:
        if hue <= bound + 15.0:
            return name
    return "red"


def attributes_for(rgb_means: np.ndarray, valid: np.ndarray) -> List[List[str]]:
    """Build per-object attribute tag lists from device color stats."""
    out: List[List[str]] = []
    for i in range(rgb_means.shape[0]):
        if not valid[i]:
            out.append([])
            continue
        out.append([f"color:{rgb_to_color_name(rgb_means[i])}"])
    return out
