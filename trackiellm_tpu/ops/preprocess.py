"""Fused image preprocessing for detector / depth model input.

Parity target: the reference's fused CUDA ``preprocess_image`` kernel
(resize + u8->f32 + HWC->NCHW + normalize, reference:
src/gpu/cuda/tk_cuda_kernels.cu:102 and .docs/Gpu/inference.md:75) and the
CPU ``tk_preprocessor_resize_and_normalize_to_chw`` path
(reference: src/vision/tk_depth_midas.c:377-389).

TPU design: the whole chain is one jit region — XLA fuses the scale,
normalize, pad and transpose into the gather-based bilinear resize, giving
a single HBM pass. Static output shapes (the letterbox pads to the model's
fixed input) keep the detector's jit cache warm for any camera resolution
that appears at trace time.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _bilinear_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of an HWC image using half-pixel-center sampling
    (matches the reference preprocessors' OpenCV-style convention)."""
    in_h, in_w = img.shape[0], img.shape[1]
    # Half-pixel centers: src = (dst + 0.5) * scale - 0.5
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (in_h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (in_w / out_w) - 0.5
    ys = jnp.clip(ys, 0.0, in_h - 1.0)
    xs = jnp.clip(xs, 0.0, in_w - 1.0)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, in_h - 1)
    x1 = jnp.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0.astype(jnp.float32))[:, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, :, None]

    imgf = img.astype(jnp.float32)
    top = imgf[y0][:, x0] * (1 - wx) + imgf[y0][:, x1] * wx
    bot = imgf[y1][:, x0] * (1 - wx) + imgf[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnames=("target_h", "target_w", "out_dtype"))
def letterbox_preprocess(
    image_u8: jnp.ndarray,
    target_h: int = 640,
    target_w: int = 640,
    pad_value: float = 114.0 / 255.0,
    out_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Letterbox an HWC uint8 camera frame into a CHW model input.

    Aspect ratio is preserved; the image is centred on a grey canvas
    (YOLO convention, pad value 114/255). Returns ``(chw, meta)`` where
    ``meta = [scale, pad_x, pad_y]`` in *target* pixel units — exactly what
    :func:`trackiellm_tpu.ops.nms.boxes_to_original` needs to map detector
    boxes back to camera coordinates.

    The letterbox geometry (scale/pad) is computed with traced ops so one
    compiled program serves a fixed camera resolution; a new camera
    resolution triggers one retrace (the reference pays a similar one-time
    cost re-allocating its CUDA staging buffers).
    """
    in_h, in_w = image_u8.shape[0], image_u8.shape[1]
    scale = min(target_h / in_h, target_w / in_w)
    new_h, new_w = int(round(in_h * scale)), int(round(in_w * scale))
    pad_y, pad_x = (target_h - new_h) // 2, (target_w - new_w) // 2

    resized = _bilinear_resize(image_u8, new_h, new_w) * (1.0 / 255.0)
    canvas = jnp.full((target_h, target_w, 3), pad_value, dtype=jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (pad_y, pad_x, 0))
    chw = jnp.transpose(canvas, (2, 0, 1)).astype(out_dtype)
    meta = jnp.array([scale, float(pad_x), float(pad_y)], dtype=jnp.float32)
    return chw, meta


@functools.partial(jax.jit, static_argnames=("target_h", "target_w", "out_dtype"))
def imagenet_normalize_chw(
    image_u8: jnp.ndarray,
    target_h: int = 384,
    target_w: int = 384,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Resize (no letterbox) + ImageNet mean/std normalize + HWC->CHW.

    Parity: the MiDaS preprocess path (reference: src/vision/
    tk_depth_midas.c:377-389) which stretches to the model input size and
    applies ImageNet statistics.
    """
    resized = _bilinear_resize(image_u8, target_h, target_w) * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    normed = (resized - mean) / std
    return jnp.transpose(normed, (2, 0, 1)).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("target_h", "target_w", "out_dtype"))
def dpt_normalize_chw(
    image_u8: jnp.ndarray,
    target_h: int = 256,
    target_w: int = 256,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Resize (no letterbox) + (x-0.5)/0.5 normalize + HWC->CHW: the DPT
    image-processor statistics the DPT-SwinV2 checkpoints were trained
    under (models/dpt.py DPT_MEAN/DPT_STD) — NOT ImageNet stats."""
    resized = _bilinear_resize(image_u8, target_h, target_w) * (1.0 / 255.0)
    normed = (resized - 0.5) / 0.5
    return jnp.transpose(normed, (2, 0, 1)).astype(out_dtype)


CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("target_h", "target_w", "out_dtype"))
def clip_normalize_chw(
    image_u8: jnp.ndarray,
    target_h: int = 336,
    target_w: int = 336,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Resize (no letterbox) + CLIP mean/std normalize + HWC->CHW: the
    OpenAI-CLIP image statistics the LLaVA vision towers were trained
    under (models/clip.py). HF's CLIPImageProcessor uses bicubic
    shortest-side resize + center crop; the camera path uses a direct
    square resize for latency — parity tests feed pixel_values directly."""
    resized = _bilinear_resize(image_u8, target_h, target_w) * (1.0 / 255.0)
    mean = jnp.asarray(CLIP_MEAN, dtype=jnp.float32)
    std = jnp.asarray(CLIP_STD, dtype=jnp.float32)
    normed = (resized - mean) / std
    return jnp.transpose(normed, (2, 0, 1)).astype(out_dtype)
