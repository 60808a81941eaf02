"""Monocular depth estimator (MiDaS-class encoder-decoder), NHWC JAX.

Parity target: the reference's MiDaS DPT-SwinV2 ONNX session
(reference: src/vision/tk_depth_midas.c:176-499): ImageNet-normalized
input, relative inverse-depth output, and the relative->metric mapping
``metric = max_depth - norm * (max_depth - min_depth)``
(tk_depth_midas.c:496-497), which this module reproduces exactly in
:func:`relative_to_metric`.

Architecture: a compact RefineNet-style model — 4-stage conv encoder,
decoder with skip fusion and 2x upsampling — the MiDaS-small topology
reshaped for XLA (NHWC, static shapes, one jit region).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class DepthConfig(NamedTuple):
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    decoder_ch: int = 64
    img_size: int = 384

    @classmethod
    def small(cls) -> "DepthConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "DepthConfig":
        return cls(channels=(8, 16, 32, 64), decoder_ch=16, img_size=96)


def _conv_init(key, kh, kw, cin, cout):
    scale = 1.0 / math.sqrt(kh * kw * cin)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                                    -scale, scale),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_depth(key: jax.Array, cfg: DepthConfig) -> Dict[str, Any]:
    ch = cfg.channels
    dc = cfg.decoder_ch
    keys = iter(jax.random.split(key, 32))
    nxt = lambda: next(keys)  # noqa: E731
    params = {
        "stem": _conv_init(nxt(), 3, 3, 3, ch[0]),
        "enc": [
            {"down": _conv_init(nxt(), 3, 3, ch[max(i - 1, 0)], ch[i]),
             "conv": _conv_init(nxt(), 3, 3, ch[i], ch[i])}
            for i in range(4)
        ],
        # Per-level 1x1 projections to the decoder width + fusion convs.
        "proj": [_conv_init(nxt(), 1, 1, ch[i], dc) for i in range(4)],
        "fuse": [_conv_init(nxt(), 3, 3, dc, dc) for _ in range(4)],
        "head1": _conv_init(nxt(), 3, 3, dc, dc // 2),
        "head2": _conv_init(nxt(), 3, 3, dc // 2, 1),
    }
    return params


def _conv(x, p, stride=1, act=True):
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["b"]
    out = out.astype(x.dtype)
    return jax.nn.relu(out) if act else out


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def depth_forward(params: Dict[str, Any], cfg: DepthConfig,
                  image_chw: jnp.ndarray) -> jnp.ndarray:
    """(3, S, S) ImageNet-normalized image -> (S, S) relative inverse
    depth (larger = nearer), non-negative."""
    x = jnp.transpose(image_chw, (1, 2, 0))[None]
    x = _conv(x, params["stem"])

    skips = []
    for i, enc in enumerate(params["enc"]):
        x = _conv(x, enc["down"], stride=2)
        x = x + _conv(x, enc["conv"])
        skips.append(_conv(x, params["proj"][i], act=False))

    # Decoder: start at the deepest level, fuse upward.
    y = skips[-1]
    for i in range(2, -1, -1):
        y = _up2(_conv(y, params["fuse"][i + 1]))
        y = y + skips[i]
    y = _conv(y, params["fuse"][0])

    y = _up2(_conv(y, params["head1"]))
    y = _conv(y, params["head2"], act=False)[0, :, :, 0]
    return jax.nn.relu(y.astype(jnp.float32))


@jax.jit
def relative_to_metric(depth_rel: jnp.ndarray, min_depth_m: float = 0.3,
                       max_depth_m: float = 10.0) -> jnp.ndarray:
    """Map relative inverse depth to metric meters exactly as the
    reference does (tk_depth_midas.c:496-497): normalize to [0,1], then
    ``metric = max - norm * (max - min)`` — nearest pixel (largest
    inverse depth) lands at min_depth_m."""
    lo = jnp.min(depth_rel)
    hi = jnp.max(depth_rel)
    norm = (depth_rel - lo) / jnp.maximum(hi - lo, 1e-9)
    return max_depth_m - norm * (max_depth_m - min_depth_m)
