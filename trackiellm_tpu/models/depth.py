"""Monocular depth estimator — MiDaS v2.1 small exact topology, NHWC JAX.

Parity target: the reference's MiDaS ONNX session
(reference: src/vision/tk_depth_midas.c:176-499): ImageNet-normalized
input, relative inverse-depth output, and the relative->metric mapping
``metric = max_depth - norm * (max_depth - min_depth)``
(tk_depth_midas.c:496-497), reproduced exactly in
:func:`relative_to_metric`.

Architecture = the published MidasNet_small:

  - encoder: **tf_efficientnet_lite3** (MBConv stages, ReLU6, no SE,
    TF 'SAME' asymmetric padding — which is exactly XLA's SAME), with
    MiDaS feature taps layer1../4 at strides 4/8/16/32 and channels
    32/48/136/384;
  - decoder: scratch.layerK_rn 3x3 projections (64/128/256/512,
    expand=True), FeatureFusionBlock_custom refinenets (two residual
    conv units + skip add + align_corners=True bilinear x2 + 1x1
    out_conv halving channels), and the 3-conv output head.

Weights ingest from the published checkpoint via
models.convert.midas_small_from_torch (BN folded into convs).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

import math


class MBStage(NamedTuple):
    kernel: int
    stride: int
    expand: int
    cout: int
    repeats: int


class DepthConfig(NamedTuple):
    stem_ch: int = 32
    # efficientnet-lite3 resolved stages (width 1.2, depth 1.4,
    # first/last repeats unscaled): kernel, stride, expand, cout, n.
    stages: Tuple[MBStage, ...] = (
        MBStage(3, 1, 1, 24, 1),
        MBStage(3, 2, 6, 32, 3),
        MBStage(5, 2, 6, 48, 3),
        MBStage(3, 2, 6, 96, 5),
        MBStage(5, 1, 6, 136, 5),
        MBStage(5, 2, 6, 232, 6),
        MBStage(3, 1, 6, 384, 1),
    )
    features: int = 64   # decoder width (expand=True: x1/x2/x4/x8)
    img_size: int = 256

    @property
    def tap_channels(self) -> Tuple[int, int, int, int]:
        """Encoder channels at the 4 MiDaS taps (after stages 2,3,5,7)."""
        s = self.stages
        return (s[1].cout, s[2].cout, s[4].cout, s[6].cout)

    @classmethod
    def small(cls) -> "DepthConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "DepthConfig":
        """Same topology at test scale."""
        return cls(
            stem_ch=8,
            stages=(
                MBStage(3, 1, 1, 8, 1),
                MBStage(3, 2, 6, 8, 1),
                MBStage(5, 2, 6, 8, 1),
                MBStage(3, 2, 6, 16, 1),
                MBStage(5, 1, 6, 16, 1),
                MBStage(5, 2, 6, 24, 1),
                MBStage(3, 1, 6, 32, 1),
            ),
            features=16, img_size=96)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, bias=True, depthwise=False):
    fan = kh * kw * (1 if depthwise else cin)
    scale = 1.0 / math.sqrt(fan)
    shape = (kh, kw, 1, cout) if depthwise else (kh, kw, cin, cout)
    p = {"w": jax.random.uniform(key, shape, jnp.float32, -scale, scale)}
    p["b"] = jnp.zeros((cout,), jnp.float32) if bias else None
    return p


def init_depth(key: jax.Array, cfg: DepthConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    nxt = lambda: next(keys)  # noqa: E731

    blocks: List[List[Dict[str, Any]]] = []
    cin = cfg.stem_ch
    for si, st in enumerate(cfg.stages):
        stage = []
        for j in range(st.repeats):
            if st.expand == 1:  # DepthwiseSeparable (stage 1)
                stage.append({
                    "dw": _conv_init(nxt(), st.kernel, st.kernel, cin,
                                     cin, depthwise=True),
                    "pw": _conv_init(nxt(), 1, 1, cin, st.cout),
                })
            else:  # InvertedResidual
                mid = cin * st.expand
                stage.append({
                    "pw": _conv_init(nxt(), 1, 1, cin, mid),
                    "dw": _conv_init(nxt(), st.kernel, st.kernel, mid,
                                     mid, depthwise=True),
                    "pwl": _conv_init(nxt(), 1, 1, mid, st.cout),
                })
            cin = st.cout
        blocks.append(stage)

    f = cfg.features
    taps = cfg.tap_channels
    rn_out = (f, f * 2, f * 4, f * 8)

    def rcu(c):
        return {"c1": _conv_init(nxt(), 3, 3, c, c),
                "c2": _conv_init(nxt(), 3, 3, c, c)}

    refine = []
    # refinenet1..4 over decoder channels (f, 2f, 4f, 8f); expand=True
    # halves channels in out_conv except refinenet1.
    for k in range(4):
        c = rn_out[k]
        out_c = f if k == 0 else c // 2
        refine.append({"rcu1": rcu(c), "rcu2": rcu(c),
                       "out": _conv_init(nxt(), 1, 1, c, out_c)})

    return {
        "stem": _conv_init(nxt(), 3, 3, 3, cfg.stem_ch),
        "blocks": blocks,
        "layer_rn": [
            _conv_init(nxt(), 3, 3, taps[k], rn_out[k], bias=False)
            for k in range(4)],
        "refine": refine,
        "head1": _conv_init(nxt(), 3, 3, f, f // 2),
        "head2": _conv_init(nxt(), 3, 3, f // 2, 32),
        "head3": _conv_init(nxt(), 1, 1, 32, 1),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1, padding="SAME", act=None, depthwise=False):
    """NHWC conv (+ bias, + activation). ``padding='SAME'`` is the TF
    convention the tf_efficientnet_lite weights were trained under;
    the torch-side decoder uses symmetric k//2 padding."""
    w = p["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    if padding == "TORCH":
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1] if depthwise else 1,
        preferred_element_type=jnp.float32,
    )
    if p.get("b") is not None:
        out = out + p["b"]
    out = out.astype(x.dtype)
    if act == "relu6":
        return jnp.clip(out, 0.0, 6.0)
    if act == "relu":
        return jax.nn.relu(out)
    return out


def _bilinear_up2_ac(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with align_corners=True (torch semantics:
    src = dst * (in-1)/(out-1)), NHWC."""
    n, h, w, c = x.shape

    def axis_weights(size):
        out = 2 * size
        src = jnp.linspace(0.0, size - 1.0, out)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        frac = (src - lo).astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h)
    x_f = x.astype(jnp.float32)
    rows = (x_f[:, ylo] * (1.0 - yf)[None, :, None, None]
            + x_f[:, yhi] * yf[None, :, None, None])
    xlo, xhi, xf = axis_weights(w)
    out = (rows[:, :, xlo] * (1.0 - xf)[None, None, :, None]
           + rows[:, :, xhi] * xf[None, None, :, None])
    return out.astype(x.dtype)


def _bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear, align_corners=False (half-pixel) — matches both
    torch F.interpolate default and jax.image.resize 'linear'."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")


def _rcu(x, p):
    """ResidualConvUnit_custom: relu-conv-relu-conv + skip."""
    out = _conv(jax.nn.relu(x), p["c1"], padding="TORCH")
    out = _conv(jax.nn.relu(out), p["c2"], padding="TORCH")
    return out + x


def _fusion(p, x, skip=None):
    """FeatureFusionBlock_custom (deconv=False, bn=False,
    align_corners=True)."""
    out = x
    if skip is not None:
        out = out + _rcu(skip, p["rcu1"])
    out = _rcu(out, p["rcu2"])
    out = _bilinear_up2_ac(out)
    return _conv(out, p["out"], padding="TORCH")


@functools.partial(jax.jit, static_argnames=("cfg",))
def depth_forward(params: Dict[str, Any], cfg: DepthConfig,
                  image_chw: jnp.ndarray) -> jnp.ndarray:
    """(3, S, S) ImageNet-normalized image -> (S, S) relative inverse
    depth (larger = nearer), non-negative."""
    x = jnp.transpose(image_chw, (1, 2, 0))[None]

    # --- efficientnet-lite3 encoder ---
    x = _conv(x, params["stem"], stride=2, act="relu6")
    taps = []
    for si, (st, stage) in enumerate(zip(cfg.stages, params["blocks"])):
        for j, blk in enumerate(stage):
            stride = st.stride if j == 0 else 1
            if st.expand == 1:
                y = _conv(x, blk["dw"], stride=stride, act="relu6",
                          depthwise=True)
                y = _conv(y, blk["pw"])
                x = x + y if (stride == 1
                              and x.shape[-1] == y.shape[-1]) else y
            else:
                y = _conv(x, blk["pw"], act="relu6")
                y = _conv(y, blk["dw"], stride=stride, act="relu6",
                          depthwise=True)
                y = _conv(y, blk["pwl"])
                x = x + y if (stride == 1
                              and x.shape[-1] == y.shape[-1]) else y
        if si in (1, 2, 4, 6):  # MiDaS taps: layer1..layer4
            taps.append(x)

    # --- RefineNet decoder ---
    rn = [_conv(t, params["layer_rn"][k], padding="TORCH")
          for k, t in enumerate(taps)]
    path = _fusion(params["refine"][3], rn[3])
    path = _fusion(params["refine"][2], path, rn[2])
    path = _fusion(params["refine"][1], path, rn[1])
    path = _fusion(params["refine"][0], path, rn[0])

    # --- output head ---
    y = _conv(path, params["head1"], padding="TORCH")
    y = _bilinear_up2(y)
    y = _conv(y, params["head2"], padding="TORCH", act="relu")
    y = _conv(y, params["head3"], act="relu")
    return y[0, :, :, 0].astype(jnp.float32)


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
