"""YOLO-family object detector, functional JAX (NHWC).

Parity target: the reference's ONNX YOLOv5nu/v8n detector session
(reference: src/vision/tk_object_detector.c:83-375 — ORT Run + decode +
NMS, with the NMS body an acknowledged stub :309-357). Here the whole
thing — backbone, neck, head, DFL decode — is one jit region feeding the
fixed-shape NMS in :mod:`trackiellm_tpu.ops.nms`, so a frame never
leaves the device between preprocess and final boxes.

Two variants, selected by ``DetectorConfig.variant``:

- ``"v8"``: CSP backbone with C2f blocks + SPPF, PAN neck.
- ``"v5"``: the reference's exact named model, YOLOv5nu — v5 backbone
  (6x6 stem, C3 blocks) + v5 PAN neck (1x1 lateral compressions feeding
  both the upsample AND the pan concat), with the SAME anchor-free
  DFL head as v8 (that is what ultralytics' "u" suffix means).

Both share the decoupled anchor-free head with DFL box regression
(reg_max=16). Layout is NHWC throughout — the conv layout XLA tiles
best on the MXU. Weights are fused conv+bias (BN folded), matching
exported checkpoints.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class DetectorConfig(NamedTuple):
    num_classes: int = 80
    # YOLOv8n widths after multiplier: stem->16, stages 32/64/128/256.
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256)
    # C2f bottleneck counts per stage (v8n depth): 1, 2, 2, 1.
    depths: Tuple[int, ...] = (1, 2, 2, 1)
    reg_max: int = 16
    img_size: int = 640
    variant: str = "v8"  # "v8" (C2f) | "v5" (YOLOv5u: C3 + v5 neck)

    @property
    def head_box_ch(self) -> int:
        """Detect box-branch width: ultralytics `c2 = max(16, ch[0]//4,
        reg_max*4)` with ch[0] = P3 channels."""
        return max(16, self.channels[2] // 4, self.reg_max * 4)

    @property
    def head_cls_ch(self) -> int:
        """Detect cls-branch width: ultralytics `c3 = max(ch[0],
        min(nc, 100))`."""
        return max(self.channels[2], min(self.num_classes, 100))

    @classmethod
    def v8n(cls) -> "DetectorConfig":
        return cls()

    @classmethod
    def v5nu(cls) -> "DetectorConfig":
        """YOLOv5nu — the reference's exact detector checkpoint
        (src/workers/src/cortex_worker.rs:110): width 0.25 / depth 0.33
        of yolov5.yaml -> C3 repeats (1, 2, 3, 1), same channels as
        v8n, anchor-free u-head."""
        return cls(depths=(1, 2, 3, 1), variant="v5")

    @classmethod
    def tiny(cls) -> "DetectorConfig":
        """Test-scale config (same topology, 1/4 width, img 160,
        reg_max shrunk so the head widths scale down too)."""
        return cls(num_classes=8, channels=(4, 8, 16, 32, 64),
                   depths=(1, 1, 1, 1), img_size=160, reg_max=4)

    @classmethod
    def tiny_v5(cls) -> "DetectorConfig":
        """Test-scale v5 variant (one stage with 2 repeats so the C3
        bottleneck chain is exercised)."""
        return cls(num_classes=8, channels=(4, 8, 16, 32, 64),
                   depths=(1, 1, 2, 1), img_size=160, reg_max=4,
                   variant="v5")


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout) -> Dict[str, jnp.ndarray]:
    scale = 1.0 / math.sqrt(kh * kw * cin)
    return {
        "w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                                -scale, scale),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _bottleneck_init(key, c) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"cv1": _conv_init(k1, 3, 3, c, c),
            "cv2": _conv_init(k2, 3, 3, c, c)}


def _c2f_init(key, cin, cout, n) -> Dict[str, Any]:
    keys = jax.random.split(key, n + 2)
    c = cout // 2
    return {
        "cv1": _conv_init(keys[0], 1, 1, cin, cout),
        "m": [_bottleneck_init(keys[i + 1], c) for i in range(n)],
        "cv2": _conv_init(keys[-1], 1, 1, (2 + n) * c, cout),
    }


def _sppf_init(key, c) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"cv1": _conv_init(k1, 1, 1, c, c // 2),
            "cv2": _conv_init(k2, 1, 1, c * 2, c)}


def _v5_bottleneck_init(key, c) -> Dict[str, Any]:
    """v5 Bottleneck inside C3: cv1 is 1x1 (v8's C2f uses 3x3)."""
    k1, k2 = jax.random.split(key)
    return {"cv1": _conv_init(k1, 1, 1, c, c),
            "cv2": _conv_init(k2, 3, 3, c, c)}


def _c3_init(key, cin, cout, n) -> Dict[str, Any]:
    keys = jax.random.split(key, n + 3)
    c = cout // 2
    return {
        "cv1": _conv_init(keys[0], 1, 1, cin, c),
        "cv2": _conv_init(keys[1], 1, 1, cin, c),
        "m": [_v5_bottleneck_init(keys[i + 2], c) for i in range(n)],
        "cv3": _conv_init(keys[-1], 1, 1, 2 * c, cout),
    }


def init_detector(key: jax.Array, cfg: DetectorConfig) -> Dict[str, Any]:
    if cfg.variant == "v5":
        return _init_detector_v5(key, cfg)
    ch = cfg.channels
    d = cfg.depths
    keys = iter(jax.random.split(key, 64))
    nxt = lambda: next(keys)  # noqa: E731

    params: Dict[str, Any] = {
        # Backbone: stem /2, then 4 downsampling stages -> P3, P4, P5.
        "stem": _conv_init(nxt(), 3, 3, 3, ch[0]),
        "down1": _conv_init(nxt(), 3, 3, ch[0], ch[1]),
        "c2f1": _c2f_init(nxt(), ch[1], ch[1], d[0]),
        "down2": _conv_init(nxt(), 3, 3, ch[1], ch[2]),
        "c2f2": _c2f_init(nxt(), ch[2], ch[2], d[1]),    # -> P3 (/8)
        "down3": _conv_init(nxt(), 3, 3, ch[2], ch[3]),
        "c2f3": _c2f_init(nxt(), ch[3], ch[3], d[2]),    # -> P4 (/16)
        "down4": _conv_init(nxt(), 3, 3, ch[3], ch[4]),
        "c2f4": _c2f_init(nxt(), ch[4], ch[4], d[3]),
        "sppf": _sppf_init(nxt(), ch[4]),                 # -> P5 (/32)
        # PAN neck.
        "up_c2f1": _c2f_init(nxt(), ch[4] + ch[3], ch[3], d[0]),
        "up_c2f2": _c2f_init(nxt(), ch[3] + ch[2], ch[2], d[0]),
        "pan_down1": _conv_init(nxt(), 3, 3, ch[2], ch[2]),
        "pan_c2f1": _c2f_init(nxt(), ch[2] + ch[3], ch[3], d[0]),
        "pan_down2": _conv_init(nxt(), 3, 3, ch[3], ch[3]),
        "pan_c2f2": _c2f_init(nxt(), ch[3] + ch[4], ch[4], d[0]),
    }
    # Decoupled head per level (P3, P4, P5) — ultralytics Detect exact:
    # box branch cv2 = Conv3x3(c, c2) -> Conv3x3(c2, c2) -> 1x1(c2, 4*reg_max)
    # cls branch cv3 = Conv3x3(c, c3) -> Conv3x3(c3, c3) -> 1x1(c3, nc)
    c2, c3 = cfg.head_box_ch, cfg.head_cls_ch
    for i, c in enumerate((ch[2], ch[3], ch[4])):
        params[f"head{i}_box1"] = _conv_init(nxt(), 3, 3, c, c2)
        params[f"head{i}_box2"] = _conv_init(nxt(), 3, 3, c2, c2)
        params[f"head{i}_box3"] = _conv_init(nxt(), 1, 1, c2,
                                             4 * cfg.reg_max)
        params[f"head{i}_cls1"] = _conv_init(nxt(), 3, 3, c, c3)
        params[f"head{i}_cls2"] = _conv_init(nxt(), 3, 3, c3, c3)
        params[f"head{i}_cls3"] = _conv_init(nxt(), 1, 1, c3,
                                             cfg.num_classes)
    return params


def _init_detector_v5(key: jax.Array, cfg: DetectorConfig) -> Dict[str, Any]:
    """YOLOv5(u) graph: 6x6 stem, C3 stages, v5 PAN neck whose 1x1
    lateral compressions (pre_up1/pre_up2 = yaml idx 10/14) feed both
    the upsample path and the downsample-side concats."""
    ch = cfg.channels
    d = cfg.depths
    keys = iter(jax.random.split(key, 64))
    nxt = lambda: next(keys)  # noqa: E731

    params: Dict[str, Any] = {
        "stem": _conv_init(nxt(), 6, 6, 3, ch[0]),
        "down1": _conv_init(nxt(), 3, 3, ch[0], ch[1]),
        "c3_1": _c3_init(nxt(), ch[1], ch[1], d[0]),
        "down2": _conv_init(nxt(), 3, 3, ch[1], ch[2]),
        "c3_2": _c3_init(nxt(), ch[2], ch[2], d[1]),     # -> P3 (/8)
        "down3": _conv_init(nxt(), 3, 3, ch[2], ch[3]),
        "c3_3": _c3_init(nxt(), ch[3], ch[3], d[2]),     # -> P4 (/16)
        "down4": _conv_init(nxt(), 3, 3, ch[3], ch[4]),
        "c3_4": _c3_init(nxt(), ch[4], ch[4], d[3]),
        "sppf": _sppf_init(nxt(), ch[4]),                 # -> P5 (/32)
        # v5 PAN neck (yaml idx 10-23; repeats = round(3*depth) = d[0]).
        "pre_up1": _conv_init(nxt(), 1, 1, ch[4], ch[3]),
        "up_c3_1": _c3_init(nxt(), 2 * ch[3], ch[3], d[0]),
        "pre_up2": _conv_init(nxt(), 1, 1, ch[3], ch[2]),
        "up_c3_2": _c3_init(nxt(), 2 * ch[2], ch[2], d[0]),
        "pan_down1": _conv_init(nxt(), 3, 3, ch[2], ch[2]),
        "pan_c3_1": _c3_init(nxt(), 2 * ch[2], ch[3], d[0]),
        "pan_down2": _conv_init(nxt(), 3, 3, ch[3], ch[3]),
        "pan_c3_2": _c3_init(nxt(), 2 * ch[3], ch[4], d[0]),
    }
    c2, c3 = cfg.head_box_ch, cfg.head_cls_ch
    for i, c in enumerate((ch[2], ch[3], ch[4])):
        params[f"head{i}_box1"] = _conv_init(nxt(), 3, 3, c, c2)
        params[f"head{i}_box2"] = _conv_init(nxt(), 3, 3, c2, c2)
        params[f"head{i}_box3"] = _conv_init(nxt(), 1, 1, c2,
                                             4 * cfg.reg_max)
        params[f"head{i}_cls1"] = _conv_init(nxt(), 3, 3, c, c3)
        params[f"head{i}_cls2"] = _conv_init(nxt(), 3, 3, c3, c3)
        params[f"head{i}_cls3"] = _conv_init(nxt(), 1, 1, c3,
                                             cfg.num_classes)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1, act=True, pad=None):
    """NHWC conv + bias (+ SiLU), f32 accumulation.

    Padding is the torch convention (symmetric k//2 on both sides), NOT
    XLA 'SAME': for stride-2 convs SAME pads (0,1) while checkpoints
    trained under torch/ONNX pad (1,1) — the one-pixel shift would
    misalign every downsampling stage against converted weights.
    ``pad`` overrides (v5's 6x6 stem uses explicit padding 2, not 3).
    """
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    ph = kh // 2 if pad is None else pad
    pw = kw // 2 if pad is None else pad
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["b"]
    out = out.astype(x.dtype)
    return jax.nn.silu(out) if act else out


def _bottleneck(x, p, shortcut):
    out = _conv(_conv(x, p["cv1"]), p["cv2"])
    return x + out if shortcut else out


def _c2f(x, p, shortcut=True):
    y = _conv(x, p["cv1"])
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    for m in p["m"]:
        outs.append(_bottleneck(outs[-1], m, shortcut))
    return _conv(jnp.concatenate(outs, axis=-1), p["cv2"])


def _c3(x, p, shortcut=True):
    """v5 C3: two 1x1 lateral branches; the bottleneck chain (1x1 then
    3x3 convs, residual when ``shortcut``) runs on branch 1 only."""
    a = _conv(x, p["cv1"])
    for m in p["m"]:
        a = _bottleneck(a, m, shortcut)
    b = _conv(x, p["cv2"])
    return _conv(jnp.concatenate([a, b], axis=-1), p["cv3"])


def _sppf(x, p):
    y = _conv(x, p["cv1"])
    pools = [y]
    for _ in range(3):
        pools.append(lax.reduce_window(
            pools[-1], -jnp.inf, lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            "SAME"))
    return _conv(jnp.concatenate(pools, axis=-1), p["cv2"])


def _upsample2(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _head(x, p, i):
    box = _conv(_conv(_conv(x, p[f"head{i}_box1"]), p[f"head{i}_box2"]),
                p[f"head{i}_box3"], act=False)
    cls = _conv(_conv(_conv(x, p[f"head{i}_cls1"]), p[f"head{i}_cls2"]),
                p[f"head{i}_cls3"], act=False)
    return box, cls


@functools.partial(jax.jit, static_argnames=("cfg",))
def detector_forward(params: Dict[str, Any], cfg: DetectorConfig,
                     image_chw: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(3, S, S) letterboxed image -> decoded (A, 4) xyxy boxes in input
    pixels + (A, nc) class probabilities. A = S^2/64 + S^2/256 + S^2/1024.
    """
    x = jnp.transpose(image_chw, (1, 2, 0))[None]  # NHWC, batch 1

    if cfg.variant == "v5":
        # Backbone: 6x6/2 stem (pad 2), C3 stages.
        x = _conv(x, params["stem"], stride=2, pad=2)
        x = _c3(_conv(x, params["down1"], stride=2), params["c3_1"])
        p3 = _c3(_conv(x, params["down2"], stride=2), params["c3_2"])
        p4 = _c3(_conv(p3, params["down3"], stride=2), params["c3_3"])
        p5 = _sppf(_c3(_conv(p4, params["down4"], stride=2),
                       params["c3_4"]), params["sppf"])
        # v5 PAN: 1x1 compressions feed the upsample AND the pan concat.
        t5 = _conv(p5, params["pre_up1"])
        u4 = _c3(jnp.concatenate([_upsample2(t5), p4], -1),
                 params["up_c3_1"], shortcut=False)
        t4 = _conv(u4, params["pre_up2"])
        u3 = _c3(jnp.concatenate([_upsample2(t4), p3], -1),
                 params["up_c3_2"], shortcut=False)
        d4 = _c3(jnp.concatenate(
            [_conv(u3, params["pan_down1"], stride=2), t4], -1),
            params["pan_c3_1"], shortcut=False)
        d5 = _c3(jnp.concatenate(
            [_conv(d4, params["pan_down2"], stride=2), t5], -1),
            params["pan_c3_2"], shortcut=False)
    else:
        # Backbone
        x = _conv(x, params["stem"], stride=2)
        x = _c2f(_conv(x, params["down1"], stride=2), params["c2f1"])
        p3 = _c2f(_conv(x, params["down2"], stride=2), params["c2f2"])
        p4 = _c2f(_conv(p3, params["down3"], stride=2), params["c2f3"])
        p5 = _sppf(_c2f(_conv(p4, params["down4"], stride=2),
                        params["c2f4"]), params["sppf"])

        # PAN neck
        u4 = _c2f(jnp.concatenate([_upsample2(p5), p4], -1),
                  params["up_c2f1"], shortcut=False)
        u3 = _c2f(jnp.concatenate([_upsample2(u4), p3], -1),
                  params["up_c2f2"], shortcut=False)
        d4 = _c2f(jnp.concatenate(
            [_conv(u3, params["pan_down1"], stride=2), u4], -1),
            params["pan_c2f1"], shortcut=False)
        d5 = _c2f(jnp.concatenate(
            [_conv(d4, params["pan_down2"], stride=2), p5], -1),
            params["pan_c2f2"], shortcut=False)

    # Heads + DFL decode per level, concatenated over all anchors.
    boxes_all: List[jnp.ndarray] = []
    cls_all: List[jnp.ndarray] = []
    for i, (feat, stride) in enumerate(((u3, 8), (d4, 16), (d5, 32))):
        box_raw, cls_raw = _head(feat, params, i)
        _, h, w, _ = box_raw.shape
        # DFL: softmax expectation over reg_max bins per side distance.
        dist = box_raw.reshape(h * w, 4, cfg.reg_max)
        bins = jnp.arange(cfg.reg_max, dtype=jnp.float32)
        ltrb = jnp.sum(jax.nn.softmax(dist.astype(jnp.float32), -1) * bins,
                       axis=-1)  # (HW, 4) in stride units
        cy, cx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                              jnp.arange(w, dtype=jnp.float32) + 0.5,
                              indexing="ij")
        centers = jnp.stack([cx.ravel(), cy.ravel()], -1)  # (HW, 2)
        xy1 = (centers - ltrb[:, :2]) * stride
        xy2 = (centers + ltrb[:, 2:]) * stride
        boxes_all.append(jnp.concatenate([xy1, xy2], -1))
        cls_all.append(
            jax.nn.sigmoid(cls_raw.reshape(h * w, cfg.num_classes)
                           .astype(jnp.float32)))

    return jnp.concatenate(boxes_all, 0), jnp.concatenate(cls_all, 0)


# COCO-80 label table (parity: the embedded table in
# tk_vision_pipeline.c:343-354).
COCO_LABELS = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)
