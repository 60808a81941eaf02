"""DPT-SwinV2 monocular depth — the reference's exact depth family.

The reference loads "MiDaS DPT-SwinV2" through an ONNX session
(reference: src/vision/tk_depth_midas.c:176; model set
src/cortex/tk_cortex_main.h:70-76).  The rebuild already ships MiDaS
v2.1-small (models/depth.py) as the lightweight option; this module is
the topology-exact DPT-SwinV2 family (MiDaS 3.1 ``dpt_swin2_tiny_256``
and siblings), validated against ``transformers.DPTForDepthEstimation``
with a ``Swinv2`` backbone — the class that loads the published
``Intel/dpt-swinv2-tiny-256`` checkpoint, so matching it numerically
means the real weights load bit-faithfully.

Architecture (all static shapes, NHWC, window geometry resolved at
trace time so XLA sees plain batched matmuls on the MXU):

  - SwinV2 backbone: 4x4 conv patch embed + LayerNorm; 4 stages of
    shifted-window blocks with *post*-norm residuals, scaled-cosine
    attention (L2-normalized q/k, learned per-head ``logit_scale``
    clamped at ln(100)), and a continuous relative-position-bias MLP
    (2->512->heads, log-spaced coords, 16*sigmoid); patch merging
    (2x2 concat -> Linear 4C->2C no-bias -> LayerNorm) between stages.
    Window size clamps to the stage resolution and the shift drops to 0
    when the resolution fits in one window, exactly as the oracle does.
  - DPT neck: per-stage 3x3 no-bias projections to the fusion width
    (hierarchical backbone => no reassemble stage), then the RefineNet
    fusion pyramid (pre-act residual conv units + align_corners=True
    2x upsample + 1x1 projection) shared with models/depth.py.
  - Depth head: 3x3 conv (F -> F/2), align_corners=True 2x upsample,
    3x3 conv -> 32, ReLU, 1x1 conv -> 1, ReLU. Output is full input
    resolution, relative inverse depth (larger = nearer).

Input normalization for the published checkpoints is (x - 0.5) / 0.5
per channel (the DPT image processor), NOT ImageNet stats — see
``DPT_MEAN``/``DPT_STD``.

Oracle quirk mirrored deliberately: the HF Swinv2 attention adds the
shifted-window mask twice (modeling_swinv2.py Swinv2SelfAttention
forward); we add ``2 * mask`` so masked logits match exactly.

The relative->metric mapping reuses models.depth.relative_to_metric
(tk_depth_midas.c:496-497 semantics).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from trackiellm_tpu.models.depth import (
    _bilinear_up2_ac,
    _conv,
    _conv_init,
    _fusion,
)
# Re-exported: the DPT family shares the metric contract (tk_depth_midas.c:496).
from trackiellm_tpu.models.depth import relative_to_metric  # noqa: F401


class DPTSwinConfig(NamedTuple):
    image_size: int = 256
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 16
    mlp_ratio: float = 4.0
    eps: float = 1e-5
    fusion_hidden: int = 256

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(len(self.depths)))

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @classmethod
    def tiny_256(cls) -> "DPTSwinConfig":
        """MiDaS 3.1 dpt_swin2_tiny_256 (= Intel/dpt-swinv2-tiny-256)."""
        return cls()

    @classmethod
    def base_384(cls) -> "DPTSwinConfig":
        """MiDaS 3.1 dpt_swin2_base_384 (= Intel/dpt-swinv2-base-384)."""
        return cls(image_size=384, embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32), window_size=24)

    @classmethod
    def large_384(cls) -> "DPTSwinConfig":
        """MiDaS 3.1 dpt_swin2_large_384."""
        return cls(image_size=384, embed_dim=192, depths=(2, 2, 18, 2),
                   num_heads=(6, 12, 24, 48), window_size=24)

    @classmethod
    def test_tiny(cls) -> "DPTSwinConfig":
        """Same topology at test scale: exercises clamped windows,
        shifted and unshifted blocks, and every merge."""
        return cls(image_size=64, embed_dim=16, depths=(2, 2, 2, 2),
                   num_heads=(2, 2, 4, 4), window_size=4,
                   fusion_hidden=32)


# (x - mean) / std, matching the DPT image processor (not ImageNet).
DPT_MEAN = (0.5, 0.5, 0.5)
DPT_STD = (0.5, 0.5, 0.5)


def _win_geometry(res: int, window: int, shift: int) -> Tuple[int, int]:
    """Oracle's Swinv2Layer._compute_window_shift: clamp the window to
    the stage resolution; no shift when one window covers it."""
    w = res if res <= window else window
    s = 0 if res <= w else shift
    return w, s


def _ln(x: jnp.ndarray, p: Dict[str, jnp.ndarray], eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _coords_table(window: int) -> np.ndarray:
    """Log-spaced relative-coordinate table for the CPB MLP,
    ((2w-1)^2, 2) — oracle: Swinv2SelfAttention.relative_coords_table
    with pretrained_window_size == 0."""
    r = np.arange(-(window - 1), window, dtype=np.float64)
    t = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)
    if window > 1:
        t = t / (window - 1)
    t = t * 8.0
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / math.log2(8.0)
    return t.reshape(-1, 2).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _rel_index(window: int) -> np.ndarray:
    """Pairwise relative-position index into the (2w-1)^2 bias table,
    (w*w, w*w) int32."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Shifted-window attention mask, (num_windows, w*w, w*w) float32
    with 0 / -100 entries (oracle: Swinv2Layer.get_attn_mask)."""
    img = np.zeros((h, w), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    mw = img.reshape(h // window, window, w // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0.0, -100.0, 0.0).astype(np.float32)


def _cpb_bias(p: Dict[str, jnp.ndarray], window: int,
              num_heads: int) -> jnp.ndarray:
    """Continuous relative position bias: MLP(2->512->heads) over the
    static coords table, gathered pairwise, 16*sigmoid.
    Returns (heads, w*w, w*w)."""
    table = jnp.asarray(_coords_table(window))
    hdn = jax.nn.relu(table @ p["w0"] + p["b0"])
    out = hdn @ p["w1"]                       # ((2w-1)^2, heads)
    idx = jnp.asarray(_rel_index(window).reshape(-1))
    bias = out[idx].reshape(window * window, window * window, num_heads)
    bias = 16.0 * jax.nn.sigmoid(bias)
    return jnp.transpose(bias, (2, 0, 1))


def _swin_block(x: jnp.ndarray, p: Dict[str, Any], num_heads: int,
                window: int, shift: int, eps: float) -> jnp.ndarray:
    """One SwinV2 block on an NHWC feature map (post-norm residuals,
    scaled-cosine windowed attention). Resolution must be a multiple of
    the (already clamped) window — true for every power-of-two pyramid
    this family runs at; asserted at trace time."""
    b, hgt, wid, c = x.shape
    assert hgt % window == 0 and wid % window == 0, (hgt, wid, window)
    hd = c // num_heads
    shortcut = x

    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

    nh, nw = hgt // window, wid // window
    t = window * window
    xw = x.reshape(b, nh, window, nw, window, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, t, c)

    q = xw @ p["wq"] + p["bq"]
    k = xw @ p["wk"]                      # oracle: key has no bias
    v = xw @ p["wv"] + p["bv"]
    q = q.reshape(-1, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(-1, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(-1, t, num_heads, hd).transpose(0, 2, 1, 3)

    # Scaled cosine attention (F.normalize eps = 1e-12).
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    scale = jnp.exp(jnp.minimum(p["logit_scale"], math.log(100.0)))
    scores = (qn @ kn.transpose(0, 1, 3, 2)) * scale[None]
    scores = scores + _cpb_bias(p["cpb"], window, num_heads)[None]

    if shift > 0:
        mask = jnp.asarray(_shift_mask(hgt, wid, window, shift))
        # The oracle adds the mask twice (see module docstring).
        scores = (scores.reshape(b, nh * nw, num_heads, t, t)
                  + 2.0 * mask[None, :, None])
        scores = scores.reshape(-1, num_heads, t, t)

    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    ctx = (probs.astype(v.dtype) @ v).transpose(0, 2, 1, 3)
    ctx = ctx.reshape(-1, t, c) @ p["wo"] + p["bo"]

    ctx = ctx.reshape(b, nh, nw, window, window, c)
    ctx = ctx.transpose(0, 1, 3, 2, 4, 5).reshape(b, hgt, wid, c)
    if shift > 0:
        ctx = jnp.roll(ctx, (shift, shift), axis=(1, 2))

    # Post-norm residuals (SwinV2): norm the branch, then add.
    x = shortcut + _ln(ctx, p["ln1"], eps)
    h = jax.nn.gelu(x @ p["wi"] + p["bi"], approximate=False)
    h = h @ p["wp"] + p["bp"]
    return x + _ln(h, p["ln2"], eps)


def _patch_merge(x: jnp.ndarray, p: Dict[str, Any],
                 eps: float) -> jnp.ndarray:
    """2x2 concat -> Linear(4C->2C, no bias) -> LayerNorm (v2 order)."""
    f0 = x[:, 0::2, 0::2]
    f1 = x[:, 1::2, 0::2]
    f2 = x[:, 0::2, 1::2]
    f3 = x[:, 1::2, 1::2]
    y = jnp.concatenate([f0, f1, f2, f3], axis=-1)
    y = y @ p["w"]
    return _ln(y, p["norm"], eps)


def _lin_init(key, cin, cout, bias=True):
    k1, _ = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (cin, cout), jnp.float32)
              / math.sqrt(cin)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _ln_init(c):
    return {"g": jnp.ones((c,), jnp.float32),
            "b": jnp.zeros((c,), jnp.float32)}


def init_dpt(key: jax.Array, cfg: DPTSwinConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 4096))
    nxt = lambda: next(keys)  # noqa: E731

    def block(dim, heads):
        qkv = lambda bias: _lin_init(nxt(), dim, dim, bias=bias)  # noqa: E731
        wq, wk, wv = qkv(True), qkv(False), qkv(True)
        wo = _lin_init(nxt(), dim, dim)
        mid = int(dim * cfg.mlp_ratio)
        wi = _lin_init(nxt(), dim, mid)
        wp = _lin_init(nxt(), mid, dim)
        cpb0 = _lin_init(nxt(), 2, 512)
        cpb1 = _lin_init(nxt(), 512, heads, bias=False)
        return {
            "wq": wq["w"], "bq": wq["b"], "wk": wk["w"],
            "wv": wv["w"], "bv": wv["b"], "wo": wo["w"], "bo": wo["b"],
            "wi": wi["w"], "bi": wi["b"], "wp": wp["w"], "bp": wp["b"],
            "ln1": _ln_init(dim), "ln2": _ln_init(dim),
            "logit_scale": jnp.full((heads, 1, 1), math.log(10.0)),
            "cpb": {"w0": cpb0["w"], "b0": cpb0["b"], "w1": cpb1["w"]},
        }

    stages: List[Dict[str, Any]] = []
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        dim = cfg.stage_dims[i]
        stage: Dict[str, Any] = {
            "blocks": [block(dim, heads) for _ in range(depth)]}
        if i < len(cfg.depths) - 1:
            stage["merge"] = {
                "w": _lin_init(nxt(), 4 * dim, 2 * dim, bias=False)["w"],
                "norm": _ln_init(2 * dim),
            }
        stages.append(stage)

    f = cfg.fusion_hidden

    def rcu():
        return {"c1": _conv_init(nxt(), 3, 3, f, f),
                "c2": _conv_init(nxt(), 3, 3, f, f)}

    def fuse(first: bool):
        p = {"rcu2": rcu(), "out": _conv_init(nxt(), 1, 1, f, f)}
        if not first:
            p["rcu1"] = rcu()
        return p

    return {
        "patch_embed": _conv_init(nxt(), cfg.patch_size, cfg.patch_size,
                                  3, cfg.embed_dim),
        "embed_norm": _ln_init(cfg.embed_dim),
        "stages": stages,
        "neck_convs": [
            {"w": _conv_init(nxt(), 3, 3, d, f, bias=False)["w"],
             "b": None}
            for d in cfg.stage_dims],
        "fusion": [fuse(i == 0) for i in range(len(cfg.depths))],
        "head1": _conv_init(nxt(), 3, 3, f, f // 2),
        "head2": _conv_init(nxt(), 3, 3, f // 2, 32),
        "head3": _conv_init(nxt(), 1, 1, 32, 1),
    }


def swin_features(params: Dict[str, Any], cfg: DPTSwinConfig,
                  x: jnp.ndarray) -> List[jnp.ndarray]:
    """SwinV2 backbone: NHWC image -> per-stage before-downsample
    feature maps at strides 4/8/16/32 (oracle: Swinv2Backbone with
    out_features=stage1..4, output_hidden_states_before_downsampling)."""
    x = _conv(x, params["patch_embed"], stride=cfg.patch_size,
              padding="VALID")
    x = _ln(x, params["embed_norm"], cfg.eps)

    feats: List[jnp.ndarray] = []
    res = cfg.grid
    for i, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[i]
        blocks = stage["blocks"]
        win_e, shift_e = _win_geometry(res, cfg.window_size, 0)
        win_o, shift_o = _win_geometry(res, cfg.window_size,
                                       cfg.window_size // 2)
        if len(blocks) % 2 == 0 and len(blocks) > 2:
            # Deep stages (6 blocks in tiny, 18 in base/large) scan
            # over stacked (unshifted, shifted) block pairs — one
            # traced pair instead of N unrolled blocks keeps the XLA
            # program (and compile time) flat in depth. Identical math:
            # every even block shifts 0, every odd cfg.window//2.
            pairs = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[{"e": blocks[k], "o": blocks[k + 1]}
                  for k in range(0, len(blocks), 2)])

            def pair_body(carry, p, _h=heads, _we=win_e, _wo=win_o,
                          _so=shift_o):
                carry = _swin_block(carry, p["e"], _h, _we, 0, cfg.eps)
                carry = _swin_block(carry, p["o"], _h, _wo, _so,
                                    cfg.eps)
                return carry, None

            x, _ = jax.lax.scan(pair_body, x, pairs)
        else:
            for j, blk in enumerate(blocks):
                win, shift = ((win_e, shift_e) if j % 2 == 0
                              else (win_o, shift_o))
                x = _swin_block(x, blk, heads, win, shift, cfg.eps)
        feats.append(x)
        if "merge" in stage:
            x = _patch_merge(x, stage["merge"], cfg.eps)
            res //= 2
    return feats


@functools.partial(jax.jit, static_argnames=("cfg",))
def dpt_forward(params: Dict[str, Any], cfg: DPTSwinConfig,
                image_chw: jnp.ndarray) -> jnp.ndarray:
    """(3, S, S) DPT-normalized image -> (S, S) relative inverse depth
    (larger = nearer), non-negative. Same contract as
    models.depth.depth_forward, so it drops into VisionPipeline's
    ``depth_fn`` unchanged."""
    x = jnp.transpose(image_chw, (1, 2, 0))[None]
    feats = swin_features(params, cfg, x)

    # DPT neck: hierarchical backbone => no reassemble; 3x3 no-bias
    # projections, then the fusion pyramid deepest-first.
    rn = [_conv(t, params["neck_convs"][i], padding="TORCH")
          for i, t in enumerate(feats)]
    fusion = params["fusion"]
    path = _fusion(fusion[0], rn[3])
    path = _fusion(fusion[1], path, rn[2])
    path = _fusion(fusion[2], path, rn[1])
    path = _fusion(fusion[3], path, rn[0])

    # Depth head (head_in_index=-1; align_corners=True upsample —
    # unlike MiDaS-small's half-pixel head).
    y = _conv(path, params["head1"], padding="TORCH")
    y = _bilinear_up2_ac(y)
    y = _conv(y, params["head2"], padding="TORCH", act="relu")
    y = _conv(y, params["head3"], act="relu")
    return y[0, :, :, 0].astype(jnp.float32)
