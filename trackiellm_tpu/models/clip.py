"""CLIP ViT vision tower + LLaVA multimodal projector (TPU-native).

The reference's inference engine (llama.cpp) ships multimodal support
as a CLIP-family vision encoder whose projected patch embeddings are
spliced into the LLM prompt (llama.cpp's clip/llava "mmproj" path);
the reference itself describes scenes with YOLO labels only. This
module gives the rebuild the full VLM capability the engine family
supports: a CLIP ViT encoder (transformers ``CLIPVisionModel``
semantics, oracle-exact) plus the LLaVA two-layer projector, feeding
:func:`trackiellm_tpu.models.llm.prefill`'s ``embeds`` injection.

TPU-first design notes:

- The patch "convolution" (stride == kernel) is a single reshape +
  matmul — one MXU pass over ``(n_patches, 3*P*P) @ (3*P*P, D)``
  instead of a conv program.
- The encoder is a ``lax.scan`` over stacked layer params (one compiled
  layer body, flat program depth); LLaVA's ``vision_feature_layer=-2``
  becomes a *static slice* of the stacked params — the unused tail
  layers are never computed (HF computes all layers and indexes
  ``hidden_states[-2]``).
- Everything runs in one jit program per image bucket:
  patches -> ViT -> feature select -> projector.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CLIPVisionConfig", "encode_image", "project_features",
    "encode_and_project", "init_params", "CLIP_MEAN", "CLIP_STD",
    "preprocess_clip",
]

# OpenAI CLIP normalization constants (CLIPImageProcessor defaults).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """Static geometry of the vision tower (hashable: jit static arg)."""

    image_size: int = 336
    patch_size: int = 14
    dim: int = 1024            # vision hidden size
    n_layers: int = 24
    n_heads: int = 16
    hidden_dim: int = 4096     # MLP intermediate
    norm_eps: float = 1e-5
    act: str = "quick_gelu"    # CLIP's activation
    # LLaVA feature tap: which encoder hidden state feeds the projector.
    # HF semantics: hidden_states[k] with k in [-(n_layers+1), n_layers];
    # -2 (the default) = output of the second-to-last layer.
    feature_layer: int = -2
    # "default" drops the CLS token before projection; "full" keeps it.
    drop_cls: bool = True
    # Projector: vision dim -> LLM dim (0 = no projector params).
    proj_dim: int = 0
    proj_act: str = "gelu"
    # Projector depth: 2 = LLaVA's linear-act-linear; 1 = PaliGemma's
    # single linear (proj_act unused).
    proj_layers: int = 2
    # Tower dialect switches (CLIP defaults; SigLIP flips all four):
    use_cls: bool = True        # class token prepended (CLIP)
    patch_bias: bool = False    # patch conv bias (SigLIP)
    pre_ln: bool = True         # pre-encoder LayerNorm (CLIP pre_layrnorm)
    post_ln: bool = False       # post-encoder LayerNorm applied to the
    #                             feature tap (SigLIP/PaliGemma taps the
    #                             post_layernorm output)

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def n_image_tokens(self) -> int:
        """Tokens one image contributes to the LLM prompt."""
        if not self.use_cls:
            return self.n_patches
        return self.n_patches + (0 if self.drop_cls else 1)

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    def n_run_layers(self) -> int:
        """How many encoder layers the feature tap actually needs."""
        k = self.feature_layer
        n = self.n_layers + k + 1 if k < 0 else k
        if not 0 <= n <= self.n_layers:
            raise ValueError(f"feature_layer {k} out of range")
        return n


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "gelu_new" or name == "gelu_pytorch_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {name!r}")


def _ln(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
        eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_image(params: Dict[str, Any], cfg: CLIPVisionConfig,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """CLIP ViT forward: pixels -> selected hidden states.

    ``pixels`` is (3, H, W) float32, already CLIP-normalized (the HF
    ``pixel_values`` convention). Returns (n_image_tokens, dim) — the
    ``vision_feature_layer`` hidden states with CLS dropped per config
    (transformers ``LlavaForConditionalGeneration.get_image_features``
    semantics, "default" select strategy).
    """
    p = cfg.patch_size
    g = cfg.image_size // p
    # Patch extraction as reshape: (3, g, P, g, P) -> (g, g, 3, P, P)
    # -> (N, 3*P*P); flatten order (c, ph, pw) matches the conv weight
    # reshape in the converter.
    x = pixels.reshape(3, g, p, g, p).transpose(1, 3, 0, 2, 4)
    x = x.reshape(g * g, 3 * p * p)
    x = x @ params["patch_w"]                      # (N, D)
    if cfg.patch_bias:
        x = x + params["patch_b"]
    if cfg.use_cls:
        x = jnp.concatenate([params["cls"][None], x], axis=0)
    x = x + params["pos"]
    if cfg.pre_ln:
        x = _ln(x, params["pre_ln_g"], params["pre_ln_b"], cfg.norm_eps)

    n_run = cfg.n_run_layers()
    hd, nh = cfg.head_dim, cfg.n_heads
    scale = hd ** -0.5
    seq = cfg.n_patches + (1 if cfg.use_cls else 0)

    def layer_fn(x, layer):
        h = _ln(x, layer["ln1_g"], layer["ln1_b"], cfg.norm_eps)
        q = (h @ layer["wq"] + layer["bq"]).reshape(seq, nh, hd)
        k = (h @ layer["wk"] + layer["bk"]).reshape(seq, nh, hd)
        v = (h @ layer["wv"] + layer["bv"]).reshape(seq, nh, hd)
        scores = jnp.einsum("qhd,khd->hqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(seq, -1)
        x = x + (attn @ layer["wo"] + layer["bo"])
        h = _ln(x, layer["ln2_g"], layer["ln2_b"], cfg.norm_eps)
        h = _act(cfg.act, h @ layer["w1"] + layer["b1"])
        x = x + (h @ layer["w2"] + layer["b2"])
        return x, None

    if n_run:
        run_layers = jax.tree.map(lambda a: a[:n_run], params["layers"])
        x, _ = jax.lax.scan(layer_fn, x, run_layers)
    if cfg.post_ln:
        # SigLIP/PaliGemma tap the post_layernorm output; LLaVA taps
        # raw hidden states (CLIP's post-LN only feeds its
        # contrastive head).
        x = _ln(x, params["post_ln_g"], params["post_ln_b"],
                cfg.norm_eps)
    return x[1:] if (cfg.use_cls and cfg.drop_cls) else x


@functools.partial(jax.jit, static_argnames=("cfg",))
def project_features(params: Dict[str, Any], cfg: CLIPVisionConfig,
                     feats: jnp.ndarray) -> jnp.ndarray:
    """Multi-modal projector: (N, dim) -> (N, proj_dim). LLaVA's
    linear-act-linear (proj_layers=2) or PaliGemma's single linear."""
    proj = params["proj"]
    h = feats @ proj["w1"] + proj["b1"]
    if cfg.proj_layers == 1:
        return h
    return _act(cfg.proj_act, h) @ proj["w2"] + proj["b2"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_and_project(params: Dict[str, Any], cfg: CLIPVisionConfig,
                       pixels: jnp.ndarray) -> jnp.ndarray:
    """One program: pixels -> projected LLM-space image tokens."""
    return project_features(params, cfg, encode_image(params, cfg, pixels))


def preprocess_clip(image_u8, cfg: CLIPVisionConfig) -> jnp.ndarray:
    """HWC uint8 -> CLIP-normalized (3, S, S) float32 (on device).

    Thin wrapper over :func:`trackiellm_tpu.ops.preprocess.
    clip_normalize_chw` (one fused jit program)."""
    from ..ops.preprocess import clip_normalize_chw
    return clip_normalize_chw(image_u8, cfg.image_size, cfg.image_size)


def init_params(cfg: CLIPVisionConfig, rng: np.random.Generator,
                dtype=jnp.float32) -> Dict[str, Any]:
    """Random params in the converter's layout (tests / cold start)."""
    d, hd = cfg.dim, cfg.hidden_dim
    pp = 3 * cfg.patch_size * cfg.patch_size
    n = cfg.n_layers

    def w(*shape, s=0.02):
        return jnp.asarray(rng.normal(0.0, s, shape), dtype)

    layers = {
        "ln1_g": jnp.ones((n, d), dtype), "ln1_b": jnp.zeros((n, d), dtype),
        "ln2_g": jnp.ones((n, d), dtype), "ln2_b": jnp.zeros((n, d), dtype),
        "wq": w(n, d, d), "bq": jnp.zeros((n, d), dtype),
        "wk": w(n, d, d), "bk": jnp.zeros((n, d), dtype),
        "wv": w(n, d, d), "bv": jnp.zeros((n, d), dtype),
        "wo": w(n, d, d), "bo": jnp.zeros((n, d), dtype),
        "w1": w(n, d, hd), "b1": jnp.zeros((n, hd), dtype),
        "w2": w(n, hd, d), "b2": jnp.zeros((n, d), dtype),
    }
    n_pos = cfg.n_patches + (1 if cfg.use_cls else 0)
    params: Dict[str, Any] = {
        "patch_w": w(pp, d), "pos": w(n_pos, d),
        "layers": layers,
    }
    if cfg.use_cls:
        params["cls"] = w(d)
    if cfg.patch_bias:
        params["patch_b"] = jnp.zeros((d,), dtype)
    if cfg.pre_ln:
        params["pre_ln_g"] = jnp.ones((d,), dtype)
        params["pre_ln_b"] = jnp.zeros((d,), dtype)
    if cfg.post_ln:
        params["post_ln_g"] = jnp.ones((d,), dtype)
        params["post_ln_b"] = jnp.zeros((d,), dtype)
    if cfg.proj_dim:
        params["proj"] = {
            "w1": w(d, cfg.proj_dim), "b1": jnp.zeros((cfg.proj_dim,), dtype),
        }
        if cfg.proj_layers == 2:
            params["proj"]["w2"] = w(cfg.proj_dim, cfg.proj_dim)
            params["proj"]["b2"] = jnp.zeros((cfg.proj_dim,), dtype)
    return params
