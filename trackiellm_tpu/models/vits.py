"""VITS inference graph (Piper voices), JAX/TPU-native.

Parity target: the reference synthesizes speech through Piper, which
ships VITS inference ONNX graphs (reference: src/audio/tk_tts_piper.c:
237 ``piper_context_create``; docs/REAL_WEIGHTS.md name table). The
framework's own TTS (models/tts.py) is a leaner acoustic+vocoder
redesign; THIS module is the published-architecture twin that ingests
real Piper voice checkpoints via convert.vits_from_torch.

Inference pipeline (VITS, eval path only — no posterior encoder, no
discriminator):
  phonemes -> TextEncoder (transformer w/ windowed relative attention)
           -> (m_p, logs_p)
  durations: StochasticDurationPredictor reverse pass (spline flows)
             or the deterministic DurationPredictor
  expand:   frame<-phoneme alignment from cumulative durations
            (searchsorted over a static max_frames — TPU-friendly)
  z_p = m_p + randn * exp(logs_p) * noise_scale
  flow^-1:  residual coupling stack (mean-only) inverted
  decoder:  HiFiGAN generator -> waveform

TPU design notes: all shapes static (phoneme bucket + max_frames);
alignment is a one-hot gather built with searchsorted instead of a
ragged repeat; everything jits as one program per bucket.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class VITSConfig(NamedTuple):
    vocab_size: int = 256
    d_model: int = 192          # inter_channels == hidden_channels
    n_heads: int = 2
    n_layers: int = 6
    ffn_ch: int = 768
    ffn_kernel: int = 3
    window: int = 4             # relative-attention window
    # flow
    n_flows: int = 4
    wn_layers: int = 4
    wn_kernel: int = 5
    wn_dilation: int = 1
    # stochastic duration predictor
    sdp_ch: int = 192
    sdp_kernel: int = 3
    sdp_flows: int = 4
    sdp_bins: int = 10
    sdp_tail: float = 5.0
    # HiFiGAN decoder
    up_init_ch: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernels: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    # static bounds
    max_phonemes: int = 256
    max_frames: int = 768
    sample_rate: int = 22050

    @property
    def hop(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h

    @classmethod
    def tiny(cls) -> "VITSConfig":
        return cls(vocab_size=64, d_model=32, n_heads=2, n_layers=2,
                   ffn_ch=64, up_init_ch=64, upsample_rates=(4, 4),
                   upsample_kernels=(8, 8), resblock_kernels=(3,),
                   resblock_dilations=((1, 3),), wn_layers=2,
                   sdp_ch=32, sdp_flows=2, max_phonemes=32,
                   max_frames=64, sample_rate=16000)


# ---------------------------------------------------------------------------
# Primitives (channel-first (C, T) layout like the torch graphs)
# ---------------------------------------------------------------------------

def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
            stride: int = 1, padding: int = 0,
            dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """torch.nn.Conv1d semantics on (C, T): w is (out, in/groups, K)."""
    y = jax.lax.conv_general_dilated(
        x[None], w, (stride,), [(padding, padding)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))[0]
    if b is not None:
        y = y + b[:, None]
    return y


def _conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray,
                      b: Optional[jnp.ndarray], stride: int,
                      padding: int) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d on (C, T): w is (in, out, K)."""
    k = w.shape[2]
    # Equivalent dilated conv formulation of transposed conv.
    y = jax.lax.conv_general_dilated(
        x[None], jnp.flip(w, 2).transpose(1, 0, 2),
        window_strides=(1,), padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"))[0]
    if b is not None:
        y = y + b[:, None]
    return y


def _layer_norm_ct(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                   eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the CHANNEL dim of (C, T) (VITS LayerNorm)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * g[:, None] + b[:, None]


# ---------------------------------------------------------------------------
# Windowed relative-position multi-head attention (VITS attentions)
# ---------------------------------------------------------------------------

def _rel_attention(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
                   n_heads: int, window: int,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Self-attention on (C, T) with learned relative key/value
    embeddings over a +/-window band (shared across heads, as VITS
    uses for the text encoder)."""
    c, t = x.shape
    hd = c // n_heads
    q = _conv1d(x, p["q_w"], p["q_b"])
    k = _conv1d(x, p["k_w"], p["k_b"])
    v = _conv1d(x, p["v_w"], p["v_b"])
    q = q.reshape(n_heads, hd, t).transpose(0, 2, 1)   # (H, T, D)
    k = k.reshape(n_heads, hd, t).transpose(0, 2, 1)
    v = v.reshape(n_heads, hd, t).transpose(0, 2, 1)

    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum("htd,hsd->hts", q, k) * scale

    # Relative keys: emb_k is (2*window+1, D); build (T, S) band scores.
    emb_k = p["emb_k"][0] if p["emb_k"].ndim == 3 else p["emb_k"]
    rel = jnp.einsum("htd,rd->htr", q, emb_k) * scale  # (H, T, 2w+1)
    # Scatter the band into absolute positions: s = t + (r - window).
    idx_t = jnp.arange(t)[:, None]
    idx_r = jnp.arange(2 * window + 1)[None, :]
    idx_s = idx_t + idx_r - window                      # (T, 2w+1)
    valid = (idx_s >= 0) & (idx_s < t)
    idx_sc = jnp.clip(idx_s, 0, t - 1)
    band = jnp.where(valid[None], rel, 0.0)
    scores = scores + jax.vmap(
        lambda bh: jnp.zeros((t, t)).at[idx_t, idx_sc].add(bh))(band)

    scores = jnp.where(mask[None], scores, -1e4)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hts,hsd->htd", probs, v)

    # Relative values: gather the band of probs, weight emb_v.
    emb_v = p["emb_v"][0] if p["emb_v"].ndim == 3 else p["emb_v"]
    band_p = jnp.where(valid[None], probs[:, idx_t, idx_sc], 0.0)
    out = out + jnp.einsum("htr,rd->htd", band_p, emb_v)

    out = out.transpose(0, 2, 1).reshape(c, t)
    return _conv1d(out, p["o_w"], p["o_b"])


def _encoder(x: jnp.ndarray, p: Dict[str, Any], cfg: VITSConfig,
             x_mask: jnp.ndarray) -> jnp.ndarray:
    """VITS text-encoder transformer on (C, T)."""
    t = x.shape[1]
    attn_mask = (x_mask[None, :] * x_mask[:, None]).astype(bool)
    x = x * x_mask[None]
    for i in range(cfg.n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], p["layers"])
        y = _rel_attention(x, lp["attn"], cfg.n_heads, cfg.window,
                           attn_mask)
        x = _layer_norm_ct(x + y, lp["ln1_g"], lp["ln1_b"])
        # FFN: conv(k) -> relu -> conv(k), with same padding.
        pad = cfg.ffn_kernel // 2
        y = _conv1d(x * x_mask[None], lp["ffn_w1"], lp["ffn_b1"],
                    padding=pad)
        y = jax.nn.relu(y)
        y = _conv1d(y * x_mask[None], lp["ffn_w2"], lp["ffn_b2"],
                    padding=pad)
        x = _layer_norm_ct(x + y, lp["ln2_g"], lp["ln2_b"])
    return x * x_mask[None]


# ---------------------------------------------------------------------------
# WaveNet block (flow couplings)
# ---------------------------------------------------------------------------

def _wn(x: jnp.ndarray, p: Dict[str, Any], cfg: VITSConfig,
        x_mask: jnp.ndarray) -> jnp.ndarray:
    """Gated dilated conv stack -> accumulated skip (VITS modules.WN,
    no global conditioning). Per-layer weights are LISTS (the last
    res_skip conv is half-width: skip only)."""
    h = x.shape[0]
    out = jnp.zeros_like(x)
    for i in range(cfg.wn_layers):
        dil = cfg.wn_dilation ** i
        pad = (cfg.wn_kernel * dil - dil) // 2
        y = _conv1d(x, p["in_w"][i], p["in_b"][i], padding=pad,
                    dilation=dil)
        a, b = y[:h], y[h:]
        acts = jnp.tanh(a) * jax.nn.sigmoid(b)
        y = _conv1d(acts, p["rs_w"][i], p["rs_b"][i])
        if i < cfg.wn_layers - 1:
            x = (x + y[:h]) * x_mask[None]
            out = out + y[h:]
        else:
            out = out + y            # last layer: skip-only (h wide)
    return out * x_mask[None]


def _flow_inverse(z: jnp.ndarray, p: Dict[str, Any], cfg: VITSConfig,
                  x_mask: jnp.ndarray) -> jnp.ndarray:
    """Invert the residual-coupling stack (mean-only couplings with a
    Flip between each, as VITS builds them)."""
    half = cfg.d_model // 2
    for i in reversed(range(cfg.n_flows)):
        # inverse of Flip (applied after each coupling in forward)
        z = jnp.flip(z, axis=0)
        lp = jax.tree_util.tree_map(lambda a: a[i], p["couplings"])
        z0, z1 = z[:half], z[half:]
        h = _conv1d(z0, lp["pre_w"], lp["pre_b"])
        h = _wn(h, lp["wn"], cfg, x_mask)
        m = _conv1d(h, lp["post_w"], lp["post_b"])
        z1 = (z1 - m) * x_mask[None]
        z = jnp.concatenate([z0, z1], axis=0)
    return z


# ---------------------------------------------------------------------------
# Stochastic duration predictor (reverse pass)
# ---------------------------------------------------------------------------

def _dds_conv(x: jnp.ndarray, p: Dict[str, Any], cfg: VITSConfig,
              x_mask: jnp.ndarray, n_layers: int = 3) -> jnp.ndarray:
    """Dilated depth-separable conv stack (VITS modules.DDSConv)."""
    k = cfg.sdp_kernel
    for i in range(n_layers):
        dil = k ** i
        pad = (k * dil - dil) // 2
        y = _conv1d(x * x_mask[None], p["sep_w"][i], p["sep_b"][i],
                    padding=pad, dilation=dil, groups=x.shape[0])
        y = _layer_norm_ct(y, p["ln1_g"][i], p["ln1_b"][i])
        y = jax.nn.gelu(y)
        y = _conv1d(y, p["pw_w"][i], p["pw_b"][i])
        y = _layer_norm_ct(y, p["ln2_g"][i], p["ln2_b"][i])
        y = jax.nn.gelu(y)
        x = x + y
    return x * x_mask[None]


def _rq_spline_inverse(y: jnp.ndarray, widths: jnp.ndarray,
                       heights: jnp.ndarray, derivs: jnp.ndarray,
                       tail: float) -> jnp.ndarray:
    """Inverse of the piecewise rational-quadratic spline with linear
    tails (Durkan et al.; VITS transforms.py semantics).

    y: (...,) values to invert; widths/heights: (..., K) unnormalized
    bin params; derivs: (..., K-1) unnormalized internal derivatives.
    """
    n_bins = widths.shape[-1]
    min_w = min_h = 1e-3
    min_d = 1e-3

    w = jax.nn.softmax(widths, axis=-1)
    w = min_w + (1 - min_w * n_bins) * w
    cum_w = jnp.cumsum(w, axis=-1)
    cum_w = jnp.concatenate([jnp.zeros_like(cum_w[..., :1]), cum_w], -1)
    cum_w = cum_w * 2 * tail - tail                      # [-tail, tail]

    h = jax.nn.softmax(heights, axis=-1)
    h = min_h + (1 - min_h * n_bins) * h
    cum_h = jnp.cumsum(h, axis=-1)
    cum_h = jnp.concatenate([jnp.zeros_like(cum_h[..., :1]), cum_h], -1)
    cum_h = cum_h * 2 * tail - tail

    d = min_d + jax.nn.softplus(derivs)
    ones = jnp.ones_like(d[..., :1])                     # tail slope 1
    d = jnp.concatenate([ones, d, ones], -1)             # (..., K+1)

    inside = (y >= -tail) & (y <= tail)
    y_in = jnp.clip(y, -tail, tail)

    # locate bin by HEIGHT (inverting y -> x)
    idx = jnp.sum((y_in[..., None] >= cum_h[..., 1:-1]).astype(jnp.int32),
                  axis=-1)
    take = lambda a: jnp.take_along_axis(a, idx[..., None], -1)[..., 0]
    x_k = take(cum_w[..., :-1])
    w_k = take(w) * 2 * tail
    y_k = take(cum_h[..., :-1])
    h_k = take(h) * 2 * tail
    d_k = take(d[..., :-1])
    d_k1 = take(d[..., 1:])
    s_k = h_k / w_k

    # Solve the quadratic for theta (fraction within the bin).
    dy = y_in - y_k
    a = h_k * (s_k - d_k) + dy * (d_k + d_k1 - 2 * s_k)
    b = h_k * d_k - dy * (d_k + d_k1 - 2 * s_k)
    c = -s_k * dy
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    theta = (2 * c) / (-b - jnp.sqrt(disc) + 1e-12)
    x = x_k + theta * w_k
    return jnp.where(inside, x, y)


def _conv_flow_inverse(z: jnp.ndarray, p: Dict[str, Any],
                       cfg: VITSConfig, cond: jnp.ndarray,
                       x_mask: jnp.ndarray) -> jnp.ndarray:
    """Inverse of VITS modules.ConvFlow (spline coupling on 2 chans)."""
    z0, z1 = z[:1], z[1:]
    h = _conv1d(z0, p["pre_w"], p["pre_b"])
    h = _dds_conv(h + cond, p["dds"], cfg, x_mask)
    out = _conv1d(h, p["proj_w"], p["proj_b"]) * x_mask[None]
    k = cfg.sdp_bins
    c = z0.shape[0]                                      # = 1
    params = out.reshape(c, 3 * k - 1, -1).transpose(0, 2, 1)  # (1,T,3K-1)
    widths = params[..., :k] / math.sqrt(cfg.sdp_ch)
    heights = params[..., k:2 * k] / math.sqrt(cfg.sdp_ch)
    derivs = params[..., 2 * k:]
    z1_new = _rq_spline_inverse(z1[0], widths[0], heights[0],
                                derivs[0], cfg.sdp_tail)[None]
    return jnp.concatenate([z0, z1_new * x_mask[None]], axis=0)


def _sdp_reverse(x: jnp.ndarray, p: Dict[str, Any], cfg: VITSConfig,
                 x_mask: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """StochasticDurationPredictor reverse pass -> log-durations (T,).

    VITS order: reversed(flows) with the pre-terminal flow dropped,
    noise shaped (2, T)."""
    h = _conv1d(x, p["pre_w"], p["pre_b"])
    h = _dds_conv(h, p["dds"], cfg, x_mask)
    h = _conv1d(h, p["proj_w"], p["proj_b"]) * x_mask[None]

    z = noise * x_mask[None]                              # (2, T)
    # VITS reverse order: forward flows are [EA, CF1, Flip, CF2, Flip,
    # CF3, Flip, CF4, Flip]; reversed with the FIRST ConvFlow dropped
    # ("remove a useless vflow", vits models.py) gives
    # [Flip, CF4, Flip, CF3, Flip, CF2, Flip, EA^-1].
    for i in reversed(range(1, cfg.sdp_flows)):
        z = jnp.flip(z, axis=0)
        fp = jax.tree_util.tree_map(lambda a: a[i], p["flows"])
        z = _conv_flow_inverse(z, fp, cfg, h, x_mask)
    z = jnp.flip(z, axis=0)
    # ElementwiseAffine inverse: (z - m) * exp(-logs)
    z = (z - p["ea_m"][:, None]) * jnp.exp(-p["ea_logs"][:, None])
    logw = z[:1]
    return logw[0]


def _dp_deterministic(x: jnp.ndarray, p: Dict[str, Any],
                      cfg: VITSConfig, x_mask: jnp.ndarray
                      ) -> jnp.ndarray:
    """VITS deterministic DurationPredictor -> log-durations (T,)."""
    k = p["conv1_w"].shape[2]
    pad = k // 2
    h = _conv1d(x * x_mask[None], p["conv1_w"], p["conv1_b"], padding=pad)
    h = _layer_norm_ct(jax.nn.relu(h), p["ln1_g"], p["ln1_b"])
    h = _conv1d(h * x_mask[None], p["conv2_w"], p["conv2_b"], padding=pad)
    h = _layer_norm_ct(jax.nn.relu(h), p["ln2_g"], p["ln2_b"])
    out = _conv1d(h * x_mask[None], p["proj_w"], p["proj_b"])
    return out[0]


# ---------------------------------------------------------------------------
# HiFiGAN generator
# ---------------------------------------------------------------------------

_LRELU = 0.1


def _resblock(x: jnp.ndarray, p: Dict[str, Any], kernel: int,
              dilations: Tuple[int, ...]) -> jnp.ndarray:
    for j, dil in enumerate(dilations):
        pad = (kernel * dil - dil) // 2
        y = jax.nn.leaky_relu(x, _LRELU)
        y = _conv1d(y, p["c1_w"][j], p["c1_b"][j], padding=pad,
                    dilation=dil)
        y = jax.nn.leaky_relu(y, _LRELU)
        y = _conv1d(y, p["c2_w"][j], p["c2_b"][j], padding=kernel // 2)
        x = x + y
    return x


def _hifigan(z: jnp.ndarray, p: Dict[str, Any],
             cfg: VITSConfig) -> jnp.ndarray:
    """(C, T) latent -> (samples,) waveform."""
    x = _conv1d(z, p["pre_w"], p["pre_b"], padding=3)
    for i, (rate, kern) in enumerate(zip(cfg.upsample_rates,
                                         cfg.upsample_kernels)):
        x = jax.nn.leaky_relu(x, _LRELU)
        x = _conv_transpose1d(x, p["up_w"][i], p["up_b"][i],
                              stride=rate, padding=(kern - rate) // 2)
        acc = None
        for j, (k, dils) in enumerate(zip(cfg.resblock_kernels,
                                          cfg.resblock_dilations)):
            y = _resblock(x, p["res"][i][j], k, dils)
            acc = y if acc is None else acc + y
        x = acc / len(cfg.resblock_kernels)
    x = jax.nn.leaky_relu(x, _LRELU)
    x = _conv1d(x, p["post_w"], p["post_b"], padding=3)
    return jnp.tanh(x)[0]


# ---------------------------------------------------------------------------
# Full inference
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "use_sdp"))
def vits_infer(params: Dict[str, Any], cfg: VITSConfig,
               phonemes: jnp.ndarray,      # (max_phonemes,) int32 padded
               n_phonemes: jnp.ndarray,    # scalar int32
               key: jax.Array,
               noise_scale: float = 0.667,
               length_scale: float = 1.0,
               noise_scale_w: float = 0.8,
               use_sdp: bool = True,
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Synthesize. Returns (waveform (max_frames*hop,), n_frames) —
    samples past n_frames*hop are silence-masked."""
    t = cfg.max_phonemes
    x_mask = (jnp.arange(t) < n_phonemes).astype(jnp.float32)

    # Text encoder
    emb = params["emb"][phonemes] * math.sqrt(cfg.d_model)   # (T, C)
    x = _encoder(emb.T, params["enc"], cfg, x_mask)
    stats = _conv1d(x, params["proj_w"], params["proj_b"]) * x_mask[None]
    m_p, logs_p = stats[:cfg.d_model], stats[cfg.d_model:]

    # Durations
    k_w, k_z = jax.random.split(key)
    if use_sdp:
        noise = jax.random.normal(k_w, (2, t)) * noise_scale_w
        logw = _sdp_reverse(jax.lax.stop_gradient(x), params["sdp"],
                            cfg, x_mask, noise)
    else:
        logw = _dp_deterministic(x, params["dp"], cfg, x_mask)
    w = jnp.exp(logw) * x_mask * length_scale
    w_ceil = jnp.ceil(w)
    cum = jnp.cumsum(w_ceil)
    n_frames = jnp.minimum(cum[-1], cfg.max_frames).astype(jnp.int32)

    # Frame -> phoneme alignment: frame f belongs to the first phoneme
    # whose cumulative duration exceeds f.
    frames = jnp.arange(cfg.max_frames, dtype=jnp.float32)
    ph_idx = jnp.searchsorted(cum, frames, side="right")
    ph_idx = jnp.clip(ph_idx, 0, t - 1)
    y_mask = (jnp.arange(cfg.max_frames) < n_frames).astype(jnp.float32)

    m_e = m_p[:, ph_idx] * y_mask[None]
    logs_e = logs_p[:, ph_idx]

    z_p = m_e + jax.random.normal(k_z, m_e.shape) * jnp.exp(
        logs_e) * noise_scale * y_mask[None]
    z = _flow_inverse(z_p, params["flow"], cfg, y_mask)
    wav = _hifigan(z * y_mask[None], params["dec"], cfg)
    sample_mask = jnp.repeat(y_mask, cfg.hop)
    return wav * sample_mask, n_frames


# ---------------------------------------------------------------------------
# Random init (tests / structural validation)
# ---------------------------------------------------------------------------

class VITSVoice:
    """Piper-style voice surface over :func:`vits_infer`.

    Text goes through a phoneme id map (a Piper voice's .json carries
    ``phoneme_id_map``: {phoneme: [id]}, with '^'/'$' BOS/EOS and '_'
    pad interspersed — Piper's espeak front end produces the phoneme
    string; a grapheme fallback maps chars directly when no espeak
    phonemization is available)."""

    def __init__(self, params: Dict[str, Any], cfg: VITSConfig,
                 phoneme_id_map: Optional[Dict[str, list]] = None,
                 intersperse_blank: bool = True):
        self.params = params
        self.cfg = cfg
        self.id_map = phoneme_id_map
        self.intersperse = intersperse_blank
        self._key = jax.random.PRNGKey(0)

    @classmethod
    def from_piper(cls, checkpoint_path: str, config_path: str,
                   max_frames: int = 768,
                   name_map: Optional[str] = "piper_vits") -> "VITSVoice":
        """Load a real Piper voice: weights (.onnx/.pt/.npz) + its
        .json config (phoneme_id_map, sample_rate, inference params).

        ``name_map``: bundled map name or JSON path normalizing the
        real file's initializer names onto the converter layout
        (models/name_maps/piper_vits.json by default; None skips)."""
        import json

        from trackiellm_tpu.models.convert import (apply_name_map,
                                                   load_name_map,
                                                   vits_from_torch)

        conf = json.loads(open(config_path).read())
        sr = int(conf.get("audio", {}).get("sample_rate", 22050))
        if checkpoint_path.endswith(".onnx"):
            from trackiellm_tpu.models.onnx_reader import (
                read_onnx_initializers)

            state = read_onnx_initializers(checkpoint_path)
        else:
            import numpy as _np

            with _np.load(checkpoint_path) as z:
                state = {k: z[k] for k in z.files}
        if name_map:
            state = apply_name_map(state, load_name_map(name_map))
        params, cfg = vits_from_torch(state, max_frames=max_frames,
                                      sample_rate=sr)
        return cls(params, cfg,
                   phoneme_id_map=conf.get("phoneme_id_map"))

    def _to_ids(self, text: str) -> list:
        if self.id_map:
            ids = []
            if "^" in self.id_map:
                ids.extend(self.id_map["^"])
            for ch in text:
                got = self.id_map.get(ch)
                if got:
                    ids.extend(got)
                    if self.intersperse and "_" in self.id_map:
                        ids.extend(self.id_map["_"])
            if "$" in self.id_map:
                ids.extend(self.id_map["$"])
            return ids
        # Grapheme fallback (synthetic voices / tests).
        return [1 + (ord(c) % (self.cfg.vocab_size - 1))
                for c in text.lower()]

    def synthesize(self, text: str, noise_scale: float = 0.667,
                   length_scale: float = 1.0,
                   noise_scale_w: float = 0.8) -> np.ndarray:
        ids = self._to_ids(text)[: self.cfg.max_phonemes]
        padded = np.zeros(self.cfg.max_phonemes, np.int32)
        padded[: len(ids)] = ids
        self._key, sub = jax.random.split(self._key)
        wav, n_frames = vits_infer(
            self.params, self.cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), sub, noise_scale=noise_scale,
            length_scale=length_scale, noise_scale_w=noise_scale_w,
            use_sdp="sdp" in self.params)
        n = int(n_frames) * self.cfg.hop
        return np.asarray(wav[:n])


def _ci(key, cout, cin, k):
    s = 1.0 / math.sqrt(cin * k)
    return jax.random.uniform(key, (cout, cin, k), jnp.float32, -s, s)


def init_vits(key: jax.Array, cfg: VITSConfig = VITSConfig()
              ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)  # noqa: E731
    c = cfg.d_model
    h = c // 2

    def attn_p():
        return {"q_w": _ci(nk(), c, c, 1), "q_b": jnp.zeros((c,)),
                "k_w": _ci(nk(), c, c, 1), "k_b": jnp.zeros((c,)),
                "v_w": _ci(nk(), c, c, 1), "v_b": jnp.zeros((c,)),
                "o_w": _ci(nk(), c, c, 1), "o_b": jnp.zeros((c,)),
                "emb_k": jax.random.normal(
                    nk(), (2 * cfg.window + 1, c // cfg.n_heads)) * 0.1,
                "emb_v": jax.random.normal(
                    nk(), (2 * cfg.window + 1, c // cfg.n_heads)) * 0.1}

    def enc_layer():
        return {"attn": attn_p(),
                "ln1_g": jnp.ones((c,)), "ln1_b": jnp.zeros((c,)),
                "ffn_w1": _ci(nk(), cfg.ffn_ch, c, cfg.ffn_kernel),
                "ffn_b1": jnp.zeros((cfg.ffn_ch,)),
                "ffn_w2": _ci(nk(), c, cfg.ffn_ch, cfg.ffn_kernel),
                "ffn_b2": jnp.zeros((c,)),
                "ln2_g": jnp.ones((c,)), "ln2_b": jnp.zeros((c,))}

    layers = [enc_layer() for _ in range(cfg.n_layers)]
    enc = {"layers": jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *layers)}

    def wn_p(hidden):
        return {
            "in_w": [_ci(nk(), 2 * hidden, hidden, cfg.wn_kernel)
                     for _ in range(cfg.wn_layers)],
            "in_b": [jnp.zeros((2 * hidden,))
                     for _ in range(cfg.wn_layers)],
            "rs_w": [_ci(nk(), 2 * hidden if i < cfg.wn_layers - 1
                         else hidden, hidden, 1)
                     for i in range(cfg.wn_layers)],
            "rs_b": [jnp.zeros((2 * hidden if i < cfg.wn_layers - 1
                                else hidden,))
                     for i in range(cfg.wn_layers)],
        }

    def coupling():
        return {"pre_w": _ci(nk(), c, h, 1), "pre_b": jnp.zeros((c,)),
                "wn": wn_p(c),
                "post_w": jnp.zeros((h, c, 1)),
                "post_b": jnp.zeros((h,))}

    couplings = [coupling() for _ in range(cfg.n_flows)]
    flow = {"couplings": jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *couplings)}

    def dds_p(ch, n_layers=3):
        return {
            "sep_w": jnp.stack([_ci(nk(), ch, 1, cfg.sdp_kernel)
                                for _ in range(n_layers)]),
            "sep_b": jnp.zeros((n_layers, ch)),
            "pw_w": jnp.stack([_ci(nk(), ch, ch, 1)
                               for _ in range(n_layers)]),
            "pw_b": jnp.zeros((n_layers, ch)),
            "ln1_g": jnp.ones((n_layers, ch)),
            "ln1_b": jnp.zeros((n_layers, ch)),
            "ln2_g": jnp.ones((n_layers, ch)),
            "ln2_b": jnp.zeros((n_layers, ch)),
        }

    def conv_flow():
        return {"pre_w": _ci(nk(), cfg.sdp_ch, 1, 1),
                "pre_b": jnp.zeros((cfg.sdp_ch,)),
                "dds": dds_p(cfg.sdp_ch),
                "proj_w": jnp.zeros((3 * cfg.sdp_bins - 1, cfg.sdp_ch, 1)),
                "proj_b": jnp.zeros((3 * cfg.sdp_bins - 1,))}

    flows = [conv_flow() for _ in range(cfg.sdp_flows)]
    sdp = {"pre_w": _ci(nk(), cfg.sdp_ch, c, 1),
           "pre_b": jnp.zeros((cfg.sdp_ch,)),
           "dds": dds_p(cfg.sdp_ch),
           "proj_w": _ci(nk(), cfg.sdp_ch, cfg.sdp_ch, 1),
           "proj_b": jnp.zeros((cfg.sdp_ch,)),
           "flows": jax.tree_util.tree_map(
               lambda *xs: jnp.stack(xs), *flows),
           "ea_m": jnp.zeros((2,)), "ea_logs": jnp.zeros((2,))}

    dp = {"conv1_w": _ci(nk(), 256, c, 3), "conv1_b": jnp.zeros((256,)),
          "ln1_g": jnp.ones((256,)), "ln1_b": jnp.zeros((256,)),
          "conv2_w": _ci(nk(), 256, 256, 3), "conv2_b": jnp.zeros((256,)),
          "ln2_g": jnp.ones((256,)), "ln2_b": jnp.zeros((256,)),
          "proj_w": _ci(nk(), 1, 256, 1), "proj_b": jnp.zeros((1,))}

    # HiFiGAN
    ch = cfg.up_init_ch
    ups_w, ups_b, res = [], [], []
    in_ch = ch
    for i, (rate, kern) in enumerate(zip(cfg.upsample_rates,
                                         cfg.upsample_kernels)):
        out_ch = ch // (2 ** (i + 1))
        ups_w.append(jax.random.normal(nk(), (in_ch, out_ch, kern))
                     * 0.02)
        ups_b.append(jnp.zeros((out_ch,)))
        level = []
        for k, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            level.append({
                "c1_w": jnp.stack([_ci(nk(), out_ch, out_ch, k)
                                   for _ in dils]),
                "c1_b": jnp.zeros((len(dils), out_ch)),
                "c2_w": jnp.stack([_ci(nk(), out_ch, out_ch, k)
                                   for _ in dils]),
                "c2_b": jnp.zeros((len(dils), out_ch)),
            })
        res.append(level)
        in_ch = out_ch

    dec = {"pre_w": _ci(nk(), ch, c, 7), "pre_b": jnp.zeros((ch,)),
           "up_w": ups_w, "up_b": ups_b, "res": res,
           "post_w": _ci(nk(), 1, in_ch, 7), "post_b": jnp.zeros((1,))}

    return {
        "emb": jax.random.normal(nk(), (cfg.vocab_size, c)) * 0.1,
        "enc": enc,
        "proj_w": _ci(nk(), 2 * c, c, 1), "proj_b": jnp.zeros((2 * c,)),
        "sdp": sdp, "dp": dp, "flow": flow, "dec": dec,
    }
