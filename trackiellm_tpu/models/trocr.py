"""TrOCR: transformer OCR (ViT/DeiT encoder + BART-style text decoder).

The published-checkpoint route for the OCR stage: microsoft/trocr-*
(printed/handwritten, small/base/large) load through
``convert.trocr_from_hf`` and run here — closing the one modality that
previously had no real-weights ingestion path (the reference ships
Tesseract, whose traineddata is not a tensor checkpoint;
/root/reference/src/vision/tk_text_recognition.cpp:71-104 is the
behavioral parity target, served by vision/pipeline.py's OCR stage).

TPU-first design: the encoder is one jitted pre-LN ViT forward
(scanned layer stack — one compiled layer body); the decoder greedy
loop is a single ``lax.scan`` over a fixed token budget with a
self-attention KV cache and per-layer precomputed cross-attention K/V
(no per-token host round trips); crops batch through ``vmap``.

Oracle: transformers ``VisionEncoderDecoderModel`` (ViT and DeiT
encoders) — encoder features, teacher-forced decoder logits and greedy
ids are pinned exact in tests/test_trocr.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class TrOCRConfig(NamedTuple):
    # encoder (ViT/DeiT)
    image_size: int = 384
    patch_size: int = 16
    enc_dim: int = 768
    enc_layers: int = 12
    enc_heads: int = 12
    enc_hidden: int = 3072
    n_prefix: int = 1            # 1 = ViT [CLS]; 2 = DeiT [CLS, DIST]
    enc_eps: float = 1e-12
    # decoder (TrOCR / BART-style, post-norm)
    vocab_size: int = 50265
    d_model: int = 1024
    dec_layers: int = 12
    dec_heads: int = 16
    dec_ffn: int = 4096
    max_len: int = 64            # generation budget (compile-time)
    scale_embedding: bool = False
    layernorm_embedding: bool = True
    dec_eps: float = 1e-5
    act: str = "gelu"
    # special ids (from the HF config)
    decoder_start_id: int = 2
    eos_id: int = 2
    pad_id: int = 1

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def enc_seq(self) -> int:
        return self.n_patches + self.n_prefix

    @classmethod
    def tiny(cls) -> "TrOCRConfig":
        return cls(image_size=32, patch_size=8, enc_dim=32, enc_layers=2,
                   enc_heads=4, enc_hidden=64, vocab_size=100, d_model=32,
                   dec_layers=2, dec_heads=4, dec_ffn=64, max_len=12)

    @classmethod
    def base(cls) -> "TrOCRConfig":
        """microsoft/trocr-base-printed / -handwritten shape."""
        return cls()

    @classmethod
    def small(cls) -> "TrOCRConfig":
        """microsoft/trocr-small-* shape (DeiT encoder)."""
        return cls(enc_dim=384, enc_layers=12, enc_heads=6,
                   enc_hidden=1536, n_prefix=2, vocab_size=64044,
                   d_model=256, dec_layers=6, dec_heads=8, dec_ffn=1024)


def _act(x, name: str):
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unsupported activation {name!r}")


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _mha(q, k, v, heads: int):
    """(Tq, D) x (Tk, D) -> (Tq, D); optional causal handled by caller
    via mask add on scores through the ``bias`` argument."""
    tq, d = q.shape
    tk = k.shape[0]
    dh = d // heads
    qh = q.reshape(tq, heads, dh).transpose(1, 0, 2)
    kh = k.reshape(tk, heads, dh).transpose(1, 0, 2)
    vh = v.reshape(tk, heads, dh).transpose(1, 0, 2)
    s = jnp.einsum("hqd,hkd->hqk", qh, kh) / math.sqrt(dh)
    return s, vh


def _attn_out(s, vh, bias=None):
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hqk,hkd->hqd", p, vh)
    h, tq, dh = o.shape
    return o.transpose(1, 0, 2).reshape(tq, h * dh)


# ---------------------------------------------------------------------------
# Encoder (pre-LN ViT / DeiT)
# ---------------------------------------------------------------------------

def encode(params: Dict[str, Any], cfg: TrOCRConfig,
           pixels: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) normalized pixels -> (enc_seq, enc_dim) encoder hidden
    states (after the final layernorm)."""
    p = params["enc"]
    c, hh, ww = pixels.shape
    ps = cfg.patch_size
    # (3, H, W) -> (n_patches, 3*ps*ps) rows matching the conv patchify
    x = pixels.reshape(c, hh // ps, ps, ww // ps, ps)
    x = x.transpose(1, 3, 0, 2, 4).reshape(cfg.n_patches, c * ps * ps)
    x = x @ p["patch_w"] + p["patch_b"]
    x = jnp.concatenate([p["prefix"], x], axis=0) + p["pos"]

    def layer(h, lp):
        y = _ln(h, lp["ln1_g"], lp["ln1_b"], cfg.enc_eps)
        s, vh = _mha(y @ lp["wq"] + lp["bq"], y @ lp["wk"] + lp["bk"],
                     y @ lp["wv"] + lp["bv"], cfg.enc_heads)
        h = h + (_attn_out(s, vh) @ lp["wo"] + lp["bo"])
        y = _ln(h, lp["ln2_g"], lp["ln2_b"], cfg.enc_eps)
        y = _act(y @ lp["w1"] + lp["b1"], "gelu") @ lp["w2"] + lp["b2"]
        return h + y, None

    x, _ = jax.lax.scan(layer, x, p["layers"])
    return _ln(x, p["ln_g"], p["ln_b"], cfg.enc_eps)


# ---------------------------------------------------------------------------
# Decoder (BART-style post-norm with cross-attention)
# ---------------------------------------------------------------------------

def _embed(p, cfg: TrOCRConfig, ids: jnp.ndarray,
           positions: jnp.ndarray) -> jnp.ndarray:
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = p["embed"][ids] * scale + p["pos"][positions + 2]  # BART offset
    if cfg.layernorm_embedding:
        x = _ln(x, p["ln_emb_g"], p["ln_emb_b"], cfg.dec_eps)
    return x


def decoder_logits(params: Dict[str, Any], cfg: TrOCRConfig,
                   enc_out: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced full-sequence decoder: (T,) ids -> (T, vocab)."""
    p = params["dec"]
    t = ids.shape[0]
    x = _embed(p, cfg, ids, jnp.arange(t))
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0,
        -jnp.inf)[None]

    def layer(h, lp):
        s, vh = _mha(h @ lp["wq"] + lp["bq"], h @ lp["wk"] + lp["bk"],
                     h @ lp["wv"] + lp["bv"], cfg.dec_heads)
        h = h + (_attn_out(s, vh, bias=causal) @ lp["wo"] + lp["bo"])
        h = _ln(h, lp["ln_sa_g"], lp["ln_sa_b"], cfg.dec_eps)
        s, vh = _mha(h @ lp["cq"] + lp["cbq"],
                     enc_out @ lp["ck"] + lp["cbk"],
                     enc_out @ lp["cv"] + lp["cbv"], cfg.dec_heads)
        h = h + (_attn_out(s, vh) @ lp["co"] + lp["cbo"])
        h = _ln(h, lp["ln_ca_g"], lp["ln_ca_b"], cfg.dec_eps)
        y = _act(h @ lp["w1"] + lp["b1"], cfg.act) @ lp["w2"] + lp["b2"]
        h = _ln(h + y, lp["ln_f_g"], lp["ln_f_b"], cfg.dec_eps)
        return h, None

    x, _ = jax.lax.scan(layer, x, p["layers"])
    return x @ p["out_w"].T


def greedy_ids(params: Dict[str, Any], cfg: TrOCRConfig,
               enc_out: jnp.ndarray) -> jnp.ndarray:
    """One-dispatch greedy decode: (max_len,) generated ids (the id
    AFTER an EOS is garbage by construction — the host cuts at EOS).

    Single ``lax.scan`` over the token budget with a per-layer
    self-attention KV cache; cross-attention K/V are computed once from
    ``enc_out`` outside the scan (they do not change per step)."""
    p = params["dec"]
    dh = cfg.d_model // cfg.dec_heads

    cross = jax.tree.map(lambda x: x, {
        "k": jnp.einsum("sd,ldh->lsh", enc_out, p["layers"]["ck"])
        + p["layers"]["cbk"][:, None, :],
        "v": jnp.einsum("sd,ldh->lsh", enc_out, p["layers"]["cv"])
        + p["layers"]["cbv"][:, None, :],
    })

    k0 = jnp.zeros((cfg.dec_layers, cfg.max_len, cfg.d_model))
    v0 = jnp.zeros((cfg.dec_layers, cfg.max_len, cfg.d_model))

    def step(carry, t):
        tok, kc, vc = carry
        x = _embed(p, cfg, tok[None], t[None])[0]  # (D,)

        def layer(h, inputs):
            li, lp, ck_l, cv_l = inputs
            q = h @ lp["wq"] + lp["bq"]
            k_new = h @ lp["wk"] + lp["bk"]
            v_new = h @ lp["wv"] + lp["bv"]
            kc_l = jax.lax.dynamic_update_index_in_dim(
                kc[li], k_new, t, 0)
            vc_l = jax.lax.dynamic_update_index_in_dim(
                vc[li], v_new, t, 0)
            mask = jnp.where(jnp.arange(cfg.max_len) <= t, 0.0,
                             -jnp.inf)[None, None, :]
            s, vh = _mha(q[None], kc_l, vc_l, cfg.dec_heads)
            h = h + (_attn_out(s, vh, bias=mask) @ lp["wo"]
                     + lp["bo"])[0]
            h = _ln(h, lp["ln_sa_g"], lp["ln_sa_b"], cfg.dec_eps)
            cq = h @ lp["cq"] + lp["cbq"]
            s, vh = _mha(cq[None], ck_l, cv_l, cfg.dec_heads)
            h = h + (_attn_out(s, vh) @ lp["co"] + lp["cbo"])[0]
            h = _ln(h, lp["ln_ca_g"], lp["ln_ca_b"], cfg.dec_eps)
            y = _act(h @ lp["w1"] + lp["b1"], cfg.act) @ lp["w2"] \
                + lp["b2"]
            h = _ln(h + y, lp["ln_f_g"], lp["ln_f_b"], cfg.dec_eps)
            return h, (kc_l, vc_l)

        h = x
        new_k, new_v = [], []
        # Unrolled python loop over layers: each layer's cache row
        # update must land in the carried (L, T, D) arrays; L is small
        # (2-12) and the body is shared, so the program stays compact.
        for li in range(cfg.dec_layers):
            lp = jax.tree.map(lambda a, i=li: a[i], p["layers"])
            h, (kc_l, vc_l) = layer(
                h, (li, lp, cross["k"][li], cross["v"][li]))
            new_k.append(kc_l)
            new_v.append(vc_l)
        kc = jnp.stack(new_k)
        vc = jnp.stack(new_v)
        logits = h @ p["out_w"].T
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (nxt, kc, vc), nxt

    del dh
    start = jnp.int32(cfg.decoder_start_id)
    (_, _, _), out = jax.lax.scan(
        step, (start, k0, v0), jnp.arange(cfg.max_len))
    return out



# ---------------------------------------------------------------------------
# Engine: the vision pipeline's ocr_fn surface
# ---------------------------------------------------------------------------

class TrOCREngine:
    """Batch OCR over image crops — plugs into
    ``vision.pipeline.VisionPipeline(ocr_fn=...)`` (crops -> texts).

    ``decode_ids``: ids -> text (a tokenizer decode; for real
    checkpoints pass the RobertaTokenizer/XLMRoberta decode; tests use
    a byte map)."""

    def __init__(self, params: Dict[str, Any], cfg: TrOCRConfig,
                 decode_ids, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
        self.params = params
        self.cfg = cfg
        self.decode_ids = decode_ids
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self._batched = jax.jit(jax.vmap(
            lambda px: greedy_ids(params, cfg,
                                  encode(params, cfg, px))))

    def _prep(self, crop: np.ndarray) -> np.ndarray:
        """Grayscale or RGB crop (H, W[, 3]) in [0,1] or [0,255] ->
        normalized (3, S, S)."""
        raw = np.asarray(crop)
        a = raw.astype(np.float32)
        # Scale keyed on dtype, not observed max: a near-black uint8
        # crop (max 0/1) must still divide by 255 (advisor r4).
        if np.issubdtype(raw.dtype, np.integer):
            a = a / 255.0
        elif a.max() > 1.5:
            a = a / 255.0
        if a.ndim == 3 and a.shape[-1] == 1:
            a = a[..., 0]  # (H, W, 1) channel-last grayscale
        if a.ndim == 2:
            a = np.stack([a] * 3)
        elif a.shape[-1] == 3:
            a = a.transpose(2, 0, 1)
        s = self.cfg.image_size
        ch, hh, ww = a.shape
        # Nearest-neighbor resize (host-side; crops are small).
        yi = np.clip((np.arange(s) * hh) // max(s, 1), 0, hh - 1)
        xi = np.clip((np.arange(s) * ww) // max(s, 1), 0, ww - 1)
        a = a[:, yi][:, :, xi]
        return (a - self.mean) / self.std

    def __call__(self, crops) -> list:
        batch = jnp.asarray(np.stack([self._prep(c) for c in crops]))
        ids = np.asarray(self._batched(batch))
        texts = []
        for row in ids:
            stop = np.nonzero(row == self.cfg.eos_id)[0]
            texts.append(self.decode_ids(
                row[: stop[0]] if stop.size else row))
        return texts


def init_params(key: jax.Array, cfg: TrOCRConfig,
                dtype=jnp.float32) -> Dict[str, Any]:
    """Random init (tests / structural validation)."""
    ks = jax.random.split(key, 8)

    def R(k, *shape, s=0.05):
        return jax.random.normal(k, shape, dtype) * s

    d, hd = cfg.enc_dim, cfg.enc_hidden
    enc_layers = {
        "ln1_g": jnp.ones((cfg.enc_layers, d)),
        "ln1_b": jnp.zeros((cfg.enc_layers, d)),
        "ln2_g": jnp.ones((cfg.enc_layers, d)),
        "ln2_b": jnp.zeros((cfg.enc_layers, d)),
    }
    kidx = 0
    keys = jax.random.split(ks[0], 16 * cfg.enc_layers)
    for nm, shp in (("wq", (d, d)), ("wk", (d, d)), ("wv", (d, d)),
                    ("wo", (d, d)), ("w1", (d, hd)), ("w2", (hd, d))):
        enc_layers[nm] = jnp.stack([
            R(keys[kidx + i], *shp) for i in range(cfg.enc_layers)])
        kidx += cfg.enc_layers
    for nm, width in (("bq", d), ("bk", d), ("bv", d), ("bo", d),
                      ("b1", hd), ("b2", d)):
        enc_layers[nm] = jnp.zeros((cfg.enc_layers, width))
    enc = {
        "patch_w": R(ks[1], 3 * cfg.patch_size ** 2, d),
        "patch_b": jnp.zeros((d,)),
        "prefix": R(ks[2], cfg.n_prefix, d),
        "pos": R(ks[3], cfg.enc_seq, d),
        "ln_g": jnp.ones((d,)), "ln_b": jnp.zeros((d,)),
        "layers": enc_layers,
    }

    dm, ff = cfg.d_model, cfg.dec_ffn
    dec_layers = {}
    keys = jax.random.split(ks[4], 16 * cfg.dec_layers)
    kidx = 0
    for nm, shp in (("wq", (dm, dm)), ("wk", (dm, dm)), ("wv", (dm, dm)),
                    ("wo", (dm, dm)), ("cq", (dm, dm)), ("ck", (dm, dm)),
                    ("cv", (dm, dm)), ("co", (dm, dm)),
                    ("w1", (dm, ff)), ("w2", (ff, dm))):
        dec_layers[nm] = jnp.stack([
            R(keys[kidx + i], *shp) for i in range(cfg.dec_layers)])
        kidx += cfg.dec_layers
    for nm, width in (("bq", dm), ("bk", dm), ("bv", dm), ("bo", dm),
                      ("cbq", dm), ("cbk", dm), ("cbv", dm), ("cbo", dm),
                      ("b1", ff), ("b2", dm)):
        dec_layers[nm] = jnp.zeros((cfg.dec_layers, width))
    for nm in ("ln_sa", "ln_ca", "ln_f"):
        dec_layers[f"{nm}_g"] = jnp.ones((cfg.dec_layers, dm))
        dec_layers[f"{nm}_b"] = jnp.zeros((cfg.dec_layers, dm))
    dec = {
        "embed": R(ks[5], cfg.vocab_size, dm),
        "pos": R(ks[6], cfg.max_len + 2 + 2, dm),
        "ln_emb_g": jnp.ones((dm,)), "ln_emb_b": jnp.zeros((dm,)),
        "out_w": R(ks[7], cfg.vocab_size, dm),
        "layers": dec_layers,
    }
    return {"enc": enc, "dec": dec}
