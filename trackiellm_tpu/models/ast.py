"""AST (Audio Spectrogram Transformer) — the ambient-sound
classifier's published-checkpoint route.

The reference ships an ONNX sound classifier detecting ALARM / SIREN /
WATER_RUNNING / DOG_BARK (src/audio/tk_sound_classifier.h:31-39); its
artifact family (YAMNet-class TF exports) is not a tensor checkpoint.
This module gives the stage a real published route the same way TrOCR
did for OCR: ``MIT/ast-finetuned-audioset-10-10-0.4593`` (and any HF
``ASTForAudioClassification``) loads through ``convert.ast_from_hf``
and runs here, with the AudioSet label space mapped onto the
reference's four ambient classes.

TPU-first: one jitted forward — strided patch conv
(``lax.conv_general_dilated``; AST's 16x16 patches overlap at stride
10x10), CLS+DIST prefix tokens, a scanned ViT stack (the shared
encoder block shapes from models/trocr.py), and the (CLS+DIST)/2
pooled MLP head.

Oracle: transformers ``ASTForAudioClassification`` — logits pinned
exact in tests/test_ast.py. Frontend caveat: the published AudioSet
checkpoints were trained on Kaldi fbank features (25 ms / 10 ms,
128 mels, mean -4.27 / std 4.57 normalization); ``ast_features``
reproduces that shape from raw 16 kHz audio with this framework's mel
frontend — close but not Kaldi-bit-exact, so accuracy parity on real
audio should feed precomputed fbank features (the parity harness
accepts them directly)."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.models.trocr import _act, _attn_out, _ln, _mha


class ASTConfig(NamedTuple):
    n_mels: int = 128
    n_frames: int = 1024          # max_length (10.24 s at 10 ms hop)
    patch: int = 16
    fstride: int = 10
    tstride: int = 10
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    hidden: int = 3072
    eps: float = 1e-12
    n_labels: int = 527           # AudioSet

    @property
    def f_dim(self) -> int:
        return (self.n_mels - self.patch) // self.fstride + 1

    @property
    def t_dim(self) -> int:
        return (self.n_frames - self.patch) // self.tstride + 1

    @property
    def n_patches(self) -> int:
        return self.f_dim * self.t_dim

    @classmethod
    def tiny(cls) -> "ASTConfig":
        return cls(n_mels=16, n_frames=64, patch=8, fstride=8,
                   tstride=8, dim=32, n_layers=2, n_heads=4, hidden=64,
                   n_labels=5)


def ast_logits(params: Dict[str, Any], cfg: ASTConfig,
               spec: jnp.ndarray) -> jnp.ndarray:
    """(n_frames, n_mels) normalized features -> (n_labels,) logits.

    Follows ASTModel exactly: input (T, F) -> (1, 1, F, T) -> strided
    patch conv -> tokens flattened (f-major, t-minor), CLS+DIST
    prefixes, pre-LN ViT stack, final LN, (CLS+DIST)/2 -> LN+dense
    head."""
    p = params
    x = spec.astype(jnp.float32).T[None, None]          # (1, 1, F, T)
    feat = jax.lax.conv_general_dilated(
        x, p["patch_w"], window_strides=(cfg.fstride, cfg.tstride),
        padding="VALID")                                 # (1, D, f, t)
    d = cfg.dim
    tokens = feat[0].reshape(d, -1).T + p["patch_b"]     # (f*t, D)
    h = jnp.concatenate([p["prefix"], tokens], axis=0) + p["pos"]

    def layer(h, lp):
        y = _ln(h, lp["ln1_g"], lp["ln1_b"], cfg.eps)
        s, vh = _mha(y @ lp["wq"] + lp["bq"], y @ lp["wk"] + lp["bk"],
                     y @ lp["wv"] + lp["bv"], cfg.n_heads)
        h = h + (_attn_out(s, vh) @ lp["wo"] + lp["bo"])
        y = _ln(h, lp["ln2_g"], lp["ln2_b"], cfg.eps)
        y = _act(y @ lp["w1"] + lp["b1"], "gelu") @ lp["w2"] + lp["b2"]
        return h + y, None

    h, _ = jax.lax.scan(layer, h, p["layers"])
    h = _ln(h, p["ln_g"], p["ln_b"], cfg.eps)
    pooled = (h[0] + h[1]) / 2.0
    pooled = _ln(pooled, p["head_ln_g"], p["head_ln_b"], cfg.eps)
    return pooled @ p["head_w"] + p["head_b"]


# AudioSet label-name fragments -> the reference's ambient classes
# (tk_sound_classifier.h:31-39). Matching is substring-based over the
# checkpoint's id2label names so finetuned label spaces keep working.
AMBIENT_MAP: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    ("alarm", ("alarm", "smoke detector", "fire alarm", "buzzer")),
    ("siren", ("siren", "ambulance", "police car", "fire engine",
               "civil defense")),
    ("water_running", ("water tap", "sink", "water", "bathtub",
                      "fill (with liquid)")),
    ("dog_bark", ("dog", "bark", "bow-wow", "growling", "yip")),
)


class ASTSoundClassifier:
    """The audio pipeline's ``sound_fn`` surface: 16 kHz window ->
    ambient class name or None (reference semantics: passive listening
    announces ALARM/SIREN/WATER_RUNNING/DOG_BARK).

    ``labels``: the checkpoint's ordered label names (id2label); each
    ambient class scores as the max logit over its matching labels,
    reported when its sigmoid tops ``threshold`` (AudioSet heads are
    multi-label sigmoid)."""

    def __init__(self, params: Dict[str, Any], cfg: ASTConfig,
                 labels: Sequence[str], threshold: float = 0.5,
                 features_fn=None):
        self.cfg = cfg
        self.threshold = threshold
        self.features_fn = features_fn or (
            lambda audio: ast_features(audio, cfg))
        self._fwd = jax.jit(lambda s: ast_logits(params, cfg, s))
        lowered = [str(name).lower() for name in labels]
        self._class_ids: Dict[str, list] = {}
        for ours, fragments in AMBIENT_MAP:
            ids = [i for i, name in enumerate(lowered)
                   if any(f in name for f in fragments)]
            if ids:
                self._class_ids[ours] = ids

    def __call__(self, audio: np.ndarray) -> Optional[str]:
        spec = self.features_fn(np.asarray(audio, np.float32))
        logits = np.asarray(self._fwd(jnp.asarray(spec)))
        probs = 1.0 / (1.0 + np.exp(-logits))
        best, best_p = None, self.threshold
        for ours, ids in self._class_ids.items():
            p = float(probs[ids].max())
            if p > best_p:
                best, best_p = ours, p
        return best


def ast_features(audio: np.ndarray, cfg: ASTConfig,
                 sample_rate: int = 16000,
                 mean: float = -4.2677393,
                 std: float = 4.5689974) -> np.ndarray:
    """Raw 16 kHz audio -> (n_frames, n_mels) normalized log-mel
    features in the AST input shape (25 ms window / 10 ms hop, the
    AudioSet normalization stats). Close to — but not bit-exact with —
    the Kaldi fbank frontend the published checkpoints trained on
    (documented caveat; parity runs should feed real fbank features).
    """
    from trackiellm_tpu.ops.mel import mel_filterbank

    n_fft = 400  # 25 ms @ 16 kHz
    hop = 160    # 10 ms
    a = np.asarray(audio, np.float32)
    need = (cfg.n_frames - 1) * hop + n_fft
    if a.size < need:
        a = np.pad(a, (0, need - a.size))
    frames = np.lib.stride_tricks.sliding_window_view(
        a, n_fft)[::hop][: cfg.n_frames]
    window = np.hanning(n_fft).astype(np.float32)
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2
    fb = np.asarray(mel_filterbank(n_mels=cfg.n_mels, n_fft=n_fft,
                                   sample_rate=sample_rate),
                    np.float32)  # (n_freqs, n_mels)
    mel = spec @ fb
    logmel = np.log(np.maximum(mel, 1e-10))
    return ((logmel - mean) / (2.0 * std)).astype(np.float32)


def init_params(key: jax.Array, cfg: ASTConfig,
                dtype=jnp.float32) -> Dict[str, Any]:
    """Random init (tests / structural validation)."""
    ks = jax.random.split(key, 8)

    def R(k, *shape, s=0.05):
        return jax.random.normal(k, shape, dtype) * s

    d, hd = cfg.dim, cfg.hidden
    layers = {
        "ln1_g": jnp.ones((cfg.n_layers, d)),
        "ln1_b": jnp.zeros((cfg.n_layers, d)),
        "ln2_g": jnp.ones((cfg.n_layers, d)),
        "ln2_b": jnp.zeros((cfg.n_layers, d)),
    }
    keys = jax.random.split(ks[0], 6 * cfg.n_layers)
    kidx = 0
    for nm, shp in (("wq", (d, d)), ("wk", (d, d)), ("wv", (d, d)),
                    ("wo", (d, d)), ("w1", (d, hd)), ("w2", (hd, d))):
        layers[nm] = jnp.stack([
            R(keys[kidx + i], *shp) for i in range(cfg.n_layers)])
        kidx += cfg.n_layers
    for nm, width in (("bq", d), ("bk", d), ("bv", d), ("bo", d),
                      ("b1", hd), ("b2", d)):
        layers[nm] = jnp.zeros((cfg.n_layers, width))
    return {
        "patch_w": R(ks[1], d, 1, cfg.patch, cfg.patch),
        "patch_b": jnp.zeros((d,)),
        "prefix": R(ks[2], 2, d),
        "pos": R(ks[3], cfg.n_patches + 2, d),
        "ln_g": jnp.ones((d,)), "ln_b": jnp.zeros((d,)),
        "head_ln_g": jnp.ones((d,)), "head_ln_b": jnp.zeros((d,)),
        "head_w": R(ks[4], d, cfg.n_labels),
        "head_b": jnp.zeros((cfg.n_labels,)),
        "layers": layers,
    }
