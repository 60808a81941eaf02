"""Text recognition (OCR): CRNN + CTC, TPU-native.

Parity target: the reference's Tesseract wrapper (reference:
src/vision/tk_text_recognition.cpp — TessBaseAPI full-image and region
recognition with result caching). Tesseract is a CPU C++ engine with no
TPU analogue, so the rebuild replaces it with the standard neural OCR
stack: a CRNN — conv feature extractor collapsing height, bidirectional
GRU over width, CTC head — which is how modern on-device OCR works and
maps cleanly onto MXU convs + scanned recurrence.

Region recognition: the vision pipeline crops detector boxes, resizes
them to the fixed (32, 128) input (static shapes), and batches crops
through one jit call. Greedy CTC decode (collapse repeats, drop blanks)
runs on host over the tiny (T, C) logit matrix.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Charset: blank + digits + ASCII letters BOTH CASES + pt-BR accented
# letters + punctuation. The product language is pt-BR (the reference
# OCRs arbitrary signage, src/vision/tk_text_recognition.cpp:73-82), so
# the CTC head must be able to emit uppercase and accented characters.
CHARSET = ("0123456789"
           "abcdefghijklmnopqrstuvwxyz"
           "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
           "áàâãéêíóôõúüç"
           "ÁÀÂÃÉÊÍÓÔÕÚÜÇ"
           " .,:;!?-'\"()/$%&@#")
BLANK = 0  # CTC blank id; char ids are 1-based into CHARSET


class OCRConfig(NamedTuple):
    height: int = 32
    width: int = 128
    conv_ch: int = 64
    hidden: int = 128
    num_classes: int = len(CHARSET) + 1  # + blank

    @classmethod
    def default(cls) -> "OCRConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "OCRConfig":
        return cls(conv_ch=16, hidden=32)


def _conv_init(key, kh, kw, cin, cout):
    scale = 1.0 / math.sqrt(kh * kw * cin)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                                    -scale, scale),
            "b": jnp.zeros((cout,), jnp.float32)}


def _gru_init(key, cin, hidden):
    k1, k2, k3 = jax.random.split(key, 3)
    s = 1.0 / math.sqrt(cin + hidden)
    return {
        "wi": jax.random.uniform(k1, (cin, 3 * hidden), jnp.float32, -s, s),
        "wh": jax.random.uniform(k2, (hidden, 3 * hidden), jnp.float32, -s, s),
        "b": jnp.zeros((3 * hidden,), jnp.float32),
    }


def init_ocr(key: jax.Array, cfg: OCRConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    nxt = lambda: next(keys)  # noqa: E731
    c = cfg.conv_ch
    scale = 1.0 / math.sqrt(2 * cfg.hidden)
    return {
        "conv1": _conv_init(nxt(), 3, 3, 1, c // 2),
        "conv2": _conv_init(nxt(), 3, 3, c // 2, c),
        "conv3": _conv_init(nxt(), 3, 3, c, c),
        "gru_fwd": _gru_init(nxt(), c * cfg.height // 8, cfg.hidden),
        "gru_bwd": _gru_init(nxt(), c * cfg.height // 8, cfg.hidden),
        "out_w": jax.random.uniform(
            nxt(), (2 * cfg.hidden, cfg.num_classes), jnp.float32,
            -scale, scale),
        "out_b": jnp.zeros((cfg.num_classes,), jnp.float32),
    }


def _conv_pool(x, p):
    out = lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["b"]
    out = jax.nn.relu(out)
    return lax.reduce_window(out, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "SAME")


def _gru_scan(p, xs, reverse=False):
    hidden = p["wh"].shape[0]

    def step(h, x):
        gates = x @ p["wi"] + p["b"]
        hg = h @ p["wh"]
        r = jax.nn.sigmoid(gates[..., :hidden] + hg[..., :hidden])
        z = jax.nn.sigmoid(gates[..., hidden:2 * hidden]
                           + hg[..., hidden:2 * hidden])
        n = jnp.tanh(gates[..., 2 * hidden:] + r * hg[..., 2 * hidden:])
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros(xs.shape[1:-1] + (hidden,), xs.dtype)
    _, hs = lax.scan(step, h0, xs, reverse=reverse)
    return hs


@functools.partial(jax.jit, static_argnames=("cfg",))
def ocr_forward(params: Dict[str, Any], cfg: OCRConfig,
                crops: jnp.ndarray) -> jnp.ndarray:
    """(B, 32, 128) grayscale [0,1] crops -> (B, T, num_classes) logits,
    T = width/8 timesteps."""
    x = crops[..., None]  # NHWC
    x = _conv_pool(x, params["conv1"])   # /2
    x = _conv_pool(x, params["conv2"])   # /4
    x = _conv_pool(x, params["conv3"])   # /8
    b, h, w, c = x.shape
    seq = x.transpose(0, 2, 1, 3).reshape(b, w, h * c)  # width-major
    seq = seq.transpose(1, 0, 2)  # (T, B, F) for scan
    fwd = _gru_scan(params["gru_fwd"], seq)
    bwd = _gru_scan(params["gru_bwd"], seq, reverse=True)
    feat = jnp.concatenate([fwd, bwd], axis=-1)  # (T, B, 2H)
    logits = feat @ params["out_w"] + params["out_b"]
    return logits.transpose(1, 0, 2)  # (B, T, C)


def ctc_greedy_decode(logits) -> List[str]:
    """Host-side greedy CTC: argmax per step, collapse repeats, drop
    blanks. Input (B, T, C) array-like."""
    import numpy as np

    ids = np.asarray(jnp.argmax(logits, axis=-1))
    out = []
    for row in ids:
        chars = []
        prev = -1
        for t in row:
            if t != prev and t != BLANK:
                chars.append(CHARSET[t - 1])
            prev = t
        out.append("".join(chars))
    return out
