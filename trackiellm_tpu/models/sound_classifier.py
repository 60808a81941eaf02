"""Ambient sound classifier over log-mel windows.

Parity target: the reference's ONNX sound classifier with
ALARM / SIREN / WATER_RUNNING / DOG_BARK classes (reference:
src/audio/tk_sound_classifier.h:31-39, tk_sound_classifier.c:14).

Architecture: 3 conv blocks over a (n_mels, T) log-mel window, global
average pool, dense head. One jit call per ~1 s window.
"""

from __future__ import annotations

import enum
import functools
import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SoundClass(enum.IntEnum):
    """Parity: tk_sound_classifier.h:31-39 (+ SILENCE/SPEECH/OTHER)."""

    SILENCE = 0
    SPEECH = 1
    ALARM = 2
    SIREN = 3
    WATER_RUNNING = 4
    DOG_BARK = 5
    OTHER = 6


class SoundClassifierConfig(NamedTuple):
    n_mels: int = 64
    n_frames: int = 96   # ~1 s @ 16 kHz / hop 160
    ch: int = 32
    num_classes: int = len(SoundClass)

    @classmethod
    def default(cls) -> "SoundClassifierConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "SoundClassifierConfig":
        return cls(n_mels=32, n_frames=32, ch=8)


def _conv_init(key, kh, kw, cin, cout):
    s = 1.0 / math.sqrt(kh * kw * cin)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                                    -s, s),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_sound_classifier(key: jax.Array,
                          cfg: SoundClassifierConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 5)
    c = cfg.ch
    s = 1.0 / math.sqrt(2 * c)
    return {
        "conv1": _conv_init(ks[0], 3, 3, 1, c // 2),
        "conv2": _conv_init(ks[1], 3, 3, c // 2, c),
        "conv3": _conv_init(ks[2], 3, 3, c, 2 * c),
        "out_w": jax.random.uniform(ks[3], (2 * c, cfg.num_classes),
                                    jnp.float32, -s, s),
        "out_b": jnp.zeros((cfg.num_classes,), jnp.float32),
    }


def _block(x, p):
    out = lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["b"]
    out = jax.nn.relu(out)
    return lax.reduce_window(out, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "SAME")


@functools.partial(jax.jit, static_argnames=("cfg",))
def classify_window(params: Dict[str, Any], cfg: SoundClassifierConfig,
                    log_mel: jnp.ndarray) -> jnp.ndarray:
    """(n_mels, n_frames) log-mel -> (num_classes,) probabilities."""
    x = log_mel[None, :, :, None]
    x = _block(x, params["conv1"])
    x = _block(x, params["conv2"])
    x = _block(x, params["conv3"])
    pooled = jnp.mean(x, axis=(1, 2))[0]
    return jax.nn.softmax(pooled @ params["out_w"] + params["out_b"])
