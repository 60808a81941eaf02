#!/usr/bin/env python
"""Train + package the bundled default wake-word artifact (VERDICT r4
item 6): the conv KWS fitted on the synthetic keyword-prototype set
(the tests/test_wake_word.py generators, larger and with augmentation),
with held-out FA/FR measured and printed as one JSON line.

The reference ships working Porcupine weights out of the box
(src/audio/tk_wake_word_porcupine.c:15); Porcupine's blob is
proprietary and non-ingestible, so the rebuild ships THIS trained open
artifact as its out-of-box default (examples/run_assistant.py loads it
via ``load_default_wake_word``). The keyword is a synthesized two-tone
phrase prototype; deployments retrain on recorded audio of their real
phrase with exactly this script as the template.

Usage: python tools/train_wake_word_default.py [--out path] [--steps N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.audio.wake_word import (WakeWordConfig,
                                            init_wake_word,
                                            save_wake_word,
                                            train_wake_word,
                                            wake_word_score)
from trackiellm_tpu.ops.mel import log_mel_spectrogram

SR = 16_000
WINDOW = 76 * 160 + 240


def tone_pair(rng, f1, f2, amp=0.1):
    t = np.arange(WINDOW // 2) / SR
    a = amp * np.sin(2 * np.pi * f1 * t + rng.uniform(0, 6.28))
    b = amp * np.sin(2 * np.pi * f2 * t + rng.uniform(0, 6.28))
    x = np.concatenate([a, b])[:WINDOW]
    return (x + 0.02 * rng.standard_normal(WINDOW)).astype(np.float32)


def keyword(rng):
    # Jittered formant-like pair: frequency + amplitude augmentation so
    # the spotter generalizes beyond one exact synthesis.
    return tone_pair(rng, 600.0 * rng.uniform(0.95, 1.05),
                     1100.0 * rng.uniform(0.95, 1.05),
                     amp=0.1 * rng.uniform(0.7, 1.3))


def imposter(rng, kind):
    if kind == 0:
        return tone_pair(rng, 1100.0, 600.0)       # reversed order
    if kind == 1:
        return tone_pair(rng, 850.0, 850.0)        # single mid tone
    if kind == 2:
        return (0.1 * rng.standard_normal(WINDOW)).astype(np.float32)
    if kind == 3:
        return (0.001 * rng.standard_normal(WINDOW)).astype(np.float32)
    if kind == 4:                                   # off-key pair
        return tone_pair(rng, 400.0, 1600.0)
    # keyword-adjacent: right first tone, wrong second
    return tone_pair(rng, 600.0, 750.0)


def mel(audio):
    m = log_mel_spectrogram(jnp.asarray(audio), n_mels=40)
    return m[:, -76:]


def main() -> None:
    ap = argparse.ArgumentParser()
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "trackiellm_tpu", "models", "pretrained",
        "wake_word_default.npz")
    ap.add_argument("--out", default=default_out)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n-train", type=int, default=96)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    xs, ys = [], []
    for i in range(args.n_train):
        xs.append(mel(keyword(rng)))
        ys.append(1)
        xs.append(mel(imposter(rng, i % 6)))
        ys.append(0)
    cfg = WakeWordConfig()
    params = init_wake_word(jax.random.PRNGKey(1), cfg)
    params = train_wake_word(params, cfg, jnp.stack(xs),
                             jnp.asarray(ys), steps=args.steps)

    held = np.random.default_rng(99)
    kw = [keyword(held) for _ in range(48)]
    imp = [imposter(held, i % 6) for i in range(48)]
    kw_s = [float(wake_word_score(params, cfg, mel(a))) for a in kw]
    imp_s = [float(wake_word_score(params, cfg, mel(a))) for a in imp]
    fr = sum(s < cfg.sensitivity for s in kw_s) / len(kw)
    fa = sum(s >= cfg.sensitivity for s in imp_s) / len(imp)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_wake_word(args.out, params, cfg)
    print(json.dumps({
        "config": "wake_word_default_artifact",
        "out": os.path.relpath(args.out),
        "train_clips": 2 * args.n_train, "steps": args.steps,
        "held_out_false_reject": round(fr, 4),
        "held_out_false_accept": round(fa, 4),
        "sensitivity": cfg.sensitivity,
        "bytes": os.path.getsize(args.out),
    }))


if __name__ == "__main__":
    main()
