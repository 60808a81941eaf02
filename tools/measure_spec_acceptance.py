#!/usr/bin/env python
"""Honest speculative-decoding acceptance (VERDICT round-2 item 9).

Random-weight acceptance numbers are meaningless; this trains a tiny
model to MEMORIZE a small corpus via parallel/train.py (a few hundred
steps), then measures prompt-lookup speculative decoding on corpus
prompts: acceptance rate, verify passes vs plain decode steps, and —
on a real chip — wall tok/s for both, with byte-identical output
asserted.

Runs anywhere (CPU prints pass counts; TPU adds tok/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner  # noqa: E402
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402
from trackiellm_tpu.parallel import train as T  # noqa: E402

CORPUS = (
    "o gato subiu na mesa da cozinha. "
    "o gato subiu na mesa da sala. "
    "a porta da cozinha esta aberta. "
    "a porta da sala esta aberta. "
    "siga em frente e vire na porta da cozinha. "
)
SEQ = 128
STEPS = 250
N_GEN = 96


def train_tiny(cfg, tok, seed=0):
    devs = np.array(jax.devices()[:1]).reshape(1, 1, 1)
    mesh = Mesh(devs, ("dp", "fsdp", "tp"))
    params, opt_state, opt = T.init_train_state(
        jax.random.PRNGKey(seed), cfg, mesh, lr=3e-3)
    step = T.make_train_step(cfg, mesh, opt)

    ids = tok.encode(CORPUS * 4)
    rows = [ids[i:i + SEQ] for i in range(0, len(ids) - SEQ, SEQ // 2)][:8]
    tokens = jnp.asarray(np.stack(rows), jnp.int32)
    with mesh:
        loss0 = None
        for i in range(STEPS):
            params, opt_state, loss = step(params, opt_state, tokens)
            if i == 0:
                loss0 = float(loss)
    return params, loss0, float(loss)


def run_granularity(granularity: str) -> dict:
    """Train a tiny model to memorize the corpus at the given tokenizer
    granularity, then measure prompt-lookup speculation on a corpus
    replay prompt: byte level (the round-3 harness — 0.22 acceptance,
    branching at shared byte prefixes) vs token level (word pieces —
    the VERDICT r3 item-8 re-proposal)."""
    cfg = llm_model.LLMConfig.tiny()
    if granularity == "byte":
        tok = ByteTokenizer(cfg.vocab_size)
    else:
        from trackiellm_tpu.llm.tokenizer import VocabTokenizer

        words = sorted({w for w in CORPUS.replace(".", " .").split()})
        pieces = [f"\u2581{w}" for w in words] + ["."]
        pad = [f"<x{i}>" for i in range(cfg.vocab_size - 4 - len(pieces))]
        tok = VocabTokenizer(pieces + pad)
    t0 = time.time()
    params, loss0, loss1 = train_tiny(cfg, tok)
    print(f"[{granularity}] trained {STEPS} steps in "
          f"{time.time()-t0:.0f}s: loss {loss0:.2f} -> {loss1:.3f}",
          file=sys.stderr)

    prompt = "o gato subiu na mesa da cozinha. o gato"
    results = {}
    for label, spec in (("plain", False), ("speculative", True),
                        ("auto", "auto")):
        runner = LLMRunner(
            params, cfg, tok,
            GenerationConfig(max_tokens=N_GEN, temperature=0.0,
                             speculative=spec,
                             lookahead=1 if spec else 4),
            cache_dtype=jnp.float32)
        runner.generate(prompt)          # warm compile
        runner.spec_stats = {"passes": 0, "proposed": 0, "accepted": 0}
        t0 = time.perf_counter()
        out = runner.generate(prompt)
        dt = time.perf_counter() - t0
        n = len(runner._generated_ids)
        results[label] = {
            "out": out, "n_tokens": n,
            "tok_s": round(n / dt, 1),
            "spec_stats": dict(runner.spec_stats),
        }

    assert results["plain"]["out"] == results["speculative"]["out"], \
        "speculative output diverged from plain greedy"
    assert results["plain"]["out"] == results["auto"]["out"], \
        "auto-speculative output diverged from plain greedy"
    st = results["speculative"]["spec_stats"]
    acc = st["accepted"] / max(st["proposed"], 1)
    n = results["speculative"]["n_tokens"]
    device_passes = n - st["accepted"]
    on_tpu = jax.devices()[0].platform != "cpu"
    return {
        "config": f"spec_acceptance_{granularity}_memorized_corpus",
        "train_loss": [round(loss0, 3), round(loss1, 4)],
        "n_tokens": n,
        "verify_passes": st["passes"],
        "proposed": st["proposed"],
        "accepted": st["accepted"],
        "acceptance_rate": round(acc, 3),
        "device_passes": device_passes,
        "pass_reduction": round(n / max(device_passes, 1), 2),
        "plain_tok_s": results["plain"]["tok_s"] if on_tpu else None,
        "speculative_tok_s": (results["speculative"]["tok_s"]
                              if on_tpu else None),
        "auto_tok_s": results["auto"]["tok_s"] if on_tpu else None,
        "auto_stats": results["auto"]["spec_stats"],
        "exact_match": True,
        "platform": jax.devices()[0].platform,
    }


def run_sampled(granularity: str = "token",
                temperature: float = 0.7) -> dict:
    """The production case (VERDICT r4 #2): temperature-0.7 sampling
    with rejection-sampling speculative verification
    (sampling.spec_verify_sampled). Outputs are draws from the SAME
    distribution, not byte-identical — the honest comparison is
    acceptance + wall tok/s on the same memorized-corpus replay, plus
    a same-seed determinism check."""
    cfg = llm_model.LLMConfig.tiny()
    from trackiellm_tpu.llm.tokenizer import VocabTokenizer

    words = sorted({w for w in CORPUS.replace(".", " .").split()})
    pieces = [f"▁{w}" for w in words] + ["."]
    pad = [f"<x{i}>" for i in range(cfg.vocab_size - 4 - len(pieces))]
    tok = VocabTokenizer(pieces + pad)
    params, loss0, loss1 = train_tiny(cfg, tok)
    prompt = "o gato subiu na mesa da cozinha. o gato"
    results = {}
    for label, spec in (("plain", False), ("speculative", True),
                        ("auto", "auto")):
        runner = LLMRunner(
            params, cfg, tok,
            GenerationConfig(max_tokens=N_GEN, temperature=temperature,
                             seed=11, speculative=spec,
                             spec_min_ngram=1,
                             lookahead=1 if spec else 4),
            cache_dtype=jnp.float32)
        runner.generate(prompt)          # warm compile
        runner.spec_stats = {"passes": 0, "proposed": 0, "accepted": 0}
        t0 = time.perf_counter()
        out = runner.generate(prompt)
        dt = time.perf_counter() - t0
        n = len(runner._generated_ids)
        results[label] = {"out": out, "n_tokens": n,
                          "tok_s": round(n / dt, 1),
                          "spec_stats": dict(runner.spec_stats)}
    st = results["speculative"]["spec_stats"]
    acc = st["accepted"] / max(st["proposed"], 1)
    on_tpu = jax.devices()[0].platform != "cpu"
    return {
        "config": f"spec_acceptance_sampled_t{temperature}_"
                  f"{granularity}",
        "train_loss": [round(loss0, 3), round(loss1, 4)],
        "n_tokens": results["speculative"]["n_tokens"],
        "verify_passes": st["passes"],
        "acceptance_rate": round(acc, 3),
        "plain_tok_s": results["plain"]["tok_s"] if on_tpu else None,
        "speculative_tok_s": (results["speculative"]["tok_s"]
                              if on_tpu else None),
        "auto_tok_s": results["auto"]["tok_s"] if on_tpu else None,
        "auto_stats": results["auto"]["spec_stats"],
        "platform": jax.devices()[0].platform,
    }


def main() -> None:
    for granularity in ("byte", "token"):
        print(json.dumps(run_granularity(granularity)))
    print(json.dumps(run_sampled()))


if __name__ == "__main__":
    main()
