#!/usr/bin/env python
"""jax.profiler trace of single-stream 7B Q4 decode steps (VERDICT
round-2 item 8: attribute the ~0.8-1.0 ms/token layer-independent
intercept beyond embed + dispatch).

Captures an xprof trace around N decode steps, then parses the
trace-viewer JSON (plain Chrome trace format, gzipped) and prints the
top device ops by total self-time — no tensorboard needed.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from trackiellm_tpu.models import llm as llm_model  # noqa: E402

N_WARMUP = 8
N_TRACED = 24
TRACE_DIR = "/tmp/trackie_trace"


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=1024,
                                                    sliding_window=1024)
    params = llm_model.init_params_quantized(jax.random.PRNGKey(seed), cfg,
                                             bits=4)
    cache = llm_model.KVCache.create(cfg)
    rng = np.random.default_rng(seed)

    # Prefill a short prompt so decode runs at a realistic position.
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (128,)), jnp.int32)
    logits, cache = llm_model.prefill(params, cfg, ids, jnp.int32(128),
                                      cache)
    token = jnp.argmax(logits).astype(jnp.int32)

    step = llm_model.decode_step

    for _ in range(N_WARMUP):
        logits, cache = step(params, cfg, token, cache, attn_len=256)
        token = jnp.argmax(logits).astype(jnp.int32)
    _ = int(token)  # value-fetch sync

    os.makedirs(TRACE_DIR, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(N_TRACED):
            logits, cache = step(params, cfg, token, cache, attn_len=256)
            token = jnp.argmax(logits).astype(jnp.int32)
        _ = int(token)
    wall_ms = (time.perf_counter() - t0) * 1e3
    print(f"traced {N_TRACED} steps in {wall_ms:.1f} ms "
          f"({wall_ms / N_TRACED:.2f} ms/token)", file=sys.stderr)

    traces = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print(json.dumps({"error": "no trace file produced",
                          "dir": TRACE_DIR}))
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    # Chrome trace: events with ph="X" carry dur (us). Group device
    # ops by name; drop the host python/runtime threads by keeping
    # pids whose process name mentions the device.
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "xla" in
                   n.lower()}
    by_name = defaultdict(float)
    count = defaultdict(int)
    total_us = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        by_name[name] += ev["dur"]
        count[name] += 1
        total_us += ev["dur"]

    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    print(json.dumps({
        "ms_per_token_wall": round(wall_ms / N_TRACED, 3),
        "device_total_us_per_token": round(total_us / N_TRACED, 1),
        "processes": {str(k): v for k, v in pid_names.items()},
        "top_ops_us_per_token": [
            {"name": n[:120], "us": round(us / N_TRACED, 1),
             "calls": count[n]} for n, us in top],
    }, indent=1))


if __name__ == "__main__":
    main()
