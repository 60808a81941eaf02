#!/usr/bin/env python
"""Restart-to-ready (VERDICT round-2 item 5): process start -> first
generated token for the 7B Q4 interactive runner, with the persistent
compile cache warm.

The reference mmaps a GGUF and serves in seconds
(src/ai_models/tk_model_loader.c:199). Here the costs are:
  (a) python + jax import,
  (b) weight materialization — measured with ON-DEVICE seeded init:
      through the axon relay, host->device is ~10-14 MB/s (a 3.9 GB
      upload would be ~5 min of pure relay bandwidth, an artifact of
      this environment, not the design; on real PCIe/production TPU VM
      the checkpoint DMA is seconds). On-device init isolates the
      design-relevant costs,
  (c) XLA compile of prefill + decode-chunk programs (the persistent
      cache /root/.cache/jax_comp should turn ~5 min of compiles into
      deserialization),
  (d) the first prefill + first decode chunk.

Prints one JSON line with the stage breakdown. Run twice: the first
populates the cache, the second is the honest restart number.
"""

import json
import os
import sys
import time

T_PROC = time.perf_counter()


def _process_age_s() -> float:
    """Seconds since the OS spawned this process (captures python +
    sitecustomize/jax import time that ran before T_PROC)."""
    try:
        with open("/proc/self/stat") as f:
            starttime_ticks = float(f.read().split(")")[-1].split()[19])
        with open("/proc/uptime") as f:
            uptime = float(f.read().split()[0])
        hz = os.sysconf("SC_CLK_TCK")
        return uptime - starttime_ticks / hz
    except Exception:
        return 0.0


AGE_AT_T_PROC = _process_age_s()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T_JAX = time.perf_counter()

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner  # noqa: E402
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=1024,
                                                    sliding_window=1024)
    params = llm_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=4)
    # Force materialization (init is lazy until consumed).
    jax.block_until_ready(params["out_norm"])
    t_params = time.perf_counter()

    # min_tokens floor: random weights greedy-decode straight into EOS,
    # which would leave the first-token mark unfired. The scripted
    # decode_token makes every emitted id produce visible text (random
    # argmax ids above the byte range decode to "" and on_token never
    # fires for empty pieces).
    class _Audible(ByteTokenizer):
        def decode_token(self, tid):
            return super().decode_token(tid) or "x"

        @property
        def token_bytes(self):
            # Hide the byte-level fast path: the runner's incremental
            # UTF-8 assembler prefers token_bytes and would decode
            # random-weight ids to "" (the measure_app_e2e scripted-
            # tokenizer bug class) — on_token must see the scripted
            # pieces.
            raise AttributeError("scripted tokenizer")

    runner = LLMRunner(params, cfg, _Audible(cfg.vocab_size),
                       GenerationConfig(max_tokens=8, min_tokens=8,
                                        temperature=0.0))
    first_piece = {}

    def on_token(piece):
        if "t" not in first_piece:
            first_piece["t"] = time.perf_counter()

    t_runner = time.perf_counter()
    out = runner.generate(f"ola, descreva a cena ({seed})",
                          on_token=on_token)
    t_done = time.perf_counter()
    t_first = first_piece.get("t", t_done)
    print(f"[stage] runner_init_s={t_runner - t_params:.1f} "
          f"generate_to_first_s={t_first - t_runner:.1f}",
          file=sys.stderr)

    print(json.dumps({
        "config": "restart_to_ready_7b_q4",
        "import_s": round(AGE_AT_T_PROC + (T_JAX - T_PROC), 1),
        "weights_s": round(t_params - T_JAX, 1),
        "first_token_s": round(t_first - t_params, 1),
        "total_to_first_token_s": round(
            AGE_AT_T_PROC + (t_first - T_PROC), 1),
        "total_to_8_tokens_s": round(
            AGE_AT_T_PROC + (t_done - T_PROC), 1),
        "meets_60s": (AGE_AT_T_PROC + t_first - T_PROC) < 60.0,
        "n_out": len(out),
    }))


if __name__ == "__main__":
    main()
