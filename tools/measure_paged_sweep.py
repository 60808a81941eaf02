#!/usr/bin/env python
"""Page-size sweep for the paged-KV serve loop (VERDICT round-2 item
4): dense chunk8 vs paged chunk8 at page_size 64/128/256, B=8.

Context (PERF_NOTES round-2): paged chunk8 trailed dense chunk8
(177.5 vs 206.7 aggregate tok/s); the gather-once rewrite refuted the
per-step re-gather theory, leaving the gather/scatter pair + page-table
indexing itself. Larger pages mean fewer table entries and longer
contiguous runs per gather — this sweep decides whether the gap is a
page-size artifact or inherent, and `paged='auto'` (llm/server.py)
already picks dense whenever the dense KV layout fits memory.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trackiellm_tpu.llm.server import LLMServer  # noqa: E402
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402
from tools.measure_server import run  # noqa: E402


def main() -> None:
    seed = int(time.time()) & 0x7FFFFFFF
    cfg = llm_model.LLMConfig.mistral_7b()._replace(max_seq=512,
                                                    sliding_window=512)
    params = llm_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=4)
    tok = ByteTokenizer(cfg.vocab_size)

    configs = [("dense_chunk8", {}),
               ("paged64_chunk8", dict(paged=True, page_size=64)),
               ("paged128_chunk8", dict(paged=True, page_size=128)),
               ("paged256_chunk8", dict(paged=True, page_size=256))]
    for label, kw in configs:
        server = LLMServer(params, cfg, batch_slots=8, tokenizer=tok,
                           chunk_steps=8, **kw)
        try:
            res = run(server, seed)
        finally:
            server.close()
        print(json.dumps({"config": f"llm_server_b8_{label}", **res}),
              flush=True)


if __name__ == "__main__":
    main()
