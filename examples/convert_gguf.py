#!/usr/bin/env python
"""Convert a llama.cpp GGUF checkpoint (the reference's Mistral-7B
format) into this framework's native parameter layout and run a short
generation.

Usage: python examples/convert_gguf.py model.gguf [--bits 4] [--prompt P]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
from trackiellm_tpu.models.convert import gguf_to_llm_params
from trackiellm_tpu.models.loader import describe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gguf")
    ap.add_argument("--bits", type=int, default=4, choices=(4, 8, 0),
                    help="requantization (0 = keep bf16)")
    ap.add_argument("--prompt", default="Olá! Quem é você?")
    ap.add_argument("--max-tokens", type=int, default=64)
    args = ap.parse_args()

    print("inspecting:", describe(args.gguf))
    t0 = time.time()
    params, cfg = gguf_to_llm_params(
        args.gguf, bits=args.bits or None)
    print(f"converted in {time.time() - t0:.1f}s; config: {cfg}")

    runner = LLMRunner(params, cfg,
                       gen_config=GenerationConfig(
                           max_tokens=args.max_tokens))
    t0 = time.time()
    out = runner.generate(args.prompt, on_token=lambda s: print(s, end="",
                                                                flush=True))
    dt = time.time() - t0
    n = len(runner._generated_ids)
    print(f"\n--- {n} tokens in {dt:.1f}s = {n / dt:.1f} tok/s")


if __name__ == "__main__":
    main()
