#!/usr/bin/env python
"""LLM token parity: greedy-decode a GGUF model and compare the token
stream against a llama.cpp transcript of the same prompt.

One-command contract (VERDICT round-2 item 3): GGUF + transcript in,
match metrics + PARITY-RESULTS.md row out; missing files fail clearly.

Usage:
  python tools/parity_llm.py --gguf mistral-7b-q4_0.gguf \
      --transcript llama_run.json

Transcript JSON (produce it with llama.cpp at temperature 0):
  {"prompt": "<exact prompt text>",
   "tokens": [id, id, ...]}          # llama.cpp's sampled token ids
or
  {"prompt": "...", "text": "..."}   # text-level fallback comparison

Numerics note: TPU bf16 matmul passes vs llama.cpp's fp16/fp32 CPU/GPU
kernels WILL diverge once logit gaps get small; the honest metric is
the longest exact prefix + total match rate, not all-or-nothing
(SURVEY.md section 7 "hard parts" (e): tolerance-based parity).

Reference parity target: llama.cpp greedy decode through
tk_llm_runner_generate_next_token (src/ai_models/tk_runner_streaming.c:60-84).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_common import die, emit, record, require_file  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True,
                    help="GGUF model file OR a native checkpoint dir "
                    "(python -m trackiellm_tpu convert --family *-hf — "
                    "the route for HF-only families like Llama-4)")
    ap.add_argument("--transcript", required=True,
                    help="llama.cpp greedy-run JSON (prompt + tokens)")
    ap.add_argument("--quantize", type=int, default=4, choices=(0, 4, 8),
                    help="requantize to Q4/Q8 on load (0 = keep float; "
                    "default 4, matching the reference's Q4_0 serving)")
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    if not (os.path.isdir(args.gguf) or os.path.exists(args.gguf)):
        die(f"model not found: {args.gguf!r} (GGUF file or native "
            f"checkpoint dir)")
    gguf_path = args.gguf
    tr_path = require_file(args.transcript, "llama.cpp transcript JSON")
    tr = json.loads(open(tr_path).read())
    if "prompt" not in tr or not ("tokens" in tr or "text" in tr):
        die("transcript JSON needs 'prompt' and 'tokens' (or 'text')")

    from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
    from trackiellm_tpu.models.convert import (
        gguf_to_llm_params, tokenizer_from_gguf)
    from trackiellm_tpu.models.loader import read_gguf_header

    model = None
    if os.path.isdir(gguf_path):
        # Native checkpoint (CLI convert output): config + tokenizer
        # ride the sidecar; MLA checkpoints select models/mla.
        from trackiellm_tpu.models.checkpoint import load_checkpoint

        print("loading native checkpoint...", file=sys.stderr)
        params, cfg, meta = load_checkpoint(gguf_path)
        if cfg is None:
            die("checkpoint has no config sidecar")
        tokenizer = None
        if meta.get("tokenizer_spec"):
            from trackiellm_tpu.models.convert import tokenizer_from_spec

            tokenizer = tokenizer_from_spec(meta["tokenizer_spec"])
        elif meta.get("vocab_pieces"):
            from trackiellm_tpu.models.convert import tokenizer_from_pieces

            tokenizer = tokenizer_from_pieces(meta["vocab_pieces"])
        if type(cfg).__name__ == "MLAConfig":
            from trackiellm_tpu.models import mla as model  # noqa: F811
    else:
        print("loading GGUF...", file=sys.stderr)
        try:
            tokenizer = tokenizer_from_gguf(read_gguf_header(gguf_path))
        except Exception as e:
            die(f"GGUF tokenizer table unreadable: {e}")
        params, cfg = gguf_to_llm_params(gguf_path,
                                         bits=args.quantize or None)
    if tokenizer is None:
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        print("WARNING: GGUF carries no tokenizer.ggml.tokens table; "
              "using the byte tokenizer (only valid for synthetic "
              "models)", file=sys.stderr)  # noqa: E501
        tokenizer = ByteTokenizer(cfg.vocab_size)

    ref_tokens = tr.get("tokens")
    n_gen = len(ref_tokens) if ref_tokens else 256
    if type(cfg).__name__ in ("MambaConfig", "Mamba2Config",
                              "Qwen3NextConfig"):
        # Recurrent-state families score through their sequential
        # session (same _generated_ids surface).
        from trackiellm_tpu.models.mamba import MambaRunner

        runner = MambaRunner(params, cfg, tokenizer,
                             GenerationConfig(max_tokens=n_gen,
                                              temperature=0.0))
    else:
        runner = LLMRunner(params, cfg, tokenizer,
                           GenerationConfig(max_tokens=n_gen,
                                            temperature=0.0),
                           model=model)
    print(f"greedy-decoding {n_gen} tokens...", file=sys.stderr)
    out_text = runner.generate(tr["prompt"])
    got = runner._generated_ids

    if ref_tokens:
        prefix = 0
        for a, b in zip(got, ref_tokens):
            if a != b:
                break
            prefix += 1
        n = min(len(got), len(ref_tokens))
        matches = sum(1 for a, b in zip(got, ref_tokens) if a == b)
        payload = {
            "tool": "parity_llm", "gguf": gguf_path,
            "n_ref_tokens": len(ref_tokens), "n_generated": len(got),
            "exact_prefix": prefix,
            "match_rate": round(matches / n, 4) if n else 0.0,
            "first_divergence": None if prefix == n else {
                "index": prefix,
                "got": got[prefix] if prefix < len(got) else None,
                "ref": ref_tokens[prefix]},
        }
        metric, value = "token_match", payload["match_rate"]
    else:
        from tools.parity_common import wer

        w = wer(tr["text"], out_text)
        payload = {"tool": "parity_llm", "gguf": gguf_path,
                   "text_wer": round(w, 4), "generated": out_text[:200]}
        metric, value = "text_WER", payload["text_wer"]

    emit(payload)
    if not args.no_record:
        record("parity_llm", gguf_path, metric, value,
               f"{n_gen} tokens greedy")


if __name__ == "__main__":
    main()
