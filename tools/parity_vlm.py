#!/usr/bin/env python
"""VLM (LLaVA) parity: encode an image + prompt through the converted
checkpoint and compare against a reference transcript (HF transformers
or llama.cpp llava-cli greedy run).

One-command contract (mirrors parity_llm): checkpoint + image +
transcript in, match metrics + PARITY-RESULTS.md row out; missing
files fail clearly.

Usage:
  python tools/parity_vlm.py --checkpoint ckpt_dir \
      --image frame.npy --transcript llava_run.json

``ckpt_dir`` is the output of
  python -m trackiellm_tpu convert llava.safetensors -o ckpt_dir \
      --family llava-hf --n-heads 32
(the LLM at ckpt_dir, the CLIP tower at ckpt_dir/vision).

Transcript JSON (produce with transformers generate at temperature 0,
or llama.cpp llava-cli --temp 0):
  {"prompt": "USER: <image>\\nWhat is this?\\nASSISTANT:",
   "pixel_values": "px.npy",        # optional: exact preprocessed input
   "tokens": [id, id, ...]}         # or "text": "..."

When "pixel_values" names a .npy of the reference's exact (3, S, S)
preprocessed tensor, the vision halves see identical input (isolates
model parity from resize-kernel differences — HF uses bicubic+crop,
this framework a direct bilinear square resize).

Reference parity target: llama.cpp's llava path (clip.cpp mmproj +
embd splice) behind the engine family the reference embeds
(src/ai_models/tk_model_loader.c:199).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.parity_common import die, emit, record, require_file  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="native VLM checkpoint dir (convert "
                    "--family llava-hf; vision tower at <dir>/vision)")
    ap.add_argument("--image", required=True,
                    help=".npy HWC uint8 frame (ignored when the "
                    "transcript pins pixel_values)")
    ap.add_argument("--transcript", required=True,
                    help="reference greedy-run JSON (prompt + tokens)")
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(args.checkpoint):
        die(f"checkpoint dir not found: {args.checkpoint!r}")
    vis_dir = os.path.join(args.checkpoint, "vision")
    if not os.path.isdir(vis_dir):
        die(f"no vision tower at {vis_dir!r} (convert with "
            f"--family llava-hf)")
    tr = json.loads(open(require_file(
        args.transcript, "reference transcript JSON")).read())
    if "prompt" not in tr or not ("tokens" in tr or "text" in tr):
        die("transcript JSON needs 'prompt' and 'tokens' (or 'text')")

    from trackiellm_tpu.llm.runner import GenerationConfig
    from trackiellm_tpu.llm.vlm import VLMRunner
    from trackiellm_tpu.models.checkpoint import load_checkpoint
    from trackiellm_tpu.models.convert import (tokenizer_from_pieces,
                                               tokenizer_from_spec)

    params, cfg, meta = load_checkpoint(args.checkpoint)
    clip_params, clip_cfg, _ = load_checkpoint(vis_dir)
    tokenizer = None
    if meta.get("tokenizer_spec"):
        tokenizer = tokenizer_from_spec(meta["tokenizer_spec"])
    elif meta.get("vocab_pieces"):
        tokenizer = tokenizer_from_pieces(meta["vocab_pieces"])
    if tokenizer is None:
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        print("WARNING: checkpoint carries no tokenizer sidecar; using "
              "the byte tokenizer (token-id comparison only valid when "
              "the transcript used the same ids)", file=sys.stderr)
        tokenizer = ByteTokenizer(cfg.vocab_size)

    if tr.get("pixel_values"):
        image = np.load(require_file(tr["pixel_values"],
                                     "reference pixel_values .npy"))
    else:
        image = np.load(require_file(args.image, "image .npy"))

    runner = VLMRunner(
        params, cfg, clip_params, clip_cfg, tokenizer=tokenizer,
        gen_config=GenerationConfig(max_tokens=args.max_tokens,
                                    temperature=0.0))
    text = runner.generate(tr["prompt"], images=[image])
    ours = list(runner._generated_ids)

    row: dict = {"model": os.path.basename(args.checkpoint.rstrip("/")),
                 "metric": "vlm-token-parity"}
    if "tokens" in tr:
        ref = [int(t) for t in tr["tokens"]][: len(ours)]
        prefix = 0
        for a, b in zip(ours, ref):
            if a != b:
                break
            prefix += 1
        matches = sum(a == b for a, b in zip(ours, ref))
        metric, value = "exact_prefix", prefix
        row.update(n_ref=len(ref), n_ours=len(ours),
                   exact_prefix=prefix,
                   match_rate=round(matches / max(len(ref), 1), 4))
        details = f"match_rate {row['match_rate']} over {len(ref)} tokens"
    else:
        ref_text = tr["text"]
        metric, value = "text_match", text.strip() == ref_text.strip()
        row.update(text_match=value,
                   ours_text=text[:200], ref_text=ref_text[:200])
        details = ""
    emit(row)
    if not args.no_record:
        record("parity_vlm", args.checkpoint, metric, value, details)


if __name__ == "__main__":
    main()
