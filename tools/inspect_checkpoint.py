#!/usr/bin/env python
"""List tensor names/shapes/dtypes in any supported checkpoint — the
first step of mapping a real published file onto models/convert.py's
layout tables (.pt/.safetensors/.npz/.onnx/.gguf).

Usage: python tools/inspect_checkpoint.py <path> [--grep substr]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_common import load_state_dict, require_file  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--grep", default=None)
    args = ap.parse_args()
    path = require_file(args.path, "checkpoint")

    if path.lower().endswith(".gguf"):
        from trackiellm_tpu.models.loader import read_gguf_header

        gguf = read_gguf_header(path)
        print(f"# GGUF: {len(gguf.tensors)} tensors, "
              f"{len(gguf.metadata)} metadata keys")
        for k, v in sorted(gguf.metadata.items()):
            s = str(v)
            print(f"meta {k} = {s[:80]}{'...' if len(s) > 80 else ''}")
        rows = [(t.name, tuple(t.shape), t.dtype)
                for t in gguf.tensors.values()]
    else:
        state = load_state_dict(path)
        rows = [(k, tuple(v.shape), str(v.dtype))
                for k, v in state.items()]

    for name, shape, dtype in sorted(rows):
        if args.grep and args.grep not in name:
            continue
        print(f"{name:60s} {str(shape):24s} {dtype}")
    print(f"# {len(rows)} tensors")


if __name__ == "__main__":
    main()
