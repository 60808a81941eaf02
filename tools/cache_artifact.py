#!/usr/bin/env python
"""Deployable compiled-program cache (VERDICT r4 item 10).

An assistive device that loses its XLA compile cache is mute for the
~3 minutes a cold restart takes (BASELINE.md row 6: 187.9 s empty-cache
restart vs 24.9 s warm; the one-time ``precompile`` that builds the
cache costs ~465 s). This tool makes the warmed cache a DEPLOYABLE
artifact: build it once per (jax version x model-config set) on any
machine with the same toolchain, ship the tarball with the image, and
``restore`` turns a factory-reset device's first boot into the warm
path.

    python tools/cache_artifact.py pack    -o trackie_cache.tar.gz
    python tools/cache_artifact.py restore trackie_cache.tar.gz
    python tools/cache_artifact.py info    trackie_cache.tar.gz

A manifest (jax/jaxlib versions, platform) is embedded and checked on
restore: the persistent-cache keys include the compiler version, so a
mismatched artifact restores cleanly but simply misses — the tool
warns loudly instead of letting that read as "restore failed".

Measured on this host (see BASELINE.md): wipe -> restore -> restart is
the warm-restart number; the 465 s precompile is paid once per
artifact BUILD, not per device.
"""

import argparse
import io
import json
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CACHE = "/root/.cache/jax_comp"


def _manifest() -> dict:
    import jax
    import jaxlib

    return {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "platform": jax.default_backend(),
        "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }


def pack(cache_dir: str, out: str) -> None:
    if not os.path.isdir(cache_dir):
        raise SystemExit(f"cache dir not found: {cache_dir} — run "
                         "`python -m trackiellm_tpu precompile` first")
    entries = sorted(os.listdir(cache_dir))
    man = _manifest()
    man["n_entries"] = len(entries)
    with tarfile.open(out, "w:gz") as tf:
        blob = json.dumps(man, indent=1).encode()
        info = tarfile.TarInfo("MANIFEST.json")
        info.size = len(blob)
        tf.addfile(info, io.BytesIO(blob))
        for name in entries:
            tf.add(os.path.join(cache_dir, name), arcname=name)
    print(json.dumps({"packed": out, "entries": len(entries),
                      "bytes": os.path.getsize(out), **man}))


def _read_manifest(path: str) -> dict:
    with tarfile.open(path, "r:gz") as tf:
        try:
            f = tf.extractfile("MANIFEST.json")
            return json.loads(f.read()) if f else {}
        except KeyError:
            return {}


def restore(artifact: str, cache_dir: str) -> None:
    man = _read_manifest(artifact)
    cur = _manifest()
    for key in ("jax", "jaxlib"):
        if man.get(key) and man[key] != cur[key]:
            print(f"WARNING: artifact built with {key}={man[key]} but "
                  f"this host runs {cur[key]} — cache keys include "
                  "the compiler version, so entries will MISS (harmless"
                  " but useless); rebuild the artifact on a matching "
                  "toolchain", file=sys.stderr)
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    with tarfile.open(artifact, "r:gz") as tf:
        for m in tf.getmembers():
            if m.name == "MANIFEST.json" or not m.isfile():
                continue
            # Flat cache layout; refuse path traversal.
            name = os.path.basename(m.name)
            f = tf.extractfile(m)
            with open(os.path.join(cache_dir, name), "wb") as out:
                out.write(f.read())
            n += 1
    print(json.dumps({"restored": n, "cache_dir": cache_dir,
                      "artifact_manifest": man}))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("pack")
    p.add_argument("-o", "--out", default="trackie_cache.tar.gz")
    p.add_argument("--cache-dir", default=DEFAULT_CACHE)
    p = sub.add_parser("restore")
    p.add_argument("artifact")
    p.add_argument("--cache-dir", default=DEFAULT_CACHE)
    p = sub.add_parser("info")
    p.add_argument("artifact")
    args = ap.parse_args()
    if args.cmd == "pack":
        pack(args.cache_dir, args.out)
    elif args.cmd == "restore":
        restore(args.artifact, args.cache_dir)
    else:
        print(json.dumps(_read_manifest(args.artifact), indent=1))


if __name__ == "__main__":
    main()
