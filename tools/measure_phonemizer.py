#!/usr/bin/env python
"""Phonemizer PER against the pinned gold lexicon (VERDICT r4 #8).

TTS intelligibility rests on audio/phonemizer.py (the espeak-ng
stand-in under Piper voices, SURVEY §2.4); this scores its segmental
phoneme error rate per language against
tests/fixtures/phoneme_gold.json and prints the worst offenders so
rule fixes target the classes that matter.

PER = sum(edit_distance(pred, gold)) / sum(len(gold)), phoneme-level.

Usage: python tools/measure_phonemizer.py [--worst N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_common import edit_distance  # noqa: E402

from trackiellm_tpu.audio.phonemizer import phonemize  # noqa: E402

GOLD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "phoneme_gold.json")


def score(lang: str, lex, worst_n: int = 0):
    errs = total = 0
    rows = []
    for word, gold_s in lex.items():
        gold = gold_s.split()
        pred = [p for p in phonemize(word, lang=lang) if p != " "]
        d = edit_distance(pred, gold)
        errs += d
        total += len(gold)
        if d:
            rows.append((d / len(gold), word, " ".join(pred), gold_s))
    per = errs / total if total else 0.0
    if worst_n:
        for frac, word, pred, gold_s in sorted(rows)[::-1][:worst_n]:
            print(f"  {word:14s} pred[{pred}] gold[{gold_s}]",
                  file=sys.stderr)
    return {"lang": lang, "words": len(lex), "per": round(per, 4),
            "words_with_errors": len(rows)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worst", type=int, default=0)
    args = ap.parse_args()
    gold = json.load(open(GOLD))
    out = {"config": "phonemizer_per_vs_gold_lexicon"}
    for lang in ("pt", "en"):
        out[lang] = score(lang, gold[lang], args.worst)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
