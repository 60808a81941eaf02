"""Phonemizer PER regression gate vs the pinned gold lexicon
(VERDICT r4 #8): audio/phonemizer.py stands in for espeak-ng under
Piper voices (SURVEY §2.4); its segmental phoneme error rate against
tests/fixtures/phoneme_gold.json must stay at or below the round-5
measured levels (pt 2.54%, en 5.01% — from 11.6%/22.4% before the
diphthong/reduction/r-coloring rule classes landed; full numbers in
BASELINE.md row 13, worst offenders via tools/measure_phonemizer.py
--worst N). The residual pt errors are lexical vowel openness
(ɔ/ɛ without accent marks — needs a stress dictionary, like espeak's),
the residual en errors are genuine orthographic irregularity beyond
the exceptions list."""

import json
import os

from tools.parity_common import edit_distance

from trackiellm_tpu.audio.phonemizer import PHONEMES, phonemize

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "phoneme_gold.json")

THRESHOLDS = {"pt": 0.035, "en": 0.065}  # measured + slack


def _per(lang, lex):
    errs = total = 0
    for word, gold_s in lex.items():
        gold = gold_s.split()
        pred = [p for p in phonemize(word, lang=lang) if p != " "]
        errs += edit_distance(pred, gold)
        total += len(gold)
    return errs / total


class TestGoldLexiconPER:
    def test_gold_symbols_are_in_inventory(self):
        gold = json.load(open(GOLD))
        inv = set(PHONEMES)
        for lang in ("pt", "en"):
            for word, s in gold[lang].items():
                missing = [p for p in s.split() if p not in inv]
                assert not missing, (word, missing)

    def test_pt_per_under_threshold(self):
        gold = json.load(open(GOLD))
        per = _per("pt", gold["pt"])
        assert per <= THRESHOLDS["pt"], per

    def test_en_per_under_threshold(self):
        gold = json.load(open(GOLD))
        per = _per("en", gold["en"])
        assert per <= THRESHOLDS["en"], per

    def test_known_hard_words_exact(self):
        """A handful of words that exercised the round-5 rule fixes,
        pinned exactly so the classes cannot silently regress."""
        cases = {
            ("pt", "cadeira"): "k a d e j ɾ ɐ",     # falling diphthong
            ("pt", "muito"): "m ũ j t u",            # lexical nasal
            ("pt", "também"): "t ɐ̃ b ẽ j",          # final -ém -> ẽj
            ("pt", "escada"): "i s k a d ɐ",         # initial es+C
            ("pt", "antes"): "ɐ̃ tʃ i s",            # final -tes
            ("pt", "talvez"): "t a w v e s",         # final z devoices
            ("en", "water"): "w ɔ t ə r",            # exception + -er
            ("en", "table"): "t eɪ b ə l",           # syllabic -le
            ("en", "walk"): "w ɔ k",                 # alk
            ("en", "morning"): "m ɔ r n ɪ ŋ",        # r-colored + ng
            ("en", "follow"): "f ɑ l oʊ",            # final -ow + ll
        }
        for (lang, word), want in cases.items():
            got = [p for p in phonemize(word, lang=lang) if p != " "]
            assert got == want.split(), (word, got)
