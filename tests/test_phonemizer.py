"""Phonemizer tests: number expansion, pt-BR and English G2P rules,
inventory closure, and the phonemic TTS front end end-to-end."""

import numpy as np
import pytest
import jax

from trackiellm_tpu.audio.phonemizer import (
    PHONEMES,
    PhonemeFrontend,
    expand_numbers,
    number_to_words,
    phonemes_to_ids,
    phonemize,
)


class TestNumbers:
    @pytest.mark.parametrize("n,pt,en", [
        (0, "zero", "zero"),
        (7, "sete", "seven"),
        (15, "quinze", "fifteen"),
        (23, "vinte e três", "twenty three"),
        (100, "cem", "one hundred"),
        (101, "cento e um", "one hundred one"),
        (345, "trezentos e quarenta e cinco",
         "three hundred forty five"),
        (1000, "mil", "one thousand"),
        (2024, "dois mil e vinte e quatro",
         "two thousand twenty four"),
    ])
    def test_number_words(self, n, pt, en):
        assert number_to_words(n, "pt") == pt
        assert number_to_words(n, "en") == en

    def test_negative(self):
        assert number_to_words(-3, "pt") == "menos três"
        assert number_to_words(-3, "en") == "minus three"

    def test_expand_in_context(self):
        assert expand_numbers("tenho 23 anos", "pt") == \
            "tenho vinte e três anos"
        assert expand_numbers("chapter 7 of 12", "en") == \
            "chapter seven of twelve"


class TestPortugueseG2P:
    def test_digraphs(self):
        assert "ʃ" in phonemize("chave", "pt")       # ch
        assert "ʎ" in phonemize("alho", "pt")        # lh
        assert "ɲ" in phonemize("ninho", "pt")       # nh
        assert "x" in phonemize("carro", "pt")       # rr (strong r)

    def test_contextual_c_and_g(self):
        assert phonemize("casa", "pt")[0] == "k"
        assert phonemize("cedo", "pt")[0] == "s"
        assert phonemize("gato", "pt")[0] == "g"
        assert phonemize("gente", "pt")[0] == "ʒ"

    def test_nasalisation(self):
        assert "ɐ̃" in phonemize("campo", "pt")       # am + consonant
        assert "ẽ" in phonemize("bem", "pt")          # word-final em
        assert "m" not in phonemize("bem", "pt")      # coda m absorbed

    def test_final_vowel_reduction(self):
        assert phonemize("gato", "pt")[-1] == "u"     # final o -> u
        assert phonemize("parede", "pt")[-1] == "i"   # final e -> i

    def test_palatalised_ti_di(self):
        assert "dʒ" in phonemize("dia", "pt")
        assert "tʃ" in phonemize("noite", "pt")       # final -te -> tʃi

    def test_coda_l_vocalises(self):
        phs = phonemize("brasil", "pt")
        assert phs[-1] == "w"

    def test_intervocalic_s(self):
        assert "z" in phonemize("casa", "pt")
        assert "z" not in phonemize("sapo", "pt")

    def test_ao_diphthong(self):
        phs = phonemize("pão", "pt")
        assert phs[-2:] == ["ɐ̃", "w"]


class TestEnglishG2P:
    def test_digraphs(self):
        assert "θ" in phonemize("think", "en")
        assert "ʃ" in phonemize("ship", "en")
        assert "tʃ" in phonemize("chip", "en")
        assert "ŋ" in phonemize("sing", "en")
        assert "aɪ" in phonemize("night", "en")

    def test_magic_e(self):
        assert "eɪ" in phonemize("make", "en")        # long a
        assert "aɪ" in phonemize("time", "en")        # long i
        # and the final e itself is silent
        assert phonemize("make", "en")[-1] == "k"

    def test_contextual_c(self):
        assert phonemize("cat", "en")[0] == "k"
        assert phonemize("city", "en")[0] == "s"

    def test_word_boundaries_and_punct(self):
        phs = phonemize("hi there.", "en")
        assert " " in phs
        assert phs[-1] == "."


class TestInventoryAndIds:
    @pytest.mark.parametrize("lang,text", [
        ("pt", "Olá! A câmera detectou 3 objetos à sua frente, "
               "incluindo um cachorro e uma cadeira."),
        ("en", "Warning: 2 obstacles ahead. The quick brown fox jumps "
               "over the lazy dog?"),
    ])
    def test_all_symbols_in_inventory(self, lang, text):
        for p in phonemize(text, lang):
            assert p in PHONEMES, p

    def test_ids_roundtrip_and_truncation(self):
        phs = phonemize("olá mundo", "pt")
        ids, n = phonemes_to_ids(phs, 64)
        assert n == len(phs)
        assert ids.shape == (64,)
        assert list(ids[:n]) == [PHONEMES.index(p) for p in phs]
        assert all(ids[n:] == 0)
        ids2, n2 = phonemes_to_ids(phs, 3)
        assert n2 == 3

    def test_unsupported_language(self):
        with pytest.raises(ValueError):
            phonemize("hallo", "de")


class TestPhonemicTTS:
    def test_engine_synthesizes_through_phonemes(self):
        import jax.numpy as jnp
        from trackiellm_tpu.audio.tts_engine import TTSEngine
        from trackiellm_tpu.models import tts as tts_model

        cfg = tts_model.TTSConfig.tiny()._replace(
            vocab_size=PhonemeFrontend.vocab_size)
        params = tts_model.init_tts(jax.random.PRNGKey(0), cfg)
        eng = TTSEngine(params, cfg, lang="pt")
        wav = eng.synthesize("olá mundo")
        assert wav.dtype == np.float32
        assert wav.size > 0
        assert np.all(np.isfinite(wav))
        assert eng.model_info()["lang"] == "pt"

    def test_vocab_size_mismatch_rejected(self):
        import jax.numpy as jnp  # noqa: F401
        from trackiellm_tpu.audio.tts_engine import TTSEngine
        from trackiellm_tpu.models import tts as tts_model

        from trackiellm_tpu.audio.phonemizer import PhonemeFrontend

        # Any vocab that is NOT the phoneme inventory must be rejected
        # (the grapheme charset may coincide in size, so force one off).
        cfg = tts_model.TTSConfig.tiny()._replace(
            vocab_size=PhonemeFrontend.vocab_size + 1)
        params = tts_model.init_tts(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            TTSEngine(params, cfg, lang="en")
