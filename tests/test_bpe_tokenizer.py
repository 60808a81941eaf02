"""Byte-level BPE (GPT-2 style) exactness against the `tokenizers`
Rust engine — the tokenizer family of Llama-3 / Qwen2 / Qwen2-MoE GGUFs
(tokenizer.ggml.model == "gpt2"; llama.cpp: llm_tokenizer_bpe).

The oracle is a real trained byte-level BPE whose pre-tokenizer is the
EXACT llama-bpe regex (unicode classes via the Rust regex engine);
our hand-rolled scanner + merge loop must produce identical ids on a
battery of adversarial strings, and decode must round-trip.
"""

import json

import pytest

from trackiellm_tpu.llm.tokenizer import BpeTokenizer, _pretokenize

LLAMA_BPE_RE = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)"
                r"|[^\r\n\p{L}\p{N}]?\p{L}+"
                r"|\p{N}{1,3}"
                r"| ?[^\s\p{L}\p{N}]+[\r\n]*"
                r"|\s*[\r\n]+"
                r"|\s+(?!\S)"
                r"|\s+")

CORPUS = [
    "ola, descreva a cena a sua frente com detalhes",
    "The quick brown fox jumps over 1234 lazy dogs!",
    "vou à padaria comprar pão às 9h30 — çãõ é ü",
    "def main():\n    return {'key': [1, 2, 3]}\n\n",
    "preço R$ 1.234,56 ... e 100% disso    aqui",
    "I'll you're we've don't it's CAN'T I'M they'd",
    "linha1\nlinha2\r\n\r\n   indentado\t\ttabs",
] * 4

BATTERY = [
    "ola mundo",
    "I'll say it's 2026 and we're 100% sure they'd agree",
    "   leading spaces and trailing   ",
    "linha1\nlinha2\n\n  code:\n    x = 1\n",
    "preço: R$ 9,99 (desconto!!) — ótimo çü",
    "a1b2c3 12345 9h30 1.234,56",
    "..::!! ?? // ** [[ ]] {{}}",
    "\t\ttabs\tand \t mixed   \n",
    "palavra",
    "",
    " ",
    "\n",
    "ção às vésperas ÀÉÍÓÚ",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tokenizers import Regex, Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA_BPE_RE), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    trainer = trainers.BpeTrainer(
        vocab_size=420, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS, trainer)
    d = tmp_path_factory.mktemp("bpe")
    tok.save(str(d / "tok.json"))
    spec = json.loads((d / "tok.json").read_text())
    vocab = spec["model"]["vocab"]            # piece -> id
    merges = [m if isinstance(m, str) else " ".join(m)
              for m in spec["model"]["merges"]]
    pieces = [None] * len(vocab)
    for piece, i in vocab.items():
        pieces[i] = piece
    mine = BpeTokenizer(pieces, merges, pre="llama-bpe")
    return tok, mine


class TestByteLevelBpe:
    def test_ids_match_rust_oracle(self, trained):
        oracle, mine = trained
        for text in BATTERY + CORPUS:
            assert mine.encode(text) == oracle.encode(text).ids, text

    def test_decode_roundtrips(self, trained):
        _, mine = trained
        for text in BATTERY + CORPUS:
            assert mine.decode(mine.encode(text)) == text, text

    def test_pretokenizer_covers_text(self):
        for text in BATTERY:
            assert "".join(_pretokenize(text, 3)) == text

    def test_special_tokens_match_literally(self, trained):
        _, mine = trained
        n = mine.vocab_size
        pieces = mine._pieces + ["<|im_start|>", "<|im_end|>"]
        types = [1] * n + [3, 3]
        merges = [f"{a} {b}" for (a, b) in sorted(
            mine._ranks, key=mine._ranks.get)]
        sp = BpeTokenizer(pieces, merges, pre="llama-bpe",
                          token_types=types, bos_id=n, eos_id=n + 1)
        ids = sp.encode("<|im_start|>ola<|im_end|>")
        assert ids[0] == n and ids[-1] == n + 1
        assert sp.decode(ids) == "<|im_start|>ola<|im_end|>"

    def test_qwen2_digit_runs(self):
        assert _pretokenize("12345", 1) == ["1", "2", "3", "4", "5"]
        assert _pretokenize("12345", 3) == ["123", "45"]


def test_gguf_gpt2_tokenizer_wiring(tmp_path, trained):
    """A GGUF carrying tokenizer.ggml.model='gpt2' (+ merges/pre keys)
    builds a BpeTokenizer whose ids match the Rust oracle."""
    import numpy as np

    from tests.test_loader import write_gguf
    from trackiellm_tpu.models import loader as L
    from trackiellm_tpu.models.convert import tokenizer_from_gguf

    oracle, mine = trained
    merges = [f"{a} {b}" for (a, b) in sorted(
        mine._ranks, key=mine._ranks.get)]
    p = str(tmp_path / "bpe.gguf")
    write_gguf(p, {"token_embd.weight": (
        np.zeros((4, 4), np.float32), L.GGML_F32)}, metadata={
        "general.architecture": "llama",
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.pre": "llama-bpe",
        "tokenizer.ggml.tokens": mine._pieces,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    })
    tok = tokenizer_from_gguf(L.read_gguf_header(p))
    assert type(tok).__name__ == "BpeTokenizer"
    assert tok.bos_id == 1 and tok.eos_id == 2
    text = "ola, descreva 123 it's"
    assert tok.encode(text) == oracle.encode(text).ids
    assert tok.decode(tok.encode(text)) == text


def test_tokenizer_spec_json_roundtrip(tmp_path, trained):
    """The checkpoint-persisted tokenizer spec (convert CLI metadata)
    survives JSON and rebuilds an id-identical BpeTokenizer."""
    import numpy as np

    from tests.test_loader import write_gguf
    from trackiellm_tpu.models import loader as L
    from trackiellm_tpu.models.convert import (tokenizer_from_spec,
                                               tokenizer_spec_from_gguf)

    oracle, mine = trained
    merges = [f"{a} {b}" for (a, b) in sorted(
        mine._ranks, key=mine._ranks.get)]
    p = str(tmp_path / "bpe.gguf")
    write_gguf(p, {"token_embd.weight": (
        np.zeros((4, 4), np.float32), L.GGML_F32)}, metadata={
        "general.architecture": "llama",
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.pre": "qwen2",
        "tokenizer.ggml.tokens": mine._pieces,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.eos_token_id": 2,
    })
    spec = tokenizer_spec_from_gguf(L.read_gguf_header(p))
    spec = json.loads(json.dumps(spec))      # the sidecar round trip
    tok = tokenizer_from_spec(spec)
    assert tok.eos_id == 2
    # qwen2 pre: digits split individually.
    a = tok.encode("ano 2026 ok")
    b = BpeTokenizer(mine._pieces, merges, pre="qwen2").encode(
        "ano 2026 ok")
    assert a == b
    assert tok.decode(a) == "ano 2026 ok"


O200K_RE = (r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*"
            r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?i:'s|'t|'re|'ve|'m|'ll|'d)?"
            r"|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+"
            r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?i:'s|'t|'re|'ve|'m|'ll|'d)?"
            r"|\p{N}{1,3}"
            r"| ?[^\s\p{L}\p{N}]+[\r\n/]*"
            r"|\s*[\r\n]+"
            r"|\s+(?!\S)"
            r"|\s+")

O200K_BATTERY = BATTERY + [
    "I'll say CAN'T they'd WE'RE it's",      # contractions GLUED here
    "CamelCase USAToday iPhone XPath ABCdef",
    "path/to/file.py // comment\n/slash",
    "MiXeD cAsE wOrDs",
    "ação ÀÉ Vésperas çÜ",
    " Upper lower UPPER123abc",
]


class TestO200KPretokenizer:
    """The o200k_base scanner (tiktoken; GPT-4o + Llama-4 — llama.cpp
    pre id 'llama4') vs the `tokenizers` Rust regex engine running the
    published pattern. The regex string is the tiktoken o200k_base
    pat_str; the real-GGUF check on first weights contact is reading
    tokenizer.ggml.pre == 'llama4' and spot-checking ids."""

    @pytest.fixture(scope="class")
    def engine(self):
        from tokenizers import Regex, pre_tokenizers

        return pre_tokenizers.Split(Regex(O200K_RE), behavior="isolated")

    @pytest.mark.parametrize("idx", range(len(O200K_BATTERY)))
    def test_scan_matches_rust_regex(self, engine, idx):
        from trackiellm_tpu.llm.tokenizer import _pretokenize_o200k

        text = O200K_BATTERY[idx]
        want = [t for t, _ in engine.pre_tokenize_str(text)]
        got = _pretokenize_o200k(text)
        assert got == want, (text, got, want)

    def test_dispatch_via_pre_id(self):
        from trackiellm_tpu.llm.tokenizer import BpeTokenizer

        tok = BpeTokenizer(["a", "b"], merges=[], pre="llama4")
        assert tok._o200k
