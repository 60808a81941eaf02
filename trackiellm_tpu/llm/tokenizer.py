"""Tokenizers for the LLM runner.

The reference delegates tokenization to llama.cpp's SentencePiece
(`llama_tokenize`, reference: src/ai_models/tk_runner_streaming.c:13-46).
Here the runner is tokenizer-agnostic behind a small protocol; shipped
implementations:

  - :class:`ByteTokenizer` — a self-contained byte-level tokenizer
    (256 byte ids + specials). Zero external files; the default for
    tests and for environments without a model vocabulary.
  - :class:`VocabTokenizer` — greedy-longest-match over a loaded
    vocabulary file (one piece per line), covering converted
    SentencePiece vocabs without the sentencepiece runtime.
"""

from __future__ import annotations

from typing import Dict, List, Protocol, Sequence


class Tokenizer(Protocol):
    vocab_size: int
    bos_id: int
    eos_id: int
    pad_id: int

    def encode(self, text: str, add_bos: bool = False) -> List[int]: ...

    def decode(self, ids: Sequence[int]) -> str: ...

    def decode_token(self, token_id: int) -> str: ...


class ByteTokenizer:
    """UTF-8 byte tokenizer: ids 0-255 are raw bytes; specials follow."""

    def __init__(self, n_special_pad_to: int = 512):
        self.bos_id = 256
        self.eos_id = 257
        self.pad_id = 258
        self.vocab_size = max(n_special_pad_to, 259)

    def encode(self, text: str, add_bos: bool = False) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.bos_id] + ids) if add_bos else ids

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")

    def decode_token(self, token_id: int) -> str:
        if 0 <= token_id < 256:
            return bytes([token_id]).decode("utf-8", errors="replace")
        return ""

    def token_bytes(self, token_id: int) -> bytes:
        return bytes([token_id]) if 0 <= token_id < 256 else b""


class VocabTokenizer:
    """Greedy longest-match tokenizer over an explicit vocabulary.

    Vocab file format: one piece per line (literal text; ``\\u2581`` is
    treated as a leading space, SentencePiece convention). Ids are line
    numbers after the specials block.
    """

    SPECIALS = ("<pad>", "<s>", "</s>", "<unk>")

    def __init__(self, pieces: Sequence[str]):
        self.pieces: List[str] = list(self.SPECIALS) + [
            p.replace("▁", " ") for p in pieces
        ]
        self.pad_id, self.bos_id, self.eos_id, self.unk_id = 0, 1, 2, 3
        self.vocab_size = len(self.pieces)
        self._index: Dict[str, int] = {
            p: i for i, p in enumerate(self.pieces) if i >= len(self.SPECIALS)
        }
        self._max_len = max((len(p) for p in self._index), default=1)

    @classmethod
    def load(cls, path: str) -> "VocabTokenizer":
        with open(path, "r", encoding="utf-8") as f:
            return cls([line.rstrip("\n") for line in f if line.rstrip("\n")])

    def encode(self, text: str, add_bos: bool = False) -> List[int]:
        ids: List[int] = [self.bos_id] if add_bos else []
        i = 0
        while i < len(text):
            match = None
            for ln in range(min(self._max_len, len(text) - i), 0, -1):
                cand = text[i:i + ln]
                if cand in self._index:
                    match = (self._index[cand], ln)
                    break
            if match is None:
                ids.append(self.unk_id)
                i += 1
            else:
                ids.append(match[0])
                i += match[1]
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(
            self.pieces[i] for i in ids
            if len(self.SPECIALS) <= i < self.vocab_size
        )

    def decode_token(self, token_id: int) -> str:
        if len(self.SPECIALS) <= token_id < self.vocab_size:
            return self.pieces[token_id]
        return ""
