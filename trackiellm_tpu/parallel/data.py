"""Training data pipeline: text -> packed token batches with host-side
prefetch.

The reference ships no training (SURVEY.md §2.10); this completes the
framework's fine-tuning path: documents tokenize once, pack into
fixed-length sequences (static shapes for the jitted step), shuffle per
epoch, and prefetch the next batch to the device while the current step
runs (the same async-transfer trick as the camera feeder).
"""

from __future__ import annotations

import threading
from typing import Iterator, List, Sequence

import numpy as np
import jax

from trackiellm_tpu.llm.tokenizer import Tokenizer


class PackedDataset:
    """Tokenize + pack documents into (seq_len,) training rows.

    Documents are joined with EOS separators and the concatenated stream
    is chopped into fixed rows — the standard packing that wastes no
    tokens on padding.
    """

    def __init__(self, texts: Sequence[str], tokenizer: Tokenizer,
                 seq_len: int = 256):
        self.seq_len = seq_len
        stream: List[int] = []
        for t in texts:
            stream.extend(tokenizer.encode(t))
            stream.append(tokenizer.eos_id)
        n_rows = len(stream) // seq_len
        self.rows = np.asarray(
            stream[: n_rows * seq_len], np.int32).reshape(n_rows, seq_len)

    def __len__(self) -> int:
        return len(self.rows)

    def batches(self, batch_size: int, seed: int = 0,
                drop_remainder: bool = True) -> Iterator[np.ndarray]:
        """One shuffled epoch of (batch_size, seq_len) batches."""
        order = np.random.default_rng(seed).permutation(len(self.rows))
        end = (len(order) // batch_size * batch_size if drop_remainder
               else len(order))
        for i in range(0, end, batch_size):
            yield self.rows[order[i:i + batch_size]]


class PrefetchIterator:
    """Wraps a host batch iterator: the next batch's device transfer
    starts while the current step computes."""

    def __init__(self, batches: Iterator[np.ndarray],
                 sharding=None):
        self._it = iter(batches)
        self._sharding = sharding
        self._next = None
        self._lock = threading.Lock()
        self._advance()

    def _put(self, host_batch):
        if self._sharding is not None:
            return jax.device_put(host_batch, self._sharding)
        return jax.device_put(host_batch)

    def _advance(self) -> None:
        try:
            self._next = self._put(next(self._it))
        except StopIteration:
            self._next = None

    def __iter__(self):
        return self

    def __next__(self):
        with self._lock:
            if self._next is None:
                raise StopIteration
            current = self._next
            self._advance()  # async transfer of the following batch
            return current
