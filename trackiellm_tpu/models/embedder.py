"""Text embedding model — BERT-family encoder for semantic retrieval.

Beyond-parity capability: the reference's memory manager retrieves by
keyword overlap only (src/cortex/tk_memory_manager.c retrieve_relevant_
memories), but the llama.cpp runtime it embeds serves BERT-architecture
embedding models (all-MiniLM, BGE, GTE — llama.cpp `bert` arch,
`llama-embedding`). This module is the TPU-native twin: a bidirectional
post-LayerNorm transformer encoder with learned position + token-type
embeddings, masked mean / CLS / tanh-pooler pooling, and L2-normalized
sentence vectors, ingesting the same checkpoints (HF BertModel state
dicts or llama.cpp bert GGUFs via models/convert.py).

TPU-first design: the whole encoder is ONE jitted program per
(batch, length) bucket — stacked layer params swept by ``lax.scan``,
attention as fixed-shape batched matmuls on the MXU, padding masked by
additive -inf logits. ``embed_batch`` buckets ragged inputs to a small
set of static shapes so repeat calls never recompile.

Oracle: ``transformers.BertModel`` (tests/test_embedder.py asserts
exactness on a randomized tiny config through both ingestion paths).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


class EmbedderConfig(NamedTuple):
    vocab_size: int = 30522
    hidden: int = 384
    n_layers: int = 6
    n_heads: int = 12
    intermediate: int = 1536
    max_pos: int = 512
    type_vocab: int = 2
    eps: float = 1e-12
    # "mean" (sentence-transformers default, llama.cpp pooling_type 1),
    # "cls" (pooling_type 2), or "pooler" (tanh dense over CLS).
    pooling: str = "mean"

    @classmethod
    def minilm_l6(cls) -> "EmbedderConfig":
        """all-MiniLM-L6-v2 geometry (the llama.cpp embedding demo
        model)."""
        return cls()

    @classmethod
    def test_tiny(cls) -> "EmbedderConfig":
        return cls(vocab_size=128, hidden=32, n_layers=2, n_heads=4,
                   intermediate=64, max_pos=64)


def _ln(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def init_embedder(key: jax.Array, cfg: EmbedderConfig,
                  dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    nxt = lambda: next(keys)  # noqa: E731
    h, m, L = cfg.hidden, cfg.intermediate, cfg.n_layers

    def lin(k, cin, cout):
        return (jax.random.normal(k, (L, cin, cout), dtype)
                * (1.0 / math.sqrt(cin)))

    def zeros(cout):
        return jnp.zeros((L, cout), dtype)

    def ones(cout):
        return jnp.ones((L, cout), dtype)

    params: Dict[str, Any] = {
        "word_emb": jax.random.normal(nxt(), (cfg.vocab_size, h), dtype) * 0.02,
        "pos_emb": jax.random.normal(nxt(), (cfg.max_pos, h), dtype) * 0.02,
        "type_emb": jax.random.normal(nxt(), (cfg.type_vocab, h), dtype) * 0.02,
        "emb_norm": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
        "layers": {
            "wq": lin(nxt(), h, h), "bq": zeros(h),
            "wk": lin(nxt(), h, h), "bk": zeros(h),
            "wv": lin(nxt(), h, h), "bv": zeros(h),
            "wo": lin(nxt(), h, h), "bo": zeros(h),
            "attn_norm_g": ones(h), "attn_norm_b": zeros(h),
            "wi": lin(nxt(), h, m), "bi": zeros(m),
            "wd": lin(nxt(), m, h), "bd": zeros(h),
            "out_norm_g": ones(h), "out_norm_b": zeros(h),
        },
        "pooler": {"w": jax.random.normal(nxt(), (h, h), dtype)
                        / math.sqrt(h),
                   "b": jnp.zeros((h,), dtype)},
    }
    return params


def encoder_forward(params: Dict[str, Any], cfg: EmbedderConfig,
                    ids: jnp.ndarray, mask: jnp.ndarray,
                    type_ids: jnp.ndarray = None) -> jnp.ndarray:
    """(B, T) int32 ids + (B, T) {0,1} mask -> (B, T, H) hidden states.
    Bidirectional attention; padded positions receive -inf logits.
    ``type_ids`` (segment ids, pair inputs for reranking) default 0."""
    b, t = ids.shape
    h, nh = cfg.hidden, cfg.n_heads
    hd = h // nh

    if type_ids is None:
        type_emb = params["type_emb"][0][None, None]
    else:
        type_emb = params["type_emb"][type_ids]
    x = (params["word_emb"][ids]
         + params["pos_emb"][:t][None]
         + type_emb)
    x = _ln(x, params["emb_norm"]["g"], params["emb_norm"]["b"], cfg.eps)

    neg = jnp.asarray(-1e9, jnp.float32)
    attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)

    def layer(carry, lp):
        y = carry

        def heads(v):
            return v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

        q = heads(y @ lp["wq"] + lp["bq"])
        k = heads(y @ lp["wk"] + lp["bk"])
        v = heads(y @ lp["wv"] + lp["bv"])
        scores = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)
        scores = scores.astype(jnp.float32) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(b, t, h)
        attn = ctx @ lp["wo"] + lp["bo"]
        y = _ln(y + attn, lp["attn_norm_g"], lp["attn_norm_b"], cfg.eps)
        ff = jax.nn.gelu(y @ lp["wi"] + lp["bi"], approximate=False)
        ff = ff @ lp["wd"] + lp["bd"]
        y = _ln(y + ff, lp["out_norm_g"], lp["out_norm_b"], cfg.eps)
        return y, None

    x, _ = lax.scan(layer, x, params["layers"])
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def embed_forward(params: Dict[str, Any], cfg: EmbedderConfig,
                  ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) ids + mask -> (B, H) L2-normalized sentence embeddings
    (pooling per cfg.pooling)."""
    hidden = encoder_forward(params, cfg, ids, mask)
    if cfg.pooling == "cls":
        pooled = hidden[:, 0]
    elif cfg.pooling == "pooler":
        pooled = jnp.tanh(hidden[:, 0] @ params["pooler"]["w"]
                          + params["pooler"]["b"])
    else:  # masked mean (sentence-transformers / llama.cpp default)
        m = mask[..., None].astype(hidden.dtype)
        pooled = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    norm = jnp.linalg.norm(pooled.astype(jnp.float32), axis=-1,
                           keepdims=True)
    return (pooled / jnp.maximum(norm, 1e-12)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def rank_forward(params: Dict[str, Any], cfg: EmbedderConfig,
                 ids: jnp.ndarray, mask: jnp.ndarray,
                 type_ids: jnp.ndarray) -> jnp.ndarray:
    """Cross-encoder reranking: (B, T) [CLS] query [SEP] doc [SEP]
    pairs (segment ids 0/1) -> (B,) relevance scores.

    llama.cpp's RANK pooling over the bert arch (cls dense + tanh +
    cls.output) = HF BertForSequenceClassification(num_labels=1):
    classifier(pooler(CLS))."""
    hidden = encoder_forward(params, cfg, ids, mask, type_ids)
    pooled = jnp.tanh(hidden[:, 0] @ params["pooler"]["w"]
                      + params["pooler"]["b"])
    out = params["cls_out"]
    return (pooled @ out["w"] + out["b"])[:, 0].astype(jnp.float32)


# Static (batch, length) buckets so ragged workloads hit a handful of
# compiled programs (same discipline as the LLM prefill buckets).
_LEN_BUCKETS = (16, 32, 64, 128, 256, 512)
_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for bkt in buckets:
        if n <= bkt:
            return bkt
    return buckets[-1]


class Embedder:
    """Host-side convenience: tokenizer + bucketed batched embedding.

    ``tokenizer`` must provide ``encode_with_special(text) -> List[int]``
    (WordPieceTokenizer does) or plain ``encode``.
    """

    def __init__(self, params: Dict[str, Any], cfg: EmbedderConfig,
                 tokenizer=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer

    def _ids(self, text: str) -> List[int]:
        tok = self.tokenizer
        if hasattr(tok, "encode_with_special"):
            ids = tok.encode_with_special(text)
        else:
            ids = tok.encode(text)
        return ids[: min(self.cfg.max_pos, _LEN_BUCKETS[-1])]

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        """List of strings -> (N, H) float32 unit vectors."""
        if not texts:
            return np.zeros((0, self.cfg.hidden), np.float32)
        idlists = [self._ids(t) for t in texts]
        return self.embed_ids(idlists)

    def embed_ids(self, idlists: Sequence[Sequence[int]]) -> np.ndarray:
        n = len(idlists)
        t = _bucket(max((len(i) for i in idlists), default=1),
                    _LEN_BUCKETS)
        bb = _bucket(n, _BATCH_BUCKETS)
        ids = np.zeros((bb, t), np.int32)
        mask = np.zeros((bb, t), np.int32)
        for i, row in enumerate(idlists):
            row = list(row)[:t]
            ids[i, :len(row)] = row
            mask[i, :len(row)] = 1
        out = embed_forward(self.params, self.cfg, jnp.asarray(ids),
                            jnp.asarray(mask))
        return np.asarray(out)[:n]

    def rank(self, query: str, docs: Sequence[str]) -> np.ndarray:
        """Cross-encode (query, doc) pairs -> (len(docs),) relevance
        scores (requires a checkpoint with the cls head — rerankers)."""
        if "cls_out" not in self.params:
            raise ValueError("checkpoint has no reranking head "
                             "(cls.output tensors absent)")
        tok = self.tokenizer
        q = tok.encode(query)
        n = len(docs)
        rows, types = [], []
        for d in docs:
            di = tok.encode(d)
            ids = [tok.cls_id] + q + [tok.sep_id] + di + [tok.sep_id]
            tys = [0] * (len(q) + 2) + [1] * (len(di) + 1)
            cap = min(self.cfg.max_pos, _LEN_BUCKETS[-1])
            rows.append(ids[:cap])
            types.append(tys[:cap])
        t = _bucket(max(len(r) for r in rows), _LEN_BUCKETS)
        bb = _bucket(n, _BATCH_BUCKETS)
        ids = np.zeros((bb, t), np.int32)
        mask = np.zeros((bb, t), np.int32)
        tys = np.zeros((bb, t), np.int32)
        for i, (row, ty) in enumerate(zip(rows, types)):
            ids[i, :len(row)] = row[:t]
            mask[i, :len(row)] = 1
            tys[i, :len(row)] = ty[:t]
        out = rank_forward(self.params, self.cfg, jnp.asarray(ids),
                           jnp.asarray(mask), jnp.asarray(tys))
        return np.asarray(out)[:n]


def cosine_topk(query: np.ndarray, corpus: np.ndarray,
                k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(H,) query vs (N, H) corpus (all unit vectors) -> (scores, idx)
    of the top-k by cosine similarity."""
    if corpus.shape[0] == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
    sims = corpus @ query
    k = min(k, corpus.shape[0])
    idx = np.argpartition(-sims, k - 1)[:k]
    idx = idx[np.argsort(-sims[idx])]
    return sims[idx], idx
