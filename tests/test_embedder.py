"""Embedder (BERT-family) tests: transformers oracle exactness, the
WordPiece tokenizer vs the HF BertTokenizer, llama.cpp bert-GGUF
ingestion, bucketing/masking invariance, and semantic memory retrieval.

Beyond-parity capability: the reference's llama.cpp runtime serves
BERT-architecture embedding models (`llama-embedding`); the rebuild
ingests the same checkpoints and uses them for the cortex memory
manager's retrieval (reference keyword scoring:
src/cortex/src/memory_manager.rs:263).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.llm.tokenizer import WordPieceTokenizer
from trackiellm_tpu.models import convert
from trackiellm_tpu.models.embedder import (
    Embedder, EmbedderConfig, cosine_topk, embed_forward, init_embedder,
)

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


def _oracle(seed=0, vocab=128, hidden=32, layers=2, heads=4, inter=64,
            max_pos=64):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        max_position_embeddings=max_pos, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", layer_norm_eps=1e-12)
    torch.manual_seed(seed)
    model = BertModel(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    return model


@pytest.fixture(scope="module")
def oracle_pair():
    model = _oracle()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params, cfg = convert.bert_from_hf(state)
    # The tiny config's heads don't follow the hidden/64 rule.
    cfg = cfg._replace(n_heads=4)
    return model, params, cfg


class TestEmbedderOracle:
    def test_hidden_states_match(self, oracle_pair):
        model, params, cfg = oracle_pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, (2, 10)).astype(np.int64)
        mask = np.ones((2, 10), np.int64)
        mask[1, 6:] = 0
        with torch.no_grad():
            want = model(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask)
                         ).last_hidden_state.numpy()
        from trackiellm_tpu.models.embedder import encoder_forward

        got = np.asarray(encoder_forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.int32)))
        # Padded rows are unconstrained; compare valid positions.
        np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[1, :6], want[1, :6],
                                   rtol=2e-4, atol=2e-4)

    def test_mean_pooling_matches_sentence_transformers(self, oracle_pair):
        model, params, cfg = oracle_pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int64)
        mask = np.ones((1, 8), np.int64)
        with torch.no_grad():
            hidden = model(input_ids=torch.from_numpy(ids)
                           ).last_hidden_state
        want = hidden.mean(1)
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
        got = np.asarray(embed_forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                                   rtol=1e-5)

    def test_pooler_path_matches(self, oracle_pair):
        model, params, cfg = oracle_pair
        cfg = cfg._replace(pooling="pooler")
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int64)
        with torch.no_grad():
            want = model(input_ids=torch.from_numpy(ids)
                         ).pooler_output
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
        got = np.asarray(embed_forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.ones((1, 8), jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_padding_invariance(self, oracle_pair):
        """The same ids at different pad lengths embed identically —
        the masking is real, not cosmetic."""
        _, params, cfg = oracle_pair
        ids = np.asarray([[5, 9, 17, 3]], np.int32)
        a = np.asarray(embed_forward(
            params, cfg, jnp.asarray(ids),
            jnp.ones((1, 4), jnp.int32)))
        padded = np.zeros((1, 16), np.int32)
        padded[0, :4] = ids
        m = np.zeros((1, 16), np.int32)
        m[0, :4] = 1
        b = np.asarray(embed_forward(params, cfg, jnp.asarray(padded),
                                     jnp.asarray(m)))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestWordPiece:
    VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "cat", "sat", "on", "mat", "##s", "##ting",
             "un", "##affable", "##able", "run", "##ning", ",", ".",
             "!", "voa", "##r", "9", "##9"]

    @pytest.fixture(scope="class")
    def hf_tok(self, tmp_path_factory):
        from transformers import BertTokenizer

        p = tmp_path_factory.mktemp("wp") / "vocab.txt"
        p.write_text("\n".join(self.VOCAB))
        return BertTokenizer(str(p), do_lower_case=True)

    @pytest.fixture(scope="class")
    def tok(self):
        return WordPieceTokenizer(self.VOCAB)

    @pytest.mark.parametrize("text", [
        "the cat sat on mats",
        "The CAT, sitting!",
        "unaffable runs",          # 'runs' -> run ##s
        "Café voar!",              # accent strip: 'café' has no 'fe'
        "the 99 cats...",
        "running, unable",
        "  spaces\tand\nnewlines the cat  ",
    ])
    def test_ids_match_hf(self, tok, hf_tok, text):
        got = tok.encode(text)
        want = hf_tok.encode(text, add_special_tokens=False)
        assert got == want, (text, tok.decode(got),
                             hf_tok.decode(want))

    def test_special_wrap(self, tok):
        ids = tok.encode_with_special("the cat")
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
        assert tok.decode(ids) == "the cat"

    def test_unknown_word(self, tok):
        assert tok.encode("zzz") == [tok.unk_id]


class TestGGUFIngestion:
    def test_bert_gguf_roundtrip(self, tmp_path, oracle_pair):
        """A synthetic llama.cpp bert GGUF (real tensor names +
        metadata) converts to the exact same embeddings as the HF
        path."""
        from tests.test_loader import write_gguf

        model, hf_params, cfg = oracle_pair
        state = {k: v.numpy() for k, v in model.state_dict().items()}

        tensors = {
            "token_embd.weight": (state["embeddings.word_embeddings.weight"], 0),
            "position_embd.weight": (state["embeddings.position_embeddings.weight"], 0),
            "token_types.weight": (state["embeddings.token_type_embeddings.weight"], 0),
            "token_embd_norm.weight": (state["embeddings.LayerNorm.weight"], 0),
            "token_embd_norm.bias": (state["embeddings.LayerNorm.bias"], 0),
        }
        for i in range(cfg.n_layers):
            pre = f"encoder.layer.{i}"
            blk = f"blk.{i}"
            for gg, hf in (("attn_q", "attention.self.query"),
                           ("attn_k", "attention.self.key"),
                           ("attn_v", "attention.self.value"),
                           ("attn_output", "attention.output.dense"),
                           ("ffn_up", "intermediate.dense"),
                           ("ffn_down", "output.dense")):
                tensors[f"{blk}.{gg}.weight"] = (
                    state[f"{pre}.{hf}.weight"], 0)
                tensors[f"{blk}.{gg}.bias"] = (
                    state[f"{pre}.{hf}.bias"], 0)
            tensors[f"{blk}.attn_output_norm.weight"] = (
                state[f"{pre}.attention.output.LayerNorm.weight"], 0)
            tensors[f"{blk}.attn_output_norm.bias"] = (
                state[f"{pre}.attention.output.LayerNorm.bias"], 0)
            tensors[f"{blk}.layer_output_norm.weight"] = (
                state[f"{pre}.output.LayerNorm.weight"], 0)
            tensors[f"{blk}.layer_output_norm.bias"] = (
                state[f"{pre}.output.LayerNorm.bias"], 0)

        vocab = TestWordPiece.VOCAB + [f"w{i}" for i in
                                       range(cfg.vocab_size
                                             - len(TestWordPiece.VOCAB))]
        path = str(tmp_path / "bert.gguf")
        write_gguf(path, tensors, metadata={
            "general.architecture": "bert",
            "bert.embedding_length": cfg.hidden,
            "bert.block_count": cfg.n_layers,
            "bert.attention.head_count": cfg.n_heads,
            "bert.feed_forward_length": cfg.intermediate,
            "bert.context_length": cfg.max_pos,
            "bert.attention.layer_norm_epsilon": 1e-12,
            "bert.pooling_type": 1,
            "tokenizer.ggml.model": "bert",
            "tokenizer.ggml.tokens": vocab,
            "tokenizer.ggml.unknown_token_id": 1,
            "tokenizer.ggml.cls_token_id": 2,
            "tokenizer.ggml.seperator_token_id": 3,
            "tokenizer.ggml.padding_token_id": 0,
        })

        params, gcfg, tok = convert.gguf_to_bert_params(path)
        assert gcfg.n_heads == cfg.n_heads
        assert gcfg.pooling == "mean"
        assert tok is not None and tok.cls_id == 2 and tok.sep_id == 3

        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)),
                          jnp.int32)
        mask = jnp.ones((2, 12), jnp.int32)
        a = np.asarray(embed_forward(hf_params, cfg, ids, mask))
        b = np.asarray(embed_forward(params, gcfg._replace(
            pooling=cfg.pooling), ids, mask))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestEmbedderHost:
    def test_bucketing_matches_single(self, oracle_pair):
        """A ragged batch embeds identically to one-at-a-time calls
        (bucket padding is invisible)."""
        _, params, cfg = oracle_pair
        tok = WordPieceTokenizer(TestWordPiece.VOCAB)
        emb = Embedder(params, cfg, tok)
        texts = ["the cat", "the cat sat on mats running",
                 "unaffable!"]
        batch = emb.embed(texts)
        singles = np.stack([emb.embed([t])[0] for t in texts])
        np.testing.assert_allclose(batch, singles, rtol=1e-4, atol=1e-5)

    def test_cosine_topk(self):
        corpus = np.eye(4, dtype=np.float32)
        q = np.asarray([0.9, 0.1, 0, 0], np.float32)
        q /= np.linalg.norm(q)
        scores, idx = cosine_topk(q, corpus, 2)
        assert list(idx) == [0, 1]
        assert scores[0] > scores[1]


class TestSemanticMemory:
    def test_semantic_retrieval_beats_keywords(self, tmp_path):
        """With an embedder attached, a query with ZERO lexical overlap
        still retrieves the semantically nearest fragment; without one,
        the keyword path (reference parity) finds nothing."""
        from trackiellm_tpu.cortex.memory import MemoryManager

        vecs = {
            "partiu para o mercado": [1.0, 0.0, 0.0],
            "gosta de música alta": [0.0, 1.0, 0.0],
            "foi comprar frutas": [0.96, 0.28, 0.0],
        }

        def embed_fn(texts):
            out = []
            for t in texts:
                v = np.asarray(vecs[t], np.float32)
                out.append(v / np.linalg.norm(v))
            return np.stack(out)

        mem = MemoryManager(embed_fn=embed_fn, clock=lambda: 1.0)
        mem.archive("partiu para o mercado")
        mem.archive("gosta de música alta")

        got = mem.retrieve_relevant("foi comprar frutas", top_k=1)
        assert got and got[0].text == "partiu para o mercado"

        plain = MemoryManager(clock=lambda: 1.0)
        plain.archive("partiu para o mercado")
        plain.archive("gosta de música alta")
        assert plain.retrieve_relevant("foi comprar frutas") == []

    def test_backfill_and_persistence(self, tmp_path):
        """Fragments archived without an embedder get embeddings
        backfilled on first semantic retrieval; embeddings persist."""
        from trackiellm_tpu.cortex.memory import MemoryManager

        def embed_fn(texts):
            out = []
            for t in texts:
                rng = np.random.default_rng(abs(hash(t)) % (2 ** 31))
                v = rng.standard_normal(8).astype(np.float32)
                out.append(v / np.linalg.norm(v))
            return np.stack(out)

        store = str(tmp_path / "mem.json")
        plain = MemoryManager(store_path=store, clock=lambda: 1.0)
        plain.archive("uma mesa na cozinha")
        plain.save()

        sem = MemoryManager(store_path=store, embed_fn=embed_fn,
                            clock=lambda: 2.0)
        assert sem.fragments[0].embedding is None
        got = sem.retrieve_relevant("uma mesa na cozinha", top_k=1)
        assert got and got[0].embedding is not None
        sem.save()

        again = MemoryManager(store_path=store, embed_fn=embed_fn)
        assert again.fragments[0].embedding is not None


class TestReranker:
    def test_rank_matches_sequence_classification_oracle(self):
        """rank_forward == BertForSequenceClassification(num_labels=1)
        logits (llama.cpp RANK pooling: cls dense + tanh + cls.output),
        with real segment ids on the pair."""
        from transformers import BertConfig, BertForSequenceClassification

        cfg_t = BertConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            num_labels=1, classifier_dropout=0.0)
        torch.manual_seed(7)
        model = BertForSequenceClassification(cfg_t).eval()
        with torch.no_grad():
            for p in model.parameters():
                p.copy_(torch.randn_like(p) * 0.2)
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        params, cfg = convert.bert_from_hf(state)
        cfg = cfg._replace(n_heads=4)
        assert "cls_out" in params

        rng = np.random.default_rng(5)
        ids = rng.integers(0, 128, (2, 12)).astype(np.int64)
        types = np.zeros((2, 12), np.int64)
        types[:, 6:] = 1
        mask = np.ones((2, 12), np.int64)
        with torch.no_grad():
            want = model(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask),
                         token_type_ids=torch.from_numpy(types)
                         ).logits[:, 0].numpy()
        from trackiellm_tpu.models.embedder import rank_forward

        got = np.asarray(rank_forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.int32), jnp.asarray(types, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_host_rank_api(self):
        """Embedder.rank builds [CLS] q [SEP] d [SEP] pairs with
        segment ids and returns one score per doc; embedding-only
        checkpoints refuse clearly."""
        cfg = EmbedderConfig(vocab_size=len(TestWordPiece.VOCAB),
                             hidden=32, n_layers=2, n_heads=4,
                             intermediate=64, max_pos=64)
        params = init_embedder(jax.random.PRNGKey(0), cfg)
        tok = WordPieceTokenizer(TestWordPiece.VOCAB)
        emb = Embedder(params, cfg, tok)
        with pytest.raises(ValueError):
            emb.rank("the cat", ["the mat"])
        params["cls_out"] = {
            "w": jnp.ones((32, 1), jnp.float32) * 0.1,
            "b": jnp.zeros((1,), jnp.float32)}
        scores = emb.rank("the cat", ["the cat sat", "running!",
                                      "unaffable mats"])
        assert scores.shape == (3,)
        assert np.all(np.isfinite(scores))


class TestAppWiring:
    def test_app_memory_uses_embedder(self):
        """TrackieApp(embed_fn=...) routes memory embedding through the
        shared scheduler (OTHER priority) into MemoryManager."""
        from trackiellm_tpu.app import TrackieApp

        calls = []

        def embed_fn(texts):
            calls.append(list(texts))
            out = []
            for t in texts:
                rng = np.random.default_rng(abs(hash(t)) % (2 ** 31))
                v = rng.standard_normal(4).astype(np.float32)
                out.append(v / np.linalg.norm(v))
            return np.stack(out)

        app = TrackieApp(embed_fn=embed_fn)
        try:
            app.memory.archive("o usuario gosta de cafe")
            got = app.memory.retrieve_relevant(
                "o usuario gosta de cafe", top_k=1)
            assert got and got[0].embedding is not None
            assert calls  # went through the wrapper
        finally:
            if hasattr(app, "shutdown"):
                app.shutdown()
