"""Falcon family correctness against the transformers oracle.

Three published topologies, each a tiny random-weight
``FalconForCausalLM``:

- **7B-style**: multi-query (n_kv=1), parallel residual with ONE
  shared input LayerNorm, fused [q0..qn, k, v] qkv rows.
- **40B/180B-style** ("new decoder architecture"): GQA with per-group
  [q0..qr, k, v] fused rows and TWO parallel norms — the MLP branch
  norms the residual stream itself (cfg.parallel_mlp_norm).
- **sequential**: parallel_attn=False — plain pre-norm residuals with
  LayerNorm, per-head (q,k,v)-interleaved fused rows.

All use LayerNorm-with-bias and the ungated exact-erf GELU MLP
(cfg.act="gelu_exact"). Reference analogue: llama.cpp's falcon arch
behind the reference's loader (src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, HID = 128, 64, 3, 4, 128
SEQ = 12


def _oracle(**kw):
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(kw.pop("seed", 0))
    hf_cfg = FalconConfig(
        vocab_size=VOCAB, hidden_size=DIM, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, ffn_hidden_size=HID,
        layer_norm_epsilon=1e-5, rope_theta=10000.0, alibi=False,
        attention_dropout=0.0, hidden_dropout=0.0,
        max_position_embeddings=64, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, **kw)
    hf_cfg._attn_implementation = "eager"
    model = FalconForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "layernorm" in name.lower() or ".ln_" in name:
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
    tokens = torch.randint(3, VOCAB, (1, SEQ),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


def _check(state, tokens, ref, **conv_kw):
    params, cfg = C.falcon_from_hf(state, n_heads=HEADS, max_seq=64,
                                   dtype=jnp.float32, **conv_kw)
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    bucket = 16
    padded = np.zeros(bucket, np.int32)
    padded[: len(tokens)] = tokens
    logits, cache = llm_model.prefill(
        params, cfg, jnp.asarray(padded), jnp.int32(len(tokens)), cache)
    np.testing.assert_allclose(np.asarray(logits), ref[len(tokens) - 1],
                               atol=3e-4, rtol=1e-3)
    # decode continuation over ground-truth argmax tokens
    tid = int(np.argmax(ref[len(tokens) - 1]))
    logits, cache = llm_model.decode_step(
        params, cfg, jnp.int32(tid), cache)
    return params, cfg


class TestFalcon7BStyle:
    def test_logits_match(self):
        state, tokens, ref = _oracle(multi_query=True, parallel_attn=True,
                                     new_decoder_architecture=False,
                                     bias=False)
        params, cfg = _check(state, tokens, ref)
        assert cfg.n_kv_heads == 1 and cfg.parallel_residual
        assert not cfg.parallel_mlp_norm

    def test_exact_gelu_is_load_bearing(self):
        """cfg.act="gelu_exact" selects the erf GELU (torch nn.GELU);
        the tanh approximation diverges from it at moderate |x| — the
        tiny-fixture logits can't separate them, the activation curve
        can."""
        import jax
        x = np.linspace(-6, 6, 97, dtype=np.float32)
        ref = torch.nn.GELU()(torch.from_numpy(x)).numpy()
        exact = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
        tanh = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=True))
        np.testing.assert_allclose(exact, ref, atol=1e-6)
        assert np.abs(tanh - ref).max() > 1e-4


class TestFalconNewArch:
    def test_logits_match(self):
        state, tokens, ref = _oracle(multi_query=True, parallel_attn=True,
                                     new_decoder_architecture=True,
                                     num_kv_heads=2, bias=False)
        params, cfg = _check(state, tokens, ref)
        assert cfg.n_kv_heads == 2
        assert cfg.parallel_residual and cfg.parallel_mlp_norm

    def test_mlp_norm_is_load_bearing(self):
        """Sharing the attention norm (7B behavior) must diverge on a
        new-arch checkpoint."""
        state, tokens, ref = _oracle(multi_query=True, parallel_attn=True,
                                     new_decoder_architecture=True,
                                     num_kv_heads=2, bias=False)
        params, cfg = C.falcon_from_hf(state, n_heads=HEADS, max_seq=64,
                                       dtype=jnp.float32)
        cfg_shared = cfg._replace(parallel_mlp_norm=False)
        cache = llm_model.KVCache.create(cfg_shared, dtype=jnp.float32)
        padded = np.zeros(16, np.int32)
        padded[: len(tokens)] = tokens
        logits, _ = llm_model.prefill(
            params, cfg_shared, jnp.asarray(padded),
            jnp.int32(len(tokens)), cache)
        assert np.abs(np.asarray(logits) - ref[len(tokens) - 1]).max() \
            > 1e-3


class TestFalconSequential:
    def test_logits_match_mha_with_biases(self):
        state, tokens, ref = _oracle(multi_query=False, parallel_attn=False,
                                     new_decoder_architecture=False,
                                     bias=True)
        params, cfg = _check(state, tokens, ref)
        assert not cfg.parallel_residual
        assert cfg.n_kv_heads == HEADS
        assert cfg.qkv_bias and cfg.out_bias and cfg.mlp_bias


class TestFalconGGUF:
    """llama.cpp falcon-arch GGUF ingestion (gguf_to_falcon_params).

    The writer applies llama.cpp's qkv un-grouping independently
    (convert_hf_to_gguf.py FalconModel: (G, rep+2, hd) view ->
    [all q group-major; k; v]) for all three HF fused layouts, so the
    reader's no-reinterleave assumption is validated against the
    convention, not against itself."""

    @staticmethod
    def _ungroup(w, H, G, hd):
        g = np.asarray(w, np.float32).reshape(G, H // G + 2, hd, -1)
        q = g[:, :-2].reshape(H * hd, -1)
        k = g[:, -2].reshape(G * hd, -1)
        v = g[:, -1].reshape(G * hd, -1)
        return np.concatenate([q, k, v], axis=0)

    def _write(self, path, state, G, md_override=None):
        from tests.test_loader import write_gguf
        from trackiellm_tpu.models import loader as L

        F32 = L.GGML_F32
        A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731
        hd = DIM // HEADS
        two_norm = "transformer.h.0.ln_attn.weight" in state
        t = {
            "token_embd.weight": (A("transformer.word_embeddings.weight"),
                                  F32),
            "output_norm.weight": (A("transformer.ln_f.weight"), F32),
            "output_norm.bias": (A("transformer.ln_f.bias"), F32),
            "output.weight": (A("lm_head.weight"), F32),
        }
        for i in range(LAYERS):
            pre, b = f"transformer.h.{i}.", f"blk.{i}."
            if two_norm:
                t[b + "attn_norm.weight"] = (A(pre + "ln_attn.weight"), F32)
                t[b + "attn_norm.bias"] = (A(pre + "ln_attn.bias"), F32)
                t[b + "attn_norm_2.weight"] = (A(pre + "ln_mlp.weight"),
                                               F32)
                t[b + "attn_norm_2.bias"] = (A(pre + "ln_mlp.bias"), F32)
            else:
                t[b + "attn_norm.weight"] = (
                    A(pre + "input_layernorm.weight"), F32)
                t[b + "attn_norm.bias"] = (
                    A(pre + "input_layernorm.bias"), F32)
            t[b + "attn_qkv.weight"] = (self._ungroup(
                A(pre + "self_attention.query_key_value.weight"),
                HEADS, G, hd), F32)
            t[b + "attn_output.weight"] = (
                A(pre + "self_attention.dense.weight"), F32)
            t[b + "ffn_up.weight"] = (A(pre + "mlp.dense_h_to_4h.weight"),
                                      F32)
            t[b + "ffn_down.weight"] = (A(pre + "mlp.dense_4h_to_h.weight"),
                                        F32)
        md = {
            "general.architecture": "falcon",
            "falcon.block_count": LAYERS,
            "falcon.embedding_length": DIM,
            "falcon.context_length": 64,
            "falcon.attention.head_count": HEADS,
            "falcon.attention.head_count_kv": G,
            "falcon.attention.layer_norm_epsilon": 1e-5,
            "falcon.rope.freq_base": 10000.0,
        }
        md.update(md_override or {})
        write_gguf(path, t, md)

    def _roundtrip(self, tmp_path, G, **oracle_kw):
        state, tokens, ref = _oracle(**oracle_kw)
        ref_params, ref_cfg = C.falcon_from_hf(
            state, n_heads=HEADS, max_seq=64, dtype=jnp.float32)
        path = str(tmp_path / "falcon.gguf")
        self._write(path, state, G)
        params, cfg = C.gguf_to_falcon_params(
            path, max_seq=64, dtype=jnp.float32)
        assert cfg.norm_eps == pytest.approx(ref_cfg.norm_eps)
        assert cfg._replace(norm_eps=0) == ref_cfg._replace(norm_eps=0)
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_params))
        flat_got = dict(jax.tree_util.tree_leaves_with_path(params))
        assert flat_ref.keys() == flat_got.keys()
        for key, leaf in flat_ref.items():
            np.testing.assert_array_equal(
                np.asarray(flat_got[key]), np.asarray(leaf),
                err_msg=str(key))

    def test_mqa_7b_layout(self, tmp_path):
        self._roundtrip(tmp_path, G=1, multi_query=True,
                        parallel_attn=True,
                        new_decoder_architecture=False, bias=False)

    def test_new_arch_gqa_layout(self, tmp_path):
        self._roundtrip(tmp_path, G=2, multi_query=True,
                        parallel_attn=True,
                        new_decoder_architecture=True, num_kv_heads=2,
                        bias=False)

    def test_mha_interleaved_layout(self, tmp_path):
        self._roundtrip(tmp_path, G=HEADS, multi_query=False,
                        parallel_attn=True,
                        new_decoder_architecture=False, bias=False)

    def test_head_count_mismatch_raises(self, tmp_path):
        from trackiellm_tpu.utils.errors import TrackieError

        state, _, _ = _oracle(multi_query=True, parallel_attn=True,
                              new_decoder_architecture=False, bias=False)
        path = str(tmp_path / "bad.gguf")
        self._write(path, state, G=1,
                    md_override={"falcon.attention.head_count_kv": 2})
        with pytest.raises(TrackieError, match="attn_qkv rows"):
            C.gguf_to_falcon_params(path)
