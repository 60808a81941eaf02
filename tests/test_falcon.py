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

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

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
