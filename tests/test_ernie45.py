"""ERNIE 4.5 (dense + MoE) against the transformers oracles.

Ernie4_5ForCausalLM: Llama-shaped with an INTERLEAVED full-width rope
(folded to split-half at conversion like GLM-4) and optional
projection biases. Ernie4_5_MoeForCausalLM adds: softmax routing that
SELECTS on score + e_score_correction_bias (the DeepSeek-V3
selection-only bias mechanism -> layers.moe_gate_bias) but combines
with the UNBIASED renormalized scores, ungated shared experts, and
moe_layer_start_index dense-first layers (cfg.moe_first_dense — a
lax.cond over dual MLP stacks, the Maverick machinery). Reference
analogue: llama.cpp's ernie4_5 arches behind the reference's loader
(src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD = 128, 64, 4, 4, 2, 16
THETA = 10000.0
SEQ = 18


def _rand(model, seed):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name.lower():
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
            elif "q_proj" in name or "k_proj" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.15)
            elif "gate.weight" in name or "correction" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.5)


def _check(params, cfg, tokens, ref, n_dec=3):
    toks = jnp.asarray(tokens[:SEQ], jnp.int32)
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    logits, cache = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
    np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)
    for j in range(n_dec):
        logits, cache = llm_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"decode step {j}")


class TestErnieDense:
    @pytest.fixture(scope="class")
    def oracle(self):
        from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

        torch.manual_seed(0)
        hf_cfg = Ernie4_5Config(
            vocab_size=VOCAB, hidden_size=DIM, intermediate_size=96,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV, head_dim=HD,
            max_position_embeddings=64, rope_theta=THETA,
            rms_norm_eps=1e-5, use_bias=True,
            tie_word_embeddings=True,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        hf_cfg._attn_implementation = "eager"
        model = Ernie4_5ForCausalLM(hf_cfg).eval()
        _rand(model, 1)
        tokens = torch.randint(
            0, VOCAB, (1, SEQ + 3),
            generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return state, tokens[0].numpy(), ref

    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.ernie45_from_hf(
            state, max_seq=64, norm_eps=1e-5, rope_theta=THETA,
            head_dim=HD, dtype=jnp.float32)
        assert cfg.qkv_bias and cfg.n_experts == 0
        _check(params, cfg, tokens, ref)


class TestErnieMoE:
    @pytest.fixture(scope="class")
    def oracle(self):
        from transformers import (Ernie4_5_MoeConfig,
                                  Ernie4_5_MoeForCausalLM)

        torch.manual_seed(3)
        hf_cfg = Ernie4_5_MoeConfig(
            vocab_size=VOCAB, hidden_size=DIM, intermediate_size=96,
            moe_intermediate_size=48, moe_num_experts=4, moe_k=2,
            moe_num_shared_experts=1,
            moe_layer_start_index=1, moe_layer_interval=1,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV, head_dim=HD,
            max_position_embeddings=64, rope_theta=THETA,
            rms_norm_eps=1e-5, use_bias=False,
            tie_word_embeddings=False,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        hf_cfg._attn_implementation = "eager"
        model = Ernie4_5_MoeForCausalLM(hf_cfg).eval()
        _rand(model, 4)
        tokens = torch.randint(
            0, VOCAB, (1, SEQ + 3),
            generator=torch.Generator().manual_seed(5))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return state, tokens[0].numpy(), ref

    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.ernie45_from_hf(
            state, max_seq=64, norm_eps=1e-5, rope_theta=THETA,
            head_dim=HD, moe_k=2, dtype=jnp.float32)
        assert cfg.n_experts == 4 and cfg.n_experts_used == 2
        assert cfg.moe_first_dense == 1 and cfg.moe_pattern == 0
        assert "moe_gate_bias" in params["layers"]
        assert "w_gu_mlp" in params["layers"]
        _check(params, cfg, tokens, ref)

    def test_correction_bias_load_bearing(self, oracle):
        """Zeroing the selection bias must change WHICH experts win
        (and the logits)."""
        state, tokens, ref = oracle
        params, cfg = C.ernie45_from_hf(
            state, max_seq=64, rope_theta=THETA, head_dim=HD,
            moe_k=2, dtype=jnp.float32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        good, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        good_err = np.abs(np.asarray(good) - ref[SEQ - 1]).max()
        bad_params = dict(params)
        bad_params["layers"] = dict(
            params["layers"],
            moe_gate_bias=jnp.zeros_like(
                params["layers"]["moe_gate_bias"]))
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        bad, _ = llm_model.prefill(
            bad_params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert np.abs(np.asarray(bad) - ref[SEQ - 1]).max() \
            > max(100 * good_err, 2e-3)

    def test_first_dense_load_bearing(self, oracle):
        """Treating layer 0 as MoE (first_dense=0) must diverge — its
        expert banks are zeros."""
        state, tokens, ref = oracle
        params, cfg = C.ernie45_from_hf(
            state, max_seq=64, rope_theta=THETA, head_dim=HD,
            moe_k=2, dtype=jnp.float32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        good, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        good_err = np.abs(np.asarray(good) - ref[SEQ - 1]).max()
        bad_cfg = cfg._replace(moe_first_dense=0)
        cache = llm_model.KVCache.create(bad_cfg, dtype=jnp.float32)
        bad, _ = llm_model.prefill(
            params, bad_cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert np.abs(np.asarray(bad) - ref[SEQ - 1]).max() \
            > max(100 * good_err, 2e-3)
