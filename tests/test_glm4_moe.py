"""GLM-4.5 / GLM-4.6 (glm4_moe) family correctness against the
transformers oracle.

A tiny random-weight ``Glm4MoeForCausalLM`` is ground truth; the JAX
forward must match teacher-forced logits through prefill + decode —
exercising every GLM-4.5 delta at once: per-head QK RMSNorm before
rope, half-width split-half rope (no interleave — unlike dense GLM-4),
DeepSeek-V3-style routing (sigmoid + selection-only
e_score_correction_bias + top-2-sum group limiting + routed scaling +
renormalized top-k), ungated shared experts, and
first_k_dense_replace dense layers.

Parity ref: llama.cpp ingests this family as arch ``glm4moe`` behind
the reference's loader (src/ai_models/tk_model_loader.c:199)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD = 256, 64, 3, 4, 2, 16
EXPERTS, TOPK, MOE_HID, DENSE_HID = 4, 2, 48, 96
FIRST_DENSE = 1
N_GROUP, TOPK_GROUP = 2, 1
SCALE = 1.5
SEQ = 18


@pytest.fixture(scope="module")
def oracle():
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    torch.manual_seed(0)
    hf_cfg = Glm4MoeConfig(
        vocab_size=VOCAB, hidden_size=DIM,
        intermediate_size=DENSE_HID, moe_intermediate_size=MOE_HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD,
        n_routed_experts=EXPERTS, num_experts_per_tok=TOPK,
        n_shared_experts=1, first_k_dense_replace=FIRST_DENSE,
        n_group=N_GROUP, topk_group=TOPK_GROUP,
        routed_scaling_factor=SCALE, norm_topk_prob=True,
        partial_rotary_factor=0.5, use_qk_norm=True,
        max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False)
    hf_cfg._attn_implementation = "eager"
    model = Glm4MoeForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
            else:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.08)
        # A non-zero POSITIVE selection bias: it shifts which GROUP
        # wins (load-bearing) while keeping every kept-group candidate
        # above the masked entries' 0.0 — a large negative bias can
        # leave fewer than top_k positive candidates in the kept
        # group, where torch.topk's 0.0-tie-break arbitrarily selects
        # a MASKED expert (whose sigmoid combine weight then differs
        # per choice). Real configs cannot hit that: GLM-4.5 ships
        # n_group=1, and trained routers keep winners positive.
        for i in range(FIRST_DENSE, LAYERS):
            model.model.layers[i].mlp.gate.e_score_correction_bias \
                .copy_(0.1 + torch.rand(EXPERTS, generator=gen) * 1.5)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 3),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


@pytest.fixture(scope="module")
def converted(oracle):
    state, tokens, ref = oracle
    params, cfg = C.glm4_moe_from_hf(
        state, max_seq=64, rope_theta=10000.0, norm_eps=1e-5,
        partial_rotary_factor=0.5, moe_k=TOPK,
        routed_scaling_factor=SCALE, n_groups=N_GROUP,
        topk_groups=TOPK_GROUP, dtype=jnp.float32)
    return params, cfg, tokens, ref


class TestGlm4Moe:
    def test_convert_shapes(self, converted):
        params, cfg, _, _ = converted
        assert cfg.qk_norm and cfg.partial_rotary_factor == 0.5
        assert cfg.moe_score_func == "sigmoid"
        assert cfg.moe_n_groups == N_GROUP
        assert cfg.moe_topk_groups == TOPK_GROUP
        assert cfg.moe_group_score == "top2sum"
        assert cfg.moe_routed_scale == SCALE
        assert cfg.moe_first_dense == FIRST_DENSE
        assert not cfg.moe_shared_gated
        lay = params["layers"]
        assert lay["q_norm"].shape == (LAYERS, HD)
        assert lay["moe_gate_bias"].shape == (LAYERS, EXPERTS)
        assert lay["w_gu"].shape == (LAYERS, EXPERTS, DIM, 2 * MOE_HID)
        assert lay["w_gu_mlp"].shape == (LAYERS, DIM, 2 * DENSE_HID)

    def test_prefill_and_decode_match_oracle(self, converted):
        params, cfg, tokens, ref = converted
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   rtol=2e-3, atol=2e-3)
        for j in range(3):
            logits, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
            np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"decode step {j}")

    def test_selection_bias_is_load_bearing(self, oracle, converted):
        """Zeroing the e_score_correction_bias must change logits (it
        shifts WHICH experts win) — guards a silently dropped bias."""
        params, cfg, tokens, ref = converted
        broken = dict(params)
        broken["layers"] = dict(params["layers"])
        broken["layers"]["moe_gate_bias"] = jnp.zeros_like(
            params["layers"]["moe_gate_bias"])
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(
            broken, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert not np.allclose(np.asarray(logits), ref[SEQ - 1],
                               atol=2e-3)

    def test_group_limit_is_load_bearing(self, converted):
        """Disabling group limiting (n_groups=1) must change routing
        on this fixture (topk_group=1 of 2 masks half the experts)."""
        params, cfg, tokens, ref = converted
        loose = cfg._replace(moe_n_groups=1, moe_topk_groups=1)
        cache = llm_model.KVCache.create(loose, dtype=jnp.float32)
        logits, _ = llm_model.prefill(
            params, loose, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert not np.allclose(np.asarray(logits), ref[SEQ - 1],
                               atol=2e-3)

    def test_runner_generates(self, converted):
        from trackiellm_tpu.llm.runner import (GenerationConfig,
                                               LLMRunner)
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        params, cfg, _, _ = converted
        r = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                      GenerationConfig(max_tokens=8, temperature=0.0),
                      cache_dtype=jnp.float32)
        assert isinstance(r.generate("ola"), str)
