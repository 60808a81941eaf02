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


class TestGlm4MoeGGUF:
    """llama.cpp glm4moe GGUF ingestion staged per the deepseek2
    discipline: the synthetic writer produces the staged conventions
    (deepseek2-style routing keys, exp_probs_b.bias selection bias,
    *_exps/*_shexp banks) from the SAME HF oracle weights, and the
    GGUF route must match the oracle's teacher-forced logits. Key
    strings remain unvalidated offline (docs/MODELS.md)."""

    def test_synthetic_gguf_matches_oracle(self, oracle, tmp_path):
        from tests.test_loader import write_gguf

        from trackiellm_tpu.models import loader as L

        state, tokens, ref = oracle

        def t(name):
            return np.asarray(state[name], np.float32)

        F32 = L.GGML_F32
        tensors = {
            "token_embd.weight": (t("model.embed_tokens.weight"), F32),
            "output_norm.weight": (t("model.norm.weight"), F32),
            "output.weight": (t("lm_head.weight"), F32),
        }
        for i in range(LAYERS):
            hp, gp = f"model.layers.{i}", f"blk.{i}"
            tensors[f"{gp}.attn_norm.weight"] = (
                t(f"{hp}.input_layernorm.weight"), F32)
            tensors[f"{gp}.ffn_norm.weight"] = (
                t(f"{hp}.post_attention_layernorm.weight"), F32)
            for g, h in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                         ("attn_v", "v_proj"),
                         ("attn_output", "o_proj")):
                tensors[f"{gp}.{g}.weight"] = (
                    t(f"{hp}.self_attn.{h}.weight"), F32)
            tensors[f"{gp}.attn_q_norm.weight"] = (
                t(f"{hp}.self_attn.q_norm.weight"), F32)
            tensors[f"{gp}.attn_k_norm.weight"] = (
                t(f"{hp}.self_attn.k_norm.weight"), F32)
            if f"{hp}.mlp.gate.weight" in state:
                tensors[f"{gp}.ffn_gate_inp.weight"] = (
                    t(f"{hp}.mlp.gate.weight"), F32)
                tensors[f"{gp}.exp_probs_b.bias"] = (
                    t(f"{hp}.mlp.gate.e_score_correction_bias"), F32)
                for gg, hh in (("ffn_gate_exps", "gate_proj"),
                               ("ffn_up_exps", "up_proj"),
                               ("ffn_down_exps", "down_proj")):
                    tensors[f"{gp}.{gg}.weight"] = (np.stack(
                        [t(f"{hp}.mlp.experts.{e}.{hh}.weight")
                         for e in range(EXPERTS)]), F32)
                for gg, hh in (("ffn_gate_shexp", "gate_proj"),
                               ("ffn_up_shexp", "up_proj"),
                               ("ffn_down_shexp", "down_proj")):
                    tensors[f"{gp}.{gg}.weight"] = (
                        t(f"{hp}.mlp.shared_experts.{hh}.weight"), F32)
            else:
                for gg, hh in (("ffn_gate", "gate_proj"),
                               ("ffn_up", "up_proj"),
                               ("ffn_down", "down_proj")):
                    tensors[f"{gp}.{gg}.weight"] = (
                        t(f"{hp}.mlp.{hh}.weight"), F32)
        p = str(tmp_path / "glm45.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "glm4moe",
            "glm4moe.embedding_length": DIM,
            "glm4moe.block_count": LAYERS,
            "glm4moe.attention.head_count": HEADS,
            "glm4moe.attention.head_count_kv": KV,
            "glm4moe.attention.key_length": HD,
            "glm4moe.feed_forward_length": DENSE_HID,
            "glm4moe.expert_feed_forward_length": MOE_HID,
            "glm4moe.context_length": 64,
            "glm4moe.attention.layer_norm_rms_epsilon": 1e-5,
            "glm4moe.rope.freq_base": 10000.0,
            "glm4moe.rope.dimension_count": HD // 2,
            "glm4moe.vocab_size": VOCAB,
            "glm4moe.expert_count": EXPERTS,
            "glm4moe.expert_used_count": TOPK,
            "glm4moe.expert_weights_scale": SCALE,
            "glm4moe.expert_weights_norm": 1,
            "glm4moe.expert_gating_func": 2,
            "glm4moe.expert_group_count": N_GROUP,
            "glm4moe.expert_group_used_count": TOPK_GROUP,
            "glm4moe.leading_dense_block_count": FIRST_DENSE,
        })
        params, cfg = C.gguf_to_glm4moe_params(p, bits=None,
                                               dtype=jnp.float32)
        assert cfg.qk_norm and cfg.partial_rotary_factor == 0.5
        assert cfg.moe_score_func == "sigmoid"
        assert cfg.moe_routed_scale == SCALE
        assert cfg.moe_n_groups == N_GROUP
        assert cfg.moe_first_dense == FIRST_DENSE
        n = SEQ
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:n], jnp.int32),
            jnp.int32(n), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[n - 1],
                                   rtol=2e-3, atol=2e-3)
        for j in range(2):
            logits, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[n + j])), cache)
            np.testing.assert_allclose(np.asarray(logits), ref[n + j],
                                       rtol=2e-3, atol=2e-3)
