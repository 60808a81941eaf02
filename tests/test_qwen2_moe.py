"""Qwen2-MoE correctness against the transformers oracle.

The Qwen2-MoE block extends Mixtral-style routing with two deltas this
framework must reproduce exactly: top-k router weights are NOT
renormalized (norm_topk_prob=False in the published configs), and an
always-active SHARED expert (sigmoid-gated by a scalar projection) adds
to the routed mixture. A tiny random-weight ``Qwen2MoeForCausalLM`` is
the ground truth through prefill and teacher-forced decode.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD = 1000, 64, 2, 4, 2, 16
MOE_HID, SHARED_HID, EXPERTS, TOPK = 48, 96, 4, 2
SEQ = 17


@pytest.fixture(scope="module")
def oracle():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    torch.manual_seed(3)
    hf_cfg = Qwen2MoeConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=128,
        moe_intermediate_size=MOE_HID,
        shared_expert_intermediate_size=SHARED_HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, num_experts=EXPERTS,
        num_experts_per_tok=TOPK, decoder_sparse_step=1,
        mlp_only_layers=[], norm_topk_prob=False,
        max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-6, use_sliding_window=False,
        router_aux_loss_coef=0.0)
    hf_cfg._attn_implementation = "eager"
    model = Qwen2MoeForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(4)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(torch.rand(p.shape, generator=gen) + 0.5)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 3),
                           generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


class TestQwen2Moe:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.qwen2_moe_from_hf(
            state, head_dim=HD, max_seq=64, rope_theta=10000.0,
            norm_eps=1e-6, n_experts_used=TOPK, dtype=jnp.float32)
        assert cfg.n_experts == EXPERTS
        assert cfg.moe_shared_hidden == SHARED_HID
        assert not cfg.moe_norm_topk
        assert cfg.qkv_bias
        assert params["layers"]["shared_gu"].shape == (
            LAYERS, DIM, 2 * SHARED_HID)
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

    def test_routed_matches_dense_with_shared(self, monkeypatch):
        """The sorted grouped-matmul path must stay exact with the
        shared expert and un-renormalized top-k weights in play."""
        cfg = llm_model.LLMConfig.tiny()._replace(
            n_experts=4, n_experts_used=2, moe_norm_topk=False,
            moe_shared_hidden=24)
        params = llm_model.init_params(jax.random.PRNGKey(6), cfg,
                                       dtype=jnp.float32)
        T = 48
        tokens = jax.random.randint(jax.random.PRNGKey(7), (T,), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        outs = {}
        for mode in ("0", "1"):
            monkeypatch.setenv("TRACKIE_MOE_ROUTED", mode)
            cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
            with jax.disable_jit():
                lg, _ = llm_model.prefill(params, cfg, tokens,
                                          jnp.int32(T), cache)
            outs[mode] = np.asarray(lg, np.float64)
        np.testing.assert_allclose(outs["1"], outs["0"],
                                   rtol=2e-4, atol=2e-4)

    def test_q8_requant_runs(self, oracle):
        """Per-expert + shared-expert Q8 requantization stays in the
        quantizer's error envelope (top-5 containment)."""
        from trackiellm_tpu.ops.quant import QuantizedLinear

        state, tokens, ref = oracle
        params, cfg = C.qwen2_moe_from_hf(
            state, head_dim=HD, max_seq=64, rope_theta=10000.0,
            norm_eps=1e-6, n_experts_used=TOPK, dtype=jnp.float32)
        qparams = llm_model.quantize_params(params, bits=8, group=16)
        assert isinstance(qparams["layers"]["shared_gu"], QuantizedLinear)
        cache = llm_model.KVCache.create(cfg)
        lg, _ = llm_model.prefill(
            qparams, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert np.isfinite(np.asarray(lg)).all()
        assert int(np.argmax(ref[SEQ - 1])) in np.argsort(
            np.asarray(lg))[-5:]


class TestQwen2MoeGGUF:
    def test_gguf_twin_matches_oracle(self, oracle, tmp_path):
        """The same weights through llama.cpp's qwen2moe GGUF layout:
        expert banks + *_shexp shared-expert tensors + the scalar
        ffn_gate_inp_shexp gate, with the arch's no-renorm routing and
        expert_feed_forward_length metadata."""
        from tests.test_loader import write_gguf
        from trackiellm_tpu.models import loader as L

        state, tokens, ref = oracle

        def t(name):
            return np.asarray(state[name], np.float32)

        tensors = {
            "token_embd.weight": (t("model.embed_tokens.weight"),
                                  L.GGML_F32),
            "output_norm.weight": (t("model.norm.weight"), L.GGML_F32),
            "output.weight": (t("lm_head.weight"), L.GGML_F32),
        }
        for i in range(LAYERS):
            hp, gp = f"model.layers.{i}", f"blk.{i}"
            tensors[f"{gp}.attn_norm.weight"] = (
                t(f"{hp}.input_layernorm.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_norm.weight"] = (
                t(f"{hp}.post_attention_layernorm.weight"), L.GGML_F32)
            for g, h in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                         ("attn_v", "v_proj")):
                tensors[f"{gp}.{g}.weight"] = (
                    t(f"{hp}.self_attn.{h}.weight"), L.GGML_F32)
                tensors[f"{gp}.{g}.bias"] = (
                    t(f"{hp}.self_attn.{h}.bias"), L.GGML_F32)
            tensors[f"{gp}.attn_output.weight"] = (
                t(f"{hp}.self_attn.o_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_gate_inp.weight"] = (
                t(f"{hp}.mlp.gate.weight"), L.GGML_F32)
            for g, h in (("gate", "gate_proj"), ("up", "up_proj"),
                         ("down", "down_proj")):
                tensors[f"{gp}.ffn_{g}_exps.weight"] = (np.stack(
                    [t(f"{hp}.mlp.experts.{e}.{h}.weight")
                     for e in range(EXPERTS)]), L.GGML_F32)
                tensors[f"{gp}.ffn_{g}_shexp.weight"] = (
                    t(f"{hp}.mlp.shared_expert.{h}.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_gate_inp_shexp.weight"] = (
                t(f"{hp}.mlp.shared_expert_gate.weight"), L.GGML_F32)
        p = str(tmp_path / "qwen2moe.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "qwen2moe",
            "qwen2moe.embedding_length": DIM,
            "qwen2moe.block_count": LAYERS,
            "qwen2moe.attention.head_count": HEADS,
            "qwen2moe.attention.head_count_kv": KV,
            "qwen2moe.attention.key_length": HD,
            "qwen2moe.feed_forward_length": 128,
            "qwen2moe.expert_feed_forward_length": MOE_HID,
            "qwen2moe.expert_shared_feed_forward_length": SHARED_HID,
            "qwen2moe.context_length": 64,
            "qwen2moe.attention.layer_norm_rms_epsilon": 1e-6,
            "qwen2moe.rope.freq_base": 10000.0,
            "qwen2moe.vocab_size": VOCAB,
            "qwen2moe.expert_count": EXPERTS,
            "qwen2moe.expert_used_count": TOPK,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.n_experts == EXPERTS
        assert cfg.hidden_dim == MOE_HID
        assert cfg.moe_shared_hidden == SHARED_HID
        assert not cfg.moe_norm_topk
        assert cfg.qkv_bias
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   rtol=2e-3, atol=2e-3)
        logits, cache = llm_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ])), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ],
                                   rtol=2e-3, atol=2e-3)


def test_published_preset_geometry():
    cfg = llm_model.LLMConfig.qwen15_moe_a27b()
    assert cfg.n_experts == 60 and cfg.n_experts_used == 4
    assert cfg.moe_shared_hidden == 5632 and not cfg.moe_norm_topk
    assert cfg.qkv_bias and cfg.dim == 2048


def test_cli_convert_qwen2moe_hf(tmp_path, oracle):
    """`python -m trackiellm_tpu convert --family qwen2moe-hf` round-
    trips the oracle's weights through the native checkpoint (bits 0 —
    the tiny dims don't divide the CLI's real-model quant group; Q8
    banks are covered by test_q8_requant_runs)."""
    from trackiellm_tpu.__main__ import main
    from trackiellm_tpu.models.checkpoint import load_checkpoint

    state, _, _ = oracle
    src = str(tmp_path / "qwen2moe_tiny.npz")
    np.savez(src, **state)
    out = str(tmp_path / "ckpt")
    rc = main(["convert", src, "-o", out, "--bits", "0",
               "--family", "qwen2moe-hf"])
    assert rc == 0
    params, cfg, meta = load_checkpoint(out)
    assert cfg.n_experts == EXPERTS and not cfg.moe_norm_topk
    assert cfg.moe_shared_hidden == SHARED_HID
    assert params["layers"]["w_gu"].ndim == 4
    assert params["layers"]["shared_gate"].shape == (LAYERS, DIM, 1)


def test_quantized_moe_checkpoint_roundtrip(tmp_path):
    """Q8 4D expert banks + shared expert survive the native checkpoint
    byte-exactly and the loaded params still run."""
    from trackiellm_tpu.models.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
    from trackiellm_tpu.ops.quant import QuantizedLinear

    cfg = llm_model.LLMConfig.tiny()._replace(
        n_experts=4, n_experts_used=2, moe_shared_hidden=32)
    params = llm_model.init_params(jax.random.PRNGKey(8), cfg,
                                   dtype=jnp.float32)
    q = llm_model.quantize_params(params, bits=8, group=16)
    d = str(tmp_path / "ck")
    save_checkpoint(d, q, config=cfg)
    p2, cfg2, _ = load_checkpoint(d)
    assert isinstance(p2["layers"]["w_gu"], QuantizedLinear)
    np.testing.assert_array_equal(
        np.asarray(q["layers"]["w_gu"].values),
        np.asarray(p2["layers"]["w_gu"].values))
    assert cfg2.moe_shared_hidden == 32
    cache = llm_model.KVCache.create(cfg2)
    lg, _ = llm_model.prefill(p2, cfg2, jnp.zeros((8,), jnp.int32),
                              jnp.int32(8), cache)
    assert np.isfinite(np.asarray(lg)).all()
