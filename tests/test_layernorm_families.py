"""Nemotron + StarCoder2 — the LayerNorm-family arches — against their
transformers oracles.

Both diverge from the Llama template in the same direction: a
mean-subtracting LayerNorm with bias instead of RMSNorm
(cfg.norm_type="layernorm", norm params become {"g","b"} dicts), and
an UNGATED MLP (cfg.mlp_gated=False). Nemotron adds the LayerNorm1p
(1+w) convention — folded at conversion — squared-ReLU activation and
half-width split-half rope; StarCoder2 adds biases on every attention
projection and the tanh-GELU MLP (c_fc/c_proj). Reference analogue:
llama.cpp's nemotron/starcoder2 arches behind the reference's loader
(src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 128, 64, 3, 4, 2, 16, 96
THETA = 10000.0
SEQ = 18


def _rand_norms_and_qk(model, seed=1):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name.lower() and name.endswith("weight"):
                p.copy_(torch.randn(p.shape, generator=gen) * 0.2
                        + (0.0 if "layernorm" in type(model).__module__
                           else 0.0) + 1.0)
            elif "norm" in name.lower() and name.endswith("bias"):
                p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
            elif "q_proj" in name or "k_proj" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.15)


def _check_against(model, params, cfg, tokens, ref):
    toks = jnp.asarray(tokens[:SEQ], jnp.int32)
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    logits, cache = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
    np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)
    for j in range(3):
        logits, cache = llm_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"decode step {j}")


class TestNemotron:
    @pytest.fixture(scope="class")
    def oracle(self):
        from transformers import NemotronConfig, NemotronForCausalLM

        torch.manual_seed(0)
        hf_cfg = NemotronConfig(
            vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV, head_dim=HD,
            max_position_embeddings=64, rope_theta=THETA,
            partial_rotary_factor=0.5, hidden_act="relu2",
            norm_eps=1e-5, attention_bias=False, mlp_bias=False,
            attention_dropout=0.0, tie_word_embeddings=False,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        hf_cfg._attn_implementation = "eager"
        model = NemotronForCausalLM(hf_cfg).eval()
        _rand_norms_and_qk(model)
        tokens = torch.randint(
            0, VOCAB, (1, SEQ + 3),
            generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return model, state, tokens[0].numpy(), ref

    def test_hf_convert_matches_oracle(self, oracle):
        _, state, tokens, ref = oracle
        params, cfg = C.nemotron_from_hf(
            state, max_seq=64, norm_eps=1e-5, rope_theta=THETA,
            partial_rotary_factor=0.5, head_dim=HD, dtype=jnp.float32)
        assert cfg.norm_type == "layernorm" and not cfg.mlp_gated
        assert cfg.act == "relu2"
        assert cfg.partial_rotary_factor == 0.5
        assert isinstance(params["layers"]["attn_norm"], dict)
        _check_against(None, params, cfg, tokens, ref)

    def test_relu2_and_norm1p_load_bearing(self, oracle):
        """Swapping to gated-silu semantics or RMS norms must diverge."""
        _, state, tokens, ref = oracle
        params, cfg = C.nemotron_from_hf(
            state, max_seq=64, rope_theta=THETA, head_dim=HD,
            dtype=jnp.float32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        good, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        good_err = np.abs(np.asarray(good) - ref[SEQ - 1]).max()

        for bad_cfg in (cfg._replace(act="gelu"),
                        cfg._replace(norm_type="rms")):
            cache = llm_model.KVCache.create(bad_cfg, dtype=jnp.float32)
            bad, _ = llm_model.prefill(
                params, bad_cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
                jnp.int32(SEQ), cache)
            assert np.abs(np.asarray(bad) - ref[SEQ - 1]).max() \
                > max(100 * good_err, 2e-3)

    def test_gguf_roundtrip_matches_hf(self, oracle, tmp_path):
        """Synthetic nemotron GGUF (1+w pre-folded like
        convert_hf_to_gguf bakes it, norm biases as tensors, ungated
        ffn_up) == the HF conversion."""
        from tests.test_loader import write_gguf

        _, state, tokens, ref = oracle
        tensors = {
            "token_embd.weight": (state["model.embed_tokens.weight"], 0),
            "output.weight": (state["lm_head.weight"], 0),
            "output_norm.weight": (1.0 + state["model.norm.weight"], 0),
            "output_norm.bias": (state["model.norm.bias"], 0),
        }
        for i in range(LAYERS):
            pre = f"model.layers.{i}"
            blk = f"blk.{i}"
            tensors[f"{blk}.attn_norm.weight"] = (
                1.0 + state[f"{pre}.input_layernorm.weight"], 0)
            tensors[f"{blk}.attn_norm.bias"] = (
                state[f"{pre}.input_layernorm.bias"], 0)
            tensors[f"{blk}.ffn_norm.weight"] = (
                1.0 + state[f"{pre}.post_attention_layernorm.weight"], 0)
            tensors[f"{blk}.ffn_norm.bias"] = (
                state[f"{pre}.post_attention_layernorm.bias"], 0)
            for gg, hf in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                           ("attn_v", "v_proj"),
                           ("attn_output", "o_proj")):
                tensors[f"{blk}.{gg}.weight"] = (
                    state[f"{pre}.self_attn.{hf}.weight"], 0)
            tensors[f"{blk}.ffn_up.weight"] = (
                state[f"{pre}.mlp.up_proj.weight"], 0)
            tensors[f"{blk}.ffn_down.weight"] = (
                state[f"{pre}.mlp.down_proj.weight"], 0)

        path = str(tmp_path / "nemotron.gguf")
        write_gguf(path, tensors, metadata={
            "general.architecture": "nemotron",
            "nemotron.embedding_length": DIM,
            "nemotron.block_count": LAYERS,
            "nemotron.attention.head_count": HEADS,
            "nemotron.attention.head_count_kv": KV,
            "nemotron.attention.key_length": HD,
            "nemotron.feed_forward_length": HID,
            "nemotron.attention.layer_norm_epsilon": 1e-5,
            "nemotron.rope.freq_base": THETA,
            "nemotron.rope.dimension_count": HD // 2,
            "nemotron.context_length": 64,
        })
        params, gcfg = C.gguf_to_llm_params(path, bits=None,
                                            dtype=jnp.float32)
        assert gcfg.norm_type == "layernorm" and not gcfg.mlp_gated
        assert gcfg.act == "relu2"
        assert abs(gcfg.partial_rotary_factor - 0.5) < 1e-6
        _check_against(None, params, gcfg, tokens, ref)


class TestStarCoder2:
    @pytest.fixture(scope="class")
    def oracle(self):
        from transformers import Starcoder2Config, Starcoder2ForCausalLM

        torch.manual_seed(3)
        hf_cfg = Starcoder2Config(
            vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV,
            max_position_embeddings=64, rope_theta=THETA,
            hidden_act="gelu_pytorch_tanh", norm_epsilon=1e-5,
            use_bias=True, sliding_window=None, attention_dropout=0.0,
            residual_dropout=0.0, embedding_dropout=0.0,
            tie_word_embeddings=True,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        hf_cfg._attn_implementation = "eager"
        model = Starcoder2ForCausalLM(hf_cfg).eval()
        _rand_norms_and_qk(model, seed=4)
        tokens = torch.randint(
            0, VOCAB, (1, SEQ + 3),
            generator=torch.Generator().manual_seed(5))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return model, state, tokens[0].numpy(), ref

    def test_hf_convert_matches_oracle(self, oracle):
        _, state, tokens, ref = oracle
        params, cfg = C.starcoder2_from_hf(
            state, max_seq=64, norm_eps=1e-5, rope_theta=THETA,
            head_dim=HD, dtype=jnp.float32)
        assert cfg.norm_type == "layernorm" and not cfg.mlp_gated
        assert cfg.qkv_bias and cfg.out_bias and cfg.mlp_bias
        _check_against(None, params, cfg, tokens, ref)

    def test_gguf_roundtrip_matches_hf(self, oracle, tmp_path):
        from tests.test_loader import write_gguf

        _, state, tokens, ref = oracle
        emb = state["model.embed_tokens.weight"]
        tensors = {
            "token_embd.weight": (emb, 0),   # tied: no output.weight
            "output_norm.weight": (state["model.norm.weight"], 0),
            "output_norm.bias": (state["model.norm.bias"], 0),
        }
        for i in range(LAYERS):
            pre = f"model.layers.{i}"
            blk = f"blk.{i}"
            tensors[f"{blk}.attn_norm.weight"] = (
                state[f"{pre}.input_layernorm.weight"], 0)
            tensors[f"{blk}.attn_norm.bias"] = (
                state[f"{pre}.input_layernorm.bias"], 0)
            tensors[f"{blk}.ffn_norm.weight"] = (
                state[f"{pre}.post_attention_layernorm.weight"], 0)
            tensors[f"{blk}.ffn_norm.bias"] = (
                state[f"{pre}.post_attention_layernorm.bias"], 0)
            for gg, hf in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                           ("attn_v", "v_proj"),
                           ("attn_output", "o_proj")):
                tensors[f"{blk}.{gg}.weight"] = (
                    state[f"{pre}.self_attn.{hf}.weight"], 0)
                tensors[f"{blk}.{gg}.bias"] = (
                    state[f"{pre}.self_attn.{hf}.bias"], 0)
            tensors[f"{blk}.ffn_up.weight"] = (
                state[f"{pre}.mlp.c_fc.weight"], 0)
            tensors[f"{blk}.ffn_up.bias"] = (
                state[f"{pre}.mlp.c_fc.bias"], 0)
            tensors[f"{blk}.ffn_down.weight"] = (
                state[f"{pre}.mlp.c_proj.weight"], 0)
            tensors[f"{blk}.ffn_down.bias"] = (
                state[f"{pre}.mlp.c_proj.bias"], 0)

        path = str(tmp_path / "starcoder2.gguf")
        write_gguf(path, tensors, metadata={
            "general.architecture": "starcoder2",
            "starcoder2.embedding_length": DIM,
            "starcoder2.block_count": LAYERS,
            "starcoder2.attention.head_count": HEADS,
            "starcoder2.attention.head_count_kv": KV,
            "starcoder2.attention.key_length": HD,
            "starcoder2.feed_forward_length": HID,
            "starcoder2.attention.layer_norm_epsilon": 1e-5,
            "starcoder2.rope.freq_base": THETA,
            "starcoder2.context_length": 64,
        })
        params, gcfg = C.gguf_to_llm_params(path, bits=None,
                                            dtype=jnp.float32)
        assert gcfg.norm_type == "layernorm" and gcfg.mlp_bias
        assert gcfg.qkv_bias and gcfg.out_bias
        _check_against(None, params, gcfg, tokens, ref)
