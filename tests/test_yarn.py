"""YaRN / linear rope-scaling correctness against transformers.

The reference serves long-context GGUFs through llama.cpp, which
derives the rope interpolation from the ``rope.scaling.*`` metadata
keys (type/factor/original_context_length) at rope time. Here the same
keys become a static per-frequency divisor vector
(``params["rope_factors"]`` — the mechanism Llama-3.1 factor tensors
already use) plus the YaRN attention mscale on
``cfg.rope_attention_factor``. Ground truth is transformers'
``_compute_yarn_parameters`` (the published YaRN recipe) and a tiny
``LlamaForCausalLM`` evaluated PAST the original context length, so a
wrong ramp cannot hide inside the pretraining window.
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.test_loader import permute_llama_qk, write_gguf
from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.models import loader as L

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HID = 512, 64, 2, 4, 2, 128
HD = DIM // HEADS
ORIG_CTX, FACTOR = 16, 4.0
MAX_CTX = int(ORIG_CTX * FACTOR)
SEQ = 29  # > ORIG_CTX: exercises the extended band


def _hf_model(rope_scaling):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(20)
    hf_cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, max_position_embeddings=MAX_CTX,
        rope_theta=10000.0, rms_norm_eps=1e-6, attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False,
        rope_scaling=rope_scaling)
    hf_cfg._attn_implementation = "eager"
    return LlamaForCausalLM(hf_cfg).eval()


def _gguf_twin(tmp_path, model, scaling_md):
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    def t(name):
        return np.asarray(state[name], np.float32)

    tensors = {
        "token_embd.weight": (t("model.embed_tokens.weight"), L.GGML_F32),
        "output_norm.weight": (t("model.norm.weight"), L.GGML_F32),
        "output.weight": (t("lm_head.weight"), L.GGML_F32),
    }
    for i in range(LAYERS):
        hp, gp = f"model.layers.{i}", f"blk.{i}"
        tensors[f"{gp}.attn_norm.weight"] = (
            t(f"{hp}.input_layernorm.weight"), L.GGML_F32)
        tensors[f"{gp}.ffn_norm.weight"] = (
            t(f"{hp}.post_attention_layernorm.weight"), L.GGML_F32)
        for g, h in (("attn_q", "self_attn.q_proj"),
                     ("attn_k", "self_attn.k_proj"),
                     ("attn_v", "self_attn.v_proj"),
                     ("attn_output", "self_attn.o_proj"),
                     ("ffn_gate", "mlp.gate_proj"),
                     ("ffn_up", "mlp.up_proj"),
                     ("ffn_down", "mlp.down_proj")):
            w = t(f"{hp}.{h}.weight")
            if g in ("attn_q", "attn_k"):
                # Real llama-arch GGUFs carry q/k PERMUTED into ggml's
                # NORM-rope layout (convert_hf_to_gguf LlamaModel).
                w = permute_llama_qk(w, HEADS if g == "attn_q" else KV)
            tensors[f"{gp}.{g}.weight"] = (w, L.GGML_F32)
    p = str(tmp_path / "yarn.gguf")
    write_gguf(p, tensors, metadata={
        "general.architecture": "llama",
        "llama.embedding_length": DIM,
        "llama.block_count": LAYERS,
        "llama.attention.head_count": HEADS,
        "llama.attention.head_count_kv": KV,
        "llama.feed_forward_length": HID,
        "llama.context_length": MAX_CTX,
        "llama.attention.layer_norm_rms_epsilon": 1e-6,
        "llama.rope.freq_base": 10000.0,
        "llama.vocab_size": VOCAB,
        **scaling_md,
    })
    return p


def _oracle_logits(model):
    tokens = torch.randint(0, VOCAB, (1, SEQ + 3),
                           generator=torch.Generator().manual_seed(21))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    return tokens[0].numpy(), ref


def _assert_matches(params, cfg, tokens, ref, steps=3):
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    logits, cache = llm_model.prefill(
        params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
        jnp.int32(SEQ), cache)
    np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)
    for j in range(steps):
        logits, cache = llm_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"decode step {j}")


class TestYarnFactors:
    def test_divisors_match_transformers_inv_freq(self):
        """yarn_rope_factors reproduces _compute_yarn_parameters
        exactly: ours divides the base freqs, theirs returns the
        scaled inv_freq directly."""
        from transformers import LlamaConfig
        from transformers.modeling_rope_utils import (
            _compute_yarn_parameters)

        for theta, hd, orig, factor in ((10000.0, 16, 16, 4.0),
                                        (1e6, 128, 32768, 4.0),
                                        (10000.0, 64, 2048, 16.0)):
            hf_cfg = LlamaConfig(
                hidden_size=hd * 4, num_attention_heads=4,
                head_dim=hd, rope_theta=theta,
                max_position_embeddings=int(orig * factor),
                rope_scaling={
                    "rope_type": "yarn", "factor": factor,
                    "original_max_position_embeddings": orig})
            inv_hf, att_hf = _compute_yarn_parameters(hf_cfg, "cpu")
            cfg = llm_model.LLMConfig.tiny()._replace(
                head_dim=hd, rope_theta=theta)
            div = llm_model.yarn_rope_factors(cfg, factor, orig)
            inv_ours = np.asarray(llm_model._rope_freqs(cfg)) / np.asarray(div)
            np.testing.assert_allclose(inv_ours, inv_hf.numpy(),
                                       rtol=1e-6,
                                       err_msg=f"theta={theta} hd={hd}")
            assert math.isclose(
                llm_model.yarn_attention_factor(factor), att_hf,
                rel_tol=1e-9)

    def test_unscaled_band_preserved(self):
        """High-frequency dims (fast rotations) keep divisor 1; the
        lowest frequencies approach the full factor."""
        cfg = llm_model.LLMConfig.tiny()._replace(head_dim=128,
                                                  rope_theta=1e6)
        d = np.asarray(llm_model.yarn_rope_factors(cfg, 8.0, 32768))
        assert d[0] == pytest.approx(1.0)
        assert d[-1] == pytest.approx(8.0, rel=1e-6)
        assert np.all(np.diff(d) >= -1e-6)


class TestYarnGGUF:
    def test_yarn_gguf_matches_hf_oracle(self, tmp_path):
        model = _hf_model({"rope_type": "yarn", "factor": FACTOR,
                           "original_max_position_embeddings": ORIG_CTX})
        tokens, ref = _oracle_logits(model)
        p = _gguf_twin(tmp_path, model, {
            "llama.rope.scaling.type": "yarn",
            "llama.rope.scaling.factor": FACTOR,
            "llama.rope.scaling.original_context_length": ORIG_CTX,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert "rope_factors" in params
        assert cfg.rope_attention_factor == pytest.approx(
            llm_model.yarn_attention_factor(FACTOR))
        _assert_matches(params, cfg, tokens, ref)

    def test_linear_gguf_matches_hf_oracle(self, tmp_path):
        model = _hf_model({"rope_type": "linear", "factor": FACTOR})
        tokens, ref = _oracle_logits(model)
        p = _gguf_twin(tmp_path, model, {
            "llama.rope.scaling.type": "linear",
            "llama.rope.scaling.factor": FACTOR,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(params["rope_factors"]),
                                   FACTOR)
        assert cfg.rope_attention_factor == 1.0
        _assert_matches(params, cfg, tokens, ref)

    def test_no_scaling_keys_leave_params_alone(self, tmp_path):
        model = _hf_model(None)
        tokens, ref = _oracle_logits(model)
        p = _gguf_twin(tmp_path, model, {})
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert "rope_factors" not in params
        _assert_matches(params, cfg, tokens, ref)
