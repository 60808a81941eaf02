"""Cohere Command-R family against the transformers oracles.

CohereForCausalLM (Command-R/R+): bias-free mean-subtracting
LayerNorm, PARALLEL residual (attention and MLP read the same
input_layernorm; CohereDecoderLayer adds both branches to one
residual), logit_scale multiplier (folded into the tied lm_head),
INTERLEAVED full-width rope (folded to split-half at conversion), and
Command-R+'s per-head QK LayerNorms (weights permuted along with the
fold — exact: mean/var over head_dim are permutation-invariant).

Cohere2ForCausalLM (Command-R7B): adds sliding_window_pattern — every
pattern-th layer is GLOBAL and rope applies ONLY on sliding layers,
mapped to window_pattern + nope_pattern at the same phase.

Reference analogue: llama.cpp's command-r / cohere2 arches behind the
reference's loader (src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 128, 64, 4, 4, 2, 16, 96
THETA = 10000.0
SEQ = 18
LOGIT_SCALE = 0.25


def _rand(model, seed):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name.lower():
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
            elif "q_proj" in name or "k_proj" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.15)


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


class TestCommandR:
    @pytest.fixture(scope="class")
    def oracle(self):
        from transformers import CohereConfig, CohereForCausalLM

        torch.manual_seed(0)
        hf_cfg = CohereConfig(
            vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV, max_position_embeddings=64,
            rope_theta=THETA, layer_norm_eps=1e-5,
            logit_scale=LOGIT_SCALE, use_qk_norm=True,
            attention_bias=False, attention_dropout=0.0,
            tie_word_embeddings=True,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        hf_cfg._attn_implementation = "eager"
        model = CohereForCausalLM(hf_cfg).eval()
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
        params, cfg = C.cohere_from_hf(
            state, max_seq=64, norm_eps=1e-5, rope_theta=THETA,
            logit_scale=LOGIT_SCALE, head_dim=HD, dtype=jnp.float32)
        assert cfg.parallel_residual and cfg.norm_type == "layernorm"
        assert cfg.qk_norm
        _check(params, cfg, tokens, ref)

    def test_parallel_residual_load_bearing(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.cohere_from_hf(
            state, max_seq=64, rope_theta=THETA,
            logit_scale=LOGIT_SCALE, head_dim=HD, dtype=jnp.float32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        good, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        good_err = np.abs(np.asarray(good) - ref[SEQ - 1]).max()
        bad_cfg = cfg._replace(parallel_residual=False)
        cache = llm_model.KVCache.create(bad_cfg, dtype=jnp.float32)
        bad, _ = llm_model.prefill(
            params, bad_cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert np.abs(np.asarray(bad) - ref[SEQ - 1]).max() \
            > max(100 * good_err, 2e-3)

    def test_gguf_roundtrip_matches_hf(self, oracle, tmp_path):
        """Synthetic command-r GGUF (raw INTERLEAVED q/k + per-head
        norms, logit_scale metadata, tied embeddings, no ffn_norm)."""
        from tests.test_loader import write_gguf

        state, tokens, ref = oracle
        tensors = {
            "token_embd.weight": (state["model.embed_tokens.weight"], 0),
            "output_norm.weight": (state["model.norm.weight"], 0),
        }
        for i in range(LAYERS):
            pre = f"model.layers.{i}"
            blk = f"blk.{i}"
            tensors[f"{blk}.attn_norm.weight"] = (
                state[f"{pre}.input_layernorm.weight"], 0)
            for gg, hf in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                           ("attn_v", "v_proj"),
                           ("attn_output", "o_proj")):
                tensors[f"{blk}.{gg}.weight"] = (
                    state[f"{pre}.self_attn.{hf}.weight"], 0)
            tensors[f"{blk}.attn_q_norm.weight"] = (
                state[f"{pre}.self_attn.q_norm.weight"].reshape(-1), 0)
            tensors[f"{blk}.attn_k_norm.weight"] = (
                state[f"{pre}.self_attn.k_norm.weight"].reshape(-1), 0)
            for gg, hf in (("ffn_gate", "gate_proj"),
                           ("ffn_up", "up_proj"),
                           ("ffn_down", "down_proj")):
                tensors[f"{blk}.{gg}.weight"] = (
                    state[f"{pre}.mlp.{hf}.weight"], 0)

        path = str(tmp_path / "commandr.gguf")
        write_gguf(path, tensors, metadata={
            "general.architecture": "command-r",
            "command-r.embedding_length": DIM,
            "command-r.block_count": LAYERS,
            "command-r.attention.head_count": HEADS,
            "command-r.attention.head_count_kv": KV,
            "command-r.attention.key_length": HD,
            "command-r.feed_forward_length": HID,
            "command-r.attention.layer_norm_epsilon": 1e-5,
            "command-r.rope.freq_base": THETA,
            "command-r.context_length": 64,
            "command-r.logit_scale": LOGIT_SCALE,
        })
        params, gcfg = C.gguf_to_llm_params(path, bits=None,
                                            dtype=jnp.float32)
        assert gcfg.parallel_residual and gcfg.qk_norm
        assert gcfg.norm_type == "layernorm"
        _check(params, gcfg, tokens, ref)


class TestCohere2:
    @pytest.fixture(scope="class")
    def oracle(self):
        from transformers import Cohere2Config, Cohere2ForCausalLM

        torch.manual_seed(5)
        hf_cfg = Cohere2Config(
            vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV, max_position_embeddings=64,
            rope_theta=THETA, layer_norm_eps=1e-5,
            logit_scale=LOGIT_SCALE,
            sliding_window=8, sliding_window_pattern=2,
            attention_bias=False, attention_dropout=0.0,
            tie_word_embeddings=True,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        hf_cfg._attn_implementation = "eager"
        model = Cohere2ForCausalLM(hf_cfg).eval()
        _rand(model, 6)
        tokens = torch.randint(
            0, VOCAB, (1, SEQ + 3),
            generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return state, tokens[0].numpy(), ref

    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.cohere_from_hf(
            state, max_seq=64, norm_eps=1e-5, rope_theta=THETA,
            logit_scale=LOGIT_SCALE, sliding_window=8,
            sliding_window_pattern=2, head_dim=HD, dtype=jnp.float32)
        assert cfg.window_pattern == 2 and cfg.nope_pattern == 2
        assert cfg.sliding_window == 8
        _check(params, cfg, tokens, ref)

    def test_pattern_load_bearing(self, oracle):
        """Dropping the NoPE/window pattern (rope+global everywhere)
        must diverge — the sliding window binds inside SEQ=18."""
        state, tokens, ref = oracle
        params, cfg = C.cohere_from_hf(
            state, max_seq=64, rope_theta=THETA,
            logit_scale=LOGIT_SCALE, sliding_window=8,
            sliding_window_pattern=2, head_dim=HD, dtype=jnp.float32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        good, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        good_err = np.abs(np.asarray(good) - ref[SEQ - 1]).max()
        bad_cfg = cfg._replace(window_pattern=0, nope_pattern=0,
                               sliding_window=cfg.max_seq)
        cache = llm_model.KVCache.create(bad_cfg, dtype=jnp.float32)
        bad, _ = llm_model.prefill(
            params, bad_cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert np.abs(np.asarray(bad) - ref[SEQ - 1]).max() \
            > max(100 * good_err, 2e-3)
