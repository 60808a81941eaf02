"""Granite family correctness against the transformers oracle.

A tiny random-weight ``GraniteForCausalLM`` (eager attention) is the
ground truth. Granite is Llama-shaped plus four muP-style scalar
multipliers (transformers configuration_granite.py:95-98). Three fold
at conversion (embedding_multiplier -> tok_emb, logits_scaling divides
lm_head, attention_multiplier -> query_pre_attn_scalar = m**-2); only
residual_multiplier runs at inference (both branch outputs scale
before their residual adds, modeling_granite.py:288,294). Reference
analogue: llama.cpp's granite arch behind the reference's loader
(src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 128, 64, 4, 4, 2, 16, 128
THETA = 10000.0
SEQ = 20
EMB_MULT, RES_MULT, ATT_MULT, LOGIT_SCALE = 3.0, 0.3, 0.125, 2.0


@pytest.fixture(scope="module")
def oracle():
    from transformers import GraniteConfig, GraniteForCausalLM

    torch.manual_seed(0)
    hf_cfg = GraniteConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, max_position_embeddings=64,
        rope_theta=THETA, rms_norm_eps=1e-6, attention_dropout=0.0,
        embedding_multiplier=EMB_MULT, residual_multiplier=RES_MULT,
        attention_multiplier=ATT_MULT, logits_scaling=LOGIT_SCALE,
        tie_word_embeddings=False, attention_bias=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hf_cfg._attn_implementation = "eager"
    model = GraniteForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
            elif "q_proj" in name or "k_proj" in name:
                # Fresh-init q/k give near-zero scores -> near-uniform
                # softmax, which would mask the attention-multiplier
                # knob; real-scale projections make it load-bearing.
                p.copy_(torch.randn(p.shape, generator=gen) * 0.15)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 4),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref_logits = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref_logits


def _convert_hf(state, **over):
    kw = dict(embedding_multiplier=EMB_MULT,
              residual_multiplier=RES_MULT,
              attention_multiplier=ATT_MULT,
              logits_scaling=LOGIT_SCALE,
              max_seq=64, norm_eps=1e-6, rope_theta=THETA,
              head_dim=HD, dtype=jnp.float32)
    kw.update(over)
    return C.granite_from_hf(state, **kw)


class TestGranite:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        assert cfg.n_heads == HEADS and cfg.n_kv_heads == KV
        assert cfg.residual_multiplier == RES_MULT
        assert cfg.query_pre_attn_scalar == ATT_MULT ** -2
        toks = jnp.asarray(tokens[:SEQ], jnp.int32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(params, cfg, toks,
                                          jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   rtol=2e-3, atol=2e-3)
        for j in range(4):
            logits, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
            np.testing.assert_allclose(
                np.asarray(logits), ref[SEQ + j],
                rtol=2e-3, atol=2e-3, err_msg=f"decode step {j}")

    def _last_prefill(self, params, cfg, tokens):
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        return np.asarray(logits)

    def test_residual_multiplier_load_bearing(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        good = self._last_prefill(params, cfg, tokens)
        np.testing.assert_allclose(good, ref[SEQ - 1], rtol=2e-3,
                                   atol=2e-3)
        # Fresh-init weights keep branch outputs small, so the wrong
        # config's absolute drift is modest (~2e-2) — assert it is an
        # order of magnitude above the correct config's error.
        good_err = np.abs(good - ref[SEQ - 1]).max()
        bad_cfg = cfg._replace(residual_multiplier=1.0)
        bad = self._last_prefill(params, bad_cfg, tokens)
        assert np.abs(bad - ref[SEQ - 1]).max() > max(10 * good_err,
                                                      0.01)

    def test_attention_multiplier_load_bearing(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        bad_cfg = cfg._replace(query_pre_attn_scalar=0.0)  # 1/sqrt(hd)
        bad = self._last_prefill(params, bad_cfg, tokens)
        assert np.abs(bad - ref[SEQ - 1]).max() > 0.01

    def test_gguf_roundtrip_matches_hf(self, oracle, tmp_path):
        """A synthetic granite GGUF (llama.cpp tensor names + the
        granite.* multiplier metadata) loads to the same logits as the
        HF conversion — folds included."""
        from tests.test_loader import permute_llama_qk, write_gguf

        state, tokens, ref = oracle
        hf_params, cfg = _convert_hf(state)

        tensors = {
            "token_embd.weight": (state["model.embed_tokens.weight"], 0),
            "output.weight": (state["lm_head.weight"], 0),
            "output_norm.weight": (state["model.norm.weight"], 0),
        }
        for i in range(LAYERS):
            pre = f"model.layers.{i}"
            blk = f"blk.{i}"
            tensors[f"{blk}.attn_norm.weight"] = (
                state[f"{pre}.input_layernorm.weight"], 0)
            tensors[f"{blk}.ffn_norm.weight"] = (
                state[f"{pre}.post_attention_layernorm.weight"], 0)
            for gg, hf in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                           ("attn_v", "v_proj"),
                           ("attn_output", "o_proj")):
                w = np.asarray(state[f"{pre}.self_attn.{hf}.weight"])
                if gg == "attn_q":
                    # Real granite GGUFs (convert_hf_to_gguf
                    # GraniteModel < LlamaModel) ship q/k permuted
                    # into ggml's NORM-rope layout.
                    w = permute_llama_qk(w, HEADS)
                elif gg == "attn_k":
                    w = permute_llama_qk(w, KV)
                tensors[f"{blk}.{gg}.weight"] = (w, 0)
            for gg, hf in (("ffn_gate", "gate_proj"),
                           ("ffn_up", "up_proj"),
                           ("ffn_down", "down_proj")):
                tensors[f"{blk}.{gg}.weight"] = (
                    state[f"{pre}.mlp.{hf}.weight"], 0)

        path = str(tmp_path / "granite.gguf")
        write_gguf(path, tensors, metadata={
            "general.architecture": "granite",
            "granite.embedding_length": DIM,
            "granite.block_count": LAYERS,
            "granite.attention.head_count": HEADS,
            "granite.attention.head_count_kv": KV,
            "granite.attention.key_length": HD,
            "granite.feed_forward_length": HID,
            "granite.attention.layer_norm_rms_epsilon": 1e-6,
            "granite.rope.freq_base": THETA,
            "granite.context_length": 64,
            "granite.embedding_scale": EMB_MULT,
            "granite.residual_scale": RES_MULT,
            "granite.attention.scale": ATT_MULT,
            "granite.logit_scale": LOGIT_SCALE,
        })

        params, gcfg = C.gguf_to_llm_params(path, bits=None,
                                            dtype=jnp.float32)
        assert abs(gcfg.residual_multiplier - RES_MULT) < 1e-6
        assert abs(gcfg.query_pre_attn_scalar - ATT_MULT ** -2) < 1e-3
        got = self._last_prefill(params, gcfg, tokens)
        np.testing.assert_allclose(got, ref[SEQ - 1], rtol=2e-3,
                                   atol=2e-3)
