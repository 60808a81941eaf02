"""GLM-4 family correctness against the transformers oracle.

A tiny random-weight ``Glm4ForCausalLM`` (eager attention) is the
ground truth. GLM-4's deltas over Llama: QKV biases, Gemma-2-style
sandwich norms (post_self_attn/post_mlp layernorms on the branch
outputs, modeling_glm4.py:104-111), fused gate_up MLP, and a
half-width INTERLEAVED rope (rotate_half pairs (0,1),(2,3)...,
modeling_glm4.py:153-199). The interleave folds into the q/k column
order at conversion (scores are invariant to a common q/k head-dim
permutation); the partial width runs as cfg.partial_rotary_factor —
apply_rope rotates only 2*len(freqs) leading dims. Reference analogue:
llama.cpp's glm4 arch (rope type NORM) behind the reference's loader
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
PARTIAL = 0.5


@pytest.fixture(scope="module")
def oracle():
    from transformers import Glm4Config, Glm4ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Glm4Config(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD,
        max_position_embeddings=64, rope_theta=THETA,
        partial_rotary_factor=PARTIAL, attention_bias=True,
        attention_dropout=0.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hf_cfg._attn_implementation = "eager"
    model = Glm4ForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
            elif "q_proj" in name or "k_proj" in name:
                # Real-scale projections so the rope layout/width are
                # load-bearing (near-init scores mask them).
                p.copy_(torch.randn(p.shape, generator=gen) * 0.15)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 4),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref_logits = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref_logits


def _convert_hf(state):
    return C.glm4_from_hf(state, max_seq=64, norm_eps=1e-6,
                          rope_theta=THETA,
                          partial_rotary_factor=PARTIAL,
                          head_dim=HD, dtype=jnp.float32)


class TestGLM4:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        assert cfg.qkv_bias and cfg.post_norms
        assert cfg.partial_rotary_factor == PARTIAL
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

    def test_partial_width_load_bearing(self, oracle):
        """Full-width rope (factor 1.0) must diverge — proves the
        pass-through half actually passes through."""
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        good = self._last_prefill(params, cfg, tokens)
        good_err = np.abs(good - ref[SEQ - 1]).max()
        bad = self._last_prefill(
            params, cfg._replace(partial_rotary_factor=1.0), tokens)
        assert np.abs(bad - ref[SEQ - 1]).max() > max(10 * good_err,
                                                      0.01)

    def test_interleave_fold_load_bearing(self, oracle):
        """Skipping the q/k column permutation (i.e. treating the
        checkpoint as split-half) must diverge."""
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        # Rebuild WITHOUT the deinterleave by permuting back q/k and
        # NOT the rope: simplest is converting with the identity fold —
        # emulate by re-interleaving the q/k columns of the converted
        # weights (undoes the fold).
        import numpy as _np

        wqkv = _np.asarray(params["layers"]["wqkv"])
        rot = int(HD * PARTIAL)

        def reinterleave(block, heads):
            cols = block.reshape(block.shape[0], block.shape[1],
                                 heads, HD)
            r = cols[..., :rot].copy()
            inter = _np.empty_like(r)
            inter[..., 0::2] = r[..., :rot // 2]
            inter[..., 1::2] = r[..., rot // 2:]
            cols = _np.concatenate([inter, cols[..., rot:]], axis=-1)
            return cols.reshape(block.shape)

        qw = reinterleave(wqkv[:, :, :HEADS * HD], HEADS)
        kw = reinterleave(wqkv[:, :, HEADS * HD:(HEADS + KV) * HD], KV)
        bad_wqkv = _np.concatenate(
            [qw, kw, wqkv[:, :, (HEADS + KV) * HD:]], axis=-1)
        bad_params = dict(params)
        bad_params["layers"] = dict(params["layers"],
                                    wqkv=jnp.asarray(bad_wqkv))
        bad = self._last_prefill(bad_params, cfg, tokens)
        good = self._last_prefill(params, cfg, tokens)
        good_err = np.abs(good - ref[SEQ - 1]).max()
        assert np.abs(bad - ref[SEQ - 1]).max() > max(10 * good_err,
                                                      0.01)

    def test_gguf_roundtrip_matches_hf(self, oracle, tmp_path):
        """A synthetic glm4 GGUF (llama.cpp tensor names: fused ffn_up,
        Gemma-2-named sandwich norms, raw INTERLEAVED q/k, rope
        dimension_count) loads to the same logits as the HF path."""
        from tests.test_loader import write_gguf

        state, tokens, ref = oracle
        _, cfg = _convert_hf(state)

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
            tensors[f"{blk}.post_attention_norm.weight"] = (
                state[f"{pre}.post_self_attn_layernorm.weight"], 0)
            tensors[f"{blk}.post_ffw_norm.weight"] = (
                state[f"{pre}.post_mlp_layernorm.weight"], 0)
            for gg, hf in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                           ("attn_v", "v_proj")):
                tensors[f"{blk}.{gg}.weight"] = (
                    state[f"{pre}.self_attn.{hf}.weight"], 0)
                tensors[f"{blk}.{gg}.bias"] = (
                    state[f"{pre}.self_attn.{hf}.bias"], 0)
            tensors[f"{blk}.attn_output.weight"] = (
                state[f"{pre}.self_attn.o_proj.weight"], 0)
            tensors[f"{blk}.ffn_up.weight"] = (
                state[f"{pre}.mlp.gate_up_proj.weight"], 0)
            tensors[f"{blk}.ffn_down.weight"] = (
                state[f"{pre}.mlp.down_proj.weight"], 0)

        path = str(tmp_path / "glm4.gguf")
        write_gguf(path, tensors, metadata={
            "general.architecture": "glm4",
            "glm4.embedding_length": DIM,
            "glm4.block_count": LAYERS,
            "glm4.attention.head_count": HEADS,
            "glm4.attention.head_count_kv": KV,
            "glm4.attention.key_length": HD,
            "glm4.feed_forward_length": HID,
            "glm4.attention.layer_norm_rms_epsilon": 1e-6,
            "glm4.rope.freq_base": THETA,
            "glm4.rope.dimension_count": int(HD * PARTIAL),
            "glm4.context_length": 64,
        })

        params, gcfg = C.gguf_to_llm_params(path, bits=None,
                                            dtype=jnp.float32)
        assert gcfg.qkv_bias and gcfg.post_norms
        assert abs(gcfg.partial_rotary_factor - PARTIAL) < 1e-6
        got = self._last_prefill(params, gcfg, tokens)
        np.testing.assert_allclose(got, ref[SEQ - 1], rtol=2e-3,
                                   atol=2e-3)
