"""OLMo-2 family correctness against the transformers oracle.

A tiny random-weight ``Olmo2ForCausalLM`` (eager attention) is the
ground truth. OLMo-2's two deltas vs Llama (transformers
modeling_olmo2.py:149-150, 250-256): post-norm-only placement — the
attention/MLP branches consume the residual stream RAW and their
outputs are RMSNormed before the residual adds (``pre_norms=False`` +
``post_norms=True``) — and Q/K RMSNorm over the WHOLE projection
(size H*head_dim, applied before the head reshape and before rope;
``qk_norm_full``). Both ingestion paths are validated: the HF state
dict (``convert.olmo2_from_hf``) and a synthetic GGUF in llama.cpp's
olmo2 layout (attn_{q,k}_norm + post_attention_norm/post_ffw_norm, no
attn_norm/ffn_norm). Reference analogue: llama.cpp's olmo2 arch behind
the reference's loader (src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.test_loader import write_gguf
from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.models import loader as L

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HID = 128, 64, 4, 4, 2, 128
HD = DIM // HEADS  # 16 — OLMo-2 keeps the Llama head_dim convention
THETA = 10000.0
SEQ = 20


@pytest.fixture(scope="module")
def oracle():
    from transformers import Olmo2Config, Olmo2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Olmo2Config(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, max_position_embeddings=64,
        rope_theta=THETA, rms_norm_eps=1e-6, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2)
    hf_cfg._attn_implementation = "eager"
    model = Olmo2ForCausalLM(hf_cfg).eval()
    # Randomize every RMSNorm (incl. the full-projection q/k norms) so
    # placement and shape errors can't hide behind unit weights.
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 4),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref_logits = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref_logits


def _assert_matches(params, cfg, tokens, ref_logits):
    toks = jnp.asarray(tokens[:SEQ], jnp.int32)
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    logits, cache = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
    np.testing.assert_allclose(np.asarray(logits), ref_logits[SEQ - 1],
                               rtol=2e-3, atol=2e-3)
    for j in range(4):
        logits, cache = llm_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits[SEQ + j],
            rtol=2e-3, atol=2e-3, err_msg=f"decode step {j}")


class TestOlmo2:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.olmo2_from_hf(state, max_seq=64,
                                      rope_theta=THETA,
                                      dtype=jnp.float32)
        # The tiny fixture's q_proj rows (64) aren't divisible by the
        # published head_dim 128; re-derive the geometry explicitly.
        assert cfg.pre_norms is False and cfg.post_norms is True
        assert cfg.qk_norm_full is True
        cfg = cfg._replace(n_heads=HEADS, n_kv_heads=KV, head_dim=HD)
        _assert_matches(params, cfg, tokens, ref)

    def test_gguf_convert_matches_oracle(self, oracle, tmp_path):
        """llama.cpp olmo2 layout: NO attn_norm/ffn_norm tensors; the
        sandwich names carry the post-norms; attn_{q,k}_norm are the
        full-projection weights."""
        state, tokens, ref = oracle

        def t(name):
            return np.asarray(state[name], np.float32)

        tensors = {
            "token_embd.weight": (t("model.embed_tokens.weight"),
                                  L.GGML_F32),
            "output.weight": (t("lm_head.weight"), L.GGML_F32),
            "output_norm.weight": (t("model.norm.weight"), L.GGML_F32),
        }
        for i in range(LAYERS):
            hp, gp = f"model.layers.{i}", f"blk.{i}"
            tensors[f"{gp}.post_attention_norm.weight"] = (
                t(f"{hp}.post_attention_layernorm.weight"), L.GGML_F32)
            tensors[f"{gp}.post_ffw_norm.weight"] = (
                t(f"{hp}.post_feedforward_layernorm.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_q_norm.weight"] = (
                t(f"{hp}.self_attn.q_norm.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_k_norm.weight"] = (
                t(f"{hp}.self_attn.k_norm.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_q.weight"] = (
                t(f"{hp}.self_attn.q_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_k.weight"] = (
                t(f"{hp}.self_attn.k_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_v.weight"] = (
                t(f"{hp}.self_attn.v_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_output.weight"] = (
                t(f"{hp}.self_attn.o_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_gate.weight"] = (
                t(f"{hp}.mlp.gate_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_up.weight"] = (
                t(f"{hp}.mlp.up_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_down.weight"] = (
                t(f"{hp}.mlp.down_proj.weight"), L.GGML_F32)

        p = str(tmp_path / "olmo2.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "olmo2",
            "olmo2.embedding_length": DIM,
            "olmo2.block_count": LAYERS,
            "olmo2.attention.head_count": HEADS,
            "olmo2.attention.head_count_kv": KV,
            "olmo2.attention.key_length": HD,
            "olmo2.feed_forward_length": HID,
            "olmo2.context_length": 64,
            "olmo2.attention.layer_norm_rms_epsilon": 1e-6,
            "olmo2.rope.freq_base": THETA,
            "olmo2.vocab_size": VOCAB,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.pre_norms is False and cfg.post_norms is True
        assert cfg.qk_norm_full and not cfg.qk_norm
        assert "attn_norm" not in params["layers"]
        _assert_matches(params, cfg, tokens, ref)

    def test_full_qk_norm_differs_from_per_head(self, oracle):
        """The whole-projection norm is NOT the per-head norm: slicing
        the (H*Dh,) weights into per-head qk_norm form and normalizing
        per head must diverge from the oracle (different mean square)."""
        state, tokens, ref = oracle
        params, cfg = C.olmo2_from_hf(state, max_seq=64,
                                      rope_theta=THETA,
                                      dtype=jnp.float32)
        cfg = cfg._replace(n_heads=HEADS, n_kv_heads=KV, head_dim=HD,
                           qk_norm_full=False, qk_norm=True)
        params = dict(params)
        layers = dict(params["layers"])
        # Per-head form can only carry ONE (head_dim,) vector: use the
        # first head's slice of each weight.
        layers["q_norm"] = layers["q_norm"][:, :HD]
        layers["k_norm"] = layers["k_norm"][:, :HD]
        params["layers"] = layers
        toks = jnp.asarray(tokens[:SEQ], jnp.int32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
        assert not np.allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)

    def test_runner_lookahead_matches_serial(self, oracle):
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = C.olmo2_from_hf(state, max_seq=64,
                                      rope_theta=THETA,
                                      dtype=jnp.float32)
        cfg = cfg._replace(n_heads=HEADS, n_kv_heads=KV, head_dim=HD)
        tok = ByteTokenizer(cfg.vocab_size)
        outs = {}
        for label, k in (("serial", 1), ("lookahead", 4)):
            runner = LLMRunner(params, cfg, tok,
                               GenerationConfig(max_tokens=14,
                                                temperature=0.0,
                                                lookahead=k),
                               cache_dtype=jnp.float32)
            outs[label] = runner.generate("ola")
        assert outs["lookahead"] == outs["serial"]
        assert outs["serial"]

    def test_server_generates_paged(self, oracle):
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = C.olmo2_from_hf(state, max_seq=64,
                                      rope_theta=THETA,
                                      dtype=jnp.float32)
        cfg = cfg._replace(n_heads=HEADS, n_kv_heads=KV, head_dim=HD)
        tok = ByteTokenizer(cfg.vocab_size)
        outs = {}
        for label, kw in (("per_step", dict(chunk_steps=1)),
                          ("paged", dict(chunk_steps=4, paged=True,
                                         page_size=16))):
            server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                               cache_dtype=jnp.float32, **kw)
            try:
                outs[label] = server.generate("ola", max_tokens=11)
            finally:
                server.close()
        assert outs["paged"] == outs["per_step"]
