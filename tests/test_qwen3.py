"""Qwen3 family correctness against the transformers oracle.

Qwen3's attention delta vs Qwen2: the QKV projection biases are gone,
replaced by per-head RMSNorm on Q and K over head_dim (applied after
the projection reshape, BEFORE rope). head_dim is decoupled from
dim//n_heads. Qwen3-MoE additionally reverses both Qwen2-MoE routing
choices: top-k weights ARE renormalized (norm_topk_prob=True) and
there is NO shared expert. Tiny random-weight ``Qwen3ForCausalLM`` /
``Qwen3MoeForCausalLM`` are ground truth; the same weights convert
through the HF state dict AND a synthetic GGUF in llama.cpp's
qwen3/qwen3moe layout (attn_{q,k}_norm tensors), and the JAX forward
must match teacher-forced logits through prefill and per-token decode.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.test_loader import write_gguf
from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.models import loader as L

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 1000, 64, 2, 4, 2, 24, 128
MOE_HID, EXPERTS, TOPK = 48, 4, 2
SEQ = 17


def _randomize_norms(model, seed):
    # Random (positive) norm weights so a missing/misplaced QK-norm
    # scale cannot hide behind init-at-ones.
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(torch.rand(p.shape, generator=gen) + 0.5)


@pytest.fixture(scope="module")
def oracle():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(10)
    hf_cfg = Qwen3Config(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD,
        max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-6, attention_dropout=0.0,
        use_sliding_window=False)
    hf_cfg._attn_implementation = "eager"
    model = Qwen3ForCausalLM(hf_cfg).eval()
    _randomize_norms(model, 11)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 3),
                           generator=torch.Generator().manual_seed(12))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


@pytest.fixture(scope="module")
def moe_oracle():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(13)
    hf_cfg = Qwen3MoeConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        moe_intermediate_size=MOE_HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, num_key_value_heads=KV, head_dim=HD,
        num_experts=EXPERTS, num_experts_per_tok=TOPK,
        decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True,
        max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-6, router_aux_loss_coef=0.0,
        use_sliding_window=False)
    hf_cfg._attn_implementation = "eager"
    model = Qwen3MoeForCausalLM(hf_cfg).eval()
    _randomize_norms(model, 14)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 3),
                           generator=torch.Generator().manual_seed(15))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


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


class TestQwen3:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.qwen3_from_hf(state, max_seq=64,
                                      rope_theta=10000.0,
                                      norm_eps=1e-6, dtype=jnp.float32)
        assert cfg.qk_norm and not cfg.qkv_bias
        assert cfg.head_dim == HD and cfg.n_heads == HEADS
        assert params["layers"]["q_norm"].shape == (LAYERS, HD)
        _assert_matches(params, cfg, tokens, ref)

    def test_batched_decode_matches_oracle(self, oracle):
        """QK-norm through the batched serving path too (the vmapped
        rope body is a separate code site)."""
        state, tokens, ref = oracle
        params, cfg = C.qwen3_from_hf(state, max_seq=64,
                                      rope_theta=10000.0,
                                      norm_eps=1e-6, dtype=jnp.float32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        _, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        bcache = llm_model.BatchedKVCache.create(cfg, batch=2,
                                                 dtype=jnp.float32)
        bcache = llm_model.insert_sequence(bcache, cfg, 0, cache)
        logits, bcache = llm_model.decode_step_batch(
            params, cfg, jnp.asarray([tokens[SEQ], 0], jnp.int32),
            jnp.asarray([True, False]), bcache)
        np.testing.assert_allclose(np.asarray(logits[0]), ref[SEQ],
                                   rtol=2e-3, atol=2e-3)

    def test_q8_requant_runs(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.qwen3_from_hf(state, max_seq=64,
                                      rope_theta=10000.0,
                                      norm_eps=1e-6, dtype=jnp.float32)
        qparams = llm_model.quantize_params(params, bits=8, group=16)
        cache = llm_model.KVCache.create(cfg)
        lg, _ = llm_model.prefill(
            qparams, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert np.isfinite(np.asarray(lg)).all()
        assert int(np.argmax(ref[SEQ - 1])) in np.argsort(
            np.asarray(lg))[-5:]


class TestQwen3GGUF:
    def test_gguf_twin_matches_oracle(self, oracle, tmp_path):
        """llama.cpp qwen3 layout: per-layer attn_{q,k}_norm vectors,
        no attention biases, key_length decoupled from dim/heads."""
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
            tensors[f"{gp}.attn_q_norm.weight"] = (
                t(f"{hp}.self_attn.q_norm.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_k_norm.weight"] = (
                t(f"{hp}.self_attn.k_norm.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_output.weight"] = (
                t(f"{hp}.self_attn.o_proj.weight"), L.GGML_F32)
            for g, h in (("gate", "gate_proj"), ("up", "up_proj"),
                         ("down", "down_proj")):
                tensors[f"{gp}.ffn_{g}.weight"] = (
                    t(f"{hp}.mlp.{h}.weight"), L.GGML_F32)
        p = str(tmp_path / "qwen3.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "qwen3",
            "qwen3.embedding_length": DIM,
            "qwen3.block_count": LAYERS,
            "qwen3.attention.head_count": HEADS,
            "qwen3.attention.head_count_kv": KV,
            "qwen3.attention.key_length": HD,
            "qwen3.feed_forward_length": HID,
            "qwen3.context_length": 64,
            "qwen3.attention.layer_norm_rms_epsilon": 1e-6,
            "qwen3.rope.freq_base": 10000.0,
            "qwen3.vocab_size": VOCAB,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.qk_norm and not cfg.qkv_bias
        assert cfg.head_dim == HD
        _assert_matches(params, cfg, tokens, ref, steps=1)


class TestQwen3Moe:
    def test_hf_convert_matches_oracle(self, moe_oracle):
        state, tokens, ref = moe_oracle
        params, cfg = C.qwen3_moe_from_hf(
            state, max_seq=64, rope_theta=10000.0, norm_eps=1e-6,
            n_experts_used=TOPK, dtype=jnp.float32)
        assert cfg.qk_norm and cfg.n_experts == EXPERTS
        assert cfg.moe_norm_topk and not cfg.moe_shared_hidden
        _assert_matches(params, cfg, tokens, ref)

    def test_gguf_twin_matches_oracle(self, moe_oracle, tmp_path):
        """llama.cpp qwen3moe layout: expert banks + QK norms, NO
        shexp tensors, renormalized routing (arch != qwen2moe)."""
        state, tokens, ref = moe_oracle

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
            tensors[f"{gp}.attn_q_norm.weight"] = (
                t(f"{hp}.self_attn.q_norm.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_k_norm.weight"] = (
                t(f"{hp}.self_attn.k_norm.weight"), L.GGML_F32)
            tensors[f"{gp}.attn_output.weight"] = (
                t(f"{hp}.self_attn.o_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_gate_inp.weight"] = (
                t(f"{hp}.mlp.gate.weight"), L.GGML_F32)
            for g, h in (("gate", "gate_proj"), ("up", "up_proj"),
                         ("down", "down_proj")):
                tensors[f"{gp}.ffn_{g}_exps.weight"] = (np.stack(
                    [t(f"{hp}.mlp.experts.{e}.{h}.weight")
                     for e in range(EXPERTS)]), L.GGML_F32)
        p = str(tmp_path / "qwen3moe.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "qwen3moe",
            "qwen3moe.embedding_length": DIM,
            "qwen3moe.block_count": LAYERS,
            "qwen3moe.attention.head_count": HEADS,
            "qwen3moe.attention.head_count_kv": KV,
            "qwen3moe.attention.key_length": HD,
            "qwen3moe.feed_forward_length": HID,
            "qwen3moe.expert_feed_forward_length": MOE_HID,
            "qwen3moe.context_length": 64,
            "qwen3moe.attention.layer_norm_rms_epsilon": 1e-6,
            "qwen3moe.rope.freq_base": 10000.0,
            "qwen3moe.vocab_size": VOCAB,
            "qwen3moe.expert_count": EXPERTS,
            "qwen3moe.expert_used_count": TOPK,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.qk_norm and cfg.n_experts == EXPERTS
        assert cfg.moe_norm_topk and not cfg.moe_shared_hidden
        assert cfg.hidden_dim == MOE_HID
        _assert_matches(params, cfg, tokens, ref, steps=1)


class TestQwen3Paths:
    def test_paged_decode_matches_dense(self, oracle):
        """QK-norm through the paged-KV decode body (its own rope
        site): paged teacher-forced decode equals dense decode."""
        from trackiellm_tpu.llm.paging import PagedKVPool

        state, tokens, ref = oracle
        params, cfg = C.qwen3_from_hf(state, max_seq=64,
                                      rope_theta=10000.0,
                                      norm_eps=1e-6, dtype=jnp.float32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        _, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        pool = PagedKVPool(cfg, n_pages=16, page_size=16,
                           dtype=jnp.float32)
        seq = pool.create_sequence(prefill_cache=cache, length=SEQ)
        lg_p = pool.decode_step(params, int(tokens[SEQ]), seq)
        np.testing.assert_allclose(np.asarray(lg_p), ref[SEQ],
                                   rtol=2e-3, atol=2e-3)

    def test_checkpoint_roundtrip_qk_norm(self, tmp_path):
        from trackiellm_tpu.models.checkpoint import (load_checkpoint,
                                                      save_checkpoint)

        cfg = llm_model.LLMConfig.tiny()._replace(qk_norm=True)
        params = llm_model.init_params(jax.random.PRNGKey(16), cfg,
                                       dtype=jnp.float32)
        d = str(tmp_path / "ck")
        save_checkpoint(d, params, config=cfg)
        p2, cfg2, _ = load_checkpoint(d)
        assert cfg2.qk_norm
        assert p2["layers"]["q_norm"].shape == (cfg.n_layers,
                                                cfg.head_dim)


def test_published_preset_geometry():
    cfg = llm_model.LLMConfig.qwen3_8b()
    assert cfg.qk_norm and not cfg.qkv_bias
    assert cfg.dim == 4096 and cfg.n_layers == 36
    moe = llm_model.LLMConfig.qwen3_moe_30b_a3b()
    assert moe.n_experts == 128 and moe.n_experts_used == 8
    assert moe.moe_norm_topk and not moe.moe_shared_hidden
    assert moe.qk_norm and moe.hidden_dim == 768


def test_cli_convert_qwen3_hf(tmp_path, oracle):
    """`convert --family qwen3-hf` round-trips the oracle's weights
    (incl. the q/k norm vectors) through the native checkpoint."""
    from trackiellm_tpu.__main__ import main
    from trackiellm_tpu.models.checkpoint import load_checkpoint

    state, _, _ = oracle
    src = str(tmp_path / "qwen3_tiny.npz")
    np.savez(src, **state)
    out = str(tmp_path / "ckpt")
    rc = main(["convert", src, "-o", out, "--bits", "0",
               "--family", "qwen3-hf"])
    assert rc == 0
    params, cfg, meta = load_checkpoint(out)
    assert cfg.qk_norm and not cfg.qkv_bias
    assert params["layers"]["k_norm"].shape == (LAYERS, HD)
