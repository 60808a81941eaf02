"""DeepSeek-V2 MLA correctness against the transformers oracle.

Covers the two published attention shapes — V2-Lite (full q_proj) and
V2 (LoRA query with q_a_layernorm) — plus the MoE deltas: softmax
scores, greedy AND group-limited top-k, routed scaling factor, ungated
shared experts, first-k-dense layers. The absorbed decode path
(models/mla.py decode_step — scores against the compressed latent
cache) must match transformers' decompressed eager attention exactly,
which proves the absorption identity, the adjacent-pair rope, and the
latent-cache layout all at once.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import mla as mla_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS = 512, 32, 3, 2
R, NOPE, ROPE, VD = 16, 16, 8, 12
HID, MOE_HID, EXPERTS, TOPK, SHARED = 64, 24, 4, 2, 2
SEQ = 13


def _hf_model(n_tokens=SEQ + 3, **overrides):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(30)
    kw = dict(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        moe_intermediate_size=MOE_HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, num_key_value_heads=HEADS,
        q_lora_rank=None, kv_lora_rank=R, qk_nope_head_dim=NOPE,
        qk_rope_head_dim=ROPE, v_head_dim=VD,
        n_routed_experts=EXPERTS, num_experts_per_tok=TOPK,
        n_shared_experts=SHARED, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=2.0, n_group=None, topk_group=None,
        aux_loss_alpha=0.0, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-6, attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False)
    kw.update(overrides)
    hf_cfg = DeepseekV2Config(**kw)
    hf_cfg._attn_implementation = "eager"
    model = DeepseekV2ForCausalLM(hf_cfg).eval()
    # Random positive norm weights so missing norms can't hide.
    gen = torch.Generator().manual_seed(31)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "layernorm" in name or name.endswith("norm.weight"):
                p.copy_(torch.rand(p.shape, generator=gen) + 0.5)
    tokens = torch.randint(0, VOCAB, (1, n_tokens),
                           generator=torch.Generator().manual_seed(32))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


def _assert_matches(params, cfg, tokens, ref, steps=3):
    cache = mla_model.MLACache.create(cfg, dtype=jnp.float32)
    logits, cache = mla_model.prefill(
        params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
        jnp.int32(SEQ), cache)
    np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)
    for j in range(steps):
        logits, cache = mla_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"decode step {j}")


class TestDeepseekV2Lite:
    def test_lite_shape_matches_oracle(self):
        """Full q_proj, greedy top-k, routed_scaling_factor=2, one
        dense layer, ungated shared experts."""
        state, tokens, ref = _hf_model()
        params, cfg = C.deepseek_v2_from_hf(
            state, max_seq=64, n_experts_used=TOPK, routed_scale=2.0,
            qk_nope_head_dim=NOPE, qk_rope_head_dim=ROPE,
            dtype=jnp.float32)
        assert cfg.q_lora_rank == 0
        assert (cfg.kv_lora_rank, cfg.v_head_dim) == (R, VD)
        assert cfg.first_k_dense == 1
        assert cfg.moe_shared_hidden == SHARED * MOE_HID
        assert not cfg.moe_shared_gated
        _assert_matches(params, cfg, tokens, ref)

    def test_cache_is_compressed(self):
        """The decode cache stores kv_lora_rank + rope per token —
        NOT n_heads * (qk_head + v)."""
        cfg = mla_model.MLAConfig.tiny()
        cache = mla_model.MLACache.create(cfg)
        per_tok = (cache.ckv.shape[-1] + cache.kpe.shape[-1])
        assert per_tok == cfg.kv_lora_rank + cfg.qk_rope_head_dim
        decompressed = cfg.n_heads * (cfg.qk_head_dim + cfg.v_head_dim)
        assert per_tok < decompressed

    def test_tiny_generates_finite(self):
        cfg = mla_model.MLAConfig.tiny()
        params = mla_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        cache = mla_model.MLACache.create(cfg, dtype=jnp.float32)
        logits, cache = mla_model.prefill(
            params, cfg, jnp.arange(8, dtype=jnp.int32), jnp.int32(8),
            cache)
        assert np.isfinite(np.asarray(logits)).all()
        logits, cache = mla_model.decode_step(
            params, cfg, jnp.int32(3), cache)
        assert np.isfinite(np.asarray(logits)).all()
        assert int(cache.length) == 9


class TestDeepseekV2Big:
    def test_q_lora_and_group_routing_match_oracle(self):
        """V2-proper shape: q_a/q_b LoRA query with its own RMSNorm,
        group_limited_greedy routing (2 groups, top-1 group)."""
        state, tokens, ref = _hf_model(
            q_lora_rank=24, topk_method="group_limited_greedy",
            n_group=2, topk_group=1, routed_scaling_factor=1.0)
        params, cfg = C.deepseek_v2_from_hf(
            state, max_seq=64, n_experts_used=TOPK, n_groups=2,
            topk_groups=1, qk_nope_head_dim=NOPE, qk_rope_head_dim=ROPE,
            dtype=jnp.float32)
        assert cfg.q_lora_rank == 24
        assert "wq_a" in params["attn"] and "wq" not in params["attn"]
        _assert_matches(params, cfg, tokens, ref)

    # norm_topk_prob is intentionally NOT oracle-tested here:
    # transformers' DeepseekV2 gate stores the flag but never applies
    # it (modeling_deepseek_v2.py:59 is its only mention), and every
    # published V2/V2-Lite checkpoint ships norm_topk_prob=False —
    # top-k renormalization itself is oracle-covered by the Mixtral
    # and Qwen3-MoE suites through the same _moe_block.


class TestDeepseekYarn:
    def test_yarn_long_context_matches_oracle(self):
        """DeepSeek yarn (factor 4 over an original 16-token window,
        mscale == mscale_all_dim like every published config) evaluated
        PAST the original window."""
        state, tokens, ref = _hf_model(n_tokens=30, rope_scaling={
            "rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 16,
            "mscale": 0.707, "mscale_all_dim": 0.707})
        params, cfg = C.deepseek_v2_from_hf(
            state, max_seq=64, n_experts_used=TOPK, routed_scale=2.0,
            qk_nope_head_dim=NOPE, qk_rope_head_dim=ROPE,
            yarn_factor=4.0, yarn_original_max_seq=16,
            dtype=jnp.float32)
        assert "rope_factors" in params
        s = 25  # > original 16: the extended band is exercised
        cache = mla_model.MLACache.create(cfg, dtype=jnp.float32)
        logits, cache = mla_model.prefill(
            params, cfg, jnp.asarray(tokens[:s], jnp.int32),
            jnp.int32(s), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[s - 1],
                                   rtol=2e-3, atol=2e-3)
        logits, _ = mla_model.decode_step(
            params, cfg, jnp.int32(int(tokens[s])), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[s],
                                   rtol=2e-3, atol=2e-3)


class TestDeepseekV3:
    """V3/R1 deltas vs V2: sigmoid routing, top-2-sum group scores,
    renormalized top-k, and the aux-loss-free selection bias (added to
    scores for SELECTION only). Attention is V2's MLA unchanged
    (rope_interleave checkpoints are score-equivalent — see
    convert.deepseek_v3_from_hf)."""

    def _oracle(self):
        from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

        torch.manual_seed(40)
        hf_cfg = DeepseekV3Config(
            vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
            moe_intermediate_size=MOE_HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, num_key_value_heads=HEADS,
            q_lora_rank=24, kv_lora_rank=R, qk_nope_head_dim=NOPE,
            qk_rope_head_dim=ROPE, v_head_dim=VD,
            n_routed_experts=EXPERTS, num_experts_per_tok=TOPK,
            n_shared_experts=1, first_k_dense_replace=1,
            norm_topk_prob=True, routed_scaling_factor=2.5,
            n_group=2, topk_group=1, rope_interleave=True,
            max_position_embeddings=64, rope_theta=10000.0,
            rms_norm_eps=1e-6, attention_bias=False,
            attention_dropout=0.0, tie_word_embeddings=False)
        hf_cfg._attn_implementation = "eager"
        model = DeepseekV3ForCausalLM(hf_cfg).eval()
        gen = torch.Generator().manual_seed(41)
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "layernorm" in name or name.endswith("norm.weight"):
                    p.copy_(torch.rand(p.shape, generator=gen) + 0.5)
            # Non-zero selection bias so a bias-ignoring router picks
            # DIFFERENT experts and fails loudly.
            for i in range(1, LAYERS):
                model.model.layers[i].mlp.gate.e_score_correction_bias \
                    .copy_(torch.randn(EXPERTS, generator=gen) * 0.5)
        tokens = torch.randint(
            0, VOCAB, (1, SEQ + 3),
            generator=torch.Generator().manual_seed(42))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return state, tokens[0].numpy(), ref

    def test_v3_matches_oracle(self):
        state, tokens, ref = self._oracle()
        assert "model.layers.1.mlp.gate.e_score_correction_bias" in state
        params, cfg = C.deepseek_v3_from_hf(
            state, max_seq=64, n_experts_used=TOPK, n_groups=2,
            topk_groups=1, qk_nope_head_dim=NOPE, qk_rope_head_dim=ROPE,
            dtype=jnp.float32)
        assert cfg.moe_score_func == "sigmoid"
        assert cfg.moe_group_score == "top2sum"
        assert cfg.moe_norm_topk and cfg.moe_routed_scale == 2.5
        assert "moe_gate_bias" in params["moe_mlp"]
        _assert_matches(params, cfg, tokens, ref)

    def test_v3_preset_geometry(self):
        v3 = mla_model.MLAConfig.deepseek_v3()
        assert v3.n_experts == 256 and v3.n_experts_used == 8
        assert v3.moe_score_func == "sigmoid"
        assert v3.first_k_dense == 3 and v3.moe_topk_groups == 4


class TestRunnerIntegration:
    """DeepSeek serves through the PRODUCTION session API: LLMRunner
    with model=models.mla drives prefill, the k-token greedy lookahead
    chunks, extend (tool re-injection), and reset over the latent
    cache."""

    def _runner(self, lookahead):
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        cfg = mla_model.MLAConfig.tiny()._replace(max_seq=256)
        params = mla_model.init_params(jax.random.PRNGKey(2), cfg,
                                       dtype=jnp.float32)
        return LLMRunner(
            params, cfg, ByteTokenizer(n_special_pad_to=cfg.vocab_size),
            GenerationConfig(max_tokens=24, temperature=0.0,
                             lookahead=lookahead),
            cache_dtype=jnp.float32, model=mla_model)

    def test_greedy_generate_lookahead_equals_serial(self):
        out_chunked = self._runner(lookahead=4).generate("Hello robot")
        out_serial = self._runner(lookahead=1).generate("Hello robot")
        assert out_chunked == out_serial
        assert len(out_chunked) > 0

    def test_tool_reinjection_extend(self):
        r = self._runner(lookahead=4)
        r.generate("What time is it?")
        before = int(r.cache.length)
        r.add_tool_response("clock", "12:00")
        assert int(r.cache.length) > before
        piece = r.generate_next_token()
        assert piece is None or isinstance(piece, str)

    def test_grammar_forced_tool_call(self):
        """The cortex's tool-call path (grammar-constrained sampling)
        over an MLA session must emit valid tool-call JSON."""
        import json

        from trackiellm_tpu.llm.runner import (GenerationConfig,
                                               LLMRunner, ToolDefinition)
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        cfg = mla_model.MLAConfig.tiny()._replace(max_seq=256,
                                                  vocab_size=260)
        params = mla_model.init_params(jax.random.PRNGKey(3), cfg,
                                       dtype=jnp.float32)
        r = LLMRunner(params, cfg,
                      ByteTokenizer(n_special_pad_to=cfg.vocab_size),
                      GenerationConfig(max_tokens=60, seed=1),
                      cache_dtype=jnp.float32, model=mla_model)
        out = r.generate("Navigate",
                         tools=[ToolDefinition("go", "move", {})],
                         force_tool_call=True)
        obj = json.loads(out)
        assert "tool_call" in obj and "name" in obj["tool_call"]

    def test_speculative_is_greedy_identical(self):
        """Prompt-lookup speculative decoding rides mla.extend's
        all_logits verify pass — output must be byte-identical to
        plain greedy."""
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        cfg = mla_model.MLAConfig.tiny()._replace(max_seq=256)
        params = mla_model.init_params(jax.random.PRNGKey(2), cfg,
                                       dtype=jnp.float32)

        def run(spec):
            r = LLMRunner(
                params, cfg,
                ByteTokenizer(n_special_pad_to=cfg.vocab_size),
                GenerationConfig(max_tokens=24, temperature=0.0,
                                 lookahead=1, speculative=spec),
                cache_dtype=jnp.float32, model=mla_model)
            return r.generate("abc abc abc abc")

        assert run(True) == run(False)

    def test_quantized_runs_and_agrees(self):
        """Q8 MLA banks: the quantized forward stays finite and keeps
        the f32 argmax in its top-5 (wkv_b stays bf16 for the absorb
        reshape — see mla.quantize_params)."""
        cfg = mla_model.MLAConfig.tiny()._replace(max_seq=64)
        params = mla_model.init_params(jax.random.PRNGKey(5), cfg,
                                       dtype=jnp.float32)
        qparams = mla_model.quantize_params(params, bits=8, group=8)
        assert not hasattr(qparams["attn"]["wkv_b"], "values")
        toks = jnp.arange(9, dtype=jnp.int32)
        ref, _ = mla_model.prefill(
            params, cfg, toks, jnp.int32(9),
            mla_model.MLACache.create(cfg, dtype=jnp.float32))
        lg, cache = mla_model.prefill(
            qparams, cfg, toks, jnp.int32(9),
            mla_model.MLACache.create(cfg, dtype=jnp.float32))
        assert np.isfinite(np.asarray(lg)).all()
        assert int(np.argmax(np.asarray(ref))) in np.argsort(
            np.asarray(lg))[-5:]
        lg2, _ = mla_model.decode_step(qparams, cfg, jnp.int32(3), cache)
        assert np.isfinite(np.asarray(lg2)).all()

    def test_reset_reuses_latent_buffers(self):
        r = self._runner(lookahead=4)
        r.generate("abc")
        buf = r.cache.ckv
        r.reset()
        assert int(r.cache.length) == 0
        assert r.cache.ckv.shape == buf.shape


class TestCheckpointRoundtrip:
    def test_quantized_mla_checkpoint_and_cli_generate(self, tmp_path,
                                                       capsys):
        """convert -> save_checkpoint -> __main__ generate drives the
        MLA model end-to-end from disk (MLAConfig sidecar class)."""
        from trackiellm_tpu.models.checkpoint import (load_checkpoint,
                                                      save_checkpoint)

        cfg = mla_model.MLAConfig.tiny()._replace(max_seq=256)
        params = mla_model.init_params(jax.random.PRNGKey(6), cfg,
                                       dtype=jnp.float32)
        qparams = mla_model.quantize_params(params, bits=8, group=8)
        d = str(tmp_path / "ck")
        save_checkpoint(d, qparams, config=cfg)
        p2, cfg2, _ = load_checkpoint(d, device_put=False)
        assert cfg2 == cfg
        assert type(cfg2).__name__ == "MLAConfig"
        assert hasattr(p2["attn"]["wq"], "values")

        from trackiellm_tpu import __main__ as cli

        rc = cli.main(["generate", d, "--prompt", "hi",
                       "--max-tokens", "8", "--temperature", "0"])
        assert rc == 0
        assert capsys.readouterr().out is not None


class TestPresets:
    def test_published_geometry(self):
        lite = mla_model.MLAConfig.deepseek_v2_lite()
        assert lite.qk_head_dim == 192 and lite.kv_lora_rank == 512
        assert lite.n_experts == 64 and lite.moe_shared_hidden == 2816
        big = mla_model.MLAConfig.deepseek_v2()
        assert big.q_lora_rank == 1536 and big.moe_n_groups == 8
        assert big.moe_routed_scale == 16.0
        # Cache compression ratio the architecture is famous for.
        per_tok = big.kv_lora_rank + big.qk_rope_head_dim
        dense = big.n_heads * (big.qk_head_dim + big.v_head_dim)
        assert dense / per_tok > 70
