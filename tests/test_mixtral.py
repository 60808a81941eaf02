"""Mixtral sparse-MoE correctness against the transformers oracle.

A tiny random-weight ``MixtralForCausalLM`` (top-2 of 4 experts) is the
ground truth; the same weights convert through ``convert.mixtral_from_hf``
and the JAX forward must match teacher-forced logits through prefill
and decode — exercising the router softmax -> top-k -> renormalize
semantics and the dense-all-experts weighted-sum formulation. A GGUF
twin in llama.cpp's expert-bank layout (ffn_{gate,up,down}_exps +
ffn_gate_inp) must match too, including Q8 requantization running.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.test_loader import permute_llama_qk, write_gguf
from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.models import loader as L

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 32100, 64, 2, 4, 2, 16, 96
EXPERTS, TOPK = 4, 2
SEQ = 18


@pytest.fixture(scope="module")
def oracle():
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, num_local_experts=EXPERTS,
        num_experts_per_tok=TOPK, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-5, sliding_window=None,
        router_jitter_noise=0.0)
    hf_cfg._attn_implementation = "eager"
    model = MixtralForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(torch.rand(p.shape, generator=gen) + 0.5)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 3),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


def _assert_matches(params, cfg, tokens, ref):
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


class TestMixtral:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.mixtral_from_hf(state, head_dim=HD, max_seq=64,
                                        rope_theta=10000.0,
                                        dtype=jnp.float32)
        assert cfg.n_experts == EXPERTS and cfg.n_experts_used == TOPK
        assert params["layers"]["w_gu"].shape == (
            LAYERS, EXPERTS, DIM, 2 * HID)
        _assert_matches(params, cfg, tokens, ref)

    def test_gguf_expert_banks_match_oracle(self, oracle, tmp_path):
        """The same weights through llama.cpp's Mixtral GGUF layout
        (3D expert banks, expert-major; router as ffn_gate_inp)."""
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
                w = t(f"{hp}.self_attn.{h}.weight")
                if g == "attn_q":
                    # Real Mixtral GGUFs (arch "llama") ship q/k
                    # permuted into ggml's NORM-rope layout.
                    w = permute_llama_qk(w, HEADS)
                elif g == "attn_k":
                    w = permute_llama_qk(w, KV)
                tensors[f"{gp}.{g}.weight"] = (w, L.GGML_F32)
            tensors[f"{gp}.attn_output.weight"] = (
                t(f"{hp}.self_attn.o_proj.weight"), L.GGML_F32)
            tensors[f"{gp}.ffn_gate_inp.weight"] = (
                t(f"{hp}.block_sparse_moe.gate.weight"), L.GGML_F32)
            mk = f"{hp}.block_sparse_moe.experts"
            tensors[f"{gp}.ffn_gate_exps.weight"] = (np.stack(
                [t(f"{mk}.{e}.w1.weight") for e in range(EXPERTS)]),
                L.GGML_F32)
            tensors[f"{gp}.ffn_up_exps.weight"] = (np.stack(
                [t(f"{mk}.{e}.w3.weight") for e in range(EXPERTS)]),
                L.GGML_F32)
            tensors[f"{gp}.ffn_down_exps.weight"] = (np.stack(
                [t(f"{mk}.{e}.w2.weight") for e in range(EXPERTS)]),
                L.GGML_F32)
        p = str(tmp_path / "mixtral.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "llama",
            "llama.embedding_length": DIM,
            "llama.block_count": LAYERS,
            "llama.attention.head_count": HEADS,
            "llama.attention.head_count_kv": KV,
            "llama.attention.key_length": HD,
            "llama.feed_forward_length": HID,
            "llama.context_length": 64,
            "llama.attention.layer_norm_rms_epsilon": 1e-5,
            "llama.rope.freq_base": 10000.0,
            "llama.vocab_size": VOCAB,
            "llama.expert_count": EXPERTS,
            "llama.expert_used_count": TOPK,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.n_experts == EXPERTS
        _assert_matches(params, cfg, tokens, ref)

        # Q8 requantization of the expert banks runs end to end and
        # stays in the quantizer's error envelope (loose: correctness
        # of the per-expert packing, not accuracy).
        q_params, q_cfg = C.gguf_to_llm_params(p, bits=8, group=32)
        cache = llm_model.KVCache.create(q_cfg)
        lg, _ = llm_model.prefill(
            q_params, q_cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        ref_top = int(np.argmax(ref[SEQ - 1]))
        assert np.isfinite(np.asarray(lg)).all()
        assert ref_top in np.argsort(np.asarray(lg))[-5:]

    def test_server_serves_moe(self, oracle):
        """The continuous-batching server runs a MoE config end to end;
        chunked byte-matches per-step (the router lives inside the same
        scanned layer body)."""
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = C.mixtral_from_hf(state, head_dim=HD, max_seq=64,
                                        rope_theta=10000.0,
                                        dtype=jnp.float32)
        tok = ByteTokenizer(cfg.vocab_size)
        outs = {}
        for label, chunk in (("per_step", 1), ("chunked", 4)):
            server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                               cache_dtype=jnp.float32, chunk_steps=chunk)
            try:
                outs[label] = server.generate("ola", max_tokens=11)
            finally:
                server.close()
        assert outs["chunked"] == outs["per_step"]


class TestMoEOnMesh:
    def test_tp_server_serves_moe(self):
        """LLMServer(mesh=...) on a MoE config: expert banks split
        Megatron-style within each expert (experts replicated), and the
        tp serve loop byte-matches itself per-step vs chunked. (A
        small-vocab config so ByteTokenizer yields real text; vs-
        single-device identity cannot hold — psum reduction order
        legally flips greedy near-ties.)"""
        from jax.sharding import Mesh

        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        cfg = llm_model.LLMConfig.tiny()._replace(
            n_experts=4, n_experts_used=2, moe_shared_hidden=24)
        params = llm_model.init_params(jax.random.PRNGKey(11), cfg,
                                       dtype=jnp.float32)
        assert params["layers"]["w_gu"].ndim == 4
        assert "shared_gu" in params["layers"]
        # tp=2: the tiny config has 2 KV heads (tp must divide them).
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                    ("dp", "fsdp", "tp"))
        prompts = ["ola", "descreva a cena"]
        outs = {}
        for label, chunk in (("per_step", 1), ("chunked", 4)):
            server = LLMServer(params, cfg, batch_slots=2,
                               tokenizer=ByteTokenizer(cfg.vocab_size),
                               cache_dtype=jnp.float32,
                               chunk_steps=chunk, mesh=mesh)
            try:
                outs[label] = [server.generate(p, max_tokens=9)
                               for p in prompts]
            finally:
                server.close()
        assert outs["chunked"] == outs["per_step"]
        assert any(outs["per_step"])


class TestRoutedMoE:
    """The sorted grouped-matmul (ragged_dot) path is mathematically the
    same top-k mixture as the dense-all-experts loop — assert it
    numerically, eager (env lever is read at trace time, so eager
    execution keeps both variants out of any jit cache)."""

    def _logits(self, monkeypatch, mode, T=48):
        monkeypatch.setenv("TRACKIE_MOE_ROUTED", mode)
        cfg = llm_model.LLMConfig.tiny()._replace(n_experts=4,
                                                  n_experts_used=2)
        params = llm_model.init_params(jax.random.PRNGKey(5), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(6), (T,), 0,
                                    cfg.vocab_size)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        with jax.disable_jit():
            logits, _ = llm_model.prefill(
                params, cfg, tokens.astype(jnp.int32), jnp.int32(T),
                cache)
        return np.asarray(logits, np.float64)

    def test_routed_matches_dense(self, monkeypatch):
        dense = self._logits(monkeypatch, "0")
        routed = self._logits(monkeypatch, "1")
        np.testing.assert_allclose(routed, dense, rtol=2e-4, atol=2e-4)

    def test_auto_threshold(self, monkeypatch):
        """auto keys on dense-MLP FLOP volume: on for Mixtral-scale
        prefill, off for small models / decode-sized batches /
        quantized banks (the measured crossover, PERF_NOTES round-3)."""
        monkeypatch.setenv("TRACKIE_MOE_ROUTED", "auto")
        big = jax.ShapeDtypeStruct((8, 4096, 28672), jnp.bfloat16)
        small = jax.ShapeDtypeStruct((8, 1024, 7168), jnp.bfloat16)
        assert llm_model._moe_use_routed(512, big)      # Mixtral prefill
        assert not llm_model._moe_use_routed(2, big)    # decode batch
        assert not llm_model._moe_use_routed(512, small)
        cfg = llm_model.LLMConfig.tiny()._replace(n_experts=4,
                                                  n_experts_used=2)
        params = llm_model.init_params(jax.random.PRNGKey(5), cfg,
                                       dtype=jnp.float32)
        from trackiellm_tpu.ops.quant import quantize_q8
        qw = quantize_q8(np.asarray(params["layers"]["w_gu"][0][0]))
        assert not llm_model._moe_use_routed(4096, qw)


class TestMoEPaged:
    def test_paged_serving_matches_dense(self, oracle):
        """MoE through the PAGED KV path (llm/paging.py reuses the same
        MoE-aware _mlp layer body) byte-matches dense serving, per-step
        and chunked."""
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = C.mixtral_from_hf(state, head_dim=HD, max_seq=64,
                                        rope_theta=10000.0,
                                        dtype=jnp.float32)
        tok = ByteTokenizer(cfg.vocab_size)
        outs = {}
        for label, paged, chunk in (("dense", False, 4),
                                    ("paged", True, 1),
                                    ("paged_chunked", True, 4)):
            server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                               cache_dtype=jnp.float32, paged=paged,
                               page_size=16, chunk_steps=chunk)
            try:
                outs[label] = server.generate("ola", max_tokens=11)
            finally:
                server.close()
        assert outs["paged"] == outs["dense"]
        assert outs["paged_chunked"] == outs["dense"]
