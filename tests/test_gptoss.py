"""gpt-oss family correctness against the transformers oracle.

A tiny random-weight ``GptOssForCausalLM`` is the ground truth; the
same weights convert through ``convert.gpt_oss_from_hf`` and the JAX
forward must match teacher-forced logits through prefill, decode AND
the chunked-extend path — exercising every gpt-oss delta at once:
per-head attention sinks, biases on all four attention projections,
router bias + softmax-AFTER-top-k combine weights, expert biases, the
clamped (up+1)*glu activation, and alternating sliding windows.

Parity ref: the reference loads this checkpoint family through
llama.cpp's ``gpt-oss`` arch (src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.ops import attention as A

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 3210, 64, 2, 4, 2, 16, 48
EXPERTS, TOPK = 4, 2
WINDOW = 8
SEQ = 18


@pytest.fixture(scope="module")
def oracle():
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(0)
    hf_cfg = GptOssConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD,
        num_local_experts=EXPERTS, num_experts_per_tok=TOPK,
        sliding_window=WINDOW, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-5, rope_scaling=None,
        tie_word_embeddings=False)
    hf_cfg._attn_implementation = "eager"
    model = GptOssForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_((torch.rand(p.shape, generator=gen) - 0.5)
                    * (1.0 if "norm" not in name else 0.0)
                    + (1.0 if "norm" in name else 0.0))
        # Structured inits would make the router degenerate; keep the
        # projections small-random instead of rand-uniform.
        for name, p in model.named_parameters():
            if "norm" in name:
                continue
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        # Distinct sink magnitudes so the sink path is load-bearing.
        for i in range(LAYERS):
            model.model.layers[i].self_attn.sinks.copy_(
                torch.randn(HEADS, generator=gen) * 2.0)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 3),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = model(tokens).logits[0].float().numpy()
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


@pytest.fixture(scope="module")
def converted(oracle):
    state, tokens, ref = oracle
    params, cfg = C.gpt_oss_from_hf(
        state, head_dim=HD, max_seq=64, sliding_window=WINDOW,
        rope_theta=10000.0, n_experts_used=TOPK, rope_scaling_factor=0.0,
        dtype=jnp.float32)
    return params, cfg, tokens, ref


class TestGptOss:
    def test_convert_shapes(self, converted):
        params, cfg, _, _ = converted
        assert cfg.attn_sinks and cfg.moe_bias and cfg.out_bias
        assert cfg.act == "gptoss" and cfg.moe_score_func == "softmax_topk"
        assert cfg.alt_window and cfg.sliding_window == WINDOW
        lay = params["layers"]
        assert lay["attn_sink"].shape == (LAYERS, HEADS)
        assert lay["w_gu"].shape == (LAYERS, EXPERTS, DIM, 2 * HID)
        assert lay["w_gu_b"].shape == (LAYERS, EXPERTS, 2 * HID)
        assert lay["moe_gate_b"].shape == (LAYERS, EXPERTS)

    def test_prefill_and_decode_match_oracle(self, converted):
        params, cfg, tokens, ref = converted
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

    def test_extend_matches_oracle(self, converted):
        """The chunked-prefill path must carry sinks + windows too
        (it inlines its own attention instead of _prefill_attn)."""
        params, cfg, tokens, ref = converted
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        split = 10
        _, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:split], jnp.int32),
            jnp.int32(split), cache)
        chunk = jnp.asarray(tokens[split:SEQ], jnp.int32)
        logits, cache = llm_model.extend(
            params, cfg, chunk, jnp.int32(SEQ - split), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   rtol=2e-3, atol=2e-3)

    def test_batched_decode_matches_single(self, converted):
        """decode_step_batch carries sinks through its vmapped body."""
        params, cfg, tokens, ref = converted
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        _, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        bcache = llm_model.BatchedKVCache.create(cfg, 2, jnp.float32)
        bcache = llm_model.insert_sequence(bcache, cfg, 0, cache)
        toks = jnp.asarray([int(tokens[SEQ]), 0], jnp.int32)
        active = jnp.asarray([True, False])
        blogits, _ = llm_model.decode_step_batch(
            params, cfg, toks, active, bcache)
        np.testing.assert_allclose(np.asarray(blogits[0]), ref[SEQ],
                                   rtol=2e-3, atol=2e-3)

    def test_preset_geometry(self):
        cfg = llm_model.LLMConfig.gpt_oss_20b()
        assert cfg.n_layers == 24 and cfg.n_experts == 32
        assert cfg.n_heads == 64 and cfg.n_kv_heads == 8
        assert cfg.attn_sinks and cfg.qkv_bias and cfg.out_bias
        big = llm_model.LLMConfig.gpt_oss_120b()
        assert big.n_layers == 36 and big.n_experts == 128
        # The published yarn attention factor (0.1*ln(32)+1).
        assert abs(cfg.rope_attention_factor
                   - (0.1 * np.log(32.0) + 1.0)) < 1e-9


class TestGptOssProductionPaths:
    """gpt-oss through the interactive runner and the batching server:
    sinks/biases/clamped-MoE must survive the lookahead chunks, the
    chunked server scan, and the paged pool."""

    def test_runner_lookahead_matches_serial(self, converted):
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        params, cfg, _, _ = converted
        tok = ByteTokenizer(cfg.vocab_size)
        ids, lens = {}, {}
        for label, k in (("serial", 1), ("lookahead", 4)):
            # min_tokens: near-uniform tiny-random logits can argmax
            # straight into EOS; the ban keeps the chains non-trivial
            # (and exercises the traced suppress_until scalar too).
            # Identity is asserted on token IDS — this vocab is larger
            # than the byte range, so decoded text can be vacuously ''.
            runner = LLMRunner(params, cfg, tok,
                               GenerationConfig(max_tokens=14,
                                                temperature=0.0,
                                                min_tokens=8,
                                                lookahead=k),
                               cache_dtype=jnp.float32)
            runner.generate("ola")
            ids[label] = list(runner._generated_ids)
            lens[label] = int(runner.cache.length)
        assert ids["lookahead"] == ids["serial"]
        assert lens["lookahead"] == lens["serial"]
        assert len(ids["serial"]) >= 8

    def test_server_modes_agree(self, converted):
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        params, cfg, _, _ = converted

        class IdTok(ByteTokenizer):
            """Injective decode — ids above the byte range would decode
            to '' and make text equality vacuous on this vocab."""

            def decode(self, ids):
                return "".join(f"{i}," for i in ids)

            def decode_token(self, tid):
                return f"{tid},"

            def token_bytes(self, tid):
                return f"{tid},".encode()

        tok = IdTok(cfg.vocab_size)
        outs = {}
        for label, kw in (("per_step", dict(chunk_steps=1)),
                          ("chunked", dict(chunk_steps=4)),
                          ("paged", dict(chunk_steps=4, paged=True,
                                         page_size=16))):
            server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                               cache_dtype=jnp.float32, **kw)
            try:
                outs[label] = server.generate("ola", max_tokens=11)
            finally:
                server.close()
        assert outs["chunked"] == outs["per_step"]
        assert outs["paged"] == outs["per_step"]
        assert outs["per_step"]  # non-vacuous: IdTok decode is injective


class TestSinkAttentionKernels:
    """The Pallas flash finalization must equal the XLA sink softmax."""

    def _qkv(self, h, hk, s, d, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        q = jax.random.normal(ks[0], (h, s, d), jnp.float32)
        k = jax.random.normal(ks[1], (hk, s, d), jnp.float32)
        v = jax.random.normal(ks[2], (hk, s, d), jnp.float32)
        sinks = jax.random.normal(ks[3], (h,), jnp.float32) * 2.0
        return q, k, v, sinks

    @pytest.mark.parametrize("window", [0, 192])
    def test_flash_sinks_match_xla(self, window):
        q, k, v, sinks = self._qkv(4, 2, 256, 32, 0)
        want = A.attention_xla(q, k, v, causal=True, window=window,
                               sinks=sinks)
        got = A.flash_attention(q, k, v, causal=True, window=window,
                                sinks=sinks, block_q=128, block_k=128,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_sinks_shrink_attention_mass(self):
        """A huge sink drains probability mass from every real key."""
        q, k, v, _ = self._qkv(4, 2, 64, 32, 1)
        base = A.attention_xla(q, k, v, causal=True)
        sunk = A.attention_xla(q, k, v, causal=True,
                               sinks=jnp.full((4,), 25.0, jnp.float32))
        assert float(jnp.max(jnp.abs(sunk))) < 1e-6
        assert float(jnp.max(jnp.abs(base))) > 1e-2

    def test_decode_attention_sinks(self):
        """Cached decode with sinks == XLA attention's last row."""
        h, hk, s, d = 4, 2, 16, 32
        q, k, v, sinks = self._qkv(h, hk, s, d, 2)
        want = A.attention_xla(q, k, v, causal=True, sinks=sinks)[:, -1]
        got = A.decode_attention(
            q[:, -1], k.transpose(1, 0, 2), v.transpose(1, 0, 2),
            jnp.int32(s), sinks=sinks)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestGptOssGGUF:
    """llama.cpp gpt-oss GGUF ingestion staged per the deepseek2/
    falcon discipline: the synthetic writer produces the llama.cpp
    tensor/metadata conventions from the SAME HF oracle weights, and
    the GGUF route must match the oracle's teacher-forced logits
    exactly. Key strings are unvalidated offline (docs/MODELS.md);
    geometry cross-checks fail loudly on a mismatched real file."""

    def test_synthetic_gguf_matches_oracle(self, oracle, tmp_path):
        from tests.test_loader import write_gguf

        from trackiellm_tpu.models import loader as L

        state, tokens, ref = oracle

        def t(name):
            return np.asarray(state[name], np.float32)

        F32 = L.GGML_F32
        tensors = {
            "token_embd.weight": (t("model.embed_tokens.weight"), F32),
            "output_norm.weight": (t("model.norm.weight"), F32),
            "output.weight": (t("lm_head.weight"), F32),
        }
        for i in range(LAYERS):
            hp, gp = f"model.layers.{i}", f"blk.{i}"
            tensors[f"{gp}.attn_norm.weight"] = (
                t(f"{hp}.input_layernorm.weight"), F32)
            tensors[f"{gp}.ffn_norm.weight"] = (
                t(f"{hp}.post_attention_layernorm.weight"), F32)
            for g, h in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                         ("attn_v", "v_proj")):
                tensors[f"{gp}.{g}.weight"] = (
                    t(f"{hp}.self_attn.{h}.weight"), F32)
                tensors[f"{gp}.{g}.bias"] = (
                    t(f"{hp}.self_attn.{h}.bias"), F32)
            tensors[f"{gp}.attn_output.weight"] = (
                t(f"{hp}.self_attn.o_proj.weight"), F32)
            tensors[f"{gp}.attn_output.bias"] = (
                t(f"{hp}.self_attn.o_proj.bias"), F32)
            tensors[f"{gp}.attn_sinks.weight"] = (
                t(f"{hp}.self_attn.sinks"), F32)
            tensors[f"{gp}.ffn_gate_inp.weight"] = (
                t(f"{hp}.mlp.router.weight"), F32)
            tensors[f"{gp}.ffn_gate_inp.bias"] = (
                t(f"{hp}.mlp.router.bias"), F32)
            # HF stores experts FUSED (E, D, 2I) with gate/up columns
            # INTERLEAVED; llama.cpp splits them into (E, I, D) banks.
            gu = t(f"{hp}.mlp.experts.gate_up_proj")
            gub = t(f"{hp}.mlp.experts.gate_up_proj_bias")
            tensors[f"{gp}.ffn_gate_exps.weight"] = (
                np.ascontiguousarray(gu[..., 0::2].transpose(0, 2, 1)),
                F32)
            tensors[f"{gp}.ffn_up_exps.weight"] = (
                np.ascontiguousarray(gu[..., 1::2].transpose(0, 2, 1)),
                F32)
            tensors[f"{gp}.ffn_gate_exps.bias"] = (gub[..., 0::2], F32)
            tensors[f"{gp}.ffn_up_exps.bias"] = (gub[..., 1::2], F32)
            down = t(f"{hp}.mlp.experts.down_proj")  # (E, I, D)
            tensors[f"{gp}.ffn_down_exps.weight"] = (
                np.ascontiguousarray(down.transpose(0, 2, 1)), F32)
            tensors[f"{gp}.ffn_down_exps.bias"] = (
                t(f"{hp}.mlp.experts.down_proj_bias"), F32)

        p = str(tmp_path / "gptoss.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "gpt-oss",
            "gpt-oss.embedding_length": DIM,
            "gpt-oss.block_count": LAYERS,
            "gpt-oss.attention.head_count": HEADS,
            "gpt-oss.attention.head_count_kv": KV,
            "gpt-oss.attention.key_length": HD,
            "gpt-oss.feed_forward_length": HID,
            "gpt-oss.expert_feed_forward_length": HID,
            "gpt-oss.context_length": 64,
            "gpt-oss.attention.layer_norm_rms_epsilon": 1e-5,
            "gpt-oss.rope.freq_base": 10000.0,
            "gpt-oss.vocab_size": VOCAB,
            "gpt-oss.expert_count": EXPERTS,
            "gpt-oss.expert_used_count": TOPK,
            "gpt-oss.attention.sliding_window": WINDOW,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.attn_sinks and cfg.moe_bias and cfg.out_bias
        assert cfg.qkv_bias and cfg.act == "gptoss"
        assert cfg.alt_window and cfg.sliding_window == WINDOW
        assert cfg.moe_score_func == "softmax_topk"
        assert not cfg.moe_norm_topk
        assert cfg.n_experts == EXPERTS
        assert cfg.n_experts_used == TOPK
        lay = params["layers"]
        assert lay["attn_sink"].shape == (LAYERS, HEADS)
        assert lay["w_gu"].shape == (LAYERS, EXPERTS, DIM, 2 * HID)
        assert lay["w_gu_b"].shape == (LAYERS, EXPERTS, 2 * HID)
        assert lay["moe_gate_b"].shape == (LAYERS, EXPERTS)

        n = SEQ
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:n], jnp.int32),
            jnp.int32(n), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[n - 1],
                                   atol=2e-3, rtol=2e-3)
        # cached decode continues exactly (sinks + windows live here)
        for j in range(2):
            lg, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[n + j])), cache)
            np.testing.assert_allclose(np.asarray(lg), ref[n + j],
                                       atol=2e-3, rtol=2e-3)
