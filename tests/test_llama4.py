"""Llama-4 (Scout-class) correctness against the transformers oracle.

A tiny random-weight ``Llama4ForCausalLM`` (text tower, eager
attention) is the ground truth. Llama-4's deltas over Llama:

- uniform MoE: sigmoid top-1 router whose weight scales the expert
  INPUT (Llama4TextMoe/Llama4Router) + an ungated shared expert;
- NoPE every ``no_rope_layer_interval``-th layer, with query
  temperature tuning on those layers (arXiv:2501.19399);
- post-rope weightless L2 norm on q/k of rope layers (use_qk_norm);
- CHUNKED attention on rope layers (attention_chunk_size): queries
  attend only within their aligned chunk; NoPE layers stay global;
- INTERLEAVED rope over the full head_dim — folded to split-half at
  conversion (_deinterleave_rope_cols; NoPE layers and the post-rope
  L2 norm are permutation-invariant so the uniform fold is exact).

Maverick's dense/MoE interleave is rejected with a clear error.
Reference analogue: llama.cpp's llama4 arch behind the reference's
loader (src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD = 320, 64, 4, 4, 2, 16  # vocab >= 259: ByteTokenizer ids fit
EXPERTS, EXP_HID, SHARED_HID = 4, 48, 48
THETA = 10000.0
SEQ = 20
CHUNK = 8          # tiny so the chunk mask binds inside SEQ
NOPE = 2           # layers 1 and 3 are NoPE in this 4-layer fixture
FLOOR = 4.0        # tiny so temperature tuning binds inside SEQ


@pytest.fixture(scope="module")
def oracle():
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(0)
    hf_cfg = Llama4TextConfig(
        vocab_size=VOCAB, hidden_size=DIM,
        intermediate_size=EXP_HID, intermediate_size_mlp=96,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD,
        num_local_experts=EXPERTS, num_experts_per_tok=1,
        interleave_moe_layer_step=1,
        max_position_embeddings=64, rope_theta=THETA, rope_scaling=None,
        no_rope_layer_interval=NOPE, attention_chunk_size=CHUNK,
        attn_temperature_tuning=True, floor_scale=FLOOR, attn_scale=0.1,
        use_qk_norm=True, attention_bias=False, attention_dropout=0.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hf_cfg._attn_implementation = "eager"
    model = Llama4ForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name and "qk_norm" not in name:
                p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
            elif "q_proj" in name or "k_proj" in name:
                # Real-scale projections so the rope layout, chunk
                # mask, L2 norm, and temperature tuning are all
                # load-bearing in the logits.
                p.copy_(torch.randn(p.shape, generator=gen) * 0.15)
            elif "router" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.5)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 4),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref_logits = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref_logits


def _convert_hf(state):
    return C.llama4_from_hf(
        state, max_seq=64, norm_eps=1e-5, rope_theta=THETA,
        nope_pattern=NOPE, attn_chunk=CHUNK, attn_temp_tuning=True,
        attn_temp_floor=FLOOR, attn_temp_scale=0.1, qk_l2norm=True,
        head_dim=HD, dtype=jnp.float32)


class TestLlama4:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        assert cfg.n_experts == EXPERTS and cfg.n_experts_used == 1
        assert cfg.moe_score_func == "sigmoid_topk"
        assert cfg.moe_scale_input and not cfg.moe_shared_gated
        assert cfg.attn_chunk == CHUNK and cfg.nope_pattern == NOPE
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

    def _bad_vs_good(self, oracle, bad_cfg_fn):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        good = self._last_prefill(params, cfg, tokens)
        good_err = np.abs(good - ref[SEQ - 1]).max()
        bad = self._last_prefill(params, bad_cfg_fn(cfg), tokens)
        # The correct config matches to ~3e-7 here; any real semantic
        # change lands orders of magnitude above that.
        assert np.abs(bad - ref[SEQ - 1]).max() > max(100 * good_err,
                                                      2e-3)

    def test_chunked_attention_load_bearing(self, oracle):
        self._bad_vs_good(oracle, lambda c: c._replace(attn_chunk=0))

    def test_temp_tuning_load_bearing(self, oracle):
        self._bad_vs_good(
            oracle, lambda c: c._replace(attn_temp_tuning=False))

    def test_qk_l2norm_load_bearing(self, oracle):
        self._bad_vs_good(oracle, lambda c: c._replace(qk_l2norm=False))

    def test_input_scaling_load_bearing(self, oracle):
        """Output-scaled routing (Mixtral convention) must diverge —
        sigmoid weights pass through the SwiGLU nonlinearity when they
        scale the input."""
        self._bad_vs_good(
            oracle, lambda c: c._replace(moe_scale_input=False))

    def test_sigmoid_topk_load_bearing(self, oracle):
        self._bad_vs_good(
            oracle, lambda c: c._replace(moe_score_func="softmax"))

    def test_extend_matches_prefill(self, oracle):
        """Chunked-attention extend (absolute-position chunk mask as
        data) agrees with one-shot prefill across a chunk boundary."""
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        full = self._last_prefill(params, cfg, tokens)

        split = 11  # mid-chunk split; the extend crosses pos 16 = 2*C
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        _, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:split], jnp.int32),
            jnp.int32(split), cache)
        logits, _ = llm_model.extend(
            params, cfg, jnp.asarray(tokens[split:SEQ], jnp.int32),
            jnp.int32(SEQ - split), cache)
        np.testing.assert_allclose(np.asarray(logits), full, rtol=2e-4,
                                   atol=2e-4)

    def test_irregular_moe_layout_refused(self, oracle):
        """A dense/MoE layout that isn't the interleave pattern (here:
        layer 0 dense, the rest MoE) is refused clearly."""
        state, _, _ = oracle
        state = dict(state)
        for k in list(state):
            if k.startswith("model.layers.0.feed_forward.experts") or \
                    "layers.0.feed_forward.router" in k or \
                    "layers.0.feed_forward.shared_expert" in k:
                del state[k]
        state["model.layers.0.feed_forward.gate_proj.weight"] = \
            np.zeros((96, DIM), np.float32)
        state["model.layers.0.feed_forward.up_proj.weight"] = \
            np.zeros((96, DIM), np.float32)
        state["model.layers.0.feed_forward.down_proj.weight"] = \
            np.zeros((DIM, 96), np.float32)
        with pytest.raises(NotImplementedError, match="irregular"):
            C.llama4_from_hf(state, head_dim=HD)


class TestMaverickInterleave:
    """interleave_moe_layer_step=2: odd layers MoE, even layers a
    WIDER dense MLP — the per-layer choice is a lax.cond over dual
    stacked params."""

    @pytest.fixture(scope="class")
    def oracle(self):
        from transformers import Llama4ForCausalLM, Llama4TextConfig

        torch.manual_seed(9)
        hf_cfg = Llama4TextConfig(
            vocab_size=VOCAB, hidden_size=DIM,
            intermediate_size=EXP_HID, intermediate_size_mlp=96,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV, head_dim=HD,
            num_local_experts=EXPERTS, num_experts_per_tok=1,
            interleave_moe_layer_step=2,
            max_position_embeddings=64, rope_theta=THETA,
            rope_scaling=None,
            no_rope_layer_interval=NOPE, attention_chunk_size=CHUNK,
            attn_temperature_tuning=True, floor_scale=FLOOR,
            attn_scale=0.1, use_qk_norm=True, attention_bias=False,
            attention_dropout=0.0, rms_norm_eps=1e-5,
            tie_word_embeddings=False,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        hf_cfg._attn_implementation = "eager"
        model = Llama4ForCausalLM(hf_cfg).eval()
        gen = torch.Generator().manual_seed(10)
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "norm" in name and "qk_norm" not in name:
                    p.copy_(1.0 + torch.randn(p.shape,
                                              generator=gen) * 0.2)
                elif "q_proj" in name or "k_proj" in name:
                    p.copy_(torch.randn(p.shape, generator=gen) * 0.15)
                elif "router" in name:
                    p.copy_(torch.randn(p.shape, generator=gen) * 0.5)
        tokens = torch.randint(
            0, VOCAB, (1, SEQ + 3),
            generator=torch.Generator().manual_seed(11))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return state, tokens[0].numpy(), ref

    def test_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        assert cfg.moe_pattern == 2
        assert "w_gu_mlp" in params["layers"]
        toks = jnp.asarray(tokens[:SEQ], jnp.int32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(params, cfg, toks,
                                          jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   rtol=2e-3, atol=2e-3)
        for j in range(3):
            logits, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
            np.testing.assert_allclose(
                np.asarray(logits), ref[SEQ + j],
                rtol=2e-3, atol=2e-3, err_msg=f"decode step {j}")

    def test_pattern_load_bearing(self, oracle):
        """Treating every layer as MoE (pattern off) must diverge —
        the dense layers' expert banks are zeros."""
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        good, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        good_err = np.abs(np.asarray(good) - ref[SEQ - 1]).max()
        bad_cfg = cfg._replace(moe_pattern=0)
        cache = llm_model.KVCache.create(bad_cfg, dtype=jnp.float32)
        bad, _ = llm_model.prefill(
            params, bad_cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        assert np.abs(np.asarray(bad) - ref[SEQ - 1]).max() \
            > max(100 * good_err, 2e-3)


class TestLlama4ProductionPaths:
    """Llama-4 through the batched body, interactive runner, and the
    continuous-batching server: the chunk mask, temperature tuning,
    L2 norms, and input-scaled MoE must survive every serving path."""

    def test_batched_decode_matches_single(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
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

    def test_runner_lookahead_matches_serial(self, oracle):
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = _convert_hf(state)
        tok = ByteTokenizer(cfg.vocab_size)
        ids = {}
        for label, k in (("serial", 1), ("lookahead", 4)):
            runner = LLMRunner(params, cfg, tok,
                               GenerationConfig(max_tokens=14,
                                                temperature=0.0,
                                                min_tokens=8,
                                                lookahead=k),
                               cache_dtype=jnp.float32)
            runner.generate("ola")
            ids[label] = list(runner._generated_ids)
        assert ids["lookahead"] == ids["serial"]
        assert len(ids["serial"]) >= 8

    def test_server_modes_agree(self, oracle):
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = _convert_hf(state)

        class IdTok(ByteTokenizer):
            def decode(self, ids):
                return "".join(f"{i}," for i in ids)

            def decode_token(self, tid):
                return f"{tid},"

            def token_bytes(self, tid):
                return f"{tid},".encode()

        tok = IdTok(cfg.vocab_size)
        outs = {}
        for label, kw in (("per_step", dict(chunk_steps=1)),
                          ("chunked", dict(chunk_steps=4))):
            server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                               cache_dtype=jnp.float32, **kw)
            try:
                outs[label] = server.generate("ola", max_tokens=11)
            finally:
                server.close()
        assert outs["chunked"] == outs["per_step"]
        assert outs["per_step"]


def _write_llama4_gguf(path, state, step):
    """Write a synthetic llama.cpp llama4 GGUF from the HF oracle's
    state dict (staged conventions — see gguf_to_llama4_params)."""
    from tests.test_loader import write_gguf

    from trackiellm_tpu.models import loader as L

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
        # llama4 ships q/k UN-permuted (HF interleaved-native;
        # undo_permute=False in convert_hf_to_gguf).
        for g, h in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                     ("attn_v", "v_proj"), ("attn_output", "o_proj")):
            tensors[f"{gp}.{g}.weight"] = (
                t(f"{hp}.self_attn.{h}.weight"), F32)
        if f"{hp}.feed_forward.experts.gate_up_proj" in state:
            gu = t(f"{hp}.feed_forward.experts.gate_up_proj")  # (E,D,2H)
            h2 = gu.shape[-1] // 2
            tensors[f"{gp}.ffn_gate_exps.weight"] = (
                np.ascontiguousarray(gu[..., :h2].transpose(0, 2, 1)),
                F32)
            tensors[f"{gp}.ffn_up_exps.weight"] = (
                np.ascontiguousarray(gu[..., h2:].transpose(0, 2, 1)),
                F32)
            down = t(f"{hp}.feed_forward.experts.down_proj")  # (E,H,D)
            tensors[f"{gp}.ffn_down_exps.weight"] = (
                np.ascontiguousarray(down.transpose(0, 2, 1)), F32)
            tensors[f"{gp}.ffn_gate_inp.weight"] = (
                t(f"{hp}.feed_forward.router.weight"), F32)
            for g, h in (("ffn_gate_shexp", "gate_proj"),
                         ("ffn_up_shexp", "up_proj"),
                         ("ffn_down_shexp", "down_proj")):
                tensors[f"{gp}.{g}.weight"] = (
                    t(f"{hp}.feed_forward.shared_expert.{h}.weight"),
                    F32)
        else:
            for g, h in (("ffn_gate", "gate_proj"),
                         ("ffn_up", "up_proj"),
                         ("ffn_down", "down_proj")):
                tensors[f"{gp}.{g}.weight"] = (
                    t(f"{hp}.feed_forward.{h}.weight"), F32)
    write_gguf(path, tensors, metadata={
        "general.architecture": "llama4",
        "llama4.embedding_length": DIM,
        "llama4.block_count": LAYERS,
        "llama4.attention.head_count": HEADS,
        "llama4.attention.head_count_kv": KV,
        "llama4.attention.key_length": HD,
        "llama4.feed_forward_length": 96,
        "llama4.expert_feed_forward_length": EXP_HID,
        "llama4.context_length": 64,
        "llama4.attention.layer_norm_rms_epsilon": 1e-5,
        "llama4.rope.freq_base": THETA,
        "llama4.vocab_size": VOCAB,
        "llama4.expert_count": EXPERTS,
        "llama4.expert_used_count": 1,
        "llama4.interleave_moe_layer_step": step,
        "llama4.no_rope_layer_interval": NOPE,
        "llama4.attention.chunk_size": CHUNK,
        "llama4.attention.temperature_length": FLOOR,
        "llama4.attention.use_kq_norm": 1,
    })


class TestLlama4GGUF:
    """GGUF twins of both published shapes, logits-exact vs the HF
    oracles (writer/reader pair pins geometry + the rope-layout
    decision; real-file key strings remain the documented caveat)."""

    def test_scout_gguf_matches_oracle(self, oracle, tmp_path):
        state, tokens, ref = oracle
        p = str(tmp_path / "scout.gguf")
        _write_llama4_gguf(p, state, step=1)
        params, cfg = C.gguf_to_llama4_params(p, bits=None,
                                              dtype=jnp.float32)
        assert cfg.moe_pattern == 0 and cfg.qk_l2norm
        assert cfg.nope_pattern == NOPE and cfg.attn_chunk == CHUNK
        assert cfg.attn_temp_floor == FLOOR
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   rtol=2e-3, atol=2e-3)
        for j in range(2):
            logits, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
            np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                       rtol=2e-3, atol=2e-3)

    def test_maverick_gguf_matches_oracle(self, tmp_path):
        maverick = TestMaverickInterleave()
        state, tokens, ref = maverick.oracle.__wrapped__(maverick)
        p = str(tmp_path / "maverick.gguf")
        _write_llama4_gguf(p, state, step=2)
        params, cfg = C.gguf_to_llama4_params(p, bits=None,
                                              dtype=jnp.float32)
        assert cfg.moe_pattern == 2
        assert "w_gu_mlp" in params["layers"]
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:SEQ], jnp.int32),
            jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   rtol=2e-3, atol=2e-3)

    def test_interleave_mismatch_raises(self, oracle, tmp_path):
        from trackiellm_tpu.utils.errors import TrackieError

        state, _, _ = oracle
        p = str(tmp_path / "bad.gguf")
        _write_llama4_gguf(p, state, step=2)  # uniform tensors, step 2
        with pytest.raises(TrackieError, match="interleave"):
            C.gguf_to_llama4_params(p, bits=None)
