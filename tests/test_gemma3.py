"""Gemma-3 family correctness against the transformers oracle.

A tiny random-weight ``Gemma3ForCausalLM`` (eager attention) is the
ground truth; the same weights convert through BOTH ingestion paths —
the HF state dict (``convert.gemma3_from_hf``) and a synthetic GGUF in
llama.cpp's gemma3 layout (``convert.gguf_to_llm_params``) — and the
JAX forward must match teacher-forced logits through prefill AND
per-token decode.

Gemma-3's deltas over Gemma-2, all exercised here: the softcaps are
gone, replaced by per-head (1+w) Q/K RMSNorms; the 1:1 alternating
windows become an N:1 sliding/global pattern (``window_pattern``; the
fixture uses pattern 3 so 4 layers hit both types); and the rope is
DUAL — sliding layers rotate at ``rope_local_base_freq`` while global
layers use ``rope_theta`` with linear scaling (rope_scaling factor),
which must NOT leak onto the sliding layers. Reference analogue:
llama.cpp's gemma3 arch behind the reference's model loader
(src/ai_models/tk_model_loader.c:199).
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

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 128, 64, 4, 4, 2, 16, 128
WINDOW, QPAS, PATTERN = 8, 32.0, 3
THETA, LOCAL_THETA, LINEAR_FACTOR = 1e6, 10000.0, 4.0
SEQ = 20


@pytest.fixture(scope="module")
def oracle():
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    torch.manual_seed(0)
    hf_cfg = Gemma3TextConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD,
        max_position_embeddings=64, sliding_window=WINDOW,
        sliding_window_pattern=PATTERN,
        query_pre_attn_scalar=QPAS, rms_norm_eps=1e-6,
        rope_theta=THETA, rope_local_base_freq=LOCAL_THETA,
        rope_scaling={"rope_type": "linear", "factor": LINEAR_FACTOR},
        attention_dropout=0.0)
    assert hf_cfg.layer_types == ["sliding_attention", "sliding_attention",
                                  "full_attention", "sliding_attention"]
    hf_cfg._attn_implementation = "eager"
    model = Gemma3ForCausalLM(hf_cfg).eval()
    # Randomize every RMSNorm weight (incl. the NEW q_norm/k_norm) so
    # each (1+w) fold is exercised — init leaves them at zero, where a
    # missing fold would hide.
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.3)
    tokens = torch.randint(0, VOCAB, (1, SEQ + 4),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref_logits = model(tokens).logits[0].numpy()  # (SEQ+4, V)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref_logits


def _convert_hf(state):
    return C.gemma3_from_hf(
        state, max_seq=64, sliding_window=WINDOW,
        window_pattern=PATTERN, query_pre_attn_scalar=QPAS,
        rope_theta=THETA, rope_local_theta=LOCAL_THETA,
        rope_linear_factor=LINEAR_FACTOR, dtype=jnp.float32)


def _assert_matches(params, cfg, tokens, ref_logits):
    toks = jnp.asarray(tokens[:SEQ], jnp.int32)
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    logits, cache = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
    np.testing.assert_allclose(np.asarray(logits), ref_logits[SEQ - 1],
                               rtol=2e-3, atol=2e-3)
    # Teacher-forced decode: every step must track the oracle at that
    # position (exercises the decode path's pattern cond, per-layer
    # rope select, and QK norms against the growing cache).
    for j in range(4):
        logits, cache = llm_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits[SEQ + j],
            rtol=2e-3, atol=2e-3, err_msg=f"decode step {j}")


class TestGemma3:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        assert cfg.n_heads == HEADS and cfg.n_kv_heads == KV
        assert cfg.head_dim == HD  # derived from the q_norm shape
        assert cfg.qk_norm and cfg.window_pattern == PATTERN
        assert cfg.attn_softcap == 0.0 and cfg.logit_softcap == 0.0
        assert "rope_factors" in params
        _assert_matches(params, cfg, tokens, ref)

    def test_gguf_convert_matches_oracle(self, oracle, tmp_path):
        """The same weights through the GGUF path (llama.cpp gemma3
        tensor names; norms pre-incremented exactly as
        convert_hf_to_gguf.py bakes them; embeddings unscaled; linear
        rope scaling as metadata)."""
        state, tokens, ref = oracle

        def t(name):
            return np.asarray(state[name], np.float32)

        tensors = {
            "token_embd.weight": (t("model.embed_tokens.weight"),
                                  L.GGML_F32),
            "output_norm.weight": (t("model.norm.weight") + 1.0,
                                   L.GGML_F32),
        }
        for i in range(LAYERS):
            hp, gp = f"model.layers.{i}", f"blk.{i}"
            tensors[f"{gp}.attn_norm.weight"] = (
                t(f"{hp}.input_layernorm.weight") + 1.0, L.GGML_F32)
            tensors[f"{gp}.post_attention_norm.weight"] = (
                t(f"{hp}.post_attention_layernorm.weight") + 1.0,
                L.GGML_F32)
            tensors[f"{gp}.ffn_norm.weight"] = (
                t(f"{hp}.pre_feedforward_layernorm.weight") + 1.0,
                L.GGML_F32)
            tensors[f"{gp}.post_ffw_norm.weight"] = (
                t(f"{hp}.post_feedforward_layernorm.weight") + 1.0,
                L.GGML_F32)
            tensors[f"{gp}.attn_q_norm.weight"] = (
                t(f"{hp}.self_attn.q_norm.weight") + 1.0, L.GGML_F32)
            tensors[f"{gp}.attn_k_norm.weight"] = (
                t(f"{hp}.self_attn.k_norm.weight") + 1.0, L.GGML_F32)
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

        p = str(tmp_path / "gemma3.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "gemma3",
            "gemma3.embedding_length": DIM,
            "gemma3.block_count": LAYERS,
            "gemma3.attention.head_count": HEADS,
            "gemma3.attention.head_count_kv": KV,
            "gemma3.attention.key_length": HD,
            "gemma3.feed_forward_length": HID,
            "gemma3.context_length": 64,
            "gemma3.attention.layer_norm_rms_epsilon": 1e-6,
            "gemma3.rope.freq_base": THETA,
            "gemma3.vocab_size": VOCAB,
            "gemma3.attention.sliding_window": WINDOW,
            "gemma3.attention.query_pre_attention_scalar": QPAS,
            "gemma3.rope.scaling.type": "linear",
            "gemma3.rope.scaling.factor": LINEAR_FACTOR,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.act == "gelu" and cfg.post_norms and cfg.qk_norm
        assert cfg.rope_local_theta == LOCAL_THETA
        assert cfg.query_pre_attn_scalar == QPAS
        # The published pattern is 6; this 4-layer fixture uses 3, a
        # geometry llama.cpp never ships — override like a user with a
        # research checkpoint would.
        cfg = cfg._replace(window_pattern=PATTERN)
        assert "rope_factors" in params  # linear metadata -> divisors
        _assert_matches(params, cfg, tokens, ref)

    def test_dual_rope_is_load_bearing(self, oracle):
        """Collapse the dual rope (rope_local_theta=0 makes every
        layer use the scaled global rope): the oracle comparison must
        FAIL — proving the sliding layers really rotate at the local
        base in this fixture."""
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        cfg = cfg._replace(rope_local_theta=0.0)
        toks = jnp.asarray(tokens[:SEQ], jnp.int32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
        assert not np.allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)

    def test_pattern_is_load_bearing(self, oracle):
        """Make every layer slide (window_pattern=0, alt_window off):
        must fail vs the oracle — the N:1 global layer matters."""
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        cfg = cfg._replace(window_pattern=0)
        toks = jnp.asarray(tokens[:SEQ], jnp.int32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
        assert not np.allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)

    def test_runner_lookahead_matches_serial(self, oracle):
        """The interactive runner's k-token lookahead stays byte-exact
        on a Gemma-3 config (pattern windows + dual rope flow through
        decode_chunk_greedy's scanned steps)."""
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = _convert_hf(state)
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
        assert outs["serial"]  # non-empty text

    def test_server_generates_with_gemma3(self, oracle):
        """The continuous-batching server runs a Gemma-3 config end to
        end, dense chunked AND paged (the paged body routes through the
        same _decode_attn pattern cond and _layer_freqs select)."""
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = _convert_hf(state)
        tok = ByteTokenizer(cfg.vocab_size)
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
