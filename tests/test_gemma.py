"""Gemma-2 family correctness against the transformers oracle.

A tiny random-weight ``Gemma2ForCausalLM`` (eager attention, so the
attention-logit softcap is actually applied) is the ground truth; the
same weights convert through BOTH ingestion paths — the HF state dict
(``convert.gemma2_from_hf``) and a synthetic GGUF in llama.cpp's gemma2
layout (``convert.gguf_to_llm_params``) — and the JAX forward must
match teacher-forced logits through prefill AND per-token decode. The
tiny config deliberately exercises every Gemma-2 delta: GeGLU, (1+w)
norms (randomized so the fold matters), sandwich post-norms, sqrt(dim)
embedding scale, attention/final softcaps small enough to bite, a
query_pre_attn_scalar != head_dim, and a sliding window short enough
that the even(local)/odd(global) alternation changes the result.
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

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 128, 64, 4, 4, 2, 16, 128
WINDOW, ATTN_CAP, LOGIT_CAP, QPAS = 8, 5.0, 3.5, 32.0
SEQ = 20


@pytest.fixture(scope="module")
def oracle():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Gemma2Config(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD,
        max_position_embeddings=64, sliding_window=WINDOW,
        attn_logit_softcapping=ATTN_CAP,
        final_logit_softcapping=LOGIT_CAP,
        query_pre_attn_scalar=QPAS, rms_norm_eps=1e-6,
        rope_theta=10000.0, attention_dropout=0.0)
    hf_cfg._attn_implementation = "eager"
    model = Gemma2ForCausalLM(hf_cfg).eval()
    # Randomize every RMSNorm weight so the (1+w) fold is exercised
    # (init leaves them at zero, where a missing fold would hide).
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


def _assert_matches(params, cfg, tokens, ref_logits):
    toks = jnp.asarray(tokens[:SEQ], jnp.int32)
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    logits, cache = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
    np.testing.assert_allclose(np.asarray(logits), ref_logits[SEQ - 1],
                               rtol=2e-3, atol=2e-3)
    # Teacher-forced decode: every step must track the oracle's logits
    # at that position (exercises the decode path's alternating-window
    # cond, softcaps, and post-norms against the growing cache).
    for j in range(4):
        logits, cache = llm_model.decode_step(
            params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits[SEQ + j],
            rtol=2e-3, atol=2e-3, err_msg=f"decode step {j}")


class TestGemma2:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = C.gemma2_from_hf(
            state, head_dim=HD, max_seq=64, sliding_window=WINDOW,
            attn_softcap=ATTN_CAP, logit_softcap=LOGIT_CAP,
            query_pre_attn_scalar=QPAS, dtype=jnp.float32)
        assert cfg.n_heads == HEADS and cfg.n_kv_heads == KV
        assert cfg.act == "gelu" and cfg.post_norms and cfg.alt_window
        _assert_matches(params, cfg, tokens, ref)

    def test_gguf_convert_matches_oracle(self, oracle, tmp_path):
        """The same weights through the GGUF path (llama.cpp gemma2
        tensor names; norms pre-incremented exactly as
        convert_hf_to_gguf.py bakes them; embeddings unscaled)."""
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

        p = str(tmp_path / "gemma2.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "gemma2",
            "gemma2.embedding_length": DIM,
            "gemma2.block_count": LAYERS,
            "gemma2.attention.head_count": HEADS,
            "gemma2.attention.head_count_kv": KV,
            "gemma2.attention.key_length": HD,
            "gemma2.feed_forward_length": HID,
            "gemma2.context_length": 64,
            "gemma2.attention.layer_norm_rms_epsilon": 1e-6,
            "gemma2.rope.freq_base": 10000.0,
            "gemma2.vocab_size": VOCAB,
            "gemma2.attention.sliding_window": WINDOW,
            "gemma2.attn_logit_softcapping": ATTN_CAP,
            "gemma2.final_logit_softcapping": LOGIT_CAP,
            "gemma2.attention.query_pre_attention_scalar": QPAS,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.act == "gelu" and cfg.post_norms and cfg.alt_window
        assert cfg.attn_softcap == ATTN_CAP
        assert cfg.logit_softcap == LOGIT_CAP
        assert cfg.query_pre_attn_scalar == QPAS
        assert cfg.head_dim == HD and cfg.sliding_window == WINDOW
        _assert_matches(params, cfg, tokens, ref)

    def test_alt_window_actually_alternates(self, oracle):
        """Force all-local windows (alt_window=False) on the converted
        params: the oracle comparison must now FAIL — proving the
        even/odd alternation is load-bearing in this fixture, not
        vacuously passing because the window never matters."""
        state, tokens, ref = oracle
        params, cfg = C.gemma2_from_hf(
            state, head_dim=HD, max_seq=64, sliding_window=WINDOW,
            attn_softcap=ATTN_CAP, logit_softcap=LOGIT_CAP,
            query_pre_attn_scalar=QPAS, dtype=jnp.float32)
        cfg = cfg._replace(alt_window=False)  # every layer local
        toks = jnp.asarray(tokens[:SEQ], jnp.int32)
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(params, cfg, toks,
                                      jnp.int32(SEQ), cache)
        assert not np.allclose(np.asarray(logits), ref[SEQ - 1],
                               rtol=2e-3, atol=2e-3)

    def test_runner_lookahead_matches_serial_with_gemma(self, oracle):
        """The interactive runner's k-token lookahead stays byte-exact
        on a Gemma config (softcaps/post-norms/alt-window flow through
        decode_chunk_greedy's scanned steps)."""
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = C.gemma2_from_hf(
            state, head_dim=HD, max_seq=64, sliding_window=WINDOW,
            attn_softcap=ATTN_CAP, logit_softcap=LOGIT_CAP,
            query_pre_attn_scalar=QPAS, dtype=jnp.float32)
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

    def test_server_generates_with_gemma(self, oracle):
        """The continuous-batching server (chunked + pipelined) runs a
        Gemma-2 config end to end — chunk path byte-matches per-step."""
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = C.gemma2_from_hf(
            state, head_dim=HD, max_seq=64, sliding_window=WINDOW,
            attn_softcap=ATTN_CAP, logit_softcap=LOGIT_CAP,
            query_pre_attn_scalar=QPAS, dtype=jnp.float32)
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
        # Paged mode drives the alternating-window cond inside the
        # paged vmap/scan too.
        assert outs["paged"] == outs["per_step"]
