"""SmolLM3 family correctness against the transformers oracle.

A tiny random-weight ``SmolLM3ForCausalLM`` (eager attention) is the
ground truth. SmolLM3 is Llama-shaped with ONE architectural delta:
NoPE every ``no_rope_layer_interval``-th layer — rope applies on layer
li iff (li+1) % interval != 0 (transformers
configuration_smollm3.py:219-221). The rebuild expresses that as
``cfg.nope_pattern``: the affected layers' rope frequencies are zeroed
inside the layer scan (cos=1/sin=0 makes apply_rope the identity), so
NoPE costs no extra programs or conds. Reference analogue: llama.cpp's
smollm3 arch behind the reference's loader
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
INTERVAL = 2  # layers 1 and 3 are NoPE in this 4-layer fixture
THETA = 10000.0
SEQ = 20


@pytest.fixture(scope="module")
def oracle():
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = SmolLM3Config(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV,
        max_position_embeddings=64, rope_theta=THETA,
        no_rope_layer_interval=INTERVAL, use_sliding_window=False,
        rms_norm_eps=1e-6, attention_dropout=0.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    assert hf_cfg.no_rope_layers == [1, 0, 1, 0]  # 1 = rope, 0 = NoPE
    hf_cfg._attn_implementation = "eager"
    model = SmolLM3ForCausalLM(hf_cfg).eval()
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


def _convert_hf(state):
    return C.smollm3_from_hf(state, max_seq=64, rope_theta=THETA,
                             nope_pattern=INTERVAL, head_dim=HD,
                             dtype=jnp.float32)


class TestSmolLM3:
    def test_hf_convert_matches_oracle(self, oracle):
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        assert cfg.n_heads == HEADS and cfg.n_kv_heads == KV
        assert cfg.nope_pattern == INTERVAL
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

    def test_nope_is_load_bearing(self, oracle):
        """Rope everywhere (nope_pattern=0) must diverge from the
        oracle by far more than the true match's error — fresh-init
        weights make the absolute gap small (~2e-3) while the correct
        config matches to ~1e-6, so the negative check runs at a
        tolerance between the two."""
        state, tokens, ref = oracle
        params, cfg = _convert_hf(state)
        toks = jnp.asarray(tokens[:SEQ], jnp.int32)

        def last_logits(c):
            cache = llm_model.KVCache.create(c, dtype=jnp.float32)
            logits, _ = llm_model.prefill(params, c, toks,
                                          jnp.int32(SEQ), cache)
            return np.asarray(logits)

        good = np.abs(last_logits(cfg) - ref[SEQ - 1]).max()
        bad = np.abs(last_logits(cfg._replace(nope_pattern=0))
                     - ref[SEQ - 1]).max()
        assert good < 1e-4, good          # correct config: exact
        assert bad > 20 * max(good, 1e-5), (good, bad)  # NoPE matters

    def test_runner_lookahead_matches_serial(self, oracle):
        """k-token lookahead stays byte-exact with NoPE layers in the
        scanned decode chunks."""
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
        assert outs["serial"]

    def test_server_generates_paged(self, oracle):
        """The paged server body routes NoPE through _layer_freqs."""
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        state, _, _ = oracle
        params, cfg = _convert_hf(state)
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


class TestSmolLM3GGUF:
    """Synthetic smollm3 GGUF in llama.cpp's REAL layout (q/k permuted
    into ggml's NORM rope — SmolLM3Model inherits LlamaModel's
    permute): the reader's fold must land on the HF oracle's logits,
    NoPE interval included."""

    def test_gguf_matches_oracle(self, oracle, tmp_path):
        from tests.test_loader import permute_llama_qk, write_gguf

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
            tensors[f"{gp}.attn_q.weight"] = (permute_llama_qk(
                t(f"{hp}.self_attn.q_proj.weight"), HEADS), F32)
            tensors[f"{gp}.attn_k.weight"] = (permute_llama_qk(
                t(f"{hp}.self_attn.k_proj.weight"), KV), F32)
            tensors[f"{gp}.attn_v.weight"] = (
                t(f"{hp}.self_attn.v_proj.weight"), F32)
            tensors[f"{gp}.attn_output.weight"] = (
                t(f"{hp}.self_attn.o_proj.weight"), F32)
            tensors[f"{gp}.ffn_gate.weight"] = (
                t(f"{hp}.mlp.gate_proj.weight"), F32)
            tensors[f"{gp}.ffn_up.weight"] = (
                t(f"{hp}.mlp.up_proj.weight"), F32)
            tensors[f"{gp}.ffn_down.weight"] = (
                t(f"{hp}.mlp.down_proj.weight"), F32)
        p = str(tmp_path / "smollm3.gguf")
        write_gguf(p, tensors, metadata={
            "general.architecture": "smollm3",
            "smollm3.embedding_length": DIM,
            "smollm3.block_count": LAYERS,
            "smollm3.attention.head_count": HEADS,
            "smollm3.attention.head_count_kv": KV,
            "smollm3.feed_forward_length": HID,
            "smollm3.context_length": 64,
            "smollm3.attention.layer_norm_rms_epsilon": 1e-6,
            "smollm3.rope.freq_base": THETA,
            "smollm3.vocab_size": VOCAB,
            "smollm3.no_rope_layer_interval": INTERVAL,
        })
        params, cfg = C.gguf_to_llm_params(p, bits=None,
                                           dtype=jnp.float32)
        assert cfg.nope_pattern == INTERVAL
        n = SEQ
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[:n], jnp.int32),
            jnp.int32(n), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[n - 1],
                                   rtol=2e-3, atol=2e-3)
        for j in range(2):
            logits, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[n + j])), cache)
            np.testing.assert_allclose(np.asarray(logits), ref[n + j],
                                       rtol=2e-3, atol=2e-3)
