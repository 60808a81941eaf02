"""Phi-3 longrope correctness against the transformers oracle.

A tiny random-weight ``Phi3ForCausalLM`` with longrope scaling (dual
short/long rope factor sets switched when the total sequence length
exceeds original_max_position_embeddings, plus the
sqrt(1+log(max/orig)/log(orig)) attention factor on cos/sin) is the
ground truth. The same weights convert through ``convert.phi3_from_hf``
and the JAX forward must match teacher-forced logits in BOTH regimes —
a short prompt (short factors) and a long one (long factors) — and
across the regime boundary during decode (cached KV keeps the rotation
it was written with; the new token's choice follows the total length,
the reference per-forward semantics).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

VOCAB, DIM, LAYERS, HEADS, KV, HD, HID = 32100, 64, 2, 4, 2, 16, 128
ORIG, MAXSEQ = 32, 64
SHORT_F = [1.0 + i * 0.05 for i in range(HD // 2)]
LONG_F = [2.0 + i * 0.3 for i in range(HD // 2)]


@pytest.fixture(scope="module")
def oracle():
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Phi3Config(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV,
        max_position_embeddings=MAXSEQ,
        original_max_position_embeddings=ORIG,
        rope_theta=10000.0, rms_norm_eps=1e-5, sliding_window=None,
        rope_scaling={"type": "longrope", "short_factor": SHORT_F,
                      "long_factor": LONG_F})
    hf_cfg._attn_implementation = "eager"
    model = Phi3ForCausalLM(hf_cfg).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(torch.rand(p.shape, generator=gen) + 0.5)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return model, state


def _convert(state):
    return C.phi3_from_hf(
        state, head_dim=HD, max_seq=MAXSEQ, original_max_seq=ORIG,
        rope_factors_short=SHORT_F, rope_factors_long=LONG_F,
        sliding_window=MAXSEQ, dtype=jnp.float32)


class TestPhi3Longrope:
    @pytest.mark.parametrize("seq", [20, 40])  # short / long regime
    def test_prefill_matches_oracle_both_regimes(self, oracle, seq):
        model, state = oracle
        params, cfg = _convert(state)
        assert (cfg.rope_original_max_seq == ORIG
                and cfg.rope_attention_factor > 1.0)
        tokens = torch.randint(
            0, VOCAB, (1, seq),
            generator=torch.Generator().manual_seed(seq))
        with torch.no_grad():
            want = model(tokens).logits[0, -1].numpy()
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        got, _ = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[0].numpy(), jnp.int32),
            jnp.int32(seq), cache)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-3, atol=2e-3)

    def test_decode_across_regime_boundary(self, oracle):
        """Teacher-forced decode from length 30 through 35 (crossing
        ORIG=32): every step's logits must track the oracle, which
        re-chooses factors per forward while cached KV keeps its
        original rotation."""
        model, state = oracle
        params, cfg = _convert(state)
        tokens = torch.randint(
            0, VOCAB, (1, 36),
            generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            # HF with use_cache: incremental decode reproduces the
            # production path (per-step factor choice + cached KV).
            out = model(tokens[:, :30], use_cache=True)
            past = out.past_key_values
            ref = [out.logits[0, -1].numpy()]
            for j in range(30, 36):
                out = model(tokens[:, j:j + 1], past_key_values=past,
                            use_cache=True)
                past = out.past_key_values
                ref.append(out.logits[0, -1].numpy())

        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        got, cache = llm_model.prefill(
            params, cfg, jnp.asarray(tokens[0, :30].numpy(), jnp.int32),
            jnp.int32(30), cache)
        np.testing.assert_allclose(np.asarray(got), ref[0],
                                   rtol=2e-3, atol=2e-3)
        for j in range(30, 36):
            got, cache = llm_model.decode_step(
                params, cfg, jnp.int32(int(tokens[0, j])), cache)
            np.testing.assert_allclose(
                np.asarray(got), ref[j - 29], rtol=2e-3, atol=2e-3,
                err_msg=f"decode at total length {j + 1}")
