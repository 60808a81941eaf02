"""Fused MLP Pallas kernel vs the composable oracle path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.ops import fused
from trackiellm_tpu.ops.quant import quantize_q4

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

D, H, G = 256, 512, 64


def _weights(key):
    k1, k2 = jax.random.split(key)
    w_gu = jax.random.normal(k1, (D, 2 * H), jnp.float32) / (D ** 0.5)
    w_down = jax.random.normal(k2, (H, D), jnp.float32) / (H ** 0.5)
    return quantize_q4(w_gu, G), quantize_q4(w_down, G)


@pytest.mark.parametrize("m", [1, 4])
def test_fused_mlp_interpret_matches_oracle(m):
    key = jax.random.PRNGKey(0)
    qgu, qdown = _weights(key)
    x = jax.random.normal(jax.random.fold_in(key, 7), (m, D), jnp.float32)
    norm = jnp.ones((D,), jnp.float32) * 1.1

    want = fused.fused_mlp_xla(x, norm, qgu, qdown, 1e-5)
    got = fused.fused_mlp_q4_pallas(
        x, norm, qgu.values, qgu.scales, qdown.values, qdown.scales,
        eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_mlp_bf16_io():
    key = jax.random.PRNGKey(1)
    qgu, qdown = _weights(key)
    x = jax.random.normal(key, (1, D), jnp.float32).astype(jnp.bfloat16)
    norm = jnp.ones((D,), jnp.bfloat16)
    want = fused.fused_mlp_xla(x, norm, qgu, qdown, 1e-5)
    got = fused.fused_mlp_q4_pallas(
        x, norm, qgu.values, qgu.scales, qdown.values, qdown.scales,
        eps=1e-5, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_can_fuse_gates():
    key = jax.random.PRNGKey(2)
    # TPU-legal shapes: group 128, hidden half divisible by group
    d, h, g = 256, 512, 128
    w_gu = jax.random.normal(key, (d, 2 * h), jnp.float32)
    w_down = jax.random.normal(key, (h, d), jnp.float32)
    qgu, qdown = quantize_q4(w_gu, g), quantize_q4(w_down, g)
    x1 = jnp.zeros((1, d), jnp.float32)
    assert fused._can_fuse(x1, qgu, qdown)
    assert not fused._can_fuse(jnp.zeros((16, d)), qgu, qdown)  # M>8
    assert not fused._can_fuse(x1, qgu.values, qdown)  # not QuantizedLinear
    # Q8 (int8 values) must not take the Q4 kernel
    from trackiellm_tpu.ops.quant import quantize_q8
    q8 = quantize_q8(jnp.ones((d, 2 * h)), g)
    assert not fused._can_fuse(x1, q8, qdown)
    # sub-128 groups are not TPU-tileable -> composable path
    qgu64, qdown64 = _weights(key)
    assert not fused._can_fuse(jnp.zeros((1, D)), qgu64, qdown64)


def test_decode_step_uses_mlp_block_consistently():
    """decode_step numerics on CPU are unchanged by the dispatcher
    (the XLA fused path is mathematically the old composition)."""
    cfg = llm_model.LLMConfig.tiny()
    key = jax.random.PRNGKey(3)
    params = llm_model.quantize_params(
        llm_model.init_params(key, cfg, dtype=jnp.float32), bits=4,
        group=64)
    cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
    tokens = jnp.arange(8, dtype=jnp.int32) % cfg.vocab_size
    logits, cache = llm_model.prefill(params, cfg, tokens, jnp.int32(8),
                                      cache)
    logits2, cache = llm_model.decode_step(params, cfg, jnp.int32(3), cache)
    assert np.isfinite(np.asarray(logits2)).all()
