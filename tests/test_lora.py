"""LoRA adapter tests: zero-init identity, training moves the loss,
merge equivalence (dense and quantized bases)."""

import numpy as np
import optax
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.models import lora
from trackiellm_tpu.parallel.mesh import build_mesh

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

CFG = llm_model.LLMConfig(
    vocab_size=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
    head_dim=16, hidden_dim=128, max_seq=64, sliding_window=64)


@pytest.fixture(scope="module")
def base():
    return llm_model.init_params(jax.random.PRNGKey(0), CFG,
                                 dtype=jnp.float32)


def _prefill_logits(params, toks):
    cache = llm_model.KVCache.create(CFG, dtype=jnp.float32)
    logits, _ = llm_model.prefill(params, CFG, toks, jnp.int32(len(toks)),
                                  cache)
    return logits


class TestLora:
    def test_zero_init_is_identity(self, base):
        adapters = lora.init_lora(jax.random.PRNGKey(1), base, rank=4)
        wrapped = lora.attach_lora(base, adapters)
        toks = jnp.arange(8, dtype=jnp.int32)
        np.testing.assert_allclose(
            np.asarray(_prefill_logits(wrapped, toks)),
            np.asarray(_prefill_logits(base, toks)),
            rtol=1e-5, atol=1e-5)

    def test_training_reduces_loss_base_frozen(self, base):
        adapters = lora.init_lora(jax.random.PRNGKey(2), base, rank=4)
        opt = optax.adam(1e-2)
        step = lora.make_lora_train_step(base, CFG, opt)
        opt_state = opt.init(adapters)
        batch = jnp.tile(jnp.arange(32, dtype=jnp.int32) % CFG.vocab_size,
                         (2, 1))
        with build_mesh(jax.devices()[:1]):
            first = None
            for _ in range(15):
                adapters, opt_state, loss = step(adapters, opt_state, batch)
                if first is None:
                    first = float(loss)
        assert float(loss) < first * 0.9
        # Alpha stayed fixed; B moved.
        assert float(adapters["__alpha__"]) == 16.0
        assert float(jnp.abs(adapters["wqkv"]["b"]).max()) > 0

    def test_merge_matches_adapter_forward(self, base):
        key = jax.random.PRNGKey(3)
        adapters = lora.init_lora(key, base, rank=4)
        # Give B nonzero values so the adapters actually do something.
        adapters = jax.tree.map(
            lambda x: (x + 0.01 if x.ndim == 3 else x), adapters)
        wrapped = lora.attach_lora(base, adapters)
        merged = lora.merge_lora(base, adapters)
        toks = jnp.arange(6, dtype=jnp.int32)
        np.testing.assert_allclose(
            np.asarray(_prefill_logits(merged, toks)),
            np.asarray(_prefill_logits(wrapped, toks)),
            rtol=1e-4, atol=1e-4)

    def test_quantized_base_roundtrip(self, base):
        qbase = llm_model.quantize_params(base, bits=8, group=32)
        adapters = lora.init_lora(jax.random.PRNGKey(4), qbase, rank=4)
        wrapped = lora.attach_lora(qbase, adapters)
        toks = jnp.arange(5, dtype=jnp.int32)
        out = _prefill_logits(wrapped, toks)
        assert np.isfinite(np.asarray(out)).all()
        merged = lora.merge_lora(qbase, adapters, requantize_bits=8)
        out2 = _prefill_logits(merged, toks)
        # zero-init adapters: merge == base (modulo requantization noise)
        ref = _prefill_logits(qbase, toks)
        corr = np.corrcoef(np.asarray(out2), np.asarray(ref))[0, 1]
        assert corr > 0.99
