"""Multi-chip parallel tests: mesh factoring, sharded init/step on the
8-device virtual CPU mesh, and training-sanity (loss decreases)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.parallel import (
    build_mesh,
    data_sharding,
    init_train_state,
    lm_forward_batched,
    make_train_step,
)
from trackiellm_tpu.parallel.mesh import _factor


TRAIN_CFG = llm_model.LLMConfig(
    vocab_size=128, dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
    head_dim=32, hidden_dim=256, max_seq=64, sliding_window=64)


class TestMesh:
    def test_factoring(self):
        assert _factor(8, 4) == (1, 2, 4)
        assert _factor(6, 4) == (3, 1, 2)
        assert _factor(1, 4) == (1, 1, 1)
        assert _factor(16, 4) == (1, 4, 4)

    def test_build_mesh_axes(self):
        mesh = build_mesh(jax.devices()[:8])
        assert set(mesh.axis_names) == {"dp", "fsdp", "tp"}
        assert np.prod(list(mesh.shape.values())) == 8

    def test_explicit_tp(self):
        mesh = build_mesh(jax.devices()[:8], tp=2)
        assert mesh.shape["tp"] == 2


class TestShardedTraining:
    def test_loss_decreases_on_memorizable_data(self):
        """20 sharded AdamW steps on a fixed repetitive batch must cut
        the loss substantially — exercises forward, backward, collectives
        and the optimizer together."""
        mesh = build_mesh(jax.devices()[:8])
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(0), TRAIN_CFG, mesh, lr=3e-3)
            step = make_train_step(TRAIN_CFG, mesh, opt)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32) % TRAIN_CFG.vocab_size,
                         (8, 1)),
                data_sharding(mesh))
            first = None
            for i in range(20):
                params, opt_state, loss = step(params, opt_state, batch)
                if first is None:
                    first = float(loss)
            last = float(loss)
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.5, (first, last)

    def test_batched_forward_matches_unbatched_prefill(self):
        """The training forward and the inference prefill must agree on
        logits for the same weights."""
        params = llm_model.init_params(jax.random.PRNGKey(1), TRAIN_CFG,
                                       dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(2), (12,), 0,
                                  TRAIN_CFG.vocab_size, jnp.int32)
        # The batched forward carries sharding constraints (PartitionSpec)
        # and therefore needs a mesh in context.
        with build_mesh(jax.devices()[:1]):
            logits_b = lm_forward_batched(params, TRAIN_CFG, toks[None])
        cache = llm_model.KVCache.create(TRAIN_CFG, dtype=jnp.float32)
        logits_p, _ = llm_model.prefill(params, TRAIN_CFG, toks,
                                        jnp.int32(12), cache)
        np.testing.assert_allclose(np.asarray(logits_b[0, 11]),
                                   np.asarray(logits_p),
                                   rtol=2e-3, atol=2e-3)
