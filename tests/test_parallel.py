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

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


@pytest.fixture(autouse=True, scope="class")
def _clear_jit_between_classes():
    """This single module compiles more distinct XLA:CPU programs than
    any other (every parallel formation x config); with the round-5
    vocab-parallel CE/embed variants added, the accumulated LLVM JIT
    code crossed the known segfault threshold (see conftest's
    per-module clear) late in the module. Clearing per CLASS bounds
    it; the persistent disk cache makes the forced recompiles cheap."""
    yield
    jax.clear_caches()


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

    def test_sequence_parallel_loss_matches(self):
        """Megatron SP (residuals sharded over tp along the sequence)
        is a layout change, not a math change: the loss must match the
        replicated-activation layout on a tp=4 mesh."""
        mesh = build_mesh(jax.devices()[:8], tp=4)
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(1), TRAIN_CFG, mesh, lr=1e-3)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32)
                         % TRAIN_CFG.vocab_size, (8, 1)),
                data_sharding(mesh))
            losses = {}
            for sp in (False, True):
                step = make_train_step(TRAIN_CFG, mesh, opt,
                                       sequence_parallel=sp)
                _, _, loss = step(jax.tree.map(jnp.copy, params),
                                  jax.tree.map(jnp.copy, opt_state),
                                  batch)
                losses[sp] = float(loss)
        np.testing.assert_allclose(losses[True], losses[False],
                                   rtol=1e-5)

    def test_moe_training_loss_decreases(self):
        """Mixtral-style MoE fine-tuning on the mesh: expert banks
        Megatron-split within each expert, router trained jointly,
        load-balancing aux loss applied — loss must fall on a
        memorizable batch and the router must stay un-collapsed."""
        from trackiellm_tpu.parallel.train import (
            lm_forward_batched, moe_load_balancing_loss)

        cfg = TRAIN_CFG._replace(n_experts=4, n_experts_used=2)
        mesh = build_mesh(jax.devices()[:8])
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(2), cfg, mesh, lr=3e-3)
            assert params["layers"]["w_gu"].ndim == 4
            step = make_train_step(cfg, mesh, opt)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32)
                         % cfg.vocab_size, (8, 1)),
                data_sharding(mesh))
            first = None
            for _ in range(20):
                params, opt_state, loss = step(params, opt_state, batch)
                if first is None:
                    first = float(loss)
            last = float(loss)
            _, aux = lm_forward_batched(params, cfg, batch)
            balance = float(moe_load_balancing_loss(aux, cfg))
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.5, (first, last)
        # 1.0 = perfectly uniform; a collapsed router approaches E/K.
        assert balance < 1.5, balance

    def test_moe_aux_loss_uniform_is_one(self):
        from trackiellm_tpu.parallel.train import moe_load_balancing_loss

        cfg = TRAIN_CFG._replace(n_experts=4, n_experts_used=2)
        T, E = 64, 4
        probs = jnp.full((2, T, E), 1.0 / E)
        # Round-robin dispatch: each token's top-2 spread uniformly.
        w = np.zeros((2, T, E), np.float32)
        for t in range(T):
            w[:, t, t % E] = 0.5
            w[:, t, (t + 1) % E] = 0.5
        val = float(moe_load_balancing_loss((probs, jnp.asarray(w)), cfg))
        np.testing.assert_allclose(val, 1.0, rtol=1e-6)

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
            logits_b, _ = lm_forward_batched(params, TRAIN_CFG,
                                             toks[None])
        cache = llm_model.KVCache.create(TRAIN_CFG, dtype=jnp.float32)
        logits_p, _ = llm_model.prefill(params, TRAIN_CFG, toks,
                                        jnp.int32(12), cache)
        np.testing.assert_allclose(np.asarray(logits_b[0, 11]),
                                   np.asarray(logits_p),
                                   rtol=2e-3, atol=2e-3)


class TestDataPipeline:
    def test_packing_no_padding_waste(self):
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer
        from trackiellm_tpu.parallel.data import PackedDataset

        tok = ByteTokenizer()
        ds = PackedDataset(["hello world", "abc" * 50], tok, seq_len=32)
        assert len(ds) >= 4
        assert ds.rows.shape[1] == 32
        assert ds.rows.dtype == np.int32

    def test_shuffled_epochs_cover_all_rows(self):
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer
        from trackiellm_tpu.parallel.data import PackedDataset

        tok = ByteTokenizer()
        # Distinct content per row so order differences are observable.
        text = "".join(chr(33 + i % 90) for i in range(640))
        ds = PackedDataset([text], tok, seq_len=32)
        batches = list(ds.batches(batch_size=2, seed=1))
        seen = np.concatenate([b for b in batches])
        assert seen.shape[0] == (len(ds) // 2) * 2
        # Different seed, different order.
        b2 = list(ds.batches(batch_size=2, seed=2))
        assert not all(np.array_equal(a, b) for a, b in zip(batches, b2))

    def test_prefetch_iterator(self):
        from trackiellm_tpu.parallel.data import PrefetchIterator

        src = [np.full((2, 4), i, np.int32) for i in range(3)]
        out = list(PrefetchIterator(iter(src)))
        assert len(out) == 3
        assert int(out[2][0, 0]) == 2


class TestEvaluate:
    def test_perplexity_improves_with_training(self):
        """Eval perplexity on the training data must drop after the
        sharded steps (end-to-end train->eval loop)."""
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer
        from trackiellm_tpu.parallel.data import PackedDataset
        from trackiellm_tpu.parallel.evaluate import evaluate_perplexity

        tok = ByteTokenizer(TRAIN_CFG.vocab_size)
        ds = PackedDataset(["abcdefgh" * 64], tok, seq_len=TRAIN_CFG.max_seq)
        mesh = build_mesh(jax.devices()[:8])
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(3), TRAIN_CFG, mesh, lr=3e-3)
            step = make_train_step(TRAIN_CFG, mesh, opt)
            before = evaluate_perplexity(
                params, TRAIN_CFG, ds.batches(8, seed=0))
            for epoch in range(4):
                for batch in ds.batches(8, seed=epoch):
                    sharded = jax.device_put(jnp.asarray(batch),
                                             data_sharding(mesh))
                    params, opt_state, _ = step(params, opt_state, sharded)
            after = evaluate_perplexity(
                params, TRAIN_CFG, ds.batches(8, seed=0))
        assert after["perplexity"] < before["perplexity"] * 0.7
        assert after["batches"] == before["batches"] > 0


class TestShardedInference:
    """Tensor-parallel quantized inference must match the single-device
    result exactly in semantics (GSPMD repartitions the same program)."""

    CFG = llm_model.LLMConfig(
        vocab_size=512, dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
        head_dim=32, hidden_dim=512, max_seq=128, sliding_window=128)

    def _quant_params(self):
        return llm_model.quantize_params(
            llm_model.init_params(jax.random.PRNGKey(7), self.CFG,
                                  dtype=jnp.bfloat16),
            bits=4, group=64)

    def test_tp_prefill_decode_matches_single_device(self):
        from trackiellm_tpu.parallel import (
            infer_param_shardings, kv_cache_sharding,
            make_sharded_prefill, make_sharded_decode,
        )

        cfg = self.CFG
        qparams = self._quant_params()
        toks = jax.random.randint(jax.random.PRNGKey(8), (64,), 0,
                                  cfg.vocab_size, jnp.int32)
        length = jnp.int32(48)

        # Single-device oracle.
        cache0 = llm_model.KVCache.create(cfg)
        ref_logits, ref_cache = llm_model.prefill(
            qparams, cfg, toks, length, cache0)
        ref_tok = jnp.argmax(ref_logits).astype(jnp.int32)
        ref_logits2, _ = llm_model.decode_step(
            qparams, cfg, ref_tok, ref_cache, attn_len=cfg.max_seq)

        # Sharded over the 8-device mesh (tp=4).
        mesh = build_mesh(jax.devices()[:8])
        sp = jax.device_put(qparams, infer_param_shardings(mesh, True))
        sc = jax.device_put(llm_model.KVCache.create(cfg),
                            kv_cache_sharding(mesh))
        prefill_fn = make_sharded_prefill(cfg, mesh, quantized=True)
        logits, cache = prefill_fn(sp, toks, length, sc)
        decode_fn = make_sharded_decode(cfg, mesh, quantized=True,
                                        attn_len=cfg.max_seq)
        tok = jnp.argmax(logits).astype(jnp.int32)
        logits2, _ = decode_fn(sp, tok, cache)

        assert int(tok) == int(ref_tok)
        np.testing.assert_allclose(np.asarray(logits2),
                                   np.asarray(ref_logits2),
                                   rtol=3e-2, atol=3e-2)


class TestShardedMLA:
    """Tensor-parallel DeepSeek-V2 MLA: head-parallel projections over
    a replicated latent cache must match the single-device absorbed
    path exactly in semantics."""

    def _cfg_params(self, q_lora=0):
        from trackiellm_tpu.models import mla as mla_model

        cfg = mla_model.MLAConfig.tiny()._replace(
            n_heads=4, q_lora_rank=q_lora, max_seq=64)
        params = mla_model.init_params(jax.random.PRNGKey(11), cfg,
                                       dtype=jnp.float32)
        return cfg, params

    def test_tp_matches_single_device(self):
        from trackiellm_tpu.models import mla as mla_model
        from trackiellm_tpu.parallel import (
            make_sharded_mla, mla_cache_sharding, mla_param_shardings,
        )

        cfg, params = self._cfg_params()
        toks = jax.random.randint(jax.random.PRNGKey(12), (32,), 0,
                                  cfg.vocab_size, jnp.int32)
        length = jnp.int32(23)

        cache0 = mla_model.MLACache.create(cfg, dtype=jnp.float32)
        ref_logits, ref_cache = mla_model.prefill(
            params, cfg, toks, length, cache0)
        ref_tok = jnp.argmax(ref_logits).astype(jnp.int32)
        ref_logits2, _ = mla_model.decode_step(
            params, cfg, ref_tok, ref_cache, attn_len=cfg.max_seq)

        mesh = build_mesh(jax.devices()[:8])          # tp=4
        sp = jax.device_put(params, mla_param_shardings(mesh, params))
        sc = jax.device_put(
            mla_model.MLACache.create(cfg, dtype=jnp.float32),
            mla_cache_sharding(mesh))
        prefill_fn, decode_fn = make_sharded_mla(
            cfg, mesh, params, attn_len=cfg.max_seq)
        logits, cache = prefill_fn(sp, toks, length, sc)
        tok = jnp.argmax(logits).astype(jnp.int32)
        logits2, _ = decode_fn(sp, tok, cache)

        assert int(tok) == int(ref_tok)
        np.testing.assert_allclose(np.asarray(logits2),
                                   np.asarray(ref_logits2),
                                   rtol=1e-4, atol=1e-4)

    def test_q_lora_tree_shards(self):
        from trackiellm_tpu.parallel import mla_param_shardings

        cfg, params = self._cfg_params(q_lora=24)
        tree = mla_param_shardings(
            build_mesh(jax.devices()[:8]), params)
        assert "wq_b" in tree["attn"] and "wq" not in tree["attn"]
        jax.device_put(params, tree)  # placement must succeed


class TestShardedServer:
    """LLMServer(mesh=...) — the whole continuous-batching serve loop
    tensor-parallel — must produce byte-identical text to the
    single-device server (same programs, GSPMD-repartitioned)."""

    CFG = TestShardedInference.CFG

    def test_tp_server_chunked_matches_tp_per_step(self):
        """Byte identity is asserted between the per-step and the
        pipelined-chunk loops ON THE SAME MESH: the serve-loop
        semantics under sharding. (Identity vs the single-device
        server does not hold in general — the tp psum's reduction
        order legally flips greedy argmax on near-ties of random
        weights; single-vs-sharded NUMERIC equivalence is pinned at
        tolerance by TestShardedInference.)"""
        from trackiellm_tpu.llm.server import LLMServer
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        cfg = self.CFG
        params = llm_model.quantize_params(
            llm_model.init_params(jax.random.PRNGKey(7), cfg,
                                  dtype=jnp.bfloat16),
            bits=4, group=64)
        tok = ByteTokenizer(cfg.vocab_size)
        prompts = [("o que ha a frente", 21), ("descreva", 13)]
        mesh = build_mesh(jax.devices()[:8])
        assert mesh.shape["tp"] > 1  # the test must actually shard

        outs = {}
        for label, chunk in (("per_step", 1), ("chunked", 4)):
            server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                               chunk_steps=chunk, mesh=mesh,
                               cache_dtype=jnp.float32)
            try:
                assert not server.paged  # mesh forces dense
                futs = [server.submit(p, max_tokens=m)
                        for p, m in prompts]
                outs[label] = [f.result(timeout=180) for f in futs]
                if chunk > 1:
                    assert server.stats["decode_steps"] >= 4
            finally:
                server.close()
        assert outs["chunked"] == outs["per_step"]
        assert any(outs["per_step"])  # real text came back

    def test_mesh_paged_composition_contract(self):
        """Round 4: paged KV COMPOSES with the mesh (pool sharded on
        the KV-head axis). Round 5 closed the last exclusion: int8 KV
        composes too — the QuantPool's values AND per-(cell, head)
        scales shard the same head axis (quant_pool_sharding; greedy
        identity vs single-device pinned in test_server.py)."""
        import jax.numpy as jnp_

        from trackiellm_tpu.llm.paging import QuantPool
        from trackiellm_tpu.llm.server import LLMServer

        mesh = build_mesh(jax.devices()[:8])
        params = llm_model.init_params(jax.random.PRNGKey(0), self.CFG,
                                       dtype=jnp.bfloat16)
        server = LLMServer(params, self.CFG, paged=True, mesh=mesh,
                           page_size=32)
        try:
            assert server.paged and server.pool is not None
        finally:
            server.close()
        q = LLMServer(params, self.CFG, paged=True, mesh=mesh,
                      page_size=32, cache_dtype=jnp_.int8)
        try:
            assert q.paged and isinstance(q.pool.pool_k, QuantPool)
        finally:
            q.close()


class TestPipelineParallel:
    """GPipe pipeline over a pp mesh axis (parallel/pipeline.py)."""

    def _mesh(self, pp):
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()[:pp]), ("pp",))

    def test_pp_loss_matches_single_device(self):
        """Stage-sharded microbatched pipeline = plain forward, same
        math: losses must agree tightly."""
        from trackiellm_tpu.parallel.pipeline import pp_loss
        from trackiellm_tpu.parallel.train import lm_loss

        cfg = TRAIN_CFG._replace(n_layers=4)
        params = llm_model.init_params(jax.random.PRNGKey(3), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(4), (8, 32), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        with build_mesh(jax.devices()[:1]):
            ref = float(lm_loss(params, cfg, tokens))
        mesh = self._mesh(4)
        with mesh:
            got = float(pp_loss(params, cfg, mesh, tokens,
                                n_microbatches=4))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_pp_training_loss_decreases(self):
        """Full pipeline-parallel AdamW: grads flow backward through
        the ppermute hops and the bubble schedule."""
        from trackiellm_tpu.parallel.pipeline import (
            init_pp_train_state, make_pp_train_step)

        cfg = TRAIN_CFG._replace(n_layers=4)
        mesh = self._mesh(4)
        with mesh:
            params, opt_state, opt = init_pp_train_state(
                jax.random.PRNGKey(5), cfg, mesh, lr=3e-3)
            step = make_pp_train_step(cfg, mesh, opt, n_microbatches=4)
            batch = jnp.tile(jnp.arange(64, dtype=jnp.int32)
                             % cfg.vocab_size, (8, 1))
            first = None
            for _ in range(20):
                params, opt_state, loss = step(params, opt_state, batch)
                if first is None:
                    first = float(loss)
            last = float(loss)
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.5, (first, last)


class TestShardedCheckpoint:
    def test_sharded_checkpoint_roundtrip(self, tmp_path):
        """save_train_state/restore_train_state: sharded params AND
        optimizer state survive a round trip onto the mesh, shardings
        intact, and training continues identically from the restored
        step."""
        from trackiellm_tpu.parallel.train import (
            restore_train_state, save_train_state)

        mesh = build_mesh(jax.devices()[:8])
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(7), TRAIN_CFG, mesh, lr=3e-3)
            step = make_train_step(TRAIN_CFG, mesh, opt)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32)
                         % TRAIN_CFG.vocab_size, (8, 1)),
                data_sharding(mesh))
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state, batch)
            path = str(tmp_path / "ckpt")
            save_train_state(path, params, opt_state, step=3)
            p2, o2, opt2, at = restore_train_state(
                path, TRAIN_CFG, mesh, lr=3e-3)
            assert at == 3
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)), params, p2)
            assert (p2["layers"]["wqkv"].sharding
                    == params["layers"]["wqkv"].sharding)
            # Same state + same batch => the restored trajectory's next
            # loss equals the original's.
            step2 = make_train_step(TRAIN_CFG, mesh, opt2)
            _, _, loss2 = step2(p2, o2, batch)
            _, _, loss_ref = step(params, opt_state, batch)
        np.testing.assert_allclose(float(loss2), float(loss_ref),
                                   rtol=1e-6)


class TestRingAttention:
    """Context parallelism (parallel/ring.py): exact ring attention."""

    @pytest.mark.parametrize("zigzag", [True, False])
    def test_cp_forward_matches_single_device(self, zigzag):
        """Full forward with the sequence sharded over cp=4 must equal
        the plain batched forward (same weights, all S positions), in
        both the load-balanced zig-zag and contiguous layouts."""
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.ring import cp_lm_forward

        cfg = TRAIN_CFG
        params = llm_model.init_params(jax.random.PRNGKey(9), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(10), (32,), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        with build_mesh(jax.devices()[:1]):
            ref = lm_forward_batched(params, cfg, tokens[None])[0][0]
        mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))
        with mesh:
            got = cp_lm_forward(params, cfg, mesh, tokens, zigzag=zigzag)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_cp_forward_differentiable(self):
        """Ring attention backward (grads through the ppermute ring):
        a loss gradient exists, is finite, and matches the
        single-device gradient."""
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.ring import cp_lm_forward

        cfg = TRAIN_CFG
        params = llm_model.init_params(jax.random.PRNGKey(9), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(10), (32,), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))

        def loss_cp(p):
            lg = cp_lm_forward(p, cfg, mesh, tokens)
            logp = jax.nn.log_softmax(lg[:-1], axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, tokens[1:, None], axis=-1))

        def loss_ref(p):
            lg = lm_forward_batched(p, cfg, tokens[None])[0][0]
            logp = jax.nn.log_softmax(lg[:-1], axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, tokens[1:, None], axis=-1))

        with mesh:
            g_cp = jax.grad(loss_cp)(params)
        with build_mesh(jax.devices()[:1]):
            g_ref = jax.grad(loss_ref)(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
            g_cp, g_ref)


class TestMoEOnPipelineAndRing:
    def test_pp_loss_matches_single_device_moe(self):
        """MoE configs flow through the pipeline (the stage block uses
        the shared config-aware _mlp); loss equals the single-device
        loss with the aux term off."""
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.pipeline import pp_loss
        from trackiellm_tpu.parallel.train import lm_loss

        cfg = TRAIN_CFG._replace(n_layers=4, n_experts=4,
                                 n_experts_used=2)
        params = llm_model.init_params(jax.random.PRNGKey(11), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(12), (8, 32), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        with build_mesh(jax.devices()[:1]):
            ref = float(lm_loss(params, cfg, tokens, moe_aux_coef=0.0))
        mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
        with mesh:
            got = float(pp_loss(params, cfg, mesh, tokens,
                                n_microbatches=4))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_cp_forward_matches_single_device_moe(self):
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.ring import cp_lm_forward

        cfg = TRAIN_CFG._replace(n_experts=4, n_experts_used=2)
        params = llm_model.init_params(jax.random.PRNGKey(13), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(14), (32,), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        with build_mesh(jax.devices()[:1]):
            ref = lm_forward_batched(params, cfg, tokens[None])[0][0]
        mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))
        with mesh:
            got = cp_lm_forward(params, cfg, mesh, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestVocabParallelEmbed:
    def test_loss_identical_with_and_without(self):
        """The Megatron vocab-parallel lookup (masked local gather +
        psum / psum_scatter) is a layout change, not a math change:
        train-step loss must match the plain gather on a tp=4 mesh,
        in both residual layouts (VERDICT r4 #3)."""
        from trackiellm_tpu.parallel.train import lm_loss

        mesh = build_mesh(jax.devices()[:8], tp=4)
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(2), TRAIN_CFG, mesh, lr=1e-3)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32)
                         % TRAIN_CFG.vocab_size, (8, 1)),
                data_sharding(mesh))
            for sp in (False, True):
                plain = float(jax.jit(
                    lambda p, t: lm_loss(p, TRAIN_CFG, t,
                                         sequence_parallel=sp))(
                    params, batch))
                vp = float(jax.jit(
                    lambda p, t: lm_loss(p, TRAIN_CFG, t,
                                         sequence_parallel=sp,
                                         mesh=mesh))(params, batch))
                np.testing.assert_allclose(vp, plain, rtol=1e-5,
                                           err_msg=f"sp={sp}")

    def test_train_step_uses_it_and_trains(self):
        """make_train_step wires the mesh through; loss still falls."""
        mesh = build_mesh(jax.devices()[:8], tp=2)
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(3), TRAIN_CFG, mesh, lr=3e-3)
            step = make_train_step(TRAIN_CFG, mesh, opt)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32)
                         % TRAIN_CFG.vocab_size, (8, 1)),
                data_sharding(mesh))
            first = last = None
            for _ in range(10):
                params, opt_state, loss = step(params, opt_state, batch)
                first = float(loss) if first is None else first
            last = float(loss)
        assert last < first * 0.7, (first, last)


class TestVocabParallelCE:
    def test_matches_dense_cross_entropy(self):
        """vocab_parallel_ce (head column-sharded over tp, two-psum
        softmax stats, masked target lookup) equals the plain
        full-logits cross-entropy."""
        from trackiellm_tpu.parallel.train import vocab_parallel_ce

        B, S, D, V = 8, 16, 32, 128
        key = jax.random.PRNGKey(15)
        x = jax.random.normal(key, (B, S, D), jnp.float32)
        head = jax.random.normal(jax.random.fold_in(key, 1), (D, V),
                                 jnp.float32)
        tokens = jax.random.randint(jax.random.fold_in(key, 2), (B, S),
                                    0, V).astype(jnp.int32)
        logits = np.einsum("bsd,dv->bsv", np.asarray(x[:, :-1]),
                           np.asarray(head))
        m = logits.max(-1, keepdims=True)
        lse = np.log(np.exp(logits - m).sum(-1)) + m[..., 0]
        tgt = np.take_along_axis(
            logits, np.asarray(tokens[:, 1:])[..., None], axis=-1)[..., 0]
        ref = float((lse - tgt).mean())
        mesh = build_mesh(jax.devices()[:8], tp=4)
        with mesh:
            got = float(vocab_parallel_ce(x, head, tokens, mesh))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestReviewRound3Fixes:
    def test_pp_grads_match_single_device(self):
        """Gradients THROUGH the pipeline (scan + ppermute + masked
        psum transpose under check_rep=False) equal the single-device
        gradients — catches any collective-transpose scaling that the
        loss-decreases test can't (AdamW is scale-invariant)."""
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.pipeline import pp_loss
        from trackiellm_tpu.parallel.train import lm_loss

        cfg = TRAIN_CFG._replace(n_layers=4)
        params = llm_model.init_params(jax.random.PRNGKey(21), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(22), (8, 32), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
        with mesh:
            g_pp = jax.grad(
                lambda p: pp_loss(p, cfg, mesh, tokens,
                                  n_microbatches=4))(params)
        with build_mesh(jax.devices()[:1]):
            g_ref = jax.grad(lambda p: lm_loss(p, cfg, tokens))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
            g_pp, g_ref)

    def test_pp_train_step_rejects_moe(self):
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.pipeline import make_pp_train_step

        cfg = TRAIN_CFG._replace(n_experts=4, n_experts_used=2)
        mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
        import optax
        with pytest.raises(AssertionError, match="load-balancing"):
            make_pp_train_step(cfg, mesh, optax.adamw(1e-4),
                               n_microbatches=2)


class TestExpertParallel:
    """GShard-style expert parallelism (parallel/moe.py): whole experts
    sharded over an ``ep`` mesh axis, capacity-based dispatch."""

    def test_ep_mesh_axes(self):
        mesh = build_mesh(jax.devices()[:8], ep=2, tp=2)
        assert mesh.axis_names == ("dp", "fsdp", "ep", "tp")
        assert mesh.shape["ep"] == 2 and mesh.shape["tp"] == 2
        assert np.prod(list(mesh.shape.values())) == 8

    def test_dispatch_combine_drop_semantics(self):
        """cap=2, k=1, all four tokens choose expert 0: the first two
        claim slots, the rest are dropped (zero weight -> residual)."""
        from trackiellm_tpu.parallel.moe import dispatch_combine

        probs = jnp.asarray(np.tile([0.9, 0.1], (4, 1)), jnp.float32)
        dispatch, combine, weights = dispatch_combine(probs, k=1, cap=2)
        d = np.asarray(dispatch)
        np.testing.assert_array_equal(d.sum(axis=(1, 2)), [1, 1, 0, 0])
        # Kept tokens occupy distinct slots of expert 0.
        assert d[0, 0, 0] == 1 and d[1, 0, 1] == 1
        w = np.asarray(weights)
        assert w[0, 0] == 1.0 and w[2].sum() == 0.0  # renormalized k=1

    def test_dispatch_priority_first_choices_win(self):
        """GShard slot priority: EVERY k=0 assignment claims a slot
        before any k=1 assignment — a congested expert drops second
        choices first, even for earlier tokens."""
        from trackiellm_tpu.parallel.moe import dispatch_combine

        # Token 0 wants expert 0 only as its SECOND choice; tokens 1-2
        # want it first. cap=2: tokens 1-2 must win, token 0's second
        # choice is dropped despite its lower token index.
        probs = jnp.asarray([[0.4, 0.6],
                             [0.9, 0.1],
                             [0.9, 0.1]], jnp.float32)
        dispatch, _, weights = dispatch_combine(probs, k=2, cap=2)
        d = np.asarray(dispatch)
        assert d[1, 0].sum() == 1 and d[2, 0].sum() == 1
        assert d[0, 0].sum() == 0          # token 0 dropped on expert 0
        assert np.asarray(weights)[0, 1] > 0  # but kept on expert 1

    def test_ep_forward_matches_dense_formulation(self):
        """At a drop-free capacity (factor = E/k) the EP GShard path is
        numerically the dense all-experts formulation: same logits, same
        router aux, on the real 8-device ep mesh."""
        cfg = TRAIN_CFG._replace(n_experts=4, n_experts_used=2)
        mesh = build_mesh(jax.devices()[:8], ep=2, tp=2)
        with mesh:
            params, _, _ = init_train_state(
                jax.random.PRNGKey(3), cfg, mesh, lr=1e-3)
            batch = jax.device_put(
                jnp.tile(jnp.arange(32, dtype=jnp.int32)
                         % cfg.vocab_size, (4, 1)),
                data_sharding(mesh))
            logits_ep, aux_ep = jax.jit(
                lambda p, t: lm_forward_batched(
                    p, cfg, t, expert_parallel=True,
                    moe_capacity_factor=cfg.n_experts
                    / cfg.n_experts_used))(params, batch)
            logits_d, aux_d = jax.jit(
                lambda p, t: lm_forward_batched(p, cfg, t))(params, batch)
        np.testing.assert_allclose(np.asarray(logits_ep),
                                   np.asarray(logits_d),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(aux_ep[1]),
                                   np.asarray(aux_d[1]),
                                   rtol=1e-5, atol=1e-6)

    def test_ep_training_loss_decreases(self):
        """End-to-end: make_train_step auto-selects the EP dispatch on
        an ep mesh, expert banks are sharded whole-expert, and the loss
        falls on a memorizable batch (the combine weights carry the
        router gradient)."""
        from jax.sharding import PartitionSpec as P

        cfg = TRAIN_CFG._replace(n_experts=4, n_experts_used=2)
        mesh = build_mesh(jax.devices()[:8], ep=2, tp=2)
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(4), cfg, mesh, lr=3e-3)
            assert params["layers"]["w_gu"].sharding.spec == P(
                None, "ep", "fsdp", "tp")
            step = make_train_step(cfg, mesh, opt)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32)
                         % cfg.vocab_size, (8, 1)),
                data_sharding(mesh))
            first = None
            for _ in range(20):
                params, opt_state, loss = step(params, opt_state, batch)
                if first is None:
                    first = float(loss)
            last = float(loss)
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.5, (first, last)


ZOO_CFG = TRAIN_CFG._replace(
    # Every family feature at once (superset of Gemma-2 + Qwen2):
    # QKV biases, GeGLU, sandwich norms, attn+logit softcaps, query
    # scaling, alternating sliding windows (16 < max_seq -> active).
    qkv_bias=True, act="gelu", post_norms=True, attn_softcap=50.0,
    logit_softcap=30.0, query_pre_attn_scalar=48.0,
    sliding_window=16, alt_window=True)


class TestFamilyZooParallel:
    """The parallel forwards share one config-aware layer body
    (parallel/layers.py) and must match the inference paths on the
    FULL family zoo — not just plain GQA (which they used to refuse)."""

    def test_zoo_batched_forward_matches_prefill(self):
        params = llm_model.init_params(jax.random.PRNGKey(31), ZOO_CFG,
                                       dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(32), (24,), 0,
                                  ZOO_CFG.vocab_size, jnp.int32)
        with build_mesh(jax.devices()[:1]):
            logits_b, _ = lm_forward_batched(params, ZOO_CFG, toks[None])
        cache = llm_model.KVCache.create(ZOO_CFG, dtype=jnp.float32)
        logits_p, _ = llm_model.prefill(params, ZOO_CFG, toks,
                                        jnp.int32(24), cache)
        np.testing.assert_allclose(np.asarray(logits_b[0, 23]),
                                   np.asarray(logits_p),
                                   rtol=2e-3, atol=2e-3)

    def test_zoo_gemma3_dual_rope_matches_prefill(self):
        """Gemma-3 flavor through the shared parallel layer body:
        N:1 window pattern + DUAL rope (local theta on sliding layers,
        linearly-scaled global elsewhere) + per-head QK norms must
        match the inference prefill exactly."""
        cfg = ZOO_CFG._replace(
            alt_window=False, window_pattern=3, qk_norm=True,
            rope_local_theta=500.0, attn_softcap=0.0, logit_softcap=0.0)
        params = llm_model.init_params(jax.random.PRNGKey(33), cfg,
                                       dtype=jnp.float32)
        params["rope_factors"] = llm_model.linear_rope_factors(cfg, 4.0)
        toks = jax.random.randint(jax.random.PRNGKey(34), (24,), 0,
                                  cfg.vocab_size, jnp.int32)
        with build_mesh(jax.devices()[:1]):
            logits_b, _ = lm_forward_batched(params, cfg, toks[None])
        cache = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        logits_p, _ = llm_model.prefill(params, cfg, toks,
                                        jnp.int32(24), cache)
        np.testing.assert_allclose(np.asarray(logits_b[0, 23]),
                                   np.asarray(logits_p),
                                   rtol=2e-3, atol=2e-3)

    def test_zoo_pp_loss_matches_lm_loss(self):
        """4 pipeline stages x 1 layer each: the alternating-window
        policy must key on the GLOBAL layer index across stages."""
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.pipeline import pp_loss
        from trackiellm_tpu.parallel.train import lm_loss

        cfg = ZOO_CFG._replace(n_layers=4)
        params = llm_model.init_params(jax.random.PRNGKey(33), cfg,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(34), (8, 32), 0,
                                    cfg.vocab_size).astype(jnp.int32)
        with build_mesh(jax.devices()[:1]):
            ref = float(lm_loss(params, cfg, tokens))
        mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
        with mesh:
            got = float(pp_loss(params, cfg, mesh, tokens,
                                n_microbatches=4))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    @pytest.mark.parametrize("zigzag", [True, False])
    def test_zoo_cp_forward_matches_single_device(self, zigzag):
        """Ring attention with softcap + per-layer sliding windows
        (masked from GLOBAL positions, so both token-to-device
        layouts stay exact)."""
        from jax.sharding import Mesh
        from trackiellm_tpu.parallel.ring import cp_lm_forward

        params = llm_model.init_params(jax.random.PRNGKey(35), ZOO_CFG,
                                       dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(36), (32,), 0,
                                    ZOO_CFG.vocab_size).astype(jnp.int32)
        with build_mesh(jax.devices()[:1]):
            ref = lm_forward_batched(params, ZOO_CFG, tokens[None])[0][0]
        mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))
        with mesh:
            got = cp_lm_forward(params, ZOO_CFG, mesh, tokens,
                                zigzag=zigzag)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_zoo_trainable(self):
        """Gradients flow through every zoo feature on the sharded
        train step (loss falls on a memorizable batch)."""
        mesh = build_mesh(jax.devices()[:8])
        with mesh:
            params, opt_state, opt = init_train_state(
                jax.random.PRNGKey(37), ZOO_CFG, mesh, lr=3e-3)
            step = make_train_step(ZOO_CFG, mesh, opt)
            batch = jax.device_put(
                jnp.tile(jnp.arange(64, dtype=jnp.int32)
                         % ZOO_CFG.vocab_size, (8, 1)),
                data_sharding(mesh))
            first = None
            for _ in range(20):
                params, opt_state, loss = step(params, opt_state, batch)
                if first is None:
                    first = float(loss)
            last = float(loss)
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.6, (first, last)


class TestInferenceOnlyKnobsRefused:
    """The inference-only structural knobs (Command-R's parallel
    residual, Llama-4's chunked attention, interleaved dense/MoE)
    must REFUSE the train/pipeline/ring body loudly — a silent
    sequential/full-attention/all-MoE fallback would train the wrong
    model."""

    @pytest.mark.parametrize("knob", [
        dict(parallel_residual=True, norm_type="layernorm"),
        dict(attn_chunk=8, nope_pattern=2),
    ])
    def test_parallel_body_refuses(self, knob):
        cfg = ZOO_CFG._replace(**knob)
        params = llm_model.init_params(jax.random.PRNGKey(35), cfg,
                                       dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(36), (8,), 0,
                                  cfg.vocab_size, jnp.int32)
        with pytest.raises(NotImplementedError,
                           match="inference-only"):
            with build_mesh(jax.devices()[:1]):
                lm_forward_batched(params, cfg, toks[None])

    def test_mlp_without_layer_index_refuses_interleave(self):
        from trackiellm_tpu.models.llm import _mlp

        cfg = ZOO_CFG._replace(n_experts=2, moe_pattern=2)
        with pytest.raises(NotImplementedError, match="layer index"):
            _mlp(jnp.zeros((2, ZOO_CFG.dim)), {}, cfg)
