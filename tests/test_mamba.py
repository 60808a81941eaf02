"""Mamba (selective SSM) family correctness against the transformers
oracle.

A tiny random-weight ``MambaForCausalLM`` (slow path) is ground truth.
The rebuild's prefill runs the recurrence as ONE
``jax.lax.associative_scan`` (O(log S) depth) instead of the oracle's
sequential Python loop — teacher-forced logits must still match
exactly; decode is the O(1)-state single-step path; extend (chunked
prefill from live state) must equal the one-shot prefill. Reference
analogue: llama.cpp's mamba arch behind the reference's loader
(src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import mamba as M

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

SEQ = 14


@pytest.fixture(scope="module")
def oracle():
    from transformers import MambaConfig, MambaForCausalLM

    hf_cfg = MambaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        state_size=8, conv_kernel=4, intermediate_size=64,
        time_step_rank=4, layer_norm_epsilon=1e-5, use_bias=False,
        use_conv_bias=True, use_mambapy=False, use_cache=False,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    model = MambaForCausalLM(hf_cfg).eval()
    tokens = torch.randint(3, 96, (1, SEQ + 4),
                           generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = model(tokens).logits[0].numpy()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return state, tokens[0].numpy(), ref


@pytest.fixture(scope="module")
def converted(oracle):
    return C.mamba_from_hf(oracle[0], max_seq=64)


class TestMambaOracle:
    def test_prefill_logits_match(self, oracle, converted):
        _, tokens, ref = oracle
        params, cfg = converted
        cache = M.MambaCache.create(cfg)
        padded = np.zeros(16, np.int32)
        padded[:SEQ] = tokens[:SEQ]
        logits, cache = M.prefill(params, cfg, jnp.asarray(padded),
                                  jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   atol=3e-4, rtol=1e-3)

    def test_decode_steps_match(self, oracle, converted):
        """Teacher-forced decode over ground-truth continuations:
        proves the carried (conv, ssm) state is the oracle's."""
        _, tokens, ref = oracle
        params, cfg = converted
        cache = M.MambaCache.create(cfg)
        padded = np.zeros(16, np.int32)
        padded[:SEQ] = tokens[:SEQ]
        logits, cache = M.prefill(params, cfg, jnp.asarray(padded),
                                  jnp.int32(SEQ), cache)
        for j in range(4):
            logits, cache = M.decode_step(
                params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
            np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                       atol=3e-4, rtol=1e-3)

    def test_extend_equals_prefill(self, oracle, converted):
        """Chunked ingestion (state folded into the scan's first
        element) == one-shot prefill, across an uneven split."""
        _, tokens, _ = oracle
        params, cfg = converted
        one = M.MambaCache.create(cfg)
        padded = np.zeros(16, np.int32)
        padded[:SEQ] = tokens[:SEQ]
        ref_logits, ref_cache = M.prefill(
            params, cfg, jnp.asarray(padded), jnp.int32(SEQ), one)

        cache = M.MambaCache.create(cfg)
        split = 5
        p1 = np.zeros(8, np.int32)
        p1[:split] = tokens[:split]
        _, cache = M.prefill(params, cfg, jnp.asarray(p1),
                             jnp.int32(split), cache)
        p2 = np.zeros(16, np.int32)
        p2[: SEQ - split] = tokens[split:SEQ]
        logits, cache = M.extend(params, cfg, jnp.asarray(p2),
                                 jnp.int32(SEQ - split), cache)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cache.ssm),
                                   np.asarray(ref_cache.ssm),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cache.conv),
                                   np.asarray(ref_cache.conv),
                                   atol=2e-5, rtol=1e-5)

    def test_padded_tail_does_not_contaminate_state(self, converted,
                                                    oracle):
        """Garbage in the padded rows past ``length`` must not leak
        into the captured state (state is taken AT length-1)."""
        _, tokens, _ = oracle
        params, cfg = converted
        a = np.zeros(16, np.int32)
        a[:SEQ] = tokens[:SEQ]
        b = np.full(16, 7, np.int32)
        b[:SEQ] = tokens[:SEQ]
        la, ca = M.prefill(params, cfg, jnp.asarray(a), jnp.int32(SEQ),
                           M.MambaCache.create(cfg))
        lb, cb = M.prefill(params, cfg, jnp.asarray(b), jnp.int32(SEQ),
                           M.MambaCache.create(cfg))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(np.asarray(ca.ssm),
                                      np.asarray(cb.ssm))
        np.testing.assert_array_equal(np.asarray(ca.conv),
                                      np.asarray(cb.conv))


class TestMambaRunner:
    def test_greedy_generate_matches_oracle_generate(self, oracle,
                                                     converted):
        from transformers import MambaConfig, MambaForCausalLM

        state, tokens, _ = oracle
        params, cfg = converted
        hf_cfg = MambaConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            state_size=8, conv_kernel=4, intermediate_size=64,
            time_step_rank=4, use_bias=False, use_conv_bias=True,
            use_mambapy=False, tie_word_embeddings=False,
            bos_token_id=1, eos_token_id=2)
        torch.manual_seed(0)
        model = MambaForCausalLM(hf_cfg).eval()
        prompt_ids = torch.tensor([list(map(int, tokens[:6]))])
        with torch.no_grad():
            out = model.generate(prompt_ids, max_new_tokens=6,
                                 do_sample=False)
        ref_cont = out[0, 6:].tolist()

        from trackiellm_tpu.llm.runner import GenerationConfig

        class IdTok:
            eos_id = 2
            def encode(self, text, add_bos=True):
                return [int(x) for x in text.split()]
            def decode(self, ids):
                return " ".join(str(i) for i in ids)

        runner = M.MambaRunner(
            params, cfg, tokenizer=IdTok(),
            gen_config=GenerationConfig(max_tokens=6, temperature=0.0))
        runner.generate(" ".join(str(int(t)) for t in tokens[:6]))
        got = runner._generated_ids
        if 2 in ref_cont:
            ref_cont = ref_cont[: ref_cont.index(2)]
        assert got == ref_cont

    def test_chunk_greedy_matches_serial(self, converted, oracle):
        _, tokens, _ = oracle
        params, cfg = converted
        cache = M.MambaCache.create(cfg)
        padded = np.zeros(16, np.int32)
        padded[:SEQ] = tokens[:SEQ]
        logits, cache = M.prefill(params, cfg, jnp.asarray(padded),
                                  jnp.int32(SEQ), cache)
        toks, lg, cache2 = M.decode_chunk_greedy(
            params, cfg, logits, cache, 5)
        serial = []
        lgs, cs = logits, cache
        for _ in range(5):
            t = int(jnp.argmax(lgs))
            serial.append(t)
            lgs, cs = M.decode_step(params, cfg, jnp.int32(t), cs)
        assert [int(t) for t in toks] == serial
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lgs),
                                   atol=1e-5)


class TestMambaCLI:
    def test_convert_and_generate(self, oracle, tmp_path):
        from trackiellm_tpu import __main__ as cli
        state = oracle[0]
        np.savez(tmp_path / "mamba.npz", **state)
        ckpt = str(tmp_path / "ckpt")
        assert cli.main(["convert", str(tmp_path / "mamba.npz"),
                         "-o", ckpt, "--family", "mamba-hf",
                         "--bits", "0"]) == 0
        assert cli.main(["generate", ckpt, "-p", "ola",
                         "--max-tokens", "4", "--temperature", "0"]) == 0


class TestMamba2Oracle:
    """Mamba-2 (SSD): per-head scalar decay, grouped B/C, gated norm —
    vs transformers Mamba2ForCausalLM.torch_forward."""

    @pytest.fixture(scope="class")
    def oracle2(self):
        from transformers import Mamba2Config, Mamba2ForCausalLM

        hf_cfg = Mamba2Config(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_heads=4, head_dim=16, state_size=16, n_groups=2,
            expand=2, conv_kernel=4, chunk_size=8,
            layer_norm_epsilon=1e-5, use_bias=False, use_conv_bias=True,
            tie_word_embeddings=False, bos_token_id=1, eos_token_id=2)
        torch.manual_seed(0)
        model = Mamba2ForCausalLM(hf_cfg).eval()
        tokens = torch.randint(3, 96, (1, SEQ + 4),
                               generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            ref = model(tokens).logits[0].numpy()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        return state, tokens[0].numpy(), ref

    @pytest.fixture(scope="class")
    def converted2(self, oracle2):
        return C.mamba2_from_hf(oracle2[0], n_groups=2, max_seq=64)

    def test_prefill_and_decode_match(self, oracle2, converted2):
        from trackiellm_tpu.models import mamba2 as M2
        _, tokens, ref = oracle2
        params, cfg = converted2
        assert cfg.n_heads == 4 and cfg.head_dim == 16
        cache = M2.Mamba2Cache.create(cfg)
        padded = np.zeros(16, np.int32)
        padded[:SEQ] = tokens[:SEQ]
        logits, cache = M2.prefill(params, cfg, jnp.asarray(padded),
                                   jnp.int32(SEQ), cache)
        np.testing.assert_allclose(np.asarray(logits), ref[SEQ - 1],
                                   atol=3e-4, rtol=1e-3)
        for j in range(4):
            logits, cache = M2.decode_step(
                params, cfg, jnp.int32(int(tokens[SEQ + j])), cache)
            np.testing.assert_allclose(np.asarray(logits), ref[SEQ + j],
                                       atol=3e-4, rtol=1e-3)

    def test_extend_equals_prefill(self, oracle2, converted2):
        from trackiellm_tpu.models import mamba2 as M2
        _, tokens, _ = oracle2
        params, cfg = converted2
        padded = np.zeros(16, np.int32)
        padded[:SEQ] = tokens[:SEQ]
        ref_logits, ref_cache = M2.prefill(
            params, cfg, jnp.asarray(padded), jnp.int32(SEQ),
            M2.Mamba2Cache.create(cfg))
        cache = M2.Mamba2Cache.create(cfg)
        split = 6
        p1 = np.zeros(8, np.int32)
        p1[:split] = tokens[:split]
        _, cache = M2.prefill(params, cfg, jnp.asarray(p1),
                              jnp.int32(split), cache)
        p2 = np.zeros(8, np.int32)
        p2[: SEQ - split] = tokens[split:SEQ]
        logits, cache = M2.extend(params, cfg, jnp.asarray(p2),
                                  jnp.int32(SEQ - split), cache)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cache.ssm),
                                   np.asarray(ref_cache.ssm),
                                   atol=2e-5, rtol=1e-5)

    def test_group_sharing_is_load_bearing(self, oracle2):
        """Converting with the wrong n_groups must fail the geometry
        check (B/C widths wouldn't divide)."""
        from trackiellm_tpu.utils.errors import TrackieError
        with pytest.raises(TrackieError):
            C.mamba2_from_hf(oracle2[0], n_groups=3)

    def test_cli_convert_and_generate_mamba2(self, oracle2, tmp_path):
        from trackiellm_tpu import __main__ as cli
        state = oracle2[0]
        np.savez(tmp_path / "m2.npz", **state)
        ckpt = str(tmp_path / "ckpt2")
        # n_groups isn't shape-derivable; the CLI default (8) won't fit
        # this tiny fixture, so convert via the API and save like the
        # CLI would, then drive generate end-to-end.
        from trackiellm_tpu.models.checkpoint import save_checkpoint
        params, cfg = C.mamba2_from_hf(state, n_groups=2, max_seq=64)
        save_checkpoint(ckpt, params, config=cfg, metadata={})
        assert cli.main(["generate", ckpt, "-p", "ola",
                         "--max-tokens", "4", "--temperature", "0"]) == 0


class TestMambaQuantized:
    def test_q8_close_to_dense_and_consistent(self, oracle, converted):
        """Q8 mamba: prefill close to dense; decode-vs-extend carried
        state stays self-consistent (exactness is within the quantized
        model, closeness is vs the dense one)."""
        _, tokens, _ = oracle
        params, cfg = converted
        qparams = M.quantize_params(params, bits=8, group=16)
        padded = np.zeros(16, np.int32)
        padded[:SEQ] = tokens[:SEQ]
        dense_logits, _ = M.prefill(params, cfg, jnp.asarray(padded),
                                    jnp.int32(SEQ),
                                    M.MambaCache.create(cfg))
        q_logits, q_cache = M.prefill(qparams, cfg, jnp.asarray(padded),
                                      jnp.int32(SEQ),
                                      M.MambaCache.create(cfg))
        d = np.asarray(dense_logits)
        q = np.asarray(q_logits)
        assert np.abs(d - q).max() < 0.15 * (np.abs(d).max() + 1)
        # chunked-vs-oneshot identity holds under quantization
        cache = M.MambaCache.create(cfg)
        p1 = np.zeros(8, np.int32)
        p1[:5] = tokens[:5]
        _, cache = M.prefill(qparams, cfg, jnp.asarray(p1), jnp.int32(5),
                             cache)
        p2 = np.zeros(16, np.int32)
        p2[: SEQ - 5] = tokens[5:SEQ]
        logits2, cache2 = M.extend(qparams, cfg, jnp.asarray(p2),
                                   jnp.int32(SEQ - 5), cache)
        np.testing.assert_allclose(np.asarray(logits2), q,
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(cache2.ssm),
                                   np.asarray(q_cache.ssm),
                                   atol=2e-5, rtol=1e-4)


class TestMambaCortex:
    def test_cortex_turn_with_mamba_brain(self, converted):
        """The production cortex drives a MambaRunner end-to-end (the
        duck-typed runner surface: build_prompt / generate(tools=,
        on_token=, should_stop=) / count_tokens)."""
        import time

        from trackiellm_tpu.cortex.main import Cortex, CortexConfig
        from trackiellm_tpu.llm.runner import GenerationConfig

        params, cfg = converted
        runner = M.MambaRunner(
            params, cfg._replace(max_seq=2048),
            gen_config=GenerationConfig(max_tokens=4, temperature=0.0))
        responses = []
        c = Cortex(llm_runner=runner,
                   config=CortexConfig(system_prompt="s"),
                   on_response=responses.append)
        c.run()
        c.inject_user_text("oi")
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and not responses:
            time.sleep(0.05)
        c.stop(timeout=5.0)
        assert responses, "no reply produced through the mamba runner"


class TestMambaGGUF:
    """llama.cpp mamba-arch GGUF ingestion (gguf_to_mamba_params):
    synthetic-GGUF roundtrip vs mamba_from_hf on the same weights.

    The writer applies llama.cpp's converter transforms independently
    (conv squeeze to (I, K), ssm_a = -exp(A_log)) so the reader is
    validated against the convention, not against itself."""

    def _hf_state(self, cfg, seed=0):
        rng = np.random.default_rng(seed)
        R = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1

        state = {
            "backbone.embeddings.weight": R(cfg.vocab_size, cfg.dim),
            "backbone.norm_f.weight": R(cfg.dim) + 1.0,
            "lm_head.weight": R(cfg.vocab_size, cfg.dim),
        }
        for i in range(cfg.n_layers):
            p = f"backbone.layers.{i}."
            state[p + "norm.weight"] = R(cfg.dim) + 1.0
            state[p + "mixer.in_proj.weight"] = R(2 * cfg.d_inner, cfg.dim)
            state[p + "mixer.conv1d.weight"] = R(cfg.d_inner, 1, cfg.d_conv)
            state[p + "mixer.conv1d.bias"] = R(cfg.d_inner)
            state[p + "mixer.x_proj.weight"] = R(
                cfg.dt_rank + 2 * cfg.d_state, cfg.d_inner)
            state[p + "mixer.dt_proj.weight"] = R(cfg.d_inner, cfg.dt_rank)
            state[p + "mixer.dt_proj.bias"] = R(cfg.d_inner)
            state[p + "mixer.A_log"] = np.log(
                rng.uniform(0.5, 4.0, (cfg.d_inner, cfg.d_state))
            ).astype(np.float32)
            state[p + "mixer.D"] = R(cfg.d_inner) + 1.0
            state[p + "mixer.out_proj.weight"] = R(cfg.dim, cfg.d_inner)
        return state

    def _write(self, path, cfg, state, metadata_override=None,
               flip_a_sign=False):
        from tests.test_loader import write_gguf
        from trackiellm_tpu.models import loader as L

        F32 = L.GGML_F32
        t = {
            "token_embd.weight": (state["backbone.embeddings.weight"], F32),
            "output_norm.weight": (state["backbone.norm_f.weight"], F32),
            "output.weight": (state["lm_head.weight"], F32),
        }
        for i in range(cfg.n_layers):
            p, b = f"backbone.layers.{i}.", f"blk.{i}."
            a = -np.exp(state[p + "mixer.A_log"])
            if flip_a_sign:
                a = -a
            t[b + "attn_norm.weight"] = (state[p + "norm.weight"], F32)
            t[b + "ssm_in.weight"] = (state[p + "mixer.in_proj.weight"], F32)
            t[b + "ssm_conv1d.weight"] = (
                state[p + "mixer.conv1d.weight"][:, 0, :], F32)
            t[b + "ssm_conv1d.bias"] = (state[p + "mixer.conv1d.bias"], F32)
            t[b + "ssm_x.weight"] = (state[p + "mixer.x_proj.weight"], F32)
            t[b + "ssm_dt.weight"] = (state[p + "mixer.dt_proj.weight"], F32)
            t[b + "ssm_dt.bias"] = (state[p + "mixer.dt_proj.bias"], F32)
            t[b + "ssm_a"] = (a, F32)
            t[b + "ssm_d"] = (state[p + "mixer.D"], F32)
            t[b + "ssm_out.weight"] = (state[p + "mixer.out_proj.weight"],
                                       F32)
        md = {
            "general.architecture": "mamba",
            "mamba.block_count": cfg.n_layers,
            "mamba.context_length": 64,
            "mamba.embedding_length": cfg.dim,
            "mamba.ssm.conv_kernel": cfg.d_conv,
            "mamba.ssm.inner_size": cfg.d_inner,
            "mamba.ssm.state_size": cfg.d_state,
            "mamba.ssm.time_step_rank": cfg.dt_rank,
            "mamba.attention.layer_norm_rms_epsilon": 1e-5,
        }
        md.update(metadata_override or {})
        write_gguf(path, t, md)

    def test_roundtrip_matches_hf_route(self, tmp_path):
        import jax

        cfg = M.MambaConfig.test()
        state = self._hf_state(cfg)
        ref_params, ref_cfg = C.mamba_from_hf(state, max_seq=64)
        path = str(tmp_path / "mamba.gguf")
        self._write(path, cfg, state)
        params, got_cfg = C.gguf_to_mamba_params(path, max_seq=64)

        assert got_cfg.norm_eps == pytest.approx(ref_cfg.norm_eps)
        assert got_cfg._replace(norm_eps=0) == ref_cfg._replace(norm_eps=0)
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_params))
        flat_got = dict(jax.tree_util.tree_leaves_with_path(params))
        assert flat_ref.keys() == flat_got.keys()
        for key, leaf in flat_ref.items():
            # A_log pays one f32 exp/log roundtrip (format transform);
            # everything else is byte-exact.
            tol = 1e-5 if "A_log" in str(key) else 0.0
            np.testing.assert_allclose(
                np.asarray(flat_got[key]), np.asarray(leaf),
                rtol=tol, atol=tol, err_msg=str(key))

    def test_geometry_mismatch_raises(self, tmp_path):
        from trackiellm_tpu.utils.errors import TrackieError

        cfg = M.MambaConfig.test()
        state = self._hf_state(cfg)
        path = str(tmp_path / "bad_geom.gguf")
        self._write(path, cfg, state,
                    metadata_override={"mamba.ssm.state_size":
                                       cfg.d_state + 1})
        with pytest.raises(TrackieError, match="state_size"):
            C.gguf_to_mamba_params(path, max_seq=64)

    def test_positive_ssm_a_raises(self, tmp_path):
        from trackiellm_tpu.utils.errors import TrackieError

        cfg = M.MambaConfig.test()
        state = self._hf_state(cfg)
        path = str(tmp_path / "bad_a.gguf")
        self._write(path, cfg, state, flip_a_sign=True)
        with pytest.raises(TrackieError, match="ssm_a"):
            C.gguf_to_mamba_params(path, max_seq=64)

    def test_wrong_arch_raises(self, tmp_path):
        from tests.test_loader import write_gguf
        from trackiellm_tpu.utils.errors import TrackieError

        path = str(tmp_path / "notmamba.gguf")
        write_gguf(path, {}, {"general.architecture": "llama"})
        with pytest.raises(TrackieError, match="mamba"):
            C.gguf_to_mamba_params(path)

    def test_quantized_and_generates(self, tmp_path):
        from trackiellm_tpu.ops.quant import QuantizedLinear

        cfg = M.MambaConfig.test()
        state = self._hf_state(cfg)
        path = str(tmp_path / "mamba_q.gguf")
        self._write(path, cfg, state)
        params, got_cfg = C.gguf_to_mamba_params(path, bits=8, group=16,
                                                 max_seq=64)
        assert isinstance(params["layers"]["w_in"], QuantizedLinear)
        assert isinstance(params["lm_head"], QuantizedLinear)

        runner = M.MambaRunner(params, got_cfg)
        out = runner.generate("hi", max_tokens=4)
        assert isinstance(out, str)
