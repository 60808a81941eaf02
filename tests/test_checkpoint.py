"""Checkpoint save/load + CLI tests."""

import json
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_convert import _make_gguf
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from trackiellm_tpu.utils.errors import TrackieError


class TestCheckpoint:
    def test_roundtrip_plain(self, tmp_path):
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, params, config=cfg, metadata={"note": "t"})
        loaded, cfg2, meta = load_checkpoint(d)
        assert cfg2 == cfg
        assert meta["note"] == "t"
        a = jax.tree.leaves(params)
        b = jax.tree.leaves(loaded)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_roundtrip_quantized_and_bf16(self, tmp_path):
        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params_quantized(
            jax.random.PRNGKey(1), cfg, bits=4, group=64)
        d = str(tmp_path / "qckpt")
        save_checkpoint(d, params, config=cfg)
        loaded, cfg2, _ = load_checkpoint(d)
        # Forward parity through the reloaded tree.
        toks = jnp.arange(5, dtype=jnp.int32)
        c1 = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        c2 = llm_model.KVCache.create(cfg, dtype=jnp.float32)
        a, _ = llm_model.prefill(params, cfg, toks, jnp.int32(5), c1)
        b, _ = llm_model.prefill(loaded, cfg2, toks, jnp.int32(5), c2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_missing_checkpoint(self, tmp_path):
        with pytest.raises(TrackieError):
            load_checkpoint(str(tmp_path / "nope"))


class TestCLI:
    def _run(self, *argv):
        from trackiellm_tpu.__main__ import main

        return main(list(argv))

    def test_inspect(self, tmp_path, capsys):
        p = str(tmp_path / "m.gguf")
        _make_gguf(p)
        assert self._run("inspect", p) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["format"] == "gguf"
        assert out["architecture"] == "llama"

    def test_convert_then_generate(self, tmp_path, capsys):
        p = str(tmp_path / "m.gguf")
        _make_gguf(p)
        out_dir = str(tmp_path / "native")
        assert self._run("convert", p, "-o", out_dir, "--bits", "0") == 0
        assert self._run("generate", out_dir, "-p", "oi",
                         "--max-tokens", "4") == 0


class TestQ4PackingVersion:
    def test_sidecar_carries_packing_marker(self, tmp_path):
        import json
        import jax.numpy as jnp
        from trackiellm_tpu.ops.quant import quantize_q4
        from trackiellm_tpu.models import checkpoint as ckpt

        w = jnp.asarray(np.random.default_rng(0).standard_normal(
            (512, 8)), jnp.float32)
        d = str(tmp_path / "q4")
        ckpt.save_checkpoint(d, {"w": quantize_q4(w, group=256)})
        sidecar = json.loads(open(f"{d}/config.json").read())
        assert sidecar["format"]["q4_packing"] == "mixed-bias-v2"

    def test_legacy_biased_v1_repacked_on_load(self, tmp_path):
        """A pre-marker checkpoint (both nibbles biased +8) must load to
        the same dequantized weights, not silently corrupt the high
        nibbles (ADVICE round 2, medium)."""
        import json
        import jax.numpy as jnp
        from trackiellm_tpu.ops.quant import quantize_q4, dequantize
        from trackiellm_tpu.models import checkpoint as ckpt

        w = jnp.asarray(np.random.default_rng(1).standard_normal(
            (512, 8)), jnp.float32)
        q = quantize_q4(w, group=256)
        want = np.asarray(dequantize(q))
        d = str(tmp_path / "legacy")
        ckpt.save_checkpoint(d, {"w": q})
        # Rewrite arrays in the legacy biased-v1 encoding and strip the
        # format marker, as a round-1 checkpoint would look.
        with np.load(f"{d}/arrays.npz") as z:
            arrays = {k: z[k] for k in z.files}
        packed = arrays["w.values"]
        lo = packed & 0x0F
        hi_q = ((packed >> 4).astype(np.int8) << 4 >> 4).astype(np.int16)
        arrays["w.values"] = (lo | (((hi_q + 8) & 0x0F) << 4).astype(
            np.uint8)).astype(np.uint8)
        np.savez(f"{d}/arrays.npz", **arrays)
        sidecar = json.loads(open(f"{d}/config.json").read())
        sidecar.pop("format", None)
        with open(f"{d}/config.json", "w") as f:
            json.dump(sidecar, f)

        params, _, _ = ckpt.load_checkpoint(d, device_put=False)
        got = np.asarray(dequantize(jax.tree_util.tree_map(
            jnp.asarray, params["w"])))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_unknown_packing_refused(self, tmp_path):
        import json
        import jax.numpy as jnp
        from trackiellm_tpu.ops.quant import quantize_q4
        from trackiellm_tpu.models import checkpoint as ckpt
        from trackiellm_tpu.utils.errors import TrackieError

        w = jnp.ones((512, 8), jnp.float32)
        d = str(tmp_path / "future")
        ckpt.save_checkpoint(d, {"w": quantize_q4(w, group=256)})
        sidecar = json.loads(open(f"{d}/config.json").read())
        sidecar["format"]["q4_packing"] = "martian-v9"
        with open(f"{d}/config.json", "w") as f:
            json.dump(sidecar, f)
        with pytest.raises(TrackieError):
            ckpt.load_checkpoint(d, device_put=False)


class TestGemma2HFConvertCLI:
    def test_convert_hf_family(self, tmp_path, capsys):
        """`convert x.npz --family gemma2-hf` ingests a transformers
        Gemma-2 state dict through the CLI (published head_dim 256
        resolution) and saves a loadable checkpoint."""
        import numpy as np

        from trackiellm_tpu.__main__ import main
        from trackiellm_tpu.models.checkpoint import load_checkpoint

        rng = np.random.default_rng(0)
        dim, hd, layers, hidden, vocab = 64, 256, 2, 96, 80

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.05

        state = {"model.embed_tokens.weight": w(vocab, dim),
                 "model.norm.weight": w(dim)}
        for i in range(layers):
            p = f"model.layers.{i}"
            state[f"{p}.self_attn.q_proj.weight"] = w(hd, dim)
            state[f"{p}.self_attn.k_proj.weight"] = w(hd, dim)
            state[f"{p}.self_attn.v_proj.weight"] = w(hd, dim)
            state[f"{p}.self_attn.o_proj.weight"] = w(dim, hd)
            state[f"{p}.mlp.gate_proj.weight"] = w(hidden, dim)
            state[f"{p}.mlp.up_proj.weight"] = w(hidden, dim)
            state[f"{p}.mlp.down_proj.weight"] = w(dim, hidden)
            for n in ("input_layernorm", "post_attention_layernorm",
                      "pre_feedforward_layernorm",
                      "post_feedforward_layernorm"):
                state[f"{p}.{n}.weight"] = w(dim)
        src = str(tmp_path / "gemma_tiny.npz")
        np.savez(src, **state)

        out = str(tmp_path / "ckpt")
        rc = main(["convert", src, "-o", out, "--bits", "0",
                   "--family", "gemma2-hf"])
        assert rc == 0
        params, cfg, meta = load_checkpoint(out)
        assert cfg.act == "gelu" and cfg.post_norms and cfg.alt_window
        assert cfg.n_heads == 1 and cfg.head_dim == 256
        assert cfg.query_pre_attn_scalar == 256.0
        assert "attn_post_norm" in params["layers"]
