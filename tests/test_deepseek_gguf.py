"""GGUF deepseek2 ingestion (convert.gguf_to_mla_params).

Roundtrip strategy (zero-egress round: no real DeepSeek GGUF exists
here): build random MLA params, inverse-map them into a synthetic GGUF
with llama.cpp's deepseek2 tensor/metadata names (the same write_gguf
helper every other GGUF suite uses), ingest, and require logits
equality with the original params. The neox rope-column re-ordering is
exercised by writing the GGUF in neox order. Parity ref: the reference
loads DeepSeek GGUFs through llama.cpp (tk_model_loader.c:199, 296).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_loader import write_gguf
from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import loader as L
from trackiellm_tpu.models import mla as mla_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


def _interleaved_to_neox_rows(w: np.ndarray, start: int,
                              rope: int) -> np.ndarray:
    """Inverse of convert._neox_to_interleaved_cols, applied to the
    ROWS of a GGUF (out, in) tensor: adjacent pairs -> half-split."""
    half = rope // 2
    perm = np.empty(rope, np.int64)
    perm[np.arange(half)] = np.arange(half) * 2          # x_i <- 2i
    perm[np.arange(half) + half] = np.arange(half) * 2 + 1
    w = w.copy()
    w[start:start + rope] = w[start:start + rope][perm]
    return w


def _write_deepseek_gguf(path, params, cfg, *, split_kv_b=False,
                         neox=True):
    """Inverse-map MLA params (f32) into llama.cpp deepseek2 names."""
    F = L.GGML_F32
    h, r = cfg.n_heads, cfg.kv_lora_rank
    nope, rope, vd = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                      cfg.v_head_dim)
    A = lambda x: np.asarray(x, np.float32)  # noqa: E731
    attn = params["attn"]
    tensors = {
        "token_embd.weight": (A(params["tok_emb"]), F),
        "output_norm.weight": (A(params["out_norm"]), F),
        "output.weight": (A(params["lm_head"]).T, F),
    }
    md = {
        "general.architecture": "deepseek2",
        "deepseek2.block_count": cfg.n_layers,
        "deepseek2.context_length": cfg.max_seq,
        "deepseek2.embedding_length": cfg.dim,
        "deepseek2.feed_forward_length": cfg.hidden_dim,
        "deepseek2.attention.head_count": h,
        "deepseek2.attention.head_count_kv": h,
        "deepseek2.attention.layer_norm_rms_epsilon": float(cfg.norm_eps),
        "deepseek2.rope.freq_base": float(cfg.rope_theta),
        "deepseek2.attention.key_length": nope + rope,
        "deepseek2.attention.value_length": vd,
        "deepseek2.attention.kv_lora_rank": r,
        "deepseek2.rope.dimension_count": rope,
        "deepseek2.leading_dense_block_count": cfg.first_k_dense,
        "deepseek2.expert_count": cfg.n_experts,
        "deepseek2.expert_used_count": cfg.n_experts_used,
        "deepseek2.expert_feed_forward_length": cfg.moe_hidden_dim,
        "deepseek2.expert_weights_scale": float(cfg.moe_routed_scale),
        "deepseek2.expert_weights_norm": bool(cfg.moe_norm_topk),
        "deepseek2.expert_gating_func":
            2 if cfg.moe_score_func == "sigmoid" else 1,
        "deepseek2.expert_group_count": cfg.moe_n_groups,
        "deepseek2.expert_group_used_count": cfg.moe_topk_groups,
    }
    if cfg.q_lora_rank:
        md["deepseek2.attention.q_lora_rank"] = cfg.q_lora_rank
    for i in range(cfg.n_layers):
        p = f"blk.{i}"
        tensors[f"{p}.attn_norm.weight"] = (A(attn["attn_norm"][i]), F)
        tensors[f"{p}.ffn_norm.weight"] = (A(attn["mlp_norm"][i]), F)
        kv_a = A(attn["wkv_a"][i]).T  # (r+rope, d)
        if neox:
            kv_a = _interleaved_to_neox_rows(kv_a, r, rope)
        tensors[f"{p}.attn_kv_a_mqa.weight"] = (kv_a, F)
        tensors[f"{p}.attn_kv_a_norm.weight"] = (A(attn["kv_a_norm"][i]),
                                                 F)
        kv_b = A(attn["wkv_b"][i])  # (r, h*(nope+vd))
        if split_kv_b:
            per = kv_b.reshape(r, h, nope + vd)
            # Write the MLA-split pair in two DIFFERENT orientations to
            # exercise the shape sniffing: k_b 3D (h, nope, r),
            # v_b 2D (r, h*vd).
            kb = per[:, :, :nope].transpose(1, 2, 0)
            vb = per[:, :, nope:].reshape(r, h * vd)
            tensors[f"{p}.attn_k_b.weight"] = (kb, F)
            tensors[f"{p}.attn_v_b.weight"] = (vb, F)
        else:
            tensors[f"{p}.attn_kv_b.weight"] = (kv_b.T, F)
        tensors[f"{p}.attn_output.weight"] = (A(attn["wo"][i]).T, F)
        if cfg.q_lora_rank:
            tensors[f"{p}.attn_q_a.weight"] = (A(attn["wq_a"][i]).T, F)
            tensors[f"{p}.attn_q_a_norm.weight"] = (
                A(attn["q_a_norm"][i]), F)
            q_b = A(attn["wq_b"][i]).T  # (h*qk_head, q_lora)
            if neox:
                for head in range(h):
                    q_b = _interleaved_to_neox_rows(
                        q_b, head * cfg.qk_head_dim + nope, rope)
            tensors[f"{p}.attn_q_b.weight"] = (q_b, F)
        else:
            q = A(attn["wq"][i]).T
            if neox:
                for head in range(h):
                    q = _interleaved_to_neox_rows(
                        q, head * cfg.qk_head_dim + nope, rope)
            tensors[f"{p}.attn_q.weight"] = (q, F)
        if i < cfg.first_k_dense or not cfg.n_experts:
            gu = A(params["dense_mlp"]["w_gu"][i])
            hdim = cfg.hidden_dim
            tensors[f"{p}.ffn_gate.weight"] = (gu[:, :hdim].T, F)
            tensors[f"{p}.ffn_up.weight"] = (gu[:, hdim:].T, F)
            tensors[f"{p}.ffn_down.weight"] = (
                A(params["dense_mlp"]["w_down"][i]).T, F)
        else:
            j = i - cfg.first_k_dense
            moe = params["moe_mlp"]
            tensors[f"{p}.ffn_gate_inp.weight"] = (
                A(moe["moe_gate"][j]).T, F)
            if "moe_gate_bias" in moe:
                tensors[f"{p}.exp_probs_b.bias"] = (
                    A(moe["moe_gate_bias"][j]), F)
            gu = A(moe["w_gu"][j])              # (E, D, 2H)
            mh = cfg.moe_hidden_dim
            tensors[f"{p}.ffn_gate_exps.weight"] = (
                gu[:, :, :mh].transpose(0, 2, 1), F)
            tensors[f"{p}.ffn_up_exps.weight"] = (
                gu[:, :, mh:].transpose(0, 2, 1), F)
            tensors[f"{p}.ffn_down_exps.weight"] = (
                A(moe["w_down"][j]).transpose(0, 2, 1), F)
            if cfg.moe_shared_hidden:
                sgu = A(moe["shared_gu"][j])
                sh = cfg.moe_shared_hidden
                tensors[f"{p}.ffn_gate_shexp.weight"] = (sgu[:, :sh].T, F)
                tensors[f"{p}.ffn_up_shexp.weight"] = (sgu[:, sh:].T, F)
                tensors[f"{p}.ffn_down_shexp.weight"] = (
                    A(moe["shared_down"][j]).T, F)
    write_gguf(path, tensors, md)


def _logits(params, cfg, tokens):
    cache = mla_model.MLACache.create(cfg, dtype=jnp.float32)
    logits, _ = mla_model.prefill(
        params, cfg, jnp.asarray(tokens, jnp.int32),
        jnp.int32(len(tokens)), cache)
    return np.asarray(logits)


V3CFG = mla_model.MLAConfig(
    vocab_size=96, dim=32, n_layers=3, n_heads=2, hidden_dim=48,
    q_lora_rank=20, kv_lora_rank=16, qk_nope_head_dim=16,
    qk_rope_head_dim=8, v_head_dim=12, n_experts=4, n_experts_used=2,
    moe_hidden_dim=24, moe_norm_topk=True, moe_shared_hidden=24,
    moe_routed_scale=2.5, moe_n_groups=2, moe_topk_groups=1,
    moe_score_func="sigmoid", moe_group_score="top2sum",
    first_k_dense=1, max_seq=64)


class TestDeepseekGGUF:
    def _roundtrip(self, tmp_path, cfg, seed=0, **writer_kw):
        params = mla_model.init_params(jax.random.PRNGKey(seed), cfg,
                                       dtype=jnp.float32)
        if cfg.moe_score_func == "sigmoid" and cfg.n_experts:
            m = cfg.n_layers - cfg.first_k_dense
            params["moe_mlp"]["moe_gate_bias"] = (
                jax.random.normal(jax.random.PRNGKey(seed + 1),
                                  (m, cfg.n_experts), jnp.float32) * 0.1)
        path = str(tmp_path / "ds.gguf")
        _write_deepseek_gguf(path, params, cfg, **writer_kw)
        got_params, got_cfg = C.gguf_to_mla_params(
            path, bits=None, dtype=jnp.float32)
        return params, got_params, got_cfg

    def test_v3_style_roundtrip_config_and_logits(self, tmp_path):
        """q-LoRA + sigmoid/grouped/biased routing + shared expert,
        GGUF written in neox rope order (the llama.cpp convention)."""
        params, got, got_cfg = self._roundtrip(tmp_path, V3CFG)
        # norm_eps goes through a f32 metadata slot
        assert abs(got_cfg.norm_eps - V3CFG.norm_eps) < 1e-12
        assert got_cfg._replace(norm_eps=V3CFG.norm_eps) == V3CFG
        tokens = np.arange(1, 21) % V3CFG.vocab_size
        np.testing.assert_allclose(
            _logits(got, got_cfg, tokens), _logits(params, V3CFG, tokens),
            rtol=1e-5, atol=1e-5)

    def test_v2_lite_style_full_q(self, tmp_path):
        cfg = V3CFG._replace(q_lora_rank=0, moe_score_func="softmax",
                             moe_group_score="max", moe_norm_topk=False,
                             moe_n_groups=1, moe_topk_groups=1,
                             moe_routed_scale=1.0)
        params, got, got_cfg = self._roundtrip(tmp_path, cfg, seed=2)
        assert got_cfg._replace(norm_eps=cfg.norm_eps) == cfg
        tokens = np.arange(3, 19) % cfg.vocab_size
        np.testing.assert_allclose(
            _logits(got, got_cfg, tokens), _logits(params, cfg, tokens),
            rtol=1e-5, atol=1e-5)

    def test_mla_split_kv_b_roundtrip(self, tmp_path):
        """Newer llama.cpp GGUFs carry attn_k_b/attn_v_b instead of
        attn_kv_b; the reader re-fuses them (orientation sniffed)."""
        params, got, got_cfg = self._roundtrip(tmp_path, V3CFG, seed=3,
                                               split_kv_b=True)
        tokens = np.arange(2, 22) % V3CFG.vocab_size
        np.testing.assert_allclose(
            _logits(got, got_cfg, tokens), _logits(params, V3CFG, tokens),
            rtol=1e-5, atol=1e-5)

    def test_interleaved_override(self, tmp_path):
        """A pair-ordered GGUF ingests exactly with neox_rope=False."""
        params = mla_model.init_params(jax.random.PRNGKey(5), V3CFG,
                                       dtype=jnp.float32)
        params["moe_mlp"]["moe_gate_bias"] = jnp.zeros(
            (V3CFG.n_layers - 1, V3CFG.n_experts), jnp.float32)
        path = str(tmp_path / "ds_pair.gguf")
        _write_deepseek_gguf(path, params, V3CFG, neox=False)
        got, got_cfg = C.gguf_to_mla_params(path, bits=None,
                                            dtype=jnp.float32,
                                            neox_rope=False)
        tokens = np.arange(1, 17) % V3CFG.vocab_size
        np.testing.assert_allclose(
            _logits(got, got_cfg, tokens),
            _logits(params, V3CFG, tokens), rtol=1e-5, atol=1e-5)

    def test_wrong_arch_rejected(self, tmp_path):
        path = str(tmp_path / "x.gguf")
        write_gguf(path, {"token_embd.weight":
                          (np.zeros((8, 4), np.float32), L.GGML_F32)},
                   {"general.architecture": "llama"})
        with pytest.raises(Exception):
            C.gguf_to_mla_params(path)

    def test_quantized_ingest(self, tmp_path):
        """bits=8 routes through mla.quantize_params (wkv_b stays
        high-precision) and still runs a coherent forward."""
        params = mla_model.init_params(jax.random.PRNGKey(7), V3CFG,
                                       dtype=jnp.float32)
        params["moe_mlp"]["moe_gate_bias"] = jnp.zeros(
            (V3CFG.n_layers - 1, V3CFG.n_experts), jnp.float32)
        path = str(tmp_path / "dsq.gguf")
        _write_deepseek_gguf(path, params, V3CFG)
        got, got_cfg = C.gguf_to_mla_params(path, bits=8, group=4,
                                            dtype=jnp.float32)
        ref = _logits(params, V3CFG, np.arange(1, 13))
        out = _logits(got, got_cfg, np.arange(1, 13))
        # int8 group quant: close but not exact
        assert np.all(np.isfinite(out))
        corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
        assert corr > 0.98
