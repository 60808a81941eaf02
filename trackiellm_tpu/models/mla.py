"""DeepSeek-V2 family: Multi-head Latent Attention (MLA), TPU-native.

Parity: the reference serves GGUF checkpoints through llama.cpp
(src/ai_models/tk_model_loader.c:296), whose ``deepseek2`` arch covers
DeepSeek-V2 / V2-Lite; transformers' ``DeepseekV2ForCausalLM`` is the
numeric oracle (tests/test_deepseek.py). The MoE side (softmax scores,
greedy or group-limited top-k, routed scaling, ungated shared experts,
first-k-dense layers) rides :mod:`models.llm`'s expert machinery via
LLMConfig's moe_* fields; this module owns the attention.

TPU-first design — the cache stores the COMPRESSED latent:

- Per token per layer the cache holds ``kv_lora_rank + qk_rope_head_dim``
  values (576 for V2) instead of the decompressed
  ``n_heads * (qk_head_dim + v_head_dim)`` (10,240 for V2-Lite, 40,960
  for V2) — an 18-71x smaller KV cache, the architecture's whole point.
- Decode runs the ABSORBED form: q_nope is projected through the
  per-head K-up matrix once (one einsum against the (r, H, nope) bank),
  scores read the shared latent like MQA, and the V-up projection is
  applied to the (H, r) weighted latent AFTER attention. No per-token
  decompression, all MXU-shaped einsums, HBM traffic ~= the latent
  cache size.
- Prefill decompresses K/V per chunk (compute-bound; flash/XLA
  attention reuses ops/attention with V zero-padded to qk_head_dim)
  but still WRITES only the latent.

Known gaps (round-4): GGUF ``deepseek2`` tensor ingestion, quantized
MLA banks, and the V2 yarn mscale_all_dim attention factor (the
``attn_scale_mult`` hook is in place; rope divisors ride
``params["rope_factors"]`` like models/llm.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from trackiellm_tpu.models.llm import (
    _linear,
    _mlp_block,
    _moe_block,
    _rms_norm,
)
from trackiellm_tpu.ops.attention import prefill_attention
from trackiellm_tpu.ops.quant import (
    QuantizedLinear,
    quantize_q4,
    quantize_q8,
)


class MLAConfig(NamedTuple):
    """DeepSeek-V2 geometry. The moe_*/act/norm fields intentionally
    mirror LLMConfig's names so models.llm's MoE helpers accept this
    config unchanged (duck-typed NamedTuple)."""
    vocab_size: int
    dim: int
    n_layers: int
    n_heads: int
    hidden_dim: int              # dense-layer MLP width
    q_lora_rank: int = 0         # 0 = full q_proj (V2-Lite)
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # MoE (0 experts = fully dense model). Field names shared with
    # LLMConfig — _moe_block reads them directly.
    n_experts: int = 0
    n_experts_used: int = 6
    moe_hidden_dim: int = 0      # routed expert width
    moe_norm_topk: bool = False
    moe_shared_hidden: int = 0   # n_shared_experts * moe_hidden_dim
    moe_shared_gated: bool = False
    moe_routed_scale: float = 1.0
    moe_n_groups: int = 1
    moe_topk_groups: int = 1
    moe_score_func: str = "softmax"   # V3: "sigmoid"
    moe_group_score: str = "max"      # V3: "top2sum"
    # Unused by DeepSeek but read by the shared _moe_block/_act helpers
    # (gpt-oss / Llama-4 / Granite knobs in LLMConfig) — keep the
    # duck-typing complete.
    moe_bias: bool = False
    act_limit: float = 7.0
    moe_scale_input: bool = False
    moe_pattern: int = 0
    moe_first_dense: int = 0
    residual_multiplier: float = 1.0
    norm_type: str = "rms"
    parallel_residual: bool = False
    mlp_gated: bool = True
    mlp_bias: bool = False
    first_k_dense: int = 1
    act: str = "silu"
    post_norms: bool = False     # read by _mlp helpers; always False here
    norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_seq: int = 4096
    attn_scale_mult: float = 1.0  # yarn mscale^2 hook (V2 long-context)

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def attn_scale(self) -> float:
        return self.attn_scale_mult / math.sqrt(self.qk_head_dim)

    @classmethod
    def deepseek_v2_lite(cls) -> "MLAConfig":
        """DeepSeek-V2-Lite 16B-A2.4B (published geometry; full q_proj,
        27 layers with layer 0 dense, 64 routed + 2 shared experts)."""
        return cls(vocab_size=102400, dim=2048, n_layers=27, n_heads=16,
                   hidden_dim=10944, q_lora_rank=0, kv_lora_rank=512,
                   n_experts=64, n_experts_used=6, moe_hidden_dim=1408,
                   moe_shared_hidden=2816, first_k_dense=1,
                   rope_theta=10000.0, max_seq=8192)

    @classmethod
    def deepseek_v2(cls) -> "MLAConfig":
        """DeepSeek-V2 236B-A21B: q LoRA rank 1536, 160 routed experts
        in 8 groups (top-3 groups, top-6 experts), 2 shared,
        routed_scaling_factor 16."""
        return cls(vocab_size=102400, dim=5120, n_layers=60, n_heads=128,
                   hidden_dim=12288, q_lora_rank=1536, kv_lora_rank=512,
                   n_experts=160, n_experts_used=6, moe_hidden_dim=1536,
                   moe_shared_hidden=3072, moe_routed_scale=16.0,
                   moe_n_groups=8, moe_topk_groups=3, first_k_dense=1,
                   rope_theta=10000.0, max_seq=8192)

    @classmethod
    def deepseek_v3(cls) -> "MLAConfig":
        """DeepSeek-V3/R1 671B-A37B: sigmoid routing with the
        aux-loss-free selection bias (params carry
        moe_mlp.moe_gate_bias), top-2-sum group scores over 8 groups
        (top-4), 256 routed + 1 shared expert, renormalized top-8,
        routed scaling 2.5, 3 dense layers."""
        return cls(vocab_size=129280, dim=7168, n_layers=61,
                   n_heads=128, hidden_dim=18432, q_lora_rank=1536,
                   kv_lora_rank=512, n_experts=256, n_experts_used=8,
                   moe_hidden_dim=2048, moe_shared_hidden=2048,
                   moe_norm_topk=True, moe_routed_scale=2.5,
                   moe_n_groups=8, moe_topk_groups=4,
                   moe_score_func="sigmoid", moe_group_score="top2sum",
                   first_k_dense=3, rope_theta=10000.0, max_seq=8192)

    @classmethod
    def tiny(cls) -> "MLAConfig":
        return cls(vocab_size=256, dim=32, n_layers=3, n_heads=2,
                   hidden_dim=64, q_lora_rank=0, kv_lora_rank=16,
                   qk_nope_head_dim=16, qk_rope_head_dim=8,
                   v_head_dim=12, n_experts=4, n_experts_used=2,
                   moe_hidden_dim=24, moe_shared_hidden=48,
                   first_k_dense=1, max_seq=128)


def init_params(key: jax.Array, cfg: MLAConfig,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Random params in the stacked-layer layout the scans expect:
    ``attn`` stacks all n_layers; ``dense_mlp`` stacks the
    first_k_dense layers; ``moe_mlp`` stacks the rest."""
    keys = jax.random.split(key, 24)

    def w(k, *shape, scale=None):
        fan_in = shape[-2] if len(shape) > 1 else shape[-1]
        scale = scale or (1.0 / math.sqrt(fan_in))
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
            dtype)

    l, d, h = cfg.n_layers, cfg.dim, cfg.n_heads
    r, rope, nope, vd = (cfg.kv_lora_rank, cfg.qk_rope_head_dim,
                         cfg.qk_nope_head_dim, cfg.v_head_dim)
    attn: Dict[str, Any] = {
        "attn_norm": jnp.ones((l, d), dtype),
        "mlp_norm": jnp.ones((l, d), dtype),
        "wkv_a": w(keys[0], l, d, r + rope),
        "kv_a_norm": jnp.ones((l, r), dtype),
        "wkv_b": w(keys[1], l, r, h * (nope + vd)),
        "wo": w(keys[2], l, h * vd, d),
    }
    if cfg.q_lora_rank:
        attn["wq_a"] = w(keys[3], l, d, cfg.q_lora_rank)
        attn["q_a_norm"] = jnp.ones((l, cfg.q_lora_rank), dtype)
        attn["wq_b"] = w(keys[4], l, cfg.q_lora_rank, h * cfg.qk_head_dim)
    else:
        attn["wq"] = w(keys[3], l, d, h * cfg.qk_head_dim)

    k_dense = cfg.first_k_dense if cfg.n_experts else cfg.n_layers
    dense_mlp = {
        "w_gu": w(keys[5], k_dense, d, 2 * cfg.hidden_dim),
        "w_down": w(keys[6], k_dense, cfg.hidden_dim, d),
    } if k_dense else {}
    m = cfg.n_layers - k_dense
    moe_mlp = {
        "moe_gate": w(keys[7], m, d, cfg.n_experts),
        "w_gu": w(keys[8], m, cfg.n_experts, d, 2 * cfg.moe_hidden_dim),
        "w_down": w(keys[9], m, cfg.n_experts, cfg.moe_hidden_dim, d),
    } if m else {}
    if m and cfg.moe_shared_hidden:
        moe_mlp["shared_gu"] = w(keys[10], m, d,
                                 2 * cfg.moe_shared_hidden)
        moe_mlp["shared_down"] = w(keys[11], m, cfg.moe_shared_hidden, d)
    return {
        "tok_emb": w(keys[12], cfg.vocab_size, d, scale=0.02),
        "attn": attn,
        "dense_mlp": dense_mlp,
        "moe_mlp": moe_mlp,
        "out_norm": jnp.ones((d,), dtype),
        "lm_head": w(keys[13], d, cfg.vocab_size),
    }


def quantize_params(params: Dict[str, Any], bits: int = 4,
                    group: int = 64) -> Dict[str, Any]:
    """Quantize the big MLA matrices (Q4/Q8 group quant, same kernels
    as models.llm). ``wkv_b`` intentionally stays bf16: the absorbed
    decode reshapes it into the per-head K-up/V-up banks
    ((r, H, nope+v) einsums), and at r=512 it is ~2M params/layer —
    the V2-Lite total is ~120 MB bf16, noise next to the expert banks.
    Embeddings, norms, and the latent down-projection stay
    high-precision like the GGUF convention."""
    quantize = (quantize_q4 if bits == 4 else quantize_q8)

    def qstack(w):
        # (L, K, N) stacked matrices or (L, E, K, N) expert banks.
        if w.ndim == 4:
            per_l = []
            for i in range(w.shape[0]):
                qs = [quantize(w[i, e], group) for e in range(w.shape[1])]
                per_l.append(QuantizedLinear(
                    values=jnp.stack([q.values for q in qs]),
                    scales=jnp.stack([q.scales for q in qs])))
            return QuantizedLinear(
                values=jnp.stack([q.values for q in per_l]),
                scales=jnp.stack([q.scales for q in per_l]))
        qs = [quantize(w[i], group) for i in range(w.shape[0])]
        return QuantizedLinear(
            values=jnp.stack([q.values for q in qs]),
            scales=jnp.stack([q.scales for q in qs]))

    out = dict(params)
    attn = dict(params["attn"])
    for name in ("wq", "wq_b", "wo"):
        if name in attn:
            attn[name] = qstack(attn[name])
    out["attn"] = attn
    for part in ("dense_mlp", "moe_mlp"):
        tree = dict(params[part])
        for name in ("w_gu", "w_down", "shared_gu", "shared_down"):
            if name in tree:
                tree[name] = qstack(tree[name])
        out[part] = tree
    out["lm_head"] = quantize(params["lm_head"], group)
    return out


class MLACache(NamedTuple):
    """Compressed latent cache: per layer per token the NORMED kv
    latent (kv_lora_rank) plus the rotated shared rope key
    (qk_rope_head_dim)."""
    ckv: jnp.ndarray   # (L, S_max, r)
    kpe: jnp.ndarray   # (L, S_max, rope)
    length: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, cfg: MLAConfig, dtype: jnp.dtype = jnp.bfloat16,
               max_seq: Optional[int] = None) -> "MLACache":
        s = max_seq or cfg.max_seq
        return cls(
            ckv=jnp.zeros((cfg.n_layers, s, cfg.kv_lora_rank), dtype),
            kpe=jnp.zeros((cfg.n_layers, s, cfg.qk_rope_head_dim), dtype),
            length=jnp.int32(0))


def _rope_freqs(cfg: MLAConfig) -> jnp.ndarray:
    half = cfg.qk_rope_head_dim // 2
    return 1.0 / (cfg.rope_theta
                  ** (jnp.arange(half, dtype=jnp.float32) / half))


def _freqs(params: Dict[str, Any], cfg: MLAConfig) -> jnp.ndarray:
    freqs = _rope_freqs(cfg)
    rf = params.get("rope_factors")
    return freqs / rf if rf is not None else freqs


def yarn_rope_factors(cfg: MLAConfig, factor: float,
                      original_max_seq: int,
                      beta_fast: float = 32.0,
                      beta_slow: float = 1.0) -> jnp.ndarray:
    """YaRN divisors over the ROPE dims (qk_rope_head_dim) — store as
    ``params["rope_factors"]`` for DeepSeek long-context checkpoints.
    Published V2/V3 configs ship ``mscale == mscale_all_dim``, making
    the yarn attention factor exactly 1.0 (transformers
    ``get_mscale(f, m) / get_mscale(f, m_all)``), so the divisors alone
    reproduce the oracle and ``attn_scale_mult`` stays 1."""
    import types

    from trackiellm_tpu.models import llm as llm_model

    shim = types.SimpleNamespace(head_dim=cfg.qk_rope_head_dim,
                                 rope_theta=cfg.rope_theta)
    return llm_model.yarn_rope_factors(shim, factor, original_max_seq,
                                       beta_fast, beta_slow)


def apply_rope_interleaved(x: jnp.ndarray, positions: jnp.ndarray,
                           freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate (S, H, Dr) with ADJACENT-PAIR (complex) layout — the
    DeepSeek convention (transformers apply_rotary_emb views pairs as
    complex), unlike llm.apply_rope's split-half layout."""
    ang = positions[:, None].astype(jnp.float32) * freqs    # (S, Dr/2)
    cos = jnp.cos(ang)[:, None, :]
    sin = jnp.sin(ang)[:, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., 0::2], xf[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _project_q(h: jnp.ndarray, layer: Dict[str, Any],
               cfg: MLAConfig) -> jnp.ndarray:
    """(T, D) -> (T, H, qk_head_dim): full q_proj or the LoRA pair."""
    if cfg.q_lora_rank:
        qa = _rms_norm(_linear(h, layer["wq_a"]), layer["q_a_norm"],
                       cfg.norm_eps)
        q = _linear(qa, layer["wq_b"])
    else:
        q = _linear(h, layer["wq"])
    return q.reshape(h.shape[0], cfg.n_heads, cfg.qk_head_dim)


def _latent(h: jnp.ndarray, layer: Dict[str, Any], cfg: MLAConfig,
            positions: jnp.ndarray, freqs: jnp.ndarray,
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(T, D) -> normed latent (T, r) + rotated shared rope key
    (T, rope) — exactly what the cache stores."""
    ckv = _linear(h, layer["wkv_a"])                         # (T, r+rope)
    c = _rms_norm(ckv[:, :cfg.kv_lora_rank], layer["kv_a_norm"],
                  cfg.norm_eps)
    kpe = apply_rope_interleaved(
        ckv[:, None, cfg.kv_lora_rank:], positions, freqs)[:, 0]
    return c, kpe


def _mlp_for(x: jnp.ndarray, layer: Dict[str, Any], cfg: MLAConfig,
             dense: bool) -> jnp.ndarray:
    if dense:
        return _mlp_block(x, layer["mlp_norm"], layer["w_gu"],
                          layer["w_down"], cfg.norm_eps, act=cfg.act)
    return _moe_block(x, layer, cfg)


def _split_rows(tree: Dict[str, Any], lo: int, hi: int) -> Dict[str, Any]:
    return jax.tree.map(lambda a: a[lo:hi], tree)


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Dict[str, Any], cfg: MLAConfig, tokens: jnp.ndarray,
            length: jnp.ndarray, cache: MLACache,
            ) -> Tuple[jnp.ndarray, MLACache]:
    """Prompt pass. Decompressed attention (per-chunk K/V
    materialization, V zero-padded to qk_head_dim for the shared
    flash/XLA kernel), compressed cache writes. Same bucketed-length /
    garbage-past-length contract as llm.prefill."""
    s_pad = tokens.shape[0]
    freqs = _freqs(params, cfg)
    positions = jnp.arange(s_pad)
    x = params["tok_emb"][tokens]                            # (S, D)
    h_, nope, vd = cfg.n_heads, cfg.qk_nope_head_dim, cfg.v_head_dim

    def layer_fn(dense: bool):
        def fn(x, layer):
            h = _rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q = _project_q(h, layer, cfg)                    # (S, H, qk)
            q = q.at[..., nope:].set(
                apply_rope_interleaved(q[..., nope:], positions, freqs))
            c, kpe = _latent(h, layer, cfg, positions, freqs)
            kv = _linear(c, layer["wkv_b"]).reshape(
                s_pad, h_, nope + vd)
            k = jnp.concatenate(
                [kv[..., :nope],
                 jnp.broadcast_to(kpe[:, None, :],
                                  (s_pad, h_, cfg.qk_rope_head_dim))],
                axis=-1)                                     # (S, H, qk)
            v = kv[..., nope:]                               # (S, H, v)
            v_pad = jnp.pad(v, ((0, 0), (0, 0),
                                (0, cfg.qk_head_dim - vd)))
            attn = prefill_attention(
                q.transpose(1, 0, 2), k.transpose(1, 0, 2),
                v_pad.transpose(1, 0, 2), causal=True,
                scale=cfg.attn_scale).transpose(1, 0, 2)[..., :vd]
            x = x + _linear(attn.reshape(s_pad, h_ * vd).astype(x.dtype),
                            layer["wo"])
            x = _mlp_for(x, layer, cfg, dense)
            return x, (c, kpe)

        return fn

    k_dense = cfg.first_k_dense if cfg.n_experts else cfg.n_layers
    cs, kps = [], []
    if k_dense:
        x, (c0, kp0) = jax.lax.scan(
            layer_fn(dense=True), x,
            {**_split_rows(params["attn"], 0, k_dense),
             **params["dense_mlp"]})
        cs.append(c0)
        kps.append(kp0)
    if k_dense < cfg.n_layers:
        x, (c1, kp1) = jax.lax.scan(
            layer_fn(dense=False), x,
            {**_split_rows(params["attn"], k_dense, cfg.n_layers),
             **params["moe_mlp"]})
        cs.append(c1)
        kps.append(kp1)
    ckv = jnp.concatenate(cs, axis=0)                        # (L, S, r)
    kpe = jnp.concatenate(kps, axis=0)
    new_cache = MLACache(
        ckv=jax.lax.dynamic_update_slice(
            cache.ckv, ckv.astype(cache.ckv.dtype), (0, 0, 0)),
        kpe=jax.lax.dynamic_update_slice(
            cache.kpe, kpe.astype(cache.kpe.dtype), (0, 0, 0)),
        length=length.astype(jnp.int32))
    x_last = x[jnp.maximum(length - 1, 0)]
    logits = _linear(_rms_norm(x_last[None], params["out_norm"],
                               cfg.norm_eps),
                     params["lm_head"]).astype(jnp.float32)[0]
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "attn_len"))
def decode_step(params: Dict[str, Any], cfg: MLAConfig,
                token: jnp.ndarray, cache: MLACache,
                attn_len: Optional[int] = None,
                ) -> Tuple[jnp.ndarray, MLACache]:
    """One ABSORBED decode step: scores hit the shared latent cache
    MQA-style (q_nope pre-projected through the per-head K-up bank),
    the V-up projection applies after attention. Exactly equal to the
    decompressed form because kv_a_layernorm sits BEFORE kv_b: both
    K-up and V-up are linear in the cached (normed) latent."""
    pos = cache.length
    freqs = _freqs(params, cfg)
    x = params["tok_emb"][token][None]                       # (1, D)
    h_, nope, vd, r = (cfg.n_heads, cfg.qk_nope_head_dim, cfg.v_head_dim,
                       cfg.kv_lora_rank)

    def layer_fn(dense: bool):
        def fn(x, inputs):
            layer, ckv_l, kpe_l = inputs
            h = _rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q = _project_q(h, layer, cfg)                    # (1, H, qk)
            q_nope = q[..., :nope]
            q_pe = apply_rope_interleaved(q[..., nope:], pos[None],
                                          freqs)[0]          # (H, rope)
            c, kpe = _latent(h, layer, cfg, pos[None], freqs)
            ckv_l = jax.lax.dynamic_update_slice(
                ckv_l, c.astype(ckv_l.dtype), (pos, 0))
            kpe_l = jax.lax.dynamic_update_slice(
                kpe_l, kpe.astype(kpe_l.dtype), (pos, 0))
            ckv_v = ckv_l[:attn_len] if attn_len else ckv_l
            kpe_v = kpe_l[:attn_len] if attn_len else kpe_l

            wkv_b = layer["wkv_b"].reshape(r, h_, nope + vd)
            w_uk = wkv_b[..., :nope]                         # (r, H, nope)
            w_uv = wkv_b[..., nope:]                         # (r, H, v)
            q_abs = jnp.einsum("hn,rhn->hr", q_nope[0].astype(jnp.float32),
                               w_uk.astype(jnp.float32))     # (H, r)
            scores = (
                jnp.einsum("hr,sr->hs", q_abs,
                           ckv_v.astype(jnp.float32))
                + jnp.einsum("hd,sd->hs", q_pe.astype(jnp.float32),
                             kpe_v.astype(jnp.float32))
            ) * cfg.attn_scale                               # (H, S)
            s_len = ckv_v.shape[0]
            mask = jnp.arange(s_len) <= pos
            scores = jnp.where(mask[None, :], scores, -jnp.inf)
            w = jax.nn.softmax(scores, axis=-1)
            out_c = jnp.einsum("hs,sr->hr", w,
                               ckv_v.astype(jnp.float32))    # (H, r)
            out = jnp.einsum("hr,rhv->hv", out_c,
                             w_uv.astype(jnp.float32))       # (H, v)
            x = x + _linear(out.reshape(1, h_ * vd).astype(x.dtype),
                            layer["wo"])
            x = _mlp_for(x, layer, cfg, dense)
            return x, (ckv_l, kpe_l)

        return fn

    k_dense = cfg.first_k_dense if cfg.n_experts else cfg.n_layers
    new_ckv, new_kpe = [], []
    if k_dense:
        x, (c0, kp0) = jax.lax.scan(
            layer_fn(dense=True), x,
            ({**_split_rows(params["attn"], 0, k_dense),
              **params["dense_mlp"]},
             cache.ckv[:k_dense], cache.kpe[:k_dense]))
        new_ckv.append(c0)
        new_kpe.append(kp0)
    if k_dense < cfg.n_layers:
        x, (c1, kp1) = jax.lax.scan(
            layer_fn(dense=False), x,
            ({**_split_rows(params["attn"], k_dense, cfg.n_layers),
              **params["moe_mlp"]},
             cache.ckv[k_dense:], cache.kpe[k_dense:]))
        new_ckv.append(c1)
        new_kpe.append(kp1)
    logits = _linear(_rms_norm(x, params["out_norm"], cfg.norm_eps),
                     params["lm_head"]).astype(jnp.float32)[0]
    return logits, MLACache(jnp.concatenate(new_ckv, axis=0),
                            jnp.concatenate(new_kpe, axis=0), pos + 1)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "attn_len", "all_logits"))
def extend(params: Dict[str, Any], cfg: MLAConfig, tokens: jnp.ndarray,
           n_valid: jnp.ndarray, cache: MLACache,
           attn_len: Optional[int] = None, all_logits: bool = False,
           ) -> Tuple[jnp.ndarray, MLACache]:
    """Append a (bucketed, padded) chunk after ``cache.length`` — the
    chunked-prefill / tool-re-injection pass (same contract as
    llm.extend). Runs the ABSORBED form over the whole chunk: the
    chunk's queries score the latent cache (prefix + chunk, causal)
    without ever decompressing the prefix — MLA's chunked prefill
    reads ``attn_len * (r + rope)`` values per layer, not
    ``attn_len * H * (qk + v)``."""
    offset = cache.length
    b = tokens.shape[0]
    freqs = _freqs(params, cfg)
    positions = offset + jnp.arange(b)
    x = params["tok_emb"][tokens.astype(jnp.int32)]          # (B, D)
    h_, nope, vd, r = (cfg.n_heads, cfg.qk_nope_head_dim, cfg.v_head_dim,
                       cfg.kv_lora_rank)
    s_max = cache.ckv.shape[1]

    def layer_fn(dense: bool):
        def fn(x, inputs):
            layer, ckv_l, kpe_l = inputs
            h = _rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q = _project_q(h, layer, cfg)                    # (B, H, qk)
            q_nope = q[..., :nope]
            q_pe = apply_rope_interleaved(q[..., nope:], positions,
                                          freqs)             # (B, H, rope)
            c, kpe = _latent(h, layer, cfg, positions, freqs)
            ckv_l = jax.lax.dynamic_update_slice(
                ckv_l, c.astype(ckv_l.dtype), (offset, 0))
            kpe_l = jax.lax.dynamic_update_slice(
                kpe_l, kpe.astype(kpe_l.dtype), (offset, 0))
            ckv_v = ckv_l[:attn_len] if attn_len else ckv_l
            kpe_v = kpe_l[:attn_len] if attn_len else kpe_l

            wkv_b = layer["wkv_b"].reshape(r, h_, nope + vd)
            w_uk = wkv_b[..., :nope]
            w_uv = wkv_b[..., nope:]
            q_abs = jnp.einsum("bhn,rhn->bhr",
                               q_nope.astype(jnp.float32),
                               w_uk.astype(jnp.float32))     # (B, H, r)
            scores = (
                jnp.einsum("bhr,sr->bhs", q_abs,
                           ckv_v.astype(jnp.float32))
                + jnp.einsum("bhd,sd->bhs", q_pe.astype(jnp.float32),
                             kpe_v.astype(jnp.float32))
            ) * cfg.attn_scale                               # (B, H, S)
            key_idx = jnp.arange(attn_len or s_max)[None, None, :]
            mask = key_idx <= positions[:, None, None]
            scores = jnp.where(mask, scores, -1e30)
            w = jax.nn.softmax(scores, axis=-1)
            out_c = jnp.einsum("bhs,sr->bhr", w,
                               ckv_v.astype(jnp.float32))    # (B, H, r)
            out = jnp.einsum("bhr,rhv->bhv", out_c,
                             w_uv.astype(jnp.float32))       # (B, H, v)
            x = x + _linear(out.reshape(b, h_ * vd).astype(x.dtype),
                            layer["wo"])
            x = _mlp_for(x, layer, cfg, dense)
            return x, (ckv_l, kpe_l)

        return fn

    k_dense = cfg.first_k_dense if cfg.n_experts else cfg.n_layers
    new_ckv, new_kpe = [], []
    if k_dense:
        x, (c0, kp0) = jax.lax.scan(
            layer_fn(dense=True), x,
            ({**_split_rows(params["attn"], 0, k_dense),
              **params["dense_mlp"]},
             cache.ckv[:k_dense], cache.kpe[:k_dense]))
        new_ckv.append(c0)
        new_kpe.append(kp0)
    if k_dense < cfg.n_layers:
        x, (c1, kp1) = jax.lax.scan(
            layer_fn(dense=False), x,
            ({**_split_rows(params["attn"], k_dense, cfg.n_layers),
              **params["moe_mlp"]},
             cache.ckv[k_dense:], cache.kpe[k_dense:]))
        new_ckv.append(c1)
        new_kpe.append(kp1)
    final = MLACache(jnp.concatenate(new_ckv, axis=0),
                     jnp.concatenate(new_kpe, axis=0),
                     (offset + n_valid).astype(jnp.int32))

    def out_logits(rows):
        return _linear(_rms_norm(rows, params["out_norm"], cfg.norm_eps),
                       params["lm_head"]).astype(jnp.float32)

    if all_logits:
        return out_logits(x), final
    return out_logits(x[jnp.maximum(n_valid - 1, 0)][None])[0], final


def decode_chunk_greedy(params: Dict[str, Any], cfg: MLAConfig,
                        logits: jnp.ndarray, cache: MLACache,
                        n_tokens: int, attn_len: Optional[int] = None,
                        eos_id: Optional[int] = None,
                        suppress_until: Optional[jnp.ndarray] = None,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, MLACache]:
    """k-token greedy lookahead chunk — same contract as
    llm.decode_chunk_greedy (tokens[0] == argmax(logits), caller
    reconciles terminal events by rolling cache.length back)."""

    def body(carry, step):
        lg, cache = carry
        if eos_id is not None:
            ban = (step < suppress_until) & (
                jnp.arange(lg.shape[-1]) == eos_id)
            lg = jnp.where(ban, jnp.float32(-1e30), lg)
        tok = jnp.argmax(lg).astype(jnp.int32)
        lg2, cache = decode_step(params, cfg, tok, cache,
                                 attn_len=attn_len)
        return (lg2, cache), tok

    (lg, cache), tokens = jax.lax.scan(
        body, (logits, cache), jnp.arange(n_tokens))
    return tokens, lg, cache


# ---------------------------------------------------------------------------
# Batched decode (continuous-batching server)
# ---------------------------------------------------------------------------

class BatchedMLACache(NamedTuple):
    """Per-slot latent caches for the batching server — the MLA twin of
    llm.BatchedKVCache, at (r + rope) values per token per layer
    instead of 2*Hk*D (DeepSeek-V2-Lite: 576 vs 8192; the whole point
    of serving MLA natively)."""
    ckv: jnp.ndarray      # (L, B, S, r)
    kpe: jnp.ndarray      # (L, B, S, rope)
    lengths: jnp.ndarray  # (B,) int32

    @classmethod
    def create(cls, cfg: MLAConfig, batch: int,
               dtype: jnp.dtype = jnp.bfloat16,
               max_seq: Optional[int] = None) -> "BatchedMLACache":
        s = max_seq or cfg.max_seq
        return cls(
            ckv=jnp.zeros((cfg.n_layers, batch, s, cfg.kv_lora_rank),
                          dtype),
            kpe=jnp.zeros((cfg.n_layers, batch, s, cfg.qk_rope_head_dim),
                          dtype),
            lengths=jnp.zeros((batch,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "slot"))
def insert_sequence(cache: BatchedMLACache, cfg: MLAConfig, slot: int,
                    seq_cache: MLACache) -> BatchedMLACache:
    """Copy a single-sequence latent cache (from prefill) into batch
    slot ``slot`` — same contract as llm.insert_sequence."""
    ckv = jax.lax.dynamic_update_slice(
        cache.ckv, seq_cache.ckv[:, None].astype(cache.ckv.dtype),
        (0, slot, 0, 0))
    kpe = jax.lax.dynamic_update_slice(
        cache.kpe, seq_cache.kpe[:, None].astype(cache.kpe.dtype),
        (0, slot, 0, 0))
    lengths = cache.lengths.at[slot].set(seq_cache.length)
    return BatchedMLACache(ckv, kpe, lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_len"))
def decode_step_batch(params: Dict[str, Any], cfg: MLAConfig,
                      tokens: jnp.ndarray, active: jnp.ndarray,
                      cache: BatchedMLACache,
                      attn_len: Optional[int] = None,
                      ) -> Tuple[jnp.ndarray, BatchedMLACache]:
    """One ABSORBED decode step for every active slot: tokens (B,) ->
    logits (B, V). Inactive slots compute but write nothing and do not
    advance — same semantics as llm.decode_step_batch, over the
    compressed latent cache (each slot's scores hit its own latent
    MQA-style; V-up applies post-attention)."""
    b = tokens.shape[0]
    pos = cache.lengths                                      # (B,)
    freqs = _freqs(params, cfg)
    x = params["tok_emb"][tokens]                            # (B, D)
    h_, nope, vd, r = (cfg.n_heads, cfg.qk_nope_head_dim, cfg.v_head_dim,
                       cfg.kv_lora_rank)

    def layer_fn(dense: bool):
        def fn(x, inputs):
            layer, ckv_l, kpe_l = inputs     # (B, S, r) / (B, S, rope)
            h = _rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q = _project_q(h, layer, cfg)                    # (B, H, qk)
            q_nope = q[..., :nope]
            q_pe = jax.vmap(lambda qq, p: apply_rope_interleaved(
                qq[None], p[None], freqs)[0])(q[..., nope:], pos)
            c, kpe = _latent(h, layer, cfg, pos, freqs)      # (B,r)/(B,rope)

            def write_row(row, val, p, act):
                new = jax.lax.dynamic_update_slice(
                    row, val[None].astype(row.dtype), (p, 0))
                return jnp.where(act, new, row)

            ckv_l = jax.vmap(write_row)(ckv_l, c, pos, active)
            kpe_l = jax.vmap(write_row)(kpe_l, kpe, pos, active)
            ckv_v = ckv_l[:, :attn_len] if attn_len else ckv_l
            kpe_v = kpe_l[:, :attn_len] if attn_len else kpe_l

            wkv_b = layer["wkv_b"].reshape(r, h_, nope + vd)
            w_uk = wkv_b[..., :nope]
            w_uv = wkv_b[..., nope:]
            q_abs = jnp.einsum("bhn,rhn->bhr",
                               q_nope.astype(jnp.float32),
                               w_uk.astype(jnp.float32))
            scores = (
                jnp.einsum("bhr,bsr->bhs", q_abs,
                           ckv_v.astype(jnp.float32))
                + jnp.einsum("bhd,bsd->bhs", q_pe.astype(jnp.float32),
                             kpe_v.astype(jnp.float32))
            ) * cfg.attn_scale                               # (B, H, S)
            s_len = ckv_v.shape[1]
            mask = jnp.arange(s_len)[None, :] <= pos[:, None]
            scores = jnp.where(mask[:, None, :], scores, -jnp.inf)
            w = jax.nn.softmax(scores, axis=-1)
            out_c = jnp.einsum("bhs,bsr->bhr", w,
                               ckv_v.astype(jnp.float32))
            out = jnp.einsum("bhr,rhv->bhv", out_c,
                             w_uv.astype(jnp.float32))
            x = x + _linear(out.reshape(b, h_ * vd).astype(x.dtype),
                            layer["wo"])
            x = _mlp_for(x, layer, cfg, dense)
            return x, (ckv_l, kpe_l)

        return fn

    k_dense = cfg.first_k_dense if cfg.n_experts else cfg.n_layers
    new_ckv, new_kpe = [], []
    if k_dense:
        x, (c0, kp0) = jax.lax.scan(
            layer_fn(dense=True), x,
            ({**_split_rows(params["attn"], 0, k_dense),
              **params["dense_mlp"]},
             cache.ckv[:k_dense], cache.kpe[:k_dense]))
        new_ckv.append(c0)
        new_kpe.append(kp0)
    if k_dense < cfg.n_layers:
        x, (c1, kp1) = jax.lax.scan(
            layer_fn(dense=False), x,
            ({**_split_rows(params["attn"], k_dense, cfg.n_layers),
              **params["moe_mlp"]},
             cache.ckv[k_dense:], cache.kpe[k_dense:]))
        new_ckv.append(c1)
        new_kpe.append(kp1)
    logits = _linear(_rms_norm(x, params["out_norm"], cfg.norm_eps),
                     params["lm_head"]).astype(jnp.float32)
    lengths = jnp.where(active, pos + 1, pos)
    return logits, BatchedMLACache(jnp.concatenate(new_ckv, axis=0),
                                   jnp.concatenate(new_kpe, axis=0),
                                   lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps",
                                              "attn_len"))
def decode_steps_batch(params: Dict[str, Any], cfg: MLAConfig,
                       tokens: jnp.ndarray, active: jnp.ndarray,
                       cache: BatchedMLACache, n_steps: int,
                       attn_len: Optional[int] = None,
                       ) -> Tuple[jnp.ndarray, BatchedMLACache]:
    """``n_steps`` greedy batch-decode steps as ONE program — the MLA
    twin of llm.decode_steps_batch (the server's chunked fast path)."""
    def step(carry, _):
        toks, cache = carry
        logits, cache = decode_step_batch(params, cfg, toks, active,
                                          cache, attn_len=attn_len)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), produced = jax.lax.scan(
        step, (tokens, cache), None, length=n_steps)
    return produced, cache


# The production LLMRunner and LLMServer drive any model module
# exposing this surface (their ``model=`` parameter); MLACache /
# BatchedMLACache play the KVCache / BatchedKVCache roles.
KVCache = MLACache
BatchedKVCache = BatchedMLACache
