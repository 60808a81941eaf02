"""Shared transformer layer body for the parallel forwards.

The training (`parallel/train.py`), pipeline (`parallel/pipeline.py`)
and ring/context-parallel (`parallel/ring.py`) forwards all need the
same layer scaffolding — norm -> fused QKV (+bias) -> rope ->
attention -> wo (+ Gemma-2 post-norm) residual -> MLP — and differ
only in the attention core (batched dense softmax vs. ring hops) and,
for training, in the MLP (router-aux collection / expert-parallel
dispatch). Before this module that scaffolding was written three times
and each copy REFUSED the model-family features it didn't implement
(softcaps, sandwich norms, query scaling, sliding windows, QKV biases
— `_require_plain_attention`). Factoring it once lets the Gemma-2 /
Phi-3 / Qwen2 config zoo flow into every parallel path from the single
config-aware helpers the inference paths already use
(models/llm.py: `_attn_scale`, `_attn_residual`, `_mlp`,
`_output_logits`).

Exactness contract: with the same params, each parallel forward must
match the single-device inference forward per row (tested for a plain
config AND a zoo config in tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model

# attn_core(q, k, v, li) -> f32 context, shapes (..., S, H*Dh) flat;
# q (..., S, Hq, Dh); k/v (..., S, Hkv, Dh), all roped.
AttnCore = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
                    jnp.ndarray]
# mlp_fn(x_residual, layer) -> (x_new, aux); None -> config-aware
# inference MLP (llm_model._mlp) with aux=None.
MlpFn = Optional[Callable[[jnp.ndarray, Dict[str, Any]],
                          Tuple[jnp.ndarray, Any]]]


def layer_windows(cfg: llm_model.LLMConfig, li) -> jnp.ndarray:
    """Effective sliding window for (traced) layer index ``li`` under
    the config's window policy: fixed window, or Gemma-2 alternating
    local(even li)/global(odd li). 0 = unbounded — same convention as
    ops/attention (models/llm.py `_decode_attn`)."""
    win = llm_model._layer_window(cfg)
    if win and llm_model._per_layer_windows(cfg):
        return jnp.where(llm_model._is_sliding(cfg, li),
                         jnp.int32(win), jnp.int32(0))
    return jnp.int32(win)


def causal_mask(cfg: llm_model.LLMConfig, li, q_pos: jnp.ndarray,
                k_pos: jnp.ndarray) -> jnp.ndarray:
    """(Sq, Sk) bool mask from GLOBAL positions: causal, plus the
    config's (possibly per-layer alternating) sliding window — the
    ops/attention convention ``q - k < window``."""
    qi = q_pos[:, None]
    ki = k_pos[None, :]
    mask = ki <= qi
    win = layer_windows(cfg, li)
    return mask & ((win == 0) | (ki > qi - win))


def dense_attn_core(cfg: llm_model.LLMConfig, li, q: jnp.ndarray,
                    k: jnp.ndarray, v: jnp.ndarray,
                    positions: jnp.ndarray) -> jnp.ndarray:
    """Full-featured batched softmax attention: GQA repeat, config
    score scale (query_pre_attn_scalar / longrope attention factor),
    Gemma-2 attn softcap, per-layer sliding windows. Operands
    (..., S, H, Dh); returns (..., S, Hq, Dh) f32."""
    rep = cfg.n_heads // cfg.n_kv_heads
    kh = jnp.repeat(k, rep, axis=-2) if rep > 1 else k
    vh = jnp.repeat(v, rep, axis=-2) if rep > 1 else v
    scores = jnp.einsum("...qhd,...khd->...hqk", q.astype(jnp.float32),
                        kh.astype(jnp.float32)) * llm_model._attn_scale(cfg)
    if cfg.attn_softcap > 0.0:
        scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
    mask = causal_mask(cfg, li, positions, positions)
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...hqk,...khd->...qhd", probs,
                      vh.astype(jnp.float32))


def transformer_layer(
    x: jnp.ndarray,
    layer: Dict[str, Any],
    li,
    cfg: llm_model.LLMConfig,
    freqs: jnp.ndarray,
    positions: jnp.ndarray,
    attn_core: AttnCore,
    mlp_fn: MlpFn = None,
    q_constrain: Callable[[jnp.ndarray], jnp.ndarray] = lambda t: t,
    res_constrain: Callable[[jnp.ndarray], jnp.ndarray] = lambda t: t,
) -> Tuple[jnp.ndarray, Any]:
    """One config-aware transformer layer on ``x`` (..., S, D).

    ``attn_core`` owns the score math (dense softmax or ring hops);
    everything else — QKV fuse/bias, rope, wo residual with Gemma-2
    sandwich norms, config-aware MLP — is the single shared body.
    ``q_constrain``/``res_constrain`` are sharding-constraint hooks for
    the Megatron layouts (identity by default). Returns ``(x, aux)``
    with ``aux`` the MLP's router stats (None for dense/default)."""
    s = x.shape[-2]
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    lead = x.shape[:-2]

    h = llm_model._attn_in(x, layer, cfg)
    qkv = llm_model._linear(h, layer["wqkv"])
    if cfg.qkv_bias:
        qkv = qkv + layer["wqkv_bias"]
    q = qkv[..., :qd].reshape(*lead, s, cfg.n_heads, cfg.head_dim)
    k = qkv[..., qd:qd + kvd].reshape(*lead, s, cfg.n_kv_heads,
                                      cfg.head_dim)
    v = qkv[..., qd + kvd:].reshape(*lead, s, cfg.n_kv_heads,
                                    cfg.head_dim)
    q = q_constrain(q)
    q, k = llm_model._qk_norm(q, k, layer, cfg)
    freqs_li = llm_model._layer_freqs(cfg, li, freqs)
    q = llm_model.apply_rope(q, positions, freqs_li)
    k = llm_model.apply_rope(k, positions, freqs_li)
    q, k = llm_model._post_rope_qk(q, k, positions, li, cfg)

    if getattr(cfg, "parallel_residual", False):
        raise NotImplementedError(
            "parallel-residual (Command-R) layers are inference-only "
            "for now — the train/pipeline/ring bodies keep sequential "
            "residuals")
    if getattr(cfg, "attn_chunk", 0):
        raise NotImplementedError(
            "chunked attention (Llama-4) is inference-only for now — "
            "the train/pipeline/ring attention cores don't build the "
            "chunk mask")
    attn = attn_core(q, k, v, li).reshape(*lead, s, -1)
    x = llm_model._attn_residual(x, attn, layer, cfg)
    x = res_constrain(x)

    if mlp_fn is None:
        flat = x.reshape(-1, x.shape[-1])
        x = llm_model._mlp(flat, layer, cfg).reshape(x.shape)
        aux = None
    else:
        x, aux = mlp_fn(x, layer)
    x = res_constrain(x)
    return x, aux
