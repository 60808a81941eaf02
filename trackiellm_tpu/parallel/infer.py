"""Tensor-parallel single-sequence inference (sharded prefill + decode).

The reference serves its 7B LLM on one device (llama.cpp context,
src/ai_models/tk_runner_streaming.c); this module is where the rebuild
scales that path over an ICI mesh. The same :mod:`trackiellm_tpu.models.llm`
forward runs unchanged — only shardings differ:

  - ``wqkv`` / ``w_gu`` are column-parallel over ``tp`` (each shard owns
    whole attention heads / MLP columns), ``wo`` / ``w_down`` are
    row-parallel (XLA inserts the psum);
  - quantized weights shard the same way: both ``values`` and ``scales``
    of a :class:`~trackiellm_tpu.ops.quant.QuantizedLinear` carry the
    matrix's partition spec (Q4 packs two K-halves per byte, so a
    K-shard of the packed values is *not* a contiguous K-shard of the
    dequantized matrix — GSPMD still partitions the dequant+matmul graph
    correctly, at worst with an extra collective);
  - the KV cache (L, S, Hk, D) shards KV heads over ``tp``;
  - embeddings / lm_head shard the vocab over ``tp``.

``n_kv_heads`` and the quantization group count per matrix must be
divisible by the tp degree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.ops.quant import QuantizedLinear


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _q(mesh: Mesh, *spec) -> QuantizedLinear:
    """A QuantizedLinear whose values and scales share one spec."""
    return QuantizedLinear(values=_ns(mesh, *spec), scales=_ns(mesh, *spec))


def infer_param_shardings(mesh: Mesh, quantized: bool,
                          params: Dict[str, Any] = None) -> Dict[str, Any]:
    """Sharding tree for the inference param tree (bf16 or quantized).

    Pass ``params`` to match trees that carry the optional extras —
    Qwen2 QKV biases, Gemma-2 sandwich norms, Llama-3.1 rope factors —
    all replicated (vectors; the bias follows wqkv's column split)."""
    col = _q(mesh, None, None, "tp") if quantized else _ns(
        mesh, None, None, "tp")
    row = _q(mesh, None, "tp", None) if quantized else _ns(
        mesh, None, "tp", None)
    head = _q(mesh, None, "tp") if quantized else _ns(mesh, None, "tp")
    tree = {
        "tok_emb": _ns(mesh, "tp", None),
        "layers": {
            "attn_norm": _ns(mesh, None, None),
            "wqkv": col,
            "wo": row,
            "mlp_norm": _ns(mesh, None, None),
            "w_gu": col,
            "w_down": row,
        },
        "out_norm": _ns(mesh, None),
        "lm_head": head,
    }
    if params is not None:
        for key in ("wqkv_bias", "attn_post_norm", "mlp_post_norm",
                    "q_norm", "k_norm"):
            if key in params["layers"]:
                tree["layers"][key] = _ns(mesh, None, None)
        for key in ("rope_factors", "rope_factors_short",
                    "rope_factors_long"):
            if key in params:
                tree[key] = _ns(mesh, None)
        if "moe_gate" in params["layers"]:
            # MoE banks (L, E, K, N): Megatron-style split WITHIN each
            # expert (experts replicated — the expert loop slices the E
            # axis statically, which must stay local). Router replicated.
            tree["layers"]["moe_gate"] = _ns(mesh, None, None, None)
            tree["layers"]["w_gu"] = (
                _q(mesh, None, None, None, "tp") if quantized
                else _ns(mesh, None, None, None, "tp"))
            tree["layers"]["w_down"] = (
                _q(mesh, None, None, "tp", None) if quantized
                else _ns(mesh, None, None, "tp", None))
        if "shared_gu" in params["layers"]:
            # Qwen2-MoE shared expert: plain Megatron column/row split;
            # the scalar gate is replicated.
            tree["layers"]["shared_gu"] = (
                _q(mesh, None, None, "tp") if quantized
                else _ns(mesh, None, None, "tp"))
            tree["layers"]["shared_down"] = (
                _q(mesh, None, "tp", None) if quantized
                else _ns(mesh, None, "tp", None))
            tree["layers"]["shared_gate"] = _ns(mesh, None, None, None)
    return tree


def kv_cache_sharding(mesh: Mesh) -> llm_model.KVCache:
    """KV cache shards KV heads over tp; length scalar replicated."""
    kv = _ns(mesh, None, None, "tp", None)
    return llm_model.KVCache(k=kv, v=kv, length=_ns(mesh))


def mla_param_shardings(mesh: Mesh, params: Dict[str, Any],
                        ) -> Dict[str, Any]:
    """Sharding tree for a models.mla (DeepSeek-V2) param tree.

    Head-parallel MLA: the per-head projections split over ``tp``
    (``wq``/``wq_b`` and ``wkv_b`` column-wise — whole heads per shard,
    since both stack head-major — ``wo`` row-wise, psum by GSPMD).
    The latent projections (``wkv_a``/``wq_a``) and the latent cache
    stay REPLICATED: every shard's heads score the same shared latent,
    the architecture's MQA-style trade (DeepSeek's own serving keeps
    attention data-parallel for the same reason). MoE banks split
    within each expert, the dense first-k MLP Megatron-style — the
    same scheme as infer_param_shardings. Requires n_heads and the
    MLP/expert hidden dims divisible by the tp degree."""
    rep2 = _ns(mesh, None, None)
    attn = {
        "attn_norm": rep2, "mlp_norm": rep2, "kv_a_norm": rep2,
        "wkv_a": _ns(mesh, None, None, None),
        "wkv_b": _ns(mesh, None, None, "tp"),
        "wo": _ns(mesh, None, "tp", None),
    }
    if "wq" in params["attn"]:
        attn["wq"] = _ns(mesh, None, None, "tp")
    else:
        attn["wq_a"] = _ns(mesh, None, None, None)
        attn["q_a_norm"] = rep2
        attn["wq_b"] = _ns(mesh, None, None, "tp")
    dense_mlp = {} if not params["dense_mlp"] else {
        "w_gu": _ns(mesh, None, None, "tp"),
        "w_down": _ns(mesh, None, "tp", None),
    }
    moe_mlp = {} if not params["moe_mlp"] else {
        "moe_gate": _ns(mesh, None, None, None),
        "w_gu": _ns(mesh, None, None, None, "tp"),
        "w_down": _ns(mesh, None, None, "tp", None),
    }
    if "moe_gate_bias" in params["moe_mlp"]:
        moe_mlp["moe_gate_bias"] = rep2
    if "shared_gu" in params["moe_mlp"]:
        moe_mlp["shared_gu"] = _ns(mesh, None, None, "tp")
        moe_mlp["shared_down"] = _ns(mesh, None, "tp", None)
    tree = {
        "tok_emb": _ns(mesh, "tp", None),
        "attn": attn,
        "dense_mlp": dense_mlp,
        "moe_mlp": moe_mlp,
        "out_norm": _ns(mesh, None),
        "lm_head": _ns(mesh, None, "tp"),
    }
    if "rope_factors" in params:
        tree["rope_factors"] = _ns(mesh, None)
    return tree


def mla_cache_sharding(mesh: Mesh):
    """MLA latent cache: replicated (shared across all heads — see
    mla_param_shardings)."""
    from trackiellm_tpu.models import mla as mla_model

    return mla_model.MLACache(ckv=_ns(mesh, None, None, None),
                              kpe=_ns(mesh, None, None, None),
                              length=_ns(mesh))


def paged_pool_sharding(mesh: Mesh):
    """Sharding for a PagedKVPool's device pools
    ``(L, n_pages, page_size, Hk, D)``: KV heads over ``tp`` — the
    page axis stays unsharded so page-id gathers/scatters are local
    per shard (each shard holds its heads' slice of EVERY page; the
    page table is host state and replicates). Composes with
    infer_param_shardings: the per-layer attention reads its local
    heads' pages, matmul psums ride GSPMD as in the dense path."""
    return _ns(mesh, None, None, None, "tp", None)


def quant_pool_sharding(mesh: Mesh):
    """Sharding for an int8 QuantPool (llm/paging.py): values
    ``(L, n_pages, page_size, Hk, D)`` and their per-(cell, head) f32
    scales ``(L, n_pages, page_size, Hk)`` BOTH shard the KV-head axis
    over ``tp`` — the same axis :func:`paged_pool_sharding` splits, so
    page gathers, the int8 cell write and the dequant multiply all
    stay shard-local (VERDICT r4 #4a: this closes the last
    single-device-only serving cell)."""
    from trackiellm_tpu.llm.paging import QuantPool

    return QuantPool(vals=_ns(mesh, None, None, None, "tp", None),
                     scale=_ns(mesh, None, None, None, "tp"))


def batched_mla_sharding(mesh: Mesh):
    """Batch-server MLA latent cache (L, B, S, r)+(L, B, S, rope):
    replicated, like the single-sequence cache — every tp shard's
    heads score the same shared latent (see mla_param_shardings)."""
    from trackiellm_tpu.models import mla as mla_model

    rep = _ns(mesh, None, None, None, None)
    return mla_model.BatchedMLACache(ckv=rep, kpe=rep,
                                     lengths=_ns(mesh, None))


def batched_kv_sharding(mesh: Mesh) -> llm_model.BatchedKVCache:
    """Server-slot cache (L, B, S, Hk, D): KV heads over tp, slots
    replicated (slots are a latency axis, not a throughput one — the
    whole batch decodes in one program and each shard needs every
    slot's rows for its heads)."""
    kv = _ns(mesh, None, None, None, "tp", None)
    return llm_model.BatchedKVCache(k=kv, v=kv, lengths=_ns(mesh, None))


def make_sharded_mla(cfg, mesh: Mesh, params: Dict[str, Any],
                     attn_len: int):
    """(prefill_fn, decode_fn) for a models.mla tree, tensor-parallel
    over ``tp`` (see mla_param_shardings for the layout)."""
    from trackiellm_tpu.models import mla as mla_model

    p_shard = mla_param_shardings(mesh, params)
    c_shard = mla_cache_sharding(mesh)

    def pf(params, tokens, length, cache):
        return mla_model.prefill(params, cfg, tokens, length, cache)

    def step(params, token, cache):
        return mla_model.decode_step(params, cfg, token, cache,
                                     attn_len=attn_len)

    prefill_fn = jax.jit(
        pf,
        in_shardings=(p_shard, _ns(mesh, None), _ns(mesh), c_shard),
        out_shardings=(_ns(mesh, "tp"), c_shard))
    decode_fn = jax.jit(
        step,
        in_shardings=(p_shard, _ns(mesh), c_shard),
        out_shardings=(_ns(mesh, "tp"), c_shard))
    return prefill_fn, decode_fn


def make_sharded_prefill(cfg: llm_model.LLMConfig, mesh: Mesh,
                         quantized: bool):
    """jit of llm.prefill with tensor-parallel in/out shardings."""
    p_shard = infer_param_shardings(mesh, quantized)
    c_shard = kv_cache_sharding(mesh)

    def pf(params, tokens, length, cache):
        return llm_model.prefill(params, cfg, tokens, length, cache)

    return jax.jit(
        pf,
        in_shardings=(p_shard, _ns(mesh, None), _ns(mesh), c_shard),
        out_shardings=(_ns(mesh, "tp"), c_shard),
    )


def make_sharded_decode(cfg: llm_model.LLMConfig, mesh: Mesh,
                        quantized: bool, attn_len: int):
    """jit of llm.decode_step with tensor-parallel in/out shardings."""
    p_shard = infer_param_shardings(mesh, quantized)
    c_shard = kv_cache_sharding(mesh)

    def step(params, token, cache):
        return llm_model.decode_step(params, cfg, token, cache,
                                     attn_len=attn_len)

    return jax.jit(
        step,
        in_shardings=(p_shard, _ns(mesh), c_shard),
        out_shardings=(_ns(mesh, "tp"), c_shard),
    )
