"""Sharding rules for the LLM parameter tree.

Megatron-style tensor parallelism over the ``tp`` axis:
  - wq/wk/wv and w_gate/w_up are column-parallel (output dim sharded) —
    each tp shard owns whole attention heads / MLP columns;
  - wo and w_down are row-parallel (input dim sharded) — XLA inserts the
    psum after the row-parallel matmul automatically;
  - embeddings and lm_head shard the vocab over tp;
  - everything additionally shards over ``fsdp`` on a non-tp axis
    (ZeRO-3 style parameter sharding; XLA all-gathers per layer).

Layout note: per-layer weights are stacked (L, K, N) — axis 0 is the
scan axis and never sharded.
"""

from __future__ import annotations

from typing import Any, Dict


from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_shardings(mesh: Mesh, cfg=None) -> Dict[str, Any]:
    """NamedSharding tree matching models.llm.init_params structure.

    Pass ``cfg`` to cover the optional family-zoo leaves the config
    creates — Qwen2 QKV biases and Gemma-2 sandwich norms, replicated
    (small vectors, same convention as infer_param_shardings)."""

    def ns(*spec) -> NamedSharding:
        return NamedSharding(mesh, P(*spec))

    tree = {
        "tok_emb": ns("tp", "fsdp"),
        "layers": {
            "attn_norm": ns(None, None),
            "wqkv": ns(None, "fsdp", "tp"),    # column-parallel (heads)
            "wo": ns(None, "tp", "fsdp"),      # row-parallel
            "mlp_norm": ns(None, None),
            "w_gu": ns(None, "fsdp", "tp"),    # column-parallel
            "w_down": ns(None, "tp", "fsdp"),  # row-parallel
        },
        "out_norm": ns(None),
        "lm_head": ns("fsdp", "tp"),           # vocab-column-parallel
    }
    if cfg is not None:
        if cfg.qkv_bias:
            tree["layers"]["wqkv_bias"] = ns(None, None)
        if cfg.post_norms:
            tree["layers"]["attn_post_norm"] = ns(None, None)
            tree["layers"]["mlp_post_norm"] = ns(None, None)
        if cfg.qk_norm:
            tree["layers"]["q_norm"] = ns(None, None)
            tree["layers"]["k_norm"] = ns(None, None)
    return tree


def param_shardings_moe(mesh: Mesh, shared: bool = False,
                        cfg=None) -> Dict[str, Any]:
    """MoE variant: expert banks (L, E, K, N) split Megatron-style
    WITHIN each expert (same scheme as inference,
    parallel/infer.py) — experts stay whole per shard because the
    train forward's expert loop slices the E axis statically. The
    router is replicated. ``shared``: add the Qwen2-MoE shared-expert
    weights (one dense SwiGLU, Megatron-split like the dense MLP)."""
    base = param_shardings(mesh, cfg=cfg)

    def ns(*spec) -> NamedSharding:
        return NamedSharding(mesh, P(*spec))

    base["layers"]["moe_gate"] = ns(None, None, None)
    base["layers"]["w_gu"] = ns(None, None, "fsdp", "tp")
    base["layers"]["w_down"] = ns(None, None, "tp", "fsdp")
    if shared:
        base["layers"]["shared_gu"] = ns(None, "fsdp", "tp")
        base["layers"]["shared_down"] = ns(None, "tp", "fsdp")
        base["layers"]["shared_gate"] = ns(None, None, None)
    return base


def data_sharding(mesh: Mesh) -> NamedSharding:
    """(B, S) token batches shard over the combined dp+fsdp axis."""
    return NamedSharding(mesh, P(("dp", "fsdp"), None))


def activation_spec() -> P:
    """Logical spec for (B, S, D) activations: batch over dp+fsdp,
    features replicated (tp materializes on heads inside attention)."""
    return P(("dp", "fsdp"), None, None)


def sequence_spec() -> P:
    """Megatron sequence parallelism: (B, S, D) residual activations
    shard the SEQUENCE axis over tp in the norm/residual regions
    between matmul blocks. Constraining the row-parallel matmul's
    output to this spec makes GSPMD lower its psum as reduce-scatter
    (and all-gather back at the next column-parallel matmul), so the
    RMSNorm/residual math runs on 1/tp of the tokens and remat holds
    1/tp of the residual bytes per chip — the standard Megatron-LM SP
    recipe, expressed as a sharding constraint instead of manual
    collectives."""
    return P(("dp", "fsdp"), "tp", None)


def heads_spec() -> P:
    """(B, S, H, D) attention tensors: heads sharded over tp."""
    return P(("dp", "fsdp"), None, "tp", None)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
