"""Pipeline-parallel training (GPipe schedule) over a ``pp`` mesh axis.

The third classic scaling axis, beside tensor parallelism
(`parallel/sharding.py`) and data/FSDP. Layers are stage-sharded: the
stacked (L, ...) parameter leaves split their layer axis over ``pp``
via ``shard_map``, so each device holds L/pp contiguous layers and the
full tree never materializes anywhere. Microbatches flow stage-to-stage
with ``jax.lax.ppermute`` (a neighbor hop on the ICI ring, the cheapest
collective there is) in a ``lax.scan`` over n_micro + n_stages - 1
ticks — the standard GPipe bubble. The whole schedule is differentiable
(`ppermute` transposes to the reverse hop; the scan transposes to
reverse-order accumulation), so one ``jax.value_and_grad`` gives
pipeline-parallel training with zero hand-written backward logic.

Design notes (honest costs):
- SPMD masking, not per-stage programs: every device executes the same
  tick body and selects its role with ``lax.axis_index("pp")`` masks —
  the XLA-friendly formulation (no data-dependent control flow). The
  embed + lm-head + loss math therefore runs on every stage and is
  masked off where irrelevant; for real models the head is a tiny
  fraction of stage FLOPs, and the alternative (splitting the head out
  of the pipeline body) is a later optimization, not a correctness
  need.
- Bubble fraction is (pp-1)/(n_micro + pp - 1): pick n_micro >= 4*pp
  in production; tests use small values for speed.
- Composable with dp by adding a leading mesh axis and sharding the
  microbatch batch dim; kept 1-D here for clarity.

The reference has no distributed compute at all (SURVEY.md section
2.10); this module, like the rest of `parallel/`, is the TPU rebuild
going beyond it.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trackiellm_tpu.models import llm as llm_model


def _stage_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """shard_map in_specs for the param tree: stacked per-layer leaves
    split their layer axis over pp; everything else replicated."""

    def spec_for(path, leaf):
        if path and path[0] == "layers":
            return P("pp", *([None] * (leaf.ndim - 1)))
        return P()

    return {
        k: ({kk: spec_for(("layers",), vv) for kk, vv in v.items()}
            if k == "layers" else spec_for((), v))
        for k, v in params.items()
    }


def pp_param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """NamedSharding tree matching :func:`_stage_specs`."""
    specs = _stage_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def _dense_layer(x: jnp.ndarray, layer, li, cfg: llm_model.LLMConfig,
                 freqs: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """One transformer layer on a (B, S, D) microbatch — the SHARED
    config-aware body (`parallel/layers.py`: full family zoo incl.
    Gemma-2 softcaps/sandwich norms/alternating windows, QKV biases),
    same math as parallel.train.lm_forward_batched's layer. ``li`` is
    the GLOBAL layer index (stage offset + local position), which the
    alternating-window policy keys on."""
    from trackiellm_tpu.parallel import layers as shared_layers

    y, _ = shared_layers.transformer_layer(
        x, layer, li, cfg, freqs, positions,
        attn_core=lambda q, k, v, li2: shared_layers.dense_attn_core(
            cfg, li2, q, k, v, positions))
    return y


def pp_loss(params: Dict[str, Any], cfg: llm_model.LLMConfig, mesh: Mesh,
            tokens: jnp.ndarray, n_microbatches: int) -> jnp.ndarray:
    """Pipeline-parallel LM loss over (B, S) tokens, B = n_micro x mb.

    Equals the single-device :func:`parallel.train.lm_loss` up to
    collective reduction order (equality tested on the virtual mesh,
    dense AND MoE — expert banks replicate per stage here; the router
    aux loss is a train.lm_loss concern, not a pipeline one).
    """
    n_stages = mesh.shape["pp"]
    assert cfg.n_layers % n_stages == 0, (cfg.n_layers, n_stages)
    b, s = tokens.shape
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches
    micros = tokens.reshape(n_microbatches, mb, s)
    n_ticks = n_microbatches + n_stages - 1

    from jax.experimental.shard_map import shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(_stage_specs(params), P()),
        out_specs=P(), check_rep=False)
    def run(local_params, micros):
        stage = jax.lax.axis_index("pp")
        is_first = stage == 0
        is_last = stage == n_stages - 1
        freqs = llm_model._freqs(local_params, cfg, s)
        positions = jnp.arange(s)
        layers = local_params["layers"]  # leaves (L/pp, ...)
        l_per = cfg.n_layers // n_stages

        def stage_block(x):
            def body(x, inputs):
                layer, li_local = inputs
                li = stage * l_per + li_local  # global layer index
                return _dense_layer(x, layer, li, cfg, freqs,
                                    positions), None

            y, _ = jax.lax.scan(body, x, (layers, jnp.arange(l_per)))
            return y

        def ce(logits, tgt_tokens):
            tgt = tgt_tokens[:, 1:]
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            return jnp.mean(nll)

        def tick(carry, t):
            state, loss_acc = carry
            m_in = jnp.clip(t, 0, n_microbatches - 1)
            toks_in = jax.lax.dynamic_index_in_dim(
                micros, m_in, axis=0, keepdims=False)
            embedded = local_params["tok_emb"][toks_in].astype(state.dtype)
            x_in = jnp.where(is_first & (t < n_microbatches),
                             embedded, state)
            y = stage_block(x_in)
            # Last stage: head + loss for microbatch t - (pp - 1).
            m_out = t - (n_stages - 1)
            logits = llm_model._output_logits(local_params, cfg, y)
            toks_out = jax.lax.dynamic_index_in_dim(
                micros, jnp.clip(m_out, 0, n_microbatches - 1), axis=0,
                keepdims=False)
            valid = is_last & (m_out >= 0)
            loss_acc = loss_acc + jnp.where(valid, ce(logits, toks_out), 0.0)
            # Hand this tick's activation to the next stage (GPipe hop;
            # no wraparound — stage 0 always re-feeds from the embed).
            state = jax.lax.ppermute(
                y, "pp", perm=[(i, i + 1) for i in range(n_stages - 1)])
            return (state, loss_acc), None

        state0 = jnp.zeros((mb, s, cfg.dim),
                           local_params["tok_emb"].dtype)
        (_, loss_acc), _ = jax.lax.scan(
            tick, (state0, jnp.float32(0.0)), jnp.arange(n_ticks))
        # Only the last stage accumulated loss; share it with everyone.
        return jax.lax.psum(loss_acc, "pp") / n_microbatches

    return run(params, micros)


def init_pp_train_state(key: jax.Array, cfg: llm_model.LLMConfig,
                        mesh: Mesh, lr: float = 1e-4,
                        dtype=jnp.float32) -> Tuple[Dict, Any, Any]:
    """Stage-sharded param + optimizer init (params materialize directly
    into their pp shards via jit out_shardings)."""
    opt = optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.01)
    with mesh:
        abstract = jax.eval_shape(
            functools.partial(llm_model.init_params, cfg=cfg, dtype=dtype),
            key)
        p_shard = pp_param_shardings(mesh, abstract)
        params = jax.jit(
            functools.partial(llm_model.init_params, cfg=cfg, dtype=dtype),
            out_shardings=p_shard)(key)
        opt_state = jax.jit(opt.init, out_shardings=None)(params)
    return params, opt_state, opt


def make_pp_train_step(cfg: llm_model.LLMConfig, mesh: Mesh,
                       opt: optax.GradientTransformation,
                       n_microbatches: int):
    """Jitted pipeline-parallel AdamW train step (donated state).

    MoE configs are refused: pp_loss carries no router load-balancing
    term (the stage scan drops the per-layer router stats), so pipeline
    MoE TRAINING would silently collapse the router — use
    :func:`parallel.train.make_train_step` (dp/fsdp/tp + aux loss) for
    MoE fine-tuning. pp_loss itself still accepts MoE for evaluation.
    """
    assert not cfg.n_experts, (
        "pipeline-parallel TRAINING lacks the MoE load-balancing aux "
        "loss; use parallel.train.make_train_step for MoE fine-tuning")

    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(pp_loss)(
            params, cfg, mesh, tokens, n_microbatches)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1))
