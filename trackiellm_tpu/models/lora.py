"""LoRA adapters over the (frozen, possibly quantized) LLM base.

Beyond the reference (it has no fine-tuning at all); this is the
on-device personalization path the roadmap calls for: adapt the
assistant's language to its user by training rank-r additions
(~0.1% of parameters) while the Q4 base stays frozen — the update
fits in host memory and trains on the same chip that serves.

Mechanism: each adapted projection becomes ``y = base(x) + (x @ A) @ B
* (alpha / r)``. ``LoraLinear`` is a pytree, so the existing forwards
(`models.llm`, `parallel.train`) work unchanged through ``_linear``'s
dispatch; training takes gradients with respect to the adapter tree
only.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.ops.quant import QuantizedLinear, dequantize


class LoraLinear(NamedTuple):
    """base + (x @ a) @ b * scale. ``base`` is an array or
    QuantizedLinear; a: (..., K, r), b: (..., r, N)."""

    base: Any
    a: jnp.ndarray
    b: jnp.ndarray
    alpha: jnp.ndarray  # scalar f32 (traced so the tree stays uniform)


# The LoRA forward lives in models.llm._linear (structural dispatch on
# the LoraLinear shape) so every existing forward picks it up.

DEFAULT_TARGETS = ("wqkv", "wo", "w_gu", "w_down")


def init_lora(key: jax.Array, params: Dict[str, Any],
              rank: int = 8, alpha: float = 16.0,
              targets: Sequence[str] = DEFAULT_TARGETS,
              dtype=jnp.float32) -> Dict[str, Any]:
    """Adapter tree for the stacked per-layer projections. A is
    Gaussian, B is zero (standard LoRA init: delta starts at 0)."""
    adapters: Dict[str, Any] = {}
    for i, name in enumerate(targets):
        w = params["layers"][name]
        if isinstance(w, QuantizedLinear):
            # Stacked (L, K_stored, N); Q4 stores K/2 packed rows.
            l, k_stored, n = w.values.shape
            k = k_stored * (2 if w.values.dtype == jnp.uint8 else 1)
        else:
            l, k, n = w.shape
        sub = jax.random.fold_in(key, i)
        adapters[name] = {
            "a": (jax.random.normal(sub, (l, k, rank), jnp.float32)
                  / (k ** 0.5)).astype(dtype),
            "b": jnp.zeros((l, rank, n), dtype),
        }
    adapters["__alpha__"] = jnp.float32(alpha)
    return adapters


def attach_lora(params: Dict[str, Any],
                adapters: Dict[str, Any]) -> Dict[str, Any]:
    """Wrap the targeted projections with their adapters (pure; the
    original tree is untouched)."""
    alpha = adapters["__alpha__"]
    out = dict(params)
    layers = dict(params["layers"])
    for name, ab in adapters.items():
        if name == "__alpha__":
            continue
        l = ab["a"].shape[0]
        # Per-layer alpha vector: the layer scan slices every leaf's
        # leading axis, so scalars cannot ride the scanned tree.
        layers[name] = LoraLinear(base=layers[name], a=ab["a"], b=ab["b"],
                                  alpha=jnp.broadcast_to(alpha, (l,)))
    out["layers"] = layers
    return out


def merge_lora(params: Dict[str, Any], adapters: Dict[str, Any],
               requantize_bits: int = 0) -> Dict[str, Any]:
    """Fold adapters into the base weights (for deployment without the
    LoRA compute). Quantized bases are dequantized, merged, and
    requantized at ``requantize_bits`` (0 keeps them dense f32)."""
    from trackiellm_tpu.ops.quant import quantize_q4, quantize_q8

    alpha = float(adapters["__alpha__"])
    out = dict(params)
    layers = dict(params["layers"])
    for name, ab in adapters.items():
        if name == "__alpha__":
            continue
        base = layers[name]
        rank = ab["a"].shape[-1]
        delta = jnp.einsum("lkr,lrn->lkn", ab["a"].astype(jnp.float32),
                           ab["b"].astype(jnp.float32)) * (alpha / rank)
        if isinstance(base, QuantizedLinear):
            dense = jnp.stack([dequantize(QuantizedLinear(
                base.values[i], base.scales[i]))
                for i in range(base.values.shape[0])])
            merged = dense + delta
            if requantize_bits in (4, 8):
                quant = quantize_q4 if requantize_bits == 4 else quantize_q8
                g = base.group_size
                qs = [quant(merged[i], g) for i in range(merged.shape[0])]
                layers[name] = QuantizedLinear(
                    values=jnp.stack([q.values for q in qs]),
                    scales=jnp.stack([q.scales for q in qs]))
            else:
                layers[name] = merged
        else:
            layers[name] = (base.astype(jnp.float32) + delta).astype(
                base.dtype)
    out["layers"] = layers
    return out


def make_lora_train_step(base_params: Dict[str, Any],
                         cfg: llm_model.LLMConfig, optimizer):
    """Jitted LoRA step: gradients flow ONLY through the adapter tree;
    the (quantized) base is a closed-over constant."""
    from trackiellm_tpu.parallel.train import lm_loss

    def loss_fn(adapters, tokens):
        return lm_loss(attach_lora(base_params, adapters), cfg, tokens)

    @jax.jit
    def step(adapters, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(adapters, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        alpha = adapters["__alpha__"]  # not a trainable parameter
        adapters = jax.tree.map(lambda p, u: p + u, adapters, updates)
        adapters["__alpha__"] = alpha
        return adapters, opt_state, loss

    return step
