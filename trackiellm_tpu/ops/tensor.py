"""Generic tensor ops exposed through the FFI-equivalent API.

Parity target: the stable C ABI's tensor operations — create/reshape/fill/
add/matmul/matmul_blocked (reference: src/ffi/c_api/tk_ffi_api.h:251-382)
and the CUDA tensor extension inventory (elementwise, activation,
transpose, conv2d, pooling, batch_norm, reductions —
src/gpu/extensions/cuda/tk_cuda_tensor_ops.cu:101-452).

On TPU these are one-liners over XLA — the value of this module is the
*stable surface* (the FFI layer marshals to these by name) plus MXU-aware
defaults (preferred_element_type, bf16-friendly blocked matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


# -- elementwise / activation ------------------------------------------------

add = jax.jit(jnp.add)
subtract = jax.jit(jnp.subtract)
multiply = jax.jit(jnp.multiply)
divide = jax.jit(jnp.divide)
relu = jax.jit(lambda x: jnp.maximum(x, 0))
gelu = jax.jit(jax.nn.gelu)
silu = jax.jit(jax.nn.silu)
sigmoid = jax.jit(jax.nn.sigmoid)
tanh = jax.jit(jnp.tanh)
softmax = jax.jit(functools.partial(jax.nn.softmax, axis=-1))
transpose = jax.jit(jnp.matrix_transpose)


# -- matmul --------------------------------------------------------------------

@jax.jit
def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MXU matmul with f32 accumulation (inputs may be bf16)."""
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block",))
def matmul_blocked(a: jnp.ndarray, b: jnp.ndarray, block: int = 512):
    """Blocked matmul (FFI parity: tk_tensor_matmul_blocked,
    tk_ffi_api.h:382). On TPU, XLA already tiles for the MXU, so blocking
    exists to bound peak memory on very large contractions: the K dimension
    is processed in `block`-sized slabs accumulated in f32."""
    k = a.shape[-1]
    if k <= block:
        return matmul(a, b)
    n_blocks = -(-k // block)
    pad = n_blocks * block - k
    a_p = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    b_p = jnp.pad(b, [(0, pad)] + [(0, 0)] * (b.ndim - 1))
    a_r = a_p.reshape(*a.shape[:-1], n_blocks, block)
    b_r = b_p.reshape(n_blocks, block, *b.shape[1:])

    def body(i, acc):
        return acc + jnp.matmul(
            a_r[..., i, :], b_r[i], preferred_element_type=jnp.float32
        )

    out_shape = (*a.shape[:-1], *b.shape[1:])
    return lax.fori_loop(
        0, n_blocks, body, jnp.zeros(out_shape, jnp.float32)
    )


# -- conv / pooling ---------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("stride", "padding", "groups"))
def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: str = "SAME", groups: int = 1) -> jnp.ndarray:
    """NCHW conv with OIHW weights, f32 accumulation."""
    return lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("size", "stride"))
def max_pool2d(x: jnp.ndarray, size: int = 2, stride: int = 2) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, 1, size, size), (1, 1, stride, stride), "SAME",
    )


@functools.partial(jax.jit, static_argnames=("size", "stride"))
def avg_pool2d(x: jnp.ndarray, size: int = 2, stride: int = 2) -> jnp.ndarray:
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 1, size, size), (1, 1, stride, stride), "SAME"
    )
    return summed / (size * size)


# -- normalization -----------------------------------------------------------------

@jax.jit
def batch_norm(x, mean, var, scale, bias, eps: float = 1e-5):
    """Inference-mode batch norm over NCHW channel axis."""
    shape = (1, -1, 1, 1)
    inv = lax.rsqrt(var.reshape(shape) + eps)
    return (x - mean.reshape(shape)) * inv * scale.reshape(shape) + bias.reshape(shape)


@jax.jit
def layer_norm(x, scale, bias, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * scale + bias


@jax.jit
def rms_norm(x, scale, eps: float = 1e-5):
    ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * lax.rsqrt(ms + eps)).astype(x.dtype) * scale


# -- reductions ------------------------------------------------------------------------

reduce_sum = jax.jit(jnp.sum, static_argnames=("axis",))
reduce_mean = jax.jit(jnp.mean, static_argnames=("axis",))
reduce_max = jax.jit(jnp.max, static_argnames=("axis",))
reduce_min = jax.jit(jnp.min, static_argnames=("axis",))
