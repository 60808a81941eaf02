"""Depth map -> 3-D point cloud and spatial helpers.

Parity target: the reference's ``depth_to_point_cloud`` kernels
(CUDA: src/gpu/cuda/tk_cuda_kernels.cu:201; Metal/Vulkan/OpenCL twins) and
the navigation engine's unprojection (src/navigation/tk_path_planner.c:77-83),
plus the Rust point-cloud module (src/vision/src/point_cloud.rs).

TPU design: the unprojection is a pure elementwise program over the HxW
grid — XLA fuses it with any downstream rotate/select. Voxel downsample
uses a fixed-grid scatter-min, keeping shapes static.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def depth_to_point_cloud(
    depth_m: jnp.ndarray,
    fx: float | jnp.ndarray,
    fy: float | jnp.ndarray,
    cx: float | jnp.ndarray,
    cy: float | jnp.ndarray,
) -> jnp.ndarray:
    """Unproject an (H, W) metric depth map to camera-frame points (H*W, 3).

    Pinhole model: X = (u - cx) * Z / fx, Y = (v - cy) * Z / fy, Z = depth.
    Invalid depths (<= 0) yield rows of zeros.
    """
    h, w = depth_m.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    z = depth_m.astype(jnp.float32)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (z > 0).reshape(-1, 1)
    return jnp.where(valid, pts, 0.0)


@jax.jit
def rotate_points(points: jnp.ndarray, quat_wxyz: jnp.ndarray) -> jnp.ndarray:
    """Rotate (N,3) points by a unit quaternion (w,x,y,z) — the navigation
    engine's orientation correction (reference: tk_path_planner.c:84)."""
    w, x, y, z = quat_wxyz[0], quat_wxyz[1], quat_wxyz[2], quat_wxyz[3]
    rot = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    return points @ rot.T


@functools.partial(jax.jit, static_argnames=("grid_w", "grid_d"))
def points_to_height_grid(
    points: jnp.ndarray,
    grid_w: int = 32,
    grid_d: int = 32,
    cell_m: float = 0.25,
    max_range_m: float = 8.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter points into a ground-plane (depth x lateral) height grid.

    Returns ``(max_height, count)`` each (grid_d, grid_w): per-cell max Y
    (height) and sample count. This is the traversability-grid precursor
    (reference: tk_path_planner.c:53's grid classification). Fixed grid
    keeps the scatter shape static for XLA.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    valid = (z > 0.05) & (z < max_range_m)
    col = jnp.clip((x / cell_m + grid_w / 2).astype(jnp.int32), 0, grid_w - 1)
    row = jnp.clip((z / cell_m).astype(jnp.int32), 0, grid_d - 1)
    flat = row * grid_w + col
    flat = jnp.where(valid, flat, grid_w * grid_d)  # dump row for invalid

    n_cells = grid_w * grid_d
    heights = jnp.full((n_cells + 1,), -jnp.inf).at[flat].max(
        jnp.where(valid, -y, -jnp.inf)  # camera Y points down; -y = height
    )
    counts = jnp.zeros((n_cells + 1,), jnp.int32).at[flat].add(
        valid.astype(jnp.int32)
    )
    heights = jnp.where(counts[:n_cells] > 0, heights[:n_cells], 0.0)
    return (
        heights.reshape(grid_d, grid_w),
        counts[:n_cells].reshape(grid_d, grid_w),
    )
