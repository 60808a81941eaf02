"""Navigation engine: depth -> point cloud -> RANSAC ground plane ->
traversability grid -> hazards.

Parity target: ``tk_path_planner`` (reference:
src/navigation/tk_path_planner.c): depth-map unprojection (:77-83),
orientation correction (:84), RANSAC ground-plane fit with 100
iterations / 5 cm inlier threshold (:24-25, :89), traversability-grid
classification (:53), hazard query + clear-path search
(tk_path_planner.h:170-190).

TPU design: the whole RANSAC is one fixed-shape jit program — all 100
candidate planes are fitted and scored **in parallel** (a (100, N)
distance matrix) instead of the reference's sequential loop; the grid
scatter is a fixed-shape segment-max. Only the final tiny grid crosses
to the host for hazard naming.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.ops.pointcloud import depth_to_point_cloud, rotate_points

RANSAC_ITERS = 100          # tk_path_planner.c:24
RANSAC_INLIER_M = 0.05      # tk_path_planner.c:25


class CellClass(enum.IntEnum):
    """Traversability-grid cell classes (parity: the reference's grid
    classification, tk_path_planner.c:53)."""

    UNKNOWN = 0
    TRAVERSABLE = 1
    OBSTACLE = 2
    HOLE = 3
    STEP_UP = 4
    STEP_DOWN = 5


@dataclasses.dataclass
class NavigationConfig:
    grid_w: int = 32
    grid_d: int = 32
    cell_m: float = 0.25
    max_range_m: float = 8.0
    # Height-above-plane classification thresholds (meters).
    traversable_h: float = 0.05
    step_h: float = 0.15     # fixture: 0.15 m => obstacle boundary
    hole_h: float = -0.10
    # Camera intrinsics (defaults for a 640x480-ish depth map).
    fx: float = 300.0
    fy: float = 300.0


@functools.partial(jax.jit, static_argnames=())
def ransac_ground_plane(points: jnp.ndarray, key: jax.Array,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit the dominant roughly-horizontal plane.

    ``points``: (N, 3) camera/world points (invalid rows may be zero).
    Returns (plane (4,), inlier_frac): plane = [nx, ny, nz, d] with
    n·p + d = 0 and n·up >= 0.

    All RANSAC_ITERS hypotheses are evaluated in parallel on the VPU.
    """
    n = points.shape[0]
    valid = jnp.any(points != 0.0, axis=1)
    n_valid = jnp.maximum(jnp.sum(valid), 1)

    idx = jax.random.randint(key, (RANSAC_ITERS, 3), 0, n)
    p0 = points[idx[:, 0]]
    p1 = points[idx[:, 1]]
    p2 = points[idx[:, 2]]
    normal = jnp.cross(p1 - p0, p2 - p0)  # (I, 3)
    norm = jnp.linalg.norm(normal, axis=1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-9)
    # Orient normals "up" (camera -Y is up: gravity-down frames put the
    # floor below the camera, so up = -Y here).
    up = jnp.array([0.0, -1.0, 0.0])
    sign = jnp.sign(normal @ up)[:, None]
    sign = jnp.where(sign == 0, 1.0, sign)
    normal = normal * sign
    d = -jnp.sum(normal * p0, axis=1)  # (I,)

    # Distances of every point to every candidate plane: (I, N).
    dist = jnp.abs(points @ normal.T + d[None, :]).T
    inliers = jnp.sum((dist < RANSAC_INLIER_M) & valid[None, :], axis=1)

    # Reject non-horizontal candidates (walls): need n·up >= 0.7.
    horizontal = (normal @ up) >= 0.7
    degenerate = norm[:, 0] < 1e-9
    score = jnp.where(horizontal & ~degenerate, inliers, -1)

    best = jnp.argmax(score)
    plane = jnp.concatenate([normal[best], d[best][None]])
    frac = score[best].astype(jnp.float32) / n_valid.astype(jnp.float32)
    return plane, jnp.maximum(frac, 0.0)


@functools.partial(jax.jit, static_argnames=("grid_w", "grid_d"))
def traversability_grid(
    points: jnp.ndarray,     # (N, 3)
    plane: jnp.ndarray,      # (4,)
    grid_w: int = 32,
    grid_d: int = 32,
    cell_m: float = 0.25,
    max_range_m: float = 8.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter per-point height-above-plane into a (D, W) grid.

    Returns (max_height, min_height) per cell; empty cells are NaN.
    """
    h = points @ plane[:3] + plane[3]  # signed height above ground
    x, z = points[:, 0], points[:, 2]
    valid = (z > 0.05) & (z < max_range_m)
    col = jnp.clip((x / cell_m + grid_w / 2).astype(jnp.int32), 0, grid_w - 1)
    row = jnp.clip((z / cell_m).astype(jnp.int32), 0, grid_d - 1)
    flat = jnp.where(valid, row * grid_w + col, grid_w * grid_d)

    n_cells = grid_w * grid_d
    hmax = jnp.full((n_cells + 1,), -jnp.inf).at[flat].max(
        jnp.where(valid, h, -jnp.inf))
    hmin = jnp.full((n_cells + 1,), jnp.inf).at[flat].min(
        jnp.where(valid, h, jnp.inf))
    hmax = jnp.where(jnp.isfinite(hmax[:n_cells]), hmax[:n_cells], jnp.nan)
    hmin = jnp.where(jnp.isfinite(hmin[:n_cells]), hmin[:n_cells], jnp.nan)
    return hmax.reshape(grid_d, grid_w), hmin.reshape(grid_d, grid_w)


def classify_grid(hmax: np.ndarray, hmin: np.ndarray,
                  cfg: NavigationConfig) -> np.ndarray:
    """Host-side cell classification (tiny array, branchy rules)."""
    grid = np.full(hmax.shape, CellClass.UNKNOWN, np.int32)
    known = ~np.isnan(hmax)
    grid[known & (np.abs(hmax) <= cfg.traversable_h)] = CellClass.TRAVERSABLE
    grid[known & (hmax > cfg.traversable_h)
         & (hmax < cfg.step_h)] = CellClass.STEP_UP
    # Fixture contract: a 0.15 m vertical change classifies as Obstacle
    # (reference: tests/fixtures/regression_1/ground_truth.json).
    grid[known & (hmax >= cfg.step_h)] = CellClass.OBSTACLE
    grid[known & (hmin < cfg.hole_h)
         & (hmax <= cfg.traversable_h)] = CellClass.HOLE
    step_down = known & (hmin < -cfg.traversable_h) & (hmin >= cfg.hole_h)
    grid[step_down & (grid != CellClass.OBSTACLE)] = CellClass.STEP_DOWN
    return grid


class NavigationEngine:
    """Parity surface: tk_navigation_engine_create/update/get_map +
    hazard and clear-path queries (tk_path_planner.h:105-190)."""

    def __init__(self, config: Optional[NavigationConfig] = None,
                 seed: int = 0):
        self.config = config or NavigationConfig()
        self._key = jax.random.PRNGKey(seed)
        self.grid: Optional[np.ndarray] = None
        self.plane: Optional[np.ndarray] = None
        self.inlier_frac: float = 0.0

    def update(self, depth_map_m, orientation_wxyz=None) -> np.ndarray:
        """Depth (H, W) meters (+ optional device orientation) -> new
        traversability grid."""
        cfg = self.config
        depth = jnp.asarray(depth_map_m)
        h, w = depth.shape
        pts = depth_to_point_cloud(depth, cfg.fx, cfg.fy, w / 2.0, h / 2.0)
        if orientation_wxyz is not None:
            pts = rotate_points(pts, jnp.asarray(orientation_wxyz,
                                                 jnp.float32))
        self._key, sub = jax.random.split(self._key)
        plane, frac = ransac_ground_plane(pts, sub)
        hmax, hmin = traversability_grid(
            pts, plane, cfg.grid_w, cfg.grid_d, cfg.cell_m, cfg.max_range_m)
        self.plane = np.asarray(plane)
        self.inlier_frac = float(frac)
        self.grid = classify_grid(np.asarray(hmax), np.asarray(hmin), cfg)
        return self.grid

    # -- queries (parity: hazard query + clear-path search) ---------------

    def current_hazards(self, lookahead_m: float = 2.5) -> List[str]:
        """Hazard strings for cells in the near corridor ahead."""
        if self.grid is None:
            return []
        cfg = self.config
        rows = int(lookahead_m / cfg.cell_m)
        w = cfg.grid_w
        corridor = self.grid[:rows, w // 2 - 2: w // 2 + 3]
        hazards = []
        names = {
            CellClass.OBSTACLE: "obstáculo à frente",
            CellClass.HOLE: "buraco à frente",
            CellClass.STEP_UP: "degrau subindo à frente",
            CellClass.STEP_DOWN: "degrau descendo à frente",
        }
        for cls, name in names.items():
            hit = np.argwhere(corridor == cls)
            if hit.size:
                dist = (hit[:, 0].min() + 1) * cfg.cell_m
                hazards.append(f"{name} a {dist:.1f} m")
        return hazards

    def is_path_clear(self, lookahead_m: float = 2.0) -> bool:
        if self.grid is None:
            return False
        cfg = self.config
        rows = int(lookahead_m / cfg.cell_m)
        w = cfg.grid_w
        corridor = self.grid[:rows, w // 2 - 2: w // 2 + 3]
        bad = np.isin(corridor, (CellClass.OBSTACLE, CellClass.HOLE))
        return not bad.any()

    def describe_clear_path(self) -> str:
        from trackiellm_tpu.navigation.free_space import FreeSpaceDetector

        if self.grid is None:
            return "mapa indisponível"
        det = FreeSpaceDetector()
        sectors = det.analyze(self.grid, self.config.cell_m)
        best = max(sectors, key=lambda s: s.clear_distance_m)
        if best.clear_distance_m < 0.5:
            return "nenhum caminho livre próximo"
        return (f"caminho livre a {best.center_deg:+.0f} graus por "
                f"{best.clear_distance_m:.1f} m")
