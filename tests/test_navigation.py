"""Navigation + sensor-fusion tests: RANSAC ground plane, traversability
classification (incl. the reference fixture's 0.15 m => Obstacle
contract), free-space sectors, obstacle tracking, Madgwick fusion.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.navigation import (
    CellClass,
    FreeSpaceDetector,
    NavigationConfig,
    NavigationEngine,
    ObstacleTracker,
    ransac_ground_plane,
)
from trackiellm_tpu.navigation.path_planner import (
    classify_grid,
    traversability_grid,
)
from trackiellm_tpu.navigation.obstacle_tracker import obstacles_from_grid
from trackiellm_tpu.sensors import (
    LowPassFilter,
    MedianFilter,
    MotionState,
    SensorFusion,
)


def _floor_cloud(n=2000, cam_height=1.0, seed=0, noise=0.01):
    """Points on the floor plane y=+cam_height (camera Y points down)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3, 3, n)
    z = rng.uniform(0.3, 7.5, n)
    y = cam_height + rng.normal(0, noise, n)
    return np.stack([x, y, z], -1).astype(np.float32)


class TestRansac:
    def test_finds_floor_plane(self, rng):
        pts = _floor_cloud()
        plane, frac = ransac_ground_plane(jnp.asarray(pts), rng)
        plane = np.asarray(plane)
        # Normal ~ (0, -1, 0) ("up"), offset d ~ +1.
        assert plane[1] == pytest.approx(-1.0, abs=0.05)
        assert plane[3] == pytest.approx(1.0, abs=0.05)
        assert float(frac) > 0.8

    def test_robust_to_outliers(self, rng):
        pts = _floor_cloud(1500)
        rng_np = np.random.default_rng(1)
        outliers = rng_np.uniform(-2, 2, (500, 3)).astype(np.float32)
        outliers[:, 2] = np.abs(outliers[:, 2]) + 0.3
        allpts = np.concatenate([pts, outliers])
        plane, frac = ransac_ground_plane(jnp.asarray(allpts), rng)
        assert np.asarray(plane)[1] == pytest.approx(-1.0, abs=0.1)

    def test_height_above_plane(self, rng):
        pts = _floor_cloud()
        plane, _ = ransac_ground_plane(jnp.asarray(pts), rng)
        # A point 0.2 m above the floor:
        p = jnp.array([0.0, 0.8, 2.0])
        h = float(p @ plane[:3] + plane[3])
        assert h == pytest.approx(0.2, abs=0.03)


class TestTraversabilityGrid:
    def test_fixture_contract_015m_is_obstacle(self):
        """Reference ground_truth.json: vertical change of 0.15 m =>
        Obstacle."""
        cfg = NavigationConfig()
        hmax = np.full((4, 4), np.nan)
        hmax[0, 0] = 0.0    # flat floor
        hmax[1, 1] = 0.10   # small step
        hmax[2, 2] = 0.15   # the fixture's obstacle height
        hmax[3, 3] = 0.50   # tall obstacle
        hmin = hmax.copy()
        grid = classify_grid(hmax, hmin, cfg)
        assert grid[0, 0] == CellClass.TRAVERSABLE
        assert grid[1, 1] == CellClass.STEP_UP
        assert grid[2, 2] == CellClass.OBSTACLE
        assert grid[3, 3] == CellClass.OBSTACLE

    def test_hole_and_step_down(self):
        cfg = NavigationConfig()
        hmax = np.array([[0.0, 0.0]])
        hmin = np.array([[-0.2, -0.08]])
        grid = classify_grid(hmax, hmin, cfg)
        assert grid[0, 0] == CellClass.HOLE
        assert grid[0, 1] == CellClass.STEP_DOWN

    def test_grid_scatter(self, rng):
        pts = jnp.asarray(_floor_cloud())
        plane = jnp.array([0.0, -1.0, 0.0, 1.0])
        hmax, hmin = traversability_grid(pts, plane)
        known = ~np.isnan(np.asarray(hmax))
        assert known.sum() > 50
        assert np.nanmax(np.abs(np.asarray(hmax))) < 0.1  # all floor


def _synthetic_depth(h=120, w=160, fx=300.0, fy=300.0, cam_h=1.0,
                     obstacle=None):
    """Depth map of a flat floor; optional obstacle dict(z, half_w_px,
    rows) inserts a frontal block."""
    cy, cx = h / 2.0, w / 2.0
    depth = np.zeros((h, w), np.float32)
    v = np.arange(h)
    below = v > cy + 2
    z = np.where(below, fy * cam_h / np.maximum(v - cy, 1e-6), 0.0)
    depth[:] = z[:, None]
    depth[depth > 8.0] = 0.0
    if obstacle:
        zo = obstacle["z"]
        rows = obstacle.get("rows", (int(cy) - 10, int(cy) + 10))
        cols = (int(cx) - obstacle.get("half_w_px", 15),
                int(cx) + obstacle.get("half_w_px", 15))
        depth[rows[0]:rows[1], cols[0]:cols[1]] = zo
    return depth


class TestNavigationEngine:
    def test_clear_floor(self):
        eng = NavigationEngine()
        grid = eng.update(_synthetic_depth())
        assert eng.inlier_frac > 0.5
        assert eng.is_path_clear()
        assert eng.current_hazards() == []

    def test_frontal_obstacle_detected(self):
        eng = NavigationEngine()
        grid = eng.update(_synthetic_depth(obstacle={"z": 1.5}))
        hazards = eng.current_hazards()
        assert any("obstáculo" in h for h in hazards)
        assert not eng.is_path_clear()

    def test_describe_clear_path(self):
        eng = NavigationEngine()
        eng.update(_synthetic_depth())
        desc = eng.describe_clear_path()
        assert "caminho livre" in desc


class TestFreeSpace:
    def _grid(self, block_center=True):
        g = np.full((16, 16), int(CellClass.TRAVERSABLE), np.int32)
        if block_center:
            g[3, 6:11] = int(CellClass.OBSTACLE)
        return g

    def test_seven_sectors(self):
        det = FreeSpaceDetector()
        sectors = det.analyze(self._grid(block_center=False))
        assert len(sectors) == 7
        assert all(s.is_clear for s in sectors)

    def test_blocked_center_prefers_side(self):
        det = FreeSpaceDetector()
        best = det.best_sector(self._grid(block_center=True))
        assert abs(best.center_deg) > 10  # not the central sector
        sectors = det.analyze(self._grid(block_center=True))
        center = min(sectors, key=lambda s: abs(s.center_deg))
        assert center.clear_distance_m < best.clear_distance_m


class TestObstacleTracker:
    def test_association_and_expiry(self):
        tr = ObstacleTracker(max_match_distance_m=0.75, max_unseen_frames=2)
        t1 = tr.update([((0.0, 2.0), (0.5, 0.5))])
        assert t1[0].obstacle_id == 1
        t2 = tr.update([((0.1, 2.1), (0.5, 0.5))])
        assert t2[0].obstacle_id == 1 and t2[0].age_frames == 2
        # New obstacle far away gets a new id.
        t3 = tr.update([((0.1, 2.1), (0.5, 0.5)), ((3.0, 5.0), (1.0, 1.0))])
        assert {t.obstacle_id for t in t3} == {1, 2}
        # Obstacle 2 disappears; expires after 2 unseen frames.
        tr.update([((0.1, 2.1), (0.5, 0.5))])
        tr.update([((0.1, 2.1), (0.5, 0.5))])
        tr.update([((0.1, 2.1), (0.5, 0.5))])
        assert {t.obstacle_id for t in tr.tracks} == {1}

    def test_blob_extraction(self):
        g = np.full((8, 8), int(CellClass.TRAVERSABLE), np.int32)
        g[2:4, 3:5] = int(CellClass.OBSTACLE)
        blobs = obstacles_from_grid(g, cell_m=0.25)
        assert len(blobs) == 1
        (cx, cz), (sx, sz) = blobs[0]
        assert sx == pytest.approx(0.5) and sz == pytest.approx(0.5)
        assert cz == pytest.approx((2.5 + 0.5) * 0.25, abs=0.2)


class TestSensorFusion:
    def test_identity_init(self):
        f = SensorFusion()
        assert f.get_orientation() == (1.0, 0.0, 0.0, 0.0)

    def test_gyro_integration_yaw(self):
        f = SensorFusion()
        f.config.madgwick_beta = 0.0  # pure gyro integration
        # Rotate about gravity axis: 90 deg/s for 1 s.
        for _ in range(100):
            f.ingest_imu([0.0, 0.0, math.radians(90)], [0.0, 0.0, 9.81],
                         dt=0.01)
        _, _, yaw = f.euler_deg()
        assert yaw == pytest.approx(90.0, abs=3.0)

    def test_accel_correction_levels_pitch(self):
        f = SensorFusion()
        # Static, gravity along +Z body: correction should keep the
        # estimate stable and normalized.
        for _ in range(200):
            f.ingest_imu([0, 0, 0], [0, 0, 9.81], dt=0.01)
        q = np.array(f.get_orientation())
        assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-6)

    def test_motion_states(self):
        f = SensorFusion()
        for _ in range(60):
            f.ingest_imu([0, 0, 0], [0, 0, 9.81])
        assert f.get_world_state().motion_state is MotionState.STATIONARY
        # Oscillating accel -> walking.
        for i in range(60):
            mag = 9.81 + 1.2 * math.sin(i * 0.5)
            f.ingest_imu([0, 0, 0], [0, 0, mag])
        assert f.get_world_state().motion_state is MotionState.WALKING
        # Near free-fall.
        f.ingest_imu([0, 0, 0], [0, 0, 0.5])
        assert f.get_world_state().motion_state is MotionState.FALLING

    def test_vad_injection(self):
        f = SensorFusion()
        f.ingest_vad_state(True)
        f.ingest_imu([0, 0, 0], [0, 0, 9.81])
        assert f.get_world_state().is_speaking

    def test_filters(self):
        lp = LowPassFilter(alpha=0.5)
        assert np.allclose(lp([1.0, 1.0]), [1.0, 1.0])
        assert np.allclose(lp([3.0, 3.0]), [2.0, 2.0])
        mf = MedianFilter(window=3)
        mf([0.0])
        mf([100.0])  # spike
        assert mf([1.0])[0] == 1.0
