"""Occupancy mapping + map raytracing tests."""
import numpy as np
import pytest

from yag_slam_tpu.io.simulator import SimWorld, simulate_scan
from yag_slam_tpu.mapping.occupancy import (
    GRID_FREE,
    GRID_OCCUPIED,
    GRID_UNKNOWN,
    create_occupancy_grid,
    occupancy_grid_map_to_correlation_grid,
)
from yag_slam_tpu.mapping.raytrace import trace_rays, run_raytracing_sweep


def room_scans():
    # enough beam density that cells accumulate pass counts above Karto's
    # min_pass_through=2 (sparse coverage legitimately renders as unknown)
    world = SimWorld.rectangle(8.0, 6.0)
    poses = [
        np.array([0.0, 0.0, 0.0]),
        np.array([1.5, 0.5, 1.0]),
        np.array([-1.5, -0.5, -2.0]),
        np.array([0.5, -1.0, 2.5]),
    ]
    return [
        simulate_scan(world, p, n_beams=720, range_threshold=12.0) for p in poses
    ]


def test_occupancy_grid_room():
    grid = create_occupancy_grid(room_scans(), resolution=0.1, range_threshold=12.0)
    im = grid.image
    assert im.shape == (grid.height, grid.width)
    assert set(np.unique(im)).issubset({GRID_OCCUPIED, GRID_UNKNOWN, GRID_FREE})

    def world_to_cell(x, y):
        return (
            int(round((y - grid.offset.y) / grid.resolution)),
            int(round((x - grid.offset.x) / grid.resolution)),
        )

    # sensor location is free
    r, c = world_to_cell(0.0, 0.0)
    assert im[r, c] == GRID_FREE
    # wall cells occupied: sample along the right wall x=+4
    occupied_hits = 0
    for y in np.linspace(-2.5, 2.5, 21):
        r, c = world_to_cell(4.0, y)
        if im[r, c - 1 : c + 2].min() == GRID_OCCUPIED:
            occupied_hits += 1
    assert occupied_hits >= 18
    # interior mostly free
    interior = [world_to_cell(x, y) for x in np.linspace(-3, 3, 9)
                for y in np.linspace(-2, 2, 7)]
    free = sum(im[r, c] == GRID_FREE for r, c in interior)
    assert free >= 0.9 * len(interior)


def test_occupancy_range_threshold_clips():
    """Beams longer than the threshold mark free space but no hit."""
    world = SimWorld.rectangle(30.0, 6.0)  # far walls at x=+-15
    scan = simulate_scan(world, np.array([0.0, 0.0, 0.0]), n_beams=1440,
                         range_threshold=20.0)
    grid = create_occupancy_grid([scan], resolution=0.1, range_threshold=5.0)
    im = grid.image

    def cell(x, y):
        return (
            int(round((y - grid.offset.y) / grid.resolution)),
            int(round((x - grid.offset.x) / grid.resolution)),
        )

    # nothing occupied at the clip boundary in front (wall is at 15 m)
    r, c = cell(5.0, 0.0)
    assert GRID_OCCUPIED not in im[r - 1 : r + 2, c - 1 : c + 2]
    # but the near side walls (y=+-3) are within 5 m and occupied
    r, c = cell(0.0, 3.0)
    assert GRID_OCCUPIED in im[r - 1 : r + 2, c]


def oracle_trace(img, angle_deg, sx, sy):
    """Direct sequential re-statement of the reference ray marcher."""
    h, w = img.shape
    a = np.deg2rad(angle_deg)
    x, y = float(sx), float(sy)
    while True:
        xi, yi = int(round(x)), int(round(y))
        val = img[yi, xi]
        stop = val < 210
        x += np.cos(a)
        y += np.sin(a)
        if stop:
            if 180 < val < 210:
                x += 1000 * np.cos(a)
                y += 1000 * np.sin(a)
            break
        xi, yi = int(round(x)), int(round(y))
        if yi < 1 or xi < 1 or xi >= w - 1 or yi >= h - 1:
            break
    return np.hypot(x - sx, y - sy)


def test_trace_rays_matches_oracle():
    rng = np.random.default_rng(5)
    img = np.full((120, 160), 255, dtype=np.uint8)
    img[:3, :] = 0
    img[-3:, :] = 0
    img[:, :3] = 0
    img[:, -3:] = 0
    # random obstacles and unknown patches
    for _ in range(25):
        r, c = rng.integers(10, 110), rng.integers(10, 150)
        img[r : r + 3, c : c + 3] = 0
    for _ in range(10):
        r, c = rng.integers(10, 110), rng.integers(10, 150)
        img[r : r + 4, c : c + 4] = 200

    angles = np.arange(-180, 180, 3.0)
    sx, sy = 80.0, 60.0
    ex, ey, lengths = trace_rays(img, angles, sx, sy)
    for a, ln in zip(angles, lengths):
        ref = oracle_trace(img, a, sx, sy)
        assert abs(ln - ref) < 1.5, f"angle {a}: got {ln}, ref {ref}"


def test_run_raytracing_sweep_api():
    img = np.full((60, 60), 255, dtype=np.uint8)
    img[0:2, :] = 0
    img[-2:, :] = 0
    img[:, 0:2] = 0
    img[:, -2:] = 0
    rays = run_raytracing_sweep(img, np.arange(0, 360, 10.0), 30, 30)
    assert len(rays) == 36
    assert all(10 < r.length < 45 for r in rays)


def test_occupancy_to_correlation_grid():
    img = np.full((50, 50), 255, dtype=np.uint8)
    img[25, 25] = 0
    cg = occupancy_grid_map_to_correlation_grid(img, 0.05, 0.05)
    assert cg.shape == (50, 50)
    assert cg[25, 25] == pytest.approx(1.0)
    assert 0 < cg[25, 27] < 1.0
    assert cg[25, 30] == 0.0


def test_graphslam_make_occupancy_grid():
    from yag_slam_tpu.slam import GraphSlam
    from yag_slam_tpu.matching import CorrelativeScanMatcher
    import jax.numpy as jnp

    cfg = {"range_threshold": 5.0, "resolution": 0.02, "search_size": 0.5,
           "smear_deviation": 0.05}
    slam = GraphSlam(
        CorrelativeScanMatcher(cfg, dtype=jnp.float64), None,
    )
    for s in room_scans():
        slam.process_scan(s)
    grid = slam.make_occupancy_grid(resolution=0.1, range_threshold=10.0)
    assert grid.image.shape == (grid.height, grid.width)
    assert (grid.image == GRID_OCCUPIED).sum() > 50
