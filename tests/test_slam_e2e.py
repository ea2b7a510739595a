"""End-to-end: online SLAM over a synthetic loop with drifted odometry.

The reference has no equivalent test (its only test prints a single match;
SURVEY §4) — this is the integration bar for the whole pipeline: sequential
matching must track the robot, loop closure must fire on revisit, and SPA
must pull the trajectory back onto the ground truth.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from yag_slam_tpu.io.simulator import (
    SimWorld,
    drifted_odometry,
    simulate_scan,
    square_loop_trajectory,
)
from yag_slam_tpu.matching.matcher import CorrelativeScanMatcher
from yag_slam_tpu.slam.graph_slam import GraphSlam
from yag_slam_tpu.utils.metrics import ate_rmse, trajectory_from_slam

SEQ_CFG = {
    "range_threshold": 5.0,
    "resolution": 0.02,
    "search_size": 0.5,
    "smear_deviation": 0.05,
}
LOOP_CFG = {
    "range_threshold": 5.0,
    "resolution": 0.05,
    "search_size": 2.0,
    "smear_deviation": 0.05,
}


def build_sequence(laps=2, step=0.5, seed=1):
    world = SimWorld.office()
    gt = square_loop_trajectory(side=5.0, step=step, laps=laps, start=(-2.5, -2.5))
    odom = drifted_odometry(gt, yaw_bias=0.0025, xy_noise=0.003, yaw_noise=0.0015,
                            seed=seed)
    rng = np.random.default_rng(seed + 100)
    scans = [
        simulate_scan(
            world, gt[i], n_beams=250, max_range=30.0, range_threshold=5.0,
            noise=0.004, rng=rng, odom_pose_xyt=odom[i],
        )
        for i in range(len(gt))
    ]
    return gt, odom, scans


def make_slam(**kw):
    seq = CorrelativeScanMatcher(SEQ_CFG, dtype=jnp.float64)
    loop = CorrelativeScanMatcher(LOOP_CFG, loop=True, dtype=jnp.float64)
    defaults = dict(
        scan_buffer_len=10,
        loop_search_dist=2.0,
        loop_search_min_chain_size=5,
        min_response_coarse=0.35,
        min_response_fine=0.45,
    )
    defaults.update(kw)
    return GraphSlam(seq, loop, **defaults)


@pytest.fixture(scope="module")
def slam_run():
    gt, odom, scans = build_sequence(laps=2)
    slam = make_slam()
    for scan in scans:
        slam.process_scan(scan)
    return gt, odom, scans, slam


def test_tracking_and_loop_closure(slam_run):
    gt, odom, scans, slam = slam_run
    assert len(slam.graph.vertices) == len(gt)
    assert slam.stats["loop_closures"] >= 1

    est = trajectory_from_slam(slam)
    slam_ate = ate_rmse(est, gt[:, :2], align=False)
    odom_ate = ate_rmse(odom[:, :2], gt[:, :2], align=False)
    # SLAM must beat raw dead reckoning and stay tight in absolute terms.
    assert slam_ate < 0.5 * odom_ate
    assert slam_ate < 0.15, f"slam ATE {slam_ate}, odom ATE {odom_ate}"


def test_edges_consistent(slam_run):
    _, _, _, slam = slam_run
    n_seq_edges = len(slam.graph.vertices) - 1
    # at least sequential edges plus >=1 loop edge
    assert len(slam.graph.edges) >= n_seq_edges
    for e in slam.graph.edges:
        assert e.source.obj.num != e.target.obj.num
        cov = np.asarray(e.info.covariance)
        assert cov.shape == (3, 3)


def test_serde_roundtrip(slam_run):
    gt, odom, scans, slam = slam_run
    blob = slam.binarize()
    restored = GraphSlam.unbinarize(blob)

    assert len(restored.graph.vertices) == len(slam.graph.vertices)
    assert len(restored.graph.edges) == len(slam.graph.edges)
    for v1, v2 in zip(slam.graph.vertices, restored.graph.vertices):
        p1, p2 = v1.obj.corrected_pose, v2.obj.corrected_pose
        assert np.allclose([p1.x, p1.y, p1.euler[-1]],
                           [p2.x, p2.y, p2.euler[-1]], atol=1e-9)
        np.testing.assert_allclose(v1.obj.ranges, v2.obj.ranges)
    assert [s.num for s in restored.running_scans] == [
        s.num for s in slam.running_scans
    ]
    # matcher configs survive
    assert restored.seq_matcher.config == slam.seq_matcher.config
    assert restored.loop_matcher.config.resolution == LOOP_CFG["resolution"]

    # the restored instance must be able to keep mapping; the new scan's
    # odometry must continue the *drifted* odometry stream (its delta to the
    # previous scan is what the dead-reckoning uses)
    world = SimWorld.office()
    extra_gt = gt[-1]
    scan = simulate_scan(
        world, extra_gt, n_beams=250, max_range=30.0, range_threshold=5.0,
        odom_pose_xyt=odom[-1],
    )
    res, closed = restored.process_scan(scan)
    assert res.response > 0.3


def test_checkpoint_file_roundtrip(tmp_path, slam_run):
    _, _, _, slam = slam_run
    path = tmp_path / "map.graph"
    slam.to_file(str(path))
    restored = GraphSlam.from_file(str(path))
    assert len(restored.graph.vertices) == len(slam.graph.vertices)


def test_stream_matches_sequential_processing():
    """GraphSlam.process_scan_stream (pipeline-matched blocks, loop
    closure at sync boundaries, closure-redo sweep) must reproduce the
    per-scan process_scan loop exactly: same trajectory, same closures,
    same graph."""
    gt, odom, scans_a = build_sequence(laps=2)
    _, _, scans_b = build_sequence(laps=2)

    slam_seq = make_slam()
    seq_out = [slam_seq.process_scan(s) for s in scans_a]

    slam_str = make_slam()
    str_out = slam_str.process_scan_stream(scans_b, sync_every=6)

    assert len(str_out) == len(seq_out)
    assert slam_str.stats["loop_closures"] == slam_seq.stats["loop_closures"]
    assert slam_str.stats["loop_closures"] >= 1
    assert len(slam_str.graph.edges) == len(slam_seq.graph.edges)
    for (ra, ca), (rb, cb) in zip(seq_out, str_out):
        assert (ra is None) == (rb is None)
        if ra is None:
            continue
        assert bool(ca) == bool(cb)
        assert rb.response == pytest.approx(ra.response, abs=1e-9)
    for sa, sb in zip(scans_a, scans_b):
        pa, pb = sa.corrected_pose, sb.corrected_pose
        np.testing.assert_allclose(
            [pb.x, pb.y, pb.euler[-1]], [pa.x, pa.y, pa.euler[-1]],
            atol=1e-9,
        )


def test_karto_penalty_mode_e2e():
    """A full 1-lap run with use_karto_penalties=True (OpenKarto's C++
    penalty semantics) must still track, close the loop and beat raw
    odometry — the mode changes the penalty surface, not the pipeline."""
    gt, odom, scans = build_sequence(laps=2, seed=5)
    seq = CorrelativeScanMatcher(dict(SEQ_CFG, use_karto_penalties=True),
                                 dtype=jnp.float64)
    loop = CorrelativeScanMatcher(dict(LOOP_CFG, use_karto_penalties=True),
                                  loop=True, dtype=jnp.float64)
    slam = GraphSlam(seq, loop, scan_buffer_len=10, loop_search_dist=2.0,
                     loop_search_min_chain_size=5, min_response_coarse=0.35,
                     min_response_fine=0.45)
    for scan in scans:
        slam.process_scan(scan)
    assert slam.stats["loop_closures"] >= 1
    est = trajectory_from_slam(slam)
    slam_ate = ate_rmse(est, gt[:, :2], align=False)
    odom_ate = ate_rmse(odom[:, :2], gt[:, :2], align=False)
    assert slam_ate < 0.5 * odom_ate
    assert slam_ate < 0.15, f"karto-mode ATE {slam_ate} vs odom {odom_ate}"
