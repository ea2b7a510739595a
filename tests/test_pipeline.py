"""OnlineMatchPipeline: the device-chained sequential matcher must
reproduce the step-by-step match_scan loop (same windows, same priors)."""
import numpy as np
import jax.numpy as jnp
import pytest

from yag_slam_tpu.core.transform import Transform
from yag_slam_tpu.io.simulator import SimWorld, simulate_scan
from yag_slam_tpu.matching.matcher import CorrelativeScanMatcher
from yag_slam_tpu.matching.pipeline import OnlineMatchPipeline

CFG = {
    "range_threshold": 6.0,
    "resolution": 0.02,
    "search_size": 0.5,
    "smear_deviation": 0.05,
}


def make_stream(n=18, n_beams=240, drift=0.004):
    """Simulated scans with noisy odometry: odom_pose drifts from the true
    pose so the matcher has corrections to make."""
    world = SimWorld.office()
    rng = np.random.default_rng(3)
    scans = []
    true_poses = []
    odom = np.zeros(3)
    for i in range(n):
        true = np.array([0.12 * i - 1.0, 0.08 * i - 0.8, 0.04 * i])
        s = simulate_scan(world, true, n_beams=n_beams,
                          range_threshold=CFG["range_threshold"],
                          noise=0.003, rng=rng)
        if i == 0:
            odom = true.copy()
        else:
            odom = true + rng.normal(0, drift, 3)
        s.odom_pose = Transform.from_xyt(*odom)
        s.corrected_pose = Transform.from_xyt(*true)
        scans.append(s)
        true_poses.append(true)
    return scans, true_poses


def run_sequential(scans, window):
    """The reference's online loop: blocking match per scan, odometry
    prior from the previous corrected pose."""
    m = CorrelativeScanMatcher(CFG, dtype=jnp.float64)
    results = []
    for k in range(window, len(scans)):
        scan = scans[k]
        last = scans[k - 1]
        scan.corrected_pose = last.corrected_pose + (
            scan.odom_pose - last.odom_pose
        )
        base = scans[k - window: k]
        res = m.match_scan(scan, base, True, True)
        scan.corrected_pose = res.best_pose
        results.append(res)
    return results


def test_pipeline_matches_sequential_loop():
    window = 6
    scans_a, _ = make_stream()
    scans_b, _ = make_stream()

    ref = run_sequential(scans_a, window)

    m = CorrelativeScanMatcher(CFG, dtype=jnp.float64)
    pipe = OnlineMatchPipeline(m, window=window, sync_every=4)
    pipe.seed(scans_b[:window])
    for s in scans_b[window:]:
        pipe.push(s)
    got = pipe.flush()

    assert len(got) == len(ref)
    for r_ref, r_got, s_ref, s_got in zip(
        ref, got, scans_a[window:], scans_b[window:]
    ):
        # identical windows/grids; centers differ only by f64 SE(2) vs
        # quaternion composition rounding
        assert r_got.response == pytest.approx(r_ref.response, abs=1e-9)
        np.testing.assert_allclose(
            [s_got.corrected_pose.x, s_got.corrected_pose.y,
             s_got.corrected_pose.euler[-1]],
            [s_ref.corrected_pose.x, s_ref.corrected_pose.y,
             s_ref.corrected_pose.euler[-1]],
            atol=1e-9,
        )
        np.testing.assert_allclose(r_got.covariance, r_ref.covariance,
                                   rtol=1e-9, atol=1e-12)


def test_pipeline_corrects_odometry_drift():
    """With strong odometry noise the pipeline must still pull poses back
    toward the truth (i.e. it genuinely matches, not just integrates)."""
    window = 6
    scans, true_poses = make_stream(drift=0.03)
    m = CorrelativeScanMatcher(CFG, dtype=jnp.float64)
    pipe = OnlineMatchPipeline(m, window=window, sync_every=16)
    pipe.seed(scans[:window])
    for s in scans[window:]:
        pipe.push(s)
    results = pipe.flush()
    assert all(r.response > 0.3 for r in results)
    errs = [
        np.hypot(s.corrected_pose.x - t[0], s.corrected_pose.y - t[1])
        for s, t in zip(scans[window:], true_poses[window:])
    ]
    odo_errs = [
        np.hypot(s.odom_pose.x - t[0], s.odom_pose.y - t[1])
        for s, t in zip(scans[window:], true_poses[window:])
    ]
    # matched poses closer to truth than raw odometry on average
    assert np.mean(errs) < np.mean(odo_errs)
    assert np.mean(errs) < 0.06
