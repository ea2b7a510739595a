#!/usr/bin/env python
"""Benchmark: scan matches/sec on the current jax backend vs the CPU-oracle
reference implementation.

Prints ONE JSON line:
  {"metric": "scan_matches_per_sec", "value": N, "unit": "matches/s",
   "vs_baseline": N}

The reference (safijari/yag-slam) publishes no numbers and its numba/C++
stack is not installed here (numba absent), so the baseline is the
reference *algorithm* measured via our float64 vectorized numpy oracle
(tests/oracle.py — same grid build, same lattice, same scoring semantics as
/root/reference/yag_slam/scan_matching.py:175-222) on this host's CPU.
BASELINE.md records the details.

Workload: the reference's default sequential-matching configuration
(search 0.5 m @ 0.01 m, +/-0.1745 rad @ 0.0349, 20 m range threshold ->
4051^2 correlation grid, coarse 25x25x10 lattice + fine 4x4x10) with a
10-scan base buffer, the same shape of work GraphSlam.process_scan issues
per scan.
"""
import json
import sys
import time

import numpy as np


def build_workload(n_beams=360, n_base=10, range_threshold=12.0):
    from yag_slam_tpu.io.simulator import SimWorld, simulate_scan

    world = SimWorld.office()
    rng = np.random.default_rng(0)
    poses = [np.array([0.05 * i, 0.03 * i, 0.01 * i]) for i in range(n_base + 1)]
    scans = [
        simulate_scan(world, p, n_beams=n_beams, range_threshold=range_threshold,
                      noise=0.004, rng=rng)
        for p in poses
    ]
    return scans[:-1], scans[-1]


CFG = {
    # reference default_config (/root/reference/yag_slam/helpers.py:339-351)
    # with range_threshold matched to the simulated sensor
    "range_threshold": 12.0,
    "resolution": 0.01,
    "search_size": 0.5,
    "smear_deviation": 0.05,
}


def bench_tpu(base, query, repeats=30):
    import jax.numpy as jnp

    from yag_slam_tpu.matching.matcher import CorrelativeScanMatcher

    matcher = CorrelativeScanMatcher(CFG)
    # warmup + compile
    res = matcher.match_scan(query, base, True, True)
    t0 = time.time()
    for _ in range(repeats):
        matcher.match_scan(query, base, True, True)
    dt = (time.time() - t0) / repeats
    return 1.0 / dt, res


def bench_reference_oracle(base, query, repeats=2):
    sys.path.insert(0, "tests")
    from oracle import oracle_match_scan

    qp = query.corrected_pose
    args = (
        query.points_local(),
        (qp.x, qp.y, qp.euler[-1]),
        [s.points() for s in base],
        dict(CFG,
             coarse_search_angle_offset=0.349,
             coarse_angle_resolution=0.0349,
             fine_search_angle_resolution=0.00349),
    )
    t0 = time.time()
    for _ in range(repeats):
        oracle_match_scan(*args, penalty=True, do_fine=True)
    return repeats / (time.time() - t0)


def main():
    base, query = build_workload()
    ours, res = bench_tpu(base, query)
    try:
        baseline = bench_reference_oracle(base, query)
    except Exception:
        baseline = float("nan")
    out = {
        "metric": "scan_matches_per_sec",
        "value": round(ours, 2),
        "unit": "matches/s",
        "vs_baseline": round(ours / baseline, 2) if baseline == baseline else None,
        "baseline_cpu_oracle": round(baseline, 3) if baseline == baseline else None,
        "match_response": round(float(res.response), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
