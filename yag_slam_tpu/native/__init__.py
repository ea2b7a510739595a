"""Native host runtime (optional C++ extension).

Wraps `_hostops` (built from hostops.cpp by setup.py) behind numpy-typed
functions with the exact signatures of the pure-Python fallbacks; callers
use `native.compact_beams` / `native.segment_runs` / `native.parse_carmen`
and get whichever implementation is available.
"""
from __future__ import annotations

import numpy as np

try:
    from yag_slam_tpu.native import _hostops

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build environment
    _hostops = None
    HAVE_NATIVE = False


def available() -> bool:
    return HAVE_NATIVE


def compact_beams(ranges, min_angle, angle_increment, range_threshold, cap):
    """Native twin of core.scan.beam_points_padded: returns (xs, ys, n)."""
    r = np.ascontiguousarray(ranges, dtype=np.float64)
    xs_b, ys_b, n = _hostops.compact_beams(
        r, float(min_angle), float(angle_increment), float(range_threshold),
        int(cap),
    )
    xs = np.frombuffer(xs_b, dtype=np.float64).copy()
    ys = np.frombuffer(ys_b, dtype=np.float64).copy()
    return xs, ys, int(n)


def segment_runs(px, py, n):
    """Native twin of matching.correlation.segment_validation_runs."""
    pxc = np.ascontiguousarray(px[:n], dtype=np.float64)
    pyc = np.ascontiguousarray(py[:n], dtype=np.float64)
    a_b, t_b, h_b = _hostops.segment_runs(pxc, pyc, int(n))
    anchor = np.frombuffer(a_b, dtype=np.int32).copy()
    term = np.frombuffer(t_b, dtype=np.int32).copy()
    has = np.frombuffer(h_b, dtype=np.uint8).astype(bool)
    return anchor, term, has


def parse_carmen(path, max_scans=None):
    """Native twin of io.carmen.load_carmen_log; returns CarmenScan list."""
    from yag_slam_tpu.io.carmen import CarmenScan

    raw = _hostops.parse_carmen(str(path), int(max_scans or -1))
    out = []
    for rb, n, min_a, max_a, inc, max_r, x, y, th, ts in raw:
        ranges = np.frombuffer(rb, dtype=np.float64).copy()
        out.append(CarmenScan(ranges, min_a, max_a, inc, max_r, x, y, th, ts))
    return out
