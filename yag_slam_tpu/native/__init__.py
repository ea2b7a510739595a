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


try:
    from yag_slam_tpu.native import _refbaseline

    HAVE_REFBASELINE = True
except ImportError:  # pragma: no cover - depends on build environment
    _refbaseline = None
    HAVE_REFBASELINE = False


def refbaseline_available() -> bool:
    return HAVE_REFBASELINE


def refbaseline_match_scan(query, base_scans, config, penalty=True,
                           do_fine=True, n_threads=None):
    """Reference-equivalent CPU scan match (the honest benchmark baseline —
    see native/refbaseline.cpp).  Same contract as the reference's
    Scan2DMatcherPy.match_scan (/root/reference/yag_slam/scan_matching.py:
    175-222): returns (response, covariance (3,3), (x, y, theta)).

    `config` needs keys: search_size, resolution, smear_deviation,
    range_threshold, coarse_search_angle_offset, coarse_angle_resolution.
    """
    import os

    if n_threads is None:
        n_threads = os.cpu_count() or 1
    search = float(config["search_size"])
    res = float(config["resolution"])
    smear = float(config["smear_deviation"])
    rng_t = float(config["range_threshold"])
    ang_size = float(config.get("coarse_search_angle_offset", 0.349))
    ang_res = float(config.get("coarse_angle_resolution", 0.0349))

    p = query.corrected_pose
    cx, cy, ct = float(p.x), float(p.y), float(p.euler[-1])

    base_pts = []
    for s in base_scans:
        wx, wy = s.points()
        base_pts.append((
            np.ascontiguousarray(wx, dtype=np.float64).tobytes(),
            np.ascontiguousarray(wy, dtype=np.float64).tobytes(),
        ))
    qx, qy = query.points_local()
    qx = np.ascontiguousarray(qx, dtype=np.float64)
    qy = np.ascontiguousarray(qy, dtype=np.float64)

    # lattice counts are derived inside the extension from the actual
    # shifted endpoints per pass (np.arange length semantics — the float
    # shift by the search center can change the count by one at exact
    # multiples, and the fine pass centers on the coarse best pose)
    r, x, y, t, XX, YY, XY, TH = _refbaseline.match_scan(
        base_pts, qx, qy, cx, cy, ct, search, res, smear, rng_t,
        ang_size, ang_res, int(bool(penalty)), int(bool(do_fine)),
        int(n_threads),
    )
    covar = np.array([[XX, XY, 0.0], [XY, YY, 0.0], [0.0, 0.0, TH]])
    return r, covar, (x, y, t)


def parse_carmen(path, max_scans=None):
    """Native twin of io.carmen.load_carmen_log; returns CarmenScan list."""
    from yag_slam_tpu.io.carmen import CarmenScan

    raw = _hostops.parse_carmen(str(path), int(max_scans or -1))
    out = []
    for rb, n, min_a, max_a, inc, max_r, x, y, th, ts in raw:
        ranges = np.frombuffer(rb, dtype=np.float64).copy()
        out.append(CarmenScan(ranges, min_a, max_a, inc, max_r, x, y, th, ts))
    return out
