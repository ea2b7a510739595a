"""Correlative scan matcher driver.

Public surface mirrors what the reference exposes through both of its
matchers (`Scan2DMatcherCpp` / `Scan2DMatcherPy`,
/root/reference/yag_slam/scan_matching.py:32-224): construction from a
config dict (+ `loop=` preset), `match_scan(query, base_scans, penalty,
do_fine) -> ScanMatcherResult(response, covariance, best_pose, meta)`, and
the scan-set variants used for submap alignment.

Architecture differs deliberately from the reference: scans are padded
array views (cached per scan, pose-independent), every search pass runs as
one jitted XLA program (grid build + coarse + fine fused — no host round
trip between passes), and compiled programs are cached per static shape
bucket so the online SLAM loop hits a warm compile cache after the first
few scans.
"""
from __future__ import annotations

import math
from collections import namedtuple
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from yag_slam_tpu.core.config import ScanMatcherConfig, make_config
from yag_slam_tpu.core.transform import Transform
from yag_slam_tpu.matching import correlation as C

ScanMatcherResult = namedtuple(
    "ScanMatcherResult", ["response", "covariance", "best_pose", "meta"]
)

# Far-away sentinel for padded/invalid point lanes: maps out of any grid, so
# the lane contributes exactly 0 to every score (the reference has no padded
# lanes; masked-out == absent).
_FAR = 1.0e9

# The fine pass's angular extent is a literal in the reference
# (/root/reference/yag_slam/scan_matching.py:210-212).
_FINE_ANGLE_SIZE = 0.0349 * 0.5

# Response expansion (README.md:40: retry with widened angle search when the
# response is 0); widening step chosen as 20 deg per retry, 3 retries, after
# OpenKarto's response-expansion schedule.
_EXPANSION_STEP = math.radians(20.0)
_EXPANSION_TRIES = 3


def _next_bucket(n: int, quantum: int = 128) -> int:
    """Round up to a power-of-two multiple of `quantum` (shape bucketing to
    bound recompiles)."""
    b = quantum
    while b < n:
        b *= 2
    return b


def scan_matcher_view(scan, cap: int):
    """Cached, pose-independent device view of a scan.

    Returns dict of numpy arrays of length `cap`:
      lx, ly   — compacted local beam endpoints (float64)
      anchor, term, has_run — validation-run structure
      n        — number of valid beams
    """
    key = ("matcher_view", cap)
    if key not in scan._points_cache:
        lx, ly, n = scan.local_points_padded(cap)
        a, t, h = C.segment_validation_runs(lx, ly, n)
        anchor = np.zeros(cap, dtype=np.int32)
        term = np.zeros(cap, dtype=np.int32)
        has = np.zeros(cap, dtype=bool)
        anchor[:n], term[:n], has[:n] = a, t, h
        scan._points_cache[key] = dict(
            lx=lx, ly=ly, anchor=anchor, term=term, has_run=has, n=n
        )
    return scan._points_cache[key]


class CorrelativeScanMatcher:
    """TPU-native correlative scan matcher (coarse-to-fine, with response
    expansion)."""

    def __init__(
        self,
        config_dict=None,
        loop: bool = False,
        *,
        config: ScanMatcherConfig | None = None,
        point_capacity: int | None = None,
        base_capacity: int | None = None,
        dtype=jnp.float32,
        return_meta: bool = False,
        sanitize_covariance: bool = True,
    ):
        self.config = config if config is not None else make_config(config_dict, loop)
        cfg = self.config
        # Grid side length, same formula as the reference
        # (/root/reference/yag_slam/scan_matching.py:183).
        self.grid_size = int(
            cfg.search_size / cfg.resolution
            + 1
            + 2 * cfg.range_threshold / cfg.resolution
        )
        self.dtype = dtype
        self.return_meta = return_meta
        self.sanitize_covariance = sanitize_covariance
        self._point_cap = point_capacity
        self._base_cap = base_capacity
        self._k1 = C.gaussian_kernel_1d(cfg.resolution, cfg.smear_deviation)
        self._programs = {}

    # -- capacity management ------------------------------------------------
    def _ensure_point_cap(self, scans) -> int:
        need = max(s.num_valid_beams for s in scans)
        if self._point_cap is None or self._point_cap < need:
            self._point_cap = _next_bucket(need)
        return self._point_cap

    def _base_bucket(self, n: int) -> int:
        if self._base_cap is not None:
            if n > self._base_cap:
                raise ValueError(f"{n} base scans > base_capacity {self._base_cap}")
            return self._base_cap
        b = 1
        while b < n:
            b *= 2
        return b

    # -- compiled program cache ---------------------------------------------
    def _program(self, P, B, penalty, do_fine, coarse_offset):
        key = (P, B, penalty, do_fine, round(coarse_offset, 12))
        prog = self._programs.get(key)
        if prog is None:
            prog = self._build_program(P, B, penalty, do_fine, coarse_offset)
            self._programs[key] = prog
        return prog

    def _build_program(self, P, B, penalty, do_fine, coarse_offset):
        cfg = self.config
        G = self.grid_size
        res = cfg.resolution
        dtype = self.dtype
        k1 = self._k1

        coarse_spec = C.LatticeSpec.from_search(
            0.0, 0.0, 0.0, cfg.search_size * 0.5, res * 2,
            coarse_offset * 0.5, cfg.coarse_angle_resolution,
        )
        fine_spec = C.LatticeSpec.from_search(
            0.0, 0.0, 0.0, res * 2, res,
            _FINE_ANGLE_SIZE, cfg.fine_search_angle_resolution,
        )

        def fn(base_lx, base_ly, anchor, term, has_run, scan_mask, base_pose,
               q_lx, q_ly, n_q, center):
            cx, cy, ct = center[0], center[1], center[2]
            # Grid origin, as /root/reference/yag_slam/scan_matching.py:187-188
            ox = cx - 0.5 * (G - 1) * res
            oy = cy - 0.5 * (G - 1) * res

            ps, pc = jnp.sin(base_pose[:, 2:3]), jnp.cos(base_pose[:, 2:3])
            wx = base_pose[:, 0:1] + pc * base_lx - ps * base_ly
            wy = base_pose[:, 1:2] + ps * base_lx + pc * base_ly

            keep = C.keep_mask_for_viewpoint(
                wx, wy, anchor, term, has_run, scan_mask[:, None], cx, cy
            )
            cgrid = C.build_correlation_grid(
                wx, wy, keep, ox, oy, grid_size=G, res=res, k1=k1, dtype=dtype
            )
            qflat = jnp.concatenate(
                [C.quantize_grid(cgrid).ravel(), jnp.zeros(1, dtype=dtype)]
            )

            lane = jnp.arange(P)
            qx = jnp.where(lane < n_q, q_lx, _FAR)
            qy = jnp.where(lane < n_q, q_ly, _FAR)
            n_pts = n_q.astype(dtype)

            common = dict(grid_size=G, grid_res=res, penalize=penalty, dtype=dtype)
            coarse = C.find_best_pose(
                qflat, qx, qy, n_pts, cx, cy, ct, ox, oy,
                spec=coarse_spec, xy_size=cfg.search_size * 0.5, xy_res=res * 2,
                ang_size=coarse_offset * 0.5,
                ang_res=cfg.coarse_angle_resolution, **common,
            )
            if do_fine:
                fine = C.find_best_pose(
                    qflat, qx, qy, n_pts, coarse[1], coarse[2], coarse[3],
                    ox, oy, spec=fine_spec, xy_size=res * 2, xy_res=res,
                    ang_size=_FINE_ANGLE_SIZE,
                    ang_res=cfg.fine_search_angle_resolution, **common,
                )
            else:
                fine = coarse
            outs = (jnp.stack(coarse), jnp.stack(fine))
            if self.return_meta:
                outs = outs + (cgrid,)
            return outs

        return jax.jit(fn)

    # -- input assembly -------------------------------------------------------
    def _stack_base(self, base_scans, P, B):
        np_dtype = np.dtype(self.dtype)
        lx = np.zeros((B, P), dtype=np_dtype)
        ly = np.zeros((B, P), dtype=np_dtype)
        anchor = np.zeros((B, P), dtype=np.int32)
        term = np.zeros((B, P), dtype=np.int32)
        has_run = np.zeros((B, P), dtype=bool)
        mask = np.zeros((B,), dtype=bool)
        pose = np.zeros((B, 3), dtype=np_dtype)
        for i, s in enumerate(base_scans):
            v = scan_matcher_view(s, P)
            lx[i] = v["lx"]
            ly[i] = v["ly"]
            anchor[i] = v["anchor"]
            term[i] = v["term"]
            has_run[i] = v["has_run"]
            mask[i] = True
            p = s.corrected_pose
            pose[i] = (p.x, p.y, p.euler[-1])
        return lx, ly, anchor, term, has_run, mask, pose

    # -- public API -----------------------------------------------------------
    def match_scan(self, query, base_scans, penalty=True, do_fine=True):
        """Match `query` against `base_scans`; same contract as the
        reference matchers (/root/reference/yag_slam/scan_matching.py:40-42,
        175-222): returns ScanMatcherResult with the covariance assembled
        from the coarse xy moments and the fine theta moment."""
        if not base_scans:
            raise ValueError("match_scan needs at least one base scan")
        cfg = self.config
        P = self._ensure_point_cap(list(base_scans) + [query])
        B = self._base_bucket(len(base_scans))
        base = self._stack_base(base_scans, P, B)

        qv = scan_matcher_view(query, P)
        np_dtype = np.dtype(self.dtype)
        q_lx = qv["lx"].astype(np_dtype)
        q_ly = qv["ly"].astype(np_dtype)
        n_q = np.int32(qv["n"])
        p = query.corrected_pose
        center = np.array([p.x, p.y, p.euler[-1]], dtype=np_dtype)

        coarse_offset = cfg.coarse_search_angle_offset
        for attempt in range(1 + _EXPANSION_TRIES):
            prog = self._program(P, B, bool(penalty), bool(do_fine), coarse_offset)
            outs = prog(*base, q_lx, q_ly, n_q, center)
            coarse, fine = np.asarray(outs[0]), np.asarray(outs[1])
            response = float(fine[0] if do_fine else coarse[0])
            if response > 0.0 or not cfg.use_response_expansion:
                break
            coarse_offset = cfg.coarse_search_angle_offset + (attempt + 1) * _EXPANSION_STEP

        return self._assemble(coarse, fine, do_fine, outs)

    def _assemble(self, coarse, fine, do_fine, outs):
        cfg = self.config
        if do_fine:
            response, x, y, t = (float(v) for v in fine[:4])
            th = float(fine[7])
        else:
            response, x, y, t = (float(v) for v in coarse[:4])
            th = 4.0 * cfg.coarse_angle_resolution
        # xy covariance always from the coarse pass, theta from fine —
        # reference quirk preserved
        # (/root/reference/yag_slam/scan_matching.py:204-218).
        xx, yy, xy = float(coarse[4]), float(coarse[5]), float(coarse[6])
        covar = np.array([[xx, xy, 0.0], [xy, yy, 0.0], [0.0, 0.0, th]])
        if self.sanitize_covariance:
            covar = self._sanitize_covariance(covar)
        meta = None
        if self.return_meta:
            meta = {"grid": np.asarray(outs[2]), "kernel": np.outer(self._k1, self._k1)}
        return ScanMatcherResult(
            response, covar, Transform.from_position_euler(x, y, 0, 0, 0, t), meta
        )

    def _sanitize_covariance(self, covar):
        """Guard against invalid match covariances.

        The reference's covariance formula normalizes second moments by a
        window-response sum that can legitimately go *negative* (the
        distance penalty is unclamped — the clamp is commented out at
        /root/reference/yag_slam/helpers.py:204,208 — so corner candidates
        score negative).  Near the sign boundary, backend-level float
        differences flip individual variances negative, and one indefinite
        information matrix corrupts the entire pose-graph solve.  When the
        covariance is non-finite or not positive definite we fall back to a
        conservative "know nothing inside the search window" prior, the
        same spirit as Karto's response-failure covariance.
        """
        cfg = self.config
        xy_var = (0.5 * cfg.search_size) ** 2
        th_var = (0.5 * cfg.coarse_search_angle_offset) ** 2
        fallback_needed = not np.isfinite(covar).all()
        if not fallback_needed:
            xx, yy, xy, th = covar[0, 0], covar[1, 1], covar[0, 1], covar[2, 2]
            fallback_needed = (
                xx <= 0.0 or yy <= 0.0 or th <= 0.0 or xx * yy - xy * xy <= 0.0
            )
        if fallback_needed:
            return np.diag([xy_var, xy_var, th_var])
        return covar

    # -- scan-set (submap) matching ------------------------------------------
    def match_scan_sets(self, query_scans, base_scans, penalty=True, do_fine=True):
        """Rigidly match a set of query scans against base scans — the
        reference's submap-alignment path
        (/root/reference/yag_slam/scan_matching.py:56-122).  The grid is
        centered on the query set's mean position; the result is a list of
        corrected poses, one per query scan."""
        if not query_scans or not base_scans:
            raise ValueError("match_scan_sets needs query and base scans")
        cfg = self.config
        res = cfg.resolution
        G = self.grid_size

        ox_real = float(np.mean([q.corrected_pose.x for q in query_scans]))
        oy_real = float(np.mean([q.corrected_pose.y for q in query_scans]))
        oxy = Transform.from_position_euler(ox_real, oy_real, 0, 0, 0, 0)

        # The reference validates base points against the *last* query
        # scan's pose (leftover loop variable,
        # /root/reference/yag_slam/scan_matching.py:72-80) — preserved.
        viewpoint = query_scans[-1].corrected_pose

        # Query points: all sets' world points shifted by the mean position.
        qx_list, qy_list = [], []
        for q in query_scans:
            px, py = q.points()
            qx_list.append(px - ox_real)
            qy_list.append(py - oy_real)
        qx = np.concatenate(qx_list)
        qy = np.concatenate(qy_list)

        result = self._match_prepared_query(
            base_scans, qx, qy,
            center=(ox_real, oy_real, 0.0),
            viewpoint=(viewpoint.x, viewpoint.y),
            penalty=penalty, do_fine=do_fine,
        )
        diff = result.best_pose - oxy
        return ScanMatcherResult(
            result.response, result.covariance,
            [diff + q.corrected_pose for q in query_scans], result.meta,
        )

    def _match_prepared_query(self, base_scans, qx, qy, center, viewpoint,
                              penalty, do_fine):
        """Match pre-assembled query points (world-frame-relative) against
        base scans; grid centered at `center`, validation viewpoint at
        `viewpoint`."""
        cfg = self.config
        P = max(
            self._ensure_point_cap(base_scans), _next_bucket(len(qx))
        )
        self._point_cap = P
        B = self._base_bucket(len(base_scans))
        base = self._stack_base(base_scans, P, B)

        np_dtype = np.dtype(self.dtype)
        q_lx = np.full(P, _FAR, dtype=np_dtype)
        q_ly = np.full(P, _FAR, dtype=np_dtype)
        q_lx[: len(qx)] = qx
        q_ly[: len(qy)] = qy
        n_q = np.int32(len(qx))
        center_arr = np.array(center, dtype=np_dtype)

        # The shared program validates against the search center; scan-set
        # matching needs a distinct viewpoint, so use a dedicated program.
        prog = self._program_scan_sets(
            P, B, bool(penalty), bool(do_fine), cfg.coarse_search_angle_offset
        )
        vp = np.array(viewpoint, dtype=np_dtype)
        outs = prog(*base, q_lx, q_ly, n_q, center_arr, vp)
        coarse, fine = np.asarray(outs[0]), np.asarray(outs[1])
        return self._assemble(coarse, fine, do_fine, outs)

    def _program_scan_sets(self, P, B, penalty, do_fine, coarse_offset):
        key = ("sets", P, B, penalty, do_fine, round(coarse_offset, 12))
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        cfg = self.config
        G = self.grid_size
        res = cfg.resolution
        dtype = self.dtype
        k1 = self._k1
        coarse_spec = C.LatticeSpec.from_search(
            0.0, 0.0, 0.0, cfg.search_size * 0.5, res * 2,
            coarse_offset * 0.5, cfg.coarse_angle_resolution,
        )
        fine_spec = C.LatticeSpec.from_search(
            0.0, 0.0, 0.0, res * 2, res,
            _FINE_ANGLE_SIZE, cfg.fine_search_angle_resolution,
        )

        def fn(base_lx, base_ly, anchor, term, has_run, scan_mask, base_pose,
               q_lx, q_ly, n_q, center, viewpoint):
            cx, cy, ct = center[0], center[1], center[2]
            ox = cx - 0.5 * (G - 1) * res
            oy = cy - 0.5 * (G - 1) * res
            ps, pc = jnp.sin(base_pose[:, 2:3]), jnp.cos(base_pose[:, 2:3])
            wx = base_pose[:, 0:1] + pc * base_lx - ps * base_ly
            wy = base_pose[:, 1:2] + ps * base_lx + pc * base_ly
            keep = C.keep_mask_for_viewpoint(
                wx, wy, anchor, term, has_run, scan_mask[:, None],
                viewpoint[0], viewpoint[1],
            )
            cgrid = C.build_correlation_grid(
                wx, wy, keep, ox, oy, grid_size=G, res=res, k1=k1, dtype=dtype
            )
            qflat = jnp.concatenate(
                [C.quantize_grid(cgrid).ravel(), jnp.zeros(1, dtype=dtype)]
            )
            n_pts = n_q.astype(dtype)
            common = dict(grid_size=G, grid_res=res, penalize=penalty, dtype=dtype)
            coarse = C.find_best_pose(
                qflat, q_lx, q_ly, n_pts, cx, cy, ct, ox, oy,
                spec=coarse_spec, xy_size=cfg.search_size * 0.5, xy_res=res * 2,
                ang_size=coarse_offset * 0.5,
                ang_res=cfg.coarse_angle_resolution, **common,
            )
            if do_fine:
                fine = C.find_best_pose(
                    qflat, q_lx, q_ly, n_pts, coarse[1], coarse[2], coarse[3],
                    ox, oy, spec=fine_spec, xy_size=res * 2, xy_res=res,
                    ang_size=_FINE_ANGLE_SIZE,
                    ang_res=cfg.fine_search_angle_resolution, **common,
                )
            else:
                fine = coarse
            outs = (jnp.stack(coarse), jnp.stack(fine))
            if self.return_meta:
                outs = outs + (cgrid,)
            return outs

        prog = jax.jit(fn)
        self._programs[key] = prog
        return prog


# API-parity alias (the reference aliases `Scan2DMatcher = Scan2DMatcherPy`,
# /root/reference/yag_slam/scan_matching.py:224).
Scan2DMatcher = CorrelativeScanMatcher
