"""Device-chained online sequential matching.

The reference's online loop is strictly sequential: scan k's corrected
pose feeds scan k+1's search center, so it blocks on every match
(/root/reference/yag_slam/graph_slam.py:316-327).  On a remote/tunneled
TPU a blocking round trip costs ~28 ms regardless of compute, capping
that loop at ~35 matches/s — slower than the reference's own CPU.

The TPU-native fix: keep the pose-correction feedback ON DEVICE.  A
device-resident ``(K, 3)`` corrected-pose array is aligned with the
matcher's scan-library slots; each chained step

1. composes the previous query's device pose with the host-supplied
   odometry prior to get the search center (``se2_compose`` on device),
2. gathers the base window's poses from the device array,
3. runs the normal fused match program (grid build + coarse + fine), and
4. writes the fine best pose back into the pose array at the query slot,

so consecutive matches chain device-to-device with NO host round trip.
The host only *dispatches* (sub-ms over the tunnel) and fetches packed
results in blocks of ``sync_every`` — one transfer amortized over many
matches.  Host-side subgrid placement uses an odometry-composed pose
estimate whose worst-case divergence from the device truth is bounded by
``sync_every`` lattice extents; the subgrid is widened by exactly that
margin, so grid contents stay exact (cells outside the occupied bbox are
provably zero, matcher.py `_subgrid_for`).

Response expansion (the reference retries with a widened angle search
when the response is 0, README.md:40) cannot branch on device; instead
the sync step detects an empty coarse response, redoes that match
synchronously WITH expansion, and replays the chained steps after it —
semantically the reference's behavior, paid only when a match actually
fails.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from yag_slam_tpu.core.transform import (
    Transform, se2_compose, se2_relative,
)


class OnlineMatchPipeline:
    """Chained sequential matching against a sliding window of the last
    ``window`` scans (the reference's running-scans buffer,
    /root/reference/yag_slam/graph_slam.py:336-337).

    Usage::

        pipe = OnlineMatchPipeline(matcher, window=10, sync_every=8)
        pipe.seed(corrected_scans)          # pre-corrected history
        for scan in stream:
            pipe.push(scan)                 # non-blocking dispatch
        results = pipe.flush()              # fetch + apply poses

    ``push`` applies the host-side odometry estimate to
    ``scan.corrected_pose`` immediately (needed for subgrid placement);
    the device-exact corrected pose lands on the scan at the next sync.
    Results are returned in push order by ``flush``/``drain`` as
    ScanMatcherResult, identical (up to f32 pose composition) to calling
    ``matcher.match_scan(scan, window)`` step by step.
    """

    def __init__(self, matcher, window: int = 10, sync_every: int = 8,
                 penalty: bool = True, do_fine: bool = True):
        self.m = matcher
        self.window = int(window)
        self.sync_every = int(sync_every)
        self.penalty = bool(penalty)
        self.do_fine = bool(do_fine)
        self._base = []          # current sliding window (host scans)
        self._inflight = []      # [(scan, base_list, packed_dev)]
        self._results = []       # completed ScanMatcherResult, push order
        self._poses = None       # device (K_cap, 3) corrected poses
        self._est = None         # host (3,) estimate of last pushed pose
        self._last_odom = None   # host (3,) odom pose of last pushed scan
        self._S = 0              # sticky subgrid bucket
        self._progs = {}
        # Worst-case host-estimate divergence per un-synced step: one
        # full lattice extent (coarse half-search + fine refinement).
        cfg = matcher.config
        per_step = 0.5 * cfg.search_size + 2.0 * cfg.resolution
        self._margin_cells = int(
            np.ceil(self.sync_every * per_step / cfg.resolution)
        )

    # -- device pose array ---------------------------------------------------
    def _ensure_poses(self):
        lib = self.m.library
        np_dtype = np.dtype(self.m.dtype)
        if self._poses is None:
            self._poses = jnp.zeros((lib.K_cap, 3), dtype=np_dtype)
        elif self._poses.shape[0] < lib.K_cap:
            self._poses = jnp.zeros(
                (lib.K_cap, 3), dtype=np_dtype
            ).at[: self._poses.shape[0]].set(self._poses)

    def _set_poses(self, slots, vals):
        self._ensure_poses()
        self._poses = self._poses.at[np.asarray(slots)].set(
            np.asarray(vals, dtype=np.dtype(self.m.dtype))
        )

    @staticmethod
    def _xyt(pose: Transform):
        return np.array([pose.x, pose.y, pose.euler[-1]])

    # -- program --------------------------------------------------------------
    def _program(self, P, B, S):
        key = (P, B, S)
        prog = self._progs.get(key)
        if prog is None:
            core = self.m._make_core(
                P, B, self.penalty, self.do_fine,
                self.m.config.coarse_search_angle_offset, S,
                q_from_library=True,
            )

            def step(lib, poses, idx, mask, q_idx, prev_idx, prior, sub):
                center = se2_compose(poses[prev_idx], prior)      # (1, 3)
                pose_b = poses[idx]                               # (1, B, 3)
                outs = core(lib, idx, mask, pose_b, q_idx, center,
                            center[:, :2], sub)
                packed = outs[0]                                  # (1, 2, 8)
                fine_xyt = packed[:, 1, 1:4].astype(poses.dtype)
                poses2 = poses.at[q_idx].set(fine_xyt)
                return poses2, packed

            prog = jax.jit(step, donate_argnums=(1,))
            self._progs[key] = prog
        return prog

    # -- public API -----------------------------------------------------------
    def seed(self, scans):
        """Install pre-corrected scans as the initial window (their
        corrected_pose is trusted as-is)."""
        m = self.m
        P = m._ensure_point_cap(scans)
        slots = m.library.ensure(scans, P)
        self._set_poses(slots, [self._xyt(s.corrected_pose) for s in scans])
        self._base = list(scans)[-self.window:]
        last = self._base[-1]
        self._est = self._xyt(last.corrected_pose)
        self._last_odom = self._xyt(last.odom_pose)

    def push(self, scan):
        """Dispatch the chained match of `scan` against the current
        window.  Non-blocking; auto-syncs every `sync_every` pushes."""
        if not self._base:
            raise RuntimeError("seed() the pipeline before push()")
        m = self.m
        base = list(self._base)
        odom = self._xyt(scan.odom_pose)
        prior = se2_relative(odom, self._last_odom)
        self._last_odom = odom
        est = se2_compose(self._est, prior)
        self._est = est
        # host estimate on the scan: subgrid placement for later pushes
        # reads it; the device-exact pose replaces it at sync
        scan.corrected_pose = Transform.from_xyt(*est)

        P = m._ensure_point_cap(base + [scan])
        B = m._base_bucket(len(base))
        slots = m.library.ensure(base + [scan], P)
        self._ensure_poses()

        np_dtype = np.dtype(m.dtype)
        idx = np.zeros((1, B), dtype=np.int32)
        mask = np.zeros((1, B), dtype=bool)
        idx[0, : len(base)] = slots[:-1]
        mask[0, : len(base)] = True
        q_idx = np.asarray([slots[-1]], dtype=np.int32)
        prev_idx = np.asarray([slots[len(base) - 1]], dtype=np.int32)
        sox, soy, S_j = m._subgrid_for(
            base, float(est[0]), float(est[1]), P,
            margin_cells=self._margin_cells,
        )
        # sticky subgrid bucket: growth recompiles (rare), never shrink
        # mid-stream (each S is its own compiled program)
        self._S = max(self._S, S_j)
        G = m.grid_size
        s_cap = m._max_sub()
        if self._S >= G:
            sox = soy = 0
            self._S = min(self._S, s_cap)
        else:
            sox = int(np.clip(sox, 0, G - self._S))
            soy = int(np.clip(soy, 0, G - self._S))
        sub = np.asarray([[sox, soy]], dtype=np.int32)

        prog = self._program(P, B, self._S)
        self._poses, packed = prog(
            m.library.fields, self._poses, idx, mask, q_idx, prev_idx,
            np.asarray(prior, dtype=np_dtype)[None], sub,
        )
        self._inflight.append((scan, base, packed))
        self._base = (self._base + [scan])[-self.window:]
        if len(self._inflight) >= self.sync_every:
            self._sync()

    def drain(self):
        """Return (and clear) results completed so far without forcing a
        sync of in-flight work."""
        out = self._results
        self._results = []
        return out

    def flush(self):
        """Sync all in-flight matches, apply poses, return all pending
        results in push order."""
        self._sync()
        return self.drain()

    # -- sync -----------------------------------------------------------------
    def _sync(self):
        if not self._inflight:
            return
        inflight = self._inflight
        self._inflight = []
        stacked = jnp.concatenate([p for (_, _, p) in inflight], axis=0)
        host = np.asarray(stacked)                       # ONE transfer
        m = self.m
        for k, ((scan, base, _), row) in enumerate(zip(inflight, host)):
            coarse, fine = row[0], row[1]
            if (float(coarse[0]) <= 0.0
                    and m.config.use_response_expansion):
                # expansion can't branch on device: redo this match
                # synchronously (match_scan retries with widened angle
                # search), then REPLAY the chained steps after it — they
                # consumed the unexpanded pose.
                res = m.match_scan(scan, base, self.penalty, self.do_fine)
                scan.corrected_pose = res.best_pose
                self._results.append(res)
                self._set_poses(
                    [m.library.ensure([scan], m._point_cap)[0]],
                    [self._xyt(res.best_pose)],
                )
                self._est = self._xyt(scan.corrected_pose)
                self._last_odom = self._xyt(scan.odom_pose)
                self._base = (base + [scan])[-self.window:]
                for later_scan, _, _ in inflight[k + 1:]:
                    self.push(later_scan)
                self._sync()
                return
            scan.corrected_pose = Transform.from_xyt(*fine[1:4])
            self._results.append(m._assemble(coarse, fine, self.do_fine,
                                             None))
        # reset host drift estimate to the device-exact pose
        last_scan = inflight[-1][0]
        self._est = self._xyt(last_scan.corrected_pose)
