"""Sharded loop-closure candidate matching.

Loop closure fans the query scan out against many candidate chains; each
(query, chain) job is independent, so the batch shards perfectly over a
data-parallel mesh axis — every device builds and scores its own
correlation subgrids with zero cross-device communication (the reduction
back to "which chain closed" is host logic, as in the reference's
first-accept walk, /root/reference/yag_slam/graph_slam.py:217-254).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from yag_slam_tpu.matching.matcher import (
    _VIEW_KEYS,
    ScanMatcherResult,
    scan_matcher_view,
)


class ShardedLoopMatcher:
    """Wraps a CorrelativeScanMatcher to run `match_many` sharded over a
    mesh axis."""

    def __init__(self, matcher, mesh, axis="dp"):
        self.matcher = matcher
        self.mesh = mesh
        self.axis = axis
        self._programs = {}

    def _program(self, Pcap, B, penalty, do_fine, S):
        key = (Pcap, B, penalty, do_fine, S)
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        core = self.matcher.batched_core(Pcap, B, penalty, do_fine, S)
        spec = P(self.axis)
        n_in = 5 + 8  # stacked views + the remaining batched operands
        sharded = shard_map(
            core,
            mesh=self.mesh,
            in_specs=tuple([spec] * 13),
            out_specs=(spec, spec),
        )
        prog = jax.jit(sharded)
        self._programs[key] = prog
        return prog

    def match_many(self, jobs, penalty=False, do_fine=False):
        """Same contract as CorrelativeScanMatcher.match_many, sharded over
        the mesh (jobs padded to a multiple of the axis size)."""
        if not jobs:
            return []
        m = self.matcher
        n_dev = self.mesh.shape[self.axis]
        all_scans = [q for q, _ in jobs] + [s for _, bs in jobs for s in bs]
        Pcap = m._ensure_point_cap(all_scans)
        B = m._base_bucket(max(len(bs) for _, bs in jobs))
        N = len(jobs)
        N_pad = ((N + n_dev - 1) // n_dev) * n_dev
        np_dtype = np.dtype(m.dtype)

        batch = {
            k: np.zeros((N_pad, B, Pcap), dtype=dt)
            for k, dt in (
                ("lx", np_dtype), ("ly", np_dtype),
                ("anchor", np.int32), ("term", np.int32), ("has_run", bool),
            )
        }
        mask = np.zeros((N_pad, B), dtype=bool)
        pose = np.zeros((N_pad, B, 3), dtype=np_dtype)
        q_lx = np.zeros((N_pad, Pcap), dtype=np_dtype)
        q_ly = np.zeros((N_pad, Pcap), dtype=np_dtype)
        n_q = np.ones(N_pad, dtype=np.int32)  # avoid 0/0 on padded jobs
        center = np.zeros((N_pad, 3), dtype=np_dtype)
        sub = np.zeros((N_pad, 2), dtype=np.int32)
        S = 0
        for j, (query, base_scans) in enumerate(jobs):
            for i, s in enumerate(base_scans):
                v = scan_matcher_view(s, Pcap)
                for k in _VIEW_KEYS:
                    batch[k][j, i] = v[k]
                mask[j, i] = True
                p = s.corrected_pose
                pose[j, i] = (p.x, p.y, p.euler[-1])
            qv = scan_matcher_view(query, Pcap)
            q_lx[j] = qv["lx"]
            q_ly[j] = qv["ly"]
            n_q[j] = qv["n"]
            p = query.corrected_pose
            center[j] = (p.x, p.y, p.euler[-1])
            sox, soy, S_j = m._subgrid_for(base_scans, p.x, p.y, Pcap)
            sub[j] = (sox, soy)
            S = max(S, S_j)

        prog = self._program(Pcap, B, bool(penalty), bool(do_fine), S)
        outs = prog(*(batch[k] for k in _VIEW_KEYS), mask, pose,
                    q_lx, q_ly, n_q, center, center[:, :2], sub)
        coarse, fine = np.asarray(outs[0]), np.asarray(outs[1])

        return [
            m._assemble(coarse[j], fine[j], do_fine, None) for j in range(N)
        ]
