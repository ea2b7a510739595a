"""Distributed sparse pose adjustment.

The global SPA normal equations are a sum of independent per-edge
contributions: H = Σ_e J_e^T Ω_e J_e, b = Σ_e J_e^T Ω_e r_e.  Sharding the
edge list over a mesh axis and `psum`-reducing the (3N, 3N)/(3N,) partials
gives the distributed solve: per-device work scales with E/n_devices, one
collective per LM iteration rides ICI, and the dense factorization runs
replicated (cheap relative to assembly for the graph sizes where a single
dense solve is still the right call; a CG/Schur path is the next rung).

The reference has no distributed anything (SURVEY §2.3) — this is the
"long-trajectory" scaling story for pod-scale lifelong mapping.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from yag_slam_tpu.graphopt.spa import (
    _wrap,
    build_normal_equations,
    graph_cost,
)


def _edge_cost_local(poses, eidx, means, infos, emask, axis):
    from yag_slam_tpu.graphopt.spa import edge_residuals

    r = edge_residuals(poses, eidx, means)
    per_edge = jnp.einsum("ei,eij,ej->e", r, infos, r)
    return jax.lax.psum(jnp.sum(jnp.where(emask, per_edge, 0.0)), axis)


def make_distributed_lm_run(mesh, n_cap, max_iters, axis="dp"):
    """Build the sharded LM program: edges sharded over `axis`, poses
    replicated, one psum per iteration."""

    def body_fn(poses, eidx, means, infos, emask, free_mask, lam0, tol):
        cost0 = _edge_cost_local(poses, eidx, means, infos, emask, axis)

        def cond(carry):
            _, _, _, it, done = carry
            return jnp.logical_and(jnp.logical_not(done), it < max_iters)

        def body(carry):
            p, cost, lam, it, _ = carry
            H_l, b_l = build_normal_equations(
                p, eidx, means, infos, emask, free_mask, n_cap=n_cap
            )
            H = jax.lax.psum(H_l, axis)
            b = jax.lax.psum(b_l, axis)
            d = jnp.diag(H)
            delta = jnp.linalg.solve(H + jnp.diag(lam * d), -b)
            delta = delta.reshape(n_cap, 3) * free_mask[:, None].astype(p.dtype)
            cand = p + delta
            cand = cand.at[:, 2].set(_wrap(cand[:, 2]))
            new_cost = _edge_cost_local(cand, eidx, means, infos, emask, axis)
            accept = jnp.isfinite(new_cost) & (new_cost <= cost)
            decrease = cost - new_cost
            p = jnp.where(accept, cand, p)
            new_lam = jnp.where(
                accept, jnp.maximum(lam * 0.5, 1.0e-12), lam * 4.0
            )
            done = (accept & (decrease < tol * jnp.maximum(new_cost, 1.0))) | (
                jnp.logical_not(accept) & (new_lam > 1.0e8)
            )
            cost = jnp.where(accept, new_cost, cost)
            return (p, cost, new_lam, it + 1, done)

        p, cost, _, iters, _ = jax.lax.while_loop(
            cond, body, (poses, cost0, lam0, jnp.int32(0), jnp.bool_(False))
        )
        return p, cost, iters

    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sharded)


class DistributedSPA:
    """SPA2d-shaped solver whose normal-equation assembly shards edges over
    a device mesh.  Same add_node/add_constraint/compute contract as
    graphopt.spa.SPA2d."""

    def __init__(self, mesh, axis="dp", dtype=None):
        from yag_slam_tpu.graphopt.spa import PoseGraphSolver

        self.mesh = mesh
        self.axis = axis
        self._solver = PoseGraphSolver(dtype=dtype)
        self._programs = {}

    def add_node(self, x, y, yaw, node_id):
        self._solver.add_node(x, y, yaw, node_id)

    def add_constraint(self, from_id, to_id, dx, dy, dyaw, info):
        self._solver.add_constraint(from_id, to_id, dx, dy, dyaw, info)

    @property
    def nodes(self):
        from yag_slam_tpu.graphopt.spa import _NodeView

        return [_NodeView(x, y, yaw) for x, y, yaw in self._solver.poses]

    def compute(self, niter=100, s_lambda=1.0e-4, use_csparse=True,
                init_tol=1.0e-9, max_cg_iters=50, verbose=False):
        from yag_slam_tpu.graphopt.spa import _cap

        s = self._solver
        n = len(s.poses)
        e = len(s.edge_idx)
        if n < 2 or e == 0:
            return 0.0
        n_dev = self.mesh.shape[self.axis]
        n_cap = _cap(n)
        e_cap = _cap(max(e, n_dev))
        e_cap = ((e_cap + n_dev - 1) // n_dev) * n_dev

        dtype = s.dtype or (
            jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        )
        poses = np.zeros((n_cap, 3))
        poses[:n] = np.asarray(s.poses)
        eidx = np.zeros((e_cap, 2), dtype=np.int32)
        eidx[:e] = np.asarray(s.edge_idx, dtype=np.int32)
        means = np.zeros((e_cap, 3))
        means[:e] = np.asarray(s.edge_means)
        infos = np.zeros((e_cap, 3, 3))
        infos[:e] = np.stack(s.edge_infos)
        emask = np.zeros(e_cap, dtype=bool)
        emask[:e] = True
        free = np.zeros(n_cap, dtype=bool)
        free[1:n] = True

        key = (n_cap, e_cap, niter)
        prog = self._programs.get(key)
        if prog is None:
            prog = make_distributed_lm_run(self.mesh, n_cap, niter, self.axis)
            self._programs[key] = prog

        final, cost, iters = prog(
            jnp.asarray(poses, dtype=dtype),
            jnp.asarray(eidx),
            jnp.asarray(means, dtype=dtype),
            jnp.asarray(infos, dtype=dtype),
            jnp.asarray(emask),
            jnp.asarray(free),
            jnp.asarray(s_lambda, dtype=dtype),
            jnp.asarray(init_tol, dtype=dtype),
        )
        out = np.asarray(final[:n], dtype=np.float64)
        for i in range(n):
            s.poses[i] = [float(out[i, 0]), float(out[i, 1]), float(out[i, 2])]
        if verbose:
            print(f"[dist-spa] {int(iters)} iters, chi2 {float(cost):.6g}")
        return float(cost)
