"""SPA solver crossover benchmark: host sparse-f64 vs device dense vs
device matrix-free PCG, across graph sizes, on the current jax backend.

Writes the table BASELINE.md cites and that PoseGraphSolver's "auto"
policy (AUTO_HOST_NODE_LIMIT) is derived from.  Run on the real TPU:
  python profile_spa.py
"""
import time

import numpy as np

from yag_slam_tpu.graphopt.spa import SPA2d
from yag_slam_tpu.io.benchmark import noisy_loop_pose_graph, populate_spa


def build(n_nodes, solver, precision="mixed"):
    return populate_spa(
        SPA2d(solver=solver, precision=precision),
        *noisy_loop_pose_graph(n_nodes),
    )


def main():
    import jax

    print(f"backend: {jax.default_backend()}")
    sizes = [100, 500, 1000, 2000, 4000]
    # (solver, precision) columns: "mixed" = f32 factorization/CG + f64
    # matrix-free iterative refinement; "f64" = all-emulated-f64 steps
    cols = [("host", "f64"), ("dense", "mixed"), ("dense", "f64"),
            ("cg", "mixed"), ("cg", "f64")]
    names = [f"{s}:{p}" if s != "host" else s for s, p in cols]
    print(f"{'nodes':>6} | " + " | ".join(f"{s:>11}" for s in names)
          + "  (best-of-3 ms; cost must agree)")
    rows = {}
    for n in sizes:
        times = {}
        costs = {}
        for (solver, prec), name in zip(cols, names):
            # a failing cell (e.g. the dense 3N^2 f64 system OOMs HBM at
            # n>=2000 — XLA pads the emulated-f64 matrix ~57x) must not
            # kill the remaining rows
            try:
                build(n, solver, prec).compute(100, 1e-4, True, 1e-9, 200)
                best = float("inf")
                for _ in range(3):
                    spa = build(n, solver, prec)
                    t0 = time.time()
                    c = spa.compute(100, 1e-4, True, 1e-9, 200)
                    best = min(best, time.time() - t0)
                times[name] = best * 1e3
                costs[name] = c
            except Exception as e:
                print(f"  [{name} @ {n}: {type(e).__name__} "
                      f"{str(e).splitlines()[0][:90]}]")
                times[name] = float("nan")
        rows[n] = times
        print(f"{n:>6} | " + " | ".join(
            f"{times[s]:>11.1f}" for s in names)
            + f"   chi2={costs.get('host', float('nan')):.4g}")
    return rows


if __name__ == "__main__":
    main()
