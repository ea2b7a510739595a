"""SPA solver breakdown on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import bench_spa
from yag_slam_tpu.core.transform import se2_compose, se2_relative
from yag_slam_tpu.graphopt.spa import SPA2d, lm_run, lm_run_cg, build_normal_equations, graph_cost


def build(n_nodes=500, solver="auto"):
    rng = np.random.default_rng(0)
    side = n_nodes // 4
    spa = SPA2d(solver=solver)
    true = [np.array([0.0, 0.0, 0.0])]
    for s in range(4):
        for _ in range(side):
            true.append(se2_compose(true[-1], np.array([0.5, 0.0, 0.0])))
        true.append(se2_compose(true[-1], np.array([0.0, 0.0, np.pi / 2])))
    guess = [true[0]]
    means = []
    for i in range(len(true) - 1):
        mean = se2_relative(true[i + 1], true[i]) + rng.normal(0, 0.01, 3)
        guess.append(se2_compose(guess[-1], mean))
        means.append((i, i + 1, mean))
    for i, g in enumerate(guess):
        spa.add_node(g[0], g[1], g[2], i)
    info = np.diag([100.0, 100.0, 400.0]).tolist()
    for i, j, mean in means:
        spa.add_constraint(i, j, *mean, info)
    spa.add_constraint(len(true) - 1, 0, *se2_relative(true[0], true[-1]), info)
    return spa


for solver in ("dense", "cg"):
    spa = build(solver=solver)
    spa.compute(100, 1e-4, True, 1e-9, 50)  # warm compile
    times = []
    for _ in range(3):
        spa2 = build(solver=solver)
        t0 = time.time()
        c = spa2.compute(100, 1e-4, True, 1e-9, 50, verbose=True)
        times.append(time.time() - t0)
    print(f"{solver}: best {min(times)*1e3:.1f} ms  cost {c:.4g}")
