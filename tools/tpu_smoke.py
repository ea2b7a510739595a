#!/usr/bin/env python
"""On-TPU validation lane (VERDICT r3 item 5).

Compiles and RUNS the matcher's full jitted program (gate-selected grid
build + coarse + fine scoring) at every subgrid bucket the bench can
reach, at the reference-default config, on the real TPU backend.  This is
the structural catch for the "passes interpret mode, dies in Mosaic"
bug class (2 occurrences in rounds 2-3): interpret-mode tests exercise
kernel semantics, this lane exercises Mosaic compilation + execution at
the real shapes.

Run before every snapshot:  python tools/tpu_smoke.py
Exit code 0 = every bucket compiled and ran; per-bucket lines report the
build path the probe gate selected.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


CFG = {
    "range_threshold": 20.0,
    "resolution": 0.01,
    "search_size": 0.5,
    "smear_deviation": 0.05,
}
N_BASE = 10


def main():
    import jax

    # persistent compilation cache: the tunnel's remote-compile latency is
    # bimodal (seconds healthy, ~10 min degraded); cached executables make
    # reruns immune to the degraded regime
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()}, not tpu")
        return 0

    from yag_slam_tpu.io.simulator import SimWorld, simulate_scan
    from yag_slam_tpu.matching import pallas_kernels as PK
    from yag_slam_tpu.matching.matcher import (
        CorrelativeScanMatcher, _SUB_BUCKETS, _round_up,
    )

    world = SimWorld.office()
    rng = np.random.default_rng(0)
    scans = [
        simulate_scan(
            world,
            np.array([0.05 * i - 2.0, 0.04 * i - 1.5, 0.02 * i]),
            n_beams=360,
            range_threshold=CFG["range_threshold"],
            noise=0.004,
            rng=rng,
        )
        for i in range(N_BASE + 1)
    ]

    m = CorrelativeScanMatcher(CFG)
    # a normal match populates the device library + point caps
    res = m.match_scan(scans[-1], scans[:N_BASE], True, True)
    print(f"warm match: response={float(res.response):.3f}")
    P = m._point_cap
    B = m._base_bucket(N_BASE)
    h = m._half
    offset = m.config.coarse_search_angle_offset

    idx, mask, pose, q_idx, center, sub0, _ = m._assemble_jobs(
        [(scans[-1], scans[:N_BASE])], P, B
    )

    failures = []
    sizes = [S for S in _SUB_BUCKETS if S <= m._max_sub()]
    for S in sizes:
        Cpad = _round_up(S + 2 * h, 128)
        Mpts = B * P
        if PK.fused_build_ok(S, h, Cpad, Mpts):
            path = "fused"
        elif PK.smear_quantize_ok(S, h, Cpad):
            path = (
                "strip/pallas-scatter"
                if PK.scatter_ok(S + 2 * PK.ROW_TILE, Cpad, Mpts)
                else "strip/xla-scatter"
            )
        else:
            path = "staged"
        G = m.grid_size
        if S >= G:
            sox = soy = 0
        else:
            sox = int(np.clip(int(sub0[0, 0]), 0, G - S))
            soy = int(np.clip(int(sub0[0, 1]), 0, G - S))
        sub = np.asarray([[sox, soy]], dtype=np.int32)
        t0 = time.time()
        try:
            prog = m._program(P, B, True, True, offset, S)
            outs = prog(m.library.fields, idx, mask, pose, q_idx, center,
                        center[:, :2], sub)
            packed = np.asarray(outs[0])
            ok = np.isfinite(packed).all()
            dt = time.time() - t0
            print(f"S={S:5d} path={path:22s} compile+run {dt:6.1f}s "
                  f"finite={bool(ok)} response={packed[0, 1, 0]:.3f}")
            if not ok:
                failures.append((S, "non-finite output"))
        except Exception as e:
            dt = time.time() - t0
            msg = str(e).split(chr(10))[0][:160]
            print(f"S={S:5d} path={path:22s} FAILED after {dt:6.1f}s: {msg}")
            failures.append((S, msg))

    if failures:
        print(f"SMOKE FAILED: {len(failures)} bucket(s): {failures}")
        return 1
    print(f"SMOKE OK: {len(sizes)} buckets")
    return 0


if __name__ == "__main__":
    sys.exit(main())
