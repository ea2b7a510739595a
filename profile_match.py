#!/usr/bin/env python
"""Stage-level timing of the correlative match pipeline on the current
backend (VERDICT r2 items 2/4: publish the stage breakdown behind the
batched number).

Methodology: each stage runs R times inside one jitted lax.scan (carrying
a data dependency so XLA can't elide iterations), so the per-dispatch RPC
overhead of the axon tunnel (~25-40 ms) amortizes away.  Prints a table
plus derived bandwidth figures; writes JSON to --out if given.
"""
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from yag_slam_tpu.matching import correlation as C
from yag_slam_tpu.matching.matcher import (
    CorrelativeScanMatcher, _FINE_ANGLE_SIZE, _round_up,
)

CFG = {
    "range_threshold": 20.0,
    "resolution": 0.01,
    "search_size": 0.5,
    "smear_deviation": 0.05,
}
N_BASE = 10


def timeit(fn, args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts)


def scan_loop(stage, R):
    """Wrap `stage(x, *rest) -> y(shape of x-compatible carry)` in an
    R-iteration scan with a cheap data dependency."""

    def run(x, *rest):
        def body(carry, _):
            y = stage(carry, *rest)
            return y, ()

        out, _ = jax.lax.scan(body, x, None, length=R)
        return out

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--loops", type=int, default=8)
    args_ns = ap.parse_args()
    N = args_ns.batch
    R = args_ns.loops

    from bench import build_stream

    scans = build_stream()
    m = CorrelativeScanMatcher(CFG)
    jobs = [
        (scans[N_BASE + i + 1], scans[i + 1 : N_BASE + i + 1])
        for i in range(N)
    ]
    P = m._ensure_point_cap([q for q, _ in jobs] +
                            [s for _, bs in jobs for s in bs])
    B = m._base_bucket(N_BASE)
    idx, mask, pose, q_idx, center, sub, S = m._assemble_jobs(jobs, P, B)
    cfg = m.config
    G = m.grid_size
    res = cfg.resolution
    h = m._half
    Cpad = _round_up(S + 2 * h, 128)
    dtype = m.dtype
    k1 = m._k1
    taps = tuple(float(v) for v in k1)
    print(f"shapes: N={N} B={B} P={P} S={S} G={G} Cpad={Cpad} h={h} "
          f"backend={jax.default_backend()}")

    lib = m.library.fields
    results = {}

    # ---- end-to-end program -------------------------------------------------
    prog = m._program(P, B, True, True, cfg.coarse_search_angle_offset, S)
    t = timeit(prog, (lib, idx, mask, pose, q_idx, center, center[:, :2],
                      sub))
    results["end_to_end_ms"] = t * 1000.0
    print(f"end-to-end (1 dispatch, {N} jobs): {t*1000:.1f} ms "
          f"({N/t:.1f} matches/s)")

    # ---- stage inputs (materialized once) ----------------------------------
    @jax.jit
    def make_inputs(lib, idx, mask, pose, q_idx, center, vp, sub):
        base_lx = lib["lx"][idx]
        base_ly = lib["ly"][idx]
        anchor = lib["anchor"][idx]
        term = lib["term"][idx]
        has_run = lib["has_run"][idx]
        qlx = lib["lx"][q_idx]
        qly = lib["ly"][q_idx]
        n_q = lib["n"][q_idx]
        cx, cy, ct = center[:, 0], center[:, 1], center[:, 2]
        ox = cx - 0.5 * (G - 1) * res
        oy = cy - 0.5 * (G - 1) * res
        pc = jnp.cos(pose[..., 2:3])
        ps = jnp.sin(pose[..., 2:3])
        wx = pose[..., 0:1] + pc * base_lx - ps * base_ly
        wy = pose[..., 1:2] + ps * base_lx + pc * base_ly
        keep = C.keep_mask_for_viewpoint(
            wx, wy, anchor, term, has_run, mask[..., None],
            vp[:, 0][:, None, None], vp[:, 1][:, None, None])
        return wx, wy, keep, ox, oy, qlx, qly, n_q, cx, cy, ct

    wx, wy, keep, ox, oy, qlx, qly, n_q, cx, cy, ct = jax.block_until_ready(
        make_inputs(lib, idx, mask, pose, q_idx, center, center[:, :2], sub))
    sox = jnp.asarray(sub[:, 0])
    soy = jnp.asarray(sub[:, 1])

    # ---- stage 1: occupancy scatter ----------------------------------------
    kw_occ = dict(G=G, S=S, h=h, Cpad=Cpad, res=res, dtype=dtype)

    def occ_xla(wx_, *rest):
        o = C.build_occupancy_padded(wx_, wy, keep, ox, oy, sox, soy,
                                     **kw_occ)
        return wx_ + o[:, 0, 0][:, None, None] * 0

    t = timeit(scan_loop(occ_xla, R), (wx,)) / R
    results["scatter_xla_ms"] = t * 1000.0
    print(f"scatter XLA:    {t*1000:8.2f} ms")

    if m.use_vmem_score:
        def occ_pl(wx_, *rest):
            o = C.build_occupancy_pallas(wx_, wy, keep, ox, oy, sox, soy,
                                         **kw_occ)
            return wx_ + o[:, 0, 0][:, None, None].astype(wx_.dtype) * 0

        t = timeit(scan_loop(occ_pl, R), (wx,)) / R
        results["scatter_pallas_ms"] = t * 1000.0
        print(f"scatter pallas: {t*1000:8.2f} ms")

    if m.use_vmem_score:
        from yag_slam_tpu.matching.pallas_kernels import fused_build_vmem_bytes
        fb = fused_build_vmem_bytes(S, h, Cpad)
        try:
            def build_fused(wx_, *rest):
                g = C.build_quantized_grid_fused(
                    wx_, wy, keep, ox, oy, sox, soy,
                    G=G, S=S, h=h, Cpad=Cpad, res=res, taps=taps)
                return wx_ + g[:, 0, 0][:, None, None].astype(wx_.dtype) * 0

            t = timeit(scan_loop(build_fused, R), (wx,)) / R
            results["build_fused_ms"] = t * 1000.0
            print(f"build fused:    {t*1000:8.2f} ms (scratch {fb/1e6:.1f} MB)")
        except Exception as e:
            print(f"build fused:    FAILED scratch {fb/1e6:.1f} MB "
                  f"({type(e).__name__}: {e})")

    if m.use_vmem_score:
        from yag_slam_tpu.matching.pallas_kernels import (
            ROW_TILE, scatter_ok, smear_quantize_ok,
        )
        if smear_quantize_ok(S, h, Cpad):
            try:
                psc = scatter_ok(S + 2 * ROW_TILE, Cpad, B * P)

                def build_strip(wx_, *rest):
                    g = C.build_quantized_grid_strip(
                        wx_, wy, keep, ox, oy, sox, soy,
                        G=G, S=S, h=h, Cpad=Cpad, res=res, taps=taps,
                        pallas_scatter=psc)
                    return wx_ + g[:, 0, 0][:, None, None].astype(
                        wx_.dtype) * 0

                t = timeit(scan_loop(build_strip, R), (wx,)) / R
                results["build_strip_ms"] = t * 1000.0
                print(f"build strip:    {t*1000:8.2f} ms "
                      f"(pallas_scatter={psc})")
            except Exception as e:
                print(f"build strip:    FAILED ({type(e).__name__}: {e})")

    # NOTE: big arrays must be jit *arguments* — closed-over constants get
    # embedded in the program and overflow the tunnel's request limit.
    occ = jax.block_until_ready(jax.jit(
        lambda wx_: C.build_occupancy_padded(wx_, wy, keep, ox, oy, sox, soy,
                                             **kw_occ))(wx))

    # ---- stage 2: smear ------------------------------------------------------
    from yag_slam_tpu.matching.pallas_kernels import (
        smear_grid_pallas, smear_grid_xla)

    def smear_x(o, *rest):
        g = smear_grid_xla(o, h=h, S=S, taps=taps)
        return o + g[:, 0, 0][:, None, None] * 0

    t = timeit(scan_loop(smear_x, R), (occ,)) / R
    results["smear_xla_ms"] = t * 1000.0
    print(f"smear XLA:      {t*1000:8.2f} ms")

    if jax.default_backend() == "tpu" and S <= 1024:  # matcher's VMEM gate
        try:
            def smear_p(o, *rest):
                g = smear_grid_pallas(o.astype(jnp.float32), h=h, S=S,
                                      taps=taps)
                return o + g[:, 0, 0][:, None, None].astype(o.dtype) * 0

            t = timeit(scan_loop(smear_p, R), (occ,)) / R
            results["smear_pallas_ms"] = t * 1000.0
            print(f"smear pallas:   {t*1000:8.2f} ms")
        except Exception as e:
            print(f"smear pallas:   FAILED ({type(e).__name__}: {e})")

    cgrid = jax.block_until_ready(
        jax.jit(lambda o: smear_grid_xla(o, h=h, S=S, taps=taps))(occ))

    # ---- stage 3: quantize + mask -------------------------------------------
    def quant(g, *rest):
        q2d = C.quantize_grid(g)
        lane = jnp.arange(S, dtype=jnp.int32)
        col_ok = (lane[None, :] + sox[:, None]) < G
        row_ok = (lane[None, :] + soy[:, None]) < G
        q2d = q2d * (row_ok[:, :, None] & col_ok[:, None, :]).astype(q2d.dtype)
        return g + q2d[:, 0, 0][:, None, None] * 0

    t = timeit(scan_loop(quant, R), (cgrid,)) / R
    results["quantize_ms"] = t * 1000.0
    print(f"quantize+mask:  {t*1000:8.2f} ms")

    @jax.jit
    def mk_q2d(g):
        q = C.quantize_grid(g)
        lane = jnp.arange(S, dtype=jnp.int32)
        col_ok = (lane[None, :] + sox[:, None]) < G
        row_ok = (lane[None, :] + soy[:, None]) < G
        return q * (row_ok[:, :, None] & col_ok[:, None, :]).astype(q.dtype)

    q2d = jax.block_until_ready(mk_q2d(cgrid))

    # ---- stage 4: scoring ----------------------------------------------------
    coarse_spec = C.LatticeSpec.from_search(
        0.0, 0.0, 0.0, cfg.search_size * 0.5, res * 2,
        cfg.coarse_search_angle_offset * 0.5, cfg.coarse_angle_resolution)
    fine_spec = C.LatticeSpec.from_search(
        0.0, 0.0, 0.0, res * 2, res, _FINE_ANGLE_SIZE,
        cfg.fine_search_angle_resolution)
    lane = jnp.arange(P)
    qx = jnp.where(lane[None, :] < n_q[:, None], qlx, 1e9)
    qy = jnp.where(lane[None, :] < n_q[:, None], qly, 1e9)
    n_pts = n_q.astype(dtype)
    common = dict(grid_size=G, grid_res=res, penalize=True, dtype=dtype,
                  sub_size=S)
    kw_c = dict(spec=coarse_spec, xy_size=cfg.search_size * 0.5,
                xy_res=res * 2, ang_size=cfg.coarse_search_angle_offset * 0.5,
                ang_res=cfg.coarse_angle_resolution, **common)
    kw_f = dict(spec=fine_spec, xy_size=res * 2, xy_res=res,
                ang_size=_FINE_ANGLE_SIZE,
                ang_res=cfg.fine_search_angle_resolution, **common)

    for name, kw, spec, stride in (
        ("coarse", kw_c, coarse_spec, 2),
        ("fine", kw_f, fine_spec, 1),
    ):
        def sc_patch(q, *rest):
            out, xv, yv, tv = C.score_lattice_patch_batched(
                q, qx, qy, n_pts, cx, cy, ct, ox, oy, sox, soy, **kw)
            return q + out[:, 0, 0, 0][:, None, None] * 0

        t = timeit(scan_loop(sc_patch, R), (q2d,)) / R
        results[f"score_{name}_patch_ms"] = t * 1000.0
        print(f"score {name:6s} patch: {t*1000:8.2f} ms")

        _, _, _, _, qb = C.vmem_score_layout(S, spec, stride)
        if m.use_vmem_score and spec.nx <= 128:
            for label, hy in (("hyb", True), ("roll", False)):
                try:
                    def sc_vmem(q, *rest, _hy=hy):
                        out, xv, yv, tv = C.score_lattice_vmem_batched(
                            q, qx, qy, n_pts, cx, cy, ct, ox, oy, sox, soy,
                            hybrid=_hy, **kw)
                        return q + out[:, 0, 0, 0][:, None, None] * 0

                    t = timeit(scan_loop(sc_vmem, R), (q2d,)) / R
                    results[f"score_{name}_{label}_ms"] = t * 1000.0
                    print(f"score {name:6s} {label:5s}: {t*1000:8.2f} ms "
                          f"(q_stack {qb/1e6:.1f} MB)")
                except Exception as e:
                    print(f"score {name:6s} {label:5s}: FAILED q_stack "
                          f"{qb/1e6:.1f} MB ({type(e).__name__})")

        *_, qb2 = C.mxu_score_layout(S, spec, stride)
        if m.use_vmem_score and spec.nx <= 128:
            try:
                def sc_mxu(q, *rest):
                    out, xv, yv, tv = C.score_lattice_mxu_batched(
                        q, qx, qy, n_pts, cx, cy, ct, ox, oy, sox, soy, **kw)
                    return q + out[:, 0, 0, 0][:, None, None] * 0

                t = timeit(scan_loop(sc_mxu, R), (q2d,)) / R
                results[f"score_{name}_mxu_ms"] = t * 1000.0
                print(f"score {name:6s} mxu:   {t*1000:8.2f} ms "
                      f"(q_stack {qb2/1e6:.1f} MB)")
            except Exception as e:
                print(f"score {name:6s} mxu:   FAILED q_stack {qb2/1e6:.1f} MB "
                      f"({type(e).__name__}: {e})")

    # ---- stage 5: reduction ---------------------------------------------------
    out_c = jax.block_until_ready(jax.jit(
        lambda q: C.score_lattice_patch_batched(
            q, qx, qy, n_pts, cx, cy, ct, ox, oy, sox, soy, **kw_c)[0])(q2d))
    xv = jnp.zeros((N, coarse_spec.nx), dtype)
    yv = jnp.zeros((N, coarse_spec.ny), dtype)
    tv = jnp.zeros((N, coarse_spec.nt), dtype)

    def red(o, *rest):
        r = jnp.stack(jax.vmap(C.reduce_best_pose)(o, xv, yv, tv), axis=1)
        return o + r[:, 0][:, None, None, None] * 0

    t = timeit(scan_loop(red, R), (out_c,)) / R
    results["reduce_ms"] = t * 1000.0
    print(f"reduce:         {t*1000:8.2f} ms")

    # ---- utilization vs chip peaks (VERDICT r4 item 7) ----------------------
    # Anchor "fast" to the hardware, not just to the CPU baseline.  v5e
    # peaks (public: jax-ml.github.io/scaling-book): MXU 197 TFLOP/s bf16
    # / ~49 TFLOP/s f32, HBM 819 GB/s.  This workload's hot ops are
    # elementwise multiply/max/add (grid build = weighted max-dilation,
    # scoring = masked window sums), which run on the VPU — the MXU is
    # idle by design except the opt-in mxu-scorer variant — so the
    # meaningful ceilings are HBM bandwidth for the build (it streams the
    # grid) and VPU issue rate for the VMEM-resident scorer; MXU-relative
    # MFU is reported for scale.
    V5E_HBM_GBPS = 819.0
    V5E_MXU_F32_TFLOPS = 49.0
    M = B * P
    from yag_slam_tpu.matching.pallas_kernels import _round_up as _ru
    R0 = _ru(S + 2 * h + 1, 8) + 8
    util = {}
    if "build_fused_ms" in results:
        t_s = results["build_fused_ms"] / 1e3
        flops = N * (M + 3 * (2 * h + 1) * S * S)
        bytes_ = N * (S * S * 2 + R0 * Cpad * 2 + M * 8)
        util["build_fused"] = {
            "gflops": flops / t_s / 1e9,
            "hbm_gbps": bytes_ / t_s / 1e9,
            "hbm_util_pct": 100.0 * bytes_ / t_s / 1e9 / V5E_HBM_GBPS,
            "mxu_f32_mfu_pct": 100.0 * flops / t_s / 1e12 / V5E_MXU_F32_TFLOPS,
        }
    for name, spec in (("coarse", coarse_spec), ("fine", fine_spec)):
        key = f"score_{name}_roll_ms"
        if key not in results:
            continue
        t_s = results[key] / 1e3
        # per candidate x point: 1 multiply-accumulate into the window sum
        # (+ the per-theta rotate, negligible at NX*NY >> 1)
        flops = 2.0 * N * spec.nx * spec.ny * spec.nt * P
        bytes_ = N * S * S * 2 + N * spec.nx * spec.ny * spec.nt * 4
        util[f"score_{name}_roll"] = {
            "gflops": flops / t_s / 1e9,
            "hbm_gbps": bytes_ / t_s / 1e9,
            "hbm_util_pct": 100.0 * bytes_ / t_s / 1e9 / V5E_HBM_GBPS,
            "mxu_f32_mfu_pct": 100.0 * flops / t_s / 1e12 / V5E_MXU_F32_TFLOPS,
        }
    if util and jax.default_backend() == "tpu":
        print("\nutilization vs v5e peaks (HBM 819 GB/s, MXU f32 49 TFLOP/s):")
        for k, u in util.items():
            print(f"  {k:18s}: {u['gflops']:8.1f} GFLOP/s "
                  f"({u['mxu_f32_mfu_pct']:5.2f}% MXU-f32) | "
                  f"{u['hbm_gbps']:7.1f} GB/s "
                  f"({u['hbm_util_pct']:5.1f}% HBM)")
        results["utilization"] = util

    if args_ns.out:
        with open(args_ns.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args_ns.out)


if __name__ == "__main__":
    main()
