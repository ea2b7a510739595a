"""Pallas TPU kernels for the correlation matcher.

The hot grid-build op is a *weighted max-dilation*: every occupied cell
composites a Gaussian kernel by max into its neighborhood
(reference semantics: /root/reference/yag_slam/helpers.py:106-131).  The
kernel factorizes (k2[dy,dx] = k1[dy]*k1[dx], both factors positive and
monotone from the center), so the 2-D dilation is two separable 1-D passes.

XLA executes the separable pass as a chain of shifted `max` ops, which it
fuses well for a single grid but re-materializes per tap for batched
inputs (measured ~60 ms/grid at 4051^2 batch=16).  This kernel does both
passes in one VMEM-resident sweep per row strip, reading each input row
once and writing each output row once.

Halo handling uses three standard (pipelined) input block views of the
same array — the previous, current and next row strip — instead of manual
DMA, so Mosaic's automatic double-buffering drives the memory traffic and
no full-array VMEM staging is ever requested.

Layout contract (producer pads, kernel assumes):
  input  occ: (N, S + 2*ROW_TILE, Cpad) float32 — occupied indicators
         scattered at row offset +ROW_TILE and column offset +h;
         Cpad = round_up(S + 2h, 128).
  output cgrid: (N, S, S) float32 — the smeared correlation grid.
S must be a multiple of ROW_TILE (128), and the smear half-width h must be
< ROW_TILE (it is: h <= 20 given the reference's smear/resolution bound,
/root/reference/yag_slam/helpers.py:370).
"""
from __future__ import annotations

import json
import os
import tempfile
import threading
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Mosaic compile probes.
#
# Scoped-VMEM demand is decided by Mosaic's own accounting, which a hand
# formula can only approximate (round 3 shipped a bench crash from a ~6 MB
# estimation error on the fused build kernel).  The structural fix: before a
# kernel config is used inside a real program, AOT-compile the standalone
# pallas_call at that exact static config and cache the verdict.  A formula
# stays as a cheap pre-reject so hopeless configs don't pay a probe compile.
# Verdicts persist on disk keyed by jax version + config, so each process
# (bench runs, tests, apps) pays the probe compile at most once per machine.
# ---------------------------------------------------------------------------

_PROBE_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".pallas_probe_cache.json",
)
_probe_lock = threading.Lock()
_probe_cache: dict | None = None


def _probe_load():
    global _probe_cache
    if _probe_cache is None:
        try:
            with open(_PROBE_CACHE_PATH) as f:
                _probe_cache = json.load(f)
        except Exception:
            _probe_cache = {}
    return _probe_cache


def _probe_save():
    try:
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(_PROBE_CACHE_PATH), suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            json.dump(_probe_cache, f)
        os.replace(tmp, _PROBE_CACHE_PATH)
    except Exception:
        pass


# Cache key component derived from this module's source: compiled-probe
# verdicts are only valid for the code that was probed, and a content hash
# cannot be forgotten the way a manual revision bump can (ADVICE r4).
def _kernel_rev() -> str:
    try:
        import hashlib

        with open(__file__, "rb") as f:
            return hashlib.sha1(f.read()).hexdigest()[:12]
    except Exception:  # pragma: no cover
        return "unknown"


_KERNEL_REV = _kernel_rev()

# Probe failures that are NOT a deterministic Mosaic/VMEM rejection (tunnel
# RPC drops, device-busy, import errors) must not poison the on-disk cache:
# a mis-cached False silently pins the slow build/scorer path for every
# future process on this machine (ADVICE r4).  Only verdicts whose error
# message identifies a resource rejection are persisted; everything else is
# remembered in-process only.
_probe_session: dict = {}
# Conservative: only messages that identify the MOSAIC/VMEM class of
# rejection.  Broad allocator markers (RESOURCE_EXHAUSTED, "ran out of
# memory") are deliberately absent — HBM exhaustion can be transient on a
# shared device, and persisting such a False would permanently pin the
# slow path, the exact failure mode this classification exists to avoid.
_DETERMINISTIC_REJECT_MARKERS = (
    "vmem",            # "exceeds the scoped vmem limit" et al.
    "scoped",
    "mosaic failed to compile",
    "not implemented",  # Mosaic lowering gaps are deterministic per version
    "unsupported",
)


def _is_deterministic_reject(err: Exception) -> bool:
    msg = f"{type(err).__name__}: {err}".lower()
    return any(m in msg for m in _DETERMINISTIC_REJECT_MARKERS)


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # pragma: no cover
        return "unknown"


def _probe(key_parts, thunk) -> bool:
    """True iff `thunk` (an AOT compile of the kernel at one static
    config) succeeds; cached in-process and on disk (keyed by kernel
    revision, jax version and accelerator kind — a verdict from one chip
    generation must not survive a hardware swap).

    A genuine Mosaic rejection is deterministic, while the remote-compile
    path can also fail transiently (tunnel RPC drops, device busy) — so a
    failure is retried once, and a False verdict reaches the DISK cache
    only when the error message identifies a deterministic resource
    rejection (_is_deterministic_reject); other failures are remembered
    in-process only, so the next process re-probes (ADVICE r4).  Delete
    .pallas_probe_cache.json to force a full re-probe."""
    key = "|".join(str(p) for p in (_KERNEL_REV, _device_kind(), *key_parts))
    with _probe_lock:
        hit = _probe_session.get(key)
        if hit is None:
            hit = _probe_load().get(key)
        if hit is not None:
            return hit
    ok = False
    err = None
    for _ in range(2):
        try:
            thunk()
            ok = True
            err = None
            break
        except Exception as e:
            err = e
    with _probe_lock:
        _probe_session[key] = ok
        if ok or (err is not None and _is_deterministic_reject(err)):
            cache = _probe_load()
            cache[key] = ok
            _probe_save()
    return ok


def _aot(fn, *specs):
    jax.jit(fn).lower(*specs).compile()


def _smear_kernel(prev_ref, cur_ref, nxt_ref, out_ref, *, h, S, taps):
    # assemble the current strip + halo rows: (ROW_TILE + 2h, Cpad)
    strip = jnp.concatenate(
        [prev_ref[0, ROW_TILE - h :, :], cur_ref[0], nxt_ref[0, :h, :]],
        axis=0,
    )
    # pass 1: along the lane (column) axis -> (ROW_TILE + 2h, S)
    acc = taps[0] * strip[:, 0:S]
    for d in range(1, 2 * h + 1):
        acc = jnp.maximum(acc, taps[d] * strip[:, d : d + S])
    # pass 2: along the sublane (row) axis -> (ROW_TILE, S)
    acc2 = taps[0] * acc[0:ROW_TILE, :]
    for d in range(1, 2 * h + 1):
        acc2 = jnp.maximum(acc2, taps[d] * acc[d : d + ROW_TILE, :])
    out_ref[0, :, :] = acc2


@partial(jax.jit, static_argnames=("h", "S", "taps", "interpret"))
def smear_grid_pallas(occ_padded, *, h: int, S: int, taps: tuple,
                      interpret: bool = False):
    """Batched fused separable weighted max-dilation.

    occ_padded: (N, S + 2*ROW_TILE, Cpad) float32 per the layout contract.
    Returns (N, S, S) float32.
    """
    N, rows, Cpad = occ_padded.shape
    assert S % ROW_TILE == 0, S
    assert rows == S + 2 * ROW_TILE, occ_padded.shape
    assert h < ROW_TILE, h
    n_strips = S // ROW_TILE

    kernel = partial(_smear_kernel, h=h, S=S, taps=taps)
    block = (1, ROW_TILE, Cpad)
    return pl.pallas_call(
        kernel,
        grid=(N, n_strips),
        in_specs=[
            pl.BlockSpec(block, lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda b, i: (b, i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda b, i: (b, i + 2, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, S), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * (2 * h + 1) * N * S * S,
            bytes_accessed=N * S * S * 4 + N * rows * Cpad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(occ_padded, occ_padded, occ_padded)


def smear_grid_xla(occ_padded, *, h: int, S: int, taps: tuple):
    """Reference/fallback path (CPU tests, non-TPU backends): the same
    separable weighted max-dilation as a shifted-max chain, on the same
    padded layout (occupied rows at +ROW_TILE, columns at +h)."""
    k = jnp.asarray(np.array(taps), dtype=occ_padded.dtype)

    x = occ_padded  # (N, S + 2*ROW_TILE, Cpad)
    acc = None
    for d in range(2 * h + 1):
        t = k[d] * jax.lax.slice_in_dim(x, d, d + S, axis=2)
        acc = t if acc is None else jnp.maximum(acc, t)
    acc2 = None
    base = ROW_TILE - h
    for d in range(2 * h + 1):
        t = k[d] * jax.lax.slice_in_dim(acc, base + d, base + d + S, axis=1)
        acc2 = t if acc2 is None else jnp.maximum(acc2, t)
    return acc2  # (N, S, S)


# ---------------------------------------------------------------------------
# Strip smear + quantize + bounds mask.
#
# The any-S half of the grid build: reads the scatter kernels' occupancy
# layout from HBM in pipelined row strips (bf16), runs both separable
# weighted max-dilation passes, quantizes to floor(100*x), masks cells past
# the full grid's high edge, and DMAs each finished strip to HBM manually
# (the plain smear kernel's (N, S, S) f32 VMEM output block is what stopped
# it past S=1024).  Unlike build_grid_fused it does NOT hold the whole
# occupancy grid in VMEM — per-program VMEM is O(ROW_TILE * Cpad) — so it
# compiles at subgrid sizes the fully-fused kernel cannot (probe-verified:
# fused dies at S=1792 on v5e; lane-chunked temporaries keep this one
# compiling at any S (probe-verified to 4096)..
#
# Layout contract: occ (N, S + 2*ROW_TILE, Cpad) bf16 per the scatter
# layout (occupied rows at +ROW_TILE, columns at +h); lim (N, 2) int32 =
# (G - soy, G - sox).  Output (N, S, S) bf16 quantized subgrids (integer
# values in [0, 100], exact in bf16).  Math in f32 (tap products quantize
# through floor(100*x); bf16 tap rounding could cross an integer boundary).
# ---------------------------------------------------------------------------

# Lane-chunked processing: the f32 strip/accumulator temporaries scale
# with the chunk width, not S, so the kernel compiles at any S (whole-row
# processing exceeded scoped VMEM at S>=2560 on v5e).
_SQ_CHUNK = 1024


def _smear_quantize_kernel(lim_ref, prev_ref, cur_ref, nxt_ref, out_hbm,
                           stage_vmem, sem, *, h, S, taps):
    n = pl.program_id(0)
    i = pl.program_id(1)
    row_hi = lim_ref[0, 0, 0] - i * ROW_TILE
    col_hi = lim_ref[0, 0, 1]
    for c0 in range(0, S, _SQ_CHUNK):
        W = min(_SQ_CHUNK, S - c0)
        sl = slice(c0, c0 + W + 2 * h)    # occupied cols live at +h
        strip = jnp.concatenate(
            [prev_ref[0, ROW_TILE - h :, sl], cur_ref[0, :, sl],
             nxt_ref[0, :h, sl]],
            axis=0,
        ).astype(jnp.float32)
        # pass 1 (lanes); tap symmetry (taps[d] == taps[2h-d], all > 0):
        # max(t*a, t*b) == t*max(a, b)
        acc = taps[h] * strip[:, h : h + W]
        for d in range(h):
            m = jnp.maximum(strip[:, d : d + W],
                            strip[:, 2 * h - d : 2 * h - d + W])
            acc = jnp.maximum(acc, taps[d] * m)
        # pass 2 (sublanes)
        acc2 = taps[h] * acc[h : h + ROW_TILE, :]
        for d in range(h):
            m = jnp.maximum(
                acc[d : d + ROW_TILE, :],
                acc[2 * h - d : 2 * h - d + ROW_TILE, :],
            )
            acc2 = jnp.maximum(acc2, taps[d] * m)

        q = jnp.floor(acc2 * 100.0)
        rr = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, W), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, W), 1)
        q = jnp.where((rr < row_hi) & (cc + c0 < col_hi), q, 0.0)
        stage_vmem[:, c0 : c0 + W] = q.astype(jnp.bfloat16)

    row0 = pl.multiple_of(i * ROW_TILE, ROW_TILE)
    cp = pltpu.make_async_copy(
        stage_vmem, out_hbm.at[n, pl.ds(row0, ROW_TILE), :], sem
    )
    cp.start()
    cp.wait()


@partial(jax.jit, static_argnames=("S", "h", "taps", "interpret"))
def smear_quantize_pallas(occ, lim, *, S: int, h: int, taps: tuple,
                          interpret: bool = False):
    """occ: (N, S + 2*ROW_TILE, Cpad) bf16 scatter-layout occupancy;
    lim: (N, 2) int32 (row_hi, col_hi) full-grid bounds in subgrid coords.
    Returns (N, S, S) bfloat16 quantized smeared correlation subgrids."""
    N, rows, Cpad = occ.shape
    assert S % ROW_TILE == 0, S
    assert rows == S + 2 * ROW_TILE, occ.shape
    assert 1 <= h < ROW_TILE, h
    n_strips = S // ROW_TILE
    lim = lim.reshape(N, 1, 2)
    kernel = partial(_smear_quantize_kernel, h=h, S=S, taps=taps)
    block = (1, ROW_TILE, Cpad)
    return pl.pallas_call(
        kernel,
        grid=(N, n_strips),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(block, lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda b, i: (b, i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda b, i: (b, i + 2, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((ROW_TILE, S), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * h + 1) * N * S * S,
            bytes_accessed=N * S * S * 2 + N * rows * Cpad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lim, occ, occ, occ)


# ---------------------------------------------------------------------------
# Probe-backed gates for the grid-build kernels (see "Mosaic compile
# probes" above).  Formulas pre-reject; Mosaic's own compiler decides.
# ---------------------------------------------------------------------------

def _dummy_taps(h: int) -> tuple:
    # Compilation success depends on h (loop structure), not tap values.
    return tuple(float(v) / (h + 1.0) for v in range(1, h + 2)) + tuple(
        float(v) / (h + 1.0) for v in range(h, 0, -1)
    )


def fused_build_ok(S: int, h: int, Cpad: int, M: int) -> bool:
    """Can build_grid_fused compile at this config on the current backend?"""
    if jax.default_backend() != "tpu" or h < 1:
        return False
    # pre-reject: probe-calibrated Mosaic demand is ~1.45x this estimate
    # (14.44 MB est -> 20.36 MB actual at S=2048 on v5e)
    if fused_build_vmem_bytes(S, h, Cpad) * 1.45 > 21 * 1024 * 1024:
        return False
    taps = _dummy_taps(h)
    i32 = jnp.int32

    def thunk():
        _aot(
            lambda sy, sx, lim, mu: build_grid_fused(
                sy, sx, lim, mu, S=S, h=h, taps=taps, Cpad=Cpad
            ),
            jax.ShapeDtypeStruct((1, M), i32),
            jax.ShapeDtypeStruct((1, M), i32),
            jax.ShapeDtypeStruct((1, 2), i32),
            jax.ShapeDtypeStruct((1,), i32),
        )

    return _probe(("fused_build", jax.__version__, S, h, Cpad, M), thunk)


def scatter_ok(rows: int, Cpad: int, M: int) -> bool:
    """Can scatter_occupancy_pallas compile at this config?"""
    if jax.default_backend() != "tpu":
        return False
    if rows * Cpad * 2 > 12 * 1024 * 1024:  # single VMEM scratch grid
        return False
    i32 = jnp.int32

    def thunk():
        _aot(
            lambda sy, sx, mu: scatter_occupancy_pallas(
                sy, sx, mu, rows=rows, Cpad=Cpad
            ),
            jax.ShapeDtypeStruct((1, M), i32),
            jax.ShapeDtypeStruct((1, M), i32),
            jax.ShapeDtypeStruct((1,), i32),
        )

    return _probe(("scatter", jax.__version__, rows, Cpad, M), thunk)


def roll_scorer_ok(RT: int, L: int, ROWS_PAD: int, K: int, P: int) -> bool:
    """Can score_windows_pallas (the roll kernel) compile at this
    layout?  (q_stack (1, RT, L) bf16 lives whole in VMEM scratch.)"""
    if jax.default_backend() != "tpu":
        return False
    i32 = jnp.int32

    def thunk():
        _aot(
            lambda q, r, c, n: score_windows_pallas(
                q, r, c, n, ROWS_PAD=ROWS_PAD
            ),
            jax.ShapeDtypeStruct((1, RT, L), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, K, P), i32),
            jax.ShapeDtypeStruct((1, K, P), i32),
            jax.ShapeDtypeStruct((1,), i32),
        )

    return _probe(
        ("roll_scorer", jax.__version__, RT, L, ROWS_PAD, K, P), thunk
    )


def mxu_scorer_ok(R: int, L: int, BR: int, NYPAD: int, stride: int, K: int,
                  P: int) -> bool:
    """Can score_windows_mxu_pallas compile at this layout?"""
    if jax.default_backend() != "tpu":
        return False
    i32 = jnp.int32

    def thunk():
        _aot(
            lambda q, r, c, n: score_windows_mxu_pallas(
                q, r, c, n, BR=BR, NYPAD=NYPAD, stride=stride
            ),
            jax.ShapeDtypeStruct((1, R, L), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, K, P), i32),
            jax.ShapeDtypeStruct((1, K, P), i32),
            jax.ShapeDtypeStruct((1,), i32),
        )

    return _probe(
        ("mxu_scorer", jax.__version__, R, L, BR, NYPAD, stride, K, P), thunk
    )


def smear_quantize_ok(S: int, h: int, Cpad: int) -> bool:
    """Can smear_quantize_pallas compile at this config?"""
    if jax.default_backend() != "tpu" or h < 1:
        return False
    rows = S + 2 * ROW_TILE

    def thunk():
        _aot(
            lambda occ, lim: smear_quantize_pallas(
                occ, lim, S=S, h=h, taps=_dummy_taps(h)
            ),
            jax.ShapeDtypeStruct((1, rows, Cpad), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        )

    return _probe(("smear_quantize", jax.__version__, S, h, Cpad), thunk)


# ---------------------------------------------------------------------------
# Window-sum lattice scorer.
#
# The lattice response raw[n,k,j,i] = sum_p q2d[y0[n,k,p] + s*j,
# x0[n,k,p] + s*i] is, per (n,k,p), one (s*(NJ-1)+1, s*(NI-1)+1) window
# read.  XLA's gather executes each window as a serialized slice
# (~2-4 us per start on v5e — measured; 82k starts per pass = the round-1
# bottleneck).  This kernel instead keeps the whole (phase-split) grid
# resident in VMEM and accumulates ONE dynamic (ROWS_PAD, 128) block load
# per point into a block accumulator; the row stride is applied once at
# the end (sum-then-subsample == subsample-then-sum since the relative
# row offsets are static), and the lane stride is pre-applied by storing
# the grid lane-phase-split (stride 2) or raw (stride 1).  Per point this
# is ~1 vector load + 1 add instead of a 2 us gather: measured >50x on
# the lattice-scoring stage.
#
# Layout contract (producer = correlation.score_lattice_vmem_batched):
#   q_stack: (N, RT, L) bf16 — the quantized grid, row-padded with zero
#            margins so every clamped start reads in-bounds, lane-padded
#            by >=128 zeros each side; for stride 2 the two lane phases
#            are stacked along rows (even rows at [0, R), odd at [R, 2R)).
#   row0/col0: (N, K, P) int32 — per-point top-left of the padded window
#            (phase offset folded into row0 by the producer).
# Output: (N, K, ROWS_PAD, 128) f32 block sums; the producer crops
#   [..., 0 : s*NJ : s, :NI].
# ---------------------------------------------------------------------------

def _score_kernel(n_ref, row_ref, col_ref, q_hbm, out_ref, q_vmem, sem, *,
                  ROWS_PAD):
    n = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        cp = pltpu.make_async_copy(q_hbm.at[n], q_vmem, sem)
        cp.start()
        cp.wait()

    def window(p):
        r0 = row_ref[0, k, p]
        c0 = col_ref[0, k, p]
        # Mosaic requires dynamic starts aligned to the (8, 128) tile;
        # load aligned, rotate the misalignment away, crop.  Shifts are
        # the positive modular equivalents: dynamic NEGATIVE row shifts
        # miscompile on multi-sublane-tile blocks (observed on v5e).
        r8 = pl.multiple_of((r0 // 8) * 8, 8)
        c128 = pl.multiple_of((c0 // 128) * 128, 128)
        blk = q_vmem[pl.ds(r8, ROWS_PAD + 8), pl.ds(c128, 256)]
        # rotate only handles 32-bit lanes: cast the bf16 block up first
        blk = blk.astype(jnp.float32)
        blk = pltpu.roll(blk, (ROWS_PAD + 8) - (r0 - r8), 0)
        blk = pltpu.roll(blk, 256 - (c0 - c128), 1)
        return blk[:ROWS_PAD, :128]

    # Eight points per iteration into independent accumulators: the body
    # is latency-bound on the load->roll->add chain, and the chains
    # interleave.  The tail is free: the producer's point lanes past the
    # true count are FAR sentinels pointed at the zero margin (and n == P
    # can only happen at a 128-multiple P), so reading indices n..n+6
    # contributes exactly 0.
    UNROLL = 8

    def ptN(q, accs):
        return tuple(
            a + window(UNROLL * q + j) for j, a in enumerate(accs)
        )

    # loop to the job's true point count (lanes past n are FAR sentinels
    # pointed at the zero margin — skipping them is exact)
    zero = jnp.zeros((ROWS_PAD, 128), jnp.float32)
    accs = jax.lax.fori_loop(
        0, (n_ref[0, 0, 0] + UNROLL - 1) // UNROLL, ptN, (zero,) * UNROLL
    )
    while len(accs) > 1:
        accs = tuple(
            accs[j] + accs[j + len(accs) // 2]
            for j in range(len(accs) // 2)
        )
    out_ref[0, 0] = accs[0]


@partial(jax.jit, static_argnames=("ROWS_PAD", "interpret"))
def score_windows_pallas(q_stack, row0, col0, n_pts, *, ROWS_PAD: int,
                         interpret: bool = False):
    """Batched window-sum scoring.  q_stack (N, RT, L) bf16;
    row0/col0 (N, K, P) int32 padded-window starts; n_pts (N,) int32 true
    point counts.  Returns (N, K, ROWS_PAD, 128) f32 accumulated blocks."""
    N, RT, L = q_stack.shape
    _, K, P = row0.shape
    n_pts = n_pts.reshape(N, 1, 1).astype(jnp.int32)
    kernel = partial(_score_kernel, ROWS_PAD=ROWS_PAD)
    return pl.pallas_call(
        kernel,
        grid=(N, K),
        in_specs=[
            # SMEM blocks must keep the trailing two dims whole (the
            # (8, 128) divisibility rule), so block the K axis whole and
            # index row k inside the kernel
            pl.BlockSpec((1, 1, 1), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, P), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, P), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            # ANY-space refs must be whole-array; the kernel DMAs the
            # n-th grid into VMEM scratch once per n (grid is sequential,
            # so the scratch persists across the K programs)
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ROWS_PAD, 128), lambda n, k: (n, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, K, ROWS_PAD, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RT, L), q_stack.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * P * ROWS_PAD * 128,
            bytes_accessed=N * RT * L * 2 + N * K * P * ROWS_PAD * 128 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_pts, row0, col0, q_stack)


# ---------------------------------------------------------------------------
# Hybrid window-sum lattice scorer: rowsel matmul + lane roll.
#
# Same producer layout as score_windows_pallas (phase-split lanes fold
# the column stride), but the per-point row handling runs on the MXU: a
# one-hot (NYPAD, BR) row-selection matrix contracts the aligned bf16
# block load directly to the NY lattice rows — folding the f32 upcast,
# the dynamic row roll AND the row-stride subsample of the older kernel
# into one cheap-to-generate matmul.  Only the (NYPAD, 256) lane roll
# remains on the vector unit (half the volume of rolling the raw block).
# Measured ~1.9x over score_windows_pallas at the default coarse lattice.
# Output: (N, K, NYPAD, 128) f32, rows already stride-subsampled; the
# caller crops [..., :NY, :NX].
# ---------------------------------------------------------------------------


def _score_hybrid_kernel(n_ref, row_ref, col_ref, q_hbm, out_ref, q_vmem,
                         sem, *, BR, NYPAD, stride):
    n = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        cp = pltpu.make_async_copy(q_hbm.at[n], q_vmem, sem)
        cp.start()
        cp.wait()

    # loop-invariant iota-difference constant; equality against the
    # per-point row misalignment yields the one-hot row selector.
    # Compare + select in f32 (no bf16 compare on v5e; i32 masks can't
    # relayout into bf16 selects), then pack to bf16 for the MXU.
    rr = jax.lax.broadcasted_iota(jnp.int32, (NYPAD, BR), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (NYPAD, BR), 0)
    rk = (rr - stride * jj).astype(jnp.float32)
    one_r = jnp.ones((), jnp.float32)
    zero_r = jnp.zeros((), jnp.float32)

    def window(p):
        r0 = row_ref[0, k, p]
        c0 = col_ref[0, k, p]
        r8 = pl.multiple_of((r0 // 8) * 8, 8)
        c128 = pl.multiple_of((c0 // 128) * 128, 128)
        blk = q_vmem[pl.ds(r8, BR), pl.ds(c128, 256)]          # bf16
        roff = (r0 - r8).astype(jnp.float32)
        rowsel = jnp.where(rk == roff, one_r, zero_r).astype(jnp.bfloat16)
        t1 = jnp.dot(rowsel, blk,
                     preferred_element_type=jnp.float32)       # (NYPAD, 256)
        t1 = pltpu.roll(t1, 256 - (c0 - c128), 1)
        return t1[:, :128]

    # two points per iteration, independent accumulators (latency-bound
    # body; tail lanes are FAR sentinels into the zero margins — exact 0)
    def pt2(q, accs):
        a1, a2 = accs
        return (a1 + window(2 * q), a2 + window(2 * q + 1))

    zero = jnp.zeros((NYPAD, 128), jnp.float32)
    a1, a2 = jax.lax.fori_loop(
        0, (n_ref[0, 0, 0] + 1) // 2, pt2, (zero, zero)
    )
    out_ref[0, 0] = a1 + a2


@partial(jax.jit, static_argnames=("BR", "NYPAD", "stride", "interpret"))
def score_windows_hybrid_pallas(q_stack, row0, col0, n_pts, *, BR: int,
                                NYPAD: int, stride: int,
                                interpret: bool = False):
    """Batched hybrid window-sum scoring on the score_windows_pallas
    layout.  q_stack (N, RT, L) bf16; row0/col0 (N, K, P) int32; n_pts
    (N,) int32.  Returns (N, K, NYPAD, 128) f32 row-subsampled sums."""
    N, RT, L = q_stack.shape
    _, K, P = row0.shape
    n_pts = n_pts.reshape(N, 1, 1).astype(jnp.int32)
    kernel = partial(_score_hybrid_kernel, BR=BR, NYPAD=NYPAD, stride=stride)
    return pl.pallas_call(
        kernel,
        grid=(N, K),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, P), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, P), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, NYPAD, 128), lambda n, k: (n, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, K, NYPAD, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RT, L), q_stack.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # P is the padded point capacity; the fori_loop runs only to the
        # true n_pts, so these are upper bounds (ADVICE r3: with heavy
        # padding they overstate work — acceptable for scheduling hints)
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * P * (NYPAD * BR * 256 + NYPAD * 256),
            bytes_accessed=N * RT * L * 2 + N * K * P * BR * 256 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_pts, row0, col0, q_stack)


# ---------------------------------------------------------------------------
# MXU window-sum lattice scorer.
#
# Same job as score_windows_pallas, reformulated so the per-point inner
# body runs on the MXU instead of the vector unit.  The window read
# q2d[y0 + stride*j, x0 + stride*i] is two one-hot contractions of an
# ALIGNED block load:
#
#     acc[j, i] += rowsel_p @ B_p @ colsel_p
#     B_p     = q_vmem[align8(row0), align128(col0)][:BR, :256]   (bf16)
#     rowsel  [j, r] = 1  iff  r == (row0 - align8(row0))  + stride*j
#     colsel  [c, i] = 1  iff  c == (col0 - align128(col0)) + stride*i
#
# The one-hots fold BOTH the intra-tile misalignment (the two pltpu.roll
# calls of the older kernel, ~60% of its per-point cost on v5e) and the
# lattice stride subsampling (the older kernel's phase-split grid layout)
# into two bf16 matmuls with f32 accumulation.  They are generated per
# point as one equality compare against a hoisted iota-difference
# constant, exact in bf16 (all values are small integers).  The point
# loop runs to the job's true point count (SMEM scalar), not the padded
# capacity.
#
# Layout contract (producer = correlation.score_lattice_mxu_batched):
#   q_stack: (N, R, L) bf16 — quantized grid rows at [MROW, MROW + S),
#            lanes at [128, 128 + S); zero margins elsewhere, sized so
#            every clamped window read lands in-bounds.
#   row0/col0: (N, K, P) int32 top-left window corner in padded coords
#            (row0 = clamp(sgy0, -WINY, S) + MROW, col0 = clamp(sgx0,
#            -WINX, S) + 128).
#   n_pts:  (N,) int32 true point count (lanes >= n are never read).
# Output: (N, K, NYPAD, 128) f32; caller crops [..., :NY, :NX].
# ---------------------------------------------------------------------------


def _mxu_score_kernel(n_ref, row_ref, col_ref, q_hbm, out_ref, q_vmem, sem,
                      *, BR, NYPAD, stride):
    n = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        cp = pltpu.make_async_copy(q_hbm.at[n], q_vmem, sem)
        cp.start()
        cp.wait()

    # iota-difference constants (loop-invariant; hoisted by Mosaic):
    # equality against a scalar yields the one-hot selection matrices.
    # Compare + select run in f32 (the i32 mask's (8, 128) tiling cannot
    # relayout into a bf16 select, and v5e has no bf16 compare); the f32
    # one-hot then packs to bf16 for the MXU.
    rr = jax.lax.broadcasted_iota(jnp.int32, (NYPAD, BR), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (NYPAD, BR), 0)
    rk = (rr - stride * jj).astype(jnp.float32)    # rowsel iff rk == roff
    cc = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    ck = (cc - stride * ii).astype(jnp.float32)    # colsel iff ck == coff
    one_r = jnp.ones((), jnp.float32)
    zero_r = jnp.zeros((), jnp.float32)

    def contract(p):
        r0 = row_ref[0, k, p]
        c0 = col_ref[0, k, p]
        r8 = pl.multiple_of((r0 // 8) * 8, 8)
        c128 = pl.multiple_of((c0 // 128) * 128, 128)
        blk = q_vmem[pl.ds(r8, BR), pl.ds(c128, 256)]          # bf16
        roff = (r0 - r8).astype(jnp.float32)
        coff = (c0 - c128).astype(jnp.float32)
        rowsel = jnp.where(rk == roff, one_r, zero_r).astype(
            jnp.bfloat16)                                      # (NYPAD, BR)
        colsel = jnp.where(ck == coff, one_r, zero_r).astype(
            jnp.bfloat16)                                      # (256, 128)
        t1 = jnp.dot(rowsel, blk,
                     preferred_element_type=jnp.float32)       # (NYPAD, 256)
        return jnp.dot(t1.astype(jnp.bfloat16), colsel,
                       preferred_element_type=jnp.float32)     # (NYPAD, 128)

    # two points per iteration into independent accumulators: the body is
    # latency-bound on the load->select->dot->dot chain and the chains
    # interleave.  The tail is free: point lanes past the true count are
    # FAR sentinels pointed at the zero margins (and n == P only at a
    # 128-multiple), so lane n contributes exactly 0.
    def pt2(q, accs):
        a1, a2 = accs
        return (a1 + contract(2 * q), a2 + contract(2 * q + 1))

    zero = jnp.zeros((NYPAD, 128), jnp.float32)
    a1, a2 = jax.lax.fori_loop(
        0, (n_ref[0, 0, 0] + 1) // 2, pt2, (zero, zero)
    )
    out_ref[0, 0] = a1 + a2


@partial(jax.jit, static_argnames=("BR", "NYPAD", "stride", "interpret"))
def score_windows_mxu_pallas(q_stack, row0, col0, n_pts, *, BR: int,
                             NYPAD: int, stride: int,
                             interpret: bool = False):
    """Batched MXU window-sum scoring.  q_stack (N, R, L) bf16; row0/col0
    (N, K, P) int32 padded window starts; n_pts (N,) int32 true point
    counts.  Returns (N, K, NYPAD, 128) f32 lattice sums (stride already
    applied by the one-hot selectors)."""
    N, R, L = q_stack.shape
    _, K, P = row0.shape
    n_pts = n_pts.reshape(N, 1, 1).astype(jnp.int32)
    kernel = partial(_mxu_score_kernel, BR=BR, NYPAD=NYPAD, stride=stride)
    return pl.pallas_call(
        kernel,
        grid=(N, K),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, P), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, P), lambda n, k: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, NYPAD, 128), lambda n, k: (n, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, K, NYPAD, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, L), q_stack.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # upper bounds: loop runs to n_pts, not the padded P (see hybrid)
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * P * (NYPAD * BR * 256 + NYPAD * 256 * 128),
            bytes_accessed=N * R * L * 2 + N * K * P * BR * 256 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_pts, row0, col0, q_stack)


# ---------------------------------------------------------------------------
# Occupancy scatter.
#
# XLA lowers the 131k-index scatter-max of the grid build to a serialized
# update loop (~0.25 us/point measured on v5e — 35 ms per 16-job batch).
# Here each program owns one job's grid in VMEM, zero-fills it, and does
# one (1, 1) dynamic store per point.  Invalid points carry sy = -1 and
# are predicated away; the loop stops at the job's last valid lane.
# ---------------------------------------------------------------------------

def _scatter_body(sy_ref, sx_ref, m_ref, occ_vmem):
    """Shared scatter loop: one RMW per valid point, bounded by the
    job's last-valid lane (m_ref), invalid lanes (sy < 0) predicated
    away — the padded tail (empty base-scan slots + beam padding) is
    ~40% of the lanes at the bench shapes.  Two points per iteration
    amortize the loop/scalar overhead; the RMWs stay program-ordered, so
    pairs hitting the same (8, 128) tile remain correct (Mosaic cannot
    reorder potentially-aliasing dynamic accesses)."""
    rr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def one(p):
        sy = sy_ref[0, 0, p]

        @pl.when(sy >= 0)
        def _():
            sx = sx_ref[0, 0, p]
            # dynamic stores must be (8, 128)-tile aligned:
            # read-modify-write the aligned tile with a one-hot max
            r8 = pl.multiple_of((sy // 8) * 8, 8)
            c128 = pl.multiple_of((sx // 128) * 128, 128)
            tile = occ_vmem[pl.ds(r8, 8), pl.ds(c128, 128)]
            hit = (rr == sy - r8) & (cc == sx - c128)
            occ_vmem[pl.ds(r8, 8), pl.ds(c128, 128)] = jnp.where(
                hit, jnp.ones_like(tile), tile
            )

    def pt2(q, carry):
        one(2 * q)
        one(2 * q + 1)     # lane m_used (odd tails) carries sy = -1
        return carry

    jax.lax.fori_loop(0, (m_ref[0, 0, 0] + 1) // 2, pt2, 0)


def _scatter_kernel(sy_ref, sx_ref, m_ref, out_hbm, occ_vmem, sem):
    n = pl.program_id(0)
    occ_vmem[...] = jnp.zeros_like(occ_vmem)
    _scatter_body(sy_ref, sx_ref, m_ref, occ_vmem)
    # the grid doesn't fit VMEM double-buffered as an output block; ship
    # it to HBM manually from single-buffered scratch
    cp = pltpu.make_async_copy(occ_vmem, out_hbm.at[n], sem)
    cp.start()
    cp.wait()


def scatter_used_lanes(ok):
    """(N, M) validity mask -> (N,) last-valid-lane + 1 (the scatter
    kernels' per-job loop bound)."""
    M = ok.shape[-1]
    any_valid = ok.any(axis=-1)
    last = M - jnp.argmax(ok[:, ::-1], axis=-1)
    return jnp.where(any_valid, last, 0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("rows", "Cpad", "interpret"))
def scatter_occupancy_pallas(sy, sx, m_used, *, rows: int, Cpad: int,
                             interpret: bool = False):
    """sy/sx: (N, M) int32 scatter-layout cells (invalid -> -1);
    m_used: (N,) int32 per-job loop bound (last valid lane + 1).
    Returns (N, rows, Cpad) bf16 occupancy indicators."""
    N, M = sy.shape
    # the 2-wide-unrolled scatter loop reads lane m_used when m_used is
    # odd; an even lane capacity guarantees that read stays in bounds
    # (producers pad points to 128-multiples — enforce it here so a
    # future odd-M producer fails loudly, ADVICE r4)
    assert M % 2 == 0, M
    # SMEM blocks must keep the trailing two dims whole; a unit middle
    # axis satisfies the (8, 128)-or-whole rule
    sy = sy.reshape(N, 1, M)
    sx = sx.reshape(N, 1, M)
    m_used = m_used.reshape(N, 1, 1)
    return pl.pallas_call(
        _scatter_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, M), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, rows, Cpad), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows, Cpad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=N * (M + rows * Cpad),
            bytes_accessed=N * rows * Cpad * 2 + N * M * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sy, sx, m_used)


# ---------------------------------------------------------------------------
# Fused grid build: scatter + separable max-smear + quantize + bounds mask.
#
# Replaces three round-trips (scatter kernel -> HBM -> XLA smear chain ->
# HBM -> quantize+mask -> HBM; measured 6.5 + 24.9 + 10.5 ms per 16-job
# batch at S=2048) with ONE kernel that scatters into a VMEM-resident
# occupancy scratch, runs both 1-D weighted max-dilation passes in VMEM,
# quantizes to floor(100*x), masks cells past the full grid's high edge
# and DMAs each finished row strip to HBM.  The output never transits
# scoped VMEM as a whole array (the old smear kernel's (S, S) f32 result
# was stack-promoted by XLA past ~1024^2 — this kernel writes HBM
# manually), so it works at any S whose scratch fits VMEM.
#
# Layout contract:
#   sy, sx: (N, M) int32 scratch-layout cells (row = subrow + h, col =
#           subcol + h); invalid points carry sy = -1 and are predicated
#           away inside the scatter loop, which only runs to the job's
#           last valid lane (m_used).
#   lim:    (N, 2) int32 = (G - soy, G - sox): first out-of-full-grid
#           row/col in subgrid coords (>= S when no masking needed).
# Output: (N, S, S) bfloat16 — quantized smeared subgrids (values are
#   integers in [0, 100], exact in bf16).
# Math runs in f32 (taps quantize through floor(100*tap*...); bf16 tap
# rounding could cross an integer boundary); the {0,1} occupancy scratch
# itself is exact in bf16.
# ---------------------------------------------------------------------------

def _fused_build_kernel(sy_ref, sx_ref, lim_ref, m_ref, out_hbm, occ_vmem,
                        stage_vmem, sem, *, S, h, taps, RS):
    n = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        occ_vmem[...] = jnp.zeros_like(occ_vmem)
        _scatter_body(sy_ref, sx_ref, m_ref, occ_vmem)

    row0 = pl.multiple_of(i * ROW_TILE, ROW_TILE)
    strip = occ_vmem[pl.ds(row0, RS), :].astype(jnp.float32)

    # pass 1 (lanes): exploit tap symmetry (taps[d] == taps[2h-d], all > 0):
    # max(t*a, t*b) == t*max(a, b)
    acc = taps[h] * strip[:, h : h + S]
    for d in range(h):
        m = jnp.maximum(strip[:, d : d + S], strip[:, 2 * h - d : 2 * h - d + S])
        acc = jnp.maximum(acc, taps[d] * m)
    # pass 2 (sublanes)
    acc2 = taps[h] * acc[h : h + ROW_TILE, :]
    for d in range(h):
        m = jnp.maximum(
            acc[d : d + ROW_TILE, :], acc[2 * h - d : 2 * h - d + ROW_TILE, :]
        )
        acc2 = jnp.maximum(acc2, taps[d] * m)

    q = jnp.floor(acc2 * 100.0)
    # zero cells whose full-grid index is >= G (the element path's per-read
    # bounds mask, applied once here)
    row_hi = lim_ref[0, 0, 0] - i * ROW_TILE
    col_hi = lim_ref[0, 0, 1]
    rr2 = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, S), 0)
    cc2 = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, S), 1)
    q = jnp.where((rr2 < row_hi) & (cc2 < col_hi), q, 0.0)
    stage_vmem[...] = q.astype(jnp.bfloat16)

    cp = pltpu.make_async_copy(
        stage_vmem, out_hbm.at[n, pl.ds(row0, ROW_TILE), :], sem
    )
    cp.start()
    cp.wait()


def fused_build_vmem_bytes(S: int, h: int, Cpad: int) -> int:
    """Approximate VMEM footprint of build_grid_fused's scratch + strip
    temporaries, for the caller's gate."""
    R0 = _round_up(S + 2 * h + 1, 8) + 8
    RS = _round_up(ROW_TILE + 2 * h, 8)
    occ = R0 * Cpad * 2
    strip = RS * Cpad * 4
    acc = RS * S * 4          # live: acc + one pairwise-max temp
    acc2 = ROW_TILE * S * 4
    stage = ROW_TILE * S * 2
    return occ + strip + 2 * acc + acc2 + stage


@partial(jax.jit, static_argnames=("S", "h", "taps", "Cpad", "interpret"))
def build_grid_fused(sy, sx, lim, m_used, *, S: int, h: int, taps: tuple,
                     Cpad: int, interpret: bool = False):
    """sy/sx: (N, M) int32 scratch-layout cells (invalid -> -1);
    lim: (N, 2) int32 (row_hi, col_hi) full-grid bounds in subgrid coords;
    m_used: (N,) int32 per-job scatter loop bound (last valid lane + 1).
    Returns (N, S, S) bfloat16 quantized smeared correlation subgrids."""
    N, M = sy.shape
    assert S % ROW_TILE == 0, S
    assert 1 <= h < ROW_TILE, h
    # even lane capacity: the 2-wide scatter unroll reads lane m_used on
    # odd tails (see scatter_occupancy_pallas, ADVICE r4)
    assert M % 2 == 0, M
    R0 = _round_up(S + 2 * h + 1, 8) + 8
    RS = _round_up(ROW_TILE + 2 * h, 8)
    n_strips = S // ROW_TILE
    sy = sy.reshape(N, 1, M)
    sx = sx.reshape(N, 1, M)
    lim = lim.reshape(N, 1, 2)
    m_used = m_used.reshape(N, 1, 1)
    kernel = partial(_fused_build_kernel, S=S, h=h, taps=taps, RS=RS)
    return pl.pallas_call(
        kernel,
        grid=(N, n_strips),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, M), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((R0, Cpad), jnp.bfloat16),
            pltpu.VMEM((ROW_TILE, S), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=N * (M + 3 * (2 * h + 1) * S * S),
            bytes_accessed=N * S * S * 2 + N * R0 * Cpad * 2 + N * M * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sy, sx, lim, m_used)


def pallas_available() -> bool:
    """Mosaic lowering needs a real TPU backend (the axon tunnel reports
    platform 'tpu')."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
