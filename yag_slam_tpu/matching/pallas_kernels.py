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

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


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


@partial(jax.jit, static_argnames=("h", "S", "taps"))
def smear_grid_pallas(occ_padded, *, h: int, S: int, taps: tuple):
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


def pallas_available() -> bool:
    """Mosaic lowering needs a real TPU backend (the axon tunnel reports
    platform 'tpu')."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
