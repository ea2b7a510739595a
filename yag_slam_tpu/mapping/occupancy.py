"""Occupancy-grid rendering from scans — batched DDA raytracing on device.

The reference delegates this to the un-vendored C++
`karto_scanmatcher.create_occupancy_grid` (call sites
/root/reference/yag_slam/graph_slam.py:341-342,
/root/reference/ros1/slam_node_ros1:188); its *value contract* is fixed by
the consumers: occupied=0, unknown=200, free=255
(/root/reference/ros1/slam_node_ros1:199-202 remaps exactly those three
values; /root/reference/yag_slam/raytracing.py:74-80 treats <210 as
blocking and (180, 210) as unknown).

Semantics follow OpenKarto's CreateFromScans: every beam traces free cells
from the sensor to min(range, range_threshold); beams shorter than the
threshold also register a hit at the endpoint; a cell is decided by its
pass/hit counters (pass > min_pass_through; hit/pass >= occupancy_threshold
=> occupied).  The trace itself is one vectorized program over all
(scan, beam, step) triples — one dominant-axis DDA step per iteration, like
Bresenham — instead of a per-ray loop.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from yag_slam_tpu.core.transform import Pose2

GRID_OCCUPIED = 0
GRID_UNKNOWN = 200
GRID_FREE = 255

# OpenKarto defaults
MIN_PASS_THROUGH = 2
OCCUPANCY_THRESHOLD = 0.1


@dataclass
class OccupancyGrid:
    image: np.ndarray  # (H, W) uint8; row 0 at offset.y (lower-left origin)
    width: int
    height: int
    offset: Pose2
    resolution: float


@partial(
    jax.jit,
    static_argnames=("width", "height", "max_steps", "min_pass_through"),
)
def _render_counts(
    origin_x,      # (N,) sensor x per beam (world)
    origin_y,
    end_x,         # (N,) clipped beam endpoint (world)
    end_y,
    is_hit,        # (N,) endpoint is a real return (range < threshold)
    valid,         # (N,)
    ox,
    oy,
    res,
    *,
    width: int,
    height: int,
    max_steps: int,
    min_pass_through: int,
):
    dx = end_x - origin_x
    dy = end_y - origin_y
    adx = jnp.abs(dx) / res
    ady = jnp.abs(dy) / res
    n_steps = jnp.ceil(jnp.maximum(adx, ady)).astype(jnp.int32)  # cells along ray
    n_steps = jnp.minimum(n_steps, max_steps)
    inv = 1.0 / jnp.maximum(n_steps.astype(dx.dtype), 1.0)

    k = jnp.arange(max_steps, dtype=dx.dtype)
    # positions strictly before the endpoint cell: k/n_steps for k<n_steps
    t = k[None, :] * inv[:, None]
    px = origin_x[:, None] + dx[:, None] * t
    py = origin_y[:, None] + dy[:, None] * t
    cx = jnp.round((px - ox) / res).astype(jnp.int32)
    cy = jnp.round((py - oy) / res).astype(jnp.int32)
    step_ok = (
        valid[:, None]
        & (k[None, :] < n_steps[:, None].astype(dx.dtype))
        & (cx >= 0)
        & (cx < width)
        & (cy >= 0)
        & (cy < height)
    )
    lin = jnp.where(step_ok, cy * width + cx, width * height)

    ex = jnp.round((end_x - ox) / res).astype(jnp.int32)
    ey = jnp.round((end_y - oy) / res).astype(jnp.int32)
    end_ok = valid & (ex >= 0) & (ex < width) & (ey >= 0) & (ey < height)
    end_lin = jnp.where(end_ok, ey * width + ex, width * height)

    size = width * height + 1
    ones_steps = jnp.ones_like(lin, dtype=jnp.int32)
    passes = jnp.zeros(size, jnp.int32).at[lin.ravel()].add(ones_steps.ravel())
    # endpoint also counts as a visit (Karto updates pass+hit at the hit cell)
    passes = passes.at[end_lin].add(jnp.ones_like(end_lin, dtype=jnp.int32))
    hits = jnp.zeros(size, jnp.int32).at[end_lin].add(is_hit.astype(jnp.int32))

    passes = passes[: width * height].reshape(height, width)
    hits = hits[: width * height].reshape(height, width)

    visited = passes > min_pass_through
    occupied = visited & (
        hits.astype(jnp.float32)
        >= OCCUPANCY_THRESHOLD * passes.astype(jnp.float32)
    ) & (hits > 0)
    image = jnp.where(
        occupied,
        jnp.uint8(GRID_OCCUPIED),
        jnp.where(visited, jnp.uint8(GRID_FREE), jnp.uint8(GRID_UNKNOWN)),
    )
    return image


def create_occupancy_grid(scans, resolution=0.05, range_threshold=12.0,
                          min_pass_through=MIN_PASS_THROUGH):
    """Render all scans into an occupancy image.

    Same contract as the reference's C++ entry point
    (`create_occupancy_grid([scans], resolution, range_threshold)
    -> grid{.image, .width, .height, .offset}`,
    /root/reference/yag_slam/graph_slam.py:341-342)."""
    if not scans:
        raise ValueError("create_occupancy_grid needs at least one scan")

    origins = []
    ends = []
    hits = []
    for scan in scans:
        p = scan.corrected_pose
        x, y, t = p.x, p.y, p.euler[-1]
        r = np.asarray(scan.ranges, dtype=np.float64)
        n = len(r)
        angles = t + scan.min_angle + np.arange(n) * scan.angle_increment
        ok = np.isfinite(r) & (r > scan.min_range) & (r <= scan.max_range)
        rr = np.where(ok, r, 0.0)
        clipped = np.minimum(rr, range_threshold)
        ex = x + clipped * np.cos(angles)
        ey = y + clipped * np.sin(angles)
        origins.append(np.stack([np.full(n, x), np.full(n, y)], axis=1)[ok])
        ends.append(np.stack([ex, ey], axis=1)[ok])
        hits.append((rr < range_threshold)[ok])

    origins = np.concatenate(origins)
    ends = np.concatenate(ends)
    hits = np.concatenate(hits)

    all_x = np.concatenate([origins[:, 0], ends[:, 0]])
    all_y = np.concatenate([origins[:, 1], ends[:, 1]])
    minx, maxx = all_x.min(), all_x.max()
    miny, maxy = all_y.min(), all_y.max()
    ox = minx - resolution
    oy = miny - resolution
    width = int(np.ceil((maxx - ox) / resolution)) + 2
    height = int(np.ceil((maxy - oy) / resolution)) + 2

    n = len(origins)
    cap = 1
    while cap < n:
        cap *= 2
    pad = cap - n

    def padded(a, fill=0.0):
        return np.concatenate([a, np.full(pad, fill, dtype=a.dtype)])

    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    max_steps = int(np.ceil(range_threshold / resolution)) + 2

    image = _render_counts(
        jnp.asarray(padded(origins[:, 0]), jnp.float32),
        jnp.asarray(padded(origins[:, 1]), jnp.float32),
        jnp.asarray(padded(ends[:, 0]), jnp.float32),
        jnp.asarray(padded(ends[:, 1]), jnp.float32),
        jnp.asarray(np.concatenate([hits, np.zeros(pad, bool)])),
        jnp.asarray(valid),
        ox,
        oy,
        resolution,
        width=width,
        height=height,
        max_steps=max_steps,
        min_pass_through=min_pass_through,
    )
    return OccupancyGrid(
        image=np.asarray(image),
        width=width,
        height=height,
        offset=Pose2(float(ox), float(oy), 0.0),
        resolution=resolution,
    )


def occupancy_grid_map_to_correlation_grid(
    map_im, res, smear_deviation=0.05, occupied_value=0
):
    """Convert a saved occupancy image into a correlation grid (smeared
    occupied cells), as /root/reference/yag_slam/helpers.py:24-34 — used by
    the splice/localize-against-map path."""
    from yag_slam_tpu.matching import correlation as C

    occ_y, occ_x = np.where(np.asarray(map_im) == occupied_value)
    h, w = map_im.shape[:2]
    k1 = C.gaussian_kernel_1d(res, smear_deviation)
    # reuse the separable max-dilation grid builder on a synthetic "point set"
    wx = jnp.asarray(occ_x.astype(np.float64) * res)
    wy = jnp.asarray(occ_y.astype(np.float64) * res)
    keep = jnp.ones(len(occ_x), bool)
    G = max(h, w)
    grid = C.build_correlation_grid(
        wx, wy, keep, 0.0, 0.0, grid_size=G, res=res, k1=k1,
        dtype=jnp.float32,
    )
    return np.asarray(grid)[:h, :w]
