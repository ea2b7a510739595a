"""Lifelong mapping: convert a saved occupancy-grid *image* back into a
pose graph of synthetic scans, so mapping/localization can continue against
an old map.

Pipeline parity with /root/reference/yag_slam/splicing.py:
  segment free space (:32-55) -> centroids (:57-65) -> region adjacency
  edges (:67-80) -> per-centroid 1439-ray synthetic scans through the map
  raytracer with >20 m range poisoning (:82-107) -> inject into a GraphSlam
  with near-zero-covariance adjacency edges (:109-125).

Sweeps run as one batched device program per centroid
(yag_slam_tpu.mapping.raytrace) instead of a numba pixel march per ray.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from yag_slam_tpu.core.scan import LocalizedRangeScan
from yag_slam_tpu.mapping.raytrace import trace_rays
from yag_slam_tpu.splicing.segmentation import open_free_space, spatial_segments


def pixel_to_meters(resolution, origin, h, x, y):
    """Reference's image->world convention (y axis flipped;
    /root/reference/yag_slam/splicing.py:29-30)."""
    return (x * resolution) + origin[0], ((h - y) * resolution) + origin[1]


def segment_map(imin, verbose=False, density=1, seed=0):
    """Segment the free space of a map image into spatially compact
    regions (~1 per 600k free-pixel mass x density, like the reference's
    segment count heuristic, /root/reference/yag_slam/splicing.py:46)."""
    im = np.asarray(imin).copy()
    free = im >= 254
    free = open_free_space(free, size=11)
    n_segments = int(free.sum() * 255 // 600000 * density)
    n_segments = max(n_segments, 1)
    return spatial_segments(free, n_segments, seed=seed)


def determine_centroids(segments):
    """Segment id (0-based) -> (x, y) pixel centroid
    (/root/reference/yag_slam/splicing.py:57-65)."""
    centroid_map = {}
    for sid in np.unique(segments):
        if sid == 0:
            continue
        yvals, xvals = np.nonzero(segments == sid)
        centroid_map[sid - 1] = (float(np.mean(xvals)), float(np.mean(yvals)))
    return centroid_map


def create_edges(segments, min_shared=4):
    """Region-adjacency edges: segment pairs sharing >= `min_shared`
    boundary pixels (/root/reference/yag_slam/splicing.py:67-80)."""
    seg = np.asarray(segments)
    boundary = np.zeros(seg.shape, dtype=bool)
    boundary[:-1, :] |= (seg[:-1, :] != seg[1:, :])
    boundary[:, :-1] |= (seg[:, :-1] != seg[:, 1:])
    counts = defaultdict(int)
    H, W = seg.shape
    for y, x in zip(*np.nonzero(boundary)):
        window = seg[max(0, y - 2) : y + 2, max(0, x - 2) : x + 2]
        uniques = sorted(int(u) - 1 for u in np.unique(window) if u)
        if len(uniques) == 2:
            counts[tuple(uniques)] += 1
    return [pair for pair, freq in counts.items() if freq > min_shared - 1]


def map_to_graph(map_image, resolution, origin, density=1):
    """Synthetic scans (one per free-space region centroid) + adjacency
    edges from a saved map image
    (/root/reference/yag_slam/splicing.py:82-107): a 1439-ray sweep
    (-180..180 deg step 0.25, reversed — the reference zips reversed sweep
    angles onto forward range slots), ranges > 20 m poisoned to 100
    (invalid)."""
    im = np.asarray(map_image)
    segments = segment_map(im, density=density)
    centroid_map = determine_centroids(segments)
    edges = create_edges(segments)
    angles = np.arange(-180, 180, 0.25)[:-1]

    scans = []
    for cm in range(len(centroid_map)):
        x_px, y_px = centroid_map[cm]
        _, _, lengths = trace_rays(im, angles[::-1], x_px, y_px)
        ranges = lengths * resolution
        ranges = np.where(ranges > 20.0, 100.0, ranges)
        x, y = pixel_to_meters(resolution, origin, im.shape[0], x_px, y_px)
        scan = LocalizedRangeScan(
            ranges, -np.pi, np.pi - np.deg2rad(0.25), np.deg2rad(0.25),
            0.0, 30.0, 20.0, x, y, 0.0,
        )
        scan.num = cm
        scans.append(scan)
    return scans, edges


def map_to_graphslam(slam, map_image, resolution, origin, density=1):
    """Inject a map image into a GraphSlam instance as vertices +
    near-zero-covariance adjacency edges
    (/root/reference/yag_slam/splicing.py:109-125)."""
    scans, edges = map_to_graph(map_image, resolution, origin, density)
    scan_map = {s.num: s for s in scans}
    in_edges = set(e[0] for e in edges) | set(e[1] for e in edges)

    for scan in scans:
        slam.add_vertex(scan)
    for frm, to in edges:
        slam.link_scans(
            scan_map[frm], scan_map[to], None, (np.identity(3) * 1e-12)
        )
    # Drop isolated regions (no adjacency) and renumber.  The reference
    # intends this but its prune is a dead store to a nonexistent
    # attribute (`slam_fake.vertices = ...`,
    # /root/reference/yag_slam/splicing.py:122) — we do it for real.  As
    # in the reference's node flow, callers should round-trip through
    # serialize/deserialize afterwards to rebuild the optimizer indices
    # (/root/reference/ros1/slam_node_ros1:147-148).
    slam.graph.vertices = [
        v for v in slam.graph.vertices if v.obj.num in in_edges
    ]
    for ii, v in enumerate(slam.graph.vertices):
        v.obj.num = ii
    return slam
