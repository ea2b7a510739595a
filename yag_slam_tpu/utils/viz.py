"""Visualization (matplotlib; the reference's optional threeviz inspector
`visualize_slam_threeviz` at /root/reference/yag_slam/helpers.py:576-605
plots poses, edges, laser points and the textured map plane — this is the
dependency-light equivalent)."""
from __future__ import annotations

import numpy as np


def plot_slam(slam, ax=None, show_lasers=False, map_resolution=0.05,
              range_threshold=12.0, pose_color="tab:red",
              edge_color="tab:blue"):
    """Draw the current map, trajectory, and graph edges onto a matplotlib
    axis; returns the axis."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 8))

    if slam.graph.vertices:
        grid = slam.make_occupancy_grid(resolution=map_resolution,
                                        range_threshold=range_threshold)
        extent = [
            grid.offset.x,
            grid.offset.x + grid.width * map_resolution,
            grid.offset.y,
            grid.offset.y + grid.height * map_resolution,
        ]
        ax.imshow(grid.image, origin="lower", cmap="gray", vmin=0, vmax=255,
                  extent=extent)

    for e in slam.graph.edges:
        s, t = e.source.obj.corrected_pose, e.target.obj.corrected_pose
        ax.plot([s.x, t.x], [s.y, t.y], color=edge_color, linewidth=0.6,
                alpha=0.7)

    xs = [v.obj.corrected_pose.x for v in slam.graph.vertices]
    ys = [v.obj.corrected_pose.y for v in slam.graph.vertices]
    ax.plot(xs, ys, ".", color=pose_color, markersize=3)

    if show_lasers:
        for v in slam.graph.vertices:
            px, py = v.obj.points()
            ax.plot(px, py, ".", markersize=0.5, alpha=0.2, color="black")

    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    return ax


def save_slam_figure(slam, path, **kwargs):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    ax = plot_slam(slam, **kwargs)
    ax.figure.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(ax.figure)
    return path
