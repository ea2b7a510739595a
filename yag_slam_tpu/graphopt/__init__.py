from yag_slam_tpu.graphopt.graph import (
    Edge,
    Graph,
    LinkLabel,
    RadiusHashSearch,
    Vertex,
    do_breadth_first_traversal,
)
from yag_slam_tpu.graphopt.spa import SPA2d, PoseGraphSolver

__all__ = [
    "Edge",
    "Graph",
    "LinkLabel",
    "RadiusHashSearch",
    "Vertex",
    "do_breadth_first_traversal",
    "SPA2d",
    "PoseGraphSolver",
]
