from yag_slam_tpu.io.simulator import (
    SimWorld,
    raycast_world,
    simulate_scan,
    square_loop_trajectory,
)

__all__ = [
    "SimWorld",
    "raycast_world",
    "simulate_scan",
    "square_loop_trajectory",
]
