from yag_slam_tpu.mapping.occupancy import (
    OccupancyGrid,
    create_occupancy_grid,
    occupancy_grid_map_to_correlation_grid,
    GRID_OCCUPIED,
    GRID_UNKNOWN,
    GRID_FREE,
)
from yag_slam_tpu.mapping.raytrace import run_raytracing_sweep, trace_rays

__all__ = [
    "OccupancyGrid",
    "create_occupancy_grid",
    "occupancy_grid_map_to_correlation_grid",
    "run_raytracing_sweep",
    "trace_rays",
    "GRID_OCCUPIED",
    "GRID_UNKNOWN",
    "GRID_FREE",
]
