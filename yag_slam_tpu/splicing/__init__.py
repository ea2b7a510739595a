from yag_slam_tpu.splicing.splice import (
    map_to_graph,
    map_to_graphslam,
    segment_map,
    determine_centroids,
    create_edges,
    pixel_to_meters,
)

__all__ = [
    "map_to_graph",
    "map_to_graphslam",
    "segment_map",
    "determine_centroids",
    "create_edges",
    "pixel_to_meters",
]
