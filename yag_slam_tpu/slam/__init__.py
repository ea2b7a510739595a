from yag_slam_tpu.slam.graph_slam import GraphSlam, make_near_scan_visitor
from yag_slam_tpu.slam.serde import _serialize, _deserialize

__all__ = ["GraphSlam", "make_near_scan_visitor", "_serialize", "_deserialize"]
