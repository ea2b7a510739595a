from yag_slam_tpu.parallel.sharding import default_mesh
from yag_slam_tpu.parallel.loop_search import ShardedLoopMatcher
from yag_slam_tpu.parallel.dist_spa import DistributedSPA

__all__ = ["default_mesh", "ShardedLoopMatcher", "DistributedSPA"]
