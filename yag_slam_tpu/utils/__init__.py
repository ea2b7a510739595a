from yag_slam_tpu.utils.metrics import ate_rmse, trajectory_from_slam

__all__ = ["ate_rmse", "trajectory_from_slam"]
