from yag_slam_tpu.core.transform import Transform, Pose2
from yag_slam_tpu.core.scan import LocalizedRangeScan, LaserScanConfig
from yag_slam_tpu.core.config import (
    default_config,
    default_config_loop,
    ScanMatcherConfig,
    make_config,
)

__all__ = [
    "Transform",
    "Pose2",
    "LocalizedRangeScan",
    "LaserScanConfig",
    "ScanMatcherConfig",
    "default_config",
    "default_config_loop",
    "make_config",
]
