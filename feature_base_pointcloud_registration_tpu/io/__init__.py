from .synthetic import SyntheticWorld, simulate_scan, build_feature_map
from .pcd import read_pcd, write_pcd

__all__ = [
    "SyntheticWorld",
    "simulate_scan",
    "build_feature_map",
    "read_pcd",
    "write_pcd",
]
