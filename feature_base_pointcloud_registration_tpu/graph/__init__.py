from .pose_graph import PoseGraphData, optimize_pose_graph, between_residual
from .imu_graph import ImuChainData, optimize_imu_chain

__all__ = [
    "PoseGraphData",
    "optimize_pose_graph",
    "between_residual",
    "ImuChainData",
    "optimize_imu_chain",
]
