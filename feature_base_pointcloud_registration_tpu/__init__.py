"""feature_base_pointcloud_registration_tpu — TPU-native feature-based point-cloud registration.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
qpc001/Feature_Base_Pointcloud_Registration (a LIO-SAM fork restructured into a
feature-based scan-to-map localization pipeline):

  * LOAM-style front end: range-image projection, IMU deskew, curvature
    features, edge/planar picking          (ref: src/imageProjection.cpp,
                                            src/featureExtraction.h)
  * scan-to-map registration: local-map crop, 5-NN correspondence,
    point-to-line / point-to-plane Gauss-Newton with degeneracy guard
                                           (ref: src/mapOptmization.h:263-1489)
  * SLAM back end: keyframes, sliding-window factor-graph optimizer,
    GPS factors, loop closure ICP          (ref: src/mapOptmization.h:346-1770)
  * IMU preintegration odometry            (ref: src/imuPreintegration.cpp)

Everything in the compute path is pure-functional JAX over fixed-shape,
mask-padded arrays: jit-able, vmap-able over batches of scans, and shardable
over a TPU mesh with shard_map for offline batched mapping throughput.
"""

from .config import Params
from .pipeline.cloud_info import CloudInfo, ScanFeatures

__version__ = "0.1.0"

__all__ = ["Params", "CloudInfo", "ScanFeatures", "__version__"]
