from .projection import project_scan, deskew_points
from .voxel import voxel_downsample
from .features import extract_features
from .knn import knn5
from .cropbox import crop_box
from .register import register_scan, register_scan_fast, RegisterResult

__all__ = [
    "project_scan",
    "deskew_points",
    "voxel_downsample",
    "extract_features",
    "knn5",
    "crop_box",
    "register_scan",
    "register_scan_fast",
    "RegisterResult",
]
