from .preintegration import (
    NavState,
    PreintState,
    preintegrate,
    predict,
    failure_detection,
)
from .conversion import imu_converter

__all__ = [
    "NavState",
    "PreintState",
    "preintegrate",
    "predict",
    "failure_detection",
    "imu_converter",
]
