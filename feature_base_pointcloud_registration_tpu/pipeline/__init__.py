from .cloud_info import CloudInfo, ScanFeatures, RawScan

__all__ = ["CloudInfo", "ScanFeatures", "RawScan"]
