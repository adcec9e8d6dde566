"""Localization pipeline: scan-to-map against a prebuilt global feature map.

This is the fork's *active* path (ref: src/mapOptmization.h:263-343
`registration`, driven from cloudHandler at src/imageProjection.cpp:203-225):

  1. load a prebuilt global corner/surf map (PCD) and voxel-downsample it
     (ref :245-260),
  2. per scan (rate-gated by mappingProcessInterval, ref :279): crop a
     +-(30,30,10) m local map around the pose guess (ref :283-304),
  3. run the scan-to-map Gauss-Newton solve,
  4. chain the pose as the next initial guess (the static pose/step chain at
     src/imageProjection.cpp:206-218 — `step` stays identity so the last
     solution is the next guess).

The crop+register inner step is one jitted function; the pose chain and rate
gate are host-side state like the reference's statics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..ops.cropbox import crop_box
from ..ops.register import RegisterResult, transform_update
from ..ops.voxel import voxel_downsample
from .cloud_info import DeskewInfo, FeatureMap, RawScan
from .frontend import process_scan


class GlobalMap:
    """Holds the padded global corner/surf map on device.

    Replaces corner_GlobalMap / surf_GlobalMap (ref: src/mapOptmization.h:
    110-111, loaded+downsampled at :245-260)."""

    def __init__(self, corner_xyz, corner_mask, surf_xyz, surf_mask):
        self.corner_xyz = jnp.asarray(corner_xyz, jnp.float32)
        self.corner_mask = jnp.asarray(corner_mask)
        self.surf_xyz = jnp.asarray(surf_xyz, jnp.float32)
        self.surf_mask = jnp.asarray(surf_mask)

    @classmethod
    def from_arrays(cls, params: Params, corner, surf,
                    corner_cap: int = 1 << 19, surf_cap: int = 1 << 20,
                    downsample: bool = True):
        def pad(a, cap):
            a = np.asarray(a, np.float32)
            assert a.shape[0] <= cap, (a.shape, cap)
            out = np.zeros((cap, 3), np.float32)
            out[: a.shape[0]] = a
            m = np.zeros(cap, bool)
            m[: a.shape[0]] = True
            return out, m

        cx, cm = pad(corner, corner_cap)
        sx, sm = pad(surf, surf_cap)
        if downsample:
            cx, cm, _ = voxel_downsample(jnp.asarray(cx), jnp.asarray(cm),
                                         params.mapping_corner_leaf_size,
                                         corner_cap)
            sx, sm, _ = voxel_downsample(jnp.asarray(sx), jnp.asarray(sm),
                                         params.mapping_surf_leaf_size,
                                         surf_cap)
        return cls(cx, cm, sx, sm)

    @classmethod
    def from_pcd_dir(cls, params: Params, directory: str, **kw):
        """Load cloudCorner.pcd / cloudSurf.pcd like the reference
        (ref: src/mapOptmization.h:245-260)."""
        import os
        from ..io.pcd import read_pcd

        c = read_pcd(os.path.join(directory, "cloudCorner.pcd"))
        s = read_pcd(os.path.join(directory, "cloudSurf.pcd"))
        corner = np.stack([c["x"], c["y"], c["z"]], -1)
        surf = np.stack([s["x"], s["y"], s["z"]], -1)
        return cls.from_arrays(params, corner, surf, **kw)


@partial(jax.jit, static_argnames=("map_corner_cap", "map_surf_cap",
                                   "half_extent"))
def _crop_local_map(gm_corner, gm_corner_mask, gm_surf, gm_surf_mask,
                    center, *, half_extent, map_corner_cap, map_surf_cap):
    """CropBox local map around the pose guess (ref :283-304)."""
    he = jnp.asarray(half_extent, jnp.float32)
    cx, cm, _ = crop_box(gm_corner, gm_corner_mask, center, he,
                         map_corner_cap)
    sx, sm, _ = crop_box(gm_surf, gm_surf_mask, center, he, map_surf_cap)
    return FeatureMap(cx, cm, sx, sm)


@dataclasses.dataclass
class LocalizationPipeline:
    """Stateful driver for sequential localization (host state = the
    reference's statics: pose chain + rate gate)."""

    params: Params
    global_map: GlobalMap

    def __post_init__(self):
        from ..utils.log import get_logger

        self._log = get_logger()
        self.pose = np.zeros(6, np.float32)       # chained guess (ref ip:206)
        self.time_last_processing = -1.0          # ref :135,279
        self.last_result: Optional[RegisterResult] = None

    def step(self, scan: RawScan, timestamp: float,
             deskew_info: Optional[DeskewInfo] = None,
             initial_guess: Optional[np.ndarray] = None):
        """Process one scan; returns the current pose6 (numpy).

        Scans arriving faster than mappingProcessInterval keep the previous
        pose, exactly like the reference's gate (ref :279)."""
        p = self.params
        if timestamp - self.time_last_processing < p.mapping_process_interval:
            return self.pose
        self.time_last_processing = timestamp

        _, feats = process_scan(p, scan, deskew_info)
        guess = (np.asarray(initial_guess, np.float32)
                 if initial_guess is not None else self.pose)

        imu_rpy = (deskew_info.imu_rpy_init if deskew_info is not None
                   else jnp.zeros(3, jnp.float32))
        imu_avail = (deskew_info.imu_available if deskew_info is not None
                     else jnp.asarray(False))

        from ..ops.register import grid_register_step

        guess_j = jnp.asarray(guess)
        local_map = _crop_local_map(
            self.global_map.corner_xyz, self.global_map.corner_mask,
            self.global_map.surf_xyz, self.global_map.surf_mask,
            guess_j[3:6],
            half_extent=tuple(p.local_map_half_extent),
            map_corner_cap=p.map_corner_cap, map_surf_cap=p.map_surf_cap)
        res = grid_register_step(
            local_map, feats, guess_j,
            half_extent=tuple(p.register_grid_half_extent),
            max_iterations=p.max_gn_iterations,
            min_correspondences=p.min_correspondences,
            edge_min_valid=p.edge_feature_min_valid_num,
            surf_min_valid=p.surf_feature_min_valid_num,
            min_plane_spread=p.surf_min_planar_spread,
        )
        pose_fused = transform_update(
            res.pose6, imu_rpy, imu_avail,
            imu_weight=p.imu_attitude_weight,
            rotation_tolerance=p.rotation_tolerance,
            z_tolerance=p.z_tolerance)
        res = res._replace(
            pose6=jnp.where(res.valid, pose_fused, res.pose6))
        self.last_result = res
        self.pose = np.array(res.pose6)
        # publishOdometry analog (ref :339-341, :1791-1848)
        self._log.event(
            "localization/odometry",
            level="info" if bool(res.valid) else "warn",
            time=timestamp, pose=self.pose, n_corr=res.n_corr,
            iterations=res.iterations, converged=res.converged,
            degenerate=res.is_degenerate, gate_valid=res.valid)
        return self.pose
