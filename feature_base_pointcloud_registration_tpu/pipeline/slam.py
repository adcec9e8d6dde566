"""Full SLAM back end: keyframes + factor graph + loop closure.

Rebuild of the reference's *latent* path — mapOptimization's
laserCloudInfoHandler (ref: src/mapOptmization.h:346-389) with its whole
sub-tree:

  updateInitialGuess            (ref :799-855)   -> _initial_guess
  extractSurroundingKeyFrames   (ref :857-978)   -> _build_local_map (jitted)
  downsampleCurrentScan         (ref :981-993)   -> frontend.downsample_features
  scan2MapOptimization          (ref :1403-1489) -> ops.register
  saveFrame / addOdomFactor / addGPSFactor / iSAM2 update
                                (ref :1491-1733) -> graph.pose_graph LM window
  correctPoses (+ reset-id bump)(ref :1735-1770) -> _correct_poses
  loop closure thread           (ref :582-782)   -> maybe_close_loop (ICP)
  PCD map save / reload         (ref :485-521, :245-260) -> save_map

Host state (keyframe clouds, factor lists) mirrors the reference's members;
all geometry runs in jitted fixed-shape kernels on device.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..geom.se3 import inverse_matrix, matrix_to_pose6, pose6_to_matrix
from ..graph.pose_graph import PoseGraphData, optimize_pose_graph
from ..ops.icp import icp_align
from ..ops.register import transform_update
from ..ops.voxel import voxel_downsample
from .cloud_info import DeskewInfo, FeatureMap, RawScan, ScanFeatures
from .frontend import process_scan


@partial(jax.jit, static_argnames=("map_corner_cap", "map_surf_cap"))
def _build_local_map(kf_corner, kf_corner_mask, kf_surf, kf_surf_mask,
                     kf_poses, select_mask, corner_leaf, surf_leaf,
                     *, map_corner_cap, map_surf_cap):
    """Transform selected keyframe clouds to world, merge, voxel-downsample.

    extractCloud equivalent (ref: src/mapOptmization.h:909-955); the OpenMP
    loop becomes one batched transform over [K, P, 3].
    """
    T = pose6_to_matrix(kf_poses)                      # [K,4,4]
    prec = jax.lax.Precision.HIGHEST

    def to_world(cl):
        return jnp.einsum("kij,kpj->kpi", T[:, :3, :3], cl,
                          precision=prec) + T[:, None, :3, 3]

    cw = to_world(kf_corner)
    sw = to_world(kf_surf)
    cm = kf_corner_mask & select_mask[:, None]
    sm = kf_surf_mask & select_mask[:, None]

    K, Pc, _ = cw.shape
    _, Ps, _ = sw.shape
    cx, cmask, _ = voxel_downsample(cw.reshape(K * Pc, 3),
                                    cm.reshape(K * Pc), corner_leaf,
                                    map_corner_cap)
    sx, smask, _ = voxel_downsample(sw.reshape(K * Ps, 3),
                                    sm.reshape(K * Ps), surf_leaf,
                                    map_surf_cap)
    return FeatureMap(cx, cmask, sx, smask)


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _dev_update_kf_slot(kc, kcm, ks, ksm, idx, corner, cmask, surf, smask):
    """In-place (donated) single-slot update of the device-resident keyframe
    store.  Ships one keyframe (~50 KB), not the whole [K, cap, 3] buffers
    (~25-50 MB) — the round-2 review's device-residency item: per-keyframe
    host->device traffic stays flat as the map grows."""
    idx = jnp.asarray(idx, jnp.int32)
    z = jnp.zeros((), jnp.int32)
    return (jax.lax.dynamic_update_slice(kc, corner[None], (idx, z, z)),
            jax.lax.dynamic_update_slice(kcm, cmask[None], (idx, z)),
            jax.lax.dynamic_update_slice(ks, surf[None], (idx, z, z)),
            jax.lax.dynamic_update_slice(ksm, smask[None], (idx, z)))


@dataclasses.dataclass
class SlamPipeline:
    """Sequential SLAM driver (odometry + mapping + optional loop closure)."""

    params: Params
    max_keyframes: int = 512
    kf_corner_cap: int = 1024
    kf_surf_cap: int = 4096
    loop_submap_cap: int = 16384
    opt_window: int = 32          # trailing-window size for incremental LM
    window_gps_cap: int = 16      # in-window GPS factor slots
    loop_factor_cap: int = 64     # full-graph loop-factor slots (fixed shape)
    gps_factor_cap: int = 256     # full-graph GPS-factor slots (fixed shape)

    def __post_init__(self):
        from ..utils.log import get_logger

        self._log = get_logger()
        p = self.params
        K = self.max_keyframes
        self.kf_corner = np.zeros((K, self.kf_corner_cap, 3), np.float32)
        self.kf_corner_mask = np.zeros((K, self.kf_corner_cap), bool)
        self.kf_surf = np.zeros((K, self.kf_surf_cap, 3), np.float32)
        self.kf_surf_mask = np.zeros((K, self.kf_surf_cap), bool)
        self.kf_poses = np.zeros((K, 6), np.float32)   # cloudKeyPoses6D
        self.kf_times = np.zeros(K, np.float64)
        self.n_keyframes = 0

        # factor storage (host; converted to PoseGraphData on optimize).
        # Odometry betweens form a chain — entry j connects keyframe j-1 -> j
        # (fixed-shape arrays so the window graph never re-jits); loop/GPS
        # factors are sparse lists.
        self.odom_meas = np.zeros((K, 6), np.float32)
        self.odom_sigma = np.ones((K, 6), np.float32)
        self.loop_factors: List[tuple] = []  # (i, j, meas6, sigma6)
        self.gps_factors: List[tuple] = []   # (i, xyz, sigma3)
        self.prior_factor = None
        self.gps_queue: List[tuple] = []     # (time, xyz, cov3)
        self.last_gps_point = np.zeros(3)

        # marginal state for the incremental window (iSAM2 equivalents):
        # poseCovariance (ref :1706) and the carried prior on the pose about
        # to leave the window (the reference's own key==100 reset trick,
        # ref: src/imuPreintegration.cpp:234-267, applied to the pose graph)
        self.pose_cov = np.zeros((6, 6))
        self.carried_prior_sigma = None      # sigma6 for window pose 0

        # device mirror of the keyframe cloud buffers (host arrays stay the
        # source of truth for graph logic / loop closure / save_map); None =
        # stale, re-uploaded lazily.  Updated one slot at a time via donated
        # dynamic_update_slice so per-keyframe transfer is O(keyframe), not
        # O(map) — see _dev_update_kf_slot.
        self._dev_clouds = None

        self.pose = np.zeros(6, np.float32)  # transformTobeMapped
        self.time_last_processing = -1.0
        self.last_imu_transform: Optional[np.ndarray] = None
        self.reset_id = 0                    # imuPreintegrationResetId
        self.a_loop_is_closed = False
        self.trajectory: List[np.ndarray] = []

    # ------------------------------------------------------------- guesses
    def _initial_guess(self, cloud_imu_rpy, imu_available, odom_available,
                       odom_guess, odom_reset_id):
        """updateInitialGuess (ref: src/mapOptmization.h:799-855)."""
        p = self.params
        if self.n_keyframes == 0:
            rpy = np.asarray(cloud_imu_rpy, np.float32)
            guess = np.zeros(6, np.float32)
            guess[:3] = rpy
            if not p.use_imu_heading_initialization:
                guess[2] = 0.0
            self.last_imu_transform = rpy.copy()
            self.pose = guess
            return guess
        if odom_available and odom_reset_id == self.reset_id:
            self.last_imu_transform = np.asarray(cloud_imu_rpy, np.float32)
            self.pose = np.asarray(odom_guess, np.float32)
            return self.pose
        if imu_available and self.last_imu_transform is not None:
            rpy = np.asarray(cloud_imu_rpy, np.float32)
            # transIncre = lastImu^-1 * thisImu (rotation only)
            last = np.concatenate([self.last_imu_transform, np.zeros(3)]).astype(np.float32)
            this = np.concatenate([rpy, np.zeros(3)]).astype(np.float32)
            T_incre = np.array(
                inverse_matrix(pose6_to_matrix(jnp.asarray(last)))
                @ pose6_to_matrix(jnp.asarray(this)))
            T_new = np.array(pose6_to_matrix(jnp.asarray(self.pose))) @ T_incre
            self.pose = np.array(matrix_to_pose6(jnp.asarray(T_new)))
            self.last_imu_transform = rpy.copy()
        return self.pose

    # ------------------------------------------------------------ local map
    def _thin_poses(self, indices: np.ndarray, leaf: float) -> np.ndarray:
        """Voxel-thin a keypose index set: one representative keyframe per
        `leaf`-sized voxel, the one nearest the voxel centroid — the
        pcl::VoxelGrid pose-cloud downsample of the reference
        (surroundingKeyframeDensity, ref: src/mapOptmization.h:892;
        globalMapVisualizationPoseDensity, ref :553)."""
        if leaf <= 0 or len(indices) == 0:
            return indices
        pos = self.kf_poses[indices, 3:]
        key = np.floor(pos / leaf).astype(np.int64)
        _, inv = np.unique(key, axis=0, return_inverse=True)
        cent = np.zeros((inv.max() + 1, 3))
        np.add.at(cent, inv, pos)
        cent /= np.bincount(inv)[:, None]
        d2c = np.linalg.norm(pos - cent[inv], axis=1)
        order = np.lexsort((d2c, inv))
        first = np.ones(len(order), bool)
        first[1:] = inv[order][1:] != inv[order][:-1]
        return np.sort(indices[order[first]])

    def _surrounding_map(self) -> Optional[FeatureMap]:
        """extractSurroundingKeyFrames (ref :857-978): keyframes within the
        search radius of the last pose (density-thinned, ref :892) + all
        from the most recent 10 s."""
        p = self.params
        n = self.n_keyframes
        if n == 0:
            return None
        sel = np.zeros(self.max_keyframes, bool)
        last_pos = self.kf_poses[n - 1, 3:]
        d = np.linalg.norm(self.kf_poses[:n, 3:] - last_pos, axis=1)
        near = np.where(d < p.surrounding_keyframe_search_radius)[0]
        sel[self._thin_poses(near, p.surrounding_keyframe_density)] = True
        recent = self.kf_times[:n] > self.kf_times[n - 1] - 10.0
        sel[:n] |= recent
        kc, kcm, ks, ksm = self._device_clouds()
        return _build_local_map(
            kc, kcm, ks, ksm,
            jnp.asarray(self.kf_poses), jnp.asarray(sel),
            jnp.float32(p.mapping_corner_leaf_size),
            jnp.float32(p.mapping_surf_leaf_size),
            map_corner_cap=p.map_corner_cap, map_surf_cap=p.map_surf_cap)

    def _device_clouds(self):
        """Device-resident keyframe cloud buffers (lazy full upload, then
        one-slot incremental updates)."""
        if self._dev_clouds is None:
            self._dev_clouds = (
                jnp.asarray(self.kf_corner), jnp.asarray(self.kf_corner_mask),
                jnp.asarray(self.kf_surf), jnp.asarray(self.kf_surf_mask))
        return self._dev_clouds

    # ------------------------------------------------------------ keyframes
    def _is_keyframe(self) -> bool:
        """saveFrame (ref :1491-1514)."""
        p = self.params
        if self.n_keyframes == 0:
            return True
        last = self.kf_poses[self.n_keyframes - 1]
        T_rel = np.array(matrix_to_pose6(
            inverse_matrix(pose6_to_matrix(jnp.asarray(last)))
            @ pose6_to_matrix(jnp.asarray(self.pose))))
        if (np.abs(T_rel[0]) < p.surrounding_keyframe_adding_angle_threshold
                and np.abs(T_rel[1]) < p.surrounding_keyframe_adding_angle_threshold
                and np.abs(T_rel[2]) < p.surrounding_keyframe_adding_angle_threshold
                and np.linalg.norm(T_rel[3:]) < p.surrounding_keyframe_adding_dist_threshold):
            return False
        return True

    def add_gps(self, time: float, xyz, cov3):
        """gpsHandler (ref :391-394) — queue a GPS odometry sample."""
        self.gps_queue.append((time, np.asarray(xyz, np.float64),
                               np.asarray(cov3, np.float64)))

    def _add_gps_factor(self, scan_time: float):
        """addGPSFactor gating (ref :1543-1634)."""
        p = self.params
        n = self.n_keyframes
        if not self.gps_queue or n == 0:
            return
        if np.linalg.norm(self.kf_poses[0, 3:] - self.kf_poses[n - 1, 3:]) < 5.0:
            return
        # poseCovThreshold gate (ref :1596-1599): inject GPS only once the
        # pose estimate has drifted uncertain — poseCovariance(3,3)/(4,4) are
        # the x/y variances of the latest keyframe's marginal
        if (self.pose_cov[3, 3] < p.pose_cov_threshold
                and self.pose_cov[4, 4] < p.pose_cov_threshold):
            return
        while self.gps_queue:
            t, xyz, cov = self.gps_queue[0]
            if t < scan_time - 0.2:
                self.gps_queue.pop(0)
            elif t > scan_time + 0.2:
                break
            else:
                self.gps_queue.pop(0)
                noise = cov.copy()
                if noise[0] > p.gps_cov_threshold or noise[1] > p.gps_cov_threshold:
                    continue
                gps_xyz = xyz.copy()
                if not p.use_gps_elevation:
                    gps_xyz[2] = self.pose[5]
                    noise[2] = 0.01
                if abs(gps_xyz[0]) < 1e-6 and abs(gps_xyz[1]) < 1e-6:
                    continue
                if np.linalg.norm(gps_xyz - self.last_gps_point) < 5.0:
                    continue
                self.last_gps_point = gps_xyz.copy()
                sigma = np.sqrt(np.maximum(noise, 1.0)).astype(np.float32)
                self.gps_factors.append((n, gps_xyz.astype(np.float32), sigma))
                self.a_loop_is_closed = True
                self._log.info("mapping/gps_factor", time=scan_time,
                               keyframe=n, xyz=gps_xyz, sigma=sigma)
                break

    def _evict_oldest(self, count: int):
        """Bounded keyframe storage: marginalize the oldest `count` keyframes
        into the root prior and evict their clouds.

        The reference grows cloudKeyPoses*/cornerCloudKeyFrames unboundedly
        (src/mapOptmization.h:1676-1726); a production run needs a policy.
        Keeping shapes FIXED (rather than growing arrays) avoids the jax-0.9
        TPU executable-cache hazard (docs/ROUND_NOTES.md) and keeps
        per-keyframe latency flat.  The evicted segment's information is
        absorbed into a prior on the new root pose whose sigma comes from
        that pose's full-graph marginal — the same marginalization trick the
        reference applies at its key==100 preintegration reset
        (src/imuPreintegration.cpp:234-267).  Loop/GPS factors touching
        evicted poses are dropped (logged); their net effect on surviving
        poses persists through the marginal prior + the corrected estimates.
        """
        from ..graph.pose_graph import pose_marginal_covariances

        n = self.n_keyframes
        count = min(count, n - self.opt_window)   # never evict the window
        if count <= 0:
            return
        g = self._graph_data()
        cov = pose_marginal_covariances(g, self.kf_poses, [count],
                                        active=n)[0]
        sigma = np.sqrt(np.maximum(np.diag(cov), 1e-12)).astype(np.float32)
        self.prior_factor = (0, self.kf_poses[count].copy(), sigma)

        m = n - count
        for arr in (self.kf_corner, self.kf_surf, self.kf_poses,
                    self.kf_times, self.odom_meas):
            arr[:m] = arr[count:n]
            arr[m:n] = 0
        for arr in (self.kf_corner_mask, self.kf_surf_mask):
            arr[:m] = arr[count:n]
            arr[m:n] = False
        self.odom_sigma[:m] = self.odom_sigma[count:n]
        self.odom_sigma[m:n] = 1.0
        self.odom_meas[0] = 0.0   # chain entry 0 (root has no predecessor)
        self.odom_sigma[0] = 1.0

        dropped = sum(1 for (i, j, *_ ) in self.loop_factors
                      if i < count or j < count)
        dropped += sum(1 for (i, *_ ) in self.gps_factors if i < count)
        if dropped:
            self._log.warn("mapping/evict_dropped_factors", dropped=dropped,
                           evicted=count)
        self.loop_factors = [(i - count, j - count, m_, s_)
                             for (i, j, m_, s_) in self.loop_factors
                             if i >= count and j >= count]
        self.gps_factors = [(i - count, m_, s_)
                            for (i, m_, s_) in self.gps_factors
                            if i >= count]
        self.n_keyframes = m
        self._dev_clouds = None   # mirror stale after the shift; re-upload
        self._log.info("mapping/evict", evicted=count, remaining=m)

    def _save_keyframe(self, feats: ScanFeatures, scan_time: float):
        """saveKeyFramesAndFactor (ref :1637-1733)."""
        if self.n_keyframes >= self.max_keyframes:
            self._evict_oldest(max(1, self.max_keyframes // 8))
            if self.n_keyframes >= self.max_keyframes:
                raise RuntimeError(
                    "keyframe capacity exceeded and opt_window too large to "
                    "evict; raise max_keyframes or shrink opt_window")
        n = self.n_keyframes
        # odom factor (ref :1517-1541)
        if n == 0:
            prior_sigma = np.sqrt(np.array(
                [1e-2, 1e-2, np.pi ** 2, 1e8, 1e8, 1e8], np.float32))
            self.prior_factor = (0, self.pose.copy(), prior_sigma)
        else:
            last = self.kf_poses[n - 1]
            rel = np.array(matrix_to_pose6(
                inverse_matrix(pose6_to_matrix(jnp.asarray(last)))
                @ pose6_to_matrix(jnp.asarray(self.pose))))
            sigma = np.sqrt(np.array([1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4],
                                     np.float32))
            self.odom_meas[n] = rel.astype(np.float32)
            self.odom_sigma[n] = sigma
        self._add_gps_factor(scan_time)

        # store keyframe cloud snapshot (lidar frame, downsampled)
        def take(x, m, cap):
            xx = np.asarray(x)[np.asarray(m)][:cap]
            buf = np.zeros((cap, 3), np.float32)
            msk = np.zeros(cap, bool)
            buf[: len(xx)] = xx
            msk[: len(xx)] = True
            return buf, msk

        self.kf_corner[n], self.kf_corner_mask[n] = take(
            feats.corner_xyz, feats.corner_mask, self.kf_corner_cap)
        self.kf_surf[n], self.kf_surf_mask[n] = take(
            feats.surf_xyz, feats.surf_mask, self.kf_surf_cap)
        self.kf_poses[n] = self.pose
        self.kf_times[n] = scan_time
        self.n_keyframes = n + 1
        # incremental one-slot update of the device mirror
        self._dev_clouds = _dev_update_kf_slot(
            *self._device_clouds(), n,
            jnp.asarray(self.kf_corner[n]),
            jnp.asarray(self.kf_corner_mask[n]),
            jnp.asarray(self.kf_surf[n]),
            jnp.asarray(self.kf_surf_mask[n]))

        # factor-graph update (iSAM2 -> windowed LM)
        self._optimize_graph()

    def _graph_data(self) -> PoseGraphData:
        """Full graph (every keyframe + every factor), factor arrays padded
        to powers of two so shapes re-jit only log-many times."""
        n = self.n_keyframes
        K = self.max_keyframes
        chain = [(j - 1, j, self.odom_meas[j], self.odom_sigma[j])
                 for j in range(1, n)]
        loops = self.loop_factors

        # FIXED factor capacities: the full-graph solve must compile
        # exactly once per process — growing shapes would trigger repeat
        # same-function compiles, the jax-0.9 executable-cache TPU hazard
        # (docs/ROUND_NOTES.md).  The odometry chain is NEVER dropped:
        # severing it would disconnect later poses from the gauge prior and
        # silently degrade the solve.  Only loop factors overflow, oldest
        # first, with a warning.  len(chain) = n-1 < K <= Fb always holds.
        Fb = K + self.loop_factor_cap
        Fg = self.gps_factor_cap
        if len(chain) + len(loops) > Fb:
            keep = Fb - len(chain)
            self._log.warn("mapping/factor_overflow", kind="loop",
                           dropped=len(loops) - keep)
            loops = loops[len(loops) - keep:]
        btw = chain + loops
        gps_factors = self.gps_factors
        if len(gps_factors) > Fg:
            self._log.warn("mapping/factor_overflow", kind="gps",
                           dropped=len(gps_factors) - Fg)
            gps_factors = gps_factors[len(gps_factors) - Fg:]
        g = PoseGraphData.empty(K, Fp=1, Fb=Fb, Fg=Fg)
        poses = jnp.asarray(self.kf_poses)
        mask = np.zeros(K, bool)
        mask[:n] = True
        upd = dict(poses=poses, pose_mask=jnp.asarray(mask))
        if self.prior_factor is not None:
            i, meas, sigma = self.prior_factor
            upd.update(prior_idx=jnp.asarray([i], jnp.int32),
                       prior_meas=jnp.asarray(meas[None]),
                       prior_sigma=jnp.asarray(sigma[None]),
                       prior_mask=jnp.asarray([True]))
        if btw:
            bi = np.zeros(Fb, np.int32)
            bj = np.zeros(Fb, np.int32)
            bm = np.zeros((Fb, 6), np.float32)
            bs = np.ones((Fb, 6), np.float32)
            bmask = np.zeros(Fb, bool)
            for f, (i, j, m, s) in enumerate(btw):
                bi[f], bj[f], bm[f], bs[f], bmask[f] = i, j, m, s, True
            upd.update(btw_i=jnp.asarray(bi), btw_j=jnp.asarray(bj),
                       btw_meas=jnp.asarray(bm), btw_sigma=jnp.asarray(bs),
                       btw_mask=jnp.asarray(bmask))
        if gps_factors:
            gi = np.zeros(Fg, np.int32)
            gm = np.zeros((Fg, 3), np.float32)
            gs = np.ones((Fg, 3), np.float32)
            gmask = np.zeros(Fg, bool)
            for f, (i, m, s) in enumerate(gps_factors):
                gi[f], gm[f], gs[f], gmask[f] = i, m, s, True
            upd.update(gps_idx=jnp.asarray(gi), gps_meas=jnp.asarray(gm),
                       gps_sigma=jnp.asarray(gs), gps_mask=jnp.asarray(gmask))
        return g._replace(**upd)

    def _window_graph_data(self) -> tuple:
        """Trailing-window graph with FIXED shapes (one jit, flat cost).

        Poses older than the window are marginalized the way the reference's
        key==100 reset marginalizes the preintegration chain (ref:
        src/imuPreintegration.cpp:234-267): the boundary pose enters as a
        prior at its frozen estimate with sigma = sqrt(diag(marginal cov))
        carried from the solve in which it was last active.
        """
        n = self.n_keyframes
        W = self.opt_window
        lo = max(0, n - W)
        m = n - lo
        g = PoseGraphData.empty(W, Fp=1, Fb=W, Fg=self.window_gps_cap)
        poses = np.zeros((W, 6), np.float32)
        poses[:m] = self.kf_poses[lo:n]
        mask = np.zeros(W, bool)
        mask[:m] = True
        upd = dict(poses=jnp.asarray(poses), pose_mask=jnp.asarray(mask))
        if lo == 0 and self.prior_factor is not None:
            i, meas, sigma = self.prior_factor
        else:
            i = 0
            meas = self.kf_poses[lo].copy()
            sigma = (self.carried_prior_sigma
                     if self.carried_prior_sigma is not None
                     else np.full(6, 1e-3, np.float32))
        upd.update(prior_idx=jnp.asarray([i], jnp.int32),
                   prior_meas=jnp.asarray(np.asarray(meas, np.float32)[None]),
                   prior_sigma=jnp.asarray(np.asarray(sigma, np.float32)[None]),
                   prior_mask=jnp.asarray([True]))
        # odometry chain inside the window
        bi = np.zeros(W, np.int32)
        bj = np.zeros(W, np.int32)
        bm = np.zeros((W, 6), np.float32)
        bs = np.ones((W, 6), np.float32)
        bmask = np.zeros(W, bool)
        f = 0
        for j in range(lo + 1, n):
            bi[f], bj[f] = j - 1 - lo, j - lo
            bm[f], bs[f], bmask[f] = self.odom_meas[j], self.odom_sigma[j], True
            f += 1
        upd.update(btw_i=jnp.asarray(bi), btw_j=jnp.asarray(bj),
                   btw_meas=jnp.asarray(bm), btw_sigma=jnp.asarray(bs),
                   btw_mask=jnp.asarray(bmask))
        # most recent in-window GPS factors
        gi = np.zeros(self.window_gps_cap, np.int32)
        gm = np.zeros((self.window_gps_cap, 3), np.float32)
        gs = np.ones((self.window_gps_cap, 3), np.float32)
        gmask = np.zeros(self.window_gps_cap, bool)
        in_win = [fct for fct in self.gps_factors if fct[0] >= lo]
        for f, (i_, m_, s_) in enumerate(in_win[-self.window_gps_cap:]):
            gi[f], gm[f], gs[f], gmask[f] = i_ - lo, m_, s_, True
        upd.update(gps_idx=jnp.asarray(gi), gps_meas=jnp.asarray(gm),
                   gps_sigma=jnp.asarray(gs), gps_mask=jnp.asarray(gmask))
        return g._replace(**upd), lo

    def _optimize_graph(self, iterations: int = 8):
        """iSAM2 update equivalent (ref :1658-1669).

        Steady state runs LM over the trailing window only — O(W^3) per
        keyframe, shapes fixed, one compiled executable.  Loop/GPS closures
        (a_loop_is_closed) re-solve the FULL graph, which is exactly when the
        reference calls extra isam updates + correctPoses (ref :1663-1669,
        :1735-1770).  Loop factors reaching outside the window only ever
        arrive through that full path.
        """
        from ..graph.pose_graph import pose_marginal_covariances

        def carry_sigma(cov):
            return np.sqrt(np.maximum(np.diag(cov), 1e-12)).astype(np.float32)

        n = self.n_keyframes
        closed = self.a_loop_is_closed
        if closed:
            g = self._graph_data()
            # iterations pinned: full-graph solves must reuse ONE compiled
            # executable (iterations is a trace-time constant)
            poses, _ = optimize_pose_graph(g, iterations=12)
            poses = np.array(poses)
            self.kf_poses[:n] = poses[:n]
            g = g._replace(poses=jnp.asarray(self.kf_poses))
            # the NEXT keyframe's window starts at max(0, n+1-W): carry
            # that boundary pose's marginal; both marginals share one
            # host factorization, restricted to the n active poses
            lo_next = max(0, n + 1 - self.opt_window)
            idxs = [n - 1] + ([lo_next] if lo_next > 0 else [])
            covs = pose_marginal_covariances(g, self.kf_poses, idxs,
                                             active=n)
            self.pose_cov = covs[0]
            if lo_next > 0:
                self.carried_prior_sigma = carry_sigma(covs[1])
            # correctPoses (ref :1735-1770): all keyposes rewritten above;
            # bump the reset id so IMU preintegration re-initializes.
            self.reset_id += 1
            self.a_loop_is_closed = False
        else:
            g, lo = self._window_graph_data()
            poses, _ = optimize_pose_graph(g, iterations=iterations)
            poses = np.array(poses)
            m = n - lo
            self.kf_poses[lo:n] = poses[:m]
            win_poses = np.zeros_like(poses)
            win_poses[:m] = self.kf_poses[lo:n]
            g = g._replace(poses=jnp.asarray(win_poses))
            # window full: the oldest pose leaves next keyframe — carry its
            # marginal as the next boundary prior (one factorization)
            idxs = [m - 1] + ([1] if m == self.opt_window else [])
            covs = pose_marginal_covariances(g, win_poses, idxs, active=m)
            self.pose_cov = covs[0]
            if m == self.opt_window:
                self.carried_prior_sigma = carry_sigma(covs[1])
        self.pose = self.kf_poses[n - 1].copy()

    # ---------------------------------------------------------- loop closure
    def maybe_close_loop(self, scan_time: float) -> bool:
        """detectLoopClosure + performLoopClosure (ref :582-782)."""
        p = self.params
        n = self.n_keyframes
        if not p.loop_closure_enable_flag or n < 2:
            return False
        cur = n - 1
        d = np.linalg.norm(self.kf_poses[:n, 3:] - self.kf_poses[cur, 3:],
                           axis=1)
        cand_mask = ((d < p.history_keyframe_search_radius)
                     & (np.abs(self.kf_times[:n] - scan_time)
                        > p.history_keyframe_search_time_diff))
        if not cand_mask.any():
            return False
        # the reference walks the KD radius search in distance order and takes
        # the first time-gated hit — i.e. the NEAREST candidate (ref :627-640)
        closest = int(np.where(cand_mask, d, np.inf).argmin())
        if closest == cur:
            return False

        # submap: +-history_keyframe_search_num around the candidate
        lo = max(0, closest - p.history_keyframe_search_num)
        hi = min(n, closest + p.history_keyframe_search_num + 1)

        def world_cloud(indices, cap, leaf=None):
            pts = []
            for k in indices:
                T = np.array(pose6_to_matrix(jnp.asarray(self.kf_poses[k])))
                for cl, m in ((self.kf_corner[k], self.kf_corner_mask[k]),
                              (self.kf_surf[k], self.kf_surf_mask[k])):
                    q = cl[m]
                    pts.append(q @ T[:3, :3].T + T[:3, 3])
            pts = np.concatenate(pts) if pts else np.zeros((0, 3), np.float32)
            if leaf is not None and len(pts):
                # downSizeFilterICP pass on the submap (ref :699-703, leaf =
                # mappingSurfLeafSize, ref :192)
                from .. import native

                pts = native.voxel_downsample(pts.astype(np.float32), leaf)
            buf = np.zeros((cap, 3), np.float32)
            msk = np.zeros(cap, bool)
            m = min(len(pts), cap)
            buf[:m] = pts[:m]
            msk[:m] = True
            return buf, msk

        src, src_m = world_cloud([cur], self.loop_submap_cap // 4)
        dst, dst_m = world_cloud(range(lo, hi), self.loop_submap_cap,
                                 leaf=p.mapping_surf_leaf_size)

        res = icp_align(jnp.asarray(src), jnp.asarray(src_m),
                        jnp.asarray(dst), jnp.asarray(dst_m),
                        max_corr_dist=100.0, max_iterations=100)
        if not bool(res.converged) or float(res.fitness) > \
                p.history_keyframe_fitness_score:
            return False

        # corrected current pose = icp_transform * wrong_pose (ref :739)
        T_corr = np.array(res.transform) @ np.array(
            pose6_to_matrix(jnp.asarray(self.kf_poses[cur])))
        pose_corr = np.array(matrix_to_pose6(jnp.asarray(T_corr)))
        rel = np.array(matrix_to_pose6(
            inverse_matrix(pose6_to_matrix(jnp.asarray(pose_corr)))
            @ pose6_to_matrix(jnp.asarray(self.kf_poses[closest]))))
        sigma = np.full(6, np.sqrt(max(float(res.fitness), 1e-6)), np.float32)
        # BetweenFactor(cur, closest) with fitness noise (ref :743-758)
        self.loop_factors.append((cur, closest, rel.astype(np.float32), sigma))
        self.a_loop_is_closed = True
        self._optimize_graph()
        self._log.info("mapping/loop_closure", time=scan_time, cur=cur,
                       closest=closest, fitness=float(res.fitness),
                       reset_id=self.reset_id)
        return True

    # ----------------------------------------------------------------- step
    def step(self, scan: RawScan, timestamp: float,
             deskew_info: Optional[DeskewInfo] = None):
        """laserCloudInfoHandler (ref :346-389)."""
        p = self.params
        if timestamp - self.time_last_processing < p.mapping_process_interval:
            return self.pose
        self.time_last_processing = timestamp

        cloud, feats = process_scan(p, scan, deskew_info)

        if deskew_info is not None:
            imu_rpy = np.array(deskew_info.imu_rpy_init)
            imu_avail = bool(deskew_info.imu_available)
            odom_avail = bool(deskew_info.odom_available)
            odom_guess = np.array(deskew_info.initial_guess)
            odom_rid = int(deskew_info.reset_id)
        else:
            imu_rpy = np.zeros(3, np.float32)
            imu_avail = odom_avail = False
            odom_guess = np.zeros(6, np.float32)
            odom_rid = self.reset_id

        self._initial_guess(imu_rpy, imu_avail, odom_avail, odom_guess,
                            odom_rid)

        local_map = self._surrounding_map()
        if local_map is not None:
            from ..ops.register import grid_register_step
            res = grid_register_step(
                local_map, feats, jnp.asarray(self.pose),
                half_extent=tuple(p.register_grid_half_extent),
                max_iterations=p.max_gn_iterations,
                min_correspondences=p.min_correspondences,
                edge_min_valid=p.edge_feature_min_valid_num,
                surf_min_valid=p.surf_feature_min_valid_num,
                min_plane_spread=p.surf_min_planar_spread,
            )
            pose = transform_update(
                res.pose6, jnp.asarray(imu_rpy), jnp.asarray(imu_avail),
                imu_weight=p.imu_attitude_weight,
                rotation_tolerance=p.rotation_tolerance,
                z_tolerance=p.z_tolerance)
            self.pose = np.array(jnp.where(res.valid, pose, res.pose6))
            # publishOdometry analog (ref :1791-1848): the event stream
            # carries what the reference puts on its publishers
            self._log.event(
                "mapping/odometry",
                level="info" if bool(res.valid) else "warn",
                time=timestamp, pose=self.pose,
                n_corr=res.n_corr, iterations=res.iterations,
                converged=res.converged, degenerate=res.is_degenerate,
                gate_valid=res.valid, reset_id=self.reset_id)

        if self._is_keyframe():
            self._save_keyframe(feats, timestamp)
            self._log.info("mapping/keyframe", time=timestamp,
                           index=self.n_keyframes - 1, pose=self.pose)
            if p.loop_closure_enable_flag:
                self.maybe_close_loop(timestamp)

        self.trajectory.append(self.pose.copy())
        return self.pose

    # -------------------------------------------------------- visualization
    def global_map_snapshot(self, radius: float | None = None,
                            leaf: float | None = None):
        """Radius-filtered, downsampled global feature map snapshot —
        publishGlobalMap's payload as a NumPy array (ref: src/mapOptmization.h:
        524-569; the ROS publisher becomes a return value)."""
        p = self.params
        radius = radius or p.global_map_visualization_search_radius
        leaf = leaf or p.global_map_visualization_leaf_size
        n = self.n_keyframes
        if n == 0:
            return np.zeros((0, 3), np.float32)
        last = self.kf_poses[n - 1, 3:]
        sel = np.linalg.norm(self.kf_poses[:n, 3:] - last, axis=1) < radius
        # globalMapVisualizationPoseDensity keypose thinning (ref :553)
        keep = self._thin_poses(np.where(sel)[0],
                                p.global_map_visualization_pose_density)
        pts = []
        for k in keep:
            T = np.array(pose6_to_matrix(jnp.asarray(self.kf_poses[k])))
            for cl, m in ((self.kf_corner[k], self.kf_corner_mask[k]),
                          (self.kf_surf[k], self.kf_surf_mask[k])):
                q = cl[m]
                pts.append(q @ T[:3, :3].T + T[:3, 3])
        if not pts:
            return np.zeros((0, 3), np.float32)
        from .. import native

        return native.voxel_downsample(
            np.concatenate(pts).astype(np.float32), leaf)

    # ------------------------------------------------------------- map save
    def save_map(self, directory: str):
        """PCD checkpoint like visualizeGlobalMapThread's shutdown save
        (ref :485-521): trajectory, transformations, corner/surf/global."""
        from ..io.pcd import write_pcd

        os.makedirs(directory, exist_ok=True)
        n = self.n_keyframes
        write_pcd(os.path.join(directory, "trajectory.pcd"), {
            "x": self.kf_poses[:n, 3], "y": self.kf_poses[:n, 4],
            "z": self.kf_poses[:n, 5],
            "intensity": np.arange(n, dtype=np.float32)})
        write_pcd(os.path.join(directory, "transformations.pcd"), {
            "x": self.kf_poses[:n, 3], "y": self.kf_poses[:n, 4],
            "z": self.kf_poses[:n, 5],
            "intensity": np.arange(n, dtype=np.float32),
            "roll": self.kf_poses[:n, 0], "pitch": self.kf_poses[:n, 1],
            "yaw": self.kf_poses[:n, 2],
            "time": self.kf_times[:n]})

        def global_cloud(clouds, masks):
            pts = []
            for k in range(n):
                T = np.array(pose6_to_matrix(jnp.asarray(self.kf_poses[k])))
                q = clouds[k][masks[k]]
                pts.append(q @ T[:3, :3].T + T[:3, 3])
            return (np.concatenate(pts) if pts
                    else np.zeros((0, 3), np.float32))

        corner = global_cloud(self.kf_corner, self.kf_corner_mask)
        surf = global_cloud(self.kf_surf, self.kf_surf_mask)
        for name, pts in (("cloudCorner.pcd", corner), ("cloudSurf.pcd", surf),
                          ("cloudGlobal.pcd", np.concatenate([corner, surf]))):
            write_pcd(os.path.join(directory, name), {
                "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                "intensity": np.zeros(len(pts), np.float32)})

        # per-keyframe feature clouds (lidar frame) — beyond the reference's
        # aggregate PCDs; lets multi-session merging re-render the map after
        # per-keyframe pose corrections (pipeline/multisession.py)
        np.savez_compressed(
            os.path.join(directory, "keyframes.npz"),
            poses=self.kf_poses[:n], times=self.kf_times[:n],
            corner=self.kf_corner[:n], corner_mask=self.kf_corner_mask[:n],
            surf=self.kf_surf[:n], surf_mask=self.kf_surf_mask[:n])
