"""Vectorized constant-velocity Kalman filter over a fixed bank of track slots.

The reference vendors DeepSORT's per-track Python Kalman filter
(wrappers/deep_sort_yolov4/deep_sort/kalman_filter.py:14-217, one 8-dim filter
object per track, updated in Python loops). Here the filter is **batched over
all K track slots at once** as pure numpy linear algebra (the host side of the
tracking loop; detection/embedding stay on the TPU), with the same state
convention:

    state x = (cx, cy, a, h, vcx, vcy, va, vh)   a = aspect ratio w/h

Process/measurement noise follows the DeepSORT convention of scaling with box
height. Gating uses the squared Mahalanobis distance against the chi-square
95% quantile for 4 DoF.
"""

from __future__ import annotations

import numpy as np

CHI2_95_4DOF = 9.4877

_STD_WEIGHT_POS = 1.0 / 20
_STD_WEIGHT_VEL = 1.0 / 160


def _motion_matrices(dt: float = 1.0):
    F = np.eye(8)
    F[:4, 4:] = np.eye(4) * dt
    H = np.eye(4, 8)
    return F, H


class KalmanBank:
    """K independent constant-velocity filters, vectorized.

    All methods take/return arrays over the full bank; inactive slots are
    simply ignored by the caller's masks.
    """

    def __init__(self, num_slots: int):
        self.K = num_slots
        self.mean = np.zeros((num_slots, 8))
        self.cov = np.tile(np.eye(8)[None], (num_slots, 1, 1))
        self._F, self._H = _motion_matrices()

    @staticmethod
    def tlhw_to_xyah(tlhw: np.ndarray) -> np.ndarray:
        tlhw = np.asarray(tlhw, float)
        cx = tlhw[..., 0] + tlhw[..., 2] / 2
        cy = tlhw[..., 1] + tlhw[..., 3] / 2
        a = tlhw[..., 2] / np.maximum(tlhw[..., 3], 1e-6)
        return np.stack([cx, cy, a, tlhw[..., 3]], axis=-1)

    @staticmethod
    def xyah_to_tlhw(xyah: np.ndarray) -> np.ndarray:
        xyah = np.asarray(xyah, float)
        w = xyah[..., 2] * xyah[..., 3]
        h = xyah[..., 3]
        return np.stack([xyah[..., 0] - w / 2, xyah[..., 1] - h / 2, w, h], axis=-1)

    def initiate(self, slots: np.ndarray, measurements_xyah: np.ndarray) -> None:
        """Start new tracks in ``slots`` (int indices) from measurements."""
        if len(slots) == 0:
            return
        m = measurements_xyah
        self.mean[slots, :4] = m
        self.mean[slots, 4:] = 0.0
        h = m[:, 3]
        std = np.stack([
            2 * _STD_WEIGHT_POS * h, 2 * _STD_WEIGHT_POS * h,
            1e-2 * np.ones_like(h), 2 * _STD_WEIGHT_POS * h,
            10 * _STD_WEIGHT_VEL * h, 10 * _STD_WEIGHT_VEL * h,
            1e-5 * np.ones_like(h), 10 * _STD_WEIGHT_VEL * h,
        ], axis=-1)
        self.cov[slots] = np.einsum("ki,ij->kij", std**2, np.eye(8))

    def predict(self, active: np.ndarray) -> None:
        """Advance all ``active`` slots one step."""
        idx = np.flatnonzero(active)
        if idx.size == 0:
            return
        mean = self.mean[idx]
        h = np.maximum(mean[:, 3], 1e-3)
        std_pos = np.stack([_STD_WEIGHT_POS * h] * 2 + [1e-2 * np.ones_like(h)]
                           + [_STD_WEIGHT_POS * h], axis=-1)
        std_vel = np.stack([_STD_WEIGHT_VEL * h] * 2 + [1e-5 * np.ones_like(h)]
                           + [_STD_WEIGHT_VEL * h], axis=-1)
        Q = np.zeros((idx.size, 8, 8))
        diag = np.concatenate([std_pos, std_vel], axis=-1) ** 2
        Q[:, np.arange(8), np.arange(8)] = diag
        self.mean[idx] = mean @ self._F.T
        self.cov[idx] = self._F @ self.cov[idx] @ self._F.T + Q

    def project(self, idx: np.ndarray):
        """Project slots to measurement space → (proj_mean (n,4), proj_cov (n,4,4))."""
        mean = self.mean[idx]
        h = np.maximum(mean[:, 3], 1e-3)
        std = np.stack([_STD_WEIGHT_POS * h, _STD_WEIGHT_POS * h,
                        1e-1 * np.ones_like(h), _STD_WEIGHT_POS * h], axis=-1)
        R = np.zeros((idx.size, 4, 4))
        R[:, np.arange(4), np.arange(4)] = std**2
        pm = mean @ self._H.T
        pc = self._H @ self.cov[idx] @ self._H.T + R
        return pm, pc

    def update(self, slots: np.ndarray, measurements_xyah: np.ndarray) -> None:
        """Kalman correction for matched (slot, measurement) pairs."""
        if len(slots) == 0:
            return
        idx = np.asarray(slots)
        pm, pc = self.project(idx)
        K_gain = np.linalg.solve(
            pc.transpose(0, 2, 1),
            (self.cov[idx] @ self._H.T).transpose(0, 2, 1)).transpose(0, 2, 1)
        innovation = measurements_xyah - pm
        self.mean[idx] = self.mean[idx] + np.einsum("kij,kj->ki", K_gain, innovation)
        self.cov[idx] = self.cov[idx] - K_gain @ pc @ K_gain.transpose(0, 2, 1)

    def gating_distance(self, idx: np.ndarray, measurements_xyah: np.ndarray) -> np.ndarray:
        """Squared Mahalanobis distance (n_tracks, n_dets)."""
        if idx.size == 0 or len(measurements_xyah) == 0:
            return np.zeros((idx.size, len(measurements_xyah)))
        pm, pc = self.project(idx)
        d = measurements_xyah[None, :, :] - pm[:, None, :]      # (n, m, 4)
        sol = np.linalg.solve(pc[:, None], d[..., None])[..., 0]
        return np.sum(d * sol, axis=-1)

    def tlhw(self, idx: np.ndarray) -> np.ndarray:
        return self.xyah_to_tlhw(self.mean[idx, :4])
