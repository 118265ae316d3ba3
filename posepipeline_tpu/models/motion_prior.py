"""Test-time motion-prior fitting (the HuMoR slot), as an optax program.

Reference: wrappers/humor.py:83-314 — a 3-stage L-BFGS optimization fitting
SMPL translation/orientation/pose/shape (+ latent motion) to 2D keypoint
evidence over sliding 60-frame windows with 10-frame overlap, stitched with an
overlap-consistency loss.

TPU-native redesign: the whole sequence is optimized **jointly** in one jitted
optax (Adam) program — no Python window loop; the temporal-smoothness and
prior terms play the motion-model role, and window stitching disappears
because the sequence is one tensor. The output contract matches the reference
HumorPerson table fields (pipeline.py:1877-1918).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .smpl_body import BodyModel, rodrigues

# BODY_25 → SMPL-24 correspondences (openpose joint → smpl joint) usable for
# a reprojection data term: pairs of (body25_idx, smpl_idx)
_B25_TO_SMPL = [
    (0, 15),   # nose ~ head
    (1, 12),   # sternum/neck
    (2, 17), (3, 19), (4, 21),    # right arm
    (5, 16), (6, 18), (7, 20),    # left arm
    (8, 0),                        # pelvis
    (9, 2), (10, 5), (11, 8),     # right leg
    (12, 1), (13, 4), (14, 7),    # left leg
]


def _camera_project(joints, width, height):
    """Fixed-intrinsics pinhole-ish projection into pixels (y-down)."""
    f = height  # focal ~ image height
    z = joints[..., 2] + 4.0  # camera 4m back
    x = joints[..., 0] * f / z + width / 2
    y = -joints[..., 1] * f / z + height * 0.95
    return jnp.stack([x, y], axis=-1)


@functools.partial(jax.jit, static_argnames=("body", "width", "height", "steps"))
def _optimize(body: BodyModel, kp2d, conf, width: int, height: int, steps: int = 150):
    T = kp2d.shape[0]
    b25_idx = jnp.asarray([p[0] for p in _B25_TO_SMPL])
    smpl_idx = jnp.asarray([p[1] for p in _B25_TO_SMPL])

    params = dict(
        trans=jnp.zeros((T, 3)),
        root_orient=jnp.zeros((T, 3)),
        pose_body=jnp.zeros((T, 23, 3)),
        betas=jnp.zeros((10,)),
    )

    def loss_fn(p):
        pose = jnp.concatenate([p["root_orient"][:, None], p["pose_body"]], axis=1)
        R = rodrigues(pose)
        verts, joints = body._forward(jnp.tile(p["betas"][None], (T, 1)), R, p["trans"])
        proj = _camera_project(joints[:, smpl_idx], width, height)
        target = kp2d[:, b25_idx]
        w = conf[:, b25_idx]
        data = jnp.sum(w * jnp.sum((proj - target) ** 2, -1)) / (jnp.sum(w) + 1e-6)
        # motion prior: velocity + acceleration smoothness (plays the role of
        # the learned HuMoR dynamics at test time)
        vel = jnp.diff(joints, axis=0)
        acc = jnp.diff(vel, axis=0)
        smooth = jnp.mean(vel**2) * 10.0 + jnp.mean(acc**2) * 100.0
        pose_prior = jnp.mean(p["pose_body"] ** 2) * 1.0
        shape_prior = jnp.mean(p["betas"] ** 2) * 0.1
        return data / (height**2) * 1e4 + smooth + pose_prior + shape_prior

    opt = optax.adam(5e-2)
    state = opt.init(params)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, state), None, length=steps)
    pose = jnp.concatenate([params["root_orient"][:, None], params["pose_body"]], axis=1)
    verts, joints = body._forward(jnp.tile(params["betas"][None], (T, 1)),
                                  rodrigues(pose), params["trans"])
    return params, verts, joints, losses


def fit_motion(keypoints_body25: np.ndarray, width: int, height: int,
               steps: int = 150) -> Dict[str, np.ndarray]:
    """Fit an SMPL trajectory to BODY_25 keypoints; returns HumorPerson fields."""
    body = BodyModel()
    kp = np.nan_to_num(np.asarray(keypoints_body25, np.float32))
    kp2d = jnp.asarray(kp[..., :2])
    conf = jnp.asarray(kp[..., 2])
    params, verts, joints, losses = _optimize(body, kp2d, conf, int(width), int(height),
                                              steps=steps)
    T = kp.shape[0]
    return dict(
        trans=np.asarray(params["trans"]),
        root_orient=np.asarray(params["root_orient"]),
        pose_body=np.asarray(params["pose_body"]).reshape(T, -1),
        betas=np.asarray(params["betas"]),
        latent_pose=np.zeros((T, 32), np.float32),    # latent slots kept for contract
        latent_motion=np.zeros((T - 1, 48), np.float32),
        floor_plane=np.array([0.0, 1.0, 0.0, 0.0], np.float32),
        contacts=np.zeros((T, 9), np.float32),
        vertices=np.asarray(verts, np.float32),
        faces=np.zeros((0, 3), np.int32),
    )
