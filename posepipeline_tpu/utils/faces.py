"""Alternative privacy path: detected-face gaussian blur.

Reference: wrappers/facenet.py:9-71 — MTCNN face detection → gaussian blur of
each face box (the alternative to BlurredVideo's keypoint-derived white
circles). Here faces derive from available pose keypoints (eyes/ears/nose
span) and the blur is a device program; a standalone ``blur_faces_gaussian``
works on raw frame arrays for library use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def gaussian_blur_regions(frames, centers, radii, valid=None, sigma_frac: float = 0.5):
    """Blur circular regions instead of masking them white.

    frames (B, H, W, 3) uint8; centers (B, P, 2) xy; radii (B, P).
    A fixed 9×9 separable blur is applied to the whole frame and composited
    inside the face circles (one fused program; no per-face host loops).
    """
    B, H, W, C = frames.shape
    x = frames.astype(jnp.float32)
    k = jnp.asarray([1, 8, 28, 56, 70, 56, 28, 8, 1], jnp.float32)
    k = k / k.sum()
    dn = ("NHWC", "HWIO", "NHWC")
    # depthwise kernels: HWIO with I=1, O=C and feature_group_count=C
    kv = jnp.tile(k.reshape(9, 1, 1, 1), (1, 1, 1, C))
    kh = jnp.tile(k.reshape(1, 9, 1, 1), (1, 1, 1, C))
    blurred = x
    for _ in range(2):  # two passes widen the kernel
        blurred = jax.lax.conv_general_dilated(
            blurred, kv, (1, 1), [(4, 4), (0, 0)], dimension_numbers=dn,
            feature_group_count=C)
        blurred = jax.lax.conv_general_dilated(
            blurred, kh, (1, 1), [(0, 0), (4, 4)], dimension_numbers=dn,
            feature_group_count=C)
    if valid is None:
        valid = jnp.ones(centers.shape[:2], bool)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    d2 = ((yy[None, None] - centers[..., 1][..., None, None]) ** 2
          + (xx[None, None] - centers[..., 0][..., None, None]) ** 2)
    inside = (d2 <= radii[..., None, None] ** 2) & valid[..., None, None]
    mask = jnp.any(inside, axis=1)[..., None]
    return jnp.where(mask, blurred, x).astype(jnp.uint8)


def face_regions_from_keypoints(keypoints, threshold: float = 0.3):
    """Face circles from head keypoints (COCO: nose/eyes/ears 0..4).

    keypoints (B, P, J, 3) → (centers (B, P, 2), radii (B, P), valid (B, P)).
    """
    kp = np.asarray(keypoints, np.float32)
    head = kp[..., :5, :]
    conf_ok = head[..., 2] > threshold
    w = conf_ok.astype(np.float32)
    denom = np.maximum(w.sum(-1, keepdims=True), 1e-6)
    centers = (head[..., :2] * w[..., None]).sum(-2) / denom
    spread = np.sqrt((((head[..., :2] - centers[..., None, :]) ** 2).sum(-1) * w).sum(-1)
                     / denom[..., 0])
    radii = np.clip(spread * 2.5 + 8.0, 10.0, 250.0)
    valid = conf_ok.sum(-1) >= 2
    return centers, radii, valid


def blur_faces_gaussian(frames, keypoints, threshold: float = 0.3):
    """One-call API: frames + multi-person keypoints → gaussian-blurred faces."""
    centers, radii, valid = face_regions_from_keypoints(keypoints, threshold)
    return np.asarray(gaussian_blur_regions(
        jnp.asarray(frames), jnp.asarray(centers), jnp.asarray(radii),
        jnp.asarray(valid)))


def face_regions_from_detector(frames, detector=None, score_threshold=0.3):
    """Face circles from a face *detector* — privacy must not depend on the
    pose net finding the person (the reference's MTCNN fallback role,
    wrappers/facenet.py:9-71).

    frames (B, H, W, 3) uint8 → (centers (B, K, 2), radii (B, K),
    valid (B, K)). ``detector`` defaults to the registry FaceDetector
    (weights slot detector__FaceDet.npz).
    """
    from ..models.detector import FaceDetector

    if detector is None:
        detector = FaceDetector(input_hw=frames.shape[1:3])
    boxes, scores = detector(np.asarray(frames))
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    centers = boxes[..., :2] + boxes[..., 2:] / 2.0
    radii = np.clip(boxes[..., 2:].max(-1) * 0.6 + 4.0, 10.0, 250.0)
    valid = scores > score_threshold
    return centers, radii, valid


def blur_faces_auto(frames, keypoints=None, detector=None,
                    threshold: float = 0.3):
    """Privacy blur with detector fallback: frames whose keypoints yield no
    valid face region (pose net missed the person, or no keypoints at all)
    are covered by the face detector instead — so the privacy guarantee
    never rests on pose estimation succeeding."""
    frames = np.asarray(frames)
    if keypoints is not None:
        centers, radii, valid = face_regions_from_keypoints(keypoints, threshold)
        missed = ~valid.any(axis=1)
    else:
        B = len(frames)
        centers = np.zeros((B, 1, 2), np.float32)
        radii = np.zeros((B, 1), np.float32)
        valid = np.zeros((B, 1), bool)
        missed = np.ones(B, bool)
    if missed.any():
        dc, dr, dv = face_regions_from_detector(frames, detector)
        dv = dv & missed[:, None]          # only where keypoints failed
        centers = np.concatenate([centers, dc], axis=1)
        radii = np.concatenate([radii, dr], axis=1)
        valid = np.concatenate([valid, dv], axis=1)
    return np.asarray(gaussian_blur_regions(
        jnp.asarray(frames), jnp.asarray(centers, jnp.float32),
        jnp.asarray(radii, jnp.float32), jnp.asarray(valid)))
