"""On-device overlay rasterization: keypoints, skeletons, boxes, face blur.

The reference renders overlays on the host, one frame at a time, with
cv2.circle/cv2.line inside ``video_overlay`` (utils/visualization.py:12-90)
and masks faces with a white cv2.circle in ``BlurredVideo.make``
(pipeline.py:443-475). Rendering every analytic's ``*Video`` table this way is
a per-frame host hot loop.

This module rasterizes overlays as batched XLA scatters so a whole frame batch
is annotated in one device program:

- discs (keypoints, line samples) are scattered through precomputed static
  offset grids with out-of-bounds/invalid indices dropped,
- line segments are drawn by scattering S uniformly spaced discs along each
  segment (S static → fixed shapes),
- face masks are full-frame distance tests (cheap on the VPU).

Output frames stay uint8 RGB, ready for the host encoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def track_colors(n: int, scale: int = 255):
    """n visually-distinct RGB colors (HSV wheel), like the reference's
    matplotlib hsv colormap per track id (pipeline.py:581-634)."""
    import colorsys

    return np.array(
        [[int(c * scale) for c in colorsys.hsv_to_rgb(i / max(n, 1), 1.0, 1.0)] for i in range(n)],
        dtype=np.uint8,
    )


def _disc_offsets(radius: int):
    """Static (K, 2) integer offsets covering a filled disc of ``radius``."""
    r = int(radius)
    g = np.arange(-r, r + 1)
    yy, xx = np.meshgrid(g, g, indexing="ij")
    mask = (yy**2 + xx**2) <= r**2
    return np.stack([yy[mask], xx[mask]], axis=-1).astype(np.int32)


def _scatter_points(frames, points, valid, colors, radius: int):
    """Scatter filled discs.

    frames: (B, H, W, 3) uint8/float; points: (B, N, 2) xy float;
    valid: (B, N) bool; colors: (B, N, 3) or (3,); radius: static int.
    """
    B, H, W, C = frames.shape
    offs = jnp.asarray(_disc_offsets(radius))              # (K, 2) yx
    K = offs.shape[0]
    pts = jnp.round(points).astype(jnp.int32)              # (B, N, 2) xy
    y = pts[..., 1][..., None] + offs[None, None, :, 0]    # (B, N, K)
    x = pts[..., 0][..., None] + offs[None, None, :, 1]
    ok = valid[..., None] & (y >= 0) & (y < H) & (x >= 0) & (x < W)
    flat_idx = jnp.where(ok, y * W + x, -1)                # -1 → dropped
    colors = jnp.broadcast_to(jnp.asarray(colors, frames.dtype), (B,) + points.shape[1:-1] + (C,))
    colors = jnp.repeat(colors[:, :, None, :], K, axis=2)  # (B, N, K, C)
    flat = frames.reshape(B, H * W, C)
    flat = flat.at[jnp.arange(B)[:, None], flat_idx.reshape(B, -1)].set(
        colors.reshape(B, -1, C), mode="drop")
    return flat.reshape(B, H, W, C)


@functools.partial(jax.jit, static_argnames=("radius", "threshold"))
def draw_keypoints(frames, keypoints, color=(255, 255, 255), radius: int = 3,
                   threshold: float = 0.45):
    """Rasterize (B, J, 3) keypoints onto (B, H, W, 3) frames.

    Matches reference draw_keypoints semantics (utils/visualization.py:79-90):
    confidence threshold + clip-to-image; one filled disc per keypoint.
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    valid = kp[..., 2] > threshold
    return _scatter_points(frames, kp[..., :2], valid, color, radius)


def _line_samples(a, b, num_samples: int):
    """(..., 2) endpoints → (..., S, 2) uniformly spaced points on segments."""
    t = jnp.linspace(0.0, 1.0, num_samples)
    return a[..., None, :] + (b - a)[..., None, :] * t[:, None]


@functools.partial(jax.jit, static_argnames=("limbs", "radius", "threshold", "num_samples"))
def draw_skeleton(frames, keypoints, limbs, color=(0, 255, 0), radius: int = 2,
                  threshold: float = 0.45, num_samples: int = 48):
    """Draw limb segments between keypoint pairs.

    limbs: static tuple of (joint_a, joint_b) index pairs.
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    la = jnp.asarray([l[0] for l in limbs])
    lb = jnp.asarray([l[1] for l in limbs])
    a = kp[:, la, :2]                       # (B, L, 2)
    b = kp[:, lb, :2]
    valid = (kp[:, la, 2] > threshold) & (kp[:, lb, 2] > threshold)  # (B, L)
    pts = _line_samples(a, b, num_samples)  # (B, L, S, 2)
    B, L, S, _ = pts.shape
    pts = pts.reshape(B, L * S, 2)
    valid = jnp.repeat(valid[..., None], S, axis=-1).reshape(B, L * S)
    return _scatter_points(frames, pts, valid, color, radius)


@functools.partial(jax.jit, static_argnames=("radius",))
def draw_boxes(frames, boxes, colors, valid=None, radius: int = 2):
    """Draw TLHW box outlines. boxes: (B, N, 4); colors: (N, 3) or (B, N, 3)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    B, N, _ = boxes.shape
    if valid is None:
        valid = jnp.ones((B, N), bool)
    tl = boxes[..., :2]
    hw = boxes[..., 2:]
    tr = tl + jnp.stack([hw[..., 0], jnp.zeros_like(hw[..., 0])], axis=-1)
    bl = tl + jnp.stack([jnp.zeros_like(hw[..., 0]), hw[..., 1]], axis=-1)
    br = tl + hw
    segs_a = jnp.stack([tl, tr, br, bl], axis=2).reshape(B, N * 4, 2)
    segs_b = jnp.stack([tr, br, bl, tl], axis=2).reshape(B, N * 4, 2)
    S = 64
    pts = _line_samples(segs_a, segs_b, S).reshape(B, N * 4 * S, 2)
    v = jnp.repeat(valid[..., None], 4 * S, axis=-1).reshape(B, N * 4 * S)
    colors = jnp.asarray(colors)
    if colors.ndim == 2:
        colors = jnp.broadcast_to(colors[None], (B, N, 3))
    cols = jnp.repeat(colors[:, :, None, :], 4 * S, axis=2).reshape(B, N * 4 * S, 3)
    return _scatter_points(frames, pts, v, cols.astype(frames.dtype), radius)


@jax.jit
def blur_faces(frames, centers, radii, valid=None):
    """Mask faces with filled white circles (the privacy layer).

    Reference BlurredVideo.make (pipeline.py:443-475): center = nose keypoint,
    radius = ‖neck − nose‖ clipped to [10, 250] px, color white.

    frames: (B, H, W, 3); centers: (B, P, 2) xy; radii: (B, P).
    """
    B, H, W, C = frames.shape
    if valid is None:
        valid = jnp.ones(centers.shape[:2], bool)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    d2 = ((yy[None, None] - centers[..., 1][..., None, None]) ** 2
          + (xx[None, None] - centers[..., 0][..., None, None]) ** 2)  # (B, P, H, W)
    inside = (d2 <= (radii[..., None, None] ** 2)) & valid[..., None, None]
    mask = jnp.any(inside, axis=1)  # (B, H, W)
    white = jnp.full((C,), 255, frames.dtype)
    return jnp.where(mask[..., None], white, frames)


def face_circle_params(keypoints, nose_idx: int = 0, neck_idx: int = 1,
                       min_radius: float = 10.0, max_radius: float = 250.0,
                       threshold: float = 0.5):
    """Nose/neck keypoints → (centers, radii, valid) for :func:`blur_faces`.

    keypoints: (B, P, J, 3). Mirrors reference pipeline.py:455-468.
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    nose = kp[..., nose_idx, :2]
    neck = kp[..., neck_idx, :2]
    conf = jnp.minimum(kp[..., nose_idx, 2], kp[..., neck_idx, 2])
    radii = jnp.clip(jnp.linalg.norm(neck - nose, axis=-1), min_radius, max_radius)
    return nose, radii, conf > threshold
