"""Bounding-box geometry and keypoint↔box matching, batched for TPU.

Re-implements (vectorized, jit-compatible, fixed-shape) the semantics of the
reference's numpy utilities:

- ``fix_bb_aspect_ratio``  — reference utils/bounding_box.py:7-29
- ``compute_iou``          — reference utils/keypoint_matching.py:19-45
- ``keypoints_to_bbox``    — reference utils/keypoint_matching.py:4-16
- ``match_keypoints_to_bbox`` — reference utils/keypoint_matching.py:48-68
- ``convert_crop_cam_to_orig_img`` / ``convert_crop_coords_to_orig_img``
  — reference utils/bounding_box.py:56-98

All boxes are TLHW ``(x, y, w, h)`` unless noted. Instead of returning
``None`` for unmatched entities (data-dependent shapes), the batched forms
return a ``found`` mask — the TPU-native idiom for ragged results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fix_aspect_ratio(bbox, dilate: float = 1.2, ratio: float = 1.0):
    """Inflate TLHW boxes to a desired width/height ratio, then dilate.

    Works on any leading batch shape ``(..., 4)``.
    """
    bbox = jnp.asarray(bbox, jnp.float32)
    center = bbox[..., :2] + bbox[..., 2:] / 2.0
    w, h = bbox[..., 2], bbox[..., 3]
    too_narrow = (w / h) < ratio
    new_w = jnp.where(too_narrow, h * ratio, w)
    new_h = jnp.where(too_narrow, h, w / ratio)
    hw = jnp.stack([new_w, new_h], axis=-1) * dilate
    return jnp.concatenate([center - hw / 2.0, hw], axis=-1)


def iou(box1, box2, tlhw: bool = True, epsilon: float = 1e-8):
    """Element-wise IoU of broadcastable ``(..., 4)`` box arrays.

    Matches the reference's convention: non-intersecting or degenerate boxes
    yield 0 (the epsilon term keeps zero-area unions finite).
    """
    box1 = jnp.asarray(box1, jnp.float32)
    box2 = jnp.asarray(box2, jnp.float32)
    b1p1, b1p2 = box1[..., :2], box1[..., 2:]
    b2p1, b2p2 = box2[..., :2], box2[..., 2:]
    if tlhw:
        b1p2 = b1p1 + b1p2
        b2p2 = b2p1 + b2p2
    intersecting = jnp.all(b1p2 - b2p1 > 0, axis=-1) & jnp.all(b2p2 - b1p1 > 0, axis=-1)
    intersect_area = jnp.prod(jnp.minimum(b1p2, b2p2) - jnp.maximum(b1p1, b2p1), axis=-1)
    union = (jnp.prod(b1p2 - b1p1, axis=-1) + jnp.prod(b2p2 - b2p1, axis=-1)
             - intersect_area + epsilon)
    return jnp.where(intersecting, intersect_area / union, 0.0)


def iou_matrix(boxes_a, boxes_b, tlhw: bool = True):
    """Pairwise IoU matrix: ``(N, 4) × (M, 4) → (N, M)``."""
    return iou(jnp.asarray(boxes_a)[:, None, :], jnp.asarray(boxes_b)[None, :, :], tlhw=tlhw)


def keypoints_to_bbox(keypoints, thresh: float = 0.1, min_keypoints: int = 5):
    """TLHW box around confident keypoints; zero box if too few are confident.

    ``keypoints``: ``(..., J, 3)`` as (x, y, conf) — batched over any leading
    shape (the reference loops persons in Python; here one fused reduction).
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    conf_ok = kp[..., 2] > thresh  # (..., J)
    big = jnp.float32(1e9)
    x = jnp.where(conf_ok, kp[..., 0], big)
    y = jnp.where(conf_ok, kp[..., 1], big)
    mins = jnp.stack([x.min(axis=-1), y.min(axis=-1)], axis=-1)
    x = jnp.where(conf_ok, kp[..., 0], -big)
    y = jnp.where(conf_ok, kp[..., 1], -big)
    maxs = jnp.stack([x.max(axis=-1), y.max(axis=-1)], axis=-1)
    box = jnp.concatenate([mins, maxs - mins], axis=-1)
    enough = (conf_ok.sum(axis=-1) >= min_keypoints)[..., None]
    return jnp.where(enough, box, jnp.zeros_like(box))


def match_keypoints_to_bbox(bbox, keypoints, thresh: float = 0.25):
    """Pick the person whose keypoint-derived box best overlaps ``bbox``.

    Args:
        bbox: ``(4,)`` TLHW target box.
        keypoints: ``(P, J, 3)`` candidate people (padded; zero-conf rows are
            naturally excluded since their boxes are zero).
        thresh: minimum IoU to accept a match.

    Returns:
        ``(matched (J, 3), idx int32, found bool)`` — matched is zeros when no
        candidate exceeds the threshold (reference returns ``(zeros, None)``).
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    kp_boxes = keypoints_to_bbox(kp)               # (P, 4)
    ious = iou(jnp.asarray(bbox, jnp.float32)[None, :], kp_boxes)  # (P,)
    idx = jnp.argmax(ious)
    found = ious[idx] > thresh
    matched = jnp.where(found, kp[idx], jnp.zeros_like(kp[0]))
    return matched, idx.astype(jnp.int32), found


# Batched over time: one call per video instead of the reference's per-frame loop
match_keypoints_to_bbox_sequence = jax.jit(
    jax.vmap(match_keypoints_to_bbox, in_axes=(0, 0, None)), static_argnums=2
)


def convert_crop_cam_to_orig_img(cam, bbox, img_width, img_height):
    """Weak-perspective camera: crop → original image coordinates (VIBE convention)."""
    cam = jnp.asarray(cam, jnp.float32)
    bbox = jnp.asarray(bbox, jnp.float32)
    cx = bbox[:, 0] + bbox[:, 2] / 2
    cy = bbox[:, 1] + bbox[:, 3] / 2
    h = bbox[:, 2]
    hw, hh = img_width / 2.0, img_height / 2.0
    sx = cam[:, 0] * (1.0 / (img_width / h))
    sy = cam[:, 0] * (1.0 / (img_height / h))
    tx = ((cx - hw) / hw / sx) + cam[:, 1]
    ty = ((cy - hh) / hh / sy) + cam[:, 2]
    return jnp.stack([sx, sy, tx, ty], axis=-1)


def convert_crop_coords_to_orig_img(bbox, keypoints, crop_size):
    """Keypoints in (-1, 1) crop coords → original image pixels (VIBE convention)."""
    bbox = jnp.asarray(bbox, jnp.float32)
    kp = jnp.asarray(keypoints, jnp.float32)
    cx = bbox[:, 0] + bbox[:, 2] / 2
    cy = bbox[:, 1] + bbox[:, 3] / 2
    h = bbox[:, 2]
    kp = 0.5 * crop_size * (kp + 1.0)
    kp = kp * (h[..., None, None] / crop_size)
    x = (cx - h / 2)[..., None] + kp[..., 0]
    y = (cy - h / 2)[..., None] + kp[..., 1]
    return jnp.stack([x, y], axis=-1)


def tlbr_to_tlhw(boxes):
    boxes = jnp.asarray(boxes, jnp.float32)
    return jnp.concatenate([boxes[..., :2], boxes[..., 2:] - boxes[..., :2]], axis=-1)


def tlhw_to_tlbr(boxes):
    boxes = jnp.asarray(boxes, jnp.float32)
    return jnp.concatenate([boxes[..., :2], boxes[..., :2] + boxes[..., 2:]], axis=-1)


def keypoints_filter_clipped(keypoints, width, height):
    """Zero the confidence of out-of-frame / NaN keypoints.

    ``keypoints``: ``(..., 3)`` — reference utils/keypoints.py:5-32 semantics
    (x<=0, x>=W, y<=0, y>=H, or NaN ⇒ conf=0), fused and batched.
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    x, y = kp[..., 0], kp[..., 1]
    clipped = (x <= 0) | (x >= width) | (y <= 0) | (y >= height) | jnp.isnan(x) | jnp.isnan(y)
    conf = jnp.where(clipped, 0.0, kp[..., 2])
    return jnp.concatenate([kp[..., :2], conf[..., None]], axis=-1)


def impute_bbox_gaps(present: np.ndarray, bboxes: np.ndarray, limit: int = 2):
    """Fill short gaps in a per-frame single-person box timeseries.

    Reference PersonBbox.make uses pandas bfill/ffill with ``limit=2``
    (pipeline.py:677-685). Host-side numpy implementation (this runs once per
    video on metadata, not on the accelerator).

    Returns ``(present, bboxes)`` with gaps of ≤ 2*limit frames filled
    (backfill up to ``limit`` then forward-fill up to ``limit``).
    """
    present = np.asarray(present).copy()
    bboxes = np.asarray(bboxes, dtype=float).copy()
    T = present.shape[0]
    idx = np.arange(T)
    valid_idx = idx[present]
    if valid_idx.size == 0:
        return present, bboxes
    # backward fill (take next valid) with limit
    next_valid = np.full(T, -1, dtype=int)
    nxt = -1
    for t in range(T - 1, -1, -1):
        if present[t]:
            nxt = t
        next_valid[t] = nxt
    # forward fill (take previous valid) with limit
    prev_valid = np.full(T, -1, dtype=int)
    prv = -1
    for t in range(T):
        if present[t]:
            prv = t
        prev_valid[t] = prv
    for t in range(T):
        if present[t]:
            continue
        if next_valid[t] >= 0 and next_valid[t] - t <= limit:
            bboxes[t] = bboxes[next_valid[t]]
            present[t] = True
        elif prev_valid[t] >= 0 and t - prev_valid[t] <= limit:
            bboxes[t] = bboxes[prev_valid[t]]
            present[t] = True
    return present, bboxes
