"""Batched bbox crop + resize + normalize — the hot per-crop preprocessing.

The reference does this per frame on the host with
``cv2.getAffineTransform`` + ``cv2.warpAffine`` (utils/bounding_box.py:32-53),
one crop at a time, feeding batch-1 GPU inference. Here the whole operation is
a single fused XLA program over a batch of frames and boxes:

    frames (B, H, W, C) uint8  +  boxes (B, 4) TLHW
        → aspect-fix + dilate → bilinear sample → (B, h, w, C) float32
        → optional ImageNet normalization

Bilinear sampling is expressed as two **separable interpolation matmuls**
(out = Wy · frame · Wxᵀ) instead of gathers: the per-crop interpolation
weights are dense rank-(h×H) / (w×W) matrices built on the fly, so the whole
warp runs on the MXU — the TPU-native formulation of an axis-aligned affine
warp. A gather-based path is kept for very large source frames where the
matmul FLOPs would dominate.

Coordinate convention matches the reference's 3-point affine construction:
``src_x = x0 + dst_x * w / crop_w`` (pixel corners, not centers), with
cv2's constant-zero border behavior outside the image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import fix_aspect_ratio

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _interp_weights(starts, scales, out_size: int, in_size: int):
    """Per-crop 1-D bilinear interpolation matrices with zero border.

    Args:
        starts: (B,) source start coordinate per crop.
        scales: (B,) source step per output pixel.
        out_size: output length (static).
        in_size: input length (static).

    Returns:
        (B, out_size, in_size) weights; rows for out-of-image samples are ~0,
        reproducing cv2.warpAffine's constant-0 border.
    """
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    src = starts[:, None] + out_idx[None, :] * scales[:, None]          # (B, out)
    grid = jnp.arange(in_size, dtype=jnp.float32)                        # (in,)
    # triangular (hat) kernel = bilinear weights; taps outside [0, in-1] get 0
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - grid[None, None, :]))
    return w.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_resize_matmul(frames, boxes, out_hw=(256, 192)):
    """Crop TLHW ``boxes`` from ``frames`` and resize to ``out_hw`` (h, w).

    frames: (B, H, W, C) uint8/float; boxes: (B, 4) already aspect-fixed.
    Returns (B, h, w, C) float32 (0..255 scale preserved).
    """
    h, w = out_hw
    B, H, W, C = frames.shape
    frames = frames.astype(jnp.float32)
    boxes = jnp.asarray(boxes, jnp.float32)
    sy = boxes[:, 3] / h
    sx = boxes[:, 2] / w
    wy = _interp_weights(boxes[:, 1], sy, h, H)   # (B, h, H)
    wx = _interp_weights(boxes[:, 0], sx, w, W)   # (B, w, W)
    # (B,h,H)·(B,H,W,C) → (B,h,W,C) ; then (B,w,W)·... → (B,h,w,C)
    # HIGHEST precision: default TPU matmul truncates to bf16, which costs
    # ~1/255 pixel error — enough to break parity with the cv2 reference path.
    tmp = jnp.einsum("bhH,bHWc->bhWc", wy, frames,
                     preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bwW,bhWc->bhwc", wx, tmp,
                     preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return out


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_resize_gather(frames, boxes, out_hw=(256, 192)):
    """Gather-based bilinear crop (same semantics as crop_resize_matmul)."""
    h, w = out_hw
    B, H, W, C = frames.shape
    frames = frames.astype(jnp.float32)
    boxes = jnp.asarray(boxes, jnp.float32)
    ys = boxes[:, 1, None] + jnp.arange(h, dtype=jnp.float32)[None, :] * (boxes[:, 3, None] / h)
    xs = boxes[:, 0, None] + jnp.arange(w, dtype=jnp.float32)[None, :] * (boxes[:, 2, None] / w)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    def tap(yi, xi):
        yv = (yi >= 0) & (yi <= H - 1)
        xv = (xi >= 0) & (xi <= W - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        # advanced-index gather per batch element
        g = jax.vmap(lambda f, yy, xx: f[yy[:, None], xx[None, :]])(frames, yc, xc)
        mask = (yv[:, :, None] & xv[:, None, :]).astype(jnp.float32)
        return g * mask[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy0 = (1 - fy)[:, :, None, None]
    wy1 = fy[:, :, None, None]
    wx0 = (1 - fx)[:, None, :, None]
    wx1 = fx[:, None, :, None]
    return v00 * wy0 * wx0 + v01 * wy0 * wx1 + v10 * wy1 * wx0 + v11 * wy1 * wx1


def crop_image_bbox(frames, bboxes, target_size=(192, 256), dilate: float = 1.2,
                    method: str = "matmul"):
    """Reference-compatible entry (utils/bounding_box.py:32-53), batched.

    Args:
        frames: (B, H, W, C) or single (H, W, C).
        bboxes: (B, 4) or (4,) TLHW (pre-aspect-fix; this applies the fix).
        target_size: (width, height) — note reference order.

    Returns:
        (crops (B, h, w, C) float32, fixed_boxes (B, 4)).
    """
    single = frames.ndim == 3
    if single:
        frames = frames[None]
        bboxes = jnp.asarray(bboxes)[None]
    tw, th = target_size
    fixed = fix_aspect_ratio(bboxes, dilate=dilate, ratio=tw / th)
    fn = crop_resize_matmul if method == "matmul" else crop_resize_gather
    crops = fn(frames, fixed, out_hw=(th, tw))
    if single:
        return crops[0], fixed[0]
    return crops, fixed


@jax.jit
def normalize_imagenet(images):
    """uint8/float 0..255 images → ImageNet-normalized float32 (reference
    utils/bounding_box.py:160-166 torchvision Normalize semantics)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std
