"""Hand-written Pallas TPU kernels for the hot decode path.

``decode_heatmaps`` (ops/heatmap.py) is a chain of XLA ops: separable Gaussian
modulation (2 convs), per-map max/rescale, log, argmax, an 8-tap gather and a
2×2 solve. XLA materializes several (B, J, H, W) intermediates in HBM between
them. The Pallas kernel below fuses the whole decode per heatmap tile inside
VMEM: one HBM read of the heatmap, one 8-float write of the result.

Numerics match the XLA path (tests/test_pallas.py compares both against the
reference DARK semantics; validated on real TPU to ≤0.02 px on peaked
heatmaps). On adversarial *untextured* inputs (i.i.d. noise) argmax
tie-breaking can differ between Mosaic and XLA due to excess-precision max
reductions — irrelevant for real heatmaps, which are peaked by construction.
The jnp implementation remains the portable fallback (CPU tests run the
kernel in interpreter mode).

PRODUCTION DEFAULT: the streaming runtime (runtime/stream.py) and every
pipeline table decode through ``ops.heatmap.decode_heatmaps`` — the XLA
path — because inside the fused pose program XLA already fuses the decode
with the surrounding net and the HBM-intermediate argument above no longer
applies; the Pallas kernel is for standalone decode at scale. The contract
is pinned by tests/test_ops.py::test_production_decode_is_xla_path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .heatmap import _cv2_gaussian_kernel


def _shift_rows(x, d):
    """out[r] = x[r + d], zero where out of range (circular roll + mask)."""
    H = x.shape[0]
    rolled = pltpu.roll(x, (-d) % H, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = (rows + d >= 0) & (rows + d <= H - 1)
    return jnp.where(valid, rolled, 0.0)


def _shift_cols(x, d):
    W = x.shape[1]
    rolled = pltpu.roll(x, (-d) % W, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid = (cols + d >= 0) & (cols + d <= W - 1)
    return jnp.where(valid, rolled, 0.0)


_MAPS_PER_PROGRAM = 8  # TPU block alignment: leading block dims multiple of 8


def _make_kernel(kernel_size: int, H: int, W: int):
    taps = _cv2_gaussian_kernel(kernel_size)
    half = (kernel_size - 1) // 2

    def kernel(hm_ref, bbox_ref, out_ref):
        for k in range(_MAPS_PER_PROGRAM):  # static unroll over the tile
            hm = hm_ref[k]                  # (H, W) f32
            orig_max = jnp.max(hm)

            # separable Gaussian modulation via masked shifts (zero padding)
            v = jnp.zeros_like(hm)
            for d in range(-half, half + 1):
                v = v + taps[d + half] * _shift_rows(hm, d)
            g = jnp.zeros_like(hm)
            for d in range(-half, half + 1):
                g = g + taps[d + half] * _shift_cols(v, d)
            g = g * (orig_max / jnp.maximum(jnp.max(g), 1e-20))
            logg = jnp.log(jnp.maximum(g, 1e-10))

            # argmax on the ORIGINAL map (reference takes coords pre-modulation)
            rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            m = jnp.max(hm)
            flat_index = rows * W + cols
            # first occurrence of the max (matches numpy argmax tie-breaking)
            candidate = jnp.where(hm >= m, flat_index, H * W)
            idx = jnp.min(candidate)
            py = idx // W
            px = idx % W

            def tap(dy, dx):
                # dynamic lane-dim scalar loads don't lower on TPU Mosaic;
                # a masked reduction extracts the single stencil value instead
                yy = jnp.clip(py + dy, 0, H - 1)
                xx = jnp.clip(px + dx, 0, W - 1)
                mask = (rows == yy) & (cols == xx)
                return jnp.sum(jnp.where(mask, logg, 0.0))

            dx1 = 0.5 * (tap(0, 1) - tap(0, -1))
            dy1 = 0.5 * (tap(1, 0) - tap(-1, 0))
            dxx = 0.25 * (tap(0, 2) - 2.0 * tap(0, 0) + tap(0, -2))
            dxy = 0.25 * (tap(1, 1) - tap(-1, 1) - tap(1, -1) + tap(-1, -1))
            dyy = 0.25 * (tap(2, 0) - 2.0 * tap(0, 0) + tap(-2, 0))
            det = dxx * dyy - dxy * dxy
            interior = (px > 1) & (px < W - 2) & (py > 1) & (py < H - 2)
            ok = interior & (det != 0.0)
            safe = jnp.where(ok, det, 1.0)
            off_x = jnp.where(ok, -(dyy * dx1 - dxy * dy1) / safe, 0.0)
            off_y = jnp.where(ok, -(-dxy * dx1 + dxx * dy1) / safe, 0.0)

            # transform to source-image coordinates with the crop box
            bx = bbox_ref[k, 0]
            by = bbox_ref[k, 1]
            bw = bbox_ref[k, 2]
            bh = bbox_ref[k, 3]
            x_img = bx + (px.astype(jnp.float32) + off_x) / W * bw
            y_img = by + (py.astype(jnp.float32) + off_y) / H * bh
            mask_pos = jnp.where(m > 0.0, 1.0, 0.0)

            # scalar stores straight to the output block (scatter is not
            # lowerable on TPU Pallas; direct ref writes are)
            row = jnp.stack([x_img * mask_pos + (1 - mask_pos) * bx,
                             y_img * mask_pos + (1 - mask_pos) * by,
                             m, 0.0, 0.0, 0.0, 0.0, 0.0])
            out_ref[k, :] = row

    return kernel


@functools.partial(jax.jit, static_argnames=("blur_kernel", "interpret"))
def decode_heatmaps_pallas(heatmaps, bboxes, blur_kernel: int = 11,
                           interpret: bool = False):
    """Fused DARK decode as a Pallas kernel.

    heatmaps: (B, J, H, W) float32; bboxes: (B, 4) TLHW.
    Returns (B, J, 3) keypoints — same contract as ops.heatmap.decode_heatmaps.
    """
    B, J, H, W = heatmaps.shape
    N = B * J
    P = _MAPS_PER_PROGRAM
    Npad = ((N + P - 1) // P) * P
    hm = heatmaps.reshape(N, H, W).astype(jnp.float32)
    boxes = jnp.repeat(jnp.asarray(bboxes, jnp.float32), J, axis=0)  # (N, 4)
    if Npad != N:
        hm = jnp.pad(hm, ((0, Npad - N), (0, 0), (0, 0)))
        boxes = jnp.pad(boxes, ((0, Npad - N), (0, 0)))

    kernel = _make_kernel(blur_kernel, H, W)
    out = pl.pallas_call(
        kernel,
        grid=(Npad // P,),
        in_specs=[
            pl.BlockSpec((P, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Npad, 8), jnp.float32),
        interpret=interpret,
    )(hm, boxes)
    # empty maps decode to the bbox origin, matching the jnp path where the
    # masked (0, 0) heatmap coordinate lands on transform_preds' offset
    return out[:N].reshape(B, J, 8)[..., :3]
