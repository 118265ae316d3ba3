"""Device-side colorspace conversion for the native I420 streaming path.

The host ships compact I420 frames (1.5 bytes/px — half the traffic of RGB);
the TPU does the YUV→RGB conversion, where the per-pixel 3×3 matrix is a
fused elementwise epilogue XLA folds into the consuming network's first conv.

Matches cv2's BT.601 limited-range ("MPEG"/studio-swing) conversion — the
colorspace ffmpeg tags on cv2-encoded yuv420p video — to within ±2 LSB
(tests/test_ops.py::test_i420_to_rgb_matches_cv2).

Replaces (on device) the host-side ``cv2.cvtColor(BGR2RGB)`` pass of the
reference's decode loops (reference utils/visualization.py:51-67,
wrappers/mmpose.py:60-76), which cost a full-frame host memory pass per frame.
"""

from __future__ import annotations

import jax.numpy as jnp

# BT.601 limited-range YCbCr → full-range RGB (ITU-R BT.601-7 §2.5.4,
# the matrix swscale uses for untagged yuv420p).
_Y_SCALE = 255.0 / 219.0
_R_V = 1.5960268
_G_U = -0.3917623
_G_V = -0.8129676
_B_U = 2.0172321


def i420_to_rgb(batch: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, H*3//2, W) uint8 planar I420 → (B, H, W, 3) float32 RGB in [0, 255].

    The flat layout per frame is Y (H×W) then U (H/2×W/2) then V (H/2×W/2),
    as produced by native/mediadec.cpp. Chroma is upsampled by nearest
    (2×2 repeat) — the same co-sited convention cv2's default conversion uses.
    """
    B = batch.shape[0]
    flat = batch.reshape(B, -1)
    n_y = height * width
    n_c = n_y // 4
    y = flat[:, :n_y].reshape(B, height, width).astype(jnp.float32)
    u = flat[:, n_y:n_y + n_c].reshape(B, height // 2, width // 2).astype(jnp.float32)
    v = flat[:, n_y + n_c:].reshape(B, height // 2, width // 2).astype(jnp.float32)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    y = (y - 16.0) * _Y_SCALE
    r = y + _R_V * v
    g = y + _G_U * u + _G_V * v
    b = y + _B_U * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
