"""Device mesh rasterizer tests (ops/mesh_raster.py — the pyrender
replacement for SMPL overlays, reference utils/visualization.py:93-115)."""

import numpy as np

import jax.numpy as jnp

from posepipeline_tpu.ops.mesh_raster import (overlay_mesh_frame,
                                              rasterize_mesh)


def test_single_triangle_coverage_and_shade():
    H = W = 32
    # right triangle covering the lower-left half of the window
    xy = jnp.array([[0.0, 0.0], [W, 0.0], [0.0, H]])
    z = jnp.array([1.0, 1.0, 1.0])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    mask, shade = rasterize_mesh(xy, z, faces, out_hw=(H, W))
    mask = np.asarray(mask)
    frac = mask.mean()
    assert 0.45 < frac < 0.55, frac
    s = np.asarray(shade)[mask > 0]
    # constant-z triangle faces the camera head-on → max shading
    assert np.allclose(s, 1.0, atol=1e-5)
    # outside pixels carry zero shade
    assert np.asarray(shade)[mask == 0].max() == 0.0


def test_zbuffer_nearest_face_wins():
    H = W = 16
    big = [[0.0, 0.0], [W, 0.0], [0.0, H], [W, H]]
    xy = jnp.array(big + big)
    z = jnp.array([2.0] * 4 + [1.0] * 4)  # second quad nearer
    # first quad tilted is irrelevant — both cover the full window
    faces = jnp.array([[0, 1, 2], [1, 3, 2], [4, 5, 6], [5, 7, 6]], jnp.int32)
    mask, shade = rasterize_mesh(xy, z, faces, out_hw=(H, W))
    assert np.asarray(mask).min() >= 0.99  # fully covered (interior)
    # depth of the winning face is the near quad: verify by shading a tilted
    # far quad differently
    xy2 = jnp.array(big + big)
    z2 = jnp.array([2.0, 2.0, 8.0, 8.0] + [1.0] * 4)  # far quad now tilted
    _, shade2 = rasterize_mesh(xy2, z2, faces, out_hw=(H, W))
    # near (flat) quad still wins everywhere → shading unchanged
    np.testing.assert_allclose(np.asarray(shade2), np.asarray(shade), atol=1e-5)


def test_face_chunk_padding():
    # face count not a multiple of the chunk size exercises the pad path
    H = W = 8
    xy = jnp.array([[0.0, 0.0], [W, 0.0], [0.0, H]])
    z = jnp.array([1.0, 1.0, 1.0])
    faces = jnp.array([[0, 1, 2]] * 3, jnp.int32)
    mask, _ = rasterize_mesh(xy, z, faces, out_hw=(H, W), chunk=2)
    assert 0.3 < np.asarray(mask).mean() < 0.7


def test_overlay_toy_body_mesh():
    from posepipeline_tpu.models.smpl_body import BodyModel

    body = BodyModel()
    assert body.p.faces is not None and len(body.p.faces) > 100
    verts, _ = body(np.zeros((1, 10), np.float32),
                    np.zeros((1, 24, 3), np.float32))
    v = np.asarray(verts)[0]
    frame = np.full((240, 320, 3), 30, np.uint8)
    cam = np.array([0.8, 0.8, 0.0, -1.0], np.float32)  # sx, sy, tx, ty
    out = overlay_mesh_frame(frame, v, cam, body.p.faces)
    assert out.shape == frame.shape
    changed = (out != frame).any(axis=-1)
    assert changed.mean() > 0.01  # the body silhouette landed on the frame
    assert changed.mean() < 0.9   # and it is a silhouette, not a fill
