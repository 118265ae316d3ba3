"""Official H36M camera calibration parity tests (reference demo/h36_dj.py:67-115)."""

import numpy as np
import pytest


from posepipeline_tpu.demo.h36m_cameras import (H36M_CAMERA_NAMES,
                                                _euler_xyz_intrinsic,
                                                get_camera,
                                                get_camera_vector,
                                                poses32_to_17,
                                                scan_raw_layout)
from posepipeline_tpu.demo.h36m import project_to_image, world_to_camera


def test_euler_matches_scipy():
    scipy_rot = pytest.importorskip("scipy.spatial.transform")
    rng = np.random.default_rng(0)
    for _ in range(10):
        ang = rng.uniform(-np.pi, np.pi, 3)
        ours = _euler_xyz_intrinsic(*ang)
        ref = scipy_rot.Rotation.from_euler("XYZ", ang).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_reference_convert_camera_parity():
    """Repo camera dict == the reference's convert_camera(w) output for
    sampled (subject, camera) pairs (reference demo/h36_dj.py:92-115):
    same R, same translation convention (reference T = −R·C), same K/dist/P."""
    scipy_rot = pytest.importorskip("scipy.spatial.transform")
    for subject in (1, 5, 9, 11):
        for cam in H36M_CAMERA_NAMES:
            w = get_camera_vector(subject, cam)
            ours = get_camera(subject, cam)
            ref_R = scipy_rot.Rotation.from_euler("XYZ", w[:3]).as_matrix()
            ref_T = -ref_R @ w[3:6]
            ref_K = np.array([[w[6], 0, w[8]], [0, w[7], w[9]], [0, 0, 1.0]])
            ref_dist = np.array([w[10], w[11], w[13], w[14], w[12]])
            ref_P = ref_K @ np.concatenate([ref_R, ref_T.reshape(3, 1)], axis=1)
            np.testing.assert_allclose(ours["R"], ref_R, atol=1e-12)
            # repo stores the camera center; reference stores −R·C
            np.testing.assert_allclose(-ours["R"] @ ours["T"], ref_T, atol=1e-6)
            np.testing.assert_allclose(ours["K"], ref_K, atol=1e-9)
            np.testing.assert_allclose(ours["dist"], ref_dist, atol=1e-12)
            np.testing.assert_allclose(ours["P"], ref_P, atol=1e-6)


def test_camera_vector_slots():
    # subject/camera accept both int and string forms
    np.testing.assert_allclose(get_camera_vector(1, 1),
                               get_camera_vector("S1", "54138969"))
    # distinct cameras must differ
    assert not np.allclose(get_camera_vector(1, 1), get_camera_vector(1, 2))


def test_projection_geometry():
    """A world point projected through P equals world→camera→image."""
    cam = get_camera(1, "55011271")
    pts = np.array([[[0.0, 0.0, 1000.0], [200.0, -300.0, 800.0]]])
    pc = world_to_camera(pts, cam)
    assert (pc[..., 2] > 0).all()  # subject area is in front of the camera
    px = project_to_image(pc, cam)
    homog = np.concatenate([pts, np.ones((1, 2, 1))], axis=-1)
    proj = homog @ cam["P"].T
    px_ref = proj[..., :2] / proj[..., 2:3]
    np.testing.assert_allclose(px, px_ref, atol=1e-6)
    # principal point is inside a 1000x1002 image; projections of points
    # near the world origin (capture area center) land in-image
    assert (px > -2000).all() and (px < 4000).all()


def test_scan_raw_layout(tmp_path):
    d = tmp_path / "h36m"
    (d / "S1" / "Videos").mkdir(parents=True)
    (d / "S1" / "Poses_D3_Positions").mkdir()
    (d / "S1" / "Videos" / "Walking 1.54138969.mp4").write_bytes(b"")
    (d / "S1" / "Videos" / "Walking.55011271.mp4").write_bytes(b"")
    (d / "S1" / "Videos" / "_ALL.54138969.mp4").write_bytes(b"")
    recs = scan_raw_layout(str(d))
    assert len(recs) == 2
    byname = {(r["activity"], r["trial"], r["camera"]) for r in recs}
    assert ("Walking", 1, "54138969") in byname
    assert ("Walking", 0, "55011271") in byname
    r = [x for x in recs if x["trial"] == 1][0]
    assert r["cdf_3d"].endswith("Poses_D3_Positions/Walking 1.cdf")
    assert r["cdf_2d"].endswith("Poses_D2_Positions/Walking 1.54138969.cdf")


def test_poses32_to_17():
    x = np.arange(32 * 3, dtype=float).reshape(1, 32, 3)
    y = poses32_to_17(x)
    assert y.shape == (1, 17, 3)
    np.testing.assert_allclose(y[0, 0], x[0, 0])   # pelvis
    np.testing.assert_allclose(y[0, 14], x[0, 25])  # right elbow chain
