"""Bridging superset registry + metrabs-style model + pipeline parity tests.

Reference semantics mirrored: wrappers/bridging.py (superset, filter_skeleton,
augmentation noise, noise_to_conf) and the hardcoded superset indices in
pipeline.py:1298-1304 (bml 264..350), :1359 (smpl+head_30), :1396-1399
(smplx 179..220).
"""

import numpy as np
import pytest

from posepipeline_tpu.utils import bridging_superset as bs


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def test_superset_registry_reference_index_parity():
    assert len(bs.SUPERSET_JOINT_NAMES) == 580
    # reference pipeline.py:1396-1399 smplx block
    assert list(bs.PER_SKELETON_INDICES["smplx_42"]) == list(range(179, 221))
    # reference pipeline.py:1298-1304 bml block
    assert list(bs.PER_SKELETON_INDICES["bml_movi_87"]) == list(range(264, 351))
    # reference pipeline.py:1359 smpl+head list, verbatim
    assert list(bs.PER_SKELETON_INDICES["smpl+head_30"]) == (
        [23] + list(range(23)) + [76, 89, 90, 91, 92, 105])
    # make_coco_25 construction: coco_19 + foot extras appended at the end
    c19, c25 = bs.PER_SKELETON_INDICES["coco_19"], bs.PER_SKELETON_INDICES["coco_25"]
    assert list(c25[:19]) == list(c19) and len(c25) == 25
    # the smpl+head extras are semantically head joints
    heads = [bs.SUPERSET_JOINT_NAMES[i] for i in (76, 89, 90, 91, 92, 105)]
    assert heads == ["htop_mpi", "leye_ghum", "lear_ghum", "reye_ghum",
                     "rear_ghum", "nose_ghum"]


def test_skeleton_sizes_and_edges():
    sizes = {"coco_19": 19, "coco_25": 25, "h36m_25": 25, "h36m_17": 17,
             "mpi_inf_3dhp_28": 28, "mpi_inf_3dhp_17": 17, "smpl_24": 24,
             "smplx_42": 42, "smpl+head_30": 30, "bml_movi_87": 87, "": 580}
    for name, n in sizes.items():
        assert len(bs.PER_SKELETON_INDICES[name]) == n, name
    for skel in ("coco_19", "coco_25", "h36m_25", "mpi_inf_3dhp_28",
                 "smpl+head_30", "bml_movi_87"):
        edges = bs.get_skeleton_edges(skel)
        n = len(bs.PER_SKELETON_INDICES[skel])
        assert len(edges) > 0 and edges.max() < n, skel


def test_joint_names_normalized_display():
    c25 = bs.get_joint_names("coco_25")
    assert c25[0] == "Sternum" and c25[-1] == "Right Heel" and len(c25) == 25
    bml = bs.get_joint_names("bml_movi_87")
    # reference display list: canonical tail joints get normalized names
    # (bridging.py:277-296): head(67), mhip(68), Pelvis(69) … Right Foot(86)
    assert bml[69] == "Pelvis" and bml[-1] == "Right Foot" and len(bml) == 87


def test_filter_skeleton_list_and_array_forms():
    kp = np.random.rand(3, 580, 3).astype(np.float32)
    sub = bs.filter_skeleton(kp, "bml_movi_87")
    assert sub.shape == (3, 87, 3)
    as_list = bs.filter_skeleton([kp[0], kp[1]], "smplx_42")
    assert as_list.shape == (2, 42, 3)
    np.testing.assert_array_equal(sub[0], kp[0][bs.PER_SKELETON_INDICES["bml_movi_87"]])


def test_augmentation_noise_semantics():
    rng = np.random.RandomState(0)
    base = rng.rand(1, 10, 3).astype(np.float32) * 1000
    identical = np.repeat(base[None], 5, axis=1).reshape(1, 5, 10, 3)
    noise = bs.augmentation_noise(identical)
    assert noise.shape == (1, 10)
    assert np.allclose(noise, 0.0, atol=1e-3)
    jittered = identical + rng.randn(1, 5, 10, 3).astype(np.float32) * 30
    noisy = bs.augmentation_noise(jittered)
    assert (noisy > 1.0).all()
    # conf mapping: small noise → high confidence, monotone decreasing
    c = bs.noise_to_conf(np.array([0.0, 100.0, 200.0, 400.0]))
    assert c[0] > 0.9 and abs(c[2] - 0.5) < 1e-6 and (np.diff(c) < 0).all()


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def test_bridging_model_absolute_3d_geometry():
    from posepipeline_tpu.models.bridging import BridgingConfig, BridgingModel

    cfg = BridgingConfig(dim=32, depth=1, num_heads=2, num_aug=3,
                         input_hw=(64, 48))
    model = BridgingModel(cfg)
    B, K = 2, 2
    H, W = 120, 160
    frames = (np.random.RandomState(1).rand(B, H, W, 3) * 255).astype(np.uint8)
    boxes = np.tile(np.array([30, 20, 60, 80], np.float32), (B, K, 1))
    p2d, p3d = model(frames, boxes)
    p2d, p3d = np.asarray(p2d), np.asarray(p3d)
    assert p2d.shape == (B, K, 3, 580, 2)
    assert p3d.shape == (B, K, 3, 580, 3)
    assert np.isfinite(p2d).all() and np.isfinite(p3d).all()
    # absolute depth within the configured range
    z = p3d[..., 2]
    assert (z >= cfg.depth_min_mm).all()
    assert (z <= cfg.depth_min_mm + cfg.depth_span_mm).all()
    # pinhole consistency: x3 = (u - cx) * z / f
    f = 1.25 * max(H, W)
    np.testing.assert_allclose(
        p3d[..., 0], (p2d[..., 0] - W / 2) * z / f, rtol=1e-3, atol=0.5)
    # aug 0 is the identity crop; other augs differ → nonzero TTA noise
    noise = bs.augmentation_noise(p3d)
    assert noise.shape == (B, K, 580)
    assert noise.mean() > 0


# ---------------------------------------------------------------------------
# Pipeline: BottomUpBridging → Person → TopDownPerson / LiftingPerson
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bridging_env(pipeline_env):
    from posepipeline_tpu.pipeline import insert_synthetic_clip
    from posepipeline_tpu.testing import synthetic_video

    clip = synthetic_video(num_frames=8, num_people=1, seed=31,
                           width=320, height=240)
    key = insert_synthetic_clip(clip, video_project="bridge",
                                filename="bridge.mp4")
    return pipeline_env, clip, key


def test_bridging_pipeline_superset_end_to_end(bridging_env):
    p, clip, key = bridging_env
    from posepipeline_tpu.api import tracking_pipeline

    tracking_pipeline(dict(key), tracking_method_name="Synthetic")
    p.BottomUpBridging.populate(key)
    row = (p.BottomUpBridging & key).fetch1()
    T = 8
    assert len(row["keypoints2d"]) == T
    frame0 = np.asarray(row["keypoints2d"][0])
    assert frame0.shape[1:] == (580, 2)
    assert np.asarray(row["keypoints3d"][0]).shape[1:] == (580, 3)
    assert np.asarray(row["keypoint_noise"][0]).shape[1:] == (580,)

    p.BottomUpBridgingPerson.populate(key)
    prow = (p.BottomUpBridgingPerson & key).fetch1()
    assert np.asarray(prow["keypoints"]).shape == (T, 580, 3)
    assert np.asarray(prow["keypoints3d"]).shape == (T, 580, 4)

    # the VERDICT done-criterion: Bridging_bml_movi_87 → (T, 87, 3)
    base = {k: prow[k] for k in ("video_project", "filename",
                                 "tracking_method", "video_subject_id")}
    for method_id, skel, J in ((12, "bml_movi_87", 87), (13, "smpl+head_30", 30),
                               (14, "smplx_42", 42), (11, "COCO_25", 25)):
        p.TopDownMethod.insert1(dict(base, top_down_method=method_id),
                                skip_duplicates=True)
        p.TopDownPerson.populate(dict(base, top_down_method=method_id))
        kp = (p.TopDownPerson & dict(base, top_down_method=method_id)).fetch1("keypoints")
        assert np.asarray(kp).shape == (T, J, 3), skel

    # lifting passthrough: absolute 3D + per-skeleton confidence
    td = dict(base, top_down_method=12)
    p.LiftingMethod.insert1(dict(td, lifting_method=12), skip_duplicates=True)
    p.LiftingPerson.populate(dict(td, lifting_method=12))
    lrow = (p.LiftingPerson & dict(td, lifting_method=12)).fetch1()
    assert np.asarray(lrow["keypoints_3d"]).shape == (T, 87, 4)
    assert np.asarray(lrow["keypoints_valid"]).shape == (T, 87)


def test_bridging_video_all_skeletons(bridging_env):
    p, clip, key = bridging_env
    import cv2

    assert p.BottomUpBridging & key, "ordering: superset test populates first"
    # BlurredVideo masks faces from Bridging_OpenPose keypoints (reference
    # pipeline.py:435-475) — populate that chain first
    p.BottomUpMethod.insert1(
        {k: key[k] for k in ("video_project", "filename")} |
        {"bottom_up_method_name": "Bridging_OpenPose"}, skip_duplicates=True)
    p.BottomUpPeople.populate(key)
    p.BlurredVideo.populate(key)
    p.BottomUpBridgingVideo.populate(key)
    rows = (p.BottomUpBridgingVideo & key).fetch(as_dict=True)
    skels = sorted(r["skeleton"] for r in rows)
    assert skels == sorted(["bml_movi_87", "h36m_25", "smpl+head_30",
                            "mpi_inf_3dhp_28", "coco_19", "coco_25"])
    video = (p.BottomUpBridgingVideo & dict(key, skeleton="bml_movi_87")).fetch1("output_video")
    cap = cv2.VideoCapture(video)
    ok, frame = cap.read()
    cap.release()
    import os
    os.remove(video)
    assert ok and frame is not None
