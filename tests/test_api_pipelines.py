"""Standard-pipelines orchestration tests (reference-identical signatures)."""

import numpy as np
import pytest

from posepipeline_tpu.testing import synthetic_video


@pytest.fixture(scope="module")
def env(pipeline_env):
    from posepipeline_tpu.pipeline import insert_synthetic_clip

    clip = synthetic_video(num_frames=16, num_people=1, seed=21)
    key = insert_synthetic_clip(clip, video_project="api", filename="api_single.mp4")
    return pipeline_env, clip, key


def test_tracking_pipeline(env):
    p, clip, key = env
    from posepipeline_tpu.api import tracking_pipeline

    keys = tracking_pipeline(dict(key), tracking_method_name="Synthetic")
    assert len(keys) == 1
    assert len(p.PersonBbox & keys[0]) == 1
    assert len(p.DetectedFrames & keys[0]) == 1


def test_top_down_and_lifting_pipeline(env):
    p, clip, key = env
    from posepipeline_tpu.api import lifting_pipeline, top_down_pipeline

    td_keys = top_down_pipeline(dict(key), tracking_method_name="Synthetic",
                                top_down_method_name="Synthetic")
    assert td_keys and len(p.TopDownPerson & td_keys[0]) == 1

    ok = lifting_pipeline(dict(key), tracking_method_name="Synthetic",
                          top_down_method_name="Synthetic",
                          lifting_method_name="GastNet")
    assert ok
    assert len(p.LiftingPerson & key) == 1


def test_smpl_pipeline(env):
    p, clip, key = env
    from posepipeline_tpu.api import smpl_pipeline

    keys = smpl_pipeline(dict(key), tracking_method_name="Synthetic",
                         smpl_method_name="HybrIK")
    assert keys and len(p.SMPLPerson & keys[0]) == 1
    row = (p.SMPLPerson & keys[0]).fetch1()
    # toy body in tests (no SMPL_MODEL_PATH) is flagged explicitly;
    # strings follow the reference ("SMPL"/"SMPL-X", pipeline.py:1564-1612)
    import os
    if not os.environ.get("SMPL_MODEL_PATH"):
        assert row["model_type"] == "SMPL (toy)"
    else:
        assert row["model_type"] == "SMPL"
    assert np.asarray(row["poses"]).shape == (16, 24, 6)
    assert np.asarray(row["joints2d"]).shape == (16, 24, 2)


def test_action_and_hands_tables(env):
    p, clip, key = env
    # skeleton action over the synthetic top-down keypoints
    akey = dict(key, tracking_method=100, video_subject_id=0, top_down_method=100)
    p.SkeletonAction.populate(akey)
    # both SkeletonActionMethodLookup rows compute and are
    # schema-distinguishable (method is a primary-key attribute)
    row = (p.SkeletonAction & akey & 'method="PoseC3D"').fetch1()
    assert len(row["top5"]) == 5 and row["action_window_len"] > 0
    row2 = (p.SkeletonAction & akey & 'method="PoseC3D_SlowOnly"').fetch1()
    assert len(row2["top5"]) == 5 and row2["action_window_len"] > 0

    # hand boxes from COCO wrists (RTMDet slot) + hand pose
    hkey = dict(key, detection_method=0)
    p.HandBboxMethod.insert1({**{k: key[k] for k in ("video_project", "filename")},
                              "detection_method": 0}, skip_duplicates=True)
    p.HandBbox.populate(hkey)
    bboxes = (p.HandBbox & hkey).fetch1("bboxes")
    assert np.asarray(bboxes).shape[1] == 2

    hpkey = dict(hkey, estimation_method=2)  # freihand slot
    p.HandPoseEstimationMethod.insert1(
        {**{k: key[k] for k in ("video_project", "filename")},
         "detection_method": 0, "estimation_method": 2}, skip_duplicates=True)
    p.HandPoseEstimation.populate(hpkey)
    kp = np.asarray((p.HandPoseEstimation & hpkey).fetch1("keypoints_2d"))
    assert kp.shape == (16, 2, 21, 3)
    assert np.isfinite(kp).all()


def test_blur_videos_api(env):
    p, clip, key = env
    import os

    from posepipeline_tpu.api import blur_videos

    # BlurredVideo already depends on BottomUpPeople; use Synthetic bottom-up
    p.BottomUpMethod.insert1(dict({k: key[k] for k in ("video_project", "filename")},
                                  bottom_up_method_name="Synthetic"), skip_duplicates=True)
    p.BottomUpPeople.populate(key)
    p.BlurredVideo.populate(key)
    out = (p.BlurredVideo & key).fetch1("output_video")
    assert os.path.isfile(out)
    os.remove(out)


def test_humor_person_pipeline(env):
    """HumorPerson end-to-end: OpenPosePerson keypoints → windowed learned-
    prior fit → full contract row (reference wrappers/humor.py:277-314,
    pipeline.py:1877-1918)."""
    p, clip, key = env
    from posepipeline_tpu.api import tracking_pipeline
    from posepipeline_tpu.utils.skeletons import coco17_to_body25

    tracking_pipeline(dict(key), tracking_method_name="Synthetic")
    T = clip.keypoints.shape[0]
    kp17 = np.concatenate(
        [clip.keypoints[:, 0], np.ones((T, 17, 1), np.float32)], axis=-1)
    body25 = coco17_to_body25(kp17)
    p.OpenPose.insert1(dict(
        key,
        keypoints=[body25[t][None] for t in range(T)],
        pose_ids=[np.array([0])] * T,
        pose_scores=[np.array([1.0])] * T,
        face_keypoints=[np.zeros((1, 70, 3), np.float32)] * T,
        hand_keypoints=[np.zeros((1, 2, 21, 3), np.float32)] * T,
    ), skip_duplicates=True)
    p.OpenPosePerson.populate(key)
    p.HumorPerson.populate(key)
    row = (p.HumorPerson & key).fetch1()
    assert np.asarray(row["trans"]).shape == (T, 3)
    assert np.asarray(row["pose_body"]).shape == (T, 69)
    assert np.asarray(row["latent_motion"]).shape == (T - 1, 48)
    assert np.abs(np.asarray(row["latent_motion"])).sum() > 0
    assert np.asarray(row["latent_pose"]).shape == (T, 32)
    assert np.asarray(row["contacts"]).shape == (T, 9)
    assert len(np.asarray(row["faces"]))
