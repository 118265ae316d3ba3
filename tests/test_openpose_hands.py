"""OpenPose composite: real 21-joint hand keypoints (VERDICT item 5).

Reference behavior mirrored: wrappers/openpose.py:37-126 returns body AND
hand keypoints per person; OpenPosePerson carries matched hands
(pipeline.py:869-934)."""

import numpy as np
import pytest

from posepipeline_tpu.testing import synthetic_video


def test_hand_boxes_from_body25_geometry():
    from posepipeline_tpu.pipeline.backends import _hand_boxes_from_body25

    kp = np.zeros((1, 25, 3), np.float32)
    # right arm: elbow (3), wrist (4) — horizontal forearm of length 50
    kp[0, 3] = [100, 100, 0.9]
    kp[0, 4] = [150, 100, 0.9]
    # left arm below confidence → no box
    kp[0, 6] = [100, 200, 0.05]
    kp[0, 7] = [150, 200, 0.05]
    boxes = _hand_boxes_from_body25(kp)
    assert boxes.shape == (1, 2, 4)
    right, left = boxes[0]
    assert right[2] == right[3] == pytest.approx(75.0)   # 1.5 × forearm
    # centered past the wrist along the forearm
    cx = right[0] + right[2] / 2
    assert cx == pytest.approx(150 + 0.33 * 50, abs=1e-4)
    assert np.all(left == 0)


@pytest.fixture(scope="module")
def op_env(pipeline_env):
    from posepipeline_tpu.pipeline import insert_synthetic_clip

    clip = synthetic_video(num_frames=6, num_people=1, seed=41,
                           width=320, height=240)
    key = insert_synthetic_clip(clip, video_project="op_hands",
                                filename="hands.mp4")
    return pipeline_env, clip, key


def test_openpose_emits_nonzero_hands(op_env):
    p, clip, key = op_env
    p.VideoInfo.populate(key)
    p.OpenPose.populate(key)
    row = (p.OpenPose & key).fetch1()
    assert len(row["hand_keypoints"]) == 6
    total_conf = 0.0
    face_conf = 0.0
    for t, hands in enumerate(row["hand_keypoints"]):
        n_people = len(row["keypoints"][t])
        assert np.asarray(hands).shape == (n_people, 2, 21, 3)
        assert np.asarray(row["face_keypoints"][t]).shape == (n_people, 70, 3)
        if n_people:
            total_conf += float(np.asarray(hands)[..., 2].sum())
            face_conf += float(np.asarray(row["face_keypoints"][t])[..., 2].sum())
    # the done-criterion: matched hands AND faces are non-zero on a synthetic clip
    assert total_conf > 0.0
    assert face_conf > 0.0


def test_openpose_person_carries_hands(pipeline_env):
    """OpenPosePerson matches per-person hands through the IoU association
    (deterministic: the OpenPose row is GT-aligned, so matching is exact)."""
    p = pipeline_env
    from posepipeline_tpu.api import tracking_pipeline
    from posepipeline_tpu.pipeline import insert_synthetic_clip
    from posepipeline_tpu.utils.skeletons import coco17_to_body25

    clip = synthetic_video(num_frames=5, num_people=1, seed=43,
                           width=320, height=240)
    key = insert_synthetic_clip(clip, video_project="op_hands",
                                filename="hands_gt.mp4")
    tracking_pipeline(dict(key), tracking_method_name="Synthetic")

    T = 5
    kp17 = np.concatenate(                                # GT-aligned person
        [clip.keypoints[:, 0], np.ones((T, 17, 1), np.float32)], axis=-1)
    body25 = coco17_to_body25(kp17)
    rng = np.random.RandomState(0)
    gt_hands = rng.rand(T, 1, 2, 21, 3).astype(np.float32)
    p.OpenPose.insert1(dict(
        key,
        keypoints=[body25[t][None] for t in range(T)],
        pose_ids=[np.array([0])] * T,
        pose_scores=[np.array([1.0])] * T,
        face_keypoints=[np.zeros((1, 70, 3), np.float32)] * T,
        hand_keypoints=[gt_hands[t] for t in range(T)],
    ))
    p.OpenPosePerson.populate(key)
    hands = np.asarray((p.OpenPosePerson & key).fetch1("hand_keypoints"))
    assert hands.shape == (T, 2, 21, 3)
    assert hands[..., 2].sum() > 0.0
    ids = np.asarray((p.OpenPosePerson & key).fetch1("openpose_ids"))
    for t in range(T):
        if ids[t] >= 0:
            np.testing.assert_array_equal(hands[t], gt_hands[t, 0])
    assert (ids >= 0).any()


def test_face_boxes_from_body25_geometry():
    from posepipeline_tpu.pipeline.backends import _face_boxes_from_body25

    kp = np.zeros((2, 25, 3), np.float32)
    # person 0: nose + both ears confident, ears 40px apart
    kp[0, 0] = [100, 90, 0.9]
    kp[0, 17] = [120, 100, 0.9]
    kp[0, 18] = [80, 100, 0.9]
    # person 1: everything low confidence → no box
    boxes = _face_boxes_from_body25(kp)
    assert boxes.shape == (2, 4)
    assert boxes[0, 2] == boxes[0, 3] == pytest.approx(64.0)  # 1.6 × 40
    cx = boxes[0, 0] + boxes[0, 2] / 2
    assert cx == pytest.approx(100.0)
    assert np.all(boxes[1] == 0)
