"""Streaming runtime + evaluation-protocol tests."""

import numpy as np
import pytest

from posepipeline_tpu.demo.h36m import (
    convert_camera, mpjpe, p_mpjpe, pck, pck_bbox_normalized, project_to_image,
    world_to_camera,
)


def test_mpjpe_zero_for_identical():
    x = np.random.default_rng(0).normal(0, 1, (10, 17, 3))
    assert mpjpe(x, x) == 0.0
    assert p_mpjpe(x, x) == pytest.approx(0.0, abs=1e-9)


def test_mpjpe_root_alignment():
    x = np.random.default_rng(1).normal(0, 1, (5, 17, 3))
    shifted = x + np.array([10.0, -3.0, 7.0])  # global translation is free
    assert mpjpe(x, shifted) == pytest.approx(0.0, abs=1e-9)


def test_p_mpjpe_invariant_to_similarity():
    from scipy.spatial.transform import Rotation

    x = np.random.default_rng(2).normal(0, 1, (5, 17, 3))
    R = Rotation.from_euler("xyz", [0.3, -0.2, 1.0]).as_matrix()
    y = 1.7 * x @ R.T + np.array([5.0, 1.0, -2.0])
    assert p_mpjpe(y, x) == pytest.approx(0.0, abs=1e-6)
    assert mpjpe(y, x) > 0.1  # protocol 1 is not invariant


def test_pck():
    gt = np.zeros((4, 17, 2))
    pred = gt + 3.0  # all off by ~4.24 px
    assert pck(pred, gt, threshold=5.0) == 1.0
    assert pck(pred, gt, threshold=4.0) == 0.0
    bb = np.tile([0, 0, 100, 200], (4, 1))
    assert pck_bbox_normalized(pred, gt, bb, frac=0.05) == 1.0  # thr 10 px


def test_camera_roundtrip():
    cam = convert_camera(np.eye(3), [0, 0, -5.0], f=[1000, 1000], c=[320, 240])
    world = np.zeros((1, 2, 3))
    world[0, 0] = [0, 0, 0]
    world[0, 1] = [0.5, 0.2, 0]
    pc = world_to_camera(world, cam)
    assert pc[0, 0, 2] == pytest.approx(5.0)
    px = project_to_image(pc, cam)
    np.testing.assert_allclose(px[0, 0], [320, 240], atol=1e-9)
    np.testing.assert_allclose(px[0, 1], [320 + 0.5 / 5 * 1000, 240 + 0.2 / 5 * 1000],
                               atol=1e-6)


def test_fused_pose_estimator_and_streaming_runner():
    from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector
    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
    from posepipeline_tpu.runtime.stream import FusedPoseEstimator, StreamingRunner
    from posepipeline_tpu.models.lifting import LiftingModel
    from posepipeline_tpu.testing import synthetic_video

    clips = [synthetic_video(num_frames=12, width=160, height=120, seed=s)
             for s in (31, 32, 33)]
    est = FusedPoseEstimator(
        detector=PersonDetector(DetectorConfig(max_detections=4, widths=(8, 16, 32, 64)),
                                input_hw=(120, 160)),
        topdown=TopDownModel(TopDownConfig("tiny", num_joints=17, dim=64, depth=1,
                                           num_heads=2)),
    )
    runner = StreamingRunner(estimator=est, lifter=LiftingModel("PoseAug"),
                             batch_size=4, decode_threads=2)
    results = runner.run([c.path for c in clips], lift=True)
    assert len(results) == 3
    for r in results:
        assert r["keypoints2d"].shape == (12, 17, 3)
        assert r["keypoints3d"].shape == (12, 17, 3)
        assert r["boxes"].shape == (12, 4)
        assert np.isfinite(r["keypoints2d"]).all()


def test_bandwidth_optimized_estimator_pipelines():
    from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector
    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
    from posepipeline_tpu.runtime.stream import BandwidthOptimizedPoseEstimator, StreamingRunner
    from posepipeline_tpu.testing import synthetic_video

    clip = synthetic_video(num_frames=12, width=256, height=192, seed=40)
    est = BandwidthOptimizedPoseEstimator(
        detector=None, topdown=TopDownModel(TopDownConfig("tiny", num_joints=17,
                                                          dim=64, depth=1, num_heads=2)),
        input_hw=(192, 256), det_scale=0.5, det_interval=2)
    assert est.det_hw[0] % 32 == 0 and est.det_hw[1] % 32 == 0
    # pipelined submit/flush: first submit returns None, then results flow
    batches = [np.random.randint(0, 255, (4, 192, 256, 3), np.uint8) for _ in range(3)]
    assert est.submit(batches[0]) is None
    r1 = est.submit(batches[1])
    assert r1 is not None
    boxes, scores, kp = r1
    assert boxes.shape == (4, 4) and kp.shape == (4, 17, 3)
    r2 = est.submit(batches[2])
    r3 = est.flush()
    assert r2 is not None and r3 is not None
    assert est.flush() is None  # idempotent when drained

    runner = StreamingRunner(estimator=est, batch_size=4, decode_threads=1)
    out = runner.run([clip.path], lift=False)
    assert out[0]["keypoints2d"].shape == (12, 17, 3)
    assert out[0]["boxes"].shape == (12, 4)


def test_kinematics_from_arrays():
    from posepipeline_tpu.utils.lifting import kinematics_from_arrays

    T = 20
    kp3 = np.zeros((T, 17, 3))
    # standing pose: hips apart in y, legs down in z... construct simple geometry
    kp3[:, 1] = [0.1, 0, 0]     # right hip
    kp3[:, 4] = [-0.1, 0, 0]    # left hip
    kp3[:, 2] = [0.1, 0, -0.4]  # right knee below
    kp3[:, 3] = [0.1, 0, -0.8]  # right foot
    kp3[:, 5] = [-0.1, 0, -0.4]
    kp3[:, 6] = [-0.1, 0, -0.8]
    kp3[:, 7] = [0, 0, 0.3]     # spine
    kp2 = np.zeros((T, 17, 3))
    kp2[..., 2] = 0.9
    t = np.arange(T) / 30.0
    out = kinematics_from_arrays(kp3, kp2, t)
    assert "Right Knee" in out and "Left Hip" in out
    assert out["Right Knee"].shape == (T,)
    # straight leg: knee angle ~0 degrees
    assert np.abs(out["Right Knee"]).max() < 1e-4
    assert len(out["timestamps"]) == T
