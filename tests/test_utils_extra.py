"""Tests for env shims, host visualization parity, gaussian face blur,
metrics, lazy package exports, and skeleton conversions."""

import os

import numpy as np
import pytest


def test_add_path():
    import sys

    from posepipeline_tpu.env import add_path

    p = "/tmp/__ppt_test_path__"
    assert p not in sys.path
    with add_path(p):
        assert sys.path[0] == p
    assert p not in sys.path


def test_memory_limit_shims_noop():
    from posepipeline_tpu.env import pytorch_memory_limit, tensorflow_memory_limit

    pytorch_memory_limit(0.5)
    tensorflow_memory_limit()


def test_lazy_package_exports(pipeline_env):
    import posepipeline_tpu

    assert posepipeline_tpu.Video is pipeline_env.Video
    assert posepipeline_tpu.LiftingPerson is pipeline_env.LiftingPerson
    with pytest.raises(AttributeError):
        posepipeline_tpu.NoSuchTable


def test_host_video_overlay(tmp_path):
    from posepipeline_tpu.media.video import decode_all, write_video
    from posepipeline_tpu.utils.visualization import draw_keypoints, video_overlay

    src = str(tmp_path / "src.mp4")
    frames = np.zeros((6, 64, 64, 3), np.uint8)
    write_video(iter(frames), src, fps=10)

    def cb(image, idx):
        return draw_keypoints(image, np.array([[32.0, 32.0, 0.9]]), radius=4)

    out = str(tmp_path / "out.mp4")
    video_overlay(src, out, cb, downsample=1)
    result = decode_all(out)
    assert result.shape[0] == 6
    assert result[0, 32, 32].mean() > 100  # white circle drawn


def test_draw_keypoints_threshold_and_clip():
    from posepipeline_tpu.utils.visualization import draw_keypoints

    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_keypoints(img.copy(), np.array([[16, 16, 0.9], [5, 5, 0.1],
                                               [100, 100, 0.9]]), radius=2)
    assert out[16, 16].max() > 0
    assert out[5, 5].max() == 0


def test_gaussian_face_blur():
    from posepipeline_tpu.utils.faces import blur_faces_gaussian

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    kp = np.zeros((1, 1, 17, 3), np.float32)
    kp[0, 0, 0] = [32, 32, 0.9]   # nose
    kp[0, 0, 1] = [30, 30, 0.9]   # left eye
    kp[0, 0, 2] = [34, 30, 0.9]   # right eye
    out = blur_faces_gaussian(frames, kp)
    # center region smoothed (variance drops), far corner unchanged
    inner_before = frames[0, 28:37, 28:37].astype(float)
    inner_after = out[0, 28:37, 28:37].astype(float)
    assert inner_after.std() < inner_before.std() * 0.9
    np.testing.assert_array_equal(out[0, :8, :8], frames[0, :8, :8])


def test_metrics_registry():
    from posepipeline_tpu.runtime import metrics

    metrics.report(reset=True)
    with metrics.StageTimer("unit_stage", frames=10):
        pass
    metrics.record("unit_stage", 20, 0.5)
    rep = metrics.report()
    assert rep["unit_stage"]["frames"] == 30
    assert rep["unit_stage"]["calls"] == 2
    assert "unit_stage" in metrics.format_report(reset=True)
    assert metrics.report() == {}


def test_skeleton_conversions():
    from posepipeline_tpu.utils.skeletons import (
        body25_to_coco17, coco17_to_body25, wholebody133_subset,
    )

    kp = np.random.default_rng(0).uniform(0, 100, (2, 17, 3)).astype(np.float32)
    b25 = coco17_to_body25(kp)
    assert b25.shape == (2, 25, 3)
    back = body25_to_coco17(b25)
    np.testing.assert_allclose(back, kp, atol=1e-5)
    # sternum is shoulder midpoint
    np.testing.assert_allclose(b25[..., 1, :], (kp[..., 5, :] + kp[..., 6, :]) / 2)

    wb = np.random.default_rng(1).uniform(0, 100, (2, 133, 3)).astype(np.float32)
    c25 = wholebody133_subset(wb, "coco_25")
    assert c25.shape == (2, 25, 3)
    np.testing.assert_allclose(c25[..., 19, :], wb[..., 17, :])  # left big toe
    hands = wholebody133_subset(wb, "hands_42")
    assert hands.shape == (2, 42, 3)
