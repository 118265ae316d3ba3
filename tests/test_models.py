"""Model zoo tests: shapes, jit-compilability, decode integration.

Uses small model variants — correctness of architecture plumbing, not
accuracy (no pretrained checkpoints in this environment; see
tools/convert_weights.py for the torch weight mapping path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector, ReIDModel, decode_centers
from posepipeline_tpu.models.lifting import (
    LIFTER_CONFIGS, LifterConfig, LiftingModel, TemporalLifter, coco_to_h36m,
    normalize_screen_coordinates,
)
from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel


def test_topdown_small_end_to_end():
    cfg = TopDownConfig("tiny", num_joints=17, dim=64, depth=2, num_heads=2)
    model = TopDownModel(cfg)
    frames = np.random.randint(0, 255, (2, 128, 96, 3), np.uint8)
    boxes = np.array([[10.0, 10, 50, 80], [20.0, 5, 40, 90]])
    kp = np.asarray(model(frames, boxes))
    assert kp.shape == (2, 17, 3)
    assert np.isfinite(kp).all()


def test_topdown_heatmap_resolution():
    cfg = TopDownConfig("tiny", num_joints=5, dim=64, depth=1, num_heads=2)
    model = TopDownModel(cfg)
    x = jnp.zeros((1, 256, 192, 3))
    hm = model.heatmaps(x)
    # stride 16 backbone + two 2x deconvs → stride 4
    assert hm.shape == (1, 64, 48, 5)


def test_detector_decode_centers_roundtrip():
    # hand-build head outputs with two known peaks and verify decode
    H, W, stride = 32, 40, 8
    logits = np.full((1, H, W), -10.0, np.float32)
    size = np.zeros((1, H, W, 2), np.float32)
    offset = np.zeros((1, H, W, 2), np.float32)
    for (y, x, w_, h_) in [(10, 12, 6.0, 12.0), (20, 30, 4.0, 8.0)]:
        logits[0, y, x] = 5.0
        size[0, y, x] = [w_, h_]
        offset[0, y, x] = [0.5, 0.25]
    boxes, scores = decode_centers(jnp.array(logits), jnp.array(size), jnp.array(offset),
                                   k=8, stride=stride)
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    assert scores[0, 0] > 0.99 and scores[0, 1] > 0.99 and scores[0, 2] < 0.01
    got = boxes[0, 0]
    # first peak: center ((12+0.5)*8, (10+0.25)*8), size (48, 96)
    np.testing.assert_allclose(got, [100 - 24, 82 - 48, 48, 96], atol=1e-3)


def test_detector_runs_and_is_sorted():
    det = PersonDetector(DetectorConfig(max_detections=16, widths=(8, 16, 32, 64)),
                         input_hw=(96, 128))
    frames = np.random.randint(0, 255, (2, 96, 128, 3), np.uint8)
    boxes, scores = det(frames)
    assert np.asarray(boxes).shape == (2, 16, 4)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # descending


def test_reid_embeddings_normalized():
    model = ReIDModel(crop_hw=(64, 32))
    crops = np.random.randint(0, 255, (4, 64, 32, 3), np.uint8).astype(np.float32)
    emb = np.asarray(model(crops))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_coco_to_h36m_structure():
    kp = np.zeros((1, 17, 3))
    kp[0, 11] = [10, 100, 1]   # left hip
    kp[0, 12] = [30, 100, 1]   # right hip
    kp[0, 5] = [10, 20, 1]     # left shoulder
    kp[0, 6] = [30, 20, 1]     # right shoulder
    out = np.asarray(coco_to_h36m(kp))
    np.testing.assert_allclose(out[0, 0], [20, 100, 1])   # hip = mid
    np.testing.assert_allclose(out[0, 8], [20, 20, 1])    # thorax = mid shoulders
    np.testing.assert_allclose(out[0, 7], [20, 60, 1])    # spine = mid(hip, thorax)
    np.testing.assert_allclose(out[0, 1], kp[0, 12])      # right hip position


def test_normalize_screen_coordinates():
    x = np.array([[0.0, 0.0], [640.0, 480.0]])
    out = np.asarray(normalize_screen_coordinates(x, 640, 480))
    np.testing.assert_allclose(out[0], [-1, -0.75])
    np.testing.assert_allclose(out[1], [1, 0.75])


def test_temporal_lifter_receptive_field_and_shape():
    cfg = LifterConfig("t", (3, 3), 32)
    assert cfg.receptive_field == 9
    net = TemporalLifter(cfg)
    x = jnp.zeros((2, 20, 34))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 20, 17, 3)


def test_lifting_model_small():
    model = LiftingModel("GastNet")
    kp2d = np.random.uniform(0, 600, (30, 17, 3)).astype(np.float32)
    kp2d[..., 2] = 0.9
    kp2d[5, :, 2] = 0.0  # an all-invalid frame
    out, valid = model(kp2d, 640, 480)
    assert np.asarray(out).shape == (30, 17, 3)
    v = np.asarray(valid)
    assert v.shape == (30,) and not v[5] and v[0]


def test_lifter_registry_complete():
    for name in ("VideoPose3D", "GastNet", "PoseAug", "RIE", "PoseFormer"):
        assert name in LIFTER_CONFIGS
    assert LIFTER_CONFIGS["VideoPose3D"][1].receptive_field == 243
