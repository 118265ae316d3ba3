"""Training-loop tests: losses decrease, detector learns to localize."""

import numpy as np
import pytest

from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector
from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
from posepipeline_tpu.train import (
    DetectorTrainer, TopDownTrainer, center_focal_loss, detector_targets,
    topdown_targets,
)


def test_detector_targets_structure():
    boxes = np.array([[32.0, 16.0, 32.0, 48.0]])  # center (48, 40)
    center, size, offset, mask = detector_targets(boxes, (96, 128), stride=8)
    center, mask = np.asarray(center), np.asarray(mask)
    iy, ix = np.unravel_index(np.argmax(center[0]), center[0].shape)
    assert (iy, ix) == (5, 6)  # (40/8, 48/8)
    assert mask[0, 5, 6] == 1.0 and mask.sum() == 1
    np.testing.assert_allclose(np.asarray(size)[0, 5, 6], [4.0, 6.0])


def test_focal_loss_prefers_correct_heatmap():
    target = np.zeros((1, 8, 8), np.float32)
    target[0, 3, 4] = 1.0
    good = np.full((1, 8, 8), -8.0, np.float32)
    good[0, 3, 4] = 8.0
    bad = np.full((1, 8, 8), -8.0, np.float32)
    bad[0, 6, 1] = 8.0
    assert float(center_focal_loss(good, target)) < float(center_focal_loss(bad, target))


def test_topdown_targets_peak_location():
    kp = np.array([[[96.0, 128.0]]])  # center of a 256x192 crop
    hm = np.asarray(topdown_targets(kp, (64, 48), (256, 192)))
    assert hm.shape == (1, 64, 48, 1)
    iy, ix = np.unravel_index(np.argmax(hm[0, :, :, 0]), (64, 48))
    assert (iy, ix) == (32, 24)


@pytest.mark.slow
def test_detector_learns_to_localize():
    """A small detector trained briefly on synthetic frames must localize the
    person far better than at init — real gradient flow through the whole
    backbone + heads + decode."""
    from posepipeline_tpu.models.detector import decode_centers
    from posepipeline_tpu.testing import synthetic_frames
    from posepipeline_tpu.tracking.tracker import iou_matrix_np
    import jax.numpy as jnp

    det = PersonDetector(DetectorConfig(max_detections=4, widths=(8, 16, 32, 64)),
                         input_hw=(96, 128))
    trainer = DetectorTrainer(det, learning_rate=2e-3)

    def mean_iou(seed):
        frames, boxes, _ = synthetic_frames(8, 96, 128, np.random.default_rng(seed))
        pred_boxes, scores = det(frames)
        pred_boxes = np.asarray(pred_boxes)
        ious = [iou_matrix_np(pred_boxes[i][:1], boxes[i][None])[0, 0] for i in range(8)]
        return float(np.mean(ious))

    iou_before = mean_iou(999)
    losses = trainer.fit_synthetic(steps=120, batch=8, seed=1)
    assert losses[-1] < losses[0] * 0.5, f"loss did not halve: {losses[0]} → {losses[-1]}"
    iou_after = mean_iou(999)
    assert iou_after > max(0.25, iou_before + 0.15), \
        f"detector did not learn: IoU {iou_before:.3f} → {iou_after:.3f}"


@pytest.mark.slow
def test_topdown_loss_decreases():
    model = TopDownModel(TopDownConfig("tiny", num_joints=17, dim=64, depth=2,
                                       num_heads=2))
    trainer = TopDownTrainer(model, learning_rate=1e-3)
    losses = trainer.fit_synthetic(steps=30, batch=4, seed=2)
    assert losses[-1] < losses[0] * 0.8, f"{losses[0]} → {losses[-1]}"


def test_ae_trainer_reduces_loss():
    """Bottom-up AE training: heatmap MSE + tag pull/push loss decreases."""
    from posepipeline_tpu.models.bottomup_ae import (AEBottomUpModel,
                                                     BottomUpConfig)
    from posepipeline_tpu.train import AETrainer

    model = AEBottomUpModel(BottomUpConfig(widths=(8, 16, 32, 64)))
    trainer = AETrainer(model)
    losses = trainer.fit_synthetic(steps=20, batch=4)
    assert losses[-1] < losses[0]


def test_action_trainer_learns_cadence_classes():
    """Action net separates procedural cadence classes (loss decreases and
    held-out accuracy beats chance)."""
    import numpy as np

    from posepipeline_tpu.models.action import ActionConfig, ActionModel
    from posepipeline_tpu.train import ActionTrainer, synthetic_action_windows

    model = ActionModel(ActionConfig(window=16, stride=8, heatmap_hw=(24, 24)))
    trainer = ActionTrainer(model)
    losses = trainer.fit_synthetic(steps=40, batch=8)
    assert losses[-1] < losses[0] * 0.8

    rng = np.random.default_rng(123)
    vols, labels = synthetic_action_windows(16, 16, (24, 24), 17, rng)
    import jax.numpy as jnp
    probs = np.asarray(model._infer(model.params, jnp.asarray(vols)))
    acc = float((probs.argmax(-1) == labels).mean())
    assert acc > 0.5, f"held-out accuracy {acc}"


def test_hand_net_trains_on_synthetic_hands():
    """The 21-joint hand net trains through the generic top-down trainer on
    the hand fixture (loss decrease + localization beats the untrained net)."""
    import numpy as np

    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
    from posepipeline_tpu.testing import synthetic_hand_frames
    from posepipeline_tpu.train import TopDownTrainer

    model = TopDownModel(TopDownConfig("hand_tiny", num_joints=21,
                                       input_hw=(64, 64), heatmap_hw=(16, 16),
                                       dim=64, depth=2, num_heads=2))
    trainer = TopDownTrainer(model)
    losses = trainer.fit_synthetic(steps=60, batch=8,
                                   frame_fn=synthetic_hand_frames,
                                   frame_hw=(128, 128))
    assert losses[-1] < losses[0] * 0.5

    rng = np.random.default_rng(321)
    frames, boxes, kps = synthetic_hand_frames(8, 128, 128, rng)
    kp = np.asarray(model(frames, boxes))
    err = np.linalg.norm(kp[..., :2] - kps, axis=-1).mean()
    assert err < 20.0, f"mean hand joint error {err:.1f}px"
