"""Associative-embedding bottom-up net (models/bottomup_ae.py): the true
bottom-up MMPose slot (reference wrappers/mmpose.py:84-121 — heatmap+tag
grouping, no person detector)."""

import numpy as np
import pytest


def test_ae_grouping_on_planted_maps():
    """Bypass the backbone: plant two people's peaks + tags directly in the
    head output and check the compiled grouping separates them exactly."""
    import jax.numpy as jnp

    from posepipeline_tpu.models.bottomup_ae import (AEBottomUpModel,
                                                     BottomUpConfig)

    cfg = BottomUpConfig(num_joints=3, max_people=4, peaks_per_joint=4,
                         widths=(8, 16, 32, 64))
    model = AEBottomUpModel(cfg)

    h = w = 32
    logits = np.full((1, h, w, 3), -8.0, np.float32)   # sigmoid ≈ 0
    tags = np.zeros((1, h, w, 3), np.float32)
    # person A at tag 0, joints at (4,4),(8,4),(12,4); person B at tag 5,
    # joints at (4,20),(8,20),(12,20)
    for j, (ya, xa, yb, xb) in enumerate(((4, 4, 4, 20), (8, 4, 8, 20),
                                          (12, 4, 12, 20))):
        logits[0, ya, xa, j] = 8.0
        logits[0, yb, xb, j] = 8.0
        tags[0, ya, xa, j] = 0.0
        tags[0, yb, xb, j] = 5.0
    head = jnp.asarray(np.concatenate([logits, tags], axis=-1))

    # run _infer's decode path by monkey-placing the head output
    import types

    model.net = types.SimpleNamespace(apply=lambda p, x: head)
    frames = jnp.zeros((1, h * 4, w * 4, 3), jnp.uint8)
    people, scores = model._infer.__wrapped__(model, model.params, frames)
    people, scores = np.asarray(people), np.asarray(scores)

    found = people[0][scores[0] > 0.3]
    assert len(found) == 2
    # joints of each person share one column (x = 16 or x = 80 in pixels)
    cols = sorted(found[:, :, 0].mean(axis=1))
    assert cols[0] == pytest.approx(16, abs=2)
    assert cols[1] == pytest.approx(80, abs=2)
    # no cross-person mixing: per-person x spread is tiny
    for p in found:
        assert np.ptp(p[:, 0]) < 4


def test_ae_model_shapes_end_to_end():
    from posepipeline_tpu.models.bottomup_ae import get_bottomup_model

    model = get_bottomup_model()
    frames = np.random.randint(0, 255, (2, 128, 160, 3), np.uint8)
    people, scores = model(frames)
    assert np.asarray(people).shape == (2, model.cfg.max_people, 17, 3)
    assert np.asarray(scores).shape == (2, model.cfg.max_people)
    assert np.isfinite(np.asarray(people)).all()


def test_mmpose_bottomup_slot_runs_ae(pipeline_env):
    """The MMPose BottomUpPeople slot runs the AE net (COCO-17 people lists
    per frame)."""
    from posepipeline_tpu.pipeline import insert_synthetic_clip
    from posepipeline_tpu.testing import synthetic_video

    p = pipeline_env
    clip = synthetic_video(num_frames=4, num_people=2, seed=77,
                           width=160, height=128)
    key = insert_synthetic_clip(clip, video_project="ae", filename="ae.mp4")
    p.VideoInfo.populate(key)
    bu_key = dict(key, bottom_up_method_name="MMPose")
    p.BottomUpMethod.insert1(
        {k: bu_key[k] for k in ("video_project", "filename",
                                "bottom_up_method_name")},
        skip_duplicates=True)
    p.BottomUpPeople.populate(bu_key)
    kp = (p.BottomUpPeople & bu_key).fetch1("keypoints")
    assert len(kp) == 4
    for frame_kp in kp:
        arr = np.asarray(frame_kp)
        assert arr.ndim == 3 and arr.shape[1:] == (17, 3)


def test_higherhrnet_serving_variant():
    """The checkpoint-parity HigherHRNet backbone serves through the same
    compiled AE decoder (registry name "HigherHRNet"); its param tree is
    byte-identical to models/higherhrnet.HigherHRNetAE so a converted
    mmpose checkpoint (--arch higherhrnet) is a file drop."""
    import jax
    import jax.numpy as jnp

    from posepipeline_tpu.core.config import config
    from posepipeline_tpu.models.bottomup_ae import get_bottomup_model
    from posepipeline_tpu.models.higherhrnet import HigherHRNetAE

    old = config.get("custom", {}).get("bottomup_model")
    config.setdefault("custom", {})["bottomup_model"] = {
        "input_hw": (128, 128)}
    try:
        model = get_bottomup_model("HigherHRNet")
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 128, 128, 3)).astype(np.float32)
        people, scores = model(jnp.asarray(frames))
        assert np.asarray(people).shape[2:] == (17, 3)
        assert np.isfinite(np.asarray(people)).all()
        # param-tree parity with the conversion target
        ref = HigherHRNetAE(num_joints=17).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        flat_m = {p for p, _ in jax.tree_util.tree_leaves_with_path(
            model.params)}
        flat_r = {p for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
        assert flat_m == flat_r
    finally:
        if old is None:
            config["custom"].pop("bottomup_model", None)
        else:
            config["custom"]["bottomup_model"] = old
