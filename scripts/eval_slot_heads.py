#!/usr/bin/env python
"""Held-out PCK for every trained top-down-family registry head.

scripts/train_all_slots.py ships weights with training-loss evidence only;
this script loads each npz through the SAME registry loaders the populate
paths use (models/topdown.get_topdown_model, pipeline/hands._get_hand_model,
pipeline/backends._get_face_model) and evaluates on held-out device-rendered
fixtures — fresh PRNG seeds through the training samplers — reporting
PCK@0.2 / PCK@0.1 normalized by the GT keypoint extent. This extends
ACCURACY.md's accuracy-contract evidence (detector + flagship MMPose head)
to the wholebody / Halpe / HRFormer / TCFormer / hand / face heads.

Reference contract being mirrored: every reference wrapper serves a real
checkpoint whose accuracy is the wrapper's value
(reference wrappers/mmpose.py:26-44, wrappers/hand_estimation.py:10-77).

    PPT_WEIGHTS_DIR=weights python scripts/eval_slot_heads.py
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def eval_head(model, batch_fn, batches: int = 8, batch: int = 16,
              seed: int = 7777):
    """PCK of ``model`` on held-out samples from ``batch_fn``.

    Predictions decode through the production path (ops.heatmap.decode_heatmaps
    with the full crop as the box); errors are normalized per sample by
    max(width, height) of the in-crop GT keypoint extent, matching the
    person-size normalization of scripts/eval_accuracy.py.
    """
    import jax
    import jax.numpy as jnp

    from posepipeline_tpu.ops.heatmap import decode_heatmaps
    from posepipeline_tpu.ops.warp import normalize_imagenet

    th, tw = model.cfg.input_hw
    full = jnp.tile(jnp.asarray([0.0, 0.0, tw, th], jnp.float32), (batch, 1))

    @jax.jit
    def fwd(params, crops):
        hm = model.net.apply(params, normalize_imagenet(crops))
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        return decode_heatmaps(hm, full)

    hits02 = hits01 = total = 0
    for i in range(batches):
        key = jax.random.PRNGKey(seed + i)
        crops, kp = batch_fn(key, batch)
        pred = np.asarray(fwd(model.params, crops))[..., :2]
        gt = np.asarray(kp)
        valid = ((gt[..., 0] >= 0) & (gt[..., 0] < tw)
                 & (gt[..., 1] >= 0) & (gt[..., 1] < th))
        # per-sample GT extent (masked): the "person size" in crop space
        gx = np.where(valid, gt[..., 0], np.nan)
        gy = np.where(valid, gt[..., 1], np.nan)
        ext = np.maximum(np.nanmax(gx, -1) - np.nanmin(gx, -1),
                         np.nanmax(gy, -1) - np.nanmin(gy, -1))
        ext = np.maximum(np.nan_to_num(ext, nan=1.0), 1.0)
        err = np.linalg.norm(pred - gt, axis=-1) / ext[:, None]
        hits02 += int(((err <= 0.2) & valid).sum())
        hits01 += int(((err <= 0.1) & valid).sum())
        total += int(valid.sum())
    return hits02 / max(total, 1), hits01 / max(total, 1), total


HEAD_LABELS = {"hand": "hand (21-joint, shared)",
               "face": "face (70-point OpenPose)"}


def head_builders():
    """Lazy model builders keyed by comma-free head id.

    Comma-free ids (ADVICE r3: names with commas could never match --only,
    and unknown ids silently produced an empty table). Models are built
    lazily so subset runs do not pay full-registry init (~100 s). Exposed at
    module level so scripts/eval_accuracy.py can fold these rows into
    ACCURACY.md with the same loaders."""
    from posepipeline_tpu import synthjax
    from posepipeline_tpu.models.topdown import get_topdown_model

    def _topdown(name):
        model = get_topdown_model(name)
        bf = functools.partial(synthjax.topdown_joints_batch,
                               num_joints=model.cfg.num_joints,
                               crop_hw=model.cfg.input_hw)
        return model, bf

    def _hand():
        from posepipeline_tpu.pipeline.hands import _get_hand_model

        hand = _get_hand_model("RTMPoseHand5")
        return hand, functools.partial(synthjax.hand_batch,
                                       crop_hw=hand.cfg.input_hw)

    def _face():
        from posepipeline_tpu.pipeline.backends import _get_face_model

        face = _get_face_model()
        return face, functools.partial(synthjax.face_crop_batch,
                                       crop_hw=face.cfg.input_hw)

    return {
        "MMPoseWholebody": lambda: _topdown("MMPoseWholebody"),
        "MMPoseHalpe": lambda: _topdown("MMPoseHalpe"),
        "MMPoseHrformerCoco": lambda: _topdown("MMPoseHrformerCoco"),
        "MMPoseTCFormerWholebody": lambda: _topdown("MMPoseTCFormerWholebody"),
        "hand": _hand,       # 21-joint net shared by every hand slot
        "face": _face,       # 70-point OpenPose face layout
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--only", default="",
                    help="comma-separated subset of head ids (e.g. "
                         "MMPoseHalpe,hand,face)")
    args = ap.parse_args()
    os.environ.setdefault(
        "PPT_WEIGHTS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "weights"))

    from posepipeline_tpu.models.init_util import enable_compilation_cache

    enable_compilation_cache()

    heads = head_builders()
    labels = HEAD_LABELS

    if args.only:
        requested = [s.strip() for s in args.only.split(",") if s.strip()]
        unknown = [s for s in requested if s not in heads]
        if unknown:
            ap.error(f"unknown head id(s) {unknown}; "
                     f"choose from {sorted(heads)}")
        selected = requested
    else:
        selected = list(heads)

    rows = []
    for head_id in selected:
        model, batch_fn = heads[head_id]()
        name = labels.get(head_id, head_id)
        if not getattr(model, "weights_loaded", False):
            print(f"{name}: weights NOT loaded (random init) — set "
                  "PPT_WEIGHTS_DIR", file=sys.stderr)
        t0 = time.time()
        p02, p01, n = eval_head(model, batch_fn,
                                batches=args.batches, batch=args.batch)
        rows.append((name, p02, p01, n))
        print(f"{name}: PCK@0.2 {p02:.3f}  PCK@0.1 {p01:.3f} "
              f"({n} joints, {time.time() - t0:.0f}s)")

    print("\n| head | PCK@0.2 | PCK@0.1 |")
    print("|---|---|---|")
    for name, p02, p01, _ in rows:
        print(f"| {name} | {p02:.3f} | {p01:.3f} |")


if __name__ == "__main__":
    main()
