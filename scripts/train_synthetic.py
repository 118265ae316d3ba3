#!/usr/bin/env python
"""Train the detector and top-down nets on synthetic fixtures.

Validation/bring-up trainer: fits the TPU-native models to procedurally
generated single-person scenes so the full pipeline can be exercised with
*learned* (rather than random) weights — and the training step is the same
jitted function the multi-chip dryrun shards.

    python scripts/train_synthetic.py --steps 500 --out /tmp/ppt_weights.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None, help="save trained params (npz of flat tree)")
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    from posepipeline_tpu.models.init_util import enable_compilation_cache

    enable_compilation_cache()

    import jax
    from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector
    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
    from posepipeline_tpu.train import DetectorTrainer, TopDownTrainer

    det = PersonDetector(DetectorConfig(max_detections=8), input_hw=(192, 256))
    dt = DetectorTrainer(det, learning_rate=args.lr)
    losses = dt.fit_synthetic(steps=args.steps, batch=args.batch, hw=(192, 256),
                              log_every=max(args.steps // 10, 1))
    print(f"detector: {losses[0]:.4f} → {losses[-1]:.4f}")

    td = TopDownModel(TopDownConfig("train", num_joints=17, dim=192, depth=4,
                                    num_heads=4))
    tt = TopDownTrainer(td, learning_rate=args.lr)
    losses = tt.fit_synthetic(steps=args.steps, batch=args.batch,
                              log_every=max(args.steps // 10, 1))
    print(f"topdown: {losses[0]:.5f} → {losses[-1]:.5f}")

    if args.out:
        flat = {}

        def flatten(tree, prefix):
            for k, v in tree.items():
                if isinstance(v, dict):
                    flatten(v, f"{prefix}{k}/")
                else:
                    flat[f"{prefix}{k}"] = np.asarray(v)

        flatten(det.params, "detector/")
        flatten(td.params, "topdown/")
        np.savez(args.out, **flat)
        print(f"saved {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
