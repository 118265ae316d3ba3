"""Smoke test for scripts/eval_slot_heads.py's eval path.

The script's held-out PCK numbers (ACCURACY.md "registry heads" table) come
from ``eval_head``; this pins its contract on a tiny net: PCK in [0, 1],
joint counting honors the in-crop validity mask, and a net trained briefly
on the same sampler beats random init.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import functools

from eval_slot_heads import eval_head  # noqa: E402

from posepipeline_tpu import synthjax
from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel


def _tiny_model():
    return TopDownModel(TopDownConfig(
        "tiny", num_joints=17, input_hw=(64, 48), heatmap_hw=(16, 12),
        dim=64, depth=2, num_heads=2))


def test_eval_head_bounds_and_counts():
    model = _tiny_model()
    bf = functools.partial(synthjax.topdown_batch, crop_hw=model.cfg.input_hw)
    p02, p01, n = eval_head(model, bf, batches=1, batch=4)
    assert 0.0 <= p01 <= p02 <= 1.0
    assert 0 < n <= 4 * 17


def test_eval_head_improves_with_training():
    from posepipeline_tpu.train import TopDownTrainer

    model = _tiny_model()
    bf = functools.partial(synthjax.topdown_batch, crop_hw=model.cfg.input_hw)
    base02, _, _ = eval_head(model, bf, batches=2, batch=4)
    tr = TopDownTrainer(model)
    tr.fit_device(steps=60, batch=8)
    trained02, _, _ = eval_head(model, bf, batches=2, batch=4)
    assert trained02 > base02, (base02, trained02)
