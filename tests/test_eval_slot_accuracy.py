"""Miniature run of scripts/eval_slot_accuracy.py's evaluators.

Pins the per-slot accuracy protocol (ACCURACY.md "per-slot" table): each
group evaluator returns (name, value) rows with finite numbers on tiny
configurations. The full-size run is executed on the TPU by the round
driver; this guards the measurement path itself.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_eval_lifters_rows():
    from eval_slot_accuracy import eval_lifters

    rows = eval_lifters(("PoseAug",), n_seqs=1, frames=32)
    assert len(rows) == 1 and rows[0][0].startswith("lifter PoseAug")
    assert "MPJPE" in rows[0][1]


def test_eval_bridging_row():
    from eval_slot_accuracy import eval_bridging

    rows = eval_bridging(n_batches=1, batch=4)
    assert len(rows) == 1 and "abs depth" in rows[0][1]


def test_eval_action_and_reid_rows():
    from eval_slot_accuracy import eval_action, eval_reid

    a, a_slow = eval_action(n_batches=1, batch=4)
    assert "top-1" in a[1] and "top-1" in a_slow[1]
    assert "SlowOnly" in a_slow[0]
    (r,) = eval_reid(n_batches=1, ids=4)
    acc = float(r[1].split()[-1])
    assert 0.0 <= acc <= 1.0


def test_eval_mesh_one_slot():
    from eval_slot_accuracy import eval_mesh_slots

    rows = eval_mesh_slots(names=("ProHMR",), n_batches=1, batch=2)
    assert len(rows) == 1 and "MPJPE" in rows[0][1]
