"""Tracking subsystem tests: Kalman bank, assignment, tracker scenarios."""

import numpy as np
import pytest

from posepipeline_tpu.tracking.kalman import KalmanBank
from posepipeline_tpu.tracking.tracker import (
    TRACKER_METHOD_VARIANTS, Tracker, TrackerConfig, iou_matrix_np, linear_assignment,
    make_tracker,
)


def test_kalman_xyah_roundtrip():
    tlhw = np.array([[10.0, 20.0, 30.0, 60.0]])
    xyah = KalmanBank.tlhw_to_xyah(tlhw)
    np.testing.assert_allclose(xyah, [[25, 50, 0.5, 60]])
    np.testing.assert_allclose(KalmanBank.xyah_to_tlhw(xyah), tlhw)


def test_kalman_tracks_constant_velocity():
    kf = KalmanBank(4)
    slots = np.array([0])
    kf.initiate(slots, KalmanBank.tlhw_to_xyah(np.array([[0.0, 0.0, 20.0, 40.0]])))
    active = np.zeros(4, bool)
    active[0] = True
    # feed measurements moving +5 px/frame in x
    for t in range(1, 12):
        kf.predict(active)
        meas = KalmanBank.tlhw_to_xyah(np.array([[5.0 * t, 0.0, 20.0, 40.0]]))
        kf.update(slots, meas)
    # prediction should now anticipate the motion
    kf.predict(active)
    pred = kf.tlhw(slots)[0]
    assert abs(pred[0] - 60.0) < 2.0, pred  # next position ~ 5*12


def test_gating_distance_orders_candidates():
    kf = KalmanBank(2)
    kf.initiate(np.array([0]), KalmanBank.tlhw_to_xyah(np.array([[100.0, 100, 40, 80]])))
    near = KalmanBank.tlhw_to_xyah(np.array([[102.0, 101, 40, 80]]))
    far = KalmanBank.tlhw_to_xyah(np.array([[400.0, 300, 40, 80]]))
    d = kf.gating_distance(np.array([0]), np.concatenate([near, far]))
    assert d[0, 0] < d[0, 1]


def test_linear_assignment_native_matches_scipy():
    import scipy.optimize

    rng = np.random.default_rng(0)
    for n, m in [(3, 3), (4, 7), (7, 4), (1, 5)]:
        cost = rng.uniform(0, 10, (n, m))
        try:
            from posepipeline_tpu.native import solve_assignment
            rows, cols = solve_assignment(cost)
        except Exception:
            pytest.skip("native build unavailable")
        sr, sc = scipy.optimize.linear_sum_assignment(cost)
        assert cost[rows, cols].sum() == pytest.approx(cost[sr, sc].sum(), abs=1e-9)


def test_native_iou_matches_numpy():
    try:
        from posepipeline_tpu.native import iou_matrix
    except Exception:
        pytest.skip("native build unavailable")
    rng = np.random.default_rng(1)
    a = np.abs(rng.normal(50, 20, (6, 4))) + 1
    b = np.abs(rng.normal(50, 20, (9, 4))) + 1
    np.testing.assert_allclose(iou_matrix(a, b), iou_matrix_np(a, b), atol=1e-9)


def _run_scenario(tracker, trajectories, noise=0.5, drop_frames=None, seed=0):
    """trajectories: list of (T, 4) TLHW per ground-truth person.
    Returns per-frame lists of (track_id, gt_index matched by IoU)."""
    rng = np.random.default_rng(seed)
    T = trajectories[0].shape[0]
    results = []
    for t in range(T):
        boxes, gt_ids = [], []
        for g, traj in enumerate(trajectories):
            if drop_frames and (g, t) in drop_frames:
                continue
            boxes.append(traj[t] + rng.normal(0, noise, 4))
            gt_ids.append(g)
        boxes = np.array(boxes) if boxes else np.zeros((0, 4))
        scores = np.full(len(boxes), 0.9)
        tracks = tracker.step(boxes, scores)
        frame = []
        for tr in tracks:
            if len(boxes):
                ious = iou_matrix_np(tr["tlhw"][None], boxes)[0]
                frame.append((tr["track_id"], gt_ids[int(np.argmax(ious))]))
        results.append(frame)
    return results


@pytest.mark.parametrize("variant", ["bytetrack", "iou", "deepsort"])
def test_tracker_keeps_identities_on_crossing_paths(variant):
    T = 40
    t = np.arange(T, dtype=float)
    # two people crossing in x
    traj_a = np.stack([50 + 5 * t, np.full(T, 100.0), np.full(T, 40.0), np.full(T, 90.0)], 1)
    traj_b = np.stack([250 - 5 * t, np.full(T, 102.0), np.full(T, 40.0), np.full(T, 90.0)], 1)
    cfg = TrackerConfig(variant=variant)
    tracker = Tracker(cfg)
    if variant == "deepsort":
        # deepsort without embeddings degrades to IoU stage; still must work
        pass
    results = _run_scenario(tracker, [traj_a, traj_b])
    # after confirmation, exactly two track ids, consistently mapped to gt
    mapping = {}
    violations = 0
    for frame in results[5:]:
        for tid, gt in frame:
            if tid in mapping and mapping[tid] != gt:
                violations += 1
            mapping.setdefault(tid, gt)
    assert len(mapping) == 2, mapping
    # crossing may confuse IoU-only trackers briefly; allow tiny violation count
    assert violations <= (4 if variant == "iou" else 2), violations


def test_tracker_survives_short_occlusion():
    T = 30
    t = np.arange(T, dtype=float)
    traj = np.stack([50 + 3 * t, np.full(T, 80.0), np.full(T, 40.0), np.full(T, 90.0)], 1)
    tracker = Tracker(TrackerConfig(variant="bytetrack", max_age=10))
    drops = {(0, k) for k in range(15, 19)}  # 4-frame occlusion
    results = _run_scenario(tracker, [traj], drop_frames=drops)
    ids = {tid for frame in results[5:] for tid, _ in frame}
    assert len(ids) == 1, f"identity switched across occlusion: {ids}"


def test_tracker_births_and_deaths():
    tracker = Tracker(TrackerConfig(variant="bytetrack", max_age=3, min_hits=2))
    box = np.array([[10.0, 10, 30, 60]])
    # appear for 5 frames
    for _ in range(5):
        out = tracker.step(box, np.array([0.9]))
    assert len(out) == 1
    # disappear: track should die after max_age frames
    for _ in range(6):
        out = tracker.step(np.zeros((0, 4)), np.zeros(0))
    assert len(out) == 0
    assert not tracker.active.any()


def test_deepsort_uses_appearance_to_resolve_crossing():
    T = 36
    t = np.arange(T, dtype=float)
    traj_a = np.stack([50 + 5 * t, np.full(T, 100.0), np.full(T, 40.0), np.full(T, 90.0)], 1)
    traj_b = np.stack([230 - 5 * t, np.full(T, 100.0), np.full(T, 40.0), np.full(T, 90.0)], 1)
    emb_a = np.zeros(128)
    emb_a[0] = 1.0
    emb_b = np.zeros(128)
    emb_b[1] = 1.0
    tracker = Tracker(TrackerConfig(variant="deepsort"))
    rng = np.random.default_rng(0)
    # identity mapping before the crossing (frame 5) must equal the mapping
    # after the paths have fully separated again (last frame); frames near the
    # crossing itself are ambiguous for the IoU-based *test oracle*.
    snapshots = {}
    for k in range(T):
        boxes = np.stack([traj_a[k], traj_b[k]]) + rng.normal(0, 0.3, (2, 4))
        embs = np.stack([emb_a, emb_b]) + rng.normal(0, 0.01, (2, 128))
        embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
        tracks = tracker.step(boxes, np.array([0.9, 0.9]), embs)
        if k in (5, T - 1):
            snap = {}
            for tr in tracks:
                ious = iou_matrix_np(tr["tlhw"][None], boxes)[0]
                snap[tr["track_id"]] = int(np.argmax(ious))
            snapshots[k] = snap
    assert len(snapshots[5]) == 2 and len(snapshots[T - 1]) == 2
    assert snapshots[5] == snapshots[T - 1], (
        f"identity switch across crossing: {snapshots}")


def test_all_registry_variants_construct_and_run():
    for name in TRACKER_METHOD_VARIANTS:
        tracker = make_tracker(name)
        out = tracker.step(np.array([[10.0, 10, 30, 60]]), np.array([0.95]),
                           np.ones((1, 128)) / np.sqrt(128))
        assert isinstance(out, list)
