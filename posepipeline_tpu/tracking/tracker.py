"""Multi-object trackers over batched detections.

Covers the reference's 8-entry ``TrackingBboxMethodLookup`` registry
(pipeline.py:478-494) with TPU-native backends: detection + appearance
embedding run **batched on the accelerator** (models/detector.py); the
per-frame association loop runs on the host (small dense linear algebra over
≤K slots), mirroring the reference's GPU-detect/CPU-associate split
(wrappers/deep_sort_yolov4/parser.py:50-86) but over whole frame batches.

Association variants:
- ``bytetrack``  — two-stage score-split IoU matching (high first, then low).
- ``deepsort``   — appearance-cosine matching cascade by track age, with
  Mahalanobis gating, then IoU for the remainder.
- ``iou``        — plain IoU (tracktor-style propagation without regression).
- ``jde``        — joint embedding+IoU single-stage (FairMOT/qdtrack-style).

Track lifecycle (births, tentative→confirmed, max-age deaths) follows the
DeepSORT/ByteTrack conventions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import scipy.optimize

from .kalman import CHI2_95_4DOF, KalmanBank


def iou_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """TLHW pairwise IoU (host-side small matrices)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    a1 = a[:, None, :2]
    a2 = a1 + a[:, None, 2:]
    b1 = b[None, :, :2]
    b2 = b1 + b[None, :, 2:]
    inter = np.prod(np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None), axis=-1)
    union = (np.prod(a[:, None, 2:], -1) + np.prod(b[None, :, 2:], -1) - inter + 1e-8)
    return inter / union


def linear_assignment(cost: np.ndarray, max_cost: float):
    """Hungarian assignment with cost threshold → (pairs, unmatched_rows, unmatched_cols).

    Uses the native C++ solver when built (native/assignment.cpp), else scipy.
    """
    if cost.size == 0:
        return (np.zeros((0, 2), int), np.arange(cost.shape[0]), np.arange(cost.shape[1]))
    try:
        from ..native import solve_assignment
        rows, cols = solve_assignment(cost)
    except Exception:
        rows, cols = scipy.optimize.linear_sum_assignment(cost)
    pairs = []
    for r, c in zip(rows, cols):
        if cost[r, c] <= max_cost:
            pairs.append((r, c))
    pairs = np.array(pairs, int).reshape(-1, 2)
    um_r = np.setdiff1d(np.arange(cost.shape[0]), pairs[:, 0] if len(pairs) else [])
    um_c = np.setdiff1d(np.arange(cost.shape[1]), pairs[:, 1] if len(pairs) else [])
    return pairs, um_r, um_c


@dataclass
class TrackerConfig:
    variant: str = "bytetrack"       # bytetrack | deepsort | iou | jde
    det_threshold: float = 0.5       # high-score split / detection acceptance
    low_threshold: float = 0.1       # bytetrack low-score second stage
    iou_threshold: float = 0.3       # min IoU to match
    max_age: int = 30                # frames a lost track survives
    min_hits: int = 3                # hits before a track is confirmed
    max_tracks: int = 64             # slot bank size
    appearance_weight: float = 0.7   # jde cost mix
    max_cosine_distance: float = 0.3
    ema_alpha: float = 0.9           # embedding EMA
    jde_gate: float = 0.8            # jde mixed-cost acceptance threshold


class Tracker:
    """Stateful multi-object tracker over one video."""

    def __init__(self, cfg: Optional[TrackerConfig] = None):
        self.cfg = cfg = cfg if cfg is not None else TrackerConfig()
        K = cfg.max_tracks
        self.kf = KalmanBank(K)
        self.active = np.zeros(K, bool)
        self.confirmed = np.zeros(K, bool)
        self.track_id = np.full(K, -1, int)
        self.hits = np.zeros(K, int)
        self.misses = np.zeros(K, int)
        self.embedding = np.zeros((K, 128))
        self.det_conf = np.zeros(K)      # last matched detection score
        self._next_id = 0

    # ------------------------------------------------------------------
    def _new_slots(self, n: int) -> np.ndarray:
        free = np.flatnonzero(~self.active)[:n]
        return free

    def _spawn(self, boxes_tlhw: np.ndarray, scores: np.ndarray,
               embeddings: Optional[np.ndarray]):
        slots = self._new_slots(len(boxes_tlhw))
        if slots.size == 0:
            return
        boxes_tlhw = boxes_tlhw[: slots.size]
        self.det_conf[slots] = scores[: slots.size]
        self.kf.initiate(slots, KalmanBank.tlhw_to_xyah(boxes_tlhw))
        self.active[slots] = True
        self.confirmed[slots] = self.cfg.min_hits <= 1
        self.hits[slots] = 1
        self.misses[slots] = 0
        self.track_id[slots] = np.arange(self._next_id, self._next_id + slots.size)
        self._next_id += slots.size
        if embeddings is not None:
            self.embedding[slots] = embeddings[: slots.size]

    def _mark_matched(self, slots, boxes_tlhw, scores, embeddings):
        self.kf.update(slots, KalmanBank.tlhw_to_xyah(boxes_tlhw))
        self.det_conf[slots] = scores
        self.hits[slots] += 1
        self.misses[slots] = 0
        self.confirmed[slots] |= self.hits[slots] >= self.cfg.min_hits
        if embeddings is not None:
            a = self.cfg.ema_alpha
            self.embedding[slots] = a * self.embedding[slots] + (1 - a) * embeddings
            norms = np.linalg.norm(self.embedding[slots], axis=-1, keepdims=True)
            self.embedding[slots] /= np.maximum(norms, 1e-8)

    def _age_unmatched(self, slots):
        self.misses[slots] += 1
        kill = self.misses[slots] > self.cfg.max_age
        # unconfirmed tracks die on the first miss (DeepSORT tentative rule)
        kill |= ~self.confirmed[slots]
        dead = slots[kill]
        self.active[dead] = False
        self.confirmed[dead] = False

    # ------------------------------------------------------------------
    def _cost_iou(self, slots, boxes):
        return 1.0 - iou_matrix_np(self.kf.tlhw(slots), boxes)

    def _cost_appearance(self, slots, embeddings, boxes):
        cos = 1.0 - self.embedding[slots] @ embeddings.T
        gate = self.kf.gating_distance(slots, KalmanBank.tlhw_to_xyah(boxes))
        cos[gate > CHI2_95_4DOF] = 1e5
        return cos

    def step(self, boxes: np.ndarray, scores: np.ndarray,
             embeddings: Optional[np.ndarray] = None) -> List[Dict]:
        """Advance one frame.

        boxes: (N, 4) TLHW (may include padded rows); scores: (N,);
        embeddings: optional (N, D) appearance features.

        Returns the reference ``TrackingBbox`` per-frame track list format
        (pipeline.py:506-578): dicts with track_id / tlbr / tlhw / confidence.
        """
        cfg = self.cfg
        boxes = np.asarray(boxes, float)
        scores = np.asarray(scores, float)
        keep = scores >= cfg.low_threshold
        boxes, scores = boxes[keep], scores[keep]
        if embeddings is not None:
            embeddings = np.asarray(embeddings, float)[keep]

        self.kf.predict(self.active)
        act = np.flatnonzero(self.active)

        high = scores >= cfg.det_threshold
        d_hi = np.flatnonzero(high)
        d_lo = np.flatnonzero(~high)

        matched_slots, matched_dets = [], []

        if cfg.variant == "deepsort" and embeddings is not None and act.size and d_hi.size:
            # appearance cascade by age (fresher tracks match first)
            remaining = list(d_hi)
            for age in range(cfg.max_age + 1):
                if not remaining:
                    break
                tier = act[(self.misses[act] == age) & self.confirmed[act]]
                tier = np.array([t for t in tier if t not in matched_slots], int)
                if tier.size == 0:
                    continue
                dets = np.array(remaining, int)
                cost = self._cost_appearance(tier, embeddings[dets], boxes[dets])
                pairs, _, _ = linear_assignment(cost, cfg.max_cosine_distance)
                for r, c in pairs:
                    matched_slots.append(tier[r])
                    matched_dets.append(dets[c])
                    remaining.remove(dets[c])
            d_hi = np.array(remaining, int)

        # IoU stage (primary for bytetrack/iou/jde; fallback for deepsort)
        free_act = np.array([t for t in act if t not in matched_slots], int)
        if free_act.size and d_hi.size:
            cost = self._cost_iou(free_act, boxes[d_hi])
            if cfg.variant == "jde" and embeddings is not None:
                app = self._cost_appearance(free_act, embeddings[d_hi], boxes[d_hi])
                w = cfg.appearance_weight
                cost = w * np.minimum(app, 1.0) + (1 - w) * cost
            pairs, _, _ = linear_assignment(cost, 1.0 - cfg.iou_threshold
                                            if cfg.variant != "jde" else cfg.jde_gate)
            for r, c in pairs:
                matched_slots.append(free_act[r])
                matched_dets.append(d_hi[c])
            d_hi = np.setdiff1d(d_hi, [matched_dets[i] for i in range(len(matched_dets))])

        # bytetrack second stage: low-score dets vs still-unmatched confirmed tracks
        if cfg.variant == "bytetrack" and d_lo.size:
            free_act = np.array([t for t in act
                                 if t not in matched_slots and self.confirmed[t]], int)
            if free_act.size:
                cost = self._cost_iou(free_act, boxes[d_lo])
                pairs, _, _ = linear_assignment(cost, 1.0 - max(cfg.iou_threshold, 0.5))
                for r, c in pairs:
                    matched_slots.append(free_act[r])
                    matched_dets.append(d_lo[c])

        matched_slots = np.array(matched_slots, int)
        matched_dets = np.array(matched_dets, int)
        if matched_slots.size:
            self._mark_matched(matched_slots, boxes[matched_dets], scores[matched_dets],
                               embeddings[matched_dets] if embeddings is not None else None)

        unmatched = np.setdiff1d(act, matched_slots)
        self._age_unmatched(unmatched)

        # births from unmatched high-score detections
        spawn_dets = np.setdiff1d(np.flatnonzero(high), matched_dets)
        if spawn_dets.size:
            self._spawn(boxes[spawn_dets], scores[spawn_dets],
                        embeddings[spawn_dets] if embeddings is not None else None)

        # emit confirmed, currently-seen tracks
        out = []
        vis = np.flatnonzero(self.active & self.confirmed & (self.misses == 0))
        for s in vis:
            tlhw = self.kf.tlhw(np.array([s]))[0]
            tlbr = np.array([tlhw[0], tlhw[1], tlhw[0] + tlhw[2], tlhw[1] + tlhw[3]])
            out.append(dict(track_id=int(self.track_id[s]), tlhw=tlhw, tlbr=tlbr,
                            confidence=float(self.det_conf[s])))
        return out


# Reference TrackingBboxMethodLookup name → tracker variant
# (pipeline.py:478-494). All share the TPU detector; the association math is
# the distinguishing component each external repo provided.
TRACKER_METHOD_VARIANTS = {
    "DeepSortYOLOv4": TrackerConfig(variant="deepsort"),
    "MMTrack_tracktor": TrackerConfig(variant="iou", det_threshold=0.6),
    "FairMOT": TrackerConfig(variant="jde"),
    "TransTrack": TrackerConfig(variant="iou", det_threshold=0.4),
    "TraDeS": TrackerConfig(variant="jde", appearance_weight=0.5),
    "MMTrack_deepsort": TrackerConfig(variant="deepsort"),
    "MMTrack_bytetrack": TrackerConfig(variant="bytetrack"),
    "MMTrack_qdtrack": TrackerConfig(variant="jde", appearance_weight=0.8),
}


def make_tracker(method_name: str) -> Tracker:
    return Tracker(TRACKER_METHOD_VARIANTS[method_name])
