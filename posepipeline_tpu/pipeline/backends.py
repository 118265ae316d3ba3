"""Model backends powering the pipeline tables' ``make()`` methods.

The reference dispatches each Computed table to an external wrapped repo
(pipeline.py:515-569 tracking, :169-243 bottom-up, :1019-1093 top-down,
:1259-1416 lifting). Here every backend is a TPU-native path:

- frames stream through fixed-shape device batches (media.frame_batches),
- detection / embedding / 2D nets run as batched XLA programs,
- association and table bookkeeping stay on the host.

An additional ``Synthetic`` backend (color-segmentation detector + the
GroundTruthKeypoints table) provides a checkpoint-free analytic path so the
full DAG is testable with exact accuracy — the "fake backend" strategy
SURVEY.md §4 prescribes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..media.video import frame_batches, video_info
from ..models.detector import DetectorConfig, PersonDetector, ReIDModel
from ..tracking.tracker import Tracker, TrackerConfig, TRACKER_METHOD_VARIANTS, make_tracker

# Synthetic fixture palette (testing.py _PERSON_COLORS)
_SYNTH_COLORS = np.array([(255, 40, 40), (40, 255, 40), (60, 60, 255), (255, 255, 40)], float)

_detector_cache: Dict = {}


def _get_detector(input_hw) -> PersonDetector:
    key = ("det", input_hw)
    if key not in _detector_cache:
        _detector_cache[key] = PersonDetector(input_hw=input_hw)
    return _detector_cache[key]


def _get_reid() -> ReIDModel:
    if "reid" not in _detector_cache:
        _detector_cache["reid"] = ReIDModel()
    return _detector_cache["reid"]


def synthetic_detections(frames: np.ndarray):
    """Analytic color-segmentation person detector for synthetic fixtures.

    frames: (B, H, W, 3) uint8 → per-frame (boxes (N,4) TLHW, scores (N,)).
    """
    out = []
    for frame in frames:
        boxes, scores = [], []
        f = frame.astype(float)
        for c in _SYNTH_COLORS:
            dist = np.abs(f - c).sum(axis=-1)
            ys, xs = np.nonzero(dist < 150)
            if ys.size > 50:
                x0, x1 = xs.min(), xs.max()
                y0, y1 = ys.min(), ys.max()
                boxes.append([x0, y0, x1 - x0, y1 - y0])
                scores.append(0.99)
        out.append((np.array(boxes, float).reshape(-1, 4), np.array(scores, float)))
    return out


def _crop_for_reid(frames, boxes):
    """(B, H, W, 3) + (B, K, 4) → (B, K, 128, 64, 3) crops for the encoder."""
    import jax.numpy as jnp
    from ..ops.warp import crop_resize_gather

    fn = jax.vmap(lambda bx: crop_resize_gather(jnp.asarray(frames), bx, out_hw=(128, 64)),
                  in_axes=1, out_axes=1)
    return fn(jnp.asarray(boxes))


def track_video(video_path: str, method_name: str, batch_size: int = 8,
                tracker_cfg: Optional[TrackerConfig] = None) -> List[List[dict]]:
    """Run detection + tracking over a whole video.

    Returns the reference ``TrackingBbox.tracks`` format: per frame, a list of
    dicts with ``track_id`` / ``tlbr`` / ``tlhw`` / ``confidence``
    (pipeline.py:506-578).
    """
    use_embeddings = method_name in ("DeepSortYOLOv4", "MMTrack_deepsort", "FairMOT",
                                     "TraDeS", "MMTrack_qdtrack")
    if method_name == "Synthetic":
        tracker = Tracker(tracker_cfg or TrackerConfig(variant="bytetrack", min_hits=1))
    else:
        tracker = make_tracker(method_name) if tracker_cfg is None else Tracker(tracker_cfg)

    info = video_info(video_path)
    tracks: List[List[dict]] = []
    detector = None
    reid = _get_reid() if use_embeddings else None

    for frames, valid in frame_batches(video_path, batch_size):
        if method_name == "Synthetic":
            dets = synthetic_detections(frames)
            embs_b = [None] * len(frames)
        else:
            if detector is None:
                detector = _get_detector((frames.shape[1], frames.shape[2]))
            boxes_b, scores_b = detector(frames)
            boxes_b = np.asarray(boxes_b)
            scores_b = np.asarray(scores_b)
            dets = [(boxes_b[i], scores_b[i]) for i in range(len(frames))]
            if use_embeddings:
                embs = np.asarray(_crop_for_reid(frames, boxes_b))
                embs_b = [np.asarray(_get_reid()(embs[i])) for i in range(len(frames))]
            else:
                embs_b = [None] * len(frames)

        for i in range(len(frames)):
            if not valid[i]:
                break
            boxes, scores = dets[i]
            frame_tracks = tracker.step(boxes, scores, embs_b[i])
            tracks.append([
                dict(track_id=t["track_id"],
                     tlbr=np.asarray(t["tlbr"], float),
                     tlhw=np.asarray(t["tlhw"], float),
                     confidence=float(t["confidence"]))
                for t in frame_tracks])
    assert len(tracks) <= info["num_frames"] + batch_size
    return tracks


def top_down_keypoints(video_path: str, bboxes: np.ndarray, present: np.ndarray,
                       method_name: str, batch_size: int = 8) -> np.ndarray:
    """Per-frame single-person 2D keypoints from crops (reference
    wrappers/mmpose.py:26-81 contract: (T, J, 3), NaN where absent).

    Runs the whole video through the top-down net in device batches.
    """
    from ..models.topdown import get_topdown_model

    # lookup-row → registry aliases (the HRNet serving row runs the
    # checkpoint-parity arch from the extras registry)
    registry_name = {"MMPose_HRNetW48": "HRNetW48"}.get(method_name,
                                                        method_name)
    model = get_topdown_model(registry_name)
    T = len(bboxes)
    out = np.full((T, model.cfg.num_joints, 3), np.nan, np.float32)
    t = 0
    for frames, valid in frame_batches(video_path, batch_size):
        n = int(valid.sum())
        idx = np.arange(t, min(t + n, T))
        if idx.size == 0:
            break
        batch_boxes = np.zeros((batch_size, 4), np.float32)
        batch_boxes[: idx.size] = np.nan_to_num(bboxes[idx])
        kp = np.asarray(model(frames, batch_boxes))
        for j, frame_idx in enumerate(idx):
            if present[frame_idx]:
                out[frame_idx] = kp[j]
        t += n
    return out


def _hand_boxes_from_body25(body25: np.ndarray, conf_thresh: float = 0.2):
    """BODY_25 keypoints (…, 25, 3) → right/left hand square TLHW boxes
    (…, 2, 4), the OpenPose wrist/forearm heuristic: centered past the wrist
    along the forearm direction, sized by forearm length (reference OpenPose
    C++ hand detector behavior consumed via wrappers/openpose.py:37-126)."""
    kp = np.asarray(body25, np.float32)
    # BODY_25: RElbow=3 RWrist=4, LElbow=6 LWrist=7
    boxes = np.zeros(kp.shape[:-2] + (2, 4), np.float32)
    for slot, (e, w) in enumerate(((3, 4), (6, 7))):  # 0=right, 1=left
        elbow, wrist = kp[..., e, :], kp[..., w, :]
        ok = (elbow[..., 2] > conf_thresh) & (wrist[..., 2] > conf_thresh)
        fore = wrist[..., :2] - elbow[..., :2]
        length = np.linalg.norm(fore, axis=-1)
        center = wrist[..., :2] + 0.33 * fore
        size = np.maximum(1.5 * length, 24.0)
        tl = center - size[..., None] / 2.0
        box = np.concatenate([tl, np.repeat(size[..., None], 2, -1)], axis=-1)
        boxes[..., slot, :] = np.where(ok[..., None], box, 0.0)
    return boxes


def _face_boxes_from_body25(body25: np.ndarray, conf_thresh: float = 0.2):
    """BODY_25 keypoints (…, 25, 3) → square face TLHW boxes (…, 4) from the
    head keypoints (nose 0, eyes 16/15, ears 18/17) — the geometry the
    reference's OpenPose face detector_mode 0 derives from the body pose
    (wrappers/openpose.py:77-79 sets face_detector=0 = body-keypoint-driven)."""
    kp = np.asarray(body25, np.float32)
    head = kp[..., (0, 15, 16, 17, 18), :]     # (…, 5, 3)
    ok = head[..., 2] > conf_thresh
    n = np.maximum(ok.sum(-1), 1)
    cx = np.where(ok, head[..., 0], 0).sum(-1) / n
    cy = np.where(ok, head[..., 1], 0).sum(-1) / n
    # size from inter-ear (fallback inter-eye) distance
    ear_d = np.linalg.norm(kp[..., 17, :2] - kp[..., 18, :2], axis=-1)
    eye_d = np.linalg.norm(kp[..., 15, :2] - kp[..., 16, :2], axis=-1)
    size = np.maximum(np.where(ear_d > 1, ear_d * 1.6, eye_d * 3.0), 24.0)
    valid = ok.sum(-1) >= 2
    box = np.stack([cx - size / 2, cy - size / 2, size, size], axis=-1)
    return np.where(valid[..., None], box, 0.0).astype(np.float32)


_face_models = {}


def _get_face_model():
    """70-point face landmark net (OpenPose face output layout)."""
    from ..core.config import config
    from ..models.topdown import TopDownConfig, TopDownModel

    if "face" not in _face_models:
        from ..models.topdown import FACE_MODEL_DEFAULTS

        kw = dict(FACE_MODEL_DEFAULTS)
        kw.update(config.get("custom", {}).get("face_model", {}))
        for k in ("input_hw", "heatmap_hw"):
            kw[k] = tuple(kw[k])
        model = TopDownModel(TopDownConfig("face_OpenPose", **kw))
        from ..models.params_io import (commit_to_default, load_params,
                                        merge_params, registry_weights_path)

        path = registry_weights_path("topdown", "face_OpenPose")
        if path:
            model.params = commit_to_default(
                merge_params(model.params, load_params(path)))
        model.weights_loaded = bool(path)
        _face_models["face"] = model
    return _face_models["face"]


def openpose_composite(video_path: str, batch_size: int = 8,
                       max_people: int = 4):
    """OpenPose-equivalent composite: BODY_25 body keypoints AND real
    21-joint hand keypoints per person, one decode pass.

    The reference's OpenPose C++ lib internally detects hand regions from
    the body wrists and runs hand nets (wrappers/openpose.py:37-126, hand
    output consumed by pipeline.py:869-934). Here: detector proposals →
    top-down BODY_25 → wrist-derived hand boxes → 21-joint hand net, all
    batched on device per frame chunk; likewise head-derived face boxes →
    70-point face net (reference face_detector=0 mode).

    Returns (keypoints, hands, faces): lists over frames of (P, 25, 3),
    (P, 2, 21, 3) and (P, 70, 3) arrays.
    """
    from ..models.topdown import get_topdown_model
    from ..utils.skeletons import coco17_to_body25
    from .hands import _get_hand_model

    body_model = get_topdown_model("MMPose")
    hand_model = _get_hand_model("OpenPoseHands")
    face_model = _get_face_model()
    detector = None
    keypoints: List[np.ndarray] = []
    hands: List[np.ndarray] = []
    faces: List[np.ndarray] = []
    for frames, valid in frame_batches(video_path, batch_size):
        if detector is None:
            detector = _get_detector((frames.shape[1], frames.shape[2]))
        boxes_b, scores_b = detector(frames)
        boxes_b = np.asarray(boxes_b)[:, :max_people]
        scores_b = np.asarray(scores_b)[:, :max_people]
        B, P, _ = boxes_b.shape
        kp25 = np.zeros((B, P, 25, 3), np.float32)
        for p in range(P):
            kp25[:, p] = coco17_to_body25(np.asarray(body_model(frames, boxes_b[:, p])))
        hand_boxes = _hand_boxes_from_body25(kp25)  # (B, P, 2, 4)
        hand_kp = np.zeros((B, P, 2, 21, 3), np.float32)
        for p in range(P):
            for h in range(2):
                hand_kp[:, p, h] = np.asarray(hand_model(frames, hand_boxes[:, p, h]))
        # zero-confidence where no hand box could be derived
        hand_kp[hand_boxes[..., 2] <= 0] = 0.0
        face_boxes = _face_boxes_from_body25(kp25)  # (B, P, 4)
        face_kp = np.zeros((B, P, 70, 3), np.float32)
        for p in range(P):
            face_kp[:, p] = np.asarray(face_model(frames, face_boxes[:, p]))
        face_kp[face_boxes[..., 2] <= 0] = 0.0
        for i in range(B):
            if not valid[i]:
                break
            keep = scores_b[i] > 0.3
            keypoints.append(kp25[i][keep])
            hands.append(hand_kp[i][keep])
            faces.append(face_kp[i][keep])
    return keypoints, hands, faces


def bottom_up_ae_keypoints(video_path: str, batch_size: int = 8,
                           score_threshold: float = 0.15,
                           backbone: str = None) -> List[np.ndarray]:
    """True bottom-up multi-person keypoints: the associative-embedding
    heatmap+tag net (models/bottomup_ae.py), one full-frame device program
    per batch — no person detector (reference wrappers/mmpose.py:84-121).

    ``backbone`` selects the architecture ("AEBottomUp" default or
    "HigherHRNet", the checkpoint-parity mmpose AE net,
    models/higherhrnet.py); normally it comes from the BottomUpMethodLookup
    row (method selection is data — reference pipeline.py:133-147), with
    PPT_BOTTOMUP_BACKBONE kept as an env override for ad-hoc runs.

    Returns list over frames of (P, 17, 3) arrays (people with score above
    ``score_threshold``)."""
    from ..models.bottomup_ae import get_bottomup_model

    model = get_bottomup_model(
        backbone or os.environ.get("PPT_BOTTOMUP_BACKBONE", "AEBottomUp"))
    out: List[np.ndarray] = []
    for frames, valid in frame_batches(video_path, batch_size):
        people, scores = model(frames)
        people, scores = np.asarray(people), np.asarray(scores)
        for i in range(len(frames)):
            if not valid[i]:
                break
            out.append(people[i][scores[i] > score_threshold])
    return out


def bottom_up_keypoints(video_path: str, method_name: str, num_joints: int = 25,
                        batch_size: int = 8, max_people: int = 4) -> List[np.ndarray]:
    """Multi-person 2D keypoints per frame (BottomUpPeople contract:
    list over frames of (P, J, 3) arrays; reference pipeline.py:158-245).

    TPU-native composite: batched detector proposals + top-down net per
    proposal (the detector-conditioned formulation of bottom-up output).
    """
    from ..models.topdown import get_topdown_model

    model = get_topdown_model("MMPose")  # COCO-17 backbone for all bottom-up slots
    detector = None
    results: List[np.ndarray] = []
    for frames, valid in frame_batches(video_path, batch_size):
        if detector is None:
            detector = _get_detector((frames.shape[1], frames.shape[2]))
        boxes_b, scores_b = detector(frames)
        boxes_b = np.asarray(boxes_b)[:, :max_people]
        scores_b = np.asarray(scores_b)[:, :max_people]
        # run top-down on each proposal slot (B*P crops in one device batch)
        B, P, _ = boxes_b.shape
        kp = np.zeros((B, P, model.cfg.num_joints, 3), np.float32)
        for p in range(P):
            kp[:, p] = np.asarray(model(frames, boxes_b[:, p]))
        for i in range(B):
            if not valid[i]:
                break
            keep = scores_b[i] > 0.3
            results.append(kp[i][keep])
    return results
