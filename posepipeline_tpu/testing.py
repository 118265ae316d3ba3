"""Synthetic test fixtures: procedurally generated "clinical" videos with
exact ground-truth boxes and keypoints.

The reference has no automated tests (SURVEY.md §4); its QA protocol is
notebook-driven plus the Human3.6M ground-truth import
(reference pose_pipeline/demo/h36_dj.py:118-213). This module gives the new
framework what the reference lacked: deterministic fixtures where every stage
(detection, tracking, 2D, lifting, rendering) can be validated against exact
ground truth without model checkpoints.

A synthetic person is a stick figure (COCO-17 skeleton) walking sinusoidally.
Each person gets a distinct saturated color so analytic (model-free) backends
can recover boxes/keypoints exactly — the "fake backend" that exercises the
table engine end-to-end.
"""

from __future__ import annotations

import os
import tempfile
from typing import List, Optional

import cv2
import numpy as np

from .media.video import write_video

COCO_JOINT_NAMES = [
    "Nose", "Left Eye", "Right Eye", "Left Ear", "Right Ear",
    "Left Shoulder", "Right Shoulder", "Left Elbow", "Right Elbow",
    "Left Wrist", "Right Wrist", "Left Hip", "Right Hip",
    "Left Knee", "Right Knee", "Left Ankle", "Right Ankle",
]

COCO_SKELETON = [
    (5, 7), (7, 9), (6, 8), (8, 10),       # arms
    (11, 13), (13, 15), (12, 14), (14, 16),  # legs
    (5, 6), (11, 12), (5, 11), (6, 12),      # torso
    (0, 1), (0, 2), (1, 3), (2, 4),          # face
]

_PERSON_COLORS = [(255, 40, 40), (40, 255, 40), (60, 60, 255), (255, 255, 40)]


def stick_figure(center_x: float, center_y: float, scale: float, phase: float) -> np.ndarray:
    """COCO-17 joint positions (pixels) of a walking stick figure.

    ``scale`` is roughly the person height in pixels; ``phase`` animates gait.
    """
    s = scale
    swing = 0.12 * np.sin(phase)
    j = np.zeros((17, 2), dtype=np.float64)
    head_y = center_y - 0.38 * s
    j[0] = (center_x, head_y)                          # nose
    j[1] = (center_x - 0.02 * s, head_y - 0.02 * s)    # eyes
    j[2] = (center_x + 0.02 * s, head_y - 0.02 * s)
    j[3] = (center_x - 0.045 * s, head_y)              # ears
    j[4] = (center_x + 0.045 * s, head_y)
    sh_y = center_y - 0.28 * s
    j[5] = (center_x - 0.10 * s, sh_y)                 # shoulders
    j[6] = (center_x + 0.10 * s, sh_y)
    j[7] = (center_x - 0.13 * s, sh_y + 0.14 * s + swing * s * 0.3)   # elbows
    j[8] = (center_x + 0.13 * s, sh_y + 0.14 * s - swing * s * 0.3)
    j[9] = (center_x - 0.14 * s, sh_y + 0.27 * s + swing * s * 0.6)   # wrists
    j[10] = (center_x + 0.14 * s, sh_y + 0.27 * s - swing * s * 0.6)
    hip_y = center_y + 0.02 * s
    j[11] = (center_x - 0.07 * s, hip_y)               # hips
    j[12] = (center_x + 0.07 * s, hip_y)
    j[13] = (center_x - 0.07 * s + swing * s, hip_y + 0.20 * s)       # knees
    j[14] = (center_x + 0.07 * s - swing * s, hip_y + 0.20 * s)
    j[15] = (center_x - 0.07 * s + 2 * swing * s, hip_y + 0.40 * s)   # ankles
    j[16] = (center_x + 0.07 * s - 2 * swing * s, hip_y + 0.40 * s)
    return j


def _draw_person(frame: np.ndarray, joints: np.ndarray, color, thickness: int) -> None:
    for a, b in COCO_SKELETON:
        pa = tuple(np.round(joints[a]).astype(int))
        pb = tuple(np.round(joints[b]).astype(int))
        cv2.line(frame, pa, pb, color, thickness)
    for (x, y) in joints:
        cv2.circle(frame, (int(round(x)), int(round(y))), max(2, thickness), color, -1)
    # head disc (gives the face-blur path something nose/neck shaped)
    cv2.circle(frame, tuple(np.round(joints[0]).astype(int)), thickness * 3, color, -1)


class SyntheticClip:
    """Ground truth container for one synthetic clip."""

    def __init__(self, path, fps, width, height, keypoints, bboxes, colors):
        self.path = path
        self.fps = fps
        self.width = width
        self.height = height
        self.keypoints = keypoints   # (T, N, 17, 2) float pixels
        self.bboxes = bboxes         # (T, N, 4) TLHW float
        self.colors = colors         # per-person RGB

    @property
    def num_frames(self):
        return self.keypoints.shape[0]

    @property
    def num_people(self):
        return self.keypoints.shape[1]


def synthetic_frames(batch: int, height: int = 96, width: int = 128,
                     rng: Optional[np.random.Generator] = None):
    """In-memory batch of single-person frames with GT (for training loops).

    Returns (frames (B, H, W, 3) uint8, bboxes (B, 4) TLHW, keypoints (B, 17, 2)).
    """
    rng = rng or np.random.default_rng(0)
    frames = np.full((batch, height, width, 3), 16, np.uint8)
    boxes = np.zeros((batch, 4), np.float32)
    kps = np.zeros((batch, 17, 2), np.float32)
    for b in range(batch):
        scale = rng.uniform(0.35, 0.6) * height
        cx = rng.uniform(0.25, 0.75) * width
        cy = rng.uniform(0.45, 0.6) * height
        joints = stick_figure(cx, cy, scale, rng.uniform(0, 2 * np.pi))
        _draw_person(frames[b], joints, _PERSON_COLORS[b % len(_PERSON_COLORS)],
                     thickness=max(2, int(scale / 60)))
        kps[b] = joints
        margin = max(4.0, scale / 20.0)
        mins = joints.min(0) - margin
        maxs = joints.max(0) + margin
        boxes[b] = [mins[0], mins[1], maxs[0] - mins[0], maxs[1] - mins[1]]
    return frames, boxes, kps


def synthetic_video(
    num_frames: int = 60,
    width: int = 640,
    height: int = 480,
    num_people: int = 1,
    fps: float = 30.0,
    seed: int = 0,
    path: Optional[str] = None,
    noise: float = 0.0,
    hard: bool = False,
) -> SyntheticClip:
    """Render a walking-stick-figure clip and return it with ground truth.

    ``hard=True`` is the **hardened eval protocol** (VERDICT r3 weak #2: the
    easy protocol saturated at PCK 1.000 and stopped measuring anything).
    It adds, deterministically per seed:

    - background clutter: random gradient + line/rectangle distractors in
      person-like colors,
    - a moving occluder bar that periodically crosses each subject,
    - wider scale range (small people down to 0.22×height) and per-frame
      brightness jitter,
    - one *distractor person* (smaller, not ground truth) when
      ``num_people == 1``, so detection must pick the subject.

    Ground truth keypoints/boxes stay exact for the ``num_people`` subjects;
    the distractor is rendered but not annotated (like an unannotated
    passer-by in clinical footage — the reference's annotation gate exists
    for exactly these, reference pipeline.py:637-707).
    """
    rng = np.random.default_rng(seed)
    if path is None:
        fd, path = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)

    if hard:
        scales = rng.uniform(0.22, 0.6, num_people) * height
    else:
        scales = rng.uniform(0.35, 0.5, num_people) * height
    x0 = rng.uniform(0.2, 0.8, num_people) * width
    y0 = np.full(num_people, 0.52) * height
    vx = rng.uniform(-2.0, 2.0, num_people)
    phase0 = rng.uniform(0, 2 * np.pi, num_people)

    # hardened-protocol furniture (fixed per clip, deterministic)
    if hard:
        n_clutter = 6
        cl_xy = rng.uniform(0, 1, (n_clutter, 2)) * [width, height]
        cl_wh = rng.uniform(0.04, 0.18, (n_clutter, 2)) * [width, height]
        cl_col = [tuple(int(c) for c in rng.integers(30, 200, 3))
                  for _ in range(n_clutter)]
        grad = (np.linspace(0, rng.uniform(10, 40), width)[None, :, None]
                + np.linspace(0, rng.uniform(5, 25), height)[:, None, None])
        occ_w = rng.uniform(0.04, 0.09) * width
        occ_speed = rng.uniform(2.0, 5.0) * (1 if rng.random() < 0.5 else -1)
        occ_x0 = rng.uniform(0, width)
        # distractor person (unannotated) when the clip is single-subject
        dis_scale = (0.55 + 0.2 * rng.random()) * scales[0]
        dis_x0 = rng.uniform(0.2, 0.8) * width
        dis_vx = rng.uniform(-3.0, 3.0)
        dis_phase = rng.uniform(0, 2 * np.pi)

    all_joints = np.zeros((num_frames, num_people, 17, 2))
    frames: List[np.ndarray] = []
    for t in range(num_frames):
        frame = np.full((height, width, 3), 16, dtype=np.uint8)
        if hard:
            b = 1.0 + 0.25 * np.sin(0.13 * t + seed)   # brightness flicker
            frame = np.clip(frame + grad * b, 0, 255).astype(np.uint8)
            for i in range(n_clutter):
                x, y = cl_xy[i]
                w_, h_ = cl_wh[i]
                cv2.rectangle(frame, (int(x), int(y)),
                              (int(x + w_), int(y + h_)), cl_col[i], 2)
        if noise > 0:
            frame = np.clip(
                frame.astype(np.int16) + rng.integers(-int(noise), int(noise) + 1, frame.shape),
                0, 255).astype(np.uint8)
        if hard and num_people == 1:
            # unannotated distractor behind the subject
            dx = np.clip(dis_x0 + dis_vx * t, 0.1 * width, 0.9 * width)
            dj = stick_figure(dx, 0.5 * height, dis_scale, dis_phase + 0.3 * t)
            _draw_person(frame, dj, _PERSON_COLORS[3],
                         thickness=max(2, int(dis_scale / 60)))
        for p in range(num_people):
            cx = x0[p] + vx[p] * t
            cx = np.clip(cx, 0.15 * width, 0.85 * width)
            joints = stick_figure(cx, y0[p], scales[p], phase0[p] + 0.25 * t)
            all_joints[t, p] = joints
            _draw_person(frame, joints, _PERSON_COLORS[p % len(_PERSON_COLORS)],
                         thickness=max(2, int(scales[p] / 60)))
        if hard:
            # occluder bar crosses the scene in front of everyone
            ox = (occ_x0 + occ_speed * t) % (width + occ_w) - occ_w / 2
            cv2.rectangle(frame, (int(ox), 0), (int(ox + occ_w), height),
                          (90, 90, 90), -1)
        frames.append(frame)

    # TLHW ground-truth boxes with a margin covering limb/round-cap thickness
    margin = np.maximum(4.0, scales / 20.0)[None, :, None]
    mins = all_joints.min(axis=2) - margin  # (T, N, 2)
    maxs = all_joints.max(axis=2) + margin
    tl = mins
    hw = maxs - mins
    bboxes = np.concatenate([tl, hw], axis=-1)  # (T, N, 4) = (x, y, w, h)

    # pinned to the cv2/mp4v writer: fixtures must stay byte-comparable
    # across rounds (bench clip cache, decode-oracle tolerances) regardless
    # of which artifact codec write_video prefers
    write_video(iter(frames), path, fps=fps, codec="mp4v")
    colors = [_PERSON_COLORS[p % len(_PERSON_COLORS)] for p in range(num_people)]
    return SyntheticClip(path, fps, width, height, all_joints, bboxes, colors)


def synthetic_multi_frames(batch: int, height: int = 128, width: int = 160,
                           num_people: int = 2,
                           rng: Optional[np.random.Generator] = None):
    """In-memory multi-person frames with GT (AE bottom-up training).

    Returns (frames (B, H, W, 3) uint8, keypoints (B, P, 17, 2)).
    People are laid out in non-overlapping horizontal bands so identity
    ground truth is unambiguous for grouping losses.
    """
    rng = rng or np.random.default_rng(0)
    frames = np.full((batch, height, width, 3), 16, np.uint8)
    kps = np.zeros((batch, num_people, 17, 2), np.float32)
    band = width / num_people
    for b in range(batch):
        for p in range(num_people):
            scale = rng.uniform(0.35, 0.55) * height
            cx = (p + rng.uniform(0.35, 0.65)) * band
            cy = rng.uniform(0.45, 0.6) * height
            phase = rng.uniform(0, 2 * np.pi)
            j = stick_figure(cx, cy, scale, phase)
            _draw_person(frames[b], j, _PERSON_COLORS[p % len(_PERSON_COLORS)],
                         thickness=max(2, int(scale / 40)))
            kps[b, p] = j
    return frames, kps


HAND_SKELETON = [(0, 1), (1, 2), (2, 3), (3, 4),
                 (0, 5), (5, 6), (6, 7), (7, 8),
                 (0, 9), (9, 10), (10, 11), (11, 12),
                 (0, 13), (13, 14), (14, 15), (15, 16),
                 (0, 17), (17, 18), (18, 19), (19, 20)]


def stick_hand(cx: float, cy: float, scale: float, curl: float,
               rot: float) -> np.ndarray:
    """21-joint hand (OpenPose/COCO hand convention: wrist + 5×4 finger
    chain) at pixel center, ``scale`` ≈ hand length, ``curl`` flexes
    fingers, ``rot`` rotates the whole hand."""
    j = np.zeros((21, 2))
    j[0] = (0.0, 0.45)                       # wrist at the bottom
    angles = np.deg2rad([-55, -25, 0, 25, 50])   # thumb..pinky spread
    lengths = (0.5, 0.95, 1.0, 0.95, 0.8)
    for f in range(5):
        a = angles[f]
        seg = lengths[f] * scale / 4.0
        base = np.array([np.sin(a), -np.cos(a)])
        pos = np.array(j[0]) * scale
        ang = a
        for k in range(4):
            ang += curl * 0.35                # progressive flexion
            step = seg * np.array([np.sin(ang), -np.cos(ang)])
            pos = pos + step
            j[1 + f * 4 + k] = pos / scale
    pts = j * scale
    c, s = np.cos(rot), np.sin(rot)
    R = np.array([[c, -s], [s, c]])
    pts = pts @ R.T
    pts[:, 0] += cx
    pts[:, 1] += cy
    return pts


def synthetic_hand_frames(batch: int, height: int = 128, width: int = 128,
                          rng: Optional[np.random.Generator] = None):
    """In-memory hand-crop training frames with exact 21-joint GT.

    Returns (frames (B, H, W, 3) uint8, boxes (B, 4) TLHW, keypoints
    (B, 21, 2)) — the hand analogue of synthetic_frames."""
    rng = rng or np.random.default_rng(0)
    frames = np.full((batch, height, width, 3), 16, np.uint8)
    boxes = np.zeros((batch, 4), np.float32)
    kps = np.zeros((batch, 21, 2), np.float32)
    for b in range(batch):
        scale = rng.uniform(0.4, 0.7) * height
        cx = rng.uniform(0.35, 0.65) * width
        cy = rng.uniform(0.45, 0.7) * height
        j = stick_hand(cx, cy, scale, curl=rng.uniform(0, 1.1),
                       rot=rng.uniform(-0.8, 0.8))
        color = _PERSON_COLORS[b % len(_PERSON_COLORS)]
        th = max(2, int(scale / 30))
        for a, bb in HAND_SKELETON:
            cv2.line(frames[b], tuple(np.round(j[a]).astype(int)),
                     tuple(np.round(j[bb]).astype(int)), color, th)
        for (x, y) in j:
            cv2.circle(frames[b], (int(round(x)), int(round(y))), th, color, -1)
        kps[b] = j
        margin = max(4.0, scale / 15.0)
        mins = j.min(0) - margin
        maxs = j.max(0) + margin
        boxes[b] = [mins[0], mins[1], maxs[0] - mins[0], maxs[1] - mins[1]]
    return frames, boxes, kps
