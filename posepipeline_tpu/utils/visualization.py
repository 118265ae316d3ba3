"""Host-callback rendering utilities (reference-parity surface).

The TPU-native render path is posepipeline_tpu.pipeline.overlays (device-
batched scatters). This module provides the reference's *host* API for code
that passes per-frame cv2 callbacks — ``video_overlay`` (reference
utils/visualization.py:12-76), ``draw_keypoints`` (:79-90) and single-frame
helpers — so reference-style user code ports unchanged.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

import cv2
import numpy as np

from ..media.video import open_capture, write_video


def video_overlay(video: str, outfile: str, callback: Callable, downsample: int = 4,
                  codec: str = "mp4v") -> str:
    """Decode → per-frame ``callback(image_rgb, idx)`` → encode.

    Matches the reference loop semantics (BGR→RGB before the callback,
    optional downsample, recompressed output).
    """
    cap = open_capture(video)
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0

    def frames():
        idx = 0
        while True:
            ret, frame = cap.read()
            if not ret or frame is None:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            out = callback(rgb, idx)
            if downsample > 1:
                out = cv2.resize(out, (out.shape[1] // downsample, out.shape[0] // downsample))
            yield out
            idx += 1

    try:
        write_video(frames(), outfile, fps=fps)
    finally:
        cap.release()
    return outfile


def draw_keypoints(image, keypoints, radius: int = 6, threshold: float = 0.2,
                   color=(255, 255, 255), border_color=(0, 0, 0)):
    """Double-circle keypoint rasterization with confidence threshold and
    clip-to-image (reference utils/visualization.py:79-90 semantics)."""
    image = np.ascontiguousarray(image)
    h, w = image.shape[:2]
    for x, y, c in np.asarray(keypoints, float).reshape(-1, 3):
        if c <= threshold or not (0 <= x < w and 0 <= y < h):
            continue
        cv2.circle(image, (int(x), int(y)), radius, border_color, -1)
        cv2.circle(image, (int(x), int(y)), max(radius - 2, 1), color, -1)
    return image


def fetch_frame(key, frame_idx: int = 0, crop_to_person: bool = False, zoom: float = 1.0):
    """Fetch one (optionally person-cropped) frame of a video
    (reference utils/visualization.py:118-161 role)."""
    from ..pipeline import PersonBbox, Video

    video = Video.get_robust_reader(key, return_cap=False)
    try:
        cap = open_capture(video)
        cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)
        ret, frame = cap.read()
        cap.release()
        if not ret:
            raise IOError(f"cannot read frame {frame_idx}")
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        os.remove(video)
    if crop_to_person and PersonBbox & key:
        bbox = np.asarray((PersonBbox & key).fetch1("bbox"))[frame_idx]
        if not np.any(np.isnan(bbox)):
            cx, cy = bbox[0] + bbox[2] / 2, bbox[1] + bbox[3] / 2
            half = max(bbox[2], bbox[3]) * zoom / 2
            x0, x1 = int(max(cx - half, 0)), int(min(cx + half, frame.shape[1]))
            y0, y1 = int(max(cy - half, 0)), int(min(cy + half, frame.shape[0]))
            frame = frame[y0:y1, x0:x1]
    return frame


def get_smpl_callback(key, joints2d=None, color=(128, 128, 255)):
    """Per-frame callback drawing projected SMPL joints (the reference's
    pyrender mesh-overlay slot, utils/visualization.py:93-115 — joint overlay
    here; full mesh rasterization is optional host work)."""
    from ..pipeline import SMPLPerson

    if joints2d is None:
        joints2d = np.asarray((SMPLPerson & key).fetch1("joints2d"))

    def callback(image, idx):
        if idx >= len(joints2d):
            return image
        kp = np.concatenate([joints2d[idx], np.ones((len(joints2d[idx]), 1))], -1)
        return draw_keypoints(image, kp, radius=4, color=color)

    return callback
