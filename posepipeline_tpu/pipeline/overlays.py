"""Overlay-video production: device-batched rasterization + host encode.

Replaces the reference's per-frame host render loop ``video_overlay``
(utils/visualization.py:12-76: cv2 decode → python callback with cv2
drawing → VideoWriter → ffmpeg recompress). Here frames stream through
fixed-size device batches, annotation runs as one XLA program per batch
(ops/render.py scatters), and the host only encodes.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

import cv2
import numpy as np

from ..media.video import frame_batches, open_capture, write_video


def render_video(src_path: str, annotate_batch: Callable[[np.ndarray, int], np.ndarray],
                 out_path: Optional[str] = None, batch_size: int = 8,
                 downsample: int = 1) -> str:
    """Decode → annotate (batched) → encode.

    annotate_batch(frames (B, H, W, 3) uint8, start_frame_index) must return
    annotated uint8 frames of the same shape (typically a jitted ops/render
    program). ``downsample`` shrinks the output like the reference's
    ``downsample`` arg (visualization.py:16).
    """
    if out_path is None:
        fd, out_path = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
    cap = open_capture(src_path)
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    cap.release()

    def frames():
        idx = 0
        for batch, valid in frame_batches(src_path, batch_size):
            out = np.asarray(annotate_batch(batch, idx))
            for i in range(len(batch)):
                if not valid[i]:
                    break
                frame = out[i]
                if downsample > 1:
                    frame = cv2.resize(frame, (frame.shape[1] // downsample,
                                               frame.shape[0] // downsample))
                yield frame
                idx += 1

    write_video(frames(), out_path, fps=fps)
    return out_path


def pad_people(keypoints_list, num_joints: int, max_people: Optional[int] = None):
    """List over frames of (P_t, J, 3) → (T, Pmax, J, 3) + valid mask (T, Pmax).

    The fixed-shape form every device-side renderer consumes.
    """
    T = len(keypoints_list)
    P = max_people or max((len(k) for k in keypoints_list), default=1) or 1
    out = np.zeros((T, P, num_joints, 3), np.float32)
    valid = np.zeros((T, P), bool)
    for t, kp in enumerate(keypoints_list):
        kp = np.asarray(kp, np.float32).reshape(-1, num_joints, 3)[:P]
        out[t, : len(kp)] = kp
        valid[t, : len(kp)] = True
    return out, valid
