"""Ground-truth storage for evaluation and the Synthetic backend.

Plays the role of the reference's Human3.6M GT import schema
(pose_pipeline/demo/h36_dj.py:118-213: GT 2D/3D keypoints + camera calibration
stored alongside pipeline outputs) generalized to any source — synthetic
fixtures (posepipeline_tpu.testing) or real mocap datasets.
"""

from __future__ import annotations

import numpy as np

from ..core.engine import Manual
from ._schema import schema
from .video import Video


@schema
class GroundTruthKeypoints(Manual):
    definition = """
    # Ground-truth 2D (and optionally 3D) keypoints for a video
    -> Video
    ---
    keypoints          : longblob   # (T, P, J, 3) pixel-space 2D with confidence
    bboxes             : longblob   # (T, P, 4) TLHW
    keypoints3d = NULL : longblob   # (T, P, J, 3) world/camera-space 3D
    camera = NULL      : longblob   # dict: R, T, K, dist, P
    skeleton = 'coco_17' : varchar(32)
    """


def insert_synthetic_clip(clip, video_project: str = "synthetic", filename=None):
    """Ingest a posepipeline_tpu.testing.SyntheticClip with its ground truth.

    Returns the Video key.
    """
    from datetime import datetime
    import os

    filename = filename or os.path.basename(clip.path)
    key = {"video_project": video_project, "filename": filename}
    Video.insert1(dict(key, video=clip.path, start_time=datetime(2026, 1, 1)),
                  skip_duplicates=True)
    T, P = clip.keypoints.shape[:2]
    kp = np.concatenate([clip.keypoints, np.ones((T, P, 17, 1))], axis=-1)
    GroundTruthKeypoints.insert1(
        dict(key, keypoints=kp.astype(np.float32),
             bboxes=clip.bboxes.astype(np.float32), skeleton="coco_17"),
        skip_duplicates=True)
    return key
