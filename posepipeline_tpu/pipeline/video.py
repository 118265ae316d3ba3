"""Video ingest and per-video metadata tables.

Reference: ``Video`` (pipeline.py:23-87) and ``VideoInfo`` (pipeline.py:90-130).
Definitions are attribute-compatible; behavior notes:

- ``Video.get_robust_reader`` validates every frame decodes and re-transcodes
  through the media layer on failure (reference re-encodes via an ffmpeg
  subprocess, pipeline.py:66-79; here cv2's encoder, media/video.py).
- ``VideoInfo.make`` rejects fps < 1 (reference pipeline.py:111-113).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

import cv2
import numpy as np

from ..core.engine import Computed, Manual
from ..media.video import robust_video_file
from ._schema import schema


@schema
class Video(Manual):
    definition = """
    # Table containing raw videos, grouped by project and filename, with their start time
    video_project       : varchar(50)
    filename            : varchar(100)
    ---
    video               : attach@localattach    # managed video file
    start_time          : timestamp             # time of beginning of video, as accurately as known
    import_time = CURRENT_TIMESTAMP : timestamp
    """

    @staticmethod
    def make_entry(filepath, session_id=None):
        """Filename → insertable row; parses %Y%m%d-%H%M%SZ timestamps
        (reference pipeline.py:36-45)."""
        _, fn = os.path.split(filepath)
        date = datetime.strptime(fn[:16], "%Y%m%d-%H%M%SZ")
        d = {"filename": fn, "video": filepath, "start_time": date}
        if session_id is not None:
            d["session_id"] = session_id
        return d

    @staticmethod
    def get_robust_reader(key, return_cap=True):
        """Fetch the video to a temp file, guaranteeing decodability.

        Returns an opened cv2.VideoCapture (caller releases) or the temp file
        path (caller deletes) — reference pipeline.py:47-87 contract.
        """
        video = (Video & key).fetch1("video")
        fixed = robust_video_file(video)
        if fixed != video:
            os.remove(video)
            video = fixed
        if return_cap:
            return cv2.VideoCapture(video)
        return video


@schema
class VideoInfo(Computed):
    definition = """
    # Video info including timestamps, delta times, num frames, height and width
    -> Video
    ---
    timestamps      : longblob
    delta_time      : longblob
    fps             : float
    height          : int
    width           : int
    num_frames      : int
    """

    def make(self, key):
        key = dict(key)
        row = (Video & key).fetch1()
        video, start_time = row["video"], row["start_time"]
        cap = cv2.VideoCapture(video)
        try:
            fps = cap.get(cv2.CAP_PROP_FPS)
            if fps < 1:
                raise ValueError(f"FPS is less than 1 ({fps})")
            frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            key["fps"] = float(fps)
            key["num_frames"] = frames
            key["width"] = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            key["height"] = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            key["timestamps"] = [start_time + timedelta(0, i / fps) for i in range(frames)]
            key["delta_time"] = [timedelta(0, i / fps).total_seconds() for i in range(frames)]
        finally:
            cap.release()
            os.remove(video)
        self.insert1(key)

    def fetch_timestamps(self):
        assert len(self) == 1, "Restrict to single entity"
        timestamps = self.fetch1("timestamps")
        return np.array([(t - timestamps[0]).total_seconds() for t in timestamps])


def insert_local_video(filename, start_time, file_path, video_project: str,
                       skip_duplicates: bool = True):
    """Ingest helper (reference utils/video_format.py:7-16)."""
    Video.insert1(
        dict(video_project=video_project, filename=filename, video=file_path,
             start_time=start_time),
        skip_duplicates=skip_duplicates)
