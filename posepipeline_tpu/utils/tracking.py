"""Annotation helpers for the human-in-the-loop gate.

Reference: utils/tracking.py:5-21 (``annotate_single_person`` auto-annotates
videos with exactly one track into PersonBboxValid) and utils/annotation.py
(the ipywidgets GUI; see posepipeline_tpu.utils.annotation).
"""

from __future__ import annotations

import numpy as np


def annotate_single_person(key, video_subject_id: int = 0):
    """If a TrackingBbox entry has exactly one track, auto-annotate it.

    Mirrors reference utils/tracking.py:5-21: inserts PersonBboxValid with the
    single track kept; no-op otherwise.
    """
    from ..pipeline.tracking import PersonBboxValid, TrackingBbox

    for tb_key in (TrackingBbox & key).fetch("KEY"):
        if PersonBboxValid & tb_key & {"video_subject_id": video_subject_id}:
            continue
        tracks, num_tracks = (TrackingBbox & tb_key).fetch1("tracks", "num_tracks")
        if num_tracks == 1:
            ids = np.unique([t["track_id"] for frame in tracks for t in frame])
            PersonBboxValid.insert1(
                dict(tb_key, video_subject_id=video_subject_id,
                     keep_tracks=ids.astype(int)))


def assign_video(key, video_subject_id, keep_tracks):
    """Manual annotation insert (the GUI's commit path,
    reference utils/annotation.py:60-83)."""
    from ..pipeline.tracking import PersonBboxValid

    PersonBboxValid.insert1(
        dict({k: key[k] for k in ("video_project", "filename", "tracking_method")},
             video_subject_id=video_subject_id,
             keep_tracks=np.asarray(keep_tracks, int)))


def mark_invalid_video(key, tracking_method: int):
    """Mark a video as invalid (subject_id = -1, reference convention)."""
    from ..pipeline.tracking import PersonBboxValid

    PersonBboxValid.insert1(
        dict({k: key[k] for k in ("video_project", "filename")},
             tracking_method=tracking_method,
             video_subject_id=-1, keep_tracks=np.zeros(0, int)))
