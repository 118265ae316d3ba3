"""Multi-person tracking tables and the single-person reduction.

Reference tables: TrackingBboxMethodLookup/Method/TrackingBbox(+Video)
(pipeline.py:478-634), PersonBboxValid (:637-644), PersonBbox (:647-707),
DetectedFrames/BestDetectedFrames (:710-785). Definitions are
attribute-compatible; the 8 tracker registry entries all dispatch to the
TPU-native detector + association variants (tracking/tracker.py) instead of
8 external CUDA repos.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.engine import Computed, Lookup, Manual
from ..ops.boxes import impute_bbox_gaps
from ._schema import schema
from .bottomup import BlurredVideo
from .video import Video, VideoInfo


@schema
class TrackingBboxMethodLookup(Lookup):
    definition = """
    tracking_method      : int
    ---
    tracking_method_name : varchar(50)
    """
    contents = [
        {"tracking_method": 0, "tracking_method_name": "DeepSortYOLOv4"},
        {"tracking_method": 1, "tracking_method_name": "MMTrack_tracktor"},
        {"tracking_method": 2, "tracking_method_name": "FairMOT"},
        {"tracking_method": 3, "tracking_method_name": "TransTrack"},
        {"tracking_method": 4, "tracking_method_name": "TraDeS"},
        {"tracking_method": 5, "tracking_method_name": "MMTrack_deepsort"},
        {"tracking_method": 6, "tracking_method_name": "MMTrack_bytetrack"},
        {"tracking_method": 7, "tracking_method_name": "MMTrack_qdtrack"},
        {"tracking_method": 100, "tracking_method_name": "Synthetic"},
    ]


@schema
class TrackingBboxMethod(Manual):
    definition = """
    -> Video
    tracking_method   : int
    ---
    """


@schema
class TrackingBbox(Computed):
    definition = """
    -> TrackingBboxMethod
    ---
    tracks            : longblob
    num_tracks        : int
    """

    def make(self, key):
        from . import backends

        key = dict(key)
        method_name = (TrackingBboxMethodLookup & key).fetch1("tracking_method_name")
        video = Video.get_robust_reader(key, return_cap=False)
        try:
            tracks = backends.track_video(video, method_name)
        finally:
            if os.path.exists(video):
                os.remove(video)
        track_ids = np.unique([t["track_id"] for frame in tracks for t in frame])
        key["tracks"] = tracks
        key["num_tracks"] = len(track_ids)
        self.insert1(key)


@schema
class TrackingBboxVideo(Computed):
    definition = """
    -> BlurredVideo
    -> TrackingBbox
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        """Annotated per-track colored boxes + ID labels — the artifact humans
        annotate from (reference pipeline.py:581-634). Boxes rasterize on
        device; ID text burns in on host (text is not a tensor op)."""
        import cv2

        from ..ops.render import draw_boxes, track_colors
        from .overlays import render_video

        key = dict(key)
        video = (BlurredVideo & key).fetch1("output_video")
        tracks = (TrackingBbox & key).fetch1("tracks")
        ids = np.unique([t["track_id"] for frame in tracks for t in frame])
        id_to_idx = {int(i): n for n, i in enumerate(ids)}
        colors = track_colors(max(len(ids), 1))

        T = len(tracks)
        N = max((len(f) for f in tracks), default=1) or 1
        boxes = np.zeros((T, N, 4), np.float32)
        valid = np.zeros((T, N), bool)
        box_colors = np.zeros((T, N, 3), np.uint8)
        for t, frame in enumerate(tracks):
            for n, tr in enumerate(frame[:N]):
                boxes[t, n] = tr["tlhw"]
                valid[t, n] = True
                box_colors[t, n] = colors[id_to_idx[int(tr["track_id"])]]

        def annotate(frames, start):
            B = len(frames)
            b = _pad_time(boxes, start, B)
            v = _pad_time(valid, start, B)
            c = _pad_time(box_colors, start, B)
            out = np.array(draw_boxes(frames, b, c, valid=v, radius=2))  # writable copy for cv2 text
            # host text pass for track-id labels
            for i in range(B):
                t = start + i
                if t >= T:
                    break
                for tr in tracks[t]:
                    x = int(tr["tlhw"][0] + tr["tlhw"][2] / 2)
                    y = int(tr["tlhw"][1] + tr["tlhw"][3] / 2)
                    c_ = tuple(int(x_) for x_ in colors[id_to_idx[int(tr["track_id"])]])
                    cv2.putText(out[i], str(int(tr["track_id"])), (x, y),
                                cv2.FONT_HERSHEY_SIMPLEX, 5e-3 * out[i].shape[0],
                                c_, 2)
            return out

        out_path = render_video(video, annotate)
        key["output_video"] = out_path
        self.insert1(key)
        os.remove(video)
        os.remove(out_path)


def _pad_time(arr, start, length):
    seg = arr[start: start + length]
    if len(seg) < length:
        seg = np.concatenate([seg, np.zeros((length - len(seg),) + arr.shape[1:], arr.dtype)])
    return seg


@schema
class PersonBboxValid(Manual):
    definition = """
    -> TrackingBbox
    video_subject_id        : int
    ---
    keep_tracks             : longblob
    """


@schema
class PersonBbox(Computed):
    definition = """
    -> PersonBboxValid
    ---
    bbox               : longblob
    present            : longblob
    """

    def make(self, key):
        key = dict(key)
        tracks = (TrackingBbox & key).fetch1("tracks")
        keep_tracks = list(np.asarray((PersonBboxValid & key).fetch1("keep_tracks")).ravel())

        T = len(tracks)
        present = np.zeros(T, bool)
        bbox = np.zeros((T, 4), float)
        for t, frame in enumerate(tracks):
            valid = [tr for tr in frame if tr["track_id"] in keep_tracks]
            if len(valid) == 1:
                present[t] = True
                bbox[t] = valid[0]["tlhw"]
        # smooth brief gaps (reference uses pandas bfill/ffill limit=2,
        # pipeline.py:677-685); unfilled frames carry NaN boxes
        bbox[~present] = np.nan
        present2, bbox2 = impute_bbox_gaps(present, bbox, limit=2)
        bbox2[~present2] = np.nan
        key["present"] = present2
        key["bbox"] = bbox2
        self.insert1(key)

    @staticmethod
    def get_overlay_fn(key):
        bboxes = (PersonBbox & key).fetch1("bbox")

        def overlay_fn(image, idx, width=6, color=(255, 255, 255)):
            import cv2
            bbox = np.array(bboxes[idx], float).copy()
            if np.any(np.isnan(bbox)):
                return image
            bbox[2:] = bbox[:2] + bbox[2:]
            cv2.rectangle(image, (int(bbox[0]), int(bbox[1])),
                          (int(bbox[2]), int(bbox[3])), color, width)
            return image

        return overlay_fn

    @property
    def key_source(self):
        return PersonBboxValid & "video_subject_id >= 0"


@schema
class DetectedFrames(Computed):
    definition = """
    -> PersonBboxValid
    -> VideoInfo
    ---
    frames_detected        : int
    frames_missed          : int
    fraction_found         : float
    mean_other_people      : float
    median_confidence      : float
    frame_data             : longblob
    """

    def make(self, key):
        key = dict(key)
        tracks = (TrackingBbox & key).fetch1("tracks")
        keep_tracks = list(np.asarray((PersonBboxValid & key).fetch1("keep_tracks")).ravel())

        stats = []
        for frame in tracks:
            valid = [t for t in frame if t["track_id"] in keep_tracks]
            if len(valid) == 1:
                stats.append({"present": True,
                              "confidence": float(valid[0].get("confidence", 1.0)),
                              "others": len(frame) - 1})
            else:
                stats.append({"present": False, "confidence": 0, "others": len(frame)})

        present = np.array([s["present"] for s in stats])
        key["frames_detected"] = int(present.sum())
        key["frames_missed"] = int((~present).sum())
        key["fraction_found"] = key["frames_detected"] / max(len(present), 1)
        key["median_confidence"] = (float(np.median([s["confidence"] for s in stats
                                                     if s["present"]]))
                                    if key["frames_detected"] > 0 else 0.0)
        key["mean_other_people"] = float(np.nanmean([s["others"] for s in stats])) if stats else 0.0
        key["frame_data"] = stats
        self.insert1(key)

    @property
    def key_source(self):
        return PersonBboxValid & "video_subject_id >= 0"


@schema
class BestDetectedFrames(Computed):
    definition = """
    -> DetectedFrames
    """

    def make(self, key):
        """Argmax fraction_found across tracking methods per video
        (reference pipeline.py:769-785)."""
        video_key = {k: key[k] for k in ("video_project", "filename")}
        rows = (DetectedFrames & video_key).fetch()
        best = max(rows, key=lambda r: r["fraction_found"])
        self.insert1({k: best[k] for k in BestDetectedFrames.heading.primary_key})

    @property
    def key_source(self):
        return Video & DetectedFrames
