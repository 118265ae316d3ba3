"""Skeleton action recognition tables.

Reference: SkeletonAction (pipeline.py:1144-1166), SkeletonActionVideo
(:1169-1221). Definitions are attribute-compatible; the backend is the TPU
(2+1)D conv model over device-rasterized keypoint-heatmap volumes
(models/action.py) instead of mmaction2's PoseC3D.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.engine import Computed, Lookup
from ._schema import schema
from .bottomup import BlurredVideo
from .person2d import TopDownPerson
from .tracking import PersonBbox


@schema
class SkeletonActionMethodLookup(Lookup):
    """Action-backbone registry: method selection is data in a Lookup row
    (the framework's core idea, reference pipeline.py:133-147), not an
    env-var switch. ``PoseC3D`` is the TPU-first (2+1)D default;
    ``PoseC3D_SlowOnly`` is the checkpoint-parity mmaction2 SlowOnly
    ResNet3d (models/posec3d.py, reference wrappers/mmaction.py:9-86)."""

    definition = """
    method : varchar(50)
    """
    contents = [
        {"method": "PoseC3D"},
        {"method": "PoseC3D_SlowOnly"},
    ]


@schema
class SkeletonAction(Computed):
    definition = """
    -> TopDownPerson
    -> SkeletonActionMethodLookup
    ---
    top5              : longblob
    action_scores     : longblob
    label_map         : longblob
    action_window_len : int
    stride            : int
    computed_timestamp=CURRENT_TIMESTAMP : timestamp    # automatic timestamp
    """

    def make(self, key):
        from ..models.action import ActionConfig, ActionModel

        key = dict(key)
        keypoints = np.asarray((TopDownPerson & key).fetch1("keypoints"))
        bbox = np.asarray((PersonBbox & key).fetch1("bbox"))
        if key["method"] == "PoseC3D_SlowOnly":
            model = ActionModel(ActionConfig(name="PoseC3D_SlowOnly",
                                             backbone="slowonly"))
        else:
            model = ActionModel()
        res = model(keypoints[:, :17], bbox)
        key["top5"] = res["top5"]
        key["action_scores"] = res["action_scores"]
        key["label_map"] = res["label_map"]
        key["action_window_len"] = res["action_window_len"]
        key["stride"] = res["stride"]
        self.insert1(key)


@schema
class SkeletonActionVideo(Computed):
    definition = """
    -> SkeletonAction
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        """Overlay: action labels above the person box (reference
        pipeline.py:1169-1221). Boxes rasterize on device, text on host."""
        import cv2

        from .overlays import render_video

        key = dict(key)
        video = (BlurredVideo & key).fetch1("output_video")
        top5, scores, stride, window = (SkeletonAction & key).fetch1(
            "top5", "action_scores", "stride", "action_window_len")
        bbox = np.nan_to_num(np.asarray((PersonBbox & key).fetch1("bbox")))
        label = top5[0] if len(top5) else ""

        def annotate(frames, start):
            out = np.array(frames)
            for i in range(len(out)):
                t = start + i
                if t >= len(bbox):
                    break
                x, y = int(bbox[t][0]), max(int(bbox[t][1]) - 8, 12)
                cv2.putText(out[i], label, (x, y), cv2.FONT_HERSHEY_SIMPLEX,
                            6e-3 * out[i].shape[0], (255, 255, 255), 2)
            return out

        out_path = render_video(video, annotate)
        key["output_video"] = out_path
        self.insert1(key)
        os.remove(video)
        os.remove(out_path)
