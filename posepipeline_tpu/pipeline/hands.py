"""Hand detection and hand 2D pose tables.

Reference: HandBboxMethodLookup/HandBboxMethod/HandBbox (pipeline.py:1979-2029,
wrappers/hand_bbox.py), HandPoseEstimationMethodLookup/Method/HandPoseEstimation
(pipeline.py:2031-2147, wrappers/hand_estimation.py). Definitions are
attribute-compatible.

Backends: hand boxes derive from wholebody/Halpe wrist+hand keypoints
(``make_bbox_from_keypoints`` semantics, hand_bbox.py:80-105) or the neural
detector slot; hand 2D keypoints run the shared ViT top-down architecture with
a 21-joint head, both hands of every frame in one device batch.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..core.engine import Computed, Lookup, Manual
from ..utils.skeletons import HAND_21
from ._schema import schema
from .person2d import TopDownPerson
from .tracking import PersonBbox
from .video import Video, VideoInfo


def make_bbox_from_keypoints(keypoints, dilate_px: float = 100.0, conf_thresh: float = 0.2):
    """Hand keypoints (..., K, 3) → square TLHW boxes dilated like the
    reference (hand_bbox.py:80-105, 100 px dilation)."""
    kp = np.asarray(keypoints, np.float32)
    conf_ok = kp[..., 2] > conf_thresh
    big = 1e9
    x = np.where(conf_ok, kp[..., 0], big)
    y = np.where(conf_ok, kp[..., 1], big)
    mins = np.stack([x.min(-1), y.min(-1)], -1)
    x = np.where(conf_ok, kp[..., 0], -big)
    y = np.where(conf_ok, kp[..., 1], -big)
    maxs = np.stack([x.max(-1), y.max(-1)], -1)
    center = (mins + maxs) / 2
    size = (maxs - mins).max(-1, keepdims=True) + dilate_px
    ok = conf_ok.sum(-1) >= 3
    box = np.concatenate([center - size / 2, np.repeat(size, 2, -1)], -1)
    return np.where(ok[..., None], box, 0.0), ok


@schema
class HandBboxMethodLookup(Lookup):
    definition = """
    detection_method      : int
    ---
    detection_method_name : varchar(50)
    """
    contents = [
        {"detection_method": 0, "detection_method_name": "RTMDet"},
        {"detection_method": 1, "detection_method_name": "Halpe"},
    ]


@schema
class HandBboxMethod(Manual):
    definition = """
    -> Video
    -> HandBboxMethodLookup
    ---
    """


@schema
class HandBbox(Computed):
    definition = """
    -> HandBboxMethod
    ---
    num_boxes   :   int
    bboxes      :   longblob
    """

    def make(self, key):
        key = dict(key)
        method = (HandBboxMethodLookup & key).fetch1("detection_method_name")

        if method == "Halpe":
            # derive from Halpe wholebody keypoints (hand_bbox.py:64-105):
            # Halpe-136 layout: hands at [94:115] (left), [115:136] (right)
            td = (TopDownPerson & key & {"top_down_method": 2})
            assert len(td), f"Halpe hand boxes require MMPoseHalpe TopDownPerson for {key}"
            kp = np.asarray(td.fetch1("keypoints"), np.float32)
            left, _ = make_bbox_from_keypoints(kp[:, 94:115])
            right, _ = make_bbox_from_keypoints(kp[:, 115:136])
            bboxes = np.stack([right, left], axis=1)  # (T, 2, 4)
        else:
            # neural slot: person-conditioned detector proposals near wrists
            td = (TopDownPerson & {k: key[k] for k in ("video_project", "filename")})
            if len(td):
                kp = np.asarray(td.fetch("keypoints", limit=1)[0], np.float32)
                if kp.shape[1] >= 11:  # COCO wrists at 9 (L), 10 (R)
                    wrists = kp[:, [10, 9], :]
                    size = 120.0
                    bboxes = np.concatenate(
                        [wrists[..., :2] - size / 2,
                         np.full(wrists[..., :2].shape, size, np.float32)], -1)
                else:
                    bboxes = np.zeros((kp.shape[0], 2, 4), np.float32)
            else:
                num = (VideoInfo & key).fetch1("num_frames")
                bboxes = np.zeros((num, 2, 4), np.float32)

        key["bboxes"] = bboxes
        key["num_boxes"] = int(bboxes.shape[1])
        self.insert1(key)


@schema
class HandPoseEstimationMethodLookup(Lookup):
    definition = """
    estimation_method      : int
    ---
    estimation_method_name : varchar(50)
    """
    contents = [
        {"estimation_method": 0, "estimation_method_name": "RTMPoseHand5"},
        {"estimation_method": 1, "estimation_method_name": "RTMPoseCOCO"},
        {"estimation_method": 2, "estimation_method_name": "freihand"},
        {"estimation_method": 3, "estimation_method_name": "HRNet_dark"},
        {"estimation_method": 4, "estimation_method_name": "HRNet_udp"},
        {"estimation_method": 5, "estimation_method_name": "Halpe"},
    ]


@schema
class HandPoseEstimationMethod(Manual):
    definition = """
    -> HandBbox
    -> HandPoseEstimationMethodLookup
    ---
    """


@schema
class HandPoseEstimation(Computed):
    definition = """
    -> HandPoseEstimationMethod
    ---
    keypoints_2d       : longblob  #(time, [21 righthand-21 lefthand], 3)
    """

    def make(self, key):
        """Hand 2D keypoints per frame (reference pipeline.py:2106-2147).

        ``Halpe`` passes through the wholebody hand keypoints; model slots run
        the 21-joint top-down net over both hand crops per frame, batched.
        """
        from ..models.topdown import TopDownConfig, TopDownModel
        from ..media.video import frame_batches

        key = dict(key)
        method = (HandPoseEstimationMethodLookup & key).fetch1("estimation_method_name")

        if method == "Halpe":
            td = (TopDownPerson & key & {"top_down_method": 2})
            assert len(td), f"Halpe passthrough requires MMPoseHalpe for {key}"
            kp = np.asarray(td.fetch1("keypoints"), np.float32)
            key["keypoints_2d"] = np.concatenate(
                [kp[:, 115:136][:, None], kp[:, 94:115][:, None]], axis=1)
            self.insert1(key)
            return

        bboxes = np.asarray((HandBbox & key).fetch1("bboxes"), np.float32)  # (T, 2, 4)
        model = _get_hand_model(method)
        T = bboxes.shape[0]
        out = np.zeros((T, 2, 21, 3), np.float32)
        video = Video.get_robust_reader(key, return_cap=False)
        t = 0
        try:
            for frames, valid in frame_batches(video, 8):
                n = int(valid.sum())
                idx = np.arange(t, min(t + n, T))
                if idx.size == 0:
                    break
                for h in range(2):
                    bb = np.zeros((len(frames), 4), np.float32)
                    bb[: idx.size] = bboxes[idx, h]
                    kp = np.asarray(model(frames, bb))
                    out[idx, h] = kp[: idx.size]
                t += n
        finally:
            if os.path.exists(video):
                os.remove(video)
        # zero-confidence where the hand box was empty
        empty = bboxes[..., 2] <= 0
        out[empty] = 0.0
        key["keypoints_2d"] = out
        self.insert1(key)

    @staticmethod
    def joint_names(method="RTMPoseHand5"):
        return HAND_21


_hand_models = {}


def _get_hand_model(method: str):
    from ..core.config import config
    from ..models.topdown import TopDownConfig, TopDownModel

    if method not in _hand_models:
        from ..models.topdown import HAND_MODEL_DEFAULTS

        kw = dict(HAND_MODEL_DEFAULTS)
        # tier-3 model-param registry override (tests scale the net down)
        kw.update(config.get("custom", {}).get("hand_model", {}))
        for k in ("input_hw", "heatmap_hw"):
            kw[k] = tuple(kw[k])
        model = TopDownModel(TopDownConfig(f"hand_{method}", **kw))
        # registry weights: all hand slots share the synthetic-hand-trained
        # net (topdown__hand.npz) unless a per-method file exists
        from ..models.params_io import (commit_to_default, load_params,
                                        merge_params, registry_weights_path)

        path = (registry_weights_path("topdown", f"hand_{method}")
                or registry_weights_path("topdown", "hand"))
        if path:
            model.params = commit_to_default(
                merge_params(model.params, load_params(path)))
        model.weights_loaded = bool(path)
        _hand_models[method] = model
    return _hand_models[method]
