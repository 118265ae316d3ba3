"""Single-person 2D keypoint tables (person matching + top-down methods).

Reference tables: BottomUpPerson (pipeline.py:788-810), BottomUpBridgingPerson
(:813-866), OpenPosePerson(+Video) (:869-974), TopDownMethodLookup/Method/
TopDownPerson (:977-1141), TopDownPersonVideo (:1921-1976). Definitions are
attribute-compatible. The per-frame Python matching loops become one batched
match (ops/boxes.match_keypoints_to_bbox_sequence) and the per-frame batch-1
HRNet forwards become whole-video device batches.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.engine import Computed, Lookup, Manual
from ..ops.boxes import keypoints_filter_clipped
from ..utils.skeletons import BODY_25, COCO_17, COCO_WHOLEBODY_133, HALPE_136
from ._schema import schema
from .bottomup import BlurredVideo, BottomUpBridging, BottomUpPeople, OpenPose, noise_to_conf
from .gt import GroundTruthKeypoints
from .overlays import render_video
from .tracking import PersonBbox
from .video import Video, VideoInfo


def _match_person_sequence(bboxes, present, keypoints_list, num_joints, thresh=0.25):
    """Per-frame best-IoU person→bbox matching, batched.

    Mirrors the reference loop `[match_keypoints_to_bbox(bbox[idx], kp[idx])
    for idx in range(T)]` (pipeline.py:796-800) with one padded device call.
    Returns (T, J, 3) keypoints (zeros where unmatched) and (T,) match indices
    (-1 = none).
    """
    from ..ops.boxes import match_keypoints_to_bbox_sequence
    from .overlays import pad_people

    T = len(keypoints_list)
    kp, _ = pad_people(keypoints_list, num_joints)
    boxes = np.nan_to_num(np.asarray(bboxes, np.float32))
    matched, idx, found = match_keypoints_to_bbox_sequence(boxes, kp, thresh)
    matched = np.array(matched)  # copy: device arrays view as read-only
    found = np.asarray(found) & np.asarray(present, bool)
    matched[~found] = 0.0
    out_idx = np.where(found, np.asarray(idx), -1)
    return matched, out_idx


@schema
class BottomUpPerson(Computed):
    definition = """
    -> PersonBbox
    -> BottomUpPeople
    ---
    keypoints        : longblob
    """

    def make(self, key):
        key = dict(key)
        bbox, present = (PersonBbox & key).fetch1("bbox", "present")
        keypoints = (BottomUpPeople & key).fetch1("keypoints")
        J = 17 if key.get("bottom_up_method_name") == "MMPose" else 25
        for k in keypoints:
            arr = np.asarray(k)
            if arr.ndim == 3:
                J = arr.shape[1]
                break
        matched, _ = _match_person_sequence(bbox, present, keypoints, J)
        key["keypoints"] = matched
        self.insert1(key)


@schema
class BottomUpBridgingPerson(Computed):
    definition = """
    -> PersonBbox
    -> BottomUpBridging
    ---
    bbox             : longblob
    keypoints        : longblob
    keypoints3d      : longblob
    keypoint_noise   : longblob
    """

    def make(self, key):
        """IoU-match the bridging boxes to the annotated person per frame
        (reference pipeline.py:813-866, thresh 0.25): keypoints (T, 580, 3)
        = 2D+conf, keypoints3d (T, 580, 4) = absolute 3D mm + conf."""
        from ..tracking.tracker import iou_matrix_np
        from ..utils.bridging_superset import SUPERSET_SIZE

        key = dict(key)
        bbox, present = (PersonBbox & key).fetch1("bbox", "present")
        boxes, kp2d, kp3d, noise = (BottomUpBridging & key).fetch1(
            "boxes", "keypoints2d", "keypoints3d", "keypoint_noise")

        T = len(boxes)
        J = SUPERSET_SIZE
        for k in kp2d:
            if len(k):
                J = np.asarray(k).shape[1]
                break
        out_box = np.zeros((T, 5), np.float32)
        out_kp = np.zeros((T, J, 3), np.float32)
        out_kp3d = np.zeros((T, J, 4), np.float32)
        out_noise = np.zeros((T, J), np.float32)
        target = np.nan_to_num(np.asarray(bbox, np.float32))
        for t in range(T):
            if not present[t] or len(boxes[t]) == 0:
                continue
            frame_boxes = np.asarray(boxes[t], np.float32)[:, :4]
            ious = iou_matrix_np(target[t][None], frame_boxes)[0]
            best = int(np.argmax(ious))
            if ious[best] > 0.25:
                conf = noise_to_conf(noise[t][best])
                out_box[t, :np.asarray(boxes[t]).shape[1]] = boxes[t][best]
                out_kp[t] = np.concatenate(
                    [np.asarray(kp2d[t][best])[..., :2], conf[..., None]], axis=-1)
                if len(kp3d[t]):
                    out_kp3d[t] = np.concatenate(
                        [np.asarray(kp3d[t][best])[..., :3], conf[..., None]],
                        axis=-1)
                out_noise[t] = noise[t][best]
        key["bbox"] = out_box
        key["keypoints"] = out_kp
        key["keypoints3d"] = out_kp3d
        key["keypoint_noise"] = out_noise
        self.insert1(key)


@schema
class OpenPosePerson(Computed):
    definition = """
    -> PersonBbox
    -> OpenPose
    ---
    keypoints        : longblob
    hand_keypoints   : longblob
    openpose_ids     : longblob
    """

    def make(self, key):
        key = dict(key)
        bbox, present = (PersonBbox & key).fetch1("bbox", "present")
        keypoints, hand_kp = (OpenPose & key).fetch1("keypoints", "hand_keypoints")
        matched, idx = _match_person_sequence(bbox, present, keypoints, 25)
        T = len(idx)
        hands = np.zeros((T, 2, 21, 3), np.float32)
        for t in range(T):
            if idx[t] >= 0 and len(hand_kp[t]) > idx[t]:
                hands[t] = hand_kp[t][idx[t]]
        key["keypoints"] = matched
        key["hand_keypoints"] = hands
        key["openpose_ids"] = idx
        self.insert1(key)

    @staticmethod
    def joint_names():
        return BODY_25


@schema
class OpenPosePersonVideo(Computed):
    definition = """
    -> OpenPosePerson
    -> BlurredVideo
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        key = dict(key)
        keypoints, hand_keypoints = (OpenPosePerson & key).fetch1("keypoints", "hand_keypoints")
        video = (BlurredVideo & key).fetch1("output_video")
        out = _render_single_person(video, np.asarray(keypoints), "body_25",
                                    hands=np.asarray(hand_keypoints))
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


@schema
class TopDownMethodLookup(Lookup):
    definition = """
    top_down_method      : int
    ---
    top_down_method_name : varchar(50)
    """
    contents = [
        {"top_down_method": 0, "top_down_method_name": "MMPose"},
        {"top_down_method": 1, "top_down_method_name": "MMPoseWholebody"},
        {"top_down_method": 2, "top_down_method_name": "MMPoseHalpe"},
        {"top_down_method": 3, "top_down_method_name": "MMPoseHrformerCoco"},
        {"top_down_method": 4, "top_down_method_name": "OpenPose"},
        {"top_down_method": 6, "top_down_method_name": "OpenPose_BODY25B"},
        {"top_down_method": 7, "top_down_method_name": "MMPoseTCFormerWholebody"},
        {"top_down_method": 8, "top_down_method_name": "OpenPose_HR"},
        {"top_down_method": 9, "top_down_method_name": "OpenPose_LR"},
        {"top_down_method": 11, "top_down_method_name": "Bridging_COCO_25"},
        {"top_down_method": 12, "top_down_method_name": "Bridging_bml_movi_87"},
        {"top_down_method": 13, "top_down_method_name": "Bridging_smpl+head_30"},
        {"top_down_method": 14, "top_down_method_name": "Bridging_smplx_42"},
        # serving row for the checkpoint-parity HRNet-W48 architecture
        # (models/hrnet.py; the reference's actual flagship backbone,
        # wrappers/mmpose.py:26-44) — same COCO-17 contract as MMPose but
        # running the HRNet, so a converted real checkpoint is a file drop
        {"top_down_method": 15, "top_down_method_name": "MMPose_HRNetW48"},
        {"top_down_method": 100, "top_down_method_name": "Synthetic"},
    ]


@schema
class TopDownMethod(Manual):
    definition = """
    -> PersonBbox
    top_down_method    : int
    """


@schema
class TopDownPerson(Computed):
    definition = """
    -> TopDownMethod
    ---
    keypoints          : longblob
    """

    def make(self, key):
        """The central 2D keypoint table (reference pipeline.py:1009-1141).

        Dispatch:
        - MMPose* slots → batched TPU top-down nets over the PersonBbox crops
          (replaces per-frame batch-1 mmpose inference, wrappers/mmpose.py:60-76)
        - OpenPose* slots → carry keypoints from OpenPosePerson
        - Bridging_* slots → skeleton-filtered BottomUpBridgingPerson output
          with clipped-image confidence zeroing (utils/keypoints.py semantics)
        - Synthetic → GroundTruthKeypoints (exact, checkpoint-free)
        """
        from . import backends
        from ..utils.skeletons import wholebody133_subset

        key = dict(key)
        method = (TopDownMethodLookup & key).fetch1("top_down_method_name")
        bbox, present = (PersonBbox & key).fetch1("bbox", "present")

        if method in ("MMPose", "MMPoseWholebody", "MMPoseHalpe",
                      "MMPoseHrformerCoco", "MMPoseTCFormerWholebody",
                      "MMPose_HRNetW48"):
            video = Video.get_robust_reader(key, return_cap=False)
            try:
                kp = backends.top_down_keypoints(video, np.asarray(bbox), np.asarray(present),
                                                 method)
            finally:
                if os.path.exists(video):
                    os.remove(video)
        elif method.startswith("OpenPose"):
            kp = np.asarray((OpenPosePerson & key).fetch1("keypoints"))
        elif method.startswith("Bridging_"):
            # superset → named skeleton subset (reference pipeline.py:1050-1093
            # filter_skeleton paths); unknown skeletons raise — no silent
            # coco fallback
            from ..utils.bridging_superset import (PER_SKELETON_INDICES,
                                                   filter_skeleton)

            kp580 = np.asarray((BottomUpBridgingPerson & key).fetch1("keypoints"))
            skeleton = method.split("Bridging_")[1]
            if skeleton == "COCO_25":
                skeleton = "coco_25"
            if skeleton not in PER_SKELETON_INDICES:
                raise ValueError(f"Unknown bridging skeleton {skeleton!r}")
            kp = filter_skeleton(kp580, skeleton)
            width, height = (VideoInfo & key).fetch1("width", "height")
            kp = np.asarray(keypoints_filter_clipped(kp, width, height))
        elif method == "Synthetic":
            gt, gt_boxes = (GroundTruthKeypoints & key).fetch1("keypoints", "bboxes")
            from ..tracking.tracker import iou_matrix_np
            T = len(gt)
            kp = np.zeros((T, gt.shape[2], 3), np.float32)
            target = np.nan_to_num(np.asarray(bbox, np.float32))
            for t in range(T):
                ious = iou_matrix_np(target[t][None], gt_boxes[t])[0]
                if present[t] and ious.max() > 0.25:
                    kp[t] = gt[t, int(np.argmax(ious))]
        else:
            raise ValueError(f"Unsupported top-down method {method!r}")

        key["keypoints"] = kp
        self.insert1(key)

    @staticmethod
    def joint_names(method="MMPose"):
        """Per-method joint names (reference pipeline.py:1097-1141; bridging
        methods return the normalized superset subset names,
        wrappers/bridging.py:179-296)."""
        if method.startswith("Bridging_"):
            from ..utils.bridging_superset import get_joint_names
            skeleton = method.split("Bridging_")[1]
            return get_joint_names("coco_25" if skeleton == "COCO_25" else skeleton)
        return {
            "MMPose": COCO_17,
            "MMPose_HRNetW48": COCO_17,
            "MMPoseHrformerCoco": COCO_17,
            "MMPoseWholebody": COCO_WHOLEBODY_133,
            "MMPoseTCFormerWholebody": COCO_WHOLEBODY_133,
            "MMPoseHalpe": HALPE_136,
            "OpenPose": BODY_25,
            "OpenPose_BODY25B": BODY_25,
            "OpenPose_HR": BODY_25,
            "OpenPose_LR": BODY_25,
            "Synthetic": COCO_17,
        }.get(method, COCO_17)


@schema
class TopDownPersonVideo(Computed):
    definition = """
    -> TopDownPerson
    -> BlurredVideo
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        key = dict(key)
        keypoints = np.asarray((TopDownPerson & key).fetch1("keypoints"))
        video = (BlurredVideo & key).fetch1("output_video")
        method = (TopDownMethodLookup & key).fetch1("top_down_method_name")
        if method.startswith("Bridging_"):
            # bridging skeletons are superset display order, not BODY_25 —
            # use their own edge registries
            from ..utils.bridging_superset import get_skeleton_edges

            skel_name = ("coco_25" if method == "Bridging_COCO_25"
                         else method.split("Bridging_")[1])
            out = _render_single_person(
                video, keypoints, skel_name, overlay_bbox_key=key,
                limbs=tuple((int(a), int(b))
                            for a, b in get_skeleton_edges(skel_name)))
        else:
            skel = "coco_17" if keypoints.shape[1] == 17 else (
                "body_25" if keypoints.shape[1] == 25 else "coco_17")
            out = _render_single_person(video, keypoints, skel,
                                        overlay_bbox_key=key)
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


def _render_single_person(video_path, keypoints, skeleton: str, hands=None,
                          overlay_bbox_key=None, limbs=None):
    """Shared single-person overlay: skeleton + keypoints (+hands, +bbox).

    ``limbs`` (explicit edge pairs) overrides the named-skeleton lookup —
    used by bridging skeletons whose edges live in their own registry."""
    from ..ops.render import draw_boxes, draw_keypoints, draw_skeleton
    from ..utils.skeletons import HAND_21_LIMBS, LIMBS

    kp = np.nan_to_num(np.asarray(keypoints, np.float32))
    J = kp.shape[1]
    if limbs is None:
        limbs = tuple(l for l in LIMBS.get(skeleton, LIMBS["coco_17"]) if max(l) < J)
    else:
        limbs = tuple((a, b) for a, b in limbs if max(a, b) < J)
    T = kp.shape[0]

    bboxes = None
    if overlay_bbox_key is not None:
        b = np.asarray((PersonBbox & overlay_bbox_key).fetch1("bbox"), np.float32)
        bboxes = np.nan_to_num(b)

    def annotate(frames, start):
        B = len(frames)
        seg = kp[start: start + B]
        if len(seg) < B:
            seg = np.concatenate([seg, np.zeros((B - len(seg), J, 3), np.float32)])
        out = draw_skeleton(frames, seg, limbs=limbs, color=(0, 255, 80), radius=2)
        out = draw_keypoints(out, seg, color=(255, 255, 255), radius=3)
        if hands is not None:
            hseg = hands[start: start + B]
            if len(hseg) < B:
                hseg = np.concatenate([hseg, np.zeros((B - len(hseg),) + hands.shape[1:],
                                                      np.float32)])
            for h in range(2):
                out = draw_skeleton(out, hseg[:, h], limbs=HAND_21_LIMBS,
                                    color=(255, 160, 0), radius=1)
        if bboxes is not None:
            bseg = bboxes[start: start + B]
            if len(bseg) < B:
                bseg = np.concatenate([bseg, np.zeros((B - len(bseg), 4), np.float32)])
            out = draw_boxes(out, bseg[:, None, :], np.array([[255, 255, 255]], np.uint8),
                             radius=2)
        return out

    return render_video(video_path, annotate)
