"""3D lifting tables.

Reference: LiftingMethodLookup/Method/LiftingPerson (pipeline.py:1224-1438),
LiftingPersonVideo (:1441-1510). Definitions are attribute-compatible; the
lifting backends are the TPU temporal-conv/transformer models
(models/lifting.py) which process the whole sequence in one XLA program, with
time-axis sharding (parallel/temporal.py) for long videos.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.engine import Computed, Lookup, Manual
from ..utils.skeletons import H36M_17
from ._schema import schema
from .bottomup import BlurredVideo
from .person2d import BottomUpBridgingPerson, TopDownMethodLookup, TopDownPerson
from .tracking import PersonBbox
from .video import VideoInfo


@schema
class LiftingMethodLookup(Lookup):
    definition = """
    lifting_method      : int
    ---
    lifting_method_name : varchar(50)
    """
    contents = [
        {"lifting_method": 0, "lifting_method_name": "GastNet"},
        {"lifting_method": 1, "lifting_method_name": "VideoPose3D"},
        {"lifting_method": 2, "lifting_method_name": "PoseAug"},
        {"lifting_method": 3, "lifting_method_name": "RIE"},
        {"lifting_method": 4, "lifting_method_name": "PoseFormer"},
        {"lifting_method": 11, "lifting_method_name": "Bridging_COCO_25"},
        {"lifting_method": 12, "lifting_method_name": "Bridging_bml_movi_87"},
        {"lifting_method": 13, "lifting_method_name": "Bridging_smpl+head_30"},
        {"lifting_method": 14, "lifting_method_name": "Bridging_smplx_42"},
    ]


@schema
class LiftingMethod(Manual):
    definition = """
    -> TopDownPerson
    -> LiftingMethodLookup
    """


@schema
class LiftingPerson(Computed):
    definition = """
    -> LiftingMethod
    ---
    keypoints_3d       : longblob
    keypoints_valid    : longblob
    """

    def make(self, key):
        """2D→3D lifting (reference pipeline.py:1250-1416).

        Model slots run the TPU lifters over COCO→H36M-converted, screen-
        normalized keypoints; Bridging slots pass through the matched 3D from
        BottomUpBridgingPerson like the reference (:1290-1410).
        """
        from ..models.lifting import LiftingModel

        key = dict(key)
        method = (LiftingMethodLookup & key).fetch1("lifting_method_name")

        if method.startswith("Bridging_"):
            # superset → named skeleton with per-skeleton TTA-noise
            # confidence and clipped-image filtering (reference
            # pipeline.py:1290-1410: bml/smpl+head/smplx branches use
            # noise_to_conf(noise[:, skeleton_inds], 30, 10))
            from ..ops.boxes import keypoints_filter_clipped
            from ..utils.bridging_superset import (PER_SKELETON_INDICES,
                                                   filter_skeleton,
                                                   noise_to_conf)

            skeleton = method.split("Bridging_")[1]
            if skeleton == "COCO_25":
                skeleton = "coco_25"
            if skeleton not in PER_SKELETON_INDICES:
                raise ValueError(f"Unknown bridging skeleton {skeleton!r}")
            kp3d = np.asarray((BottomUpBridgingPerson & key).fetch1("keypoints3d"))
            noise = np.asarray((BottomUpBridgingPerson & key).fetch1("keypoint_noise"))
            kp2d = np.asarray((BottomUpBridgingPerson & key).fetch1("keypoints"))
            kp3d = filter_skeleton(kp3d, skeleton)        # (T, J, 4)
            kp2d = filter_skeleton(kp2d, skeleton)
            if skeleton != "coco_25":
                # reference bml/smpl+head/smplx branches re-derive confidence
                # at half_val=30, sharpness=10 (pipeline.py:1324,1363,1401);
                # the coco_25 branch keeps the stored confidence (:1285-1292)
                inds = PER_SKELETON_INDICES[skeleton]
                kp3d[..., -1] = noise_to_conf(noise[:, inds],
                                              half_val=30, sharpness=10)
            # zero validity where the 2D projection falls outside the image
            width, height = (VideoInfo & key).fetch1("width", "height")
            kp2d = np.asarray(keypoints_filter_clipped(kp2d, width, height))
            kp3d[..., -1] = np.where(kp2d[..., 2] > 0, kp3d[..., -1], 0.0)
            key["keypoints_3d"] = kp3d
            key["keypoints_valid"] = kp3d[..., -1] > 0.5
            self.insert1(key)
            return

        keypoints = np.asarray((TopDownPerson & key).fetch1("keypoints"), np.float32)
        width, height = (VideoInfo & key).fetch1("width", "height")

        td_method = (TopDownMethodLookup & key).fetch1("top_down_method_name") \
            if TopDownMethodLookup & key else "MMPose"
        kp = keypoints
        if td_method.startswith("Bridging_") and kp.shape[1] != 17:
            # bridging skeletons are in superset display order (NOT BODY_25);
            # map to COCO-17 by joint name so the lifter sees correct joints
            from ..utils.bridging_superset import get_joint_names
            from ..utils.skeletons import COCO_17

            names = get_joint_names(
                "coco_25" if td_method == "Bridging_COCO_25"
                else td_method.split("Bridging_")[1])
            idx = [names.index(n) for n in COCO_17 if n in names]
            if len(idx) == 17:
                kp = kp[:, idx]
            else:
                raise ValueError(
                    f"{td_method} skeleton lacks the COCO body joints needed "
                    "for H36M lifting; use a Bridging_* lifting method instead")
        elif kp.shape[1] == 25:         # BODY_25 → COCO-17 first
            from ..utils.skeletons import body25_to_coco17
            kp = body25_to_coco17(kp)
        elif kp.shape[1] > 17:          # wholebody/halpe → body subset
            kp = kp[:, :17]

        model = LiftingModel(method)
        kp = np.nan_to_num(kp)
        out, valid = model(kp, float(width), float(height))
        key["keypoints_3d"] = np.asarray(out)
        key["keypoints_valid"] = np.asarray(valid)
        self.insert1(key)

    @staticmethod
    def joint_names():
        """H3.6M 17-joint convention (reference pipeline.py:1418-1438)."""
        return H36M_17


@schema
class LiftingPersonVideo(Computed):
    definition = """
    -> LiftingPerson
    -> BlurredVideo
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        """Side-by-side 2D overlay + 3D skeleton animation (reference uses
        GAST-Net's matplotlib render_animation, pipeline.py:1441-1510; here
        both panels rasterize on device)."""
        import cv2

        from ..media.video import frame_batches, open_capture, write_video
        from ..ops.render import draw_keypoints, draw_skeleton
        from ..utils.skeletons import H36M_17_LIMBS

        key = dict(key)
        video = (BlurredVideo & key).fetch1("output_video")
        kp3d = np.asarray((LiftingPerson & key).fetch1("keypoints_3d"), np.float32)
        kp2d = np.nan_to_num(np.asarray((TopDownPerson & key).fetch1("keypoints"), np.float32))
        if kp2d.shape[1] != 17:
            from ..utils.skeletons import body25_to_coco17
            kp2d = body25_to_coco17(kp2d) if kp2d.shape[1] == 25 else kp2d[:, :17]

        cap = open_capture(video)
        H = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
        cap.release()

        # project relative 3D into a fixed side panel (orthographic, y-down)
        pane = H
        c3 = kp3d[..., :3] - kp3d[:, :1, :3]         # root-relative
        scale = pane * 0.35 / max(float(np.abs(c3).max()), 1e-3)
        proj = np.stack([c3[..., 0] * scale + pane / 2,
                         c3[..., 1] * scale + pane / 2,
                         np.ones_like(c3[..., 0])], axis=-1)

        # bridging methods carry their own skeleton's edge list
        method = (LiftingMethodLookup & key).fetch1("lifting_method_name")
        limbs3d = H36M_17_LIMBS
        if method.startswith("Bridging_"):
            from ..utils.bridging_superset import get_skeleton_edges
            skel = method.split("Bridging_")[1]
            edges = get_skeleton_edges("coco_25" if skel == "COCO_25" else skel)
            limbs3d = tuple((int(a), int(b)) for a, b in edges) or H36M_17_LIMBS

        from ..utils.skeletons import COCO_17_LIMBS

        def frames_gen():
            idx = 0
            for batch, valid in frame_batches(video, 8):
                left = np.asarray(draw_skeleton(batch, _seg(kp2d, idx, len(batch)),
                                                limbs=COCO_17_LIMBS, color=(0, 255, 80)))
                left = np.asarray(draw_keypoints(left, _seg(kp2d, idx, len(batch)),
                                                 color=(255, 255, 255)))
                right = np.zeros((len(batch), H, pane, 3), np.uint8)
                right = np.asarray(draw_skeleton(right, _seg(proj, idx, len(batch)),
                                                 limbs=limbs3d, color=(80, 160, 255)))
                for i in range(len(batch)):
                    if not valid[i]:
                        break
                    yield np.concatenate([left[i], right[i]], axis=1)
                    idx += 1

        import tempfile
        fd, out = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
        write_video(frames_gen(), out, fps=fps)
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


def _seg(arr, start, length):
    seg = arr[start: start + length]
    if len(seg) < length:
        seg = np.concatenate([seg, np.zeros((length - len(seg),) + arr.shape[1:], arr.dtype)])
    return seg
