"""Bottom-up multi-person 2D pose tables, OpenPose slot, privacy blur.

Reference tables: BottomUpMethodLookup/Method/People (pipeline.py:133-245),
BottomUpVideo (:248-285), BottomUpBridging (+video) (:288-356), OpenPose
(:359-432), BlurredVideo (:435-475). Definitions are attribute-compatible.

Backend redesign (TPU-native):
- All OpenPose-family and MMPose bottom-up slots run the batched
  detector + top-down composite (backends.bottom_up_keypoints) — one XLA
  program per frame batch instead of the C++ OpenPose multi-scale CNN; outputs
  are converted to the 25-joint OpenPose ordering downstream tables expect.
- ``Bridging_OpenPose`` derives from ``BottomUpBridging`` exactly like the
  reference (noise→confidence, skeleton filter to coco_25 order).
- ``Synthetic`` reads GroundTruthKeypoints — the checkpoint-free test path.
- BlurredVideo masks faces **on device** (ops/render.blur_faces) in batches.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np

from ..core.engine import Computed, Lookup, Manual
from ..ops.render import blur_faces, face_circle_params
from ..utils.skeletons import BRIDGING_SKELETONS, coco17_to_body25, wholebody133_subset
from ._schema import schema
from .gt import GroundTruthKeypoints
from .overlays import pad_people, render_video
from .video import Video, VideoInfo


# canonical superset noise→confidence (reference bridging.py:100-102
# defaults: half_val=200 mm, sharpness=50)
from ..utils.bridging_superset import noise_to_conf  # noqa: E402,F401


@schema
class BottomUpMethodLookup(Lookup):
    definition = """
    bottom_up_method_name : varchar(50)
    """
    contents = [
        {"bottom_up_method_name": "OpenPose"},
        {"bottom_up_method_name": "OpenPose_BODY25B"},
        {"bottom_up_method_name": "OpenPose_HR"},
        {"bottom_up_method_name": "OpenPose_LR"},
        {"bottom_up_method_name": "MMPose"},
        # checkpoint-parity mmpose HigherHRNet AE net served as its own
        # registry row (method selection is data, reference
        # pipeline.py:133-147) rather than an env-var switch
        {"bottom_up_method_name": "MMPose_HigherHRNet"},
        {"bottom_up_method_name": "Bridging_OpenPose"},
        {"bottom_up_method_name": "Synthetic"},
    ]


@schema
class BottomUpMethod(Manual):
    definition = """
    -> Video
    -> BottomUpMethodLookup
    """


@schema
class BottomUpPeople(Computed):
    definition = """
    -> BottomUpMethod
    ---
    keypoints                   : longblob
    timestamp=CURRENT_TIMESTAMP : timestamp    # automatic timestamp
    """

    def make(self, key):
        from . import backends

        key = dict(key)
        method = key["bottom_up_method_name"]

        if method == "Synthetic":
            gt = (GroundTruthKeypoints & key).fetch1("keypoints")  # (T, P, 17, 3)
            key["keypoints"] = [coco17_to_body25(gt[t]) for t in range(len(gt))]
        elif method == "Bridging_OpenPose":
            # superset → coco_25 → reorder to BODY_25 by display name, with
            # TTA-noise confidences (reference pipeline.py:214-241)
            from ..utils.bridging_superset import (filter_skeleton,
                                                   normalized_joint_name_dictionary)
            from ..utils.skeletons import BODY_25

            assert BottomUpBridging & key, f"Bridging not computed: {key}"
            reorder = [normalized_joint_name_dictionary["coco_25"].index(j)
                       for j in BODY_25]
            kp2d, noise = (BottomUpBridging & key).fetch1("keypoints2d", "keypoint_noise")
            final = []
            for kp, nz in zip(kp2d, noise):
                if len(kp) == 0:
                    final.append(np.zeros((0, 25, 3), np.float32))
                    continue
                conf = noise_to_conf(nz)
                kp = np.concatenate([np.asarray(kp)[..., :2], conf[..., None]], axis=-1)
                final.append(filter_skeleton(kp, "coco_25")[:, reorder])
            key["keypoints"] = final
        elif method in ("MMPose", "MMPose_HigherHRNet"):
            # true bottom-up: associative-embedding heatmap+tag net, no
            # detector (reference wrappers/mmpose.py:84-121 HigherHRNet/AE);
            # COCO-17 convention. The MMPose_HigherHRNet row serves the
            # checkpoint-parity mmpose architecture (models/higherhrnet.py)
            video = Video.get_robust_reader(key, return_cap=False)
            backbone = ("HigherHRNet" if method == "MMPose_HigherHRNet"
                        else None)
            try:
                key["keypoints"] = backends.bottom_up_ae_keypoints(
                    video, backbone=backbone)
            finally:
                if os.path.exists(video):
                    os.remove(video)
        else:
            # OpenPose slots: batched detector+top-down composite
            video = Video.get_robust_reader(key, return_cap=False)
            try:
                kp17 = backends.bottom_up_keypoints(video, method)
            finally:
                if os.path.exists(video):
                    os.remove(video)
            key["keypoints"] = [coco17_to_body25(k) for k in kp17]

        self.insert1(key)


@schema
class BottomUpVideo(Computed):
    definition = """
    -> BottomUpPeople
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        key = dict(key)
        video = (BlurredVideo & key).fetch1("output_video")
        keypoints = (BottomUpPeople & key).fetch1("keypoints")
        out = _render_multi_person(video, keypoints)
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


@schema
class BottomUpBridging(Computed):
    definition = """
    -> Video
    ---
    boxes          : longblob
    keypoints2d    : longblob
    keypoints3d    : longblob
    keypoint_noise : longblob
    """

    def make(self, key):
        """Absolute-3D bottom-up over the 580-joint superset (reference
        MeTRAbs bridging, wrappers/bridging.py:105-141).

        TPU backend (models/bridging.py): per frame batch, every detected
        person's ``num_aug`` crop augmentations run as one MXU batch through
        a metrabs-style heatmap+depth head; stored values are the aug-mean
        2D (P, 580, 2) and absolute camera-space 3D (P, 580, 3) in mm, with
        per-joint ``keypoint_noise`` (P, 580) = stdev of the scale-aligned
        3D predictions across augmentations (bridging.py:96-97).
        """
        from . import backends
        from ..media.video import frame_batches
        from ..models.bridging import get_bridging_model
        from ..utils.bridging_superset import augmentation_noise

        key = dict(key)
        model = get_bridging_model()
        max_people = 4
        video = Video.get_robust_reader(key, return_cap=False)
        boxes_all, kp2d_all, kp3d_all, noise_all = [], [], [], []
        detector = None
        try:
            for frames, valid in frame_batches(video, 4):
                if detector is None:
                    detector = backends._get_detector((frames.shape[1], frames.shape[2]))
                dboxes, dscores = detector(frames)
                dboxes = np.asarray(dboxes)[:, :max_people]
                dscores = np.asarray(dscores)[:, :max_people]
                p2d, p3d = model(frames, dboxes)
                p2d, p3d = np.asarray(p2d), np.asarray(p3d)  # (B,K,A,J,{2,3})
                noise = augmentation_noise(p3d)              # (B,K,J)
                for i in range(len(frames)):
                    if not valid[i]:
                        break
                    keep = dscores[i] > 0.3
                    # boxes stored (P, 5) = TLHW + score (reference stores the
                    # detector's 5-column boxes; matching uses [:, :4])
                    boxes_all.append(np.concatenate(
                        [dboxes[i][keep], dscores[i][keep][:, None]], axis=1))
                    kp2d_all.append(p2d[i][keep].mean(axis=1))
                    kp3d_all.append(p3d[i][keep].mean(axis=1))
                    noise_all.append(noise[i][keep])
        finally:
            if os.path.exists(video):
                os.remove(video)

        key["boxes"] = boxes_all
        key["keypoints2d"] = kp2d_all
        key["keypoints3d"] = kp3d_all
        key["keypoint_noise"] = noise_all
        self.insert1(key)


@schema
class BottomUpBridgingVideoLookup(Lookup):
    definition = """
    skeleton  : varchar(32)
    """
    contents = [{"skeleton": s} for s in BRIDGING_SKELETONS]


@schema
class BottomUpBridgingVideo(Computed):
    definition = """
    -> BottomUpBridging
    -> BottomUpBridgingVideoLookup
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        """Skeleton-filtered overlay for every BottomUpBridgingVideoLookup
        row (reference pipeline.py:323-356: filter_skeleton + per-skeleton
        joint edges from the superset registry)."""
        from ..utils.bridging_superset import (PER_SKELETON_INDICES,
                                               filter_skeleton,
                                               get_skeleton_edges)

        key = dict(key)
        video = (BlurredVideo & key).fetch1("output_video")
        kp2d, noise = (BottomUpBridging & key).fetch1("keypoints2d", "keypoint_noise")
        skeleton = key["skeleton"]
        J = len(PER_SKELETON_INDICES[skeleton])
        frames_kp = []
        for kp, nz in zip(kp2d, noise):
            if len(kp) == 0:
                frames_kp.append(np.zeros((0, J, 3), np.float32))
                continue
            conf = noise_to_conf(nz)
            kp = np.concatenate([np.asarray(kp)[..., :2], conf[..., None]], axis=-1)
            frames_kp.append(filter_skeleton(kp, skeleton))
        out = _render_multi_person(video, frames_kp,
                                   limbs=get_skeleton_edges(skeleton))
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


@schema
class OpenPose(Computed):
    definition = """
    -> Video
    ---
    keypoints         : longblob
    pose_ids          : longblob
    pose_scores       : longblob
    face_keypoints    : longblob
    hand_keypoints    : longblob
    """

    def make(self, key):
        """Whole-video BODY_25(+hands) slot (reference pipeline.py:359-398
        wraps the C++ OpenPose lib; here the batched composite backend)."""
        from . import backends

        key = dict(key)
        video = Video.get_robust_reader(key, return_cap=False)
        try:
            keypoints, hands, faces = backends.openpose_composite(video)
        finally:
            if os.path.exists(video):
                os.remove(video)
        key["keypoints"] = keypoints
        key["pose_ids"] = [np.arange(len(k)) for k in keypoints]
        key["pose_scores"] = [np.asarray(k)[..., 2].mean(axis=-1) if len(k) else np.zeros(0)
                              for k in keypoints]
        # real 21-joint hand keypoints from the wrist-conditioned hand net
        # (reference wrappers/openpose.py:37-126 hand output)
        key["hand_keypoints"] = hands
        # real 70-point face keypoints from the head-conditioned face net
        key["face_keypoints"] = faces
        self.insert1(key)


@schema
class OpenPoseVideo(Computed):
    definition = """
    -> OpenPose
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        key = dict(key)
        video = (BlurredVideo & key).fetch1("output_video")
        keypoints = (OpenPose & key).fetch1("keypoints")
        out = _render_multi_person(video, keypoints)
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


@schema
class BlurredVideo(Computed):
    definition = """
    -> Video
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        """Privacy layer: white disc per face, center = nose, radius =
        ‖neck − nose‖ clipped [10, 250] px (reference pipeline.py:443-475),
        masked on device over whole frame batches."""
        key = dict(key)
        sources = [
            (BottomUpPeople & key & 'bottom_up_method_name="Bridging_OpenPose"'),
            (BottomUpPeople & key),
        ]
        keypoints = None
        for src in sources:
            if len(src):
                keypoints = src.fetch("keypoints", limit=1)[0]
                break
        if keypoints is None:
            raise RuntimeError(
                f"BlurredVideo requires BottomUpPeople for {key} (reference "
                "uses the Bridging_OpenPose method)")

        kp, valid = pad_people(keypoints, num_joints=np.asarray(keypoints[0]).shape[-2]
                               if len(keypoints) and len(np.asarray(keypoints[0]).shape) == 3
                               else 25)
        video = Video.get_robust_reader(key, return_cap=False)

        def annotate(frames, start):
            T = len(frames)
            kps = kp[start: start + T]
            if len(kps) < T:  # tail padding
                kps = np.concatenate([kps, np.zeros((T - len(kps),) + kp.shape[1:], kp.dtype)])
            centers, radii, ok = face_circle_params(kps)
            return blur_faces(frames, np.asarray(centers), np.asarray(radii), np.asarray(ok))

        try:
            out = render_video(video, annotate)
        finally:
            if os.path.exists(video):
                os.remove(video)
        key["output_video"] = out
        self.insert1(key)
        os.remove(out)


def _render_multi_person(video_path: str, keypoints_list, limb_set: str = None,
                         limbs=None) -> str:
    """Shared overlay: per-person colored skeleton + keypoints, device-batched.

    ``limbs`` (explicit (i, j) edge pairs) overrides the named ``limb_set``
    lookup — used by BottomUpBridgingVideo's per-skeleton edge registries."""
    from ..ops.render import draw_keypoints, draw_skeleton, track_colors
    from ..utils.skeletons import LIMBS

    J = 25
    for k in keypoints_list:
        arr = np.asarray(k)
        if arr.ndim == 3:
            J = arr.shape[1]
            break
    if limbs is None:
        limbs = LIMBS.get(limb_set or ("coco_17" if J == 17 else "body_25"),
                          LIMBS["coco_17" if J == 17 else "body_25"])
    limbs = tuple((int(a), int(b)) for a, b in limbs if max(a, b) < J)
    kp, valid = pad_people(keypoints_list, num_joints=J)
    P = kp.shape[1]
    colors = track_colors(max(P, 1))

    def annotate(frames, start):
        T = len(frames)
        kps = kp[start: start + T]
        if len(kps) < T:
            kps = np.concatenate([kps, np.zeros((T - len(kps),) + kp.shape[1:], kp.dtype)])
        out = frames
        for p in range(P):
            c = tuple(int(x) for x in colors[p])
            out = draw_skeleton(out, kps[:, p], limbs=limbs, color=c, radius=2)
            out = draw_keypoints(out, kps[:, p], color=(255, 255, 255), radius=3)
        return out

    return render_video(video_path, annotate)
