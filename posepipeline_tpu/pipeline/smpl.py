"""SMPL mesh-recovery tables (top-down, bottom-up, and motion-prior paths).

Reference tables: SMPLMethodLookup/Method/SMPLPerson(+Video)
(pipeline.py:1514-1706), CenterHMR family (:1709-1874), HumorPerson(+Video)
(:1877-1918). Definitions are attribute-compatible. The 8 wrapped CUDA repos
collapse into the TPU mesh-recovery family (models/meshregressor.py); HuMoR's
test-time motion-prior optimization is an optax program (models/motion_prior).
"""

from __future__ import annotations

import os

import numpy as np

from ..core.engine import Computed, Lookup, Manual
from ..models.smpl_body import SMPL_JOINT_NAMES
from ._schema import schema
from .bottomup import BlurredVideo
from .person2d import OpenPosePerson
from .tracking import PersonBbox
from .video import Video, VideoInfo

# SPIN's 49-joint convention (25 OpenPose + 24 extra), the reference's
# SMPLPerson.joint_names (pipeline.py:1622-1654 via utils/smpl.py JOINT_NAMES_49)
from ..utils.skeletons import BODY_25

SPIN_49 = BODY_25 + [
    "Right Ankle2", "Right Knee2", "Right Hip2", "Left Hip2", "Left Knee2",
    "Left Ankle2", "Right Wrist2", "Right Elbow2", "Right Shoulder2",
    "Left Shoulder2", "Left Elbow2", "Left Wrist2", "Neck2", "Head Top",
    "Pelvis2", "Thorax", "Spine", "Jaw", "Head2", "Nose2", "Left Eye2",
    "Right Eye2", "Left Ear2", "Right Ear2",
]


def _person_crops(key, crop_hw=(224, 224), batch_size: int = 8):
    """Decode + crop + normalize the annotated person's track, batched on
    device (replaces the torch DataLoader path, reference
    utils/bounding_box.py:101-194)."""
    from ..media.video import frame_batches
    from ..ops.warp import crop_image_bbox, normalize_imagenet

    bbox, present = (PersonBbox & key).fetch1("bbox", "present")
    bbox = np.nan_to_num(np.asarray(bbox, np.float32))
    video = Video.get_robust_reader(key, return_cap=False)
    crops = []
    t = 0
    try:
        for frames, valid in frame_batches(video, batch_size):
            n = int(valid.sum())
            batch_boxes = np.zeros((len(frames), 4), np.float32)
            upto = min(t + n, len(bbox))
            batch_boxes[: upto - t] = bbox[t:upto]
            c, fixed = crop_image_bbox(frames, batch_boxes,
                                       target_size=(crop_hw[1], crop_hw[0]), dilate=1.2)
            c = np.asarray(normalize_imagenet(c))
            crops.append(c[:n])
            t += n
    finally:
        if os.path.exists(video):
            os.remove(video)
    crops = np.concatenate(crops)[: len(bbox)]
    return crops, np.asarray(bbox), np.asarray(present, bool)


def _fitting_keypoints(key, method: str):
    """COCO-17 keypoints (T, 17, 3) conditioning the ProHMR fit, or None.

    ProHMR_MMPose prefers a TopDownPerson row for this video (any method,
    lowest id — the reference conditions on its MMPose detections,
    wrappers/prohmr.py:174-284); ProHMR prefers OpenPosePerson (BODY_25 →
    COCO-17). Either falls back to the other; returns None when the video
    has no 2D detections (fit skipped, regressor output stands)."""
    from ..utils.skeletons import body25_to_coco17
    from .person2d import TopDownPerson

    vkey = {k: key[k] for k in ("video_project", "filename") if k in key}

    # TopDownPerson methods whose joint order starts with COCO-17
    # (MMPose/Wholebody/Halpe/HRFormer/TCFormer — pipeline.py:1097-1141);
    # OpenPose/Bridging rows are BODY_25-ordered and are NOT sliceable
    _COCO_PREFIXED = {0, 1, 2, 3, 7}

    def topdown():
        rows = (TopDownPerson & vkey).fetch("top_down_method", "keypoints")
        if len(rows[0]) == 0:
            return None
        ids = np.asarray(rows[0], int)
        usable = [i for i in np.argsort(ids) if ids[i] in _COCO_PREFIXED]
        if not usable:
            return None
        kp = np.asarray(rows[1][usable[0]], np.float32)
        return kp[:, :17] if kp.shape[1] >= 17 else None

    def openpose():
        rows = (OpenPosePerson & vkey).fetch("keypoints")
        if len(rows) == 0:
            return None
        return np.asarray(body25_to_coco17(np.asarray(rows[0], np.float32)))

    first, second = ((topdown, openpose) if method == "ProHMR_MMPose"
                     else (openpose, topdown))
    kp = first()
    return kp if kp is not None else second()


@schema
class SMPLMethodLookup(Lookup):
    definition = """
    smpl_method       : int
    ---
    smpl_method_name  : varchar(50)
    """
    contents = [
        {"smpl_method": 0, "smpl_method_name": "VIBE"},
        {"smpl_method": 1, "smpl_method_name": "MEVA"},
        {"smpl_method": 2, "smpl_method_name": "ProHMR"},
        {"smpl_method": 3, "smpl_method_name": "Expose"},
        {"smpl_method": 4, "smpl_method_name": "PARE"},
        {"smpl_method": 5, "smpl_method_name": "PIXIE"},
        {"smpl_method": 6, "smpl_method_name": "ProHMR_MMPose"},
        {"smpl_method": 7, "smpl_method_name": "HybrIK"},
    ]


@schema
class SMPLMethod(Manual):
    definition = """
    -> PersonBbox
    -> SMPLMethodLookup
    """


@schema
class SMPLPerson(Computed):
    definition = """
    -> SMPLMethod
    ---
    model_type      : varchar(50)
    cams            : longblob
    poses           : longblob
    betas           : longblob
    joints3d        : longblob
    joints2d        : longblob
    """

    def make(self, key):
        """Mesh recovery over the annotated track (reference
        pipeline.py:1556-1620; vertices dropped to save space like :1617-1618).

        joints2d are converted from weak-perspective crop coords to image
        pixels with the VIBE transforms (ops/boxes.py)."""
        from ..models.meshregressor import MeshRecoveryModel
        from ..ops.boxes import convert_crop_cam_to_orig_img, fix_aspect_ratio

        key = dict(key)
        method = (SMPLMethodLookup & key).fetch1("smpl_method_name")
        model = MeshRecoveryModel(method)
        crops, bbox, present = _person_crops(key)
        out = model(crops)

        width, height = (VideoInfo & key).fetch1("width", "height")
        square = np.asarray(fix_aspect_ratio(bbox, dilate=1.2, ratio=1.0))

        if model.cfg.keypoint_fitting:
            # ProHMR slots: keypoint-conditioned fitting on the regressor
            # output (reference wrappers/prohmr.py:174-284 — ProHMR_MMPose
            # conditions on MMPose keypoints, ProHMR on OpenPose ones)
            kp = _fitting_keypoints(key, method)
            if kp is not None:
                from ..models.smpl_fitting import keypoints_to_crop_norm

                # pad/trim detections to the track length; padded frames get
                # confidence 0 (no data term — the prior holds them)
                kp_full = np.zeros((len(crops), kp.shape[1], 3), np.float32)
                T = min(len(kp), len(crops))
                kp_full[:T] = kp[:T]
                kp_norm = keypoints_to_crop_norm(kp_full, square)
                out = model.refine_with_keypoints(out, kp_norm)
        orig_cam = np.asarray(convert_crop_cam_to_orig_img(
            np.asarray(out["cams"]), square, width, height))

        # image-space 2D joints from weak-perspective params
        j3 = np.asarray(out["joints3d"])
        sx, sy, tx, ty = orig_cam.T
        j2 = np.stack([
            (j3[..., 0] + tx[:, None]) * sx[:, None] * (width / 2) + width / 2,
            (j3[..., 1] + ty[:, None]) * sy[:, None] * (height / 2) + height / 2,
        ], axis=-1)

        # reference-parity strings ("SMPL" / "SMPL-X", pipeline.py:1564-1612).
        # Provenance markers for stand-in geometry: "(gen)" = the default
        # full-layout generated body (6890 verts, real-SMPL tensor layout,
        # models/smpl_body.full_body_model — real SMPL_NEUTRAL.npz is a
        # drop-in env-var swap); "(toy)" = the 512-vertex test body. A real
        # licensed asset yields the unmarked reference string.
        base = "SMPL-X" if model.cfg.body == "smplx" else "SMPL"
        mt = model.body.p.model_type
        suffix = (" (toy)" if model.body.is_toy
                  else " (gen)" if mt.endswith("_fullgen") else "")
        key["model_type"] = base + suffix
        key["cams"] = orig_cam
        key["poses"] = np.asarray(out["poses"])
        key["betas"] = np.asarray(out["betas"])
        key["joints3d"] = j3
        key["joints2d"] = j2
        self.insert1(key)

    @staticmethod
    def joint_names(method="VIBE"):
        return SPIN_49

    @staticmethod
    def smpl_joint_names():
        return SMPL_JOINT_NAMES


@schema
class SMPLPersonVideo(Computed):
    definition = """
    -> SMPLPerson
    -> BlurredVideo
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        """Posed-mesh overlay: vertices recomputed from the stored
        poses/betas through the JAX body model, rasterized z-buffered +
        flat-shaded on device (ops/mesh_raster.py — the TPU replacement for
        the reference's pyrender path, pipeline.py:1657-1706,
        utils/visualization.py:93-115)."""
        import tempfile

        from ..media.video import frame_batches, write_video
        from ..models.smpl_body import BodyModel
        from ..ops.mesh_raster import overlay_mesh_frame

        key = dict(key)
        row = (SMPLPerson & key).fetch1()
        poses = np.asarray(row["poses"], np.float32)
        betas = np.asarray(row["betas"], np.float32)
        cams = np.asarray(row["cams"], np.float32)

        # same body family (SMPL vs SMPL-X, by stored joint count) +
        # coordinate frame the regressor projected with
        # (models/meshregressor.py _infer), so the stored cams apply directly
        body = BodyModel(model="smplx" if poses.shape[1] == 55 else "smpl")
        pose_format = "6d" if poses.shape[-1] == 6 else "aa"
        verts, joints = body(betas, poses, pose_format=pose_format)
        # pelvis-centered like the regressor's stored frame, so the stored
        # cams place the mesh where the projection was trained to land
        verts = np.asarray(verts - joints[:, :1])
        faces = body.p.faces
        video = (BlurredVideo & key).fetch1("output_video")

        def frames_gen():
            idx = 0
            for batch, valid in frame_batches(video, 8):
                for i in range(len(batch)):
                    if not valid[i]:
                        break
                    t = min(idx, len(verts) - 1)
                    if faces is not None:
                        yield overlay_mesh_frame(batch[i], verts[t], cams[t], faces)
                    else:  # body model without topology: plain frame
                        yield batch[i]
                    idx += 1

        fd, out = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
        write_video(frames_gen(), out)
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


@schema
class CenterHMR(Computed):
    definition = """
    -> Video
    ---
    results           : longblob
    """

    def make(self, key):
        """Bottom-up multi-person SMPL (the ROMP/CenterHMR slot, reference
        pipeline.py:1709-1745): ONE single-shot fully-convolutional forward
        per frame — a body-center heatmap plus dense SMPL parameter maps,
        people read out at heatmap peaks (models/romp.py) — no detector, no
        per-person crops, exactly the wrapped repo's structure."""
        import jax
        import jax.numpy as jnp

        from ..media.video import frame_batches
        from ..models.romp import ROMPModel
        from ..ops.warp import normalize_imagenet

        key = dict(key)
        model = ROMPModel()
        th, tw = model.cfg.input_hw
        video = Video.get_robust_reader(key, return_cap=False)
        results = []

        @jax.jit
        def prep(frames):
            x = jax.image.resize(
                jnp.asarray(frames, jnp.float32),
                (frames.shape[0], th, tw, 3), "bilinear")
            return normalize_imagenet(x)

        try:
            for frames, valid in frame_batches(video, 8):
                H_, W_ = frames.shape[1], frames.shape[2]
                scale = max(W_, H_)
                out = model(prep(frames))
                scores = np.asarray(out["scores"])
                j2 = np.asarray(out["joints2d"])       # (B, K, 24, 2) y-up
                j3 = np.asarray(out["joints3d"])
                poses = np.asarray(out["poses"])
                betas = np.asarray(out["betas"])
                cams = np.asarray(out["cams"])
                for i in range(len(frames)):
                    if not valid[i]:
                        break
                    frame_res = []
                    for p in range(model.cfg.max_people):
                        if scores[i, p] < 0.3:
                            continue
                        # normalized square coords (y up) → the reference's
                        # pj2d convention: image = pj2d·max(W,H) + [W,H]/2
                        # (reference pipeline.py:1757-1762)
                        pj2d = np.stack(
                            [j2[i, p, :, 0] * W_, -j2[i, p, :, 1] * H_],
                            axis=-1) / (2.0 * scale)
                        img_xy = pj2d * scale + np.array([W_, H_]) / 2
                        x0, y0 = img_xy.min(axis=0)
                        x1, y1 = img_xy.max(axis=0)
                        frame_res.append(dict(
                            pj2d=pj2d.astype(np.float32),
                            cam=cams[i, p],
                            poses=poses[i, p],
                            betas=betas[i, p],
                            j3d_smpl24=j3[i, p],
                            bbox=np.array([x0, y0, x1 - x0, y1 - y0],
                                          np.float32)))
                    results.append(frame_res)
        finally:
            if os.path.exists(video):
                os.remove(video)
        key["results"] = results
        self.insert1(key)


@schema
class CenterHMRPerson(Computed):
    definition = """
    -> PersonBbox
    -> CenterHMR
    -> VideoInfo
    ---
    keypoints        : longblob
    poses            : longblob
    betas            : longblob
    cams             : longblob
    global_orients   : longblob
    centerhmr_ids    : longblob
    """

    def make(self, key):
        """Match multi-person SMPL results to the annotated person per frame
        (reference pipeline.py:1748-1830; pj2d (−0.5, 0.5) → image coords)."""
        from ..tracking.tracker import iou_matrix_np
        from ..ops.boxes import keypoints_to_bbox

        key = dict(key)
        results = (CenterHMR & key).fetch1("results")
        bbox, present = (PersonBbox & key).fetch1("bbox", "present")
        width, height = (VideoInfo & key).fetch1("width", "height")
        T = len(results)
        J = 24
        kp = np.zeros((T, J, 2), np.float32)
        poses = np.zeros((T, 24, 6), np.float32)
        betas = np.zeros((T, 10), np.float32)
        cams = np.zeros((T, 3), np.float32)
        orients = np.zeros((T, 6), np.float32)
        ids = np.full(T, -1, int)
        target = np.nan_to_num(np.asarray(bbox, np.float32))
        scale = max(width, height)
        for t, frame in enumerate(results):
            if not present[t] or not frame:
                continue
            cand = []
            for r in frame:
                p2 = r["pj2d"] * scale + np.array([width, height]) / 2
                cand.append(np.concatenate([p2, np.ones((len(p2), 1))], -1))
            boxes = np.stack([np.asarray(keypoints_to_bbox(c)) for c in cand])
            ious = iou_matrix_np(target[t][None], boxes)[0]
            best = int(np.argmax(ious))
            if ious[best] > 0.1:
                r = frame[best]
                kp[t] = (r["pj2d"] * scale + np.array([width, height]) / 2)[:J]
                poses[t] = r["poses"]
                betas[t] = r["betas"]
                cams[t] = r["cam"]
                orients[t] = r["poses"][0]
                ids[t] = best
        key["keypoints"] = kp
        key["poses"] = poses
        key["betas"] = betas
        key["cams"] = cams
        key["global_orients"] = orients
        key["centerhmr_ids"] = ids
        self.insert1(key)

    @staticmethod
    def joint_names():
        return SMPL_JOINT_NAMES


@schema
class CenterHMRPersonVideo(Computed):
    definition = """
    -> CenterHMRPerson
    -> BlurredVideo
    ---
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        """Posed-mesh overlay in the CenterHMR pj2d convention
        (reference pipeline.py:1833-1874 renders via pyrender; here the
        device rasterizer, ops/mesh_raster.py)."""
        import tempfile

        from ..media.video import frame_batches, write_video
        from ..models.smpl_body import BodyModel
        from ..ops.mesh_raster import overlay_mesh_xy

        key = dict(key)
        row = (CenterHMRPerson & key).fetch1()
        poses = np.asarray(row["poses"], np.float32)
        betas = np.asarray(row["betas"], np.float32)
        cams = np.asarray(row["cams"], np.float32)   # (T, 3) s, tx, ty
        width, height = (VideoInfo & key).fetch1("width", "height")
        scale = max(width, height)

        body = BodyModel()
        verts, _ = body(betas, poses, pose_format="6d")
        verts = np.asarray(verts)
        faces = body.p.faces
        video = (BlurredVideo & key).fetch1("output_video")

        def frames_gen():
            idx = 0
            for batch, valid in frame_batches(video, 8):
                for i in range(len(batch)):
                    if not valid[i]:
                        break
                    t = min(idx, len(verts) - 1)
                    # pj2d convention: pj2d = (s*v + t)/2 in (−0.5, 0.5),
                    # image = pj2d * scale + [w, h]/2 — the same halving
                    # CenterHMRPerson applies to stored keypoints (above)
                    p = (cams[t, 0] * verts[t, :, :2] + cams[t, 1:3]) / 2.0
                    x = p[:, 0] * scale + width / 2
                    y = p[:, 1] * scale + height / 2
                    if faces is not None and np.abs(cams[t, 0]) > 1e-6:
                        frame = overlay_mesh_xy(batch[i], x, y, verts[t, :, 2], faces)
                    else:
                        frame = batch[i]
                    yield frame
                    idx += 1

        fd, out = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
        write_video(frames_gen(), out)
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)


@schema
class HumorPerson(Computed):
    definition = """
    -> OpenPosePerson
    ----
    trans         : longblob
    root_orient   : longblob
    pose_body     : longblob
    betas         : longblob
    latent_pose   : longblob
    latent_motion : longblob
    floor_plane   : longblob
    contacts      : longblob
    vertices      : longblob
    faces         : longblob
    """

    def make(self, key):
        """Motion-prior test-time optimization (the HuMoR slot,
        reference wrappers/humor.py:83-314): fit SMPL trajectories to 2D
        keypoint evidence with temporal-smoothness and prior terms, optimized
        with optax over sliding windows (models/motion_prior.py)."""
        from ..models.motion_prior import fit_motion

        key = dict(key)
        keypoints = np.asarray((OpenPosePerson & key).fetch1("keypoints"), np.float32)
        width, height = (VideoInfo & key).fetch1("width", "height")
        result = fit_motion(keypoints, width, height)
        key.update(result)
        self.insert1(key)


@schema
class HumorPersonVideo(Computed):
    definition = """
    -> HumorPerson
    ----
    output_video      : attach@localattach    # managed video file
    """

    def make(self, key):
        from .person2d import _render_single_person
        from ..models.smpl_body import BodyModel
        from ..models.smpl_body import project_weak_perspective

        key = dict(key)
        trans = np.asarray((HumorPerson & key).fetch1("trans"))
        pose_body = np.asarray((HumorPerson & key).fetch1("pose_body"))
        root = np.asarray((HumorPerson & key).fetch1("root_orient"))
        betas = np.asarray((HumorPerson & key).fetch1("betas"))
        body = BodyModel()
        T = len(trans)
        pose = np.concatenate([root[:, None], pose_body.reshape(T, 23, 3)], axis=1)
        _, joints = body(np.tile(betas[None], (T, 1)), pose, trans)
        width, height = (VideoInfo & key).fetch1("width", "height")
        j = np.asarray(joints)
        kp = np.stack([j[..., 0] * height / 2 + width / 2,
                       -j[..., 1] * height / 2 + height * 0.9,
                       np.ones_like(j[..., 0])], -1)
        video = (BlurredVideo & key).fetch1("output_video")
        out = _render_single_person(video, kp.astype(np.float32), "coco_17")
        key["output_video"] = out
        self.insert1(key)
        os.remove(video)
        os.remove(out)
