"""Clinical gait kinematics from lifted 3D keypoints.

Reference: utils/lifting.py:1-71 — pelvis derotation + sagittal-plane hip/knee
angles + foot positions from LiftingPerson output (the clinical deliverable).
Vectorized; also exposed as a pure function over arrays so it is testable
without the table layer.
"""

from __future__ import annotations

import numpy as np

from .skeletons import COCO_17, H36M_17


def kinematics_from_arrays(keypoints3d: np.ndarray, keypoints2d: np.ndarray,
                           timestamps: np.ndarray, conf_thresh: float = 0.5) -> dict:
    """Gait kinematics from (T, 17, 3) H36M 3D + (T, 17, 3) 2D keypoints.

    Returns timestamps, foot forward positions, and sagittal hip/knee angles
    (degrees), for frames where all leg keypoints are confident.
    """
    kp3 = np.asarray(keypoints3d, float)
    kp2 = np.asarray(keypoints2d, float)
    j2 = COCO_17 if kp2.shape[1] == 17 and "Left Ankle" in COCO_17 else COCO_17
    leg_idx = np.array([COCO_17.index(k) for k in
                        ["Left Ankle", "Left Knee", "Left Hip",
                         "Right Hip", "Right Knee", "Right Ankle"]]) \
        if kp2.shape[1] == 17 else np.arange(6)
    valid = np.all(kp2[:, leg_idx, -1] > conf_thresh, axis=1)
    kp3 = kp3[valid]
    timestamps = np.asarray(timestamps, float)[valid]
    if len(kp3) == 0:
        return {"timestamps": timestamps}

    names = H36M_17
    r_hip, l_hip = names.index("Right hip"), names.index("Left hip")
    delta_pelvis = kp3[:, l_hip] - kp3[:, r_hip]
    pelvis_angle = np.unwrap(-np.arctan2(delta_pelvis[:, 0], delta_pelvis[:, 1]))
    pelvis_angle = np.median(pelvis_angle, axis=0, keepdims=True)

    z = np.zeros_like(pelvis_angle)
    rot = np.array([
        [np.cos(pelvis_angle), -np.sin(pelvis_angle), z],
        [np.sin(pelvis_angle), np.cos(pelvis_angle), z],
        [z, z, 1 + z],
    ]).transpose(2, 0, 1)
    kp3 = kp3 @ rot

    outputs = {
        "timestamps": timestamps,
        "Right Foot": kp3[:, names.index("Right foot"), 0],
        "Left Foot": kp3[:, names.index("Left foot"), 0],
    }

    angles = [
        ("Right Hip", ("Right hip", "Right knee"), ("Spine", "Hip")),
        ("Left Hip", ("Left hip", "Left knee"), ("Spine", "Hip")),
        ("Right Knee", ("Right knee", "Right foot"), ("Right hip", "Right knee")),
        ("Left Knee", ("Left knee", "Left foot"), ("Left hip", "Left knee")),
    ]
    plane = np.array([0, 2])  # sagittal
    for joint, seg1, seg2 in angles:
        v1 = kp3[:, names.index(seg1[1])][:, plane] - kp3[:, names.index(seg1[0])][:, plane]
        v2 = kp3[:, names.index(seg2[1])][:, plane] - kp3[:, names.index(seg2[0])][:, plane]
        v1 /= np.maximum(np.linalg.norm(v1, axis=-1, keepdims=True), 1e-9)
        v2 /= np.maximum(np.linalg.norm(v2, axis=-1, keepdims=True), 1e-9)
        outputs[joint] = np.degrees(np.arccos(np.clip(np.sum(v1 * v2, -1), -1, 1)))
    return outputs


def lifting_kinematics(key) -> dict:
    """Table-level entry matching the reference signature (utils/lifting.py:1)."""
    from ..pipeline import LiftingPerson, TopDownPerson, VideoInfo

    keypoints3d = np.asarray((LiftingPerson & key).fetch1("keypoints_3d"))
    keypoints = np.asarray((TopDownPerson & key).fetch1("keypoints"))
    timestamps = (VideoInfo & key).fetch1("timestamps")
    t = np.array([(x - timestamps[0]).total_seconds() for x in timestamps])
    if keypoints.shape[1] == 25:
        from .skeletons import body25_to_coco17
        keypoints = body25_to_coco17(keypoints)
    elif keypoints.shape[1] > 17:
        keypoints = keypoints[:, :17]
    return kinematics_from_arrays(keypoints3d, keypoints, t)
