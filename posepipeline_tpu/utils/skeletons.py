"""Skeleton definitions, joint-name registries, and format conversions.

Centralizes what the reference scatters across per-table ``joint_names()``
methods (pipeline.py:906-934 BODY_25, :1097-1141 top-down variants,
:1418-1438 H36M) and per-wrapper conversion code (bridging.py:179-296 skeleton
registry, poseformer.py:19-53 COCO→H36M).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

# ---------------------------------------------------------------------------
# Canonical joint-name lists
# ---------------------------------------------------------------------------

COCO_17 = [
    "Nose", "Left Eye", "Right Eye", "Left Ear", "Right Ear",
    "Left Shoulder", "Right Shoulder", "Left Elbow", "Right Elbow",
    "Left Wrist", "Right Wrist", "Left Hip", "Right Hip",
    "Left Knee", "Right Knee", "Left Ankle", "Right Ankle",
]

# OpenPose BODY_25 order (reference OpenPosePerson.joint_names, pipeline.py:906-934)
BODY_25 = [
    "Nose", "Sternum", "Right Shoulder", "Right Elbow", "Right Wrist",
    "Left Shoulder", "Left Elbow", "Left Wrist", "Pelvis", "Right Hip",
    "Right Knee", "Right Ankle", "Left Hip", "Left Knee", "Left Ankle",
    "Right Eye", "Left Eye", "Right Ear", "Left Ear", "Left Big Toe",
    "Left Little Toe", "Left Heel", "Right Big Toe", "Right Little Toe",
    "Right Heel",
]

H36M_17 = [
    "Hip", "Right hip", "Right knee", "Right foot",
    "Left hip", "Left knee", "Left foot",
    "Spine", "Thorax", "Nose", "Head",
    "Left shoulder", "Left elbow", "Left wrist",
    "Right shoulder", "Right elbow", "Right wrist",
]

# COCO-WholeBody: 17 body + 6 feet + 68 face + 42 hands = 133
_FOOT_6 = ["Left Big Toe", "Left Small Toe", "Left Heel",
           "Right Big Toe", "Right Small Toe", "Right Heel"]
COCO_WHOLEBODY_133 = (COCO_17 + _FOOT_6
                      + [f"Face-{i}" for i in range(68)]
                      + [f"LHand-{i}" for i in range(21)]
                      + [f"RHand-{i}" for i in range(21)])

# Halpe-136: 20 body + 6 feet + 68 face + 42 hands (AlphaPose convention)
_HALPE_BODY_20 = COCO_17 + ["Head", "Neck", "Hip"]
HALPE_136 = (_HALPE_BODY_20 + _FOOT_6
             + [f"Face-{i}" for i in range(68)]
             + [f"LHand-{i}" for i in range(21)]
             + [f"RHand-{i}" for i in range(21)])

HAND_21 = (["Wrist"]
           + [f"Thumb-{i}" for i in range(1, 5)]
           + [f"Index-{i}" for i in range(1, 5)]
           + [f"Middle-{i}" for i in range(1, 5)]
           + [f"Ring-{i}" for i in range(1, 5)]
           + [f"Pinky-{i}" for i in range(1, 5)])

JOINT_NAMES: Dict[str, List[str]] = {
    "coco_17": COCO_17,
    "body_25": BODY_25,
    # NOTE: the *bridging* coco_25 display order lives in
    # utils/bridging_superset.normalized_joint_name_dictionary; this entry is
    # the BODY_25-ordered variant used by OpenPose-family tables
    "coco_25": BODY_25,
    "h36m_17": H36M_17,
    "coco_wholebody_133": COCO_WHOLEBODY_133,
    "halpe_136": HALPE_136,
    "hand_21": HAND_21,
}

# Skeleton limb lists (for rendering)
COCO_17_LIMBS = (
    (5, 7), (7, 9), (6, 8), (8, 10), (11, 13), (13, 15), (12, 14), (14, 16),
    (5, 6), (11, 12), (5, 11), (6, 12), (0, 1), (0, 2), (1, 3), (2, 4),
)
BODY_25_LIMBS = (
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8),
    (8, 9), (9, 10), (10, 11), (8, 12), (12, 13), (13, 14),
    (0, 15), (0, 16), (15, 17), (16, 18),
    (14, 19), (19, 20), (14, 21), (11, 22), (22, 23), (11, 24),
)
H36M_17_LIMBS = (
    (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7), (7, 8),
    (8, 9), (9, 10), (8, 11), (11, 12), (12, 13), (8, 14), (14, 15), (15, 16),
)
HAND_21_LIMBS = tuple(
    [(0, 1), (1, 2), (2, 3), (3, 4),
     (0, 5), (5, 6), (6, 7), (7, 8),
     (0, 9), (9, 10), (10, 11), (11, 12),
     (0, 13), (13, 14), (14, 15), (15, 16),
     (0, 17), (17, 18), (18, 19), (19, 20)]
)

LIMBS: Dict[str, tuple] = {
    "coco_17": COCO_17_LIMBS,
    "body_25": BODY_25_LIMBS,
    "coco_25": BODY_25_LIMBS,
    "h36m_17": H36M_17_LIMBS,
    "hand_21": HAND_21_LIMBS,
}


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def coco17_to_body25(kp):
    """COCO-17 (…, 17, 3) → BODY_25 (…, 25, 3).

    Sternum/Pelvis synthesized as midpoints; foot joints zero-confidence
    (COCO has no toe/heel annotations).
    """
    kp = np.asarray(kp, np.float32)
    out = np.zeros(kp.shape[:-2] + (25, 3), np.float32)
    mid = lambda a, b: (kp[..., a, :] + kp[..., b, :]) / 2.0
    mapping = {0: 0, 15: 2, 16: 1, 17: 4, 18: 3,   # nose, eyes, ears (R/L swap)
               2: 6, 3: 8, 4: 10, 5: 5, 6: 7, 7: 9,  # arms
               9: 12, 10: 14, 11: 16, 12: 11, 13: 13, 14: 15}  # legs
    for b25, c17 in mapping.items():
        out[..., b25, :] = kp[..., c17, :]
    out[..., 1, :] = mid(5, 6)    # sternum / neck
    out[..., 8, :] = mid(11, 12)  # pelvis / midhip
    return out


def body25_to_coco17(kp):
    """BODY_25 (…, 25, 3) → COCO-17 (…, 17, 3)."""
    kp = np.asarray(kp, np.float32)
    idx = [0, 16, 15, 18, 17, 5, 2, 6, 3, 7, 4, 12, 9, 13, 10, 14, 11]
    return kp[..., idx, :]


def wholebody133_subset(kp, skeleton: str):
    """Extract a named subset from wholebody-133 keypoints (the bridging
    'skeleton filtering' role, reference wrappers/bridging.py:75-82)."""
    kp = np.asarray(kp, np.float32)
    if skeleton in ("coco_19", "coco_17"):
        return kp[..., :17, :]
    if skeleton in ("coco_25", "body_25", "openpose"):
        body = kp[..., :17, :]
        feet = kp[..., 17:23, :]  # LBigToe LSmallToe LHeel RBigToe RSmallToe RHeel
        b25 = coco17_to_body25(body)
        b25[..., 19, :] = feet[..., 0, :]
        b25[..., 20, :] = feet[..., 1, :]
        b25[..., 21, :] = feet[..., 2, :]
        b25[..., 22, :] = feet[..., 3, :]
        b25[..., 23, :] = feet[..., 4, :]
        b25[..., 24, :] = feet[..., 5, :]
        return b25
    if skeleton == "hands_42":
        return kp[..., 91:133, :]
    raise KeyError(f"Unknown skeleton subset {skeleton!r}")


# Bridging-style named skeletons available for BottomUpBridgingVideo
# (reference BottomUpBridgingVideoLookup contents, pipeline.py:308-320)
BRIDGING_SKELETONS = ["bml_movi_87", "h36m_25", "smpl+head_30",
                      "mpi_inf_3dhp_28", "coco_19", "coco_25"]
