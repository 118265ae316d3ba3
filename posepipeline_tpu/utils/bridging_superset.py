"""MeTRAbs-style 580-joint "bridging formats" superset registry.

The reference wraps a TF-Hub MeTRAbs model whose output is a 580-joint
superset spanning ~20 public skeleton conventions; named skeletons are index
subsets (reference wrappers/bridging.py:18-82, per_skeleton_indices) and
downstream tables hardcode superset index positions
(pipeline.py:1298-1304 bml_movi_87=264..350, :1359 smpl+head_30,
:1396-1399 smplx_42=179..220, :845 superset size 580).

Here the superset is a first-class registry: a concatenation of per-skeleton
blocks whose *placement* reproduces every index the reference hardcodes:

    block                  range        notes
    smpl_24                [0,   24)    smpl+head_30 body = [23, 0..22]
    h36m_25                [24,  49)
    mpi_inf_3dhp_28        [49,  77)    head_top at 76 (smpl+head_30 head)
    ghum_35                [77, 112)    eyes/ears at 89-92, nose at 105
    coco_19                [112, 131)
    coco feet (6)          [131, 137)   make_coco_25's "_coco" extras
    aspset_17              [137, 154)
    kinectv2_25            [154, 179)
    smplx_42               [179, 221)   == reference smplx inds 179..220
    berkeley_mhad_43       [221, 264)
    bml_movi_87            [264, 351)   == reference bml inds 264..350
    sailvos_26             [351, 377)
    gpa_34                 [377, 411)
    mads_19                [411, 430)
    total_capture_21       [430, 451)
    jta_22                 [451, 473)
    ikea_asm_17            [473, 490)
    human4d_32             [490, 522)
    lsp_14                 [522, 536)
    3dpeople_29            [536, 565)
    umpm_15                [565, 580)

h36m_17 / mpi_inf_3dhp_17 / coco_25 / smpl+head_30 are *virtual* skeletons:
index arrays into the blocks above (coco_25 = coco_19 + the six foot joints,
exactly the make_coco_25 construction, bridging.py:18-36). Intra-block joint
orders for blocks the reference never names are framework conventions.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

SUPERSET_SIZE = 580

# ---------------------------------------------------------------------------
# Per-block joint names (skeleton-suffixed, metrabs style)
# ---------------------------------------------------------------------------

_SMPL_24 = ["pelv", "lhip", "rhip", "spi1", "lkne", "rkne", "spi2", "lank",
            "rank", "spi3", "lfoo", "rfoo", "neck", "lcla", "rcla", "head",
            "lsho", "rsho", "lelb", "relb", "lwri", "rwri", "lhan", "rhan"]

_H36M_25 = ["pelv", "rhip", "rkne", "rank", "rfoo", "rtoe", "lhip", "lkne",
            "lank", "lfoo", "ltoe", "spin", "neck", "head", "htop", "lsho",
            "lelb", "lwri", "lthu", "lfin", "rsho", "relb", "rwri", "rthu",
            "rfin"]
# classic 17-joint H36M protocol subset of the 25-joint set
_H36M_17_LOCAL = [0, 1, 2, 3, 6, 7, 8, 11, 12, 13, 14, 15, 16, 17, 20, 21, 22]

# head_top deliberately last (superset index 76 = smpl+head_30's head joint)
_MPI_3DHP_28 = ["spine3", "spine4", "spine2", "spine", "pelv", "neck", "head",
                "lcla", "lsho", "lelb", "lwri", "lhan", "rcla", "rsho", "relb",
                "rwri", "rhan", "lhip", "lkne", "lank", "lfoo", "ltoe", "rhip",
                "rkne", "rank", "rfoo", "rtoe", "htop"]
_MPI_3DHP_17_LOCAL = [27, 5, 13, 14, 15, 8, 9, 10, 22, 23, 24, 17, 18, 19, 4, 3, 6]

# GHUM head/face landmarks at locals 12-15 (eyes/ears → superset 89-92) and
# nose at local 28 (superset 105); remaining slots are the GHUM body chain
_GHUM_35 = ["pelv", "spi1", "spi2", "spi3", "neck", "head", "lcla", "lsho",
            "lelb", "lwri", "rcla", "rsho", "leye", "lear", "reye", "rear",
            "relb", "rwri", "lhip", "lkne", "lank", "lfoo", "rhip", "rkne",
            "rank", "rfoo", "lhan", "rhan", "nose", "htop", "ltoe", "rtoe",
            "lthu", "rthu", "jaw"]

# coco_19 display order follows the reference's coco_25 normalized names
# (bridging.py:179-205): sternum first, then nose/pelvis/limbs/eyes/ears
_COCO_19 = ["stern", "nose", "pelv", "lsho", "lelb", "lwri", "lhip", "lkne",
            "lank", "rsho", "relb", "rwri", "rhip", "rkne", "rank", "leye",
            "lear", "reye", "rear"]
_COCO_FEET = ["ltoe", "lsmalltoe", "lheel", "rtoe", "rsmalltoe", "rheel"]

_SMPLX_42 = ["pelv", "lhip", "rhip", "spi1", "lkne", "rkne", "spi2", "lank",
             "rank", "spi3", "lfoo", "rfoo", "neck", "lcla", "rcla", "head",
             "lsho", "rsho", "lelb", "relb", "lwri", "rwri", "jaw", "leyeball",
             "reyeball", "lindex", "lmiddle", "lpinky", "lring", "lthumb",
             "rindex", "rmiddle", "rpinky", "rring", "rthumb", "nose", "reye",
             "leye", "rear", "lear", "ltoe", "rtoe"]

_LSP_14 = ["rank", "rkne", "rhip", "lhip", "lkne", "lank", "rwri", "relb",
           "rsho", "lsho", "lelb", "lwri", "neck", "htop"]

_KINECTV2_25 = ["spinebase", "spinemid", "neck", "head", "lsho", "lelb",
                "lwri", "lhan", "rsho", "relb", "rwri", "rhan", "lhip",
                "lkne", "lank", "lfoo", "rhip", "rkne", "rank", "rfoo",
                "spineshoulder", "lhandtip", "lthu", "rhandtip", "rthu"]

# BML-MoVi 87-marker names (reference bridging.py:210-296 display list)
_BML_MOVI_87 = [
    "backneck", "upperback", "clavicle", "sternum", "umbilicus", "lfronthead",
    "lbackhead", "lback", "lshom", "lupperarm", "lelbm", "lforearm",
    "lwrithumbside", "lwripinkieside", "lfin", "lasis", "lpsis", "lfrontthigh",
    "lthigh", "lknem", "lankm", "lhee", "lfifthmetatarsal", "ltoe", "lcheek",
    "lbreast", "lelbinner", "lwaist", "lthumb", "lfrontinnerthigh",
    "linnerknee", "lshin", "lfirstmetatarsal", "lfourthtoe", "lscapula",
    "lbum", "rfronthead", "rbackhead", "rback", "rshom", "rupperarm", "relbm",
    "rforearm", "rwrithumbside", "rwripinkieside", "rfin", "rasis", "rpsis",
    "rfrontthigh", "rthigh", "rknem", "rankm", "rhee", "rfifthmetatarsal",
    "rtoe", "rcheek", "rbreast", "relbinner", "rwaist", "rthumb",
    "rfrontinnerthigh", "rinnerknee", "rshin", "rfirstmetatarsal",
    "rfourthtoe", "rscapula", "rbum", "head", "mhip", "pelv", "thor", "lank",
    "lelb", "lhip", "lhan", "lkne", "lsho", "lwri", "lfoo", "rank", "relb",
    "rhip", "rhan", "rkne", "rsho", "rwri", "rfoo",
]

_BLOCKS: List[tuple] = [
    ("smpl_24", _SMPL_24),
    ("h36m_25", _H36M_25),
    ("mpi_inf_3dhp_28", _MPI_3DHP_28),
    ("ghum_35", _GHUM_35),
    ("coco_19", _COCO_19),
    ("_coco_feet", _COCO_FEET),
    ("aspset_17", [f"j{i:02d}" for i in range(17)]),
    ("kinectv2_25", _KINECTV2_25),
    ("smplx_42", _SMPLX_42),
    ("berkeley_mhad_43", [f"j{i:02d}" for i in range(43)]),
    ("bml_movi_87", _BML_MOVI_87),
    ("sailvos_26", [f"j{i:02d}" for i in range(26)]),
    ("gpa_34", [f"j{i:02d}" for i in range(34)]),
    ("mads_19", [f"j{i:02d}" for i in range(19)]),
    ("total_capture_21", [f"j{i:02d}" for i in range(21)]),
    ("jta_22", [f"j{i:02d}" for i in range(22)]),
    ("ikea_asm_17", [f"j{i:02d}" for i in range(17)]),
    ("human4d_32", [f"j{i:02d}" for i in range(32)]),
    ("lsp_14", _LSP_14),
    ("3dpeople_29", [f"j{i:02d}" for i in range(29)]),
    ("umpm_15", [f"j{i:02d}" for i in range(15)]),
]

SUPERSET_JOINT_NAMES: List[str] = []
_BLOCK_START: Dict[str, int] = {}
for _name, _joints in _BLOCKS:
    _BLOCK_START[_name] = len(SUPERSET_JOINT_NAMES)
    _suffix = "coco" if _name == "_coco_feet" else _name.split("_")[0]
    SUPERSET_JOINT_NAMES.extend(f"{j}_{_suffix}" for j in _joints)
assert len(SUPERSET_JOINT_NAMES) == SUPERSET_SIZE, len(SUPERSET_JOINT_NAMES)

# sanity: reference-hardcoded placements
assert _BLOCK_START["smplx_42"] == 179
assert _BLOCK_START["bml_movi_87"] == 264


def _block_range(name: str) -> np.ndarray:
    start = _BLOCK_START[name]
    n = len(dict(_BLOCKS)[name])
    return np.arange(start, start + n)


PER_SKELETON_INDICES: Dict[str, np.ndarray] = {
    name: _block_range(name) for name, _ in _BLOCKS if not name.startswith("_")
}
# virtual skeletons (index arrays into the blocks)
PER_SKELETON_INDICES["h36m_17"] = _BLOCK_START["h36m_25"] + np.array(_H36M_17_LOCAL)
PER_SKELETON_INDICES["mpi_inf_3dhp_17"] = (
    _BLOCK_START["mpi_inf_3dhp_28"] + np.array(_MPI_3DHP_17_LOCAL))
# make_coco_25: coco_19 indices + the "_coco" foot joints appended at the end
PER_SKELETON_INDICES["coco_25"] = np.concatenate(
    [PER_SKELETON_INDICES["coco_19"], _block_range("_coco_feet")])
# reference pipeline.py:1359 — verbatim index list (joint 23 of smpl first,
# then smpl 0..22, then head_top / eyes / ears / nose from the blocks above)
SMPL_HEAD_30_INDICES = np.array(
    [23] + list(range(23)) + [76, 89, 90, 91, 92, 105])
PER_SKELETON_INDICES["smpl+head_30"] = SMPL_HEAD_30_INDICES
# the full superset
PER_SKELETON_INDICES[""] = np.arange(SUPERSET_SIZE)

assert PER_SKELETON_INDICES["smplx_42"][0] == 179
assert PER_SKELETON_INDICES["smplx_42"][-1] == 220
assert PER_SKELETON_INDICES["bml_movi_87"][0] == 264
assert PER_SKELETON_INDICES["bml_movi_87"][-1] == 350
assert SUPERSET_JOINT_NAMES[76] == "htop_mpi"
assert [SUPERSET_JOINT_NAMES[i] for i in (89, 90, 91, 92, 105)] == [
    "leye_ghum", "lear_ghum", "reye_ghum", "rear_ghum", "nose_ghum"]


# ---------------------------------------------------------------------------
# Display names (reference normalized_joint_name_dictionary parity,
# bridging.py:179-296) and joint-name lookup
# ---------------------------------------------------------------------------

_COCO_25_DISPLAY = [
    "Sternum", "Nose", "Pelvis", "Left Shoulder", "Left Elbow", "Left Wrist",
    "Left Hip", "Left Knee", "Left Ankle", "Right Shoulder", "Right Elbow",
    "Right Wrist", "Right Hip", "Right Knee", "Right Ankle", "Left Eye",
    "Left Ear", "Right Eye", "Right Ear", "Left Big Toe", "Left Little Toe",
    "Left Heel", "Right Big Toe", "Right Little Toe", "Right Heel",
]

_BML_DISPLAY_TAIL = {
    "lhee": "Left Heel", "ltoe": "Left Big Toe", "rhee": "Right Heel",
    "rtoe": "Right Big Toe", "head": "Head", "pelv": "Pelvis",
    "thor": "Sternum", "lank": "Left Ankle", "lelb": "Left Elbow",
    "lhip": "Left Hip", "lhan": "Left Hand", "lkne": "Left Knee",
    "lsho": "Left Shoulder", "lwri": "Left Wrist", "lfoo": "Left Foot",
    "rank": "Right Ankle", "relb": "Right Elbow", "rhip": "Right Hip",
    "rhan": "Right Hand", "rkne": "Right Knee", "rsho": "Right Shoulder",
    "rwri": "Right Wrist", "rfoo": "Right Foot",
}

normalized_joint_name_dictionary: Dict[str, List[str]] = {
    "coco_25": list(_COCO_25_DISPLAY),
    "bml_movi_87": [_BML_DISPLAY_TAIL.get(j, j) for j in _BML_MOVI_87],
}


def get_joint_names(skeleton: str) -> List[str]:
    """Per-skeleton joint names, normalized display names where the
    reference defines them (bridging.py get_joint_names + normalized dict)."""
    if skeleton in normalized_joint_name_dictionary:
        return list(normalized_joint_name_dictionary[skeleton])
    idx = PER_SKELETON_INDICES[skeleton]
    return [SUPERSET_JOINT_NAMES[i] for i in idx]


# ---------------------------------------------------------------------------
# Skeleton edges for rendering (reference get_skeleton_edges)
# ---------------------------------------------------------------------------

def _edges_by_name(skeleton: str, pairs) -> np.ndarray:
    names = ([SUPERSET_JOINT_NAMES[i].rsplit("_", 1)[0]
              for i in PER_SKELETON_INDICES[skeleton]])
    lut = {n: i for i, n in enumerate(names)}
    return np.array([(lut[a], lut[b]) for a, b in pairs if a in lut and b in lut],
                    np.int32).reshape(-1, 2)


PER_SKELETON_EDGES: Dict[str, np.ndarray] = {
    "coco_19": _edges_by_name("coco_19", [
        ("nose", "stern"), ("stern", "pelv"),
        ("stern", "lsho"), ("lsho", "lelb"), ("lelb", "lwri"),
        ("stern", "rsho"), ("rsho", "relb"), ("relb", "rwri"),
        ("pelv", "lhip"), ("lhip", "lkne"), ("lkne", "lank"),
        ("pelv", "rhip"), ("rhip", "rkne"), ("rkne", "rank"),
        ("nose", "leye"), ("leye", "lear"), ("nose", "reye"), ("reye", "rear"),
    ]),
    "h36m_25": _edges_by_name("h36m_25", [
        ("pelv", "rhip"), ("rhip", "rkne"), ("rkne", "rank"),
        ("rank", "rfoo"), ("rfoo", "rtoe"),
        ("pelv", "lhip"), ("lhip", "lkne"), ("lkne", "lank"),
        ("lank", "lfoo"), ("lfoo", "ltoe"),
        ("pelv", "spin"), ("spin", "neck"), ("neck", "head"),
        ("head", "htop"),
        ("neck", "lsho"), ("lsho", "lelb"), ("lelb", "lwri"),
        ("lwri", "lthu"), ("lwri", "lfin"),
        ("neck", "rsho"), ("rsho", "relb"), ("relb", "rwri"),
        ("rwri", "rthu"), ("rwri", "rfin"),
    ]),
    "mpi_inf_3dhp_28": _edges_by_name("mpi_inf_3dhp_28", [
        ("spine", "spine2"), ("spine2", "spine3"), ("spine3", "spine4"),
        ("spine", "pelv"), ("spine4", "neck"), ("neck", "head"),
        ("head", "htop"),
        ("neck", "lcla"), ("lcla", "lsho"), ("lsho", "lelb"),
        ("lelb", "lwri"), ("lwri", "lhan"),
        ("neck", "rcla"), ("rcla", "rsho"), ("rsho", "relb"),
        ("relb", "rwri"), ("rwri", "rhan"),
        ("pelv", "lhip"), ("lhip", "lkne"), ("lkne", "lank"),
        ("lank", "lfoo"), ("lfoo", "ltoe"),
        ("pelv", "rhip"), ("rhip", "rkne"), ("rkne", "rank"),
        ("rank", "rfoo"), ("rfoo", "rtoe"),
    ]),
}
PER_SKELETON_EDGES["coco_25"] = np.concatenate([
    PER_SKELETON_EDGES["coco_19"],
    # feet attach to the ankles (coco_25 locals: 19-21 left, 22-24 right)
    np.array([(8, 19), (8, 20), (8, 21), (14, 22), (14, 23), (14, 24)], np.int32),
])
# smpl+head_30 local order: [rhan, smpl 0..22, htop, leye, lear, reye, rear, nose]
PER_SKELETON_EDGES["smpl+head_30"] = np.array([
    (1, 2), (1, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8), (6, 9),
    (7, 10), (8, 11), (9, 12), (10, 13), (13, 14), (13, 15), (13, 16),
    (16, 24), (14, 17), (15, 18), (17, 19), (18, 20), (19, 21), (20, 22),
    (21, 23), (22, 0), (24, 29), (25, 26), (27, 28),
], np.int32)
# bml: connect the 21 canonical tail joints (locals 66-86)
PER_SKELETON_EDGES["bml_movi_87"] = _edges_by_name("bml_movi_87", [
    ("pelv", "thor"), ("thor", "head"),
    ("thor", "lsho"), ("lsho", "lelb"), ("lelb", "lwri"), ("lwri", "lhan"),
    ("thor", "rsho"), ("rsho", "relb"), ("relb", "rwri"), ("rwri", "rhan"),
    ("pelv", "lhip"), ("lhip", "lkne"), ("lkne", "lank"), ("lank", "lfoo"),
    ("pelv", "rhip"), ("rhip", "rkne"), ("rkne", "rank"), ("rank", "rfoo"),
])


def get_skeleton_edges(skeleton: str) -> np.ndarray:
    """Joint-index edge list for overlay rendering; empty for skeletons
    without a defined stick figure."""
    return PER_SKELETON_EDGES.get(skeleton, np.zeros((0, 2), np.int32))


# ---------------------------------------------------------------------------
# Filtering and confidence (reference bridging.py:75-102)
# ---------------------------------------------------------------------------

def filter_skeleton(keypoints, skeleton: str):
    """Select a named skeleton's joints from superset keypoints
    (…, 580, C) → (…, len(skeleton), C). Accepts a list of per-frame arrays
    (reference form) or one stacked array."""
    idx = PER_SKELETON_INDICES[skeleton]
    if isinstance(keypoints, (list, tuple)):
        return np.array([np.asarray(k)[..., idx, :] for k in keypoints])
    return np.asarray(keypoints)[..., idx, :]


def scale_align(poses):
    """Per-item scale normalization before stdev (bridging.py:85-89)."""
    poses = np.asarray(poses, np.float32)
    sq = np.mean(np.square(poses), axis=(-2, -1), keepdims=True)
    mean_sq = np.mean(sq, axis=-3, keepdims=True)
    return poses * np.sqrt(mean_sq / np.maximum(sq, 1e-12))


def point_stdev(poses, item_axis: int, coord_axis: int):
    """Average per-joint stdev across augmentations (bridging.py:92-95)."""
    poses = np.asarray(poses, np.float32)
    var = np.var(poses, axis=item_axis, keepdims=True)
    std = np.sqrt(np.sum(var, axis=coord_axis, keepdims=True))
    return np.squeeze(std, axis=(item_axis, coord_axis))


def augmentation_noise(poses3d):
    """Noise estimate from test-time-augmentation spread: stdev of the
    scale-aligned 3D poses across the augmentation axis
    (…, A, J, 3) → (…, J). Reference bridging.py:96-97."""
    return point_stdev(scale_align(poses3d), item_axis=-3, coord_axis=-1)


def noise_to_conf(x, half_val: float = 200.0, sharpness: float = 50.0):
    """Sigmoid mapping of TTA noise to a confidence (bridging.py:100-102)."""
    x = np.asarray(x, np.float32)
    return 1.0 / (1.0 + np.exp((x - half_val) / sharpness))
