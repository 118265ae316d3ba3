"""Human3.6M protocol: GT import schema, camera model, MPJPE/PCK evaluation.

Reference: pose_pipeline/demo/h36_dj.py — ``Subject``/``Activity``/
``ActivityView`` tables storing GT 3D/2D keypoints with official camera
calibration (:19-116) and a CDF import path (:118-213), driven by
scripts/process_h36m.py. The reference never committed the accuracy
computation ("comparison against GT is done ad-hoc in notebooks", SURVEY §4);
here the MPJPE/P-MPJPE/PCK protocol is first-class and unit-tested.
"""

from __future__ import annotations

import numpy as np

from ..core.engine import Manual
from ..pipeline._schema import schema
from ..pipeline.video import Video


@schema
class H36MSubject(Manual):
    definition = """
    subject     : varchar(16)
    """


@schema
class H36MActivity(Manual):
    definition = """
    -> H36MSubject
    activity    : varchar(50)
    ---
    keypoints3d_world : longblob   # (T, 17, 3) world-frame GT, meters
    """


@schema
class H36MActivityView(Manual):
    definition = """
    -> H36MActivity
    camera_id   : int
    ---
    -> Video
    keypoints2d : longblob   # (T, 17, 2) image-plane GT
    keypoints3d : longblob   # (T, 17, 3) camera-frame GT
    camera      : longblob   # dict: R, T, K, dist, P
    """


def convert_camera(R, T, f, c, k=None, p=None):
    """Assemble the camera dict the reference builds (h36_dj.py:67-115):
    rotation, translation, intrinsics K, distortion, projection P."""
    R = np.asarray(R, float).reshape(3, 3)
    T = np.asarray(T, float).reshape(3)
    f = np.asarray(f, float).ravel()
    c = np.asarray(c, float).ravel()
    K = np.array([[f[0], 0, c[0]], [0, f[1], c[1]], [0, 0, 1.0]])
    dist = np.zeros(5)
    if k is not None:
        kk = np.asarray(k, float).ravel()
        dist[[0, 1, 4]] = kk[:3]
    if p is not None:
        dist[[2, 3]] = np.asarray(p, float).ravel()[:2]
    P = K @ np.concatenate([R, -R @ T[:, None]], axis=1)
    return dict(R=R, T=T, K=K, dist=dist, P=P)


def world_to_camera(points_world, camera):
    """(T, J, 3) world → camera frame."""
    R, T = camera["R"], camera["T"]
    return (np.asarray(points_world) - T) @ R.T


def project_to_image(points_camera, camera):
    """(T, J, 3) camera-frame → (T, J, 2) pixels (no distortion)."""
    p = np.asarray(points_camera, float)
    x = p[..., :2] / np.maximum(p[..., 2:3], 1e-9)
    K = camera["K"]
    return x * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])


# ---------------------------------------------------------------------------
# Metrics (the evaluation protocol BASELINE.json configs[2] requires)
# ---------------------------------------------------------------------------

def mpjpe(pred, gt, valid=None):
    """Mean per-joint position error after root alignment (H36M protocol 1).

    pred/gt: (T, J, 3); root = joint 0 (Hip). Returns scalar (same units)."""
    pred = np.asarray(pred, float)
    gt = np.asarray(gt, float)
    pred = pred - pred[:, :1]
    gt = gt - gt[:, :1]
    err = np.linalg.norm(pred - gt, axis=-1)
    if valid is not None:
        err = err[np.asarray(valid, bool)]
    return float(err.mean())


def p_mpjpe(pred, gt, valid=None):
    """Procrustes-aligned MPJPE (protocol 2): per-frame similarity alignment."""
    pred = np.asarray(pred, float)
    gt = np.asarray(gt, float)
    if valid is not None:
        v = np.asarray(valid, bool)
        pred, gt = pred[v], gt[v]
    errs = []
    for p, g in zip(pred, gt):
        mu_p, mu_g = p.mean(0), g.mean(0)
        pc, gc = p - mu_p, g - mu_g
        norm_p = np.linalg.norm(pc)
        if norm_p < 1e-9:
            continue
        A = gc.T @ pc
        U, s, Vt = np.linalg.svd(A)
        d = np.sign(np.linalg.det(U @ Vt))
        D = np.diag([1, 1, d])
        R = U @ D @ Vt
        scale = (s * np.diag(D)).sum() / (norm_p**2)
        aligned = scale * pc @ R.T + mu_g
        errs.append(np.linalg.norm(aligned - g, axis=-1).mean())
    return float(np.mean(errs)) if errs else float("nan")


def pck(pred2d, gt2d, threshold: float, valid=None):
    """2D percentage-of-correct-keypoints at a pixel threshold."""
    pred2d = np.asarray(pred2d, float)[..., :2]
    gt2d = np.asarray(gt2d, float)[..., :2]
    dist = np.linalg.norm(pred2d - gt2d, axis=-1)
    if valid is not None:
        dist = dist[np.asarray(valid, bool)]
    return float((dist < threshold).mean())


def pck_bbox_normalized(pred2d, gt2d, bboxes, frac: float = 0.05, valid=None):
    """PCK with a per-frame threshold = frac · max(bbox w, h) (PCK@0.05)."""
    pred2d = np.asarray(pred2d, float)[..., :2]
    gt2d = np.asarray(gt2d, float)[..., :2]
    bb = np.asarray(bboxes, float)
    thr = frac * np.maximum(bb[:, 2], bb[:, 3])[:, None]
    dist = np.linalg.norm(pred2d - gt2d, axis=-1)
    ok = dist < thr
    if valid is not None:
        ok = ok[np.asarray(valid, bool)]
    return float(ok.mean())


def evaluate_lifting(key, gt3d, valid=None):
    """MPJPE/P-MPJPE of a LiftingPerson row against GT (protocol entry)."""
    from ..pipeline import LiftingPerson

    pred = np.asarray((LiftingPerson & key).fetch1("keypoints_3d"))
    v = np.asarray((LiftingPerson & key).fetch1("keypoints_valid"), bool)
    if valid is not None:
        v = v & np.asarray(valid, bool)
    return dict(mpjpe=mpjpe(pred, gt3d, v), p_mpjpe=p_mpjpe(pred, gt3d, v))
