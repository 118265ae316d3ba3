"""Device-resident synthetic training data: stick-figure rendering in JAX.

Why this exists: the host↔TPU link on the bench/dev machine is slow, so the
round-2 trainers — which rasterize fixtures with cv2 on the host and ship
every batch up — were capped at a few hundred steps (ACCURACY.md round 2:
PCK@0.2 0.46 from 300 steps, clearly undertrained). This module renders the
SAME stick-figure distribution as ``testing.py`` (the committed eval
fixtures) entirely on device from PRNG keys: training batches cost zero
host→device transfer, and whole optimization runs execute as one
``lax.scan`` program.

TPU notes: rasterization is a distance-field evaluation — (pixels ×
primitives) elementwise math, which XLA fuses into a handful of VPU loops;
no gather/scatter, no dynamic shapes. A 256×192 crop against the 34
stick-figure primitives is ~2 MFLOP, noise in an MXU-heavy train step.

The *eval* protocol is untouched: scripts/eval_accuracy.py still renders
held-out clips with cv2/mp4 on the host (testing.synthetic_video), so
numbers stay comparable with round 2 and the train→eval domain gap (codec
artifacts, cv2 line rasterization) is honestly crossed by the model.

Geometry is the same COCO-17 walking figure as testing.stick_figure; the
renderer approximates cv2's thickness-t LINE_8 stroke as a capsule of radius
t/2 with a half-pixel soft edge, joint discs as circles, plus the reference
head disc (3×thickness) so the face-blur path sees the same shapes.
(Reference fixture-free: the reference has no tests at all, SURVEY.md §4.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .testing import COCO_SKELETON, HAND_SKELETON, _PERSON_COLORS

_SEG_A = np.array([a for a, b in COCO_SKELETON], np.int32)
_SEG_B = np.array([b for a, b in COCO_SKELETON], np.int32)
_PALETTE = np.array(_PERSON_COLORS, np.float32)


def stick_figure_jax(cx, cy, scale, phase):
    """COCO-17 joints (..., 17, 2) — jnp twin of testing.stick_figure."""
    s = scale
    swing = 0.12 * jnp.sin(phase)
    head_y = cy - 0.38 * s
    sh_y = cy - 0.28 * s
    hip_y = cy + 0.02 * s
    xs = jnp.stack([
        cx, cx - 0.02 * s, cx + 0.02 * s, cx - 0.045 * s, cx + 0.045 * s,
        cx - 0.10 * s, cx + 0.10 * s, cx - 0.13 * s, cx + 0.13 * s,
        cx - 0.14 * s, cx + 0.14 * s, cx - 0.07 * s, cx + 0.07 * s,
        cx - 0.07 * s + swing * s, cx + 0.07 * s - swing * s,
        cx - 0.07 * s + 2 * swing * s, cx + 0.07 * s - 2 * swing * s,
    ], axis=-1)
    ys = jnp.stack([
        head_y, head_y - 0.02 * s, head_y - 0.02 * s, head_y, head_y,
        sh_y, sh_y,
        sh_y + 0.14 * s + swing * s * 0.3, sh_y + 0.14 * s - swing * s * 0.3,
        sh_y + 0.27 * s + swing * s * 0.6, sh_y + 0.27 * s - swing * s * 0.6,
        hip_y, hip_y, hip_y + 0.20 * s, hip_y + 0.20 * s,
        hip_y + 0.40 * s, hip_y + 0.40 * s,
    ], axis=-1)
    return jnp.stack([xs, ys], axis=-1)


def render_capsules(points, seg_a, seg_b, color, thickness,
                    hw: Tuple[int, int], disc_idx=None, disc_r=None,
                    joint_r=None, background: float = 16.0):
    """Rasterize a stick shape: capsule strokes between ``points[seg_a]`` and
    ``points[seg_b]``, discs at every point (radius ``joint_r``) and optional
    extra discs (``disc_idx``/``disc_r``). Distance-field coverage with a
    half-pixel soft edge stands in for cv2's polygon rasterization."""
    H, W = hw
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    p = jnp.stack([xx, yy], -1)                      # (H, W, 2)

    a = points[seg_a]                                # (S, 2)
    b = points[seg_b]
    ab = b - a                                       # (S, 2)
    denom = jnp.maximum((ab * ab).sum(-1), 1e-6)     # (S,)
    ap = p[:, :, None, :] - a[None, None]            # (H, W, S, 2)
    t = jnp.clip((ap * ab[None, None]).sum(-1) / denom, 0.0, 1.0)
    closest = a[None, None] + t[..., None] * ab[None, None]
    dseg = jnp.linalg.norm(p[:, :, None, :] - closest, axis=-1).min(-1)

    dj = jnp.linalg.norm(p[:, :, None, :] - points[None, None], axis=-1)
    dcirc = dj.min(-1)

    r = thickness * 0.5
    rj = jnp.maximum(thickness, 2.0) if joint_r is None else joint_r
    cov = jnp.maximum(jnp.clip(r - dseg + 0.5, 0.0, 1.0),
                      jnp.clip(rj - dcirc + 0.5, 0.0, 1.0))
    if disc_idx is not None:
        dd = dj[..., disc_idx]
        cov = jnp.maximum(cov, jnp.clip(disc_r - dd + 0.5, 0.0, 1.0))
    img = background + cov[..., None] * (color - background)
    return img


def render_person(joints, color, thickness, hw: Tuple[int, int],
                  background: float = 16.0):
    """Rasterize one COCO-17 stick figure ((17, 2) pixel coords, RGB color
    0..255, cv2 stroke width) with the reference head disc at the nose."""
    return render_capsules(joints, _SEG_A, _SEG_B, color, thickness, hw,
                           disc_idx=0, disc_r=thickness * 3.0,
                           background=background)


def _sample_color(key):
    """Palette color 70% of the time, random saturated color otherwise."""
    k1, k2, k3 = jax.random.split(key, 3)
    pal = jnp.asarray(_PALETTE)[jax.random.randint(k1, (), 0, len(_PALETTE))]
    rnd = jax.random.uniform(k2, (3,), minval=0.0, maxval=255.0)
    rnd = rnd * (255.0 / jnp.maximum(rnd.max(), 1e-3))  # saturate
    return jnp.where(jax.random.uniform(k3) < 0.7, pal, rnd)


def _blur3(img, kernel):
    """Separable 3-tap blur along H and W of (H, W, C)."""
    pad = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    img = kernel[0] * pad[:-2] + kernel[1] * pad[1:-1] + kernel[2] * pad[2:]
    pad = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return kernel[0] * pad[:, :-2] + kernel[1] * pad[:, 1:-1] + kernel[2] * pad[:, 2:]


def photometric(key, img, noise: float = 8.0):
    kb, kg, ko, kn = jax.random.split(key, 4)
    w = jax.random.uniform(kb, (), minval=0.0, maxval=0.45)
    img = _blur3(img, jnp.stack([w, 1.0 - 2.0 * w, w]))
    gain = jax.random.uniform(kg, (), minval=0.85, maxval=1.15)
    bias = jax.random.uniform(ko, (), minval=-10.0, maxval=10.0)
    img = img * gain + bias
    img = img + noise * jax.random.normal(kn, img.shape)
    return jnp.clip(img, 0.0, 255.0)


def hard_furniture(key, img, p: float = 0.7):
    """Occluding rectangles + a bar stripe, drawn over ``img``: the
    train-time counterpart of the hardened eval protocol's furniture
    (testing.synthetic_video(hard=True) — occluder bar, clutter). Without
    it, nets trained on clean renders collapse the moment the protocol
    gains occlusion."""
    H, W = img.shape[:2]
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    wh_scale = jnp.asarray([W, H], jnp.float32)

    def rect(k, img, active_p):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        active = (jax.random.uniform(k1) < active_p).astype(jnp.float32)
        wh = jax.random.uniform(k2, (2,), minval=0.08, maxval=0.30) * wh_scale
        c = jax.random.uniform(k3, (2,)) * wh_scale
        m = ((jnp.abs(xx - c[0]) < wh[0] / 2)
             & (jnp.abs(yy - c[1]) < wh[1] / 2)).astype(jnp.float32) * active
        return img + m[..., None] * (_sample_color(k4) - img)

    def bar(k, img, active_p):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        active = (jax.random.uniform(k1) < active_p).astype(jnp.float32)
        ang = jax.random.uniform(k2, (), minval=0.0, maxval=np.pi)
        n = jnp.stack([jnp.cos(ang), jnp.sin(ang)])
        span = jnp.abs(n[0]) * W + jnp.abs(n[1]) * H
        off = jax.random.uniform(k3, (), minval=0.2, maxval=0.8) * span
        halfw = jax.random.uniform(k4, (), minval=0.015, maxval=0.05) \
            * (H + W) / 2
        m = (jnp.abs(xx * n[0] + yy * n[1] - off) < halfw) \
            .astype(jnp.float32) * active
        return img + m[..., None] * (_sample_color(k5) - img)

    k1, k2, k3 = jax.random.split(key, 3)
    img = rect(k1, img, p * 0.6)
    img = rect(k2, img, p * 0.4)
    return bar(k3, img, p * 0.5)


def clutter_background(key, hw: Tuple[int, int], n: int = 4,
                       base: float = 16.0):
    """Background plane with ``n`` random rectangles — the hardened
    protocol's background clutter, for rendering people OVER."""
    H, W = hw
    img = jnp.full((H, W, 3), base)
    for k in jax.random.split(key, n):
        k1, k2, k3 = jax.random.split(k, 3)
        yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
        xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
        wh = jax.random.uniform(k1, (2,), minval=0.05, maxval=0.25) \
            * jnp.asarray([W, H], jnp.float32)
        c = jax.random.uniform(k2, (2,)) * jnp.asarray([W, H], jnp.float32)
        m = ((jnp.abs(xx - c[0]) < wh[0] / 2)
             & (jnp.abs(yy - c[1]) < wh[1] / 2)).astype(jnp.float32)
        # dim clutter: visible structure that never outshines the person
        img = img + m[..., None] * (0.4 * _sample_color(k3) - img) * 0.8
    return img


def _fix_aspect(box, dilate, ratio):
    """jnp twin of ops.boxes.fix_aspect_ratio for one (4,) TLHW box."""
    center = box[:2] + box[2:] / 2.0
    w, h = box[2], box[3]
    too_narrow = (w / jnp.maximum(h, 1e-9)) < ratio
    new_w = jnp.where(too_narrow, h * ratio, w)
    new_h = jnp.where(too_narrow, h, w / ratio)
    hw = jnp.stack([new_w, new_h]) * dilate
    return jnp.concatenate([center - hw / 2.0, hw])


def sample_topdown_crop(key, crop_hw: Tuple[int, int] = (256, 192),
                        box_jitter: float = 0.10):
    """One training crop rendered directly in crop space.

    Samples a walking figure, takes its GT box through the SAME aspect-fix
    (dilate 1.2) as the pipeline, jitters the box the way imperfect detector
    boxes do (scale ±box_jitter, shift ±box_jitter·size — the round-2 net
    saw only exact-GT boxes and lost PCK to detector-box mismatch at eval),
    maps joints into crop coords and rasterizes there.

    Returns (crop_rgb (H, W, 3) float 0..255, kp_crop (17, 2)).
    """
    th, tw = crop_hw
    kp_key, col_key, jit_key, aug_key, th_key = jax.random.split(key, 5)
    k1, k2, k3, k4 = jax.random.split(kp_key, 4)
    # virtual-frame person (same distribution as testing.synthetic_frames
    # at an arbitrary reference frame height of 256; scale floor matches the
    # hardened protocol's 0.22×H small-person regime)
    fh = 256.0
    scale = jax.random.uniform(k1, (), minval=0.22, maxval=0.6) * fh
    cx = jax.random.uniform(k2, (), minval=0.4, maxval=0.6) * fh
    cy = jax.random.uniform(k3, (), minval=0.45, maxval=0.6) * fh
    phase = jax.random.uniform(k4, (), minval=0.0, maxval=2 * np.pi)
    joints = stick_figure_jax(cx, cy, scale, phase)

    margin = jnp.maximum(4.0, scale / 20.0)
    mins = joints.min(0) - margin
    maxs = joints.max(0) + margin
    box = jnp.concatenate([mins, maxs - mins])
    fixed = _fix_aspect(box, 1.2, tw / th)
    # detector-box jitter
    j1, j2, j3 = jax.random.split(jit_key, 3)
    sj = jax.random.uniform(j1, (), minval=1.0 - box_jitter,
                            maxval=1.0 + box_jitter)
    shift = jax.random.uniform(j2, (2,), minval=-box_jitter,
                               maxval=box_jitter) * fixed[2:]
    center = fixed[:2] + fixed[2:] / 2.0 + shift
    size = fixed[2:] * sj
    fixed = jnp.concatenate([center - size / 2.0, size])

    # map to crop space and render there
    sx = tw / fixed[2]
    sy = th / fixed[3]
    kp_crop = (joints - fixed[:2]) * jnp.stack([sx, sy])
    thickness = jnp.maximum(2.0, scale / 60.0) * (sx + sy) * 0.5
    color = _sample_color(col_key)
    ka, kb, kc = jax.random.split(aug_key, 3)
    img = render_person(kp_crop, color, thickness, crop_hw,
                        background=clutter_background(kb, crop_hw))
    img = hard_furniture(kc, img)
    img = photometric(ka, img)
    return img, kp_crop


def sample_detector_frame(key, hw: Tuple[int, int] = (240, 320)):
    """One full detection-training frame with its GT TLHW box."""
    H, W = hw
    kp_key, col_key, aug_key = jax.random.split(key, 3)
    k1, k2, k3, k4 = jax.random.split(kp_key, 4)
    scale = jax.random.uniform(k1, (), minval=0.22, maxval=0.6) * H
    cx = jax.random.uniform(k2, (), minval=0.2, maxval=0.8) * W
    cy = jax.random.uniform(k3, (), minval=0.4, maxval=0.65) * H
    phase = jax.random.uniform(k4, (), minval=0.0, maxval=2 * np.pi)
    joints = stick_figure_jax(cx, cy, scale, phase)
    margin = jnp.maximum(4.0, scale / 20.0)
    mins = joints.min(0) - margin
    maxs = joints.max(0) + margin
    box = jnp.concatenate([mins, maxs - mins])
    thickness = jnp.maximum(2.0, scale / 60.0)
    ka, kb, kc = jax.random.split(aug_key, 3)
    img = render_person(joints, _sample_color(col_key), thickness, hw,
                        background=clutter_background(kb, hw))
    img = hard_furniture(kc, img)
    img = photometric(ka, img)
    return img, box


def sample_face_frame(key, hw: Tuple[int, int] = (240, 320)):
    """One face-detection training frame: full stick figure rendered, GT box
    = the head disc (the reference's MTCNN face-detector role,
    wrappers/facenet.py — privacy fallback training data)."""
    H, W = hw
    kp_key, col_key, aug_key = jax.random.split(key, 3)
    k1, k2, k3, k4 = jax.random.split(kp_key, 4)
    scale = jax.random.uniform(k1, (), minval=0.3, maxval=0.6) * H
    cx = jax.random.uniform(k2, (), minval=0.2, maxval=0.8) * W
    cy = jax.random.uniform(k3, (), minval=0.4, maxval=0.65) * H
    phase = jax.random.uniform(k4, (), minval=0.0, maxval=2 * np.pi)
    joints = stick_figure_jax(cx, cy, scale, phase)
    thickness = jnp.maximum(2.0, scale / 60.0)
    # head disc: center = nose joint, radius 3×thickness (testing._draw_person)
    r = thickness * 3.0 + 2.0
    box = jnp.concatenate([joints[0] - r, jnp.stack([2 * r, 2 * r])])
    img = render_person(joints, _sample_color(col_key), thickness, hw)
    img = photometric(aug_key, img)
    return img, box


def face_detector_batch(key, batch: int, hw: Tuple[int, int] = (240, 320)):
    keys = jax.random.split(key, batch)
    return jax.vmap(functools.partial(sample_face_frame, hw=hw))(keys)


# ---------------------------------------------------------------------------
# Extended-joint-set synthesis (wholebody-133 / halpe-136 heads)
# ---------------------------------------------------------------------------

def extend_joints_wholebody(joints, key):
    """COCO-17 joints (17, 2) → 133 wholebody targets: 17 body + 6 feet +
    68 face points (ellipse around the nose) + 2×21 hand points (fans from
    the wrists). Geometrically consistent with the stick figure so the
    extended heads learn real localization on the fixtures (skeleton layout:
    utils/skeletons.COCO_WHOLEBODY_133)."""
    del key  # deterministic given joints
    nose, leye, reye = joints[0], joints[1], joints[2]
    lank, rank = joints[15], joints[16]
    lwri, rwri = joints[9], joints[10]
    scale = jnp.maximum(jnp.linalg.norm(joints[5] - joints[11]), 4.0)
    down = jnp.array([0.0, 1.0])
    right = jnp.array([1.0, 0.0])
    feet = jnp.stack([
        lank + 0.10 * scale * down - 0.04 * scale * right,   # l big toe
        lank + 0.10 * scale * down + 0.02 * scale * right,   # l small toe
        lank + 0.04 * scale * down,                           # l heel
        rank + 0.10 * scale * down + 0.04 * scale * right,
        rank + 0.10 * scale * down - 0.02 * scale * right,
        rank + 0.04 * scale * down,
    ])
    ang = jnp.linspace(0.0, 2 * np.pi, 68, endpoint=False)
    face_r = jnp.maximum(jnp.linalg.norm(leye - reye), 2.0) * 2.0
    face = nose[None] + face_r * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)

    def hand(wrist, sign):
        fa = jnp.deg2rad(jnp.asarray([-50.0, -25.0, 0.0, 25.0, 50.0]))
        pts = [wrist]
        hr = 0.25 * scale
        for f in range(5):
            d = jnp.stack([sign * jnp.sin(fa[f]) * 0.6 + sign * 0.4,
                           jnp.cos(fa[f])])
            d = d / jnp.maximum(jnp.linalg.norm(d), 1e-6)
            for k in range(4):
                pts.append(wrist + d * hr * (k + 1) / 4.0)
        return jnp.stack(pts)  # 21

    lhand = hand(lwri, -1.0)
    rhand = hand(rwri, 1.0)
    return jnp.concatenate([joints, feet, face, lhand, rhand], axis=0)  # 133


def extend_joints_halpe(joints, key):
    """COCO-17 → 136 halpe targets: 17 + head/neck/hip + 6 feet + 68 face +
    42 hands (skeleton layout: utils/skeletons.HALPE_136)."""
    wb = extend_joints_wholebody(joints, key)
    head = joints[0] - jnp.array([0.0, 0.1]) * jnp.maximum(
        jnp.linalg.norm(joints[5] - joints[11]), 4.0)
    neck = (joints[5] + joints[6]) / 2.0
    hip = (joints[11] + joints[12]) / 2.0
    extra = jnp.stack([head, neck, hip])
    return jnp.concatenate([wb[:17], extra, wb[17:]], axis=0)  # 136


_EXTENDERS = {
    17: None,
    133: extend_joints_wholebody,
    136: extend_joints_halpe,
}


def sample_topdown_crop_joints(key, num_joints: int,
                               crop_hw: Tuple[int, int] = (256, 192),
                               box_jitter: float = 0.10):
    """sample_topdown_crop generalized to extended joint sets: renders the
    17-joint figure, targets include the synthesized extra joints."""
    img, kp17 = sample_topdown_crop(key, crop_hw, box_jitter)
    ext = _EXTENDERS[num_joints]
    kp = kp17 if ext is None else ext(kp17, key)
    return img, kp


def topdown_joints_batch(key, batch: int, num_joints: int,
                         crop_hw: Tuple[int, int] = (256, 192),
                         box_jitter: float = 0.10):
    keys = jax.random.split(key, batch)
    return jax.vmap(functools.partial(
        sample_topdown_crop_joints, num_joints=num_joints, crop_hw=crop_hw,
        box_jitter=box_jitter))(keys)


_HAND_SEG_A = np.array([a for a, b in HAND_SKELETON], np.int32)
_HAND_SEG_B = np.array([b for a, b in HAND_SKELETON], np.int32)


def stick_hand_jax(cx, cy, scale, curl, rot):
    """21-joint hand — jnp twin of testing.stick_hand (wrist + 5×4 chains,
    progressive flexion, whole-hand rotation)."""
    angles = jnp.deg2rad(jnp.asarray([-55.0, -25.0, 0.0, 25.0, 50.0]))
    lengths = jnp.asarray([0.5, 0.95, 1.0, 0.95, 0.8])
    wrist = jnp.asarray([0.0, 0.45]) * scale
    pts = [wrist]
    for f in range(5):
        a = angles[f]
        seg = lengths[f] * scale / 4.0
        pos = wrist
        ang = a
        for k in range(4):
            ang = ang + curl * 0.35
            pos = pos + seg * jnp.stack([jnp.sin(ang), -jnp.cos(ang)])
            pts.append(pos)
    j = jnp.stack(pts)
    c, s = jnp.cos(rot), jnp.sin(rot)
    R = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    j = j @ R.T
    return j + jnp.stack([cx, cy])


def sample_hand_crop(key, crop_hw: Tuple[int, int] = (256, 256),
                     box_jitter: float = 0.10):
    """One 21-joint hand training crop (the hand-net analogue of
    sample_topdown_crop; host twin: testing.synthetic_hand_frames)."""
    th, tw = crop_hw
    kp_key, col_key, jit_key, aug_key = jax.random.split(key, 4)
    k1, k2, k3 = jax.random.split(kp_key, 3)
    fh = 256.0
    scale = jax.random.uniform(k1, (), minval=0.4, maxval=0.7) * fh
    curl = jax.random.uniform(k2, (), minval=0.0, maxval=1.1)
    rot = jax.random.uniform(k3, (), minval=-0.8, maxval=0.8)
    joints = stick_hand_jax(fh / 2, fh / 2, scale, curl, rot)
    margin = jnp.maximum(4.0, scale / 15.0)
    mins = joints.min(0) - margin
    maxs = joints.max(0) + margin
    box = jnp.concatenate([mins, maxs - mins])
    fixed = _fix_aspect(box, 1.2, tw / th)
    j1, j2 = jax.random.split(jit_key)
    sj = jax.random.uniform(j1, (), minval=1.0 - box_jitter,
                            maxval=1.0 + box_jitter)
    shift = jax.random.uniform(j2, (2,), minval=-box_jitter,
                               maxval=box_jitter) * fixed[2:]
    center = fixed[:2] + fixed[2:] / 2.0 + shift
    size = fixed[2:] * sj
    fixed = jnp.concatenate([center - size / 2.0, size])
    sx, sy = tw / fixed[2], th / fixed[3]
    kp_crop = (joints - fixed[:2]) * jnp.stack([sx, sy])
    thickness = jnp.maximum(2.0, scale / 30.0) * (sx + sy) * 0.5
    img = render_capsules(kp_crop, _HAND_SEG_A, _HAND_SEG_B,
                          _sample_color(col_key), thickness, crop_hw,
                          joint_r=thickness)
    return photometric(aug_key, img), kp_crop


def hand_batch(key, batch: int, crop_hw: Tuple[int, int] = (256, 256)):
    keys = jax.random.split(key, batch)
    return jax.vmap(functools.partial(sample_hand_crop, crop_hw=crop_hw))(keys)


def sample_face_crop(key, crop_hw: Tuple[int, int] = (256, 256),
                     box_jitter: float = 0.10):
    """One 70-point face training crop: the stick figure's head disc with
    OpenPose-style face landmarks (68 on the disc outline + 2 pupils) —
    the synthetic supervision for the composite's face net
    (pipeline/backends._get_face_model)."""
    th, tw = crop_hw
    kp_key, col_key, jit_key, aug_key = jax.random.split(key, 4)
    k1, k2 = jax.random.split(kp_key)
    fh = 256.0
    r = jax.random.uniform(k1, (), minval=0.15, maxval=0.3) * fh
    center = jnp.stack([fh / 2, fh / 2])
    ang = jnp.linspace(0.0, 2 * np.pi, 68, endpoint=False)
    outline = center[None] + r * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)
    eye_off = jnp.stack([jnp.stack([-0.35 * r, -0.2 * r]),
                         jnp.stack([0.35 * r, -0.2 * r])])
    pupils = center[None] + eye_off
    pts = jnp.concatenate([outline, pupils])          # (70, 2)
    box = jnp.concatenate([center - r * 1.2, jnp.stack([2.4 * r, 2.4 * r])])
    j1, j2 = jax.random.split(jit_key)
    sj = jax.random.uniform(j1, (), minval=1.0 - box_jitter,
                            maxval=1.0 + box_jitter)
    shift = jax.random.uniform(j2, (2,), minval=-box_jitter,
                               maxval=box_jitter) * box[2:]
    c2 = box[:2] + box[2:] / 2.0 + shift
    size = box[2:] * sj
    fixed = jnp.concatenate([c2 - size / 2.0, size])
    sx, sy = tw / fixed[2], th / fixed[3]
    kp_crop = (pts - fixed[:2]) * jnp.stack([sx, sy])
    cc = (center - fixed[:2]) * jnp.stack([sx, sy])
    rr = r * (sx + sy) * 0.5
    # face disc + darker pupil dots
    H, W = crop_hw
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    d = jnp.sqrt((yy - cc[1]) ** 2 + (xx - cc[0]) ** 2)
    cov = jnp.clip(rr - d + 0.5, 0.0, 1.0)
    color = _sample_color(col_key)
    img = 16.0 + cov[..., None] * (color - 16.0)
    dp = jnp.linalg.norm(
        jnp.stack([xx, yy], -1)[:, :, None] - kp_crop[None, None, 68:],
        axis=-1).min(-1)
    pup = jnp.clip(rr * 0.12 - dp + 0.5, 0.0, 1.0)
    img = img * (1.0 - 0.8 * pup[..., None])
    return photometric(aug_key, img), kp_crop


def face_crop_batch(key, batch: int, crop_hw: Tuple[int, int] = (256, 256)):
    keys = jax.random.split(key, batch)
    return jax.vmap(functools.partial(sample_face_crop, crop_hw=crop_hw))(keys)


def topdown_batch(key, batch: int, crop_hw: Tuple[int, int] = (256, 192),
                  box_jitter: float = 0.10):
    """(crops float 0..255 (B, H, W, 3), kp_crop (B, 17, 2)) on device."""
    keys = jax.random.split(key, batch)
    return jax.vmap(functools.partial(sample_topdown_crop, crop_hw=crop_hw,
                                      box_jitter=box_jitter))(keys)


def detector_batch(key, batch: int, hw: Tuple[int, int] = (240, 320)):
    """(frames float 0..255 (B, H, W, 3), boxes TLHW (B, 4)) on device."""
    keys = jax.random.split(key, batch)
    return jax.vmap(functools.partial(sample_detector_frame, hw=hw))(keys)
