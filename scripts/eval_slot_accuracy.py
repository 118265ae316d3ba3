#!/usr/bin/env python
"""Held-out accuracy for every non-topdown registry slot, in one table.

VERDICT r3 (missing #5): 11 slots carried training-loss-only evidence. This
script measures each of them on held-out fixtures through their production
loaders and prints ONE markdown table (append to ACCURACY.md):

- **lifters** (GastNet / VideoPose3D / PoseAug / RIE / PoseFormer):
  MPJPE / P-MPJPE on held-out synthetic 3D gait — the committed protocol
  already used for GastNet/VideoPose3D (scripts/eval_accuracy.eval_lifter).
- **bridging** absolute-3D head: held-out 2D px error (coco_25 subset) AND
  absolute-depth error (mm) — the reference table's whole value is a strong
  absolute-3D model (reference wrappers/bridging.py:105-141).
- **mesh slots** (all 8 SMPLMethodLookup rows): root-relative 3D joint MPJPE
  (mm) + projected-2D error on held-out renders of the production body
  (same sampler family as train.MeshTrainer, fresh seeds).
- **action**: top-1 accuracy on held-out cadence-class windows.
- **reid**: same-identity vs different-identity margin satisfaction.

Topdown-family heads are covered by scripts/eval_slot_heads.py; detector +
flagship PCK by scripts/eval_accuracy.py. Reference contract being mirrored:
every wrapper's accuracy IS its checkpoint (e.g. reference
wrappers/hand_estimation.py:10-77).

    PPT_WEIGHTS_DIR=weights python scripts/eval_slot_accuracy.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def eval_lifters(names, n_seqs=8, frames=128, seed=200):
    """MPJPE / P-MPJPE rows via the committed protocol."""
    from eval_accuracy import eval_lifter

    from posepipeline_tpu.models.lifting import LiftingModel

    rows = []
    for name in names:
        lm = LiftingModel(name)
        flag = "" if lm.weights_loaded else " (RANDOM INIT)"
        err, perr = eval_lifter(lm, n_seqs=n_seqs, frames=frames, seed=seed)
        rows.append((f"lifter {name}{flag}",
                     f"MPJPE {err:.1f} mm / P-MPJPE {perr:.1f} mm"))
        print(rows[-1])
    return rows


def eval_bridging(n_batches=8, batch=16, seed=4100):
    """Held-out 2D + absolute-depth error of the MeTRAbs-style head."""
    import jax
    import jax.numpy as jnp

    from posepipeline_tpu import synthjax
    from posepipeline_tpu.models.bridging import get_bridging_model
    from posepipeline_tpu.ops.warp import normalize_imagenet
    from posepipeline_tpu.utils.bridging_superset import PER_SKELETON_INDICES

    model = get_bridging_model()
    cfg = model.cfg
    th, tw = cfg.input_hw
    sup = np.asarray(PER_SKELETON_INDICES["coco_25"])
    # the 17 coco joints inside coco_25 that have direct GT (trainer mask)
    from posepipeline_tpu.train import _B25_SRC, _B25_MASK

    fwd = jax.jit(lambda p, x: model.net.apply(p, x))
    px_err, z_err, z_triv_err, n = 0.0, 0.0, 0.0, 0
    for i in range(n_batches):
        k = jax.random.PRNGKey(seed + i)
        kc, kz = jax.random.split(k)
        crops, kp17 = synthjax.topdown_batch(kc, batch, cfg.input_hw)
        ext = np.maximum(np.asarray(kp17[..., 1].max(-1) - kp17[..., 1].min(-1)), 8.0)
        z_geo = 2500.0 * (0.55 * th) / ext
        jitter = 1.0 + 0.1 * np.asarray(jax.random.normal(kz, (batch,)))
        z_true = np.clip(z_geo * jitter, 1200.0, 8000.0)
        uv, z = fwd(model.params, normalize_imagenet(crops))
        uv = np.asarray(uv)[:, sup][:, _B25_MASK > 0]          # (B, 17ish, 2)
        z = np.asarray(z)[:, sup].mean(axis=1)                  # (B,)
        kp_t = np.asarray(kp17)[:, np.asarray(_B25_SRC)][:, _B25_MASK > 0]
        pred_px = uv * np.array([tw, th], np.float32)
        px_err += float(np.linalg.norm(pred_px - kp_t, axis=-1).sum())
        z_err += float(np.abs(z - z_true).sum())
        # trivial depth predictor (VERDICT r4 task 4): scale-from-height —
        # the geometric distance implied by the person's pixel extent with
        # the nominal body height. The learned head must beat this or its
        # absolute-3D value is zero (reference wrappers/bridging.py:105-141
        # exists precisely for absolute depth).
        z_triv_err += float(np.abs(z_geo - z_true).sum())
        n += batch
    flag = "" if getattr(model, "weights_loaded", False) else " (RANDOM INIT)"
    row = (f"bridging absolute-3D{flag}",
           f"2D {px_err / (n * (_B25_MASK > 0).sum()):.1f} px (crop) / "
           f"abs depth {z_err / n:.0f} mm "
           f"(trivial scale-from-height {z_triv_err / n:.0f} mm)")
    print(row)
    return [row]


def _mesh_eval_batch(body, crop_hw, key, batch):
    """Held-out render batch: (crops_norm, gt_joints3d, gt_cam) — the
    MeshTrainer sampler geometry (train.py fit_device), fresh keys."""
    import jax
    import jax.numpy as jnp

    from posepipeline_tpu import synthjax
    from posepipeline_tpu.models.smpl_body import rodrigues
    from posepipeline_tpu.ops.mesh_raster import rasterize_mesh
    from posepipeline_tpu.ops.warp import normalize_imagenet

    th, tw = crop_hw
    J = body.num_joints
    faces = jnp.asarray(body.p.faces)

    def sample(k):
        kp, kb, kc, kcol = jax.random.split(k, 4)
        aa = 0.25 * jax.random.normal(kp, (J, 3))
        aa = aa.at[0].multiply(0.3)
        betas = 0.5 * jax.random.normal(kb, (10,))
        s = jax.random.uniform(kc, (), minval=0.7, maxval=1.0)
        t = jax.random.uniform(jax.random.fold_in(kc, 1), (2,),
                               minval=-0.1, maxval=0.1)
        R = rodrigues(aa)
        verts, joints = body._forward(betas[None], R[None], jnp.zeros((1, 3)))
        verts, joints = verts[0] - joints[0, :1], joints[0] - joints[0, :1]
        xy = s * verts[:, :2] + t
        px = (xy[:, 0] + 1.0) * 0.5 * tw
        py = (1.0 - xy[:, 1]) * 0.5 * th
        mask, shade = rasterize_mesh(jnp.stack([px, py], -1), -verts[:, 2],
                                     faces, out_hw=(th, tw))
        color = synthjax._sample_color(kcol)
        img = 16.0 + mask[..., None] * ((0.35 + 0.65 * shade[..., None])
                                        * color - 16.0)
        return img, joints, jnp.concatenate([s[None], t])

    imgs, gts, cams = jax.vmap(sample)(jax.random.split(key, batch))
    return normalize_imagenet(imgs), np.asarray(gts), np.asarray(cams)


def _mesh_eval_seq_batch(body, crop_hw, key, T):
    """Held-out motion track: T frames of one subject (endpoint-interpolated
    pose, fixed betas, drifting cam) with a random occluder per frame — the
    train.MeshTrainer sample_seq geometry, fresh keys. The protocol where
    temporal context carries signal (VERDICT r4 task 10)."""
    import jax
    import jax.numpy as jnp

    from posepipeline_tpu import synthjax
    from posepipeline_tpu.models.smpl_body import rodrigues
    from posepipeline_tpu.ops.mesh_raster import rasterize_mesh
    from posepipeline_tpu.ops.warp import normalize_imagenet

    th, tw = crop_hw
    J = body.num_joints
    faces = jnp.asarray(body.p.faces)
    kp0, kp1, kb, kc, kcol, kaug, kocc = jax.random.split(key, 7)
    aa0 = 0.25 * jax.random.normal(kp0, (J, 3))
    aa1 = 0.25 * jax.random.normal(kp1, (J, 3))
    aa0 = aa0.at[0].multiply(0.3)
    aa1 = aa1.at[0].multiply(0.3)
    betas = 0.5 * jax.random.normal(kb, (10,))
    s0 = jax.random.uniform(kc, (), minval=0.7, maxval=1.0)
    t0 = jax.random.uniform(jax.random.fold_in(kc, 1), (2,),
                            minval=-0.1, maxval=0.1)
    dt = jax.random.uniform(jax.random.fold_in(kc, 2), (2,),
                            minval=-0.05, maxval=0.05)

    def frame(i, a):
        aa = (1 - a) * aa0 + a * aa1
        R = rodrigues(aa)
        verts, joints = body._forward(betas[None], R[None], jnp.zeros((1, 3)))
        verts, joints = verts[0] - joints[0, :1], joints[0] - joints[0, :1]
        cam = jnp.concatenate([s0[None], t0 + a * dt])
        xy = cam[0] * verts[:, :2] + cam[1:]
        px = (xy[:, 0] + 1.0) * 0.5 * tw
        py = (1.0 - xy[:, 1]) * 0.5 * th
        mask, shade = rasterize_mesh(jnp.stack([px, py], -1), -verts[:, 2],
                                     faces, out_hw=(th, tw))
        color = synthjax._sample_color(jax.random.fold_in(kcol, 0))
        img = 16.0 + mask[..., None] * ((0.35 + 0.65 * shade[..., None])
                                        * color - 16.0)
        ko = jax.random.fold_in(kocc, i)
        ko1, ko2 = jax.random.split(ko)
        oy = jax.random.uniform(ko1, (2,)) * jnp.asarray([th, tw])
        osz = jax.random.uniform(ko2, (2,), minval=0.15, maxval=0.4) \
            * jnp.asarray([th, tw])
        yy = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1)
        inside = ((yy >= oy[0]) & (yy <= oy[0] + osz[0])
                  & (xx >= oy[1]) & (xx <= oy[1] + osz[1]))
        img = jnp.where(inside[..., None], 90.0, img)
        return img, joints

    imgs, gts = jax.vmap(frame)(jnp.arange(T), jnp.linspace(0.0, 1.0, T))
    from posepipeline_tpu.ops.warp import normalize_imagenet
    return normalize_imagenet(imgs), np.asarray(gts)


def eval_mesh_tracks(names=("VIBE", "MEVA", "ProHMR"), n_tracks=4, T=16,
                     seed=9700):
    """Occluded-track MPJPE for the temporal slots (and one single-frame
    slot for contrast): per-frame occluders make single-frame readout
    ambiguous, so temporal encoders should separate from the static
    regressors here — by design, not by seed."""
    import jax

    from posepipeline_tpu.models.meshregressor import MeshRecoveryModel

    rows = []
    for name in names:
        model = MeshRecoveryModel(name)
        body = model.body
        nb = min(body.num_joints, 24)
        mpjpe_sum, n = 0.0, 0
        for i in range(n_tracks):
            key = jax.random.PRNGKey(seed + i)
            crops, gt_j = _mesh_eval_seq_batch(body, model.crop_hw, key, T)
            pred = np.asarray(model(crops)["joints3d"])[:, :nb]
            gt = gt_j[:, :nb]
            pred = pred - pred[:, :1]
            gt = gt - gt[:, :1]
            mpjpe_sum += float(np.linalg.norm(pred - gt, axis=-1).sum()) * 1000
            n += T * nb
        flag = "" if model.weights_loaded else " (RANDOM INIT)"
        rows.append((f"mesh {name} occluded-track{flag}",
                     f"MPJPE {mpjpe_sum / n:.1f} mm"))
        print(rows[-1])
    return rows


def eval_mesh_trivial(n_batches=4, batch=8, seed=9300):
    """Trivial-predictor baseline for the mesh slots (VERDICT r4 task 4):
    a constant rest-pose prediction (identity rotations, zero betas — the
    exact mean of the training pose distribution, which is zero-mean in
    axis-angle). Every learned mesh row must beat this number to show it
    recovered any 3D pose at all; the reference's mesh wrappers exist to
    produce usable pose (reference wrappers/vibe.py:11-74)."""
    import jax
    import jax.numpy as jnp

    from posepipeline_tpu.models.smpl_body import BodyModel

    body = BodyModel()
    J = body.num_joints
    nb = min(J, 24)
    eye = jnp.tile(jnp.eye(3), (1, J, 1, 1))
    rest = np.asarray(body._forward(jnp.zeros((1, body.p.n_betas
                                               if hasattr(body.p, "n_betas")
                                               else 10)),
                                    eye, jnp.zeros((1, 3)))[1])
    rest = rest - rest[:, :1]
    mpjpe_sum, n = 0.0, 0
    for i in range(n_batches):
        key = jax.random.PRNGKey(seed + i)
        _, gt_j, _ = _mesh_eval_batch(body, (224, 224), key, batch)
        gt = gt_j[:, :nb] - gt_j[:, :1]
        mpjpe_sum += float(np.linalg.norm(rest[:, :nb] - gt,
                                          axis=-1).sum()) * 1000
        n += batch * nb
    row = ("mesh TRIVIAL (constant rest pose)",
           f"MPJPE {mpjpe_sum / n:.1f} mm")
    print(row)
    return [row]


def eval_mesh_slots(names=None, n_batches=4, batch=8, seed=9300):
    import jax

    from posepipeline_tpu.models.meshregressor import (MESH_METHOD_CONFIGS,
                                                       MeshRecoveryModel)

    rows = []
    for name in names or MESH_METHOD_CONFIGS:
        model = MeshRecoveryModel(name)
        body = model.body
        nb = min(body.num_joints, 24)          # compare the shared body tree
        mpjpe_sum, px_sum, n = 0.0, 0.0, 0
        for i in range(n_batches):
            key = jax.random.PRNGKey(seed + i)
            crops, gt_j, gt_cam = _mesh_eval_batch(
                body, model.crop_hw, key, batch)
            out = model(crops)
            pred = np.asarray(out["joints3d"])[:, :nb]
            gt = gt_j[:, :nb]
            pred = pred - pred[:, :1]
            gt = gt - gt[:, :1]
            mpjpe_sum += float(np.linalg.norm(pred - gt, axis=-1).sum()) * 1000
            # projected 2D error in crop px
            th, tw = model.crop_hw
            p2 = np.asarray(out["joints2d"])[:, :nb]
            g2 = gt_cam[:, :1, None] * gt[..., :2] + gt_cam[:, None, 1:]
            px_sum += float(np.linalg.norm((p2 - g2) * [tw / 2, th / 2],
                                           axis=-1).sum())
            n += batch * nb
        flag = "" if model.weights_loaded else " (RANDOM INIT)"
        rows.append((f"mesh {name}{flag}",
                     f"MPJPE {mpjpe_sum / n:.1f} mm / pj2d {px_sum / n:.1f} px"))
        print(rows[-1])
    return rows


def eval_romp(n_batches=4, batch=8, seed=9900, score_thresh=0.3,
              match_radius=0.2):
    """Single-shot CenterHMR/ROMP slot: people-recall + matched MPJPE on
    held-out two-person rendered scenes (train.romp_scene_sampler with
    fresh seeds). A GT person counts as found when a predicted peak with
    score > ``score_thresh`` lands within ``match_radius`` (normalized
    coords) of its projected pelvis; MPJPE is over found people only."""
    import jax

    from posepipeline_tpu.models.romp import ROMPModel
    from posepipeline_tpu.models.smpl_body import rotation_6d_to_matrix
    from posepipeline_tpu.ops.warp import normalize_imagenet
    from posepipeline_tpu.train import romp_scene_sampler

    model = ROMPModel()
    body = model.body
    J = body.num_joints
    sample_scene = jax.jit(jax.vmap(romp_scene_sampler(model)))
    found, total, mpjpe_sum, nj = 0, 0, 0.0, 0
    for i in range(n_batches):
        key = jax.random.PRNGKey(seed + i)
        imgs, _c, _cells, targets, cams = sample_scene(
            jax.random.split(key, batch))
        out = model(normalize_imagenet(imgs))
        scores = np.asarray(out["scores"])             # (B, K)
        pred_t = np.asarray(out["cams"])[..., 1:3]     # predicted centers
        pred_j = np.asarray(out["joints3d"])           # (B, K, J, 3)
        targets, cams = np.asarray(targets), np.asarray(cams)
        npose = model.cfg.num_joints * 6
        for b in range(batch):
            for p in range(2):
                total += 1
                d = np.linalg.norm(pred_t[b] - cams[b, p, 1:3], axis=-1)
                d[scores[b] < score_thresh] = np.inf
                k = int(np.argmin(d))
                if d[k] > match_radius:
                    continue
                found += 1
                pose6d = targets[b, p, :npose].reshape(
                    model.cfg.num_joints, 6)
                R = rotation_6d_to_matrix(pose6d[None])
                betas = targets[b, p, npose:npose + model.cfg.n_betas]
                gt_j = np.asarray(body._forward(
                    betas[None], R, np.zeros((1, 3), np.float32))[1])[0]
                gt_j = gt_j - gt_j[:1]
                mpjpe_sum += float(np.linalg.norm(
                    pred_j[b, k] - gt_j, axis=-1).sum()) * 1000
                nj += J
    flag = "" if model.weights_loaded else " (RANDOM INIT)"
    row = (f"mesh CenterHMR (single-shot){flag}",
           f"recall {found / max(total, 1):.3f} / matched MPJPE "
           f"{mpjpe_sum / max(nj, 1):.1f} mm")
    print(row)
    return [row]


def eval_action(n_batches=16, batch=8, seed=5200, num_classes=3):
    """Both SkeletonActionMethodLookup rows: the (2+1)D default and the
    checkpoint-parity SlowOnly serving backbone (models/posec3d.py,
    reference wrappers/mmaction.py:9-86)."""
    import jax

    from posepipeline_tpu.models.action import ActionConfig, ActionModel
    from posepipeline_tpu.train import synthetic_action_windows

    rows = []
    for label, am in (
            ("action PoseC3D", ActionModel()),
            ("action PoseC3D_SlowOnly",
             ActionModel(ActionConfig(name="PoseC3D_SlowOnly",
                                      backbone="slowonly")))):
        fwd = jax.jit(lambda p, v, net=am.net: net.apply(p, v))
        rng = np.random.default_rng(seed)
        correct, n = 0, 0
        for _ in range(n_batches):
            vols, labels = synthetic_action_windows(
                batch, am.cfg.window, am.cfg.heatmap_hw, am.cfg.num_joints,
                rng, num_classes)
            logits = np.asarray(fwd(am.params, vols))
            correct += int((logits.argmax(-1) == labels).sum())
            n += batch
        flag = "" if getattr(am, "weights_loaded", False) else " (RANDOM INIT)"
        rows.append((f"{label}{flag}",
                     f"top-1 {correct / n:.3f} ({num_classes} cadence classes)"))
        print(rows[-1])
    return rows


def eval_bottomup_slots(n_batches=6, batch=4, seed=300):
    """PCK for both bottom-up serving backbones through the production
    loader: the TPU-first AE net (MMPose row) and the checkpoint-parity
    HigherHRNet (MMPose_HigherHRNet row; reference wrappers/mmpose.py:84-121).
    Protocol = eval_accuracy.eval_bottomup_ae (2-person held-out frames,
    proximity-matched)."""
    from eval_accuracy import eval_bottomup_ae

    from posepipeline_tpu.models.bottomup_ae import get_bottomup_model

    rows = []
    for name in ("AEBottomUp", "HigherHRNet"):
        model = get_bottomup_model(name)
        flag = "" if getattr(model, "weights_loaded", False) \
            else " (RANDOM INIT)"
        pck = eval_bottomup_ae(model, n_batches=n_batches, batch=batch,
                               seed=seed)
        rows.append((f"bottomup {name}{flag}", f"PCK@0.2 {pck:.3f}"))
        print(rows[-1])
    return rows


def eval_reid(n_batches=16, ids=8, seed=6300):
    """Identity separation: fraction of (anchor, positive, negative) triples
    satisfying the margin — the encoder's tracking value."""
    import jax

    from posepipeline_tpu import synthjax
    from posepipeline_tpu.models.detector import ReIDModel

    reid = ReIDModel()
    fwd = jax.jit(lambda p, x: reid.net.apply(p, x))
    ch, cw = reid.crop_hw
    views = 2
    ok, n = 0, 0
    for i in range(n_batches):
        key = jax.random.PRNGKey(seed + i)
        # same fixture family as train.ReIDTrainer: one appearance per
        # identity, rendered under `views` photometric augmentations
        id_keys = jax.random.split(jax.random.fold_in(key, 0), ids)
        view_keys = jax.random.split(jax.random.fold_in(key, 1), ids * views)

        def render(id_key, view_key):
            img, _ = synthjax.sample_topdown_crop(
                jax.random.fold_in(id_key, 7), (ch, cw), box_jitter=0.0)
            return synthjax.photometric(view_key, img)

        crops = jax.vmap(render)(np.repeat(np.asarray(id_keys), views, axis=0),
                                 view_keys)
        labels = np.repeat(np.arange(ids), views)
        emb = np.asarray(fwd(reid.params, crops))
        d = np.linalg.norm(emb[:, None] - emb[None], axis=-1)
        for a in range(len(labels)):
            pos = (labels == labels[a]) & (np.arange(len(labels)) != a)
            neg = labels != labels[a]
            if pos.any() and neg.any():
                ok += int(d[a][pos].min() < d[a][neg].min())
                n += 1
    flag = "" if getattr(reid, "weights_loaded", False) else " (RANDOM INIT)"
    row = (f"reid AppearanceEncoder{flag}",
           f"nearest-neighbor identity accuracy {ok / max(n, 1):.3f}")
    print(row)
    return [row]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated groups: lifters,bridging,mesh,"
                         "romp,action,bottomup,reid")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    os.environ.setdefault(
        "PPT_WEIGHTS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "weights"))

    from posepipeline_tpu.models.init_util import enable_compilation_cache

    enable_compilation_cache()

    groups = [g.strip() for g in args.only.split(",") if g.strip()] or \
        ["lifters", "bridging", "mesh", "romp", "action", "bottomup", "reid"]
    unknown = set(groups) - {"lifters", "bridging", "mesh", "romp", "action",
                             "bottomup", "reid"}
    if unknown:
        ap.error(f"unknown group(s) {sorted(unknown)}")
    q = args.quick
    rows = []
    t0 = time.time()
    if "lifters" in groups:
        rows += eval_lifters(("GastNet", "VideoPose3D", "PoseAug", "RIE",
                              "PoseFormer"),
                             n_seqs=2 if q else 8, frames=64 if q else 128)
    if "bridging" in groups:
        rows += eval_bridging(n_batches=2 if q else 8)
    if "mesh" in groups:
        rows += eval_mesh_trivial(n_batches=1 if q else 4, batch=4 if q else 8)
        rows += eval_mesh_slots(n_batches=1 if q else 4,
                                batch=4 if q else 8)
        rows += eval_mesh_tracks(n_tracks=1 if q else 4)
    if "romp" in groups:
        rows += eval_romp(n_batches=1 if q else 4, batch=4 if q else 8)
    if "action" in groups:
        rows += eval_action(n_batches=4 if q else 16)
    if "bottomup" in groups:
        rows += eval_bottomup_slots(n_batches=2 if q else 6)
    if "reid" in groups:
        rows += eval_reid(n_batches=4 if q else 16)

    print(f"\n({time.time() - t0:.0f}s)\n")
    print("| slot | held-out accuracy |")
    print("|---|---|")
    for name, val in rows:
        print(f"| {name} | {val} |")


if __name__ == "__main__":
    main()
