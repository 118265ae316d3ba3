"""Single-shot CenterHMR/ROMP slot: net, decode, trainer, populate path.

Reference counterpart: the wrapped ROMP repo behind the CenterHMR tables
(reference pipeline.py:1709-1745) — one fully-convolutional forward emits a
body-center heatmap + dense SMPL parameter maps; people are read out at
heatmap peaks (no detector, no crops).
"""

import numpy as np
import pytest

from posepipeline_tpu.testing import synthetic_video


def test_romp_net_shapes_and_decode():
    import jax
    import jax.numpy as jnp

    from posepipeline_tpu.models.romp import (ROMPConfig, ROMPNet,
                                              decode_romp)

    cfg = ROMPConfig(widths=(8, 16, 32, 64), head_dim=16, max_people=4,
                     input_hw=(128, 128))
    net = ROMPNet(cfg)
    x = jnp.zeros((2, 128, 128, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    center, pmap = net.apply(params, x)
    gh, gw = 128 // cfg.stride, 128 // cfg.stride
    assert center.shape == (2, gh, gw)
    assert pmap.shape == (2, gh, gw, cfg.param_dim)

    # plant two peaks; decode must return them as the top-2, with the
    # parameter vectors gathered from the matching cells
    c = jnp.full((1, gh, gw), -8.0)
    c = c.at[0, 2, 3].set(4.0).at[0, 5, 6].set(3.0)
    pm = jnp.zeros((1, gh, gw, cfg.param_dim))
    pm = pm.at[0, 2, 3, 0].set(7.0).at[0, 5, 6, 0].set(9.0)
    scores, centers, params_k = decode_romp(c, pm, k=4)
    assert np.asarray(centers)[0, 0].tolist() == [3.0, 2.0]
    assert np.asarray(centers)[0, 1].tolist() == [6.0, 5.0]
    assert np.asarray(params_k)[0, 0, 0] == pytest.approx(7.0)
    assert np.asarray(params_k)[0, 1, 0] == pytest.approx(9.0)
    assert float(np.asarray(scores)[0, 0]) > float(np.asarray(scores)[0, 2])


def test_romp_model_infer_contract():
    from posepipeline_tpu.models.romp import ROMPModel
    from posepipeline_tpu.ops.warp import normalize_imagenet

    model = ROMPModel()          # conftest tier: tiny widths, 128x128, K=4
    th, tw = model.cfg.input_hw
    K = model.cfg.max_people
    x = normalize_imagenet(np.zeros((2, th, tw, 3), np.float32))
    out = model(x)
    J = model.body.num_joints
    assert np.asarray(out["scores"]).shape == (2, K)
    assert np.asarray(out["poses"]).shape == (2, K, 24, 6)
    assert np.asarray(out["betas"]).shape == (2, K, 10)
    assert np.asarray(out["cams"]).shape == (2, K, 3)
    assert np.asarray(out["joints3d"]).shape == (2, K, J, 3)
    assert np.asarray(out["joints2d"]).shape == (2, K, J, 2)
    # root-relative joints3d
    np.testing.assert_allclose(np.asarray(out["joints3d"])[:, :, 0], 0.0,
                               atol=1e-5)


def test_romp_trainer_learns():
    """A short device run must pull the composite loss down — the center
    head finds rendered bodies and the parameter map fits their SMPL
    parameters (train.ROMPTrainer renders two-person scenes)."""
    from posepipeline_tpu.models.romp import ROMPModel
    from posepipeline_tpu.train import ROMPTrainer

    model = ROMPModel(params_path="")     # random init, ignore registry
    tr = ROMPTrainer(model, learning_rate=2e-3)
    losses = tr.fit_device(steps=30, batch=2, scan_len=10)
    assert len(losses) == 30
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_centerhmr_populate_single_shot(pipeline_env):
    """CenterHMR populate runs the single-shot net end-to-end and the
    results blob keeps the reference consumer contract (pj2d in (-0.5, 0.5),
    bbox TLHW in frame px; reference pipeline.py:1748-1830)."""
    p = pipeline_env
    from posepipeline_tpu.pipeline import insert_synthetic_clip
    from posepipeline_tpu.utils.tracking import annotate_single_person

    clip = synthetic_video(num_frames=8, num_people=1, seed=77)
    key = insert_synthetic_clip(clip, filename="romp_clip.mp4")
    p.VideoInfo.populate(key)
    p.CenterHMR.populate(key)
    results = (p.CenterHMR & key).fetch1("results")
    assert len(results) == 8
    for frame in results:
        for person in frame:
            assert set(person) == {"pj2d", "cam", "poses", "betas",
                                   "j3d_smpl24", "bbox"}
            assert person["pj2d"].shape[1] == 2
            assert np.abs(person["pj2d"]).max() <= 0.75
            assert person["poses"].shape == (24, 6)

    # downstream matching path (CenterHMRPerson) over the same clip
    tkey = dict(key, tracking_method=100)
    p.TrackingBboxMethod.insert1(tkey, skip_duplicates=True)
    p.TrackingBbox.populate(tkey)
    annotate_single_person(key)
    p.PersonBbox.populate(tkey)
    p.CenterHMRPerson.populate(tkey)
    row = (p.CenterHMRPerson & tkey).fetch1()
    assert row["keypoints"].shape == (8, 24, 2)
    assert row["poses"].shape == (8, 24, 6)
    assert row["centerhmr_ids"].shape == (8,)
