"""Mesh/sharding tests on the virtual 8-device CPU mesh.

Validates that temporal context parallelism (halo exchange over the mesh) is
bit-exact against the unsharded model, and that data-parallel batch sharding
produces identical results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posepipeline_tpu.models.lifting import LifterConfig, TemporalLifter
from posepipeline_tpu.parallel.mesh import make_mesh, pad_to_multiple, shard_batch
from posepipeline_tpu.parallel.temporal import halo_exchange, temporal_sharded_apply


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh from conftest"
    return make_mesh({"time": 8})


def test_make_mesh_shapes():
    m = make_mesh({"data": 2, "model": -1})
    assert m.shape["data"] == 2 and m.shape["model"] == 4


def test_pad_to_multiple():
    x = np.ones((10, 3))
    padded, n = pad_to_multiple(x, 8, axis=0)
    assert padded.shape == (16, 3) and n == 10
    np.testing.assert_array_equal(padded[10:], 0)


def test_halo_exchange_matches_manual(mesh8):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    T, H = 32, 2
    x = jnp.arange(T, dtype=jnp.float32).reshape(1, T, 1)

    fn = shard_map(lambda xl: halo_exchange(xl, H, "time"), mesh=mesh8,
                   in_specs=P(None, "time", None),
                   out_specs=P(None, "time", None), check_vma=False)
    out = np.asarray(fn(x))  # (1, 8 * (4 + 2H), 1)
    chunks = out.reshape(8, 4 + 2 * H)
    # device 0: left halo zeros, core 0..3, right halo 4..5
    np.testing.assert_array_equal(chunks[0], [0, 0, 0, 1, 2, 3, 4, 5])
    # device 3: left halo 10..11, core 12..15, right halo 16..17
    np.testing.assert_array_equal(chunks[3], [10, 11, 12, 13, 14, 15, 16, 17])
    # device 7: right halo zeros
    np.testing.assert_array_equal(chunks[7], [26, 27, 28, 29, 30, 31, 0, 0])


def test_temporal_sharding_bit_exact(mesh8):
    """Sharded lifter output must equal the single-device output exactly.

    Canonical single-device semantics = pad the input by rf//2 zeros and crop
    (the ChunkedGenerator convention the LiftingModel wrapper uses).
    """
    cfg = LifterConfig("t", (3, 3), 64)  # rf 9 → halo 4
    halo = cfg.receptive_field // 2
    net = TemporalLifter(cfg)
    T = 64  # divisible by 8
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, 34))
    params = net.init(jax.random.PRNGKey(0), x)

    x_pad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    want = np.asarray(net.apply(params, x_pad))[:, halo:-halo]
    got = np.asarray(temporal_sharded_apply(net, mesh8, params, x, halo=halo))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # agreement must hold at shard boundaries specifically
    np.testing.assert_allclose(got[0, 7:9], want[0, 7:9], atol=1e-5)


def test_sharded_lifter_wrapper_matches_unsharded(mesh8):
    """End-to-end: ShardedLifter == LiftingModel on the same params."""
    from posepipeline_tpu.models.lifting import LiftingModel
    from posepipeline_tpu.parallel.temporal import ShardedLifter

    model = LiftingModel("GastNet")
    sharded = ShardedLifter(model, mesh8)
    kp2d = np.random.default_rng(0).uniform(0, 600, (40, 17, 3)).astype(np.float32)
    kp2d[..., 2] = 0.9
    want, _ = model(kp2d, 640, 480)
    got, _ = sharded(kp2d, 640, 480)
    # bf16 activations: sharded evaluation changes reduction rounding order;
    # agreement is to bf16 precision, not bit-exact
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3, rtol=5e-3)


def test_data_parallel_sharding_matches_single_device():
    mesh = make_mesh({"data": 8})
    cfg = LifterConfig("t", (3,), 32)
    net = TemporalLifter(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 34))
    params = net.init(jax.random.PRNGKey(0), x)
    want = np.asarray(net.apply(params, x))

    xs = shard_batch(mesh, x)
    fn = jax.jit(net.apply)
    got = np.asarray(fn(params, xs))
    # bf16 activations: partitioning changes conv reduction tiling, so
    # agreement is to bf16 precision (rel ~2^-8), not bit-exact
    np.testing.assert_allclose(got, want, atol=3e-2)
    assert np.abs(got - want).mean() < 3e-3
