"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective correctness is
validated without TPU hardware (the driver separately dry-runs the multi-chip
path). These env vars must be set before jax initializes its backends.
"""

import os

# NOTE: the environment's sitecustomize presets JAX_PLATFORMS=axon (TPU
# tunnel); tests must force CPU *unconditionally*.
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture()
def schema(tmp_path):
    """A fresh throwaway schema namespace per test."""
    from posepipeline_tpu.core.config import Config
    from posepipeline_tpu.core.engine import Schema

    cfg = Config()
    cfg["database.path"] = str(tmp_path / "test.db")
    cfg["stores"] = {"localattach": {"protocol": "file", "location": str(tmp_path / "store")}}
    return Schema("test_schema", config=cfg)


@pytest.fixture(scope="session")
def pipeline_env(tmp_path_factory):
    """Session-scoped pipeline schema bound to a temp DB + store.

    Must be requested *before* importing ``posepipeline_tpu.pipeline`` anywhere,
    since table declaration binds to the active config.
    """
    root = tmp_path_factory.mktemp("pipeline_db")
    from posepipeline_tpu.core.config import config as cfg

    cfg["database.path"] = str(root / "pipeline.db")
    cfg["stores"] = {"localattach": {"protocol": "file", "location": str(root / "store")}}
    import posepipeline_tpu.pipeline as pipeline

    return pipeline
