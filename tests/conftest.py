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

# Persistent CPU-target compile cache: compiles dominate suite wall-time on
# small hosts (1-core CI box: ~10 min cold, most of it XLA). The cache lives
# in the gitignored .test_artifacts dir — same machine, same target, so none
# of the cross-machine AOT mismatch issues a committed cache would have.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                               ".test_artifacts", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest

# Bind the pipeline schema to a per-session scratch dir at conftest import —
# BEFORE pytest collects test modules. Any collection-time import of
# posepipeline_tpu.pipeline then declares against this path instead of
# leaking a default-path database into the repo cwd (stale rows from leaked
# databases caused order-dependent e2e failures).
import shutil as _shutil
import tempfile as _tempfile

_ARTIFACTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".test_artifacts")
os.makedirs(_ARTIFACTS, exist_ok=True)
_SESSION_DIR = _tempfile.mkdtemp(dir=_ARTIFACTS)

from posepipeline_tpu.core.config import config as _cfg

_cfg["database.path"] = os.path.join(_SESSION_DIR, "pipeline.db")
_cfg["stores"] = {"localattach": {"protocol": "file",
                                  "location": os.path.join(_SESSION_DIR, "store")}}
# scale the 580-joint bridging net and the 21-joint hand net down for CPU
# test runs (the tier-3 model-param registry; production keeps the defaults)
_cfg.setdefault("custom", {})["bridging"] = {
    "dim": 64, "depth": 2, "num_heads": 2, "num_aug": 4, "input_hw": (64, 48)}
_cfg["custom"]["hand_model"] = {
    "dim": 64, "depth": 2, "num_heads": 2,
    "input_hw": (64, 64), "heatmap_hw": (16, 16)}
_cfg["custom"]["face_model"] = {
    "dim": 64, "depth": 2, "num_heads": 2,
    "input_hw": (64, 64), "heatmap_hw": (16, 16)}
_cfg["custom"]["bottomup_model"] = {"widths": (8, 16, 32, 64)}
# tiny HRNet for the MMPose_HRNetW48 populate-path test (full W48 fwd on a
# 1-core CPU box costs minutes; the dispatch path is identical)
_cfg["custom"]["hrnet_model"] = {"width": 8, "stage_modules": (1, 2, 2)}
# 512-vertex toy body for CPU mesh tests (production defaults to the
# 6890-vertex full-layout generated body; test_smpl_fitting has a dedicated
# full-layout test)
_cfg["custom"]["body_model"] = {"variant": "toy"}
# tiny single-shot CenterHMR/ROMP net for CPU populate-path tests
_cfg["custom"]["romp_model"] = {"widths": (8, 16, 32, 64), "head_dim": 16,
                                "max_people": 4, "input_hw": (128, 128)}
# cache the fallback-trained motion prior across suite runs (saves ~20 s of
# in-process CVAE training per run); only files that exist are ever loaded
os.environ.setdefault("PPT_WEIGHTS_DIR",
                      os.path.join(_ARTIFACTS, "weights_cache"))


def pytest_sessionfinish(session, exitstatus):
    _shutil.rmtree(_SESSION_DIR, ignore_errors=True)


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
def pipeline_env():
    """Session-scoped pipeline schema (config bound at conftest import)."""
    import posepipeline_tpu.pipeline as pipeline

    return pipeline
