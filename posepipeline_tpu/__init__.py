"""posepipeline_tpu — a TPU-native video human-pose-estimation framework.

A ground-up rebuild of the PosePipe clinical pose pipeline
(reference: peabody124/PosePipeline) for TPU: the DataJoint/MySQL stage engine
becomes a SQLite-backed key-addressed engine (core/), the zoo of wrapped CUDA
models becomes a JAX/Flax model family running as batched XLA programs
(models/, ops/), tracking association stays host-side over device-batched
detections (tracking/, native/), and long-video lifting shards the time axis
over a TPU mesh with ICI halo exchange (parallel/).

Importing this package does NOT declare the pipeline schema; import
``posepipeline_tpu.pipeline`` (after configuring ``core.config``) for the
table layer, mirroring the reference's ``import pose_pipeline``.
"""

from .version import __version__

__all__ = ["__version__"]

_PIPELINE_EXPORTS = {
    # reference pose_pipeline/__init__.py:3-16 export surface
    "Video", "VideoInfo", "TrackingBboxMethodLookup", "TrackingBboxMethod",
    "TrackingBbox", "TrackingBboxVideo", "PersonBboxValid", "PersonBbox",
    "BlurredVideo", "DetectedFrames", "BestDetectedFrames", "OpenPose",
    "OpenPosePerson", "OpenPosePersonVideo", "CenterHMR", "CenterHMRPerson",
    "CenterHMRPersonVideo", "BottomUpMethodLookup", "BottomUpMethod",
    "BottomUpPeople", "BottomUpPerson", "BottomUpVideo", "BottomUpBridging",
    "BottomUpBridgingPerson", "BottomUpBridgingVideo", "TopDownMethodLookup",
    "TopDownMethod", "TopDownPerson", "TopDownPersonVideo",
    "HandBboxMethodLookup", "HandBboxMethod", "HandBbox", "HandPoseEstimation",
    "HandPoseEstimationMethod", "HandPoseEstimationMethodLookup",
    "LiftingMethodLookup", "LiftingMethod", "LiftingPerson",
    "LiftingPersonVideo", "SMPLMethodLookup", "SMPLMethod", "SMPLPerson",
    "SMPLPersonVideo", "SkeletonAction", "SkeletonActionMethodLookup",
    "SkeletonActionVideo", "HumorPerson",
    "HumorPersonVideo", "GroundTruthKeypoints",
}


def __getattr__(name):
    """Lazy re-export of table classes (``from posepipeline_tpu import Video``)
    without forcing schema declaration at package import time."""
    if name in _PIPELINE_EXPORTS:
        from . import pipeline

        return getattr(pipeline, name)
    if name in ("add_path", "set_environmental_variables", "pytorch_memory_limit",
                "tensorflow_memory_limit"):
        from . import env

        return getattr(env, name)
    raise AttributeError(f"module 'posepipeline_tpu' has no attribute {name!r}")
