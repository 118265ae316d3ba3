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
