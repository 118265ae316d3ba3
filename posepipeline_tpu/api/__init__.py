"""Public orchestration API (the reference's utils/standard_pipelines.py)."""

from .standard_pipelines import (
    blur_videos,
    bottom_up_pipeline,
    bottomup_to_topdown,
    find_lifting_keys,
    lifting_pipeline,
    smpl_pipeline,
    top_down_pipeline,
    tracking_pipeline,
)

__all__ = [
    "blur_videos", "bottom_up_pipeline", "bottomup_to_topdown",
    "find_lifting_keys", "lifting_pipeline", "smpl_pipeline",
    "top_down_pipeline", "tracking_pipeline",
]
