"""The pose pipeline schema: every stage is a table, dependencies are foreign
keys, computation is ``populate()`` (reference pose_pipeline/pipeline.py).

Import order matters: tables declare against the shared schema in dependency
order (mirroring the reference's single-module declaration order).
"""

from .video import Video, VideoInfo, insert_local_video
from .gt import GroundTruthKeypoints, insert_synthetic_clip
from .bottomup import (
    BlurredVideo,
    BottomUpBridging,
    BottomUpBridgingVideo,
    BottomUpBridgingVideoLookup,
    BottomUpMethod,
    BottomUpMethodLookup,
    BottomUpPeople,
    BottomUpVideo,
    OpenPose,
    OpenPoseVideo,
)
from .tracking import (
    BestDetectedFrames,
    DetectedFrames,
    PersonBbox,
    PersonBboxValid,
    TrackingBbox,
    TrackingBboxMethod,
    TrackingBboxMethodLookup,
    TrackingBboxVideo,
)
from .person2d import (
    BottomUpBridgingPerson,
    BottomUpPerson,
    OpenPosePerson,
    OpenPosePersonVideo,
    TopDownMethod,
    TopDownMethodLookup,
    TopDownPerson,
    TopDownPersonVideo,
)
from .pose3d import (
    LiftingMethod,
    LiftingMethodLookup,
    LiftingPerson,
    LiftingPersonVideo,
)
from .action import (SkeletonAction, SkeletonActionMethodLookup,
                     SkeletonActionVideo)
from .smpl import (
    CenterHMR,
    CenterHMRPerson,
    CenterHMRPersonVideo,
    HumorPerson,
    HumorPersonVideo,
    SMPLMethod,
    SMPLMethodLookup,
    SMPLPerson,
    SMPLPersonVideo,
)
from .hands import (
    HandBbox,
    HandBboxMethod,
    HandBboxMethodLookup,
    HandPoseEstimation,
    HandPoseEstimationMethod,
    HandPoseEstimationMethodLookup,
)
from ._schema import schema

__all__ = [
    "BestDetectedFrames", "BlurredVideo", "BottomUpBridging",
    "BottomUpBridgingPerson", "BottomUpBridgingVideo", "BottomUpBridgingVideoLookup",
    "BottomUpMethod", "BottomUpMethodLookup", "BottomUpPeople", "BottomUpPerson",
    "BottomUpVideo", "CenterHMR", "CenterHMRPerson", "CenterHMRPersonVideo",
    "DetectedFrames", "GroundTruthKeypoints", "HandBbox", "HandBboxMethod",
    "HandBboxMethodLookup", "HandPoseEstimation", "HandPoseEstimationMethod",
    "HandPoseEstimationMethodLookup", "HumorPerson", "HumorPersonVideo",
    "LiftingMethod", "LiftingMethodLookup", "LiftingPerson", "LiftingPersonVideo",
    "OpenPose", "OpenPosePerson", "OpenPosePersonVideo", "OpenPoseVideo",
    "PersonBbox", "PersonBboxValid", "SMPLMethod", "SMPLMethodLookup",
    "SMPLPerson", "SMPLPersonVideo", "SkeletonAction",
    "SkeletonActionMethodLookup", "SkeletonActionVideo",
    "TopDownMethod", "TopDownMethodLookup", "TopDownPerson", "TopDownPersonVideo",
    "TrackingBbox", "TrackingBboxMethod", "TrackingBboxMethodLookup",
    "TrackingBboxVideo", "Video", "VideoInfo",
    "insert_local_video", "insert_synthetic_clip", "schema",
]
