"""Orchestration layer: "standard pipelines" with reference-identical
signatures (reference utils/standard_pipelines.py:10-341).

Each function walks the table DAG for one or more video keys: insert the
method-selection rows, ``populate()`` the Computed stages, park at the
human-annotation gate when needed. ``reserve_jobs=True`` makes every stage
claim keys atomically so many workers can share the database.
"""

from __future__ import annotations

from typing import Dict, List, Union

from ..pipeline import (
    BestDetectedFrames,
    BlurredVideo,
    BottomUpMethod,
    BottomUpMethodLookup,
    BottomUpPeople,
    BottomUpPerson,
    BottomUpVideo,
    DetectedFrames,
    LiftingMethod,
    LiftingMethodLookup,
    LiftingPerson,
    OpenPose,
    OpenPosePerson,
    PersonBbox,
    PersonBboxValid,
    TopDownMethod,
    TopDownMethodLookup,
    TopDownPerson,
    TrackingBbox,
    TrackingBboxMethod,
    TrackingBboxMethodLookup,
    Video,
    VideoInfo,
)
from ..utils.tracking import annotate_single_person


def find_lifting_keys(filt=None):
    return ((Video - LiftingPerson) & filt).fetch("KEY")


def tracking_pipeline(
    keys: Union[Dict, List[Dict]],
    tracking_method_name: str = "DeepSortYOLOv4",
    reserve_jobs: bool = False,
):
    """Run a video through the tracking layer (reference
    standard_pipelines.py:10-53). Returns PersonBbox keys ready for 2D."""
    if isinstance(keys, dict):
        keys = [keys]

    tracking_keys = []
    for key in keys:
        VideoInfo.populate(key, reserve_jobs=reserve_jobs)

        tracking_key = dict(key)
        tracking_key["tracking_method"] = (
            TrackingBboxMethodLookup & f'tracking_method_name="{tracking_method_name}"'
        ).fetch1("tracking_method")
        TrackingBboxMethod.insert1(
            {k: tracking_key[k] for k in ("video_project", "filename", "tracking_method")},
            skip_duplicates=True)
        TrackingBbox.populate(tracking_key, reserve_jobs=reserve_jobs)

        annotate_single_person(key)

        PersonBbox.populate(tracking_key, reserve_jobs=True)
        DetectedFrames.populate(tracking_key, reserve_jobs=reserve_jobs)

        if len(PersonBbox & tracking_key) == 1:
            tracking_keys.append((PersonBbox & tracking_key).fetch1("KEY"))
    return tracking_keys


def top_down_pipeline(
    key: Union[Dict, List[Dict]],
    tracking_method_name: str = "DeepSortYOLOv4",
    top_down_method_name: str = "MMPose",
    reserve_jobs: bool = False,
):
    """Video → TopDownPerson (reference standard_pipelines.py:56-108)."""
    tracking_keys = tracking_pipeline(key, tracking_method_name, reserve_jobs=reserve_jobs)
    top_down_person_keys = []

    for tracking_key in tracking_keys:
        PersonBbox.populate(tracking_key, reserve_jobs=True)
        if len(PersonBbox & tracking_key) == 0:
            if (len(PersonBboxValid & tracking_key) == 1
                    and (PersonBboxValid & tracking_key).fetch1("video_subject_id") < 0):
                print(f"Video {key} marked as invalid.")
                return False
            print(f"Waiting for annotation of subject of interest. {tracking_key}")
            return False

        top_down_key = (PersonBbox & tracking_key).fetch1("KEY")
        top_down_key["top_down_method"] = (
            TopDownMethodLookup & f'top_down_method_name="{top_down_method_name}"'
        ).fetch1("top_down_method")
        TopDownMethod.insert1(top_down_key, skip_duplicates=True)
        if top_down_method_name.startswith("OpenPose"):
            OpenPose.populate(key, reserve_jobs=reserve_jobs)
            OpenPosePerson.populate(tracking_key, reserve_jobs=reserve_jobs)
        if top_down_method_name.startswith("Bridging_"):
            from ..pipeline import BottomUpBridging, BottomUpBridgingPerson

            BottomUpBridging.populate(key, reserve_jobs=reserve_jobs)
            BottomUpBridgingPerson.populate(tracking_key, reserve_jobs=reserve_jobs)

        TopDownPerson.populate(top_down_key, reserve_jobs=reserve_jobs)
        BestDetectedFrames.populate(key, reserve_jobs=reserve_jobs)
        top_down_person_keys.append(top_down_key)

    return top_down_person_keys


def lifting_pipeline(
    key,
    tracking_method_name: str = "DeepSortYOLOv4",
    top_down_method_name: str = "MMPose",
    lifting_method_name: str = "GastNet",
    reserve_jobs: bool = False,
):
    """Video → LiftingPerson (reference standard_pipelines.py:110-164)."""
    res = top_down_pipeline(key, tracking_method_name, top_down_method_name,
                            reserve_jobs=reserve_jobs)
    if not res:
        return res

    tracking_key = dict(key)
    tracking_key["tracking_method"] = (
        TrackingBboxMethodLookup & f'tracking_method_name="{tracking_method_name}"'
    ).fetch1("tracking_method")

    top_down_key = (PersonBbox & tracking_key).fetch1("KEY")
    top_down_key["top_down_method"] = (
        TopDownMethodLookup & f'top_down_method_name="{top_down_method_name}"'
    ).fetch1("top_down_method")

    if len(TopDownPerson & top_down_key) == 0:
        print(f"Top down job must be reserved and not completed. {top_down_key}")
        return False

    lifting_key = dict(top_down_key)
    lifting_key["lifting_method"] = (
        LiftingMethodLookup & f'lifting_method_name="{lifting_method_name}"'
    ).fetch1("lifting_method")
    LiftingMethod.insert1(lifting_key, skip_duplicates=True)
    LiftingPerson.populate(lifting_key, reserve_jobs=reserve_jobs)

    if len(LiftingPerson & lifting_key) == 0:
        print(f"Lifting job must be reserved and not completed. {lifting_key}")
        return False

    VideoInfo.populate(key, reserve_jobs=reserve_jobs)
    DetectedFrames.populate(key, reserve_jobs=reserve_jobs)
    BestDetectedFrames.populate(key, reserve_jobs=reserve_jobs)
    return len(LiftingPerson & key) > 0


def smpl_pipeline(
    key: Union[Dict, List[Dict]],
    tracking_method_name: str = "DeepSortYOLOv4",
    smpl_method_name: str = "PIXIE",
    reserve_jobs: bool = False,
):
    """Video → SMPLPerson (reference standard_pipelines.py:167-206)."""
    from ..pipeline.smpl import SMPLMethod, SMPLMethodLookup, SMPLPerson

    tracking_keys = tracking_pipeline(key, tracking_method_name, reserve_jobs=reserve_jobs)
    smpl_keys = []
    for tracking_key in tracking_keys:
        smpl_key = (PersonBbox & tracking_key).fetch1("KEY")
        smpl_key["smpl_method"] = (
            SMPLMethodLookup & f'smpl_method_name="{smpl_method_name}"'
        ).fetch1("smpl_method")
        SMPLMethod.insert1(smpl_key, skip_duplicates=True)
        SMPLPerson.populate(smpl_key, reserve_jobs=reserve_jobs)
        smpl_keys.append(smpl_key)
    return smpl_keys


def bottomup_to_topdown(key, tracking_method_name: str = "DeepSortYOLOv4",
                        bottom_up_method_name: str = "Bridging_OpenPose",
                        reserve_jobs: bool = False):
    """Route bottom-up results into the top-down table path
    (reference standard_pipelines.py:209-271)."""
    method_map = {"Bridging_OpenPose": "Bridging_COCO_25"}
    td_name = method_map.get(bottom_up_method_name, bottom_up_method_name)
    return top_down_pipeline(key, tracking_method_name=tracking_method_name,
                             top_down_method_name=td_name, reserve_jobs=reserve_jobs)


def bottom_up_pipeline(
    keys: Union[Dict, List[Dict]],
    bottom_up_method_name: str = "OpenPose",
    reserve_jobs: bool = False,
):
    """Video → BottomUpPeople (+person matching when annotated)
    (reference standard_pipelines.py:274-314)."""
    if isinstance(keys, dict):
        keys = [keys]
    out = []
    for key in keys:
        VideoInfo.populate(key, reserve_jobs=reserve_jobs)
        bu_key = dict(key, bottom_up_method_name=bottom_up_method_name)
        BottomUpMethod.insert1(
            {k: bu_key[k] for k in ("video_project", "filename", "bottom_up_method_name")},
            skip_duplicates=True)
        if bottom_up_method_name == "Bridging_OpenPose":
            from ..pipeline import BottomUpBridging

            BottomUpBridging.populate(key, reserve_jobs=reserve_jobs)
        BottomUpPeople.populate(bu_key, reserve_jobs=reserve_jobs)
        BottomUpPerson.populate(bu_key, reserve_jobs=reserve_jobs)
        out.append(bu_key)
    return out


def blur_videos(keys: Union[Dict, List[Dict]], reserve_jobs: bool = False):
    """Compute privacy-blurred videos (reference standard_pipelines.py:317-341)."""
    if isinstance(keys, dict):
        keys = [keys]
    for key in keys:
        bu_key = dict(key, bottom_up_method_name="Bridging_OpenPose")
        if not (BottomUpPeople & bu_key):
            from ..pipeline import BottomUpBridging

            BottomUpMethod.insert1(
                {k: bu_key[k] for k in ("video_project", "filename", "bottom_up_method_name")},
                skip_duplicates=True)
            BottomUpBridging.populate(key, reserve_jobs=reserve_jobs)
            BottomUpPeople.populate(bu_key, reserve_jobs=reserve_jobs)
        BlurredVideo.populate(key, reserve_jobs=reserve_jobs)
