#!/usr/bin/env python
"""Human3.6M protocol driver (reference scripts/process_h36m.py:1-16).

Imports H36M ground truth (CDF keypoints + camera calibration when available,
or pre-extracted .npz), ingests the videos, runs the top-down + lifting
pipelines, and reports PCK / MPJPE / P-MPJPE against GT — the committed
evaluation the reference left to ad-hoc notebooks.

Usage:
    python scripts/process_h36m.py --data-dir /path/to/h36m \
        --top-down MMPose --lifter VideoPose3D --tracker MMTrack_bytetrack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def import_raw_dataset(data_dir: str):
    """Import the RAW H3.6M layout (Subject/Videos/*.mp4 + Poses_D* CDFs —
    the same directory walk as the reference, demo/h36_dj.py:118-213) using
    the official hardcoded camera calibration (demo/h36m_cameras.py).

    CDF parsing is first-party (demo/cdf_reader.py — no spacepy/cdflib
    needed); 2D GT is taken from the official per-camera CDFs and 3D world
    GT converted per camera."""
    from datetime import datetime

    from posepipeline_tpu.demo.h36m import (H36MActivity, H36MActivityView,
                                            H36MSubject, world_to_camera)
    from posepipeline_tpu.demo.h36m_cameras import (H36M_CAMERA_NAMES,
                                                    get_camera, poses32_to_17,
                                                    read_cdf_pose,
                                                    scan_raw_layout)
    from posepipeline_tpu.pipeline import Video

    entries = []
    for rec in scan_raw_layout(data_dir):
        subject = rec["subject"]
        activity = f"{rec['activity']}_{rec['trial']}"
        camera_id = H36M_CAMERA_NAMES.index(rec["camera"]) + 1
        H36MSubject.insert1({"subject": subject}, skip_duplicates=True)
        kp3d_world = poses32_to_17(read_cdf_pose(rec["cdf_3d"])) / 1000.0
        kp2d = poses32_to_17(read_cdf_pose(rec["cdf_2d"]))
        cam = get_camera(subject, rec["camera"])
        # camera-frame GT in meters (calibration is in millimeters)
        kp3d_cam = world_to_camera(kp3d_world * 1000.0, cam) / 1000.0
        filename = os.path.basename(rec["video"])
        H36MActivity.insert1({"subject": subject, "activity": activity,
                              "keypoints3d_world": kp3d_world},
                             skip_duplicates=True)
        Video.insert1(dict(video_project="h36m", filename=filename,
                           video=rec["video"], start_time=datetime(2026, 1, 1)),
                      skip_duplicates=True)
        H36MActivityView.insert1(
            {"subject": subject, "activity": activity, "camera_id": camera_id,
             "video_project": "h36m", "filename": filename,
             "keypoints2d": kp2d, "keypoints3d": kp3d_cam, "camera": cam},
            skip_duplicates=True)
        entries.append({"video_project": "h36m", "filename": filename,
                        "subject": subject, "activity": activity,
                        "camera_id": camera_id})
    return entries


def import_ground_truth(data_dir: str):
    """Load GT (subject, activity, camera) triples from pre-extracted npz files.

    Expected layout: ``{data_dir}/{subject}/{activity}.{camera_id}.npz`` with
    arrays ``keypoints2d (T, 17, 2)``, ``keypoints3d (T, 17, 3)``, optional
    camera dict entries, and ``video`` (path to the mp4). For the raw
    dataset layout (Videos/ + Poses_D* CDFs) see ``import_raw_dataset``;
    the driver auto-detects which layout ``--data-dir`` holds.
    """
    from posepipeline_tpu.demo.h36m import H36MActivity, H36MActivityView, H36MSubject
    from posepipeline_tpu.pipeline import Video
    from datetime import datetime

    entries = []
    for subject in sorted(os.listdir(data_dir)):
        subj_dir = os.path.join(data_dir, subject)
        if not os.path.isdir(subj_dir):
            continue
        H36MSubject.insert1({"subject": subject}, skip_duplicates=True)
        for fn in sorted(os.listdir(subj_dir)):
            if not fn.endswith(".npz"):
                continue
            activity, camera_id = fn[:-4].rsplit(".", 1)
            data = np.load(os.path.join(subj_dir, fn), allow_pickle=True)
            video_path = str(data["video"])
            filename = os.path.basename(video_path)
            H36MActivity.insert1(
                {"subject": subject, "activity": activity,
                 "keypoints3d_world": data.get("keypoints3d_world", data["keypoints3d"])},
                skip_duplicates=True)
            Video.insert1(dict(video_project="h36m", filename=filename,
                               video=video_path, start_time=datetime(2026, 1, 1)),
                          skip_duplicates=True)
            H36MActivityView.insert1(
                {"subject": subject, "activity": activity, "camera_id": int(camera_id),
                 "video_project": "h36m", "filename": filename,
                 "keypoints2d": data["keypoints2d"], "keypoints3d": data["keypoints3d"],
                 "camera": dict(data["camera"].item()) if "camera" in data else None},
                skip_duplicates=True)
            entries.append({"video_project": "h36m", "filename": filename,
                            "subject": subject, "activity": activity,
                            "camera_id": int(camera_id)})
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--tracker", default="MMTrack_bytetrack")
    ap.add_argument("--top-down", default="MMPose")
    ap.add_argument("--lifter", default="VideoPose3D")
    args = ap.parse_args()

    from posepipeline_tpu.api import lifting_pipeline
    from posepipeline_tpu.demo.h36m import H36MActivityView, mpjpe, p_mpjpe, pck_bbox_normalized
    from posepipeline_tpu.pipeline import LiftingPerson, PersonBbox, TopDownPerson

    # auto-detect layout: raw dataset dirs contain Subject/Videos
    raw = any(os.path.isdir(os.path.join(args.data_dir, d, "Videos"))
              for d in os.listdir(args.data_dir)
              if os.path.isdir(os.path.join(args.data_dir, d)))
    entries = (import_raw_dataset if raw else import_ground_truth)(args.data_dir)
    print(f"imported {len(entries)} H36M views "
          f"({'raw CDF' if raw else 'pre-extracted npz'} layout)")

    results = []
    for e in entries:
        key = {"video_project": e["video_project"], "filename": e["filename"]}
        ok = lifting_pipeline(dict(key), tracking_method_name=args.tracker,
                              top_down_method_name=args.top_down,
                              lifting_method_name=args.lifter)
        if not ok:
            print(f"skipped (annotation pending or invalid): {key}")
            continue
        gt = (H36MActivityView & e).fetch1()
        pred2d = np.asarray((TopDownPerson & key).fetch1("keypoints"))
        pred3d = np.asarray((LiftingPerson & key).fetch1("keypoints_3d"))
        bbox = np.nan_to_num(np.asarray((PersonBbox & key).fetch1("bbox")))
        T = min(len(pred2d), len(gt["keypoints2d"]))
        res = dict(
            key=e,
            pck05=pck_bbox_normalized(pred2d[:T], gt["keypoints2d"][:T], bbox[:T]),
            mpjpe=mpjpe(pred3d[:T], gt["keypoints3d"][:T]),
            p_mpjpe=p_mpjpe(pred3d[:T], gt["keypoints3d"][:T]),
        )
        results.append(res)
        print(f"{e['subject']}/{e['activity']}.{e['camera_id']}: "
              f"PCK@0.05={res['pck05']:.3f} MPJPE={res['mpjpe']*1000:.1f}mm "
              f"P-MPJPE={res['p_mpjpe']*1000:.1f}mm")

    if results:
        print(f"\nMEAN: PCK@0.05={np.mean([r['pck05'] for r in results]):.3f} "
              f"MPJPE={np.mean([r['mpjpe'] for r in results])*1000:.1f}mm "
              f"P-MPJPE={np.mean([r['p_mpjpe'] for r in results])*1000:.1f}mm")


if __name__ == "__main__":
    main()
