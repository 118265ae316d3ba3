#!/usr/bin/env python
"""Batch-process a directory of clinical videos through the pipeline.

The production entry point: ingest every video in a directory, run tracking →
(annotation gate) → 2D → 3D, optionally render overlays, and print per-stage
throughput. Multi-worker safe: run the same command on many machines sharing
the database/store (``--reserve-jobs``).

    python scripts/run_pipeline.py --videos /data/clinic --project clinic \
        --tracker MMTrack_bytetrack --top-down MMPose --lifter VideoPose3D
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", required=True, help="directory of input videos")
    ap.add_argument("--project", default="clinic")
    ap.add_argument("--tracker", default="MMTrack_bytetrack")
    ap.add_argument("--top-down", default="MMPose")
    ap.add_argument("--lifter", default="VideoPose3D")
    ap.add_argument("--db", default=None, help="database path")
    ap.add_argument("--store", default=None, help="file store path")
    ap.add_argument("--overlays", action="store_true", help="render overlay videos")
    ap.add_argument("--reserve-jobs", action="store_true")
    args = ap.parse_args()

    if args.db:
        from posepipeline_tpu.core import set_database_path

        set_database_path(args.db)
    if args.store:
        from posepipeline_tpu.core import set_store_location

        set_store_location(args.store)

    from posepipeline_tpu.api import lifting_pipeline
    from posepipeline_tpu.pipeline import Video
    from posepipeline_tpu.runtime import metrics

    keys = []
    for fn in sorted(os.listdir(args.videos)):
        if not fn.lower().endswith((".mp4", ".avi", ".mov", ".mkv")):
            continue
        path = os.path.join(args.videos, fn)
        try:
            entry = Video.make_entry(path)
        except ValueError:
            entry = {"filename": fn, "video": path, "start_time": datetime.now()}
        entry["video_project"] = args.project
        Video.insert1(entry, skip_duplicates=True)
        keys.append({"video_project": args.project, "filename": entry["filename"]})

    print(f"ingested {len(keys)} videos")
    done = 0
    for key in keys:
        ok = lifting_pipeline(dict(key), tracking_method_name=args.tracker,
                              top_down_method_name=args.top_down,
                              lifting_method_name=args.lifter,
                              reserve_jobs=args.reserve_jobs)
        if ok:
            done += 1
        else:
            print(f"parked at annotation gate (or invalid): {key}")

    if args.overlays:
        from posepipeline_tpu.api import blur_videos
        from posepipeline_tpu.pipeline import TopDownPersonVideo

        for key in keys:
            blur_videos(dict(key), reserve_jobs=args.reserve_jobs)
            TopDownPersonVideo.populate(key, reserve_jobs=args.reserve_jobs)

    print(f"completed {done}/{len(keys)}")
    print(metrics.format_report())


if __name__ == "__main__":
    main()
