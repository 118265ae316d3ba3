#!/usr/bin/env python
"""End-to-end benchmark: decode → detect → 2D → 3D frames/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the north-star target from BASELINE.json — >10× realtime on 1080p
clinical video per TPU v5e chip = 300 frames/sec (30 fps video). The reference
itself publishes no numbers (BASELINE.md); its design is per-frame batch-1 GPU
inference.

The measured path is the full streaming pipeline: host decode threads →
fused detect+crop+2D XLA program per batch → temporal 3D lift per video.
"""

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _phase(msg: str) -> None:
    """Progress marker on stderr so a hung run is diagnosable (the TPU
    tunnel has been observed to wedge backend init indefinitely; without
    markers that looks identical to a slow compile)."""
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def _watchdog(seconds: float, what: str):
    """Daemon timer that reports (but does not kill) a stuck phase."""
    import threading

    t = threading.Timer(seconds, lambda: _phase(
        f"WARNING: still in '{what}' after {seconds:.0f}s — if threads named "
        "axon-remote-loo/tokio-rt-worker are idle-polling, the TPU tunnel "
        "is down (see PERF.md)"))
    t.daemon = True
    t.start()
    return t


def main():
    _phase("start: importing jax / initializing backend")
    wd = _watchdog(180, "jax backend init")
    import jax

    jax.devices()
    wd.cancel()
    _phase(f"backend up: {jax.devices()}")

    # serve the shipped trained weights (registry auto-load) so the benched
    # pipeline produces meaningful keypoints, not random-init output
    os.environ.setdefault(
        "PPT_WEIGHTS_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights"))

    from posepipeline_tpu.models.init_util import enable_compilation_cache
    from posepipeline_tpu.hostmem import prefault_arena

    enable_compilation_cache()
    _phase("prefaulting host arena (wall-clock bounded)")
    prefault_arena(2 << 30)  # pay first-touch faults before the timed region
    _phase("arena ready; building fixtures")

    from posepipeline_tpu.models.lifting import LiftingModel
    from posepipeline_tpu.native import media
    from posepipeline_tpu.testing import synthetic_video

    # multi-video 1080p clinical-style workload (≥3 videos × ≥300 frames so
    # decode/compute overlap is actually exercised across video boundaries).
    # Rendering 1080p fixture clips costs minutes of single-core cv2 work, so
    # they are cached under /tmp keyed by the fixture-generator source hash —
    # the timed region is unaffected (decode reads the same bytes either way).
    height, width = 1080, 1920
    num_frames = int(os.environ.get("BENCH_FRAMES", "320"))
    num_videos = int(os.environ.get("BENCH_VIDEOS", "3"))
    import hashlib

    import posepipeline_tpu.testing as _testing
    with open(_testing.__file__, "rb") as f:
        gen_hash = hashlib.sha256(f.read()).hexdigest()[:12]
    cache_dir = os.path.join("/tmp", f"ppt_bench_clips_{gen_hash}")
    os.makedirs(cache_dir, exist_ok=True)
    paths = []
    for i in range(num_videos):
        p = os.path.join(cache_dir,
                         f"clip_{width}x{height}_{num_frames}_{i}.mp4")
        if not os.path.exists(p):
            synthetic_video(num_frames=num_frames, width=width, height=height,
                            num_people=1, seed=i, path=p)
        paths.append(p)
    lifter = LiftingModel("GastNet")

    decode_sol = None
    if media.available() and not os.environ.get("BENCH_CV2_PATH"):
        from posepipeline_tpu.runtime.stream import (I420PoseEstimator,
                                                     NativeStreamingRunner)

        chunk = int(os.environ.get("BENCH_CHUNK", "32"))
        det_interval = int(os.environ.get("BENCH_DET_INTERVAL", "4"))
        buffers = int(os.environ.get("BENCH_BUFFERS", "6"))
        fast_decode = os.environ.get("BENCH_FAST_DECODE", "0") == "1"
        est = I420PoseEstimator(input_hw=(height, width),
                                det_interval=det_interval)
        runner = NativeStreamingRunner(estimator=est, lifter=lifter,
                                       chunk_frames=chunk, num_buffers=buffers,
                                       fast_decode=fast_decode)
        # warmup: compile the detect/pose programs at bench shapes + decode
        # one video once (first decode of a freshly-encoded file pays cold
        # file-cache costs; clinical videos are not freshly encoded)
        _phase("warmup: compiling programs + first decode")
        wd = _watchdog(420, "warmup compile")
        warm = NativeStreamingRunner(estimator=est, lifter=lifter,
                                     chunk_frames=chunk, num_buffers=buffers)
        warm.run([paths[0]], lift=True)
        wd.cancel()
        for p in paths[1:]:
            r = media.NativeVideoReader(p)
            b = np.zeros((chunk, height * 3 // 2, width), np.uint8)
            while r.read_batch(b):
                pass
            r.close()
        # host decode speed-of-light: on a 1-core host the e2e number is
        # bounded above by pure libavcodec decode throughput, which varies
        # >2x across bench hosts (PERF.md "host page-fault degradation").
        # Reporting it makes a low capture self-diagnosing: e2e/decode
        # ratio is the pipeline's doing, the absolute decode fps is the
        # host's.
        # same decode configuration as the timed pipeline, so the bound is
        # a true upper bound for this run (ADVICE r3)
        r = media.NativeVideoReader(paths[0], fast_decode=fast_decode)
        n_dec, t0 = 0, time.perf_counter()
        while True:
            refs = r.read_refs(chunk)
            if refs.n == 0:
                break
            n_dec += refs.n
            refs.release()
        r.close()
        decode_sol = n_dec / (time.perf_counter() - t0)
        _phase(f"host decode speed-of-light: {decode_sol:.1f} fps 1080p "
               f"(1-core e2e upper bound)")
    else:
        from posepipeline_tpu.runtime.stream import (
            BandwidthOptimizedPoseEstimator, StreamingRunner)

        batch = int(os.environ.get("BENCH_BATCH", "32"))
        est = BandwidthOptimizedPoseEstimator(input_hw=(height, width))
        runner = StreamingRunner(estimator=est, lifter=lifter, batch_size=batch)
        warm = np.zeros((batch, height, width, 3), np.uint8)
        est.submit(warm)
        est.flush()
        kp_w = np.zeros((num_frames, 17, 3), np.float32)
        lifter(kp_w, width, height)
        from posepipeline_tpu.media.video import frame_batches
        for p in paths:
            for _ in frame_batches(p, batch):
                pass

    # drop warmup-compile-inflated stage stats so the verbose report reflects
    # the timed region only
    from posepipeline_tpu.runtime import metrics
    metrics.report(reset=True)

    # median-of-N headline: host decode scheduling on shared machines is
    # noisy; the median is robust to one bad repeat in either direction
    # while best/min are carried as extra keys (VERDICT r4 weak #1).
    # BENCH_PROFILE=<dir>: wrap the LAST repeat in a jax profiler trace
    # (XProf/perfetto) for device-level op inspection.
    profile_dir = os.environ.get("BENCH_PROFILE")
    n_reps = int(os.environ.get("BENCH_REPEATS", "4"))
    fps_list = []
    for rep in range(n_reps):
        _phase(f"timed repeat {rep}")
        ctx = (metrics.trace(profile_dir)
               if profile_dir and rep == n_reps - 1
               else contextlib.nullcontext())
        with ctx:
            t0 = time.perf_counter()
            results = runner.run(paths, lift=True)
            elapsed = time.perf_counter() - t0
        frames = sum(len(r["keypoints2d"]) for r in results)
        _phase(f"repeat {rep}: {frames / elapsed:.1f} fps")
        fps_list.append(round(frames / elapsed, 2))
    fps = float(np.median(fps_list))
    if profile_dir:
        _phase(f"profiler trace written under {profile_dir}")
    baseline = 300.0  # 10x realtime @ 30fps, BASELINE.json north star
    if os.environ.get("BENCH_VERBOSE"):
        from posepipeline_tpu.runtime import metrics
        print(metrics.format_report(), file=sys.stderr)
    # extra keys beyond the driver contract: per-repeat spread + this host's
    # pure-decode upper bound, so the captured number carries its own host
    # context (bench-host decode throughput varies >2x — see PERF.md
    # "host page-fault degradation")
    entry = {
        "metric": "e2e_decode_detect_2d_3d_fps_1080p",
        "value": round(fps, 2),  # median repeat (VERDICT r4 weak #1)
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 4),
        "repeats": fps_list,
        "best": max(fps_list),
        "min": min(fps_list),
    }
    if decode_sol is not None:
        entry["host_decode_sol_fps"] = round(decode_sol, 1)
    print(json.dumps(entry))

    # clinic-scale mode (BASELINE.json configs[4]: many concurrent 1080p
    # streams): BENCH_SCALE=N streams N clips back-to-back through the same
    # runner and reports aggregate fps + prefetch-queue occupancy. The result
    # also lands in SCALE.json so the driver's one-line contract holds.
    n_scale = int(os.environ.get("BENCH_SCALE", "0"))
    if n_scale and hasattr(runner, "last_queue_stats"):
        from posepipeline_tpu.runtime.stream import NativeStreamingRunner

        # the clinic schedule: K streams interleaved through the same
        # compiled programs, so end-of-video lift/fetch work hides behind
        # other streams' decode (runtime/stream.py interleave mode).
        # Default 8: measured 297 fps @ 4 vs 333 fps @ 8 on the 100-stream
        # run — deeper interleave hides more per-video tail work (lift
        # dispatch, final fetch, reader open) behind other streams' decode.
        interleave = int(os.environ.get("BENCH_INTERLEAVE", "8"))
        scale_runner = NativeStreamingRunner(
            estimator=est, lifter=lifter, chunk_frames=chunk,
            num_buffers=buffers, fast_decode=fast_decode,
            mode="interleave", streams_in_flight=interleave)
        scale_paths = (paths * ((n_scale + len(paths) - 1) // len(paths)))[:n_scale]
        _phase(f"clinic scale: {n_scale} streams, interleave {interleave}")
        t0 = time.perf_counter()
        results = scale_runner.run(scale_paths, lift=True)
        elapsed = time.perf_counter() - t0
        frames = sum(len(r["keypoints2d"]) for r in results)
        _phase(f"clinic scale: {frames / elapsed:.1f} fps aggregate")
        entry = {
            "metric": "clinic_scale_aggregate_fps_1080p",
            "value": round(frames / elapsed, 2),
            "unit": f"frames/sec aggregate ({n_scale} streams)",
            "vs_baseline": round(frames / elapsed / baseline, 4),
            "streams": n_scale,
            "frames": frames,
            "interleave": interleave,
            "queue": scale_runner.last_queue_stats,
        }
        print(json.dumps(entry), file=sys.stderr)
        with open("SCALE.json", "w") as f:
            json.dump(entry, f, indent=2)

    # cached fixture clips stay for the next run (keyed by generator hash)


if __name__ == "__main__":
    main()
