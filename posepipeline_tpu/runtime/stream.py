"""Streaming runtime: decode overlapping device compute, fused pose step.

The reference's throughput model is per-frame batch-1 GPU inference inside
Python loops (wrappers/mmpose.py:60-76) with whole-video RAM decode
(utils/bounding_box.py:119-148). The TPU-native runtime replaces it with:

- **FusedPoseEstimator** — detect → best-person crop → top-down heatmaps →
  DARK decode as ONE jitted XLA program per frame batch (no host round-trips
  between stages; everything fuses into a single device graph).
- **StreamingRunner** — host decode threads keep a bounded prefetch queue of
  fixed-shape frame batches per video; the device loop consumes batches as
  fast as the accelerator drains them, overlapping IO with compute. Scales to
  the 100-concurrent-video clinic workload (BASELINE.json configs[4]) by
  interleaving videos through the same compiled program.
- lifting runs per video on accumulated keypoints (one more device program,
  optionally time-sharded across a mesh via parallel/temporal.py).
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics
from ..media.video import frame_batches, video_info
from ..models.detector import PersonDetector
from ..models.lifting import LiftingModel
from ..models.topdown import TopDownModel, get_topdown_model
from ..ops.boxes import fix_aspect_ratio
from ..ops.heatmap import decode_heatmaps
from ..ops.warp import crop_resize_matmul, normalize_imagenet


class FusedPoseEstimator:
    """frames (B, H, W, 3) uint8 → (boxes (B, 4), keypoints (B, J, 3)), one XLA program."""

    def __init__(self, detector: Optional[PersonDetector] = None,
                 topdown: Optional[TopDownModel] = None,
                 input_hw=(480, 640)):
        self.detector = detector or PersonDetector(input_hw=input_hw)
        self.topdown = topdown or get_topdown_model("MMPose")

    @functools.partial(jax.jit, static_argnums=0)
    def _step(self, det_params, td_params, frames):
        x = frames.astype(jnp.float32) / 255.0
        center, size, offset = self.detector.net.apply(det_params, x)
        from ..models.detector import decode_centers

        boxes, scores = decode_centers(center, size, offset,
                                       k=self.detector.cfg.max_detections,
                                       stride=self.detector.cfg.stride)
        best = boxes[:, 0]                                       # top-scoring person
        th, tw = self.topdown.cfg.input_hw
        fixed = fix_aspect_ratio(best, dilate=1.2, ratio=tw / th)
        crops = crop_resize_matmul(frames.astype(jnp.float32), fixed, out_hw=(th, tw))
        hm = self.topdown.net.apply(td_params, normalize_imagenet(crops))
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        kp = decode_heatmaps(hm, fixed)
        return best, scores[:, 0], kp

    def __call__(self, frames):
        return self._step(self.detector.params, self.topdown.params, jnp.asarray(frames))


class BandwidthOptimizedPoseEstimator:
    """Pose pipeline tuned for host↔device bandwidth, with overlap.

    Full 1080p uint8 frames are 6.2 MB each — shipping them to the device
    makes the interconnect the wall (the reference has the same issue in
    disguise: it ships every frame to the GPU at batch 1). This estimator
    ships ~0.9 MB/frame instead:

    - detection runs on host-downscaled frames (``det_scale``, default ½ res),
    - person crops are cut at full resolution **on the host** (same affine
      semantics as ops/warp, via cv2) and only the (256×192) crops transfer,
    - device work is double-buffered: batch *i*'s detection dispatches while
      batch *i−1*'s crops run the 2D net, so transfers overlap compute.

    Outputs match FusedPoseEstimator: per-frame best-person box + keypoints.
    """

    def __init__(self, detector: Optional[PersonDetector] = None,
                 topdown: Optional[TopDownModel] = None,
                 input_hw=(1080, 1920), det_scale: float = 0.25,
                 det_interval: int = 4):
        import cv2  # host-side crops

        self.cv2 = cv2
        # integer stride-slice downsample (a memcpy, not a cv2 resize):
        # det frames are frames[:, ::s, ::s] cropped to a /32-aligned shape
        self.det_stride = max(int(round(1.0 / det_scale)), 1)
        s = self.det_stride
        # align UP so detection keeps the full field of view (see I420 path)
        self.det_hw = (max(32, -(-(input_hw[0] // s) // 32) * 32),
                       max(32, -(-(input_hw[1] // s) // 32) * 32))
        self.scale_y = float(s)
        self.scale_x = float(s)
        # detect on every det_interval-th frame; boxes propagate to neighbors
        # (clinical subjects move little between adjacent frames — the same
        # assumption behind the reference's ±2-frame bbox imputation)
        self.det_interval = max(int(det_interval), 1)
        self.detector = detector or PersonDetector(input_hw=self.det_hw)
        self.topdown = topdown or get_topdown_model("MMPose")
        self._pending = None  # (frames, future_boxes, future_scores)

    @functools.partial(jax.jit, static_argnums=0)
    def _detect(self, det_params, small_frames):
        x = small_frames.astype(jnp.float32) / 255.0
        center, size, offset = self.detector.net.apply(det_params, x)
        from ..models.detector import decode_centers

        boxes, scores = decode_centers(center, size, offset,
                                       k=self.detector.cfg.max_detections,
                                       stride=self.detector.cfg.stride)
        return boxes[:, 0], scores[:, 0]

    @functools.partial(jax.jit, static_argnums=0)
    def _pose(self, td_params, crops, fixed_boxes):
        hm = self.topdown.net.apply(td_params, normalize_imagenet(crops))
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        return decode_heatmaps(hm, fixed_boxes)

    def _host_crop(self, frames, boxes):
        """Full-res host crops: integer-box slice + resize.

        A full-frame warpAffine costs ~50 ms at 1080p; slicing the box region
        and resizing it costs <1 ms and is the same bilinear sampling. The
        box is rounded to integer pixels and that *exact* box is returned, so
        the heatmap→image decode transform stays self-consistent. Crops stay
        uint8 (device normalizes; 1 byte/px host→device traffic).
        """
        th, tw = self.topdown.cfg.input_hw
        # numpy aspect-fix: the jnp version would be a device round trip
        # inside this host loop
        fixed = np.round(_fix_aspect_np(boxes, dilate=1.2, ratio=tw / th))
        H, W = frames.shape[1:3]
        crops = np.zeros((len(frames), th, tw, 3), np.uint8)
        for i, (frame, b) in enumerate(zip(frames, fixed)):
            x0, y0, w, h = int(b[0]), int(b[1]), int(b[2]), int(b[3])
            if w <= 0 or h <= 0:
                continue
            # image intersection; out-of-image area stays zero (cv2
            # constant-border semantics). The intersection resizes straight
            # into its sub-rectangle of the (th, tw) output — no source-sized
            # canvas allocation (degenerate detector boxes can be huge).
            xi0, yi0 = max(x0, 0), max(y0, 0)
            xi1, yi1 = min(x0 + w, W), min(y0 + h, H)
            if xi1 <= xi0 or yi1 <= yi0:
                continue
            ox0 = int(round((xi0 - x0) / w * tw))
            ox1 = int(round((xi1 - x0) / w * tw))
            oy0 = int(round((yi0 - y0) / h * th))
            oy1 = int(round((yi1 - y0) / h * th))
            if ox1 <= ox0 or oy1 <= oy0:
                continue
            crops[i, oy0:oy1, ox0:ox1] = self.cv2.resize(
                frame[yi0:yi1, xi0:xi1], (ox1 - ox0, oy1 - oy0),
                interpolation=self.cv2.INTER_LINEAR)
        return crops, fixed

    def submit(self, frames: np.ndarray):
        """Dispatch detection for a batch; returns the completed previous
        batch's (boxes, scores, keypoints) or None (pipeline warm-up)."""
        s = self.det_stride
        keyframes = frames[:: self.det_interval]
        with metrics.StageTimer("submit.downsample", frames=len(keyframes)):
            small = np.ascontiguousarray(
                keyframes[:, : self.det_hw[0] * s: s, : self.det_hw[1] * s: s])
        with metrics.StageTimer("submit.detect_dispatch", frames=len(keyframes)):
            fut = self._detect(self.detector.params, jnp.asarray(small))
        prev = self._pending
        self._pending = (frames, fut)
        if prev is None:
            return None
        return self._finish(prev)

    def flush(self):
        """Drain the last in-flight batch."""
        if self._pending is None:
            return None
        prev, self._pending = self._pending, None
        return self._finish(prev)

    def process_chunk(self, frame_batches_list):
        """Process many batches with two fetch barriers total.

        Through a remote-device link every result fetch costs a fixed wait
        that monopolizes the (single) host core; per-batch fetches serialize
        the pipeline. This path dispatches detection for ALL batches, fetches
        all boxes once, dispatches ALL pose programs, fetches all keypoints
        once — amortizing the wait over the chunk.

        frame_batches_list: list of (B, H, W, 3) uint8 arrays (equal shapes).
        Returns a list of (boxes, scores, keypoints) per batch.
        """
        s = self.det_stride
        det_futs = []
        for frames in frame_batches_list:
            keyframes = frames[:: self.det_interval]
            small = np.ascontiguousarray(
                keyframes[:, : self.det_hw[0] * s: s, : self.det_hw[1] * s: s])
            det_futs.append(self._detect(self.detector.params, jnp.asarray(small)))
        scale = np.array([self.scale_x, self.scale_y, self.scale_x, self.scale_y])
        with metrics.StageTimer("chunk.fetch_boxes", frames=sum(len(f) for f in frame_batches_list)):
            det_np = [(np.asarray(b) * scale, np.asarray(sc)) for b, sc in det_futs]
        pose_futs, metas = [], []
        for frames, (kf_boxes, kf_scores) in zip(frame_batches_list, det_np):
            idx = np.minimum(np.arange(len(frames)) // self.det_interval, len(kf_boxes) - 1)
            boxes, scores = kf_boxes[idx], kf_scores[idx]
            with metrics.StageTimer("chunk.host_crop", frames=len(frames)):
                crops, fixed = self._host_crop(frames, boxes)
            pose_futs.append(self._pose(self.topdown.params, jnp.asarray(crops),
                                        jnp.asarray(fixed)))
            metas.append((boxes, scores))
        with metrics.StageTimer("chunk.fetch_kp", frames=sum(len(f) for f in frame_batches_list)):
            kps = [np.asarray(p) for p in pose_futs]
        return [(b, sc, kp) for (b, sc), kp in zip(metas, kps)]

    def _finish(self, entry):
        frames, (boxes_f, scores_f) = entry
        with metrics.StageTimer("finish.fetch_boxes", frames=len(frames)):
            kf_boxes = np.asarray(boxes_f) * np.array([self.scale_x, self.scale_y,
                                                       self.scale_x, self.scale_y])
            kf_scores = np.asarray(scores_f)
        # propagate keyframe detections to intermediate frames
        idx = np.arange(len(frames)) // self.det_interval
        idx = np.minimum(idx, len(kf_boxes) - 1)
        boxes = kf_boxes[idx]
        scores = kf_scores[idx]
        with metrics.StageTimer("finish.host_crop", frames=len(frames)):
            crops, fixed = self._host_crop(frames, boxes)
        with metrics.StageTimer("finish.pose", frames=len(frames)):
            kp = np.asarray(self._pose(self.topdown.params, jnp.asarray(crops),
                                       jnp.asarray(fixed)))
        return boxes, scores, kp


def _copy_async(fut) -> None:
    """Start streaming a device array's bytes to the host without blocking.

    jax.Array.copy_to_host_async() begins the D2H transfer immediately; the
    later np.asarray() then finds the literal already host-side and returns
    without a link round trip. Best-effort: backends without the method just
    pay the normal blocking fetch."""
    try:
        fut.copy_to_host_async()
    except AttributeError:
        pass


def _fix_aspect_np(bbox, dilate: float = 1.2, ratio: float = 1.0):
    """Host-side twin of ops.boxes.fix_aspect_ratio (same math, numpy)."""
    bbox = np.asarray(bbox, np.float64)
    center = bbox[..., :2] + bbox[..., 2:] / 2.0
    w, h = bbox[..., 2], bbox[..., 3]
    too_narrow = (w / np.maximum(h, 1e-9)) < ratio
    new_w = np.where(too_narrow, h * ratio, w)
    new_h = np.where(too_narrow, h, w / ratio)
    hw = np.stack([new_w, new_h], axis=-1) * dilate
    return np.concatenate([center - hw / 2.0, hw], axis=-1)


class I420PoseEstimator:
    """Native-decode streaming estimator: host ships compact I420 planes,
    the device does colorspace conversion + detection + 2D pose.

    Host work per frame collapses to C++ entropy decode plus two byte-shuffle
    ops (native/mediadec.cpp): a strided keyframe downsample for the detection
    branch and a bbox crop+resize for the top-down branch. Everything else —
    BT.601 YUV→RGB (ops/colorspace.py), the detector, box decode, the 2D net,
    DARK decode — is device work, and host→device traffic is ~0.1 MB/frame
    (I420 crops + quarter-res keyframes) instead of 6.2 MB of full RGB.

    Replaces the per-frame cv2 work of the reference's decode loops
    (reference wrappers/mmpose.py:60-76, utils/bounding_box.py:101-194).
    """

    def __init__(self, detector: Optional[PersonDetector] = None,
                 topdown: Optional[TopDownModel] = None,
                 input_hw=(1080, 1920), det_scale: float = 0.25,
                 det_interval: int = 4):
        H, W = input_hw
        self.input_hw = input_hw
        s = max(int(round(1.0 / det_scale)), 1)
        self.det_stride = s
        # detection dims: /32-aligned for the conv net (and even for chroma).
        # Align UP (edge rows replicate in the downsample) — flooring would
        # silently crop up to 31*s full-res pixels of field of view from
        # detection (1080p @ s=4: the bottom 56 rows)
        self.det_hw = (max(32, -(-(H // s) // 32) * 32),
                       max(32, -(-(W // s) // 32) * 32))
        self.det_interval = max(int(det_interval), 1)
        self.detector = detector or PersonDetector(input_hw=self.det_hw)
        self.topdown = topdown or get_topdown_model("MMPose")

    @functools.partial(jax.jit, static_argnums=0)
    def _detect_yuv(self, det_params, small_yuv):
        from ..models.detector import decode_centers
        from ..ops.colorspace import i420_to_rgb

        oh, ow = self.det_hw
        x = i420_to_rgb(small_yuv, oh, ow) / 255.0
        center, size, offset = self.detector.net.apply(det_params, x)
        boxes, scores = decode_centers(center, size, offset,
                                       k=self.detector.cfg.max_detections,
                                       stride=self.detector.cfg.stride)
        # one output array → one device→host fetch (every fetch is a full
        # round trip through the device link)
        return jnp.concatenate([boxes[:, 0], scores[:, 0, None]], axis=-1)

    @functools.partial(jax.jit, static_argnums=0)
    def _pose_yuv(self, td_params, crops_yuv, fixed_boxes):
        from ..ops.colorspace import i420_to_rgb

        th, tw = self.topdown.cfg.input_hw
        rgb = i420_to_rgb(crops_yuv, th, tw)
        hm = self.topdown.net.apply(td_params, normalize_imagenet(rgb))
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        return decode_heatmaps(hm, fixed_boxes)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(4,))
    def _pose_accum(self, td_params, crops_yuv, fixed_boxes, kp_buf, offset):
        """Pose step + device-resident accumulation: writes this chunk's
        keypoints into ``kp_buf`` at frame ``offset`` and returns the buffer.

        The round-2 runtime fetched keypoints per chunk — ~50 ms of link
        round trip × every chunk, plus a dedicated fetch thread whose GIL
        wakes stole time from the (single-core) decoder. Accumulating on
        device makes the steady state fetch-free: one keypoints fetch per
        *video*, not per chunk. ``kp_buf`` is donated, so the update is
        in-place device memory."""
        from ..ops.colorspace import i420_to_rgb

        th, tw = self.topdown.cfg.input_hw
        rgb = i420_to_rgb(crops_yuv, th, tw)
        hm = self.topdown.net.apply(td_params, normalize_imagenet(rgb))
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        kp = decode_heatmaps(hm, fixed_boxes)
        return jax.lax.dynamic_update_slice(kp_buf, kp, (offset, 0, 0))


class NativeStreamingRunner:
    """Stream videos through the I420-native pipeline with a two-thread
    producer/consumer schedule.

    The single-host bottleneck is one CPU core shared by decode, byte
    shuffles, and the *idle waits* on device round trips. Decode, C++ crops,
    and blocking fetches all release the GIL, so a worker thread overlaps
    them with the main decode loop:

    - **main thread**: decode chunk → C++ keyframe downsample → dispatch the
      detection program → hand the chunk to the worker.
    - **worker thread**: fetch boxes (network wait — free for the decoder),
      C++ crop pass, dispatch the pose program, fetch earlier pose results.

    Per chunk there is exactly one detect dispatch, one box fetch, one crop
    pass, and one pose dispatch; wall clock approaches
    max(decode, fetch+crop) instead of their sum.

    This is the production runtime for the clinic workload
    (BASELINE.json configs[4]): videos are processed back-to-back through the
    same compiled programs; on a multi-chip mesh, distinct hosts/workers take
    distinct videos via the job engine (core/engine.py populate reservations),
    which is the reference's own scale-out model (SURVEY.md §2.5).
    """

    def __init__(self, estimator: Optional[I420PoseEstimator] = None,
                 lifter: Optional[LiftingModel] = None,
                 chunk_frames: int = 32, max_inflight_pose: int = 4,
                 num_buffers: int = 6, fast_decode: bool = False,
                 mode: str = "auto", streams_in_flight: int = 4):
        # chunk 32 is the measured sweet spot on the 1-core + remote-link
        # bench host: per-chunk round-trip stalls shrink with chunk size
        # until fixed dispatch overhead dominates
        # (96->199, 64->215, 48->228, 32->277, 24->181 fps e2e 1080p)
        self.estimator = estimator
        self.lifter = lifter
        self.chunk_frames = int(chunk_frames)
        self.max_inflight_pose = int(max_inflight_pose)
        self.num_buffers = max(int(num_buffers), 3)
        # skip the h264 in-loop deblocking filter during decode (ffmpeg
        # -skip_loop_filter all). Off by default: it measures SLOWER on the
        # bench content (405 vs 464 fps decode-only — the filter-skip path
        # defeats some libavcodec fast paths) and perturbs pixels slightly.
        self.fast_decode = bool(fast_decode)
        # pipeline schedule: "threads" = producer/consumer pair (hides link
        # waits behind the decode thread; costs GIL churn), "single" = one
        # thread with software pipelining (chunk i's box fetch is deferred
        # until chunk i+1 has decoded, with copy_to_host_async() streaming
        # the result back in the meantime — no wait AND no GIL churn).
        # "auto" picks single on 1-2 core hosts where a second Python
        # thread costs more than it hides (measured: two-thread host-only
        # pipeline 308 fps vs 343 single on the 1-core bench host).
        if mode not in ("auto", "single", "threads", "interleave"):
            raise ValueError(
                f"mode must be auto|single|threads|interleave, got {mode!r}")
        self.mode = mode
        # interleave mode: how many videos are open/decoding at once
        self.streams_in_flight = int(streams_in_flight)

    def _resolved_mode(self) -> str:
        import os

        env = os.environ.get("PPT_STREAM_MODE")
        if env in ("single", "threads", "interleave"):
            return env
        if self.mode != "auto":
            return self.mode
        return "single" if (os.cpu_count() or 1) <= 2 else "threads"

    def run(self, video_paths: List[str], lift: bool = True) -> List[Dict]:
        from ..native import media

        if self.estimator is None:
            info = video_info(video_paths[0])
            self.estimator = I420PoseEstimator(input_hw=(info["height"], info["width"]))
        if lift and self.lifter is None:
            self.lifter = LiftingModel("GastNet")
        est = self.estimator
        H, W = est.input_hw
        th, tw = est.topdown.cfg.input_hw
        di = est.det_interval
        C = self.chunk_frames
        KF = (C + di - 1) // di
        scale = np.array([est.det_stride] * 4 + [1.0], np.float64)
        J = est.topdown.cfg.num_joints
        # bound decoded-but-not-yet-cropped chunks (each in-flight chunk
        # owns one packed ring buffer of C frames)
        inflight = threading.Semaphore(self.num_buffers)
        results = [dict(boxes=[], scores=[], frames=0) for _ in video_paths]
        # Packed decode ring: mdec_read copies each decoded frame straight
        # into a REUSED caller buffer and releases the AVFrame, so the
        # decoder's own pool stays ~3 buffers (L2-warm) and the ring pages
        # stay TLB-warm. Measured against the round-3 zero-copy ref path on
        # the 1-core bench host: decode+copy 587 fps vs 492 fps ref-decode
        # alone, and decode+copy+crop 2.18 ms/f vs 3.26 ms/f — holding
        # AVFrame refs across chunks forced the codec pool to grow cold
        # (PERF.md round 4). Buffers recycle through a free-list once the
        # consumer has cropped them.
        free_bufs: list = []

        def take_buf():
            if free_bufs:
                return free_bufs.pop()
            return np.empty((C, H * 3 // 2, W), np.uint8)
        # keypoints accumulate ON DEVICE (see _pose_accum): one buffer per
        # video, one fetch per video at drain time — the steady state does
        # zero keypoint round trips
        kp_bufs: Dict[int, object] = {}

        work_q: queue.Queue = queue.Queue()
        worker_error: list = []
        q_samples: list = []  # producer-side queue depth (pipeline occupancy)
        lift_results: Dict[int, tuple] = {}

        def process(entry):
            """Consumer step per chunk: box fetch (link wait, GIL-free),
            C++ crop, pose-program dispatch with device-side keypoint
            accumulation. One consumer thread total — on a single-core host
            extra pipeline threads only add GIL churn (measured: a separate
            dispatch thread cost ~15 fps e2e); the per-chunk budget here
            (~50 ms) stays under the decoder's (~70 ms), so the decode
            thread never waits on it."""
            vid, buf, n, fut, offset = entry
            try:
                with metrics.StageTimer("native.fetch_boxes", frames=n):
                    kf = np.asarray(fut) * scale  # (KF, 5): boxes*stride | score
                idx = np.minimum(np.arange(n) // di, len(kf) - 1)
                boxes, scores = kf[idx, :4], kf[idx, 4]
                fixed = np.round(_fix_aspect_np(boxes, dilate=1.2, ratio=tw / th))
                fixed = fixed.astype(np.float32)
                with metrics.StageTimer("native.crop", frames=n):
                    if n < C:  # tail chunk: pad to the compiled batch shape
                        crops = np.zeros((C, th * 3 // 2, tw), np.uint8)
                        media.crop_batch(buf[:n], W, H, fixed, (th, tw),
                                         out=crops[:n])
                        fixed = np.concatenate(
                            [fixed, np.zeros((C - n, 4), np.float32)])
                    else:
                        crops = media.crop_batch(buf, W, H, fixed, (th, tw))
            finally:
                free_bufs.append(buf)   # ring recycle (keeps pages warm)
                inflight.release()
            results[vid]["boxes"].append(boxes[:n])
            results[vid]["scores"].append(scores[:n])
            results[vid]["frames"] += n
            buf = kp_bufs.get(vid)
            if buf is None or offset + C > buf.shape[0]:
                # first chunk, or a container whose nb_frames lied: (re)grow.
                # jnp.zeros is lazy device-side.
                grow = max(offset + C,
                           2 * (buf.shape[0] if buf is not None else 0))
                new = jnp.zeros((grow, J, 3), jnp.float32)
                if buf is not None:
                    new = jax.lax.dynamic_update_slice(new, buf, (0, 0, 0))
                buf = new
            with metrics.StageTimer("native.pose_dispatch", frames=n):
                kp_bufs[vid] = est._pose_accum(
                    est.topdown.params, jnp.asarray(crops),
                    jnp.asarray(fixed), buf, offset)

        # (width, height) recorded at open: finish_video/assembly must not
        # re-open the container (a cv2 probe per video serialized ~10s of
        # host time across a 100-stream clinic run)
        vid_dims: Dict[int, tuple] = {}

        def finish_video(vid):
            """End-of-video: dispatch the 3D lift on the DEVICE-resident
            keypoint accumulator (a device slice — the 2D keypoints never
            round-trip to the host here) and start async copies of every
            output. Nothing blocks: the transfers and the lift compute
            overlap the next video's decode, and the final assembly loop
            finds the bytes already host-side."""
            nf = results[vid]["frames"]
            if nf and vid in kp_bufs:
                kp_dev = kp_bufs[vid]
                _copy_async(kp_dev)
                if lift and self.lifter is not None:
                    with metrics.StageTimer("lift_3d", frames=nf):
                        vw, vh = vid_dims.get(vid, (W, H))
                        kp3d, valid3 = self.lifter(kp_dev[:nf], vw, vh)
                    _copy_async(kp3d)
                    _copy_async(valid3)
                    lift_results[vid] = (kp3d, valid3)

        import time as _time

        def decode_chunk(reader, vid, offset):
            """Decode one chunk (packed, reused buffer) and dispatch its
            detect program; returns the pipeline entry or None at end of
            video."""
            t0 = _time.perf_counter()
            buf = take_buf()
            n = reader.read_batch(buf)
            if n == 0:
                free_bufs.append(buf)
                return None
            metrics.record("decode", n, _time.perf_counter() - t0)
            n_kf = (n + di - 1) // di
            with metrics.StageTimer("native.downsample", frames=n_kf):
                small = np.empty(
                    (KF, est.det_hw[0] * 3 // 2, est.det_hw[1]), np.uint8)
                media.downsample_batch(buf[:n], W, H, est.det_stride,
                                       (est.det_hw[1], est.det_hw[0]),
                                       interval=di, out=small[:n_kf])
                if n_kf < KF:
                    small[n_kf:] = 0
            with metrics.StageTimer("native.detect_dispatch", frames=n_kf):
                fut = est._detect_yuv(est.detector.params,
                                      jnp.asarray(small))
            _copy_async(fut)  # boxes stream back while the next chunk decodes
            return (vid, buf, n, fut, offset)

        def open_reader(vid, path):
            reader = media.NativeVideoReader(path,
                                             fast_decode=self.fast_decode)
            vid_dims[vid] = (reader.width, reader.height)
            # the compiled programs are sized for est.input_hw — refuse
            # mismatched videos loudly (BucketedStreamingRunner groups
            # mixed-resolution fleets into per-size runners)
            if (reader.height, reader.width) != (H, W):
                reader.close()
                raise ValueError(
                    f"{path!r} is {reader.width}x{reader.height} but this "
                    f"runner's estimator is compiled for {W}x{H}; run "
                    "same-resolution videos per runner (group by size)")
            # pre-size the device accumulator from the container header
            # (the consumer grows it if nb_frames was absent or wrong)
            if reader.num_frames > 0:
                t_pad = ((reader.num_frames + C - 1) // C) * C
                kp_bufs[vid] = jnp.zeros((t_pad, J, 3), jnp.float32)
            return reader

        if self._resolved_mode() == "interleave":
            # Multi-stream software pipelining (the clinic configs[4]
            # schedule): K videos are open at once and chunks round-robin
            # through the same compiled programs. End-of-video work — the
            # device-resident 3D lift dispatch and the final keypoint fetch
            # — hides behind OTHER streams' decode instead of stalling
            # between videos, which is what makes a 100-video run faster
            # than 100 sequential runs on the same core. Held-chunk depth
            # stays at the single-mode bound (2) so the decoder-pool
            # working set stays small (PERF.md: held refs are the decode
            # throughput wall).
            K = max(1, min(self.streams_in_flight, len(video_paths)))
            pq: list = []

            def drain_to(keep):
                while len(pq) > keep:
                    e = pq.pop(0)
                    if e[0] == "eov":
                        finish_video(e[1])
                    else:
                        process(e)

            slots = []          # [reader, vid, offset] per active stream
            next_vid = 0
            while next_vid < len(video_paths) and len(slots) < K:
                slots.append([open_reader(next_vid, video_paths[next_vid]),
                              next_vid, 0])
                next_vid += 1
            s = 0
            while slots:
                s %= len(slots)
                slot = slots[s]
                entry = decode_chunk(slot[0], slot[1], slot[2])
                if entry is None:
                    slot[0].close()
                    pq.append(("eov", slot[1]))
                    if next_vid < len(video_paths):
                        slots[s] = [open_reader(next_vid,
                                                video_paths[next_vid]),
                                    next_vid, 0]
                        next_vid += 1
                    else:
                        slots.pop(s)
                    continue
                pq.append(entry)
                slot[2] += entry[2]
                q_samples.append(len(pq) - 1)
                drain_to(1 if len(slots) == 1 else 2)
                s += 1
            drain_to(0)
        elif self._resolved_mode() == "single":
            # Software-pipelined single-thread schedule: after dispatching
            # chunk i's detect program, ask the device to stream the result
            # back (copy_to_host_async) and go decode chunk i+1. By the time
            # i+1 is decoded (~70 ms) the boxes landed (~17 ms link RT), so
            # processing chunk i never waits — the link round trip is hidden
            # without a second Python thread fighting for the (single) core.
            pq: list = []

            def drain_to(keep):
                while len(pq) > keep:
                    e = pq.pop(0)
                    if e[0] == "eov":
                        finish_video(e[1])
                    else:
                        process(e)

            for vid, path in enumerate(video_paths):
                reader = open_reader(vid, path)
                offset = 0
                try:
                    while True:
                        entry = decode_chunk(reader, vid, offset)
                        if entry is None:
                            break
                        pq.append(entry)
                        offset += entry[2]
                        q_samples.append(len(pq) - 1)
                        drain_to(1)
                finally:
                    reader.close()
                # leave the last chunk + eov pending so the kp fetch and
                # lift overlap the NEXT video's first decode
                pq.append(("eov", vid))
                drain_to(2)
            drain_to(0)
        else:
            def worker():
                try:
                    while True:
                        entry = work_q.get()
                        if entry is None:
                            break
                        if entry[0] == "eov":
                            finish_video(entry[1])
                            continue
                        process(entry)
                except Exception as e:  # noqa: BLE001 - surfaced in main
                    worker_error.append(e)
                    inflight.release()

            wt = threading.Thread(target=worker, daemon=True)
            wt.start()
            try:
                for vid, path in enumerate(video_paths):
                    reader = open_reader(vid, path)
                    offset = 0
                    try:
                        while not worker_error:
                            inflight.acquire()
                            if worker_error:
                                break
                            entry = decode_chunk(reader, vid, offset)
                            if entry is None:
                                inflight.release()
                                break
                            work_q.put(entry)
                            offset += entry[2]
                            q_samples.append(work_q.qsize())
                    finally:
                        reader.close()
                    work_q.put(("eov", vid))
            finally:
                work_q.put(None)
                wt.join()
            if worker_error:
                raise worker_error[0]
        # prefetch-pipeline occupancy: >0 mean means the consumer had work
        # queued whenever the producer finished a chunk (decode-bound run)
        self.last_queue_stats = dict(
            mean=float(np.mean(q_samples)) if q_samples else 0.0,
            max=int(max(q_samples)) if q_samples else 0,
            chunks=len(q_samples))

        out = []
        for vid, r in enumerate(results):
            nf = r["frames"]
            if nf and vid in kp_bufs:
                # async copies started at eov: this asarray finds the bytes
                # already host-side on backends with copy_to_host_async
                with metrics.StageTimer("native.fetch_kp", frames=nf):
                    kp = np.asarray(kp_bufs[vid])[:nf]
            else:
                kp = np.zeros((0, J, 3))
            item = dict(
                video=video_paths[vid],
                boxes=np.concatenate(r["boxes"]) if r["boxes"] else np.zeros((0, 4)),
                scores=np.concatenate(r["scores"]) if r["scores"] else np.zeros(0),
                keypoints2d=kp,
            )
            if lift and len(kp):
                if vid in lift_results:   # dispatched at eov (overlapped)
                    kp3d, valid3 = lift_results[vid]
                else:
                    vw, vh = vid_dims.get(vid, (W, H))
                    with metrics.StageTimer("lift_3d", frames=len(kp)):
                        kp3d, valid3 = self.lifter(kp, vw, vh)
                item["keypoints3d"] = np.asarray(kp3d)
                item["keypoints_valid"] = np.asarray(valid3)
            out.append(item)
        return out


class BucketedStreamingRunner:
    """Mixed-resolution fleets: group videos by (H, W), one compiled
    estimator per bucket, buckets streamed back-to-back.

    The reference adapts its net resolution per video
    (reference wrappers/openpose.py:129-154 recomputes netres from each
    video's aspect); under XLA the equivalent is one compiled program per
    frame geometry, reused across every video that shares it — so a clinic
    batch of mixed 1080p/720p/480p videos runs without recompiles beyond
    one per distinct size, and results come back in input order.

    Shares one lifter across buckets (keypoint-space programs are
    resolution-independent).
    """

    def __init__(self, lifter: Optional[LiftingModel] = None,
                 chunk_frames: int = 32, det_scale: float = 0.25,
                 det_interval: int = 4, runner_cls=None):
        self.lifter = lifter
        self.chunk_frames = chunk_frames
        self.det_scale = det_scale
        self.det_interval = det_interval
        self.runner_cls = runner_cls or NativeStreamingRunner
        self._runners: Dict[tuple, object] = {}

    def _runner_for(self, hw: tuple):
        if hw not in self._runners:
            est = I420PoseEstimator(input_hw=hw, det_scale=self.det_scale,
                                    det_interval=self.det_interval)
            self._runners[hw] = self.runner_cls(
                estimator=est, lifter=self.lifter,
                chunk_frames=self.chunk_frames)
        return self._runners[hw]

    def run(self, video_paths: List[str], lift: bool = True) -> List[Dict]:
        from ..native import media

        buckets: Dict[tuple, list] = {}
        order: Dict[str, int] = {}
        for i, path in enumerate(video_paths):
            r = media.NativeVideoReader(path)
            hw = (r.height, r.width)
            r.close()
            buckets.setdefault(hw, []).append(i)
            order[path] = i
        out: List[Optional[Dict]] = [None] * len(video_paths)
        for hw, idxs in buckets.items():
            runner = self._runner_for(hw)
            if lift and runner.lifter is None:
                if self.lifter is None:
                    self.lifter = LiftingModel("GastNet")
                runner.lifter = self.lifter
            results = runner.run([video_paths[i] for i in idxs], lift=lift)
            for i, res in zip(idxs, results):
                out[i] = res
        return out  # input order


class _DecodeWorker(threading.Thread):
    """Decodes one video into fixed-shape batches on a bounded queue."""

    def __init__(self, video_path: str, batch_size: int, out_queue: queue.Queue,
                 video_id: int):
        super().__init__(daemon=True)
        self.path = video_path
        self.batch = batch_size
        self.q = out_queue
        self.vid = video_id

    def run(self):
        import time

        try:
            t0 = time.perf_counter()
            n = 0
            for frames, valid in frame_batches(self.path, self.batch):
                n += int(valid.sum())
                self.q.put((self.vid, frames, valid))
            metrics.record("decode", n, time.perf_counter() - t0)
        finally:
            self.q.put((self.vid, None, None))  # end-of-stream marker


class StreamingRunner:
    """Stream many videos through the fused pose program concurrently.

    decode_threads host threads fill a bounded prefetch queue; the device
    consumes batches in arrival order. Per-video keypoints accumulate and are
    lifted at end-of-stream.
    """

    def __init__(self, estimator: Optional[FusedPoseEstimator] = None,
                 lifter: Optional[LiftingModel] = None,
                 batch_size: int = 8, prefetch: int = 16,
                 decode_threads: int = 8, chunk_batches: int = 8):
        self.estimator = estimator
        self.lifter = lifter
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.decode_threads = decode_threads
        self.chunk_batches = chunk_batches

    def run(self, video_paths: List[str], lift: bool = True) -> List[Dict]:
        if self.estimator is None:
            info = video_info(video_paths[0])
            self.estimator = FusedPoseEstimator(input_hw=(info["height"], info["width"]))
        if lift and self.lifter is None:
            self.lifter = LiftingModel("GastNet")
        import os as _os

        if self.decode_threads == 0 or (_os.cpu_count() or 1) == 1:
            # single-core host (or explicit request): decode inline — worker
            # threads only add GIL/arena churn when there is no parallelism
            return self._run_inline(video_paths, lift)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        results = [dict(boxes=[], scores=[], keypoints=[]) for _ in video_paths]
        active = 0
        next_video = 0
        pipelined = hasattr(self.estimator, "process_chunk")

        def start_next():
            nonlocal next_video, active
            if next_video < len(video_paths):
                _DecodeWorker(video_paths[next_video], self.batch_size, q,
                              next_video).start()
                next_video += 1
                active += 1

        def store(vid, n, boxes, scores, kp):
            results[vid]["boxes"].append(np.asarray(boxes)[:n])
            results[vid]["scores"].append(np.asarray(scores)[:n])
            results[vid]["keypoints"].append(np.asarray(kp)[:n])

        for _ in range(min(self.decode_threads, len(video_paths))):
            start_next()

        chunk: list = []  # [(vid, n, frames)]

        def flush_chunk():
            if not chunk:
                return
            with metrics.StageTimer("detect_2d", frames=sum(c[1] for c in chunk)):
                results_chunk = self.estimator.process_chunk([c[2] for c in chunk])
            for (cvid, cn, _), res in zip(chunk, results_chunk):
                store(cvid, cn, *res)
            chunk.clear()

        while active > 0:
            vid, frames, valid = q.get()
            if frames is None:
                active -= 1
                start_next()
                continue
            n = int(valid.sum())
            if pipelined:
                chunk.append((vid, n, frames))
                if len(chunk) >= self.chunk_batches:
                    flush_chunk()
            else:
                with metrics.StageTimer("detect_2d", frames=n):
                    boxes, scores, kp = self.estimator(frames)
                store(vid, n, boxes, scores, kp)
        if pipelined:
            flush_chunk()

        return self._collect(video_paths, results, lift)

    def _run_inline(self, video_paths: List[str], lift: bool) -> List[Dict]:
        """Threadless path: decode → chunked device processing, sequential."""
        results = [dict(boxes=[], scores=[], keypoints=[]) for _ in video_paths]
        chunked = hasattr(self.estimator, "process_chunk")
        chunk: list = []

        def flush():
            if not chunk:
                return
            with metrics.StageTimer("detect_2d", frames=sum(c[1] for c in chunk)):
                res = self.estimator.process_chunk([c[2] for c in chunk])
            for (cvid, cn, _), r in zip(chunk, res):
                results[cvid]["boxes"].append(np.asarray(r[0])[:cn])
                results[cvid]["scores"].append(np.asarray(r[1])[:cn])
                results[cvid]["keypoints"].append(np.asarray(r[2])[:cn])
            chunk.clear()

        for vid, path in enumerate(video_paths):
            import time as _time

            t0 = _time.perf_counter()
            n_dec = 0
            for frames, valid in frame_batches(path, self.batch_size):
                n = int(valid.sum())
                n_dec += n
                metrics.record("decode", n, _time.perf_counter() - t0)
                if chunked:
                    chunk.append((vid, n, frames))
                    if len(chunk) >= self.chunk_batches:
                        flush()
                else:
                    with metrics.StageTimer("detect_2d", frames=n):
                        b, s, kp = self.estimator(frames)
                    results[vid]["boxes"].append(np.asarray(b)[:n])
                    results[vid]["scores"].append(np.asarray(s)[:n])
                    results[vid]["keypoints"].append(np.asarray(kp)[:n])
                t0 = _time.perf_counter()
        flush()
        return self._collect(video_paths, results, lift)

    def _collect(self, video_paths, results, lift):
        out = []
        for vid, r in enumerate(results):
            kp = np.concatenate(r["keypoints"]) if r["keypoints"] else np.zeros((0, 17, 3))
            item = dict(
                video=video_paths[vid],
                boxes=np.concatenate(r["boxes"]) if r["boxes"] else np.zeros((0, 4)),
                scores=np.concatenate(r["scores"]) if r["scores"] else np.zeros(0),
                keypoints2d=kp,
            )
            if lift and len(kp):
                info = video_info(video_paths[vid])
                with metrics.StageTimer("lift_3d", frames=len(kp)):
                    kp3d, valid3 = self.lifter(kp, info["width"], info["height"])
                    kp3d = np.asarray(kp3d)
                item["keypoints3d"] = kp3d
                item["keypoints_valid"] = np.asarray(valid3)
            out.append(item)
        return out
