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
        self.det_hw = ((input_hw[0] // s) // 32 * 32, (input_hw[1] // s) // 32 * 32)
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
        """Full-res host crops with the reference affine semantics.

        Crops stay uint8: the device normalizes, and keeping them 1 byte/px
        quarters the host→device traffic.
        """
        th, tw = self.topdown.cfg.input_hw
        fixed = np.asarray(fix_aspect_ratio(boxes, dilate=1.2, ratio=tw / th))
        crops = np.empty((len(frames), th, tw, 3), np.uint8)
        for i, (frame, b) in enumerate(zip(frames, fixed)):
            src = np.float32([[b[0], b[1]], [b[0] + b[2], b[1] + b[3]], [b[0], b[1] + b[3]]])
            dst = np.float32([[0, 0], [tw, th], [0, th]])
            m = self.cv2.getAffineTransform(src, dst)
            crops[i] = self.cv2.warpAffine(frame, m, (tw, th), flags=self.cv2.INTER_LINEAR)
        return crops, fixed

    def submit(self, frames: np.ndarray):
        """Dispatch detection for a batch; returns the completed previous
        batch's (boxes, scores, keypoints) or None (pipeline warm-up)."""
        s = self.det_stride
        keyframes = frames[:: self.det_interval]
        small = np.ascontiguousarray(
            keyframes[:, : self.det_hw[0] * s: s, : self.det_hw[1] * s: s])
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

    def _finish(self, entry):
        frames, (boxes_f, scores_f) = entry
        kf_boxes = np.asarray(boxes_f) * np.array([self.scale_x, self.scale_y,
                                                   self.scale_x, self.scale_y])
        kf_scores = np.asarray(scores_f)
        # propagate keyframe detections to intermediate frames
        idx = np.arange(len(frames)) // self.det_interval
        idx = np.minimum(idx, len(kf_boxes) - 1)
        boxes = kf_boxes[idx]
        scores = kf_scores[idx]
        crops, fixed = self._host_crop(frames, boxes)
        kp = np.asarray(self._pose(self.topdown.params, jnp.asarray(crops),
                                   jnp.asarray(fixed)))
        return boxes, scores, kp


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
        try:
            for frames, valid in frame_batches(self.path, self.batch):
                self.q.put((self.vid, frames, valid))
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
                 decode_threads: int = 8):
        self.estimator = estimator
        self.lifter = lifter
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.decode_threads = decode_threads

    def run(self, video_paths: List[str], lift: bool = True) -> List[Dict]:
        if self.estimator is None:
            info = video_info(video_paths[0])
            self.estimator = FusedPoseEstimator(input_hw=(info["height"], info["width"]))
        if lift and self.lifter is None:
            self.lifter = LiftingModel("GastNet")

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        results = [dict(boxes=[], scores=[], keypoints=[]) for _ in video_paths]
        active = 0
        next_video = 0
        pipelined = hasattr(self.estimator, "submit")
        from collections import deque

        inflight: deque = deque()  # (video_id, n_valid) for pipelined mode

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

        while active > 0:
            vid, frames, valid = q.get()
            if frames is None:
                active -= 1
                start_next()
                continue
            n = int(valid.sum())
            if pipelined:
                res = self.estimator.submit(frames)
                inflight.append((vid, n))
                if res is not None:
                    pvid, pn = inflight.popleft()
                    store(pvid, pn, *res)
            else:
                boxes, scores, kp = self.estimator(frames)
                store(vid, n, boxes, scores, kp)
        if pipelined:
            res = self.estimator.flush()
            if res is not None:
                pvid, pn = inflight.popleft()
                store(pvid, pn, *res)

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
                kp3d, valid3 = self.lifter(kp, info["width"], info["height"])
                item["keypoints3d"] = np.asarray(kp3d)
                item["keypoints_valid"] = np.asarray(valid3)
            out.append(item)
        return out
