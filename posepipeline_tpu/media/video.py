"""Host-side video IO: decode, validation, re-encode.

Replaces the reference's cv2 + ffmpeg-subprocess media layer
(reference pose_pipeline/pipeline.py:47-87 ``get_robust_reader``,
utils/visualization.py:12-76 overlay encode, utils/video_format.py:7-29).

Design notes (TPU-first):
- Decode stays on the **host** (video codecs are not TPU work). Frames are
  produced as contiguous uint8 RGB ndarrays ready for zero-copy
  ``jax.device_put`` into the accelerator pipeline.
- ``frame_batches`` yields fixed-size batches (padded at the tail) so every
  downstream jitted function sees **static shapes** — XLA compiles once per
  (batch, H, W) bucket instead of per video.
- Re-encode prefers the first-party in-process libx264 encoder
  (native/mediadec.cpp ``menc_*`` — the reference's ``ffmpeg -c:v libx264``
  subprocess without the subprocess); cv2's built-in codecs remain the
  fallback when the native lib is unavailable.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, Optional, Tuple

import cv2
import numpy as np

from ..hostmem import configure_allocator

# Recycle page-faulted heap pages for frame buffers (see hostmem.py; decoded
# 1080p batches otherwise pay seconds of first-touch faults per batch on
# virtualized hosts).
configure_allocator()

# Match OpenCV's thread pool to the actual core count (override via
# PPT_CV2_THREADS). Oversubscribing is actively harmful: on a 1-core host,
# multi-threaded FFmpeg decode loses 4x to context-switch churn against the
# JAX runtime threads (measured 54 fps @ 8 threads vs 216 fps @ 1 thread).
_cv2_threads = int(os.environ.get("PPT_CV2_THREADS", max(os.cpu_count() or 1, 1)))
if cv2.getNumThreads() != _cv2_threads:
    cv2.setNumThreads(_cv2_threads)

_FOURCC_CANDIDATES = ("mp4v", "avc1", "MJPG")


def open_capture(path: str) -> cv2.VideoCapture:
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Cannot open video {path!r}")
    return cap


def video_info(path: str) -> dict:
    """fps / num_frames / width / height (reference VideoInfo.make fields,
    pipeline.py:104-124)."""
    cap = open_capture(path)
    try:
        return dict(
            fps=float(cap.get(cv2.CAP_PROP_FPS)),
            num_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        )
    finally:
        cap.release()


def read_frames(path: str, start: int = 0, count: Optional[int] = None,
                rgb: bool = True) -> Iterator[np.ndarray]:
    """Yield frames as HxWx3 uint8 arrays (RGB by default)."""
    cap = open_capture(path)
    try:
        if start:
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        n = 0
        while count is None or n < count:
            ret, frame = cap.read()
            if not ret or frame is None:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if rgb else frame
            n += 1
    finally:
        cap.release()


def decode_all(path: str, rgb: bool = True) -> np.ndarray:
    """Decode the whole video to a (T, H, W, 3) uint8 array."""
    frames = list(read_frames(path, rgb=rgb))
    if not frames:
        raise IOError(f"No decodable frames in {path!r}")
    return np.stack(frames)


def frame_batches(path: str, batch_size: int, rgb: bool = True,
                  pad_tail: bool = True) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(frames[B,H,W,3] uint8, valid[B] bool)`` fixed-shape batches.

    Tail batches are zero-padded with ``valid`` marking real frames, so jitted
    consumers always see static shapes (one XLA compilation per video size).
    """
    buf = []
    for frame in read_frames(path, rgb=rgb):
        buf.append(frame)
        if len(buf) == batch_size:
            yield np.stack(buf), np.ones(batch_size, dtype=bool)
            buf = []
    if buf:
        valid = np.zeros(batch_size, dtype=bool)
        valid[: len(buf)] = True
        if pad_tail:
            pad = [np.zeros_like(buf[0])] * (batch_size - len(buf))
            yield np.stack(buf + pad), valid
        else:
            yield np.stack(buf), valid[: len(buf)]


def _x264_writer_cls():
    """The native libx264 writer class, or None (then cv2 mp4v is the
    fallback). Cached: the probe opens a real encoder once."""
    global _X264_CLS
    if _X264_CLS is not None:
        return _X264_CLS or None
    try:
        from ..native.media import NativeVideoWriter

        _X264_CLS = NativeVideoWriter if NativeVideoWriter.available() else False
    except Exception:
        _X264_CLS = False
    return _X264_CLS or None


_X264_CLS = None


def write_video(frames, path: str, fps: float = 30.0, rgb: bool = True,
                codec: Optional[str] = None) -> str:
    """Encode an iterable of HxWx3 uint8 frames to an MP4 file.

    Prefers the first-party libx264 encoder (native/mediadec.cpp menc_*) —
    the reference recompresses every ``*Video`` artifact to H.264 via an
    ffmpeg subprocess (reference utils/visualization.py:72-76,
    pipeline.py:69) for size + player compatibility; cv2/mp4v remains the
    fallback when the native lib or libx264 is unavailable. ``codec="mp4v"``
    (or PPT_VIDEO_CODEC=mp4v) forces the cv2 path."""
    import os as _os

    codec = codec or _os.environ.get("PPT_VIDEO_CODEC", "h264")
    use_x264 = codec != "mp4v"
    native_cls = _x264_writer_cls() if use_x264 else None
    writer = None
    native = None
    for frame in frames:
        if frame.dtype != np.uint8:
            frame = np.clip(frame, 0, 255).astype(np.uint8)
        h, w = frame.shape[:2]
        if native_cls is not None and native is None and writer is None:
            if h % 2 == 0 and w % 2 == 0:
                native = native_cls(path, w, h, fps=fps)
            else:
                native_cls = None  # odd dims: yuv420p can't represent them
        if native is not None:
            native.write_rgb(frame if rgb
                             else cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            continue
        bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR) if rgb else frame
        if writer is None:
            for fourcc in _FOURCC_CANDIDATES:
                writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h))
                if writer.isOpened():
                    break
                writer.release()
                writer = None
            if writer is None:
                raise IOError(f"No working codec for {path!r}")
        writer.write(bgr)
    if native is not None:
        native.close()
    if writer is not None:
        writer.release()
    return path


def transcode(path: str, out_path: Optional[str] = None, fps: Optional[float] = None) -> str:
    """Re-encode a video through cv2 (the robust-reader repair path;
    replaces the ffmpeg/libx264 subprocess at reference pipeline.py:66-79)."""
    if out_path is None:
        fd, out_path = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
    cap = open_capture(path)
    src_fps = fps or float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret or frame is None:
            break
        frames.append(frame)
    cap.release()
    if not frames:
        raise IOError(f"transcode: no decodable frames in {path!r}")
    write_video(iter(frames), out_path, fps=src_fps, rgb=False)
    return out_path


def validate_decodable(path: str) -> bool:
    """Check every indexed frame is decodable (reference pipeline.py:73-79)."""
    cap = open_capture(path)
    try:
        expected = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        for _ in range(expected):
            ret, frame = cap.read()
            if not ret or frame is None:
                return False
        return True
    finally:
        cap.release()


def robust_video_file(path: str) -> str:
    """Return a path to a fully-decodable copy of ``path`` (transcoding if
    any frame fails to decode) — the media-level fault tolerance of
    reference ``Video.get_robust_reader`` (pipeline.py:47-87)."""
    if validate_decodable(path):
        return path
    return transcode(path)


def compress(path: str, out_path: Optional[str] = None) -> str:
    """Recompress helper (reference utils/video_format.py:11-21)."""
    return transcode(path, out_path)
