"""ctypes bindings for the native media runtime (native/mediadec.cpp).

The streaming pipeline's host work is entropy decode + byte shuffling; this
module gives both to C++ (libavcodec decode → contiguous I420 blocks;
detection downsample; bbox crop+resize), eliminating per-frame Python, numpy
allocation, and cv2 dispatch costs. Device-side YUV→RGB conversion lives in
ops/colorspace.py.

Falls back cleanly: ``available()`` is False when g++ or the ffmpeg dev
libraries are missing, and callers (media/video.py, runtime/stream.py) keep
using the cv2 path.

Replaces (natively) the reference's media layer:
reference pose_pipeline/pipeline.py:47-87 (robust reader),
utils/bounding_box.py:101-194 (person dataloader crops).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "mediadec.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libpptmedia.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build(force: bool = False) -> str:
    """Compile the native media library (g++ -O3, links system ffmpeg)."""
    if force or not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               _SRC, "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
               "-o", _LIB_PATH]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            _build_failed = True
            return None
        c = ctypes
        lib.mdec_open.restype = c.c_void_p
        lib.mdec_open.argtypes = [c.c_char_p, c.c_int]
        lib.mdec_open2.restype = c.c_void_p
        lib.mdec_open2.argtypes = [c.c_char_p, c.c_int, c.c_int]
        lib.mdec_width.restype = c.c_int
        lib.mdec_width.argtypes = [c.c_void_p]
        lib.mdec_height.restype = c.c_int
        lib.mdec_height.argtypes = [c.c_void_p]
        lib.mdec_fps.restype = c.c_double
        lib.mdec_fps.argtypes = [c.c_void_p]
        lib.mdec_nframes.restype = c.c_int64
        lib.mdec_nframes.argtypes = [c.c_void_p]
        lib.mdec_read.restype = c.c_int
        lib.mdec_read.argtypes = [c.c_void_p, c.POINTER(c.c_uint8), c.c_int]
        lib.mdec_close.restype = None
        lib.mdec_close.argtypes = [c.c_void_p]
        lib.mdec_crop_batch_i420.restype = None
        lib.mdec_crop_batch_i420.argtypes = [
            c.POINTER(c.c_uint8), c.c_int, c.c_int, c.c_int,
            c.POINTER(c.c_float), c.POINTER(c.c_uint8), c.c_int, c.c_int]
        lib.mdec_downsample_batch_i420.restype = None
        lib.mdec_downsample_batch_i420.argtypes = [
            c.POINTER(c.c_uint8), c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,
            c.POINTER(c.c_uint8), c.c_int, c.c_int]
        lib.mdec_read_refs.restype = c.c_int
        lib.mdec_read_refs.argtypes = [c.c_void_p, c.POINTER(c.c_void_p), c.c_int]
        lib.mdec_release_refs.restype = None
        lib.mdec_release_refs.argtypes = [c.POINTER(c.c_void_p), c.c_int]
        lib.mdec_crop_refs.restype = None
        lib.mdec_crop_refs.argtypes = [
            c.POINTER(c.c_void_p), c.c_int, c.c_int, c.c_int,
            c.POINTER(c.c_float), c.POINTER(c.c_uint8), c.c_int, c.c_int]
        lib.mdec_downsample_refs.restype = None
        lib.mdec_downsample_refs.argtypes = [
            c.POINTER(c.c_void_p), c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,
            c.POINTER(c.c_uint8), c.c_int, c.c_int]
        lib.menc_open.restype = c.c_void_p
        lib.menc_open.argtypes = [c.c_char_p, c.c_int, c.c_int, c.c_double,
                                  c.c_int, c.c_char_p]
        lib.menc_write.restype = c.c_int
        lib.menc_write.argtypes = [c.c_void_p, c.POINTER(c.c_uint8), c.c_int]
        lib.menc_close.restype = c.c_int
        lib.menc_close.argtypes = [c.c_void_p]
        lib.mdec_codec_name.restype = c.c_char_p
        lib.mdec_codec_name.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def i420_frame_bytes(width: int, height: int) -> int:
    return width * height * 3 // 2


class NativeVideoReader:
    """Decode a video into contiguous I420 frame batches via libavcodec.

    Each batch is a ``(n, H*3//2, W)`` uint8 array: frame i's flat I420 block
    (Y plane H×W, then U and V quarter planes) viewed 2-D so downstream code
    can ``device_put`` it directly. Use ops/colorspace.py to reshape/convert
    on device.
    """

    def __init__(self, path: str, threads: int = -1,
                 fast_decode: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native media library unavailable")
        self._lib = lib
        if threads < 0:
            threads = 1 if (os.cpu_count() or 1) == 1 else 0  # 0 = ffmpeg picks
        self._h = lib.mdec_open2(path.encode(), threads,
                                 1 if fast_decode else 0)
        if not self._h:
            raise IOError(f"mdec_open failed for {path!r}")
        self.width = lib.mdec_width(self._h)
        self.height = lib.mdec_height(self._h)
        self.fps = lib.mdec_fps(self._h)
        self.num_frames = int(lib.mdec_nframes(self._h))
        self.codec_name = lib.mdec_codec_name(self._h).decode()
        if self.width % 2 or self.height % 2:
            self.close()
            raise IOError("native reader requires even frame dimensions")

    def read_batch(self, out: np.ndarray) -> int:
        """Fill ``out`` (n, H*3//2, W) uint8 with up to n frames; returns the
        number decoded (0 at end of stream)."""
        if self._h is None:
            return 0
        n = self._lib.mdec_read(self._h, _u8ptr(out), out.shape[0])
        if n < 0:
            raise IOError("native decode error")
        return n

    def read_refs(self, max_frames: int) -> "FrameRefs":
        """Decode up to ``max_frames`` zero-copy: returns ref-counted handles
        into the decoder's frame pool (no packed-I420 memcpy). The caller
        must ``release()`` (or let GC) every batch — held refs pin decoder
        pool buffers (~3 MB each at 1080p)."""
        if self._h is None:
            return FrameRefs(self._lib, None, 0, self.width, self.height)
        handles = (ctypes.c_void_p * max_frames)()
        n = self._lib.mdec_read_refs(self._h, handles, max_frames)
        if n < 0:
            raise IOError("native decode error")
        return FrameRefs(self._lib, handles, n, self.width, self.height)

    def close(self):
        if self._h is not None:
            self._lib.mdec_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - GC safety
        try:
            self.close()
        except Exception:
            pass


class FrameRefs:
    """A batch of ref-counted decoded frames (zero-copy decode path).

    Wraps N AVFrame* handles; ``crop``/``downsample`` read the codec-owned
    planes in place (linesize-aware). ``release()`` frees the refs — it is
    idempotent and also runs at GC as a leak backstop.
    """

    def __init__(self, lib, handles, n, width, height):
        self._lib = lib
        self._handles = handles
        self.n = n
        self.width = width
        self.height = height

    def release(self):
        if self._handles is not None and self.n:
            self._lib.mdec_release_refs(self._handles, self.n)
        self._handles = None
        self.n = 0

    def __del__(self):  # pragma: no cover - GC safety
        try:
            self.release()
        except Exception:
            pass

    def crop(self, boxes: np.ndarray, crop_hw: Tuple[int, int],
             out: Optional[np.ndarray] = None) -> np.ndarray:
        """Bilinear bbox crops (XYWH full-res pixels) → (n, th*3//2, tw)."""
        th, tw = crop_hw
        boxes = np.ascontiguousarray(boxes[: self.n], np.float32)
        if out is None:
            out = np.empty((self.n, th * 3 // 2, tw), np.uint8)
        self._lib.mdec_crop_refs(
            self._handles, self.n, self.width, self.height,
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _u8ptr(out), tw, th)
        return out

    def downsample(self, stride: int, out_wh: Tuple[int, int],
                   interval: int = 1,
                   out: Optional[np.ndarray] = None) -> np.ndarray:
        """Strided downsample of every ``interval``-th frame → keyframes."""
        ow, oh = out_wh
        n_out = (self.n + interval - 1) // interval
        if out is None:
            out = np.empty((n_out, oh * 3 // 2, ow), np.uint8)
        self._lib.mdec_downsample_refs(self._handles, n_out, self.width,
                                       self.height, stride, interval,
                                       _u8ptr(out), ow, oh)
        return out


def yuv_batches(path: str, batch_size: int,
                buf: Optional[np.ndarray] = None,
                ) -> Iterator[Tuple[np.ndarray, int]]:
    """Yield ``(batch (B, H*3//2, W) uint8, n_valid)`` fixed-shape batches.

    The tail batch is zero-padded past ``n_valid``. When ``buf`` is passed it
    is reused for every batch (caller must consume before the next step).
    """
    with NativeVideoReader(path) as r:
        shape = (batch_size, r.height * 3 // 2, r.width)
        while True:
            out = buf if buf is not None and buf.shape == shape else np.zeros(shape, np.uint8)
            n = r.read_batch(out)
            if n == 0:
                return
            if n < batch_size:
                out[n:] = 0
            yield out, n
            if n < batch_size:
                return


def downsample_batch(frames: np.ndarray, width: int, height: int, stride: int,
                     out_wh: Tuple[int, int], interval: int = 1,
                     out: Optional[np.ndarray] = None) -> np.ndarray:
    """Strided (nearest) downsample of every ``interval``-th I420 frame.

    frames: (N, H*3//2, W) uint8 contiguous; output has
    ceil(N/interval) small frames of (oh*3//2, ow) — the detection keyframes.
    """
    lib = _load()
    ow, oh = out_wh
    n_out = (frames.shape[0] + interval - 1) // interval
    if out is None:
        out = np.empty((n_out, oh * 3 // 2, ow), np.uint8)
    lib.mdec_downsample_batch_i420(_u8ptr(frames), n_out, width, height,
                                   stride, interval, _u8ptr(out), ow, oh)
    return out


class NativeVideoWriter:
    """In-process MP4/libx264 encoder (native/mediadec.cpp menc_*).

    The reference recompresses every ``*Video`` artifact through an
    ``ffmpeg -c:v libx264`` subprocess (reference pipeline.py:69,
    utils/visualization.py:72-76); this environment has no ffmpeg binary, so
    the writer drives libavcodec/libx264 directly. Frames are I420 blocks
    ``(H*3//2, W)`` uint8 (the pipeline's native frame layout) or RGB
    ``(H, W, 3)`` via :meth:`write_rgb`.
    """

    def __init__(self, path: str, width: int, height: int, fps: float = 30.0,
                 crf: int = 23, preset: str = "veryfast"):
        lib = _load()
        if lib is None:
            raise RuntimeError("native media library unavailable")
        if width % 2 or height % 2:
            raise ValueError("libx264 yuv420p needs even dimensions")
        self._lib = lib
        self.width, self.height, self.fps = width, height, float(fps)
        self._h = lib.menc_open(path.encode(), width, height, float(fps),
                                int(crf), preset.encode())
        if not self._h:
            raise IOError(
                f"menc_open failed for {path!r} (libx264 unavailable?)")
        self.path = path

    @staticmethod
    def available() -> bool:
        """True when the native lib is built AND libx264 can open."""
        lib = _load()
        if lib is None:
            return False
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            h = lib.menc_open(os.path.join(d, "probe.mp4").encode(),
                              64, 64, 30.0, 23, b"veryfast")
            if not h:
                return False
            lib.menc_close(h)
        return True

    def write(self, i420_frames: np.ndarray) -> None:
        """Encode (n, H*3//2, W) or a single (H*3//2, W) uint8 I420 block."""
        if self._h is None:
            raise IOError("writer is closed")
        a = np.ascontiguousarray(i420_frames, np.uint8)
        if a.ndim == 2:
            a = a[None]
        if a.shape[1:] != (self.height * 3 // 2, self.width):
            raise ValueError(f"expected (n, {self.height * 3 // 2}, "
                             f"{self.width}), got {a.shape}")
        if self._lib.menc_write(self._h, _u8ptr(a), a.shape[0]) != 0:
            raise IOError("native encode error")

    def write_rgb(self, frame: np.ndarray) -> None:
        """Encode one (H, W, 3) uint8 RGB frame (cv2 RGB→I420 host conv)."""
        import cv2

        self.write(cv2.cvtColor(np.ascontiguousarray(frame, np.uint8),
                                cv2.COLOR_RGB2YUV_I420))

    def close(self) -> None:
        if self._h is not None:
            rc = self._lib.menc_close(self._h)
            self._h = None
            if rc != 0:
                raise IOError(f"encoder flush/trailer failed for {self.path!r}")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - GC safety
        try:
            self.close()
        except Exception:
            pass


def codec_name(path: str) -> str:
    """Video-stream codec of a file ("h264", "mpeg4", …) — artifact tests
    assert the produced codec without needing ffprobe."""
    with NativeVideoReader(path) as r:
        return r.codec_name


def crop_batch(frames: np.ndarray, width: int, height: int,
               boxes: np.ndarray, crop_hw: Tuple[int, int],
               out: Optional[np.ndarray] = None) -> np.ndarray:
    """Bilinear bbox crops of N I420 frames → N I420 crops.

    frames: (N, H*3//2, W) uint8; boxes: (N, 4) float32 XYWH full-res pixels;
    out: (N, th*3//2, tw) uint8. Out-of-image area is zero (constant border,
    matching ops/warp.py and the cv2 host-crop semantics it replaces).
    """
    lib = _load()
    th, tw = crop_hw
    n = frames.shape[0]
    boxes = np.ascontiguousarray(boxes, np.float32)
    if out is None:
        out = np.empty((n, th * 3 // 2, tw), np.uint8)
    lib.mdec_crop_batch_i420(_u8ptr(frames), n, width, height,
                             boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             _u8ptr(out), tw, th)
    return out
