"""Native media runtime (native/mediadec.cpp via native/media.py) oracle tests.

The native decoder must agree with cv2 (both wrap libavcodec); the C++ pixel
ops (downsample, crop) must agree with their numpy/cv2 oracles; and the
device-side I420→RGB conversion (ops/colorspace.py) must match cv2's BT.601
conversion within quantization tolerance.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from posepipeline_tpu.native import media
from posepipeline_tpu.testing import synthetic_video

pytestmark = pytest.mark.skipif(not media.available(),
                                reason="native media library unavailable")


@pytest.fixture(scope="module")
def clip():
    c = synthetic_video(num_frames=12, width=320, height=240, num_people=1, seed=3)
    yield c
    os.remove(c.path)


def _decode_cv2_bgr(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def _i420_to_bgr_host(frame, H, W):
    """numpy oracle: I420 flat block → BGR via cv2's converter."""
    return cv2.cvtColor(frame.reshape(H * 3 // 2, W), cv2.COLOR_YUV2BGR_I420)


def test_native_reader_matches_cv2(clip):
    bgr = _decode_cv2_bgr(clip.path)
    T, H, W = bgr.shape[:3]
    with media.NativeVideoReader(clip.path) as r:
        assert (r.width, r.height) == (W, H)
        buf = np.zeros((T + 4, H * 3 // 2, W), np.uint8)
        n = r.read_batch(buf)
    assert n == T
    for i in range(T):
        ours = _i420_to_bgr_host(buf[i], H, W)
        # ±3: cv2's decode converter (swscale) and cv2.cvtColor round the
        # same BT.601 math slightly differently
        assert np.abs(ours.astype(int) - bgr[i].astype(int)).max() <= 3


def test_native_reader_batched_reads(clip):
    with media.NativeVideoReader(clip.path) as r:
        H, W = r.height, r.width
        buf = np.zeros((5, H * 3 // 2, W), np.uint8)
        total = 0
        chunks = []
        while True:
            n = r.read_batch(buf)
            if n == 0:
                break
            chunks.append(buf[:n].copy())
            total += n
    assert total == 12
    whole = np.concatenate(chunks)
    with media.NativeVideoReader(clip.path) as r:
        buf2 = np.zeros((16, H * 3 // 2, W), np.uint8)
        n = r.read_batch(buf2)
    np.testing.assert_array_equal(whole, buf2[:n])


def test_yuv_batches_padding(clip):
    batches = list(media.yuv_batches(clip.path, 5))
    assert [n for _, n in batches] == [5, 5, 2]
    tail, n = batches[-1]
    assert tail.shape[0] == 5 and (tail[n:] == 0).all()


def test_downsample_matches_numpy(clip):
    with media.NativeVideoReader(clip.path) as r:
        H, W = r.height, r.width
        buf = np.zeros((8, H * 3 // 2, W), np.uint8)
        n = r.read_batch(buf)
    s = 2
    oh, ow = (H // s) // 32 * 32, (W // s) // 32 * 32
    small = media.downsample_batch(buf, W, H, s, (ow, oh), interval=4)
    assert small.shape == (2, oh * 3 // 2, ow)
    for i, src_idx in enumerate([0, 4]):
        flat = buf[src_idx].reshape(-1)
        Y = flat[:H * W].reshape(H, W)
        U = flat[H * W:H * W * 5 // 4].reshape(H // 2, W // 2)
        V = flat[H * W * 5 // 4:].reshape(H // 2, W // 2)
        sflat = small[i].reshape(-1)
        np.testing.assert_array_equal(
            sflat[:oh * ow].reshape(oh, ow), Y[::s, ::s][:oh, :ow])
        np.testing.assert_array_equal(
            sflat[oh * ow:oh * ow * 5 // 4].reshape(oh // 2, ow // 2),
            U[::s, ::s][:oh // 2, :ow // 2])
        np.testing.assert_array_equal(
            sflat[oh * ow * 5 // 4:].reshape(oh // 2, ow // 2),
            V[::s, ::s][:oh // 2, :ow // 2])


def test_crop_batch_matches_cv2_resize(clip):
    """In-image integer boxes: the C++ bilinear crop must match cv2.resize of
    the sliced region (same half-pixel-center sampling)."""
    with media.NativeVideoReader(clip.path) as r:
        H, W = r.height, r.width
        buf = np.zeros((2, H * 3 // 2, W), np.uint8)
        r.read_batch(buf)
    th, tw = 64, 48
    boxes = np.array([[40, 30, 96, 128], [0, 0, 160, 120]], np.float32)
    crops = media.crop_batch(buf, W, H, boxes, (th, tw))
    for i, (x, y, w, h) in enumerate(boxes.astype(int)):
        Y = buf[i, :H]  # Y plane
        ref = cv2.resize(Y[y:y + h, x:x + w], (tw, th), interpolation=cv2.INTER_LINEAR)
        ours = crops[i, :th]
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_crop_batch_out_of_image_zero_border(clip):
    with media.NativeVideoReader(clip.path) as r:
        H, W = r.height, r.width
        buf = np.zeros((1, H * 3 // 2, W), np.uint8)
        r.read_batch(buf)
    th, tw = 64, 48
    boxes = np.array([[-24, -32, 96, 128]], np.float32)
    crops = media.crop_batch(buf, W, H, boxes, (th, tw))
    # left quarter and top quarter of the Y crop are outside the image → zero
    assert (crops[0, :th][:, :tw // 4] == 0).all()
    assert (crops[0, :16, :] == 0).all()


def test_i420_to_rgb_matches_cv2(clip):
    import jax

    from posepipeline_tpu.ops.colorspace import i420_to_rgb

    with media.NativeVideoReader(clip.path) as r:
        H, W = r.height, r.width
        buf = np.zeros((2, H * 3 // 2, W), np.uint8)
        r.read_batch(buf)
    rgb = np.asarray(jax.jit(lambda b: i420_to_rgb(b, H, W))(buf))
    for i in range(2):
        ref = cv2.cvtColor(buf[i], cv2.COLOR_YUV2RGB_I420)
        assert np.abs(rgb[i] - ref.astype(np.float32)).max() <= 3.0
        assert np.abs(rgb[i] - ref.astype(np.float32)).mean() < 1.0


def test_native_runner_smoke(clip):
    """Threaded producer/consumer runner on tiny nets (fast default-suite
    coverage; the full-size-model variant below is marked slow)."""
    from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector
    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
    from posepipeline_tpu.runtime.stream import (I420PoseEstimator,
                                                 NativeStreamingRunner)

    det = PersonDetector(DetectorConfig(widths=(8, 16, 32, 64)),
                         input_hw=(96, 160))
    td = TopDownModel(TopDownConfig("tiny", num_joints=17, input_hw=(64, 48),
                                    heatmap_hw=(16, 12), dim=32, depth=1,
                                    num_heads=2, head_features=32))
    est = I420PoseEstimator(detector=det, topdown=td,
                            input_hw=(240, 320), det_scale=0.5)
    runner = NativeStreamingRunner(estimator=est, chunk_frames=8)
    res = runner.run([clip.path, clip.path], lift=False)
    assert len(res) == 2
    for r in res:
        assert r["keypoints2d"].shape == (12, 17, 3)
        assert np.isfinite(r["keypoints2d"]).all()
        assert r["boxes"].shape == (12, 4)


def test_native_runner_single_mode_matches_threads(clip):
    """The software-pipelined single-thread schedule must be bit-identical
    to the producer/consumer schedule — it reorders only WHEN device results
    are fetched, never what is computed."""
    from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector
    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
    from posepipeline_tpu.runtime.stream import (I420PoseEstimator,
                                                 NativeStreamingRunner)

    det = PersonDetector(DetectorConfig(widths=(8, 16, 32, 64)),
                         input_hw=(96, 160))
    td = TopDownModel(TopDownConfig("tiny_sm", num_joints=17, input_hw=(64, 48),
                                    heatmap_hw=(16, 12), dim=32, depth=1,
                                    num_heads=2, head_features=32))
    est = I420PoseEstimator(detector=det, topdown=td,
                            input_hw=(240, 320), det_scale=0.5)
    outs = {}
    for mode in ("threads", "single", "interleave"):
        runner = NativeStreamingRunner(estimator=est, chunk_frames=8,
                                       mode=mode, streams_in_flight=3)
        assert runner._resolved_mode() == mode or \
            __import__("os").environ.get("PPT_STREAM_MODE")
        outs[mode] = runner.run([clip.path, clip.path, clip.path], lift=False)
    for mode in ("single", "interleave"):
        for a, b in zip(outs["threads"], outs[mode]):
            np.testing.assert_array_equal(a["keypoints2d"], b["keypoints2d"])
            np.testing.assert_array_equal(a["boxes"], b["boxes"])
            np.testing.assert_array_equal(a["scores"], b["scores"])


@pytest.mark.slow
def test_native_runner_end_to_end(clip):
    from posepipeline_tpu.runtime.stream import (I420PoseEstimator,
                                                 NativeStreamingRunner)

    est = I420PoseEstimator(input_hw=(240, 320), det_scale=0.5)
    runner = NativeStreamingRunner(estimator=est, chunk_frames=8)
    res = runner.run([clip.path], lift=False)
    assert len(res) == 1
    assert res[0]["keypoints2d"].shape == (12, 17, 3)
    assert np.isfinite(res[0]["keypoints2d"]).all()
    assert res[0]["boxes"].shape == (12, 4)


def test_native_runner_rejects_mismatched_resolution(clip):
    """Mixed-resolution inputs must fail loudly (the decode buffers are
    sized for one resolution; silently decoding a larger video would be an
    out-of-bounds write in the C++ decoder)."""
    from posepipeline_tpu.models.detector import DetectorConfig, PersonDetector
    from posepipeline_tpu.models.topdown import TopDownConfig, TopDownModel
    from posepipeline_tpu.runtime.stream import (I420PoseEstimator,
                                                 NativeStreamingRunner)
    from posepipeline_tpu.testing import synthetic_video

    det = PersonDetector(DetectorConfig(widths=(8, 16, 32, 64)),
                         input_hw=(96, 160))
    td = TopDownModel(TopDownConfig("tiny2", num_joints=17, input_hw=(64, 48),
                                    heatmap_hw=(16, 12), dim=32, depth=1,
                                    num_heads=2, head_features=32))
    est = I420PoseEstimator(detector=det, topdown=td,
                            input_hw=(240, 320), det_scale=0.5)
    runner = NativeStreamingRunner(estimator=est, chunk_frames=8)
    other = synthetic_video(num_frames=4, width=640, height=480, seed=9)
    with pytest.raises(ValueError, match="compiled for"):
        runner.run([other.path], lift=False)
    import os
    os.remove(other.path)


def test_downsample_full_fov_alignment(clip):
    """Detection dims align UP (edge replication), never cropping field of
    view; tiny videos still get a valid /32 det frame; the clamped C++
    downsample fills the overhang with replicated edge pixels."""
    from posepipeline_tpu.native import media

    def det_hw(H, W, s):
        return (max(32, -(-(H // s) // 32) * 32),
                max(32, -(-(W // s) // 32) * 32))

    # 1080p at stride 4: 270 rows must round UP to 288, not down to 256
    assert det_hw(1080, 1920, 4) == (288, 480)
    assert det_hw(120, 160, 4) == (32, 64)   # tiny video: floor would be 0

    H, W, s = 240, 320, 4
    oh, ow = det_hw(H, W, s)
    frames = np.random.randint(0, 255, (2, H * 3 // 2, W), np.uint8)
    out = media.downsample_batch(frames, W, H, s, (ow, oh))
    assert out.shape == (2, oh * 3 // 2, ow)
    # in-bounds region is the strided slice; overhang replicates the edge
    y = out[0][:oh]
    src_y = frames[0][:H]
    np.testing.assert_array_equal(y[: H // s, : W // s], src_y[::s, ::s])
    np.testing.assert_array_equal(y[H // s:, : W // s],
                                  np.tile(src_y[-1, ::s], (oh - H // s, 1)))


def test_native_x264_writer_roundtrip(tmp_path):
    """First-party libx264 encode (menc_*): the produced artifact is real
    H.264 (codec golden — the reference recompresses every *Video artifact
    to libx264, reference utils/visualization.py:72-76) and decodes back to
    the input within lossy-codec tolerance."""
    if not media.NativeVideoWriter.available():
        pytest.skip("libx264 encoder unavailable in this libavcodec build")
    H, W, T = 96, 128, 10
    rng = np.random.default_rng(0)
    # piecewise-constant frames: codecs preserve flat patches well
    frames = np.repeat(np.repeat(
        rng.integers(0, 255, (T, H // 16, W // 16, 3), np.uint8),
        16, axis=1), 16, axis=2)
    out = str(tmp_path / "clip.mp4")
    with media.NativeVideoWriter(out, W, H, fps=30.0, crf=18) as w:
        for f in frames:
            w.write_rgb(f)
    assert media.codec_name(out) == "h264"
    with media.NativeVideoReader(out) as r:
        assert (r.width, r.height) == (W, H)
        buf = np.zeros((T + 4, H * 3 // 2, W), np.uint8)
        n = r.read_batch(buf)
    assert n == T
    got = np.stack([cv2.cvtColor(b, cv2.COLOR_YUV2RGB_I420) for b in buf[:T]])
    err = np.abs(got.astype(np.int16) - frames.astype(np.int16)).mean()
    assert err < 4.0, f"mean abs error {err}"


def test_write_video_prefers_x264(tmp_path):
    """media.write_video produces an H.264 artifact when libx264 exists and
    honors the PPT_VIDEO_CODEC=mp4v escape hatch."""
    from posepipeline_tpu.media.video import write_video

    if not media.NativeVideoWriter.available():
        pytest.skip("libx264 encoder unavailable in this libavcodec build")
    frames = [np.full((64, 64, 3), c, np.uint8) for c in (10, 120, 240)]
    out = str(tmp_path / "artifact.mp4")
    write_video(iter(frames), out, fps=30.0)
    assert media.codec_name(out) == "h264"
    out2 = str(tmp_path / "artifact_mp4v.mp4")
    os.environ["PPT_VIDEO_CODEC"] = "mp4v"
    try:
        write_video(iter(frames), out2, fps=30.0)
    finally:
        del os.environ["PPT_VIDEO_CODEC"]
    assert media.codec_name(out2) != "h264"
