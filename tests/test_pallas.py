"""Pallas kernel tests (interpreter mode on the CPU mesh; the real TPU path
is exercised by bench.py / verify drives)."""

import numpy as np
import pytest

from posepipeline_tpu.ops.heatmap import decode_heatmaps


def make_gaussian_heatmaps(peaks, shape=(64, 48), sigma=2.0):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    return np.stack([
        np.exp(-((xx - px) ** 2 + (yy - py) ** 2) / (2 * sigma**2))
        for (px, py) in peaks
    ]).astype(np.float32)


def test_pallas_decode_matches_xla_path():
    from posepipeline_tpu.ops.pallas_kernels import decode_heatmaps_pallas

    peaks = np.array([[10.3, 20.7], [30.6, 5.4], [24.0, 31.9], [2.0, 2.0]])
    hm = np.stack([make_gaussian_heatmaps(peaks[:2]),
                   make_gaussian_heatmaps(peaks[2:])])  # (2, 2, 64, 48)
    bboxes = np.array([[100.0, 50.0, 96.0, 128.0], [0.0, 0.0, 48.0, 64.0]])

    want = np.asarray(decode_heatmaps(hm, bboxes, use_dark=True))
    got = np.asarray(decode_heatmaps_pallas(hm, bboxes, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_pallas_decode_empty_map_semantics():
    from posepipeline_tpu.ops.pallas_kernels import decode_heatmaps_pallas

    hm = np.zeros((1, 1, 64, 48), np.float32)
    bboxes = np.array([[10.0, 20.0, 48.0, 64.0]])
    want = np.asarray(decode_heatmaps(hm, bboxes, use_dark=True))
    got = np.asarray(decode_heatmaps_pallas(hm, bboxes, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got[0, 0, 2] == 0.0


def test_pallas_decode_subpixel_accuracy():
    from posepipeline_tpu.ops.pallas_kernels import decode_heatmaps_pallas

    true_peaks = np.array([[10.3, 20.7], [30.6, 5.4]])
    hm = make_gaussian_heatmaps(true_peaks)[None]
    bboxes = np.array([[0.0, 0.0, 48.0, 64.0]])
    out = np.asarray(decode_heatmaps_pallas(hm, bboxes, interpret=True))
    err = np.abs(out[0, :, :2] - true_peaks)
    assert err.max() < 0.12, f"subpixel error {err.max()}"
