"""First-party CDF v3 reader vs hand-assembled files.

The builder below writes CDF binaries directly from the NASA CDF Internal
Format Description (record layouts spelled out field by field, independent
of the reader's parsing tables), covering the shapes H3.6M pose files
use: uncompressed VVRs, gzip CVVRs, whole-file CCR compression, both
byte orders, and both majorities.
"""

import struct
import zlib

import numpy as np
import pytest


def _rec(rtype: int, body: bytes) -> bytes:
    return struct.pack(">qi", 8 + 4 + len(body), rtype) + body


def build_cdf(values: np.ndarray, *, encoding=6, row_major=True,
              var_compress=False, file_compress=False,
              records_per_block=2, data_type=45, name=b"Pose") -> bytes:
    """values: (n_rec, d0, d1) float64 → a complete CDF v3 byte string."""
    n_rec, *dims = values.shape
    bo = "<" if encoding in (4, 6, 13, 16, 17) else ">"
    if row_major:
        payload = values
    else:  # column-majority: fastest-varying index is the FIRST dimension
        axes = (0,) + tuple(range(values.ndim - 1, 0, -1))
        payload = np.transpose(values, axes)
    np_dtype = {45: "f8", 44: "f4", 22: "f8", 21: "f4", 4: "i4"}[data_type]
    rec_stream = np.ascontiguousarray(payload).astype(bo + np_dtype).tobytes()
    rec_bytes = values[0].size * int(np_dtype[1])

    # --- data blocks (VVR or CVVR) + the VXR that indexes them ---------
    blocks = []
    spans = []
    for first in range(0, n_rec, records_per_block):
        last = min(first + records_per_block, n_rec) - 1
        raw = rec_stream[first * rec_bytes:(last + 1) * rec_bytes]
        if var_compress:
            comp = zlib.compress(raw)
            body = struct.pack(">iq", 0, len(comp)) + comp
            blocks.append(_rec(13, body))                       # CVVR
        else:
            blocks.append(_rec(7, raw))                          # VVR
        spans.append((first, last))

    # Layout (offsets relative to file start, magic = 8 bytes):
    # CDR, GDR, [CPR], zVDR, VXR, data blocks...
    cdr_body_len = 8 + 4 + 4 + 4 + 4 + 4 + 4 + 4 + 4 + 4 + 256
    cdr_len = 12 + cdr_body_len
    gdr_body_len = 8 + 8 + 8 + 8 + 4 + 4 + 4 + 4 + 4 + 8 + 4 + 4 + 4
    gdr_len = 12 + gdr_body_len
    cpr = _rec(11, struct.pack(">iiii", 5, 0, 1, 6)) if var_compress else b""
    zndims = len(dims)
    zvdr_body_len = (8 + 4 + 4 + 8 + 8 + 4 + 4 + 4 + 4 + 4 + 4 + 4 + 8 +
                     4 + 256 + 4 + 4 * zndims + 4 * zndims)
    zvdr_len = 12 + zvdr_body_len
    n_entries = len(spans)
    vxr_len = 12 + 8 + 4 + 4 + n_entries * (4 + 4 + 8)

    off_cdr = 8
    off_gdr = off_cdr + cdr_len
    off_cpr = off_gdr + gdr_len
    off_zvdr = off_cpr + len(cpr)
    off_vxr = off_zvdr + zvdr_len
    off_data = off_vxr + vxr_len
    data_offsets = []
    o = off_data
    for b in blocks:
        data_offsets.append(o)
        o += len(b)
    eof = o

    flags_cdr = (1 if row_major else 0) | 2      # majority | single-file
    cdr = _rec(1, struct.pack(">qiiiiiiiii", off_gdr, 3, 8, encoding,
                              flags_cdr, 0, 0, 0, 2, 0) + b"\x00" * 256)
    gdr = _rec(2, struct.pack(">qqqqiiiiiqiii", 0, off_zvdr, 0, eof,
                              0, 0, -1, 0, 1, 0, 0, 0, 0))
    vdr_flags = 1 | (4 if var_compress else 0)   # record variance | comp
    zvdr = _rec(8, struct.pack(">qiiqqiiiiiiiqi", 0, data_type, n_rec - 1,
                               off_vxr, off_vxr, vdr_flags, 0, 0, 0, 0,
                               1, 0, off_cpr if var_compress else 0, 4)
                + name.ljust(256, b"\x00")
                + struct.pack(">i", zndims)
                + b"".join(struct.pack(">i", d) for d in
                           (dims if row_major else dims))
                + b"".join(struct.pack(">i", 1) for _ in dims))
    vxr = _rec(6, struct.pack(">qii", 0, n_entries, n_entries)
               + b"".join(struct.pack(">i", f) for f, _ in spans)
               + b"".join(struct.pack(">i", l) for _, l in spans)
               + b"".join(struct.pack(">q", d) for d in data_offsets))

    assert len(cdr) == cdr_len and len(gdr) == gdr_len
    assert len(zvdr) == zvdr_len and len(vxr) == vxr_len
    inner = cdr + gdr + cpr + zvdr + vxr + b"".join(blocks)

    if not file_compress:
        return struct.pack(">II", 0xCDF30001, 0x0000FFFF) + inner
    comp = zlib.compress(inner)
    # CCR at offset 8; its CPR sits right after it
    ccr_len = 12 + 8 + 8 + 4 + len(comp)
    ccr_cpr_off = 8 + ccr_len
    ccr = _rec(10, struct.pack(">qqi", ccr_cpr_off, len(inner), 0) + comp)
    ccr_cpr = _rec(11, struct.pack(">iiii", 5, 0, 1, 6))
    return struct.pack(">II", 0xCDF30001, 0xCCCC0001) + ccr + ccr_cpr


@pytest.fixture
def pose():
    rng = np.random.default_rng(7)
    return rng.normal(size=(5, 32, 3)).astype(np.float64)


def _roundtrip(tmp_path, blob):
    p = tmp_path / "t.cdf"
    p.write_bytes(blob)
    from posepipeline_tpu.demo.cdf_reader import CDFReader

    r = CDFReader(str(p))
    assert r.variables == ["Pose"]
    return r.varget("Pose")


def test_uncompressed_little_endian(tmp_path, pose):
    got = _roundtrip(tmp_path, build_cdf(pose))
    np.testing.assert_array_equal(got, pose)


def test_uncompressed_big_endian(tmp_path, pose):
    got = _roundtrip(tmp_path, build_cdf(pose, encoding=1))
    np.testing.assert_array_equal(got, pose)


def test_column_major(tmp_path, pose):
    got = _roundtrip(tmp_path, build_cdf(pose, row_major=False))
    np.testing.assert_array_equal(got, pose)


def test_gzip_cvvr(tmp_path, pose):
    got = _roundtrip(tmp_path, build_cdf(pose, var_compress=True))
    np.testing.assert_array_equal(got, pose)


def test_whole_file_ccr(tmp_path, pose):
    got = _roundtrip(tmp_path, build_cdf(pose, file_compress=True))
    np.testing.assert_array_equal(got, pose)


def test_multi_block_vxr(tmp_path, pose):
    got = _roundtrip(tmp_path, build_cdf(pose, records_per_block=1))
    np.testing.assert_array_equal(got, pose)


def test_float32_variable(tmp_path, pose):
    p32 = pose.astype(np.float32).astype(np.float64)
    got = _roundtrip(tmp_path, build_cdf(p32, data_type=44))
    # stored as CDF_FLOAT: values round-trip at f32 precision
    np.testing.assert_allclose(got, p32, rtol=0, atol=0)


def test_read_cdf_pose_uses_native_reader(tmp_path, pose):
    """read_cdf_pose must parse a raw-layout file with NO optional deps
    installed (the H3.6M on-disk layout stores Pose as (T, 32*dims))."""
    from posepipeline_tpu.demo.h36m_cameras import read_cdf_pose

    p = tmp_path / "poses.cdf"
    p.write_bytes(build_cdf(pose.reshape(5, 96)))
    got = read_cdf_pose(str(p))
    assert got.shape == (5, 32, 3)
    np.testing.assert_array_equal(got, pose)
    # spacepy-style singleton record axis also normalizes
    p2 = tmp_path / "poses3d.cdf"
    p2.write_bytes(build_cdf(pose.reshape(1, 5, 96)))
    got2 = read_cdf_pose(str(p2))
    assert got2.shape == (5, 32, 3)
    np.testing.assert_array_equal(got2, pose)


def test_rejects_non_cdf(tmp_path):
    from posepipeline_tpu.demo.cdf_reader import CDFFormatError, CDFReader

    p = tmp_path / "bad.cdf"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(CDFFormatError):
        CDFReader(str(p))
