"""DataJoint blob wire-format (core/djblob.py).

Golden-byte tests pin the mYm array layout to the published format
(protocol, type code, uint64 dims, uint32 mxClassID + is_complex, Fortran
data) so blobs interchange with DataJoint readers/writers byte-for-byte;
roundtrip tests cover the full value space the pipeline stores
(reference stores keypoints/boxes/tracks via DataJoint longblobs,
pipeline.py:506-578)."""

import struct
import zlib
from datetime import datetime
from uuid import uuid4

import numpy as np
import pytest

from posepipeline_tpu.core import blob as ppb1
from posepipeline_tpu.core import djblob


def test_golden_bytes_double_matrix():
    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    raw = djblob.pack(arr, compress=False)
    expected = (b"mYm\0" + b"A"
                + struct.pack("<Q", 2) + struct.pack("<QQ", 2, 2)
                + struct.pack("<II", 6, 0)          # mxDOUBLE_CLASS, real
                + np.asfortranarray(arr).tobytes(order="F"))
    assert raw == expected
    # column-major: [1, 3, 2, 4]
    assert np.frombuffer(raw[-32:], np.float64).tolist() == [1.0, 3.0, 2.0, 4.0]


def test_golden_bytes_uint8_vector_and_logical():
    v = np.arange(5, dtype=np.uint8)
    raw = djblob.pack(v, compress=False)
    assert raw == (b"mYm\0A" + struct.pack("<Q", 1) + struct.pack("<Q", 5)
                   + struct.pack("<II", 9, 0) + v.tobytes())
    b = np.array([True, False, True])
    raw = djblob.pack(b, compress=False)
    assert raw == (b"mYm\0A" + struct.pack("<Q", 1) + struct.pack("<Q", 3)
                   + struct.pack("<II", 3, 0) + b"\x01\x00\x01")
    assert np.array_equal(djblob.unpack(raw), b)
    assert djblob.unpack(raw).dtype == np.bool_


def test_golden_bytes_compression_wrapper():
    arr = np.zeros(4096, np.float64)
    raw = djblob.pack(arr)
    assert raw[:6] == b"ZL123\0"
    inner_len = struct.unpack("<Q", raw[6:14])[0]
    inner = zlib.decompress(raw[14:])
    assert len(inner) == inner_len and inner[:4] == b"mYm\0"
    assert np.array_equal(djblob.unpack(raw), arr)


def test_complex_array_roundtrip():
    arr = (np.random.default_rng(0).normal(size=(3, 4))
           + 1j * np.random.default_rng(1).normal(size=(3, 4)))
    out = djblob.unpack(djblob.pack(arr, compress=False))
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("value", [
    None,
    True,
    42,
    3.5,
    "héllo wörld",
    b"\x00\x01raw",
    [1.0, 2.0, 3.0],
    (1, 2),
    {"a", "b"},
    {"tlbr": np.arange(4.0), "track_id": 7, "name": "p0"},
    [{"kp": np.zeros((17, 3), np.float32)}, {"kp": np.ones((17, 3), np.float32)}],
    datetime(2024, 11, 15, 12, 30, 45, 123456),
])
def test_roundtrip_value_space(value):
    out = djblob.unpack(djblob.pack(value))
    if isinstance(value, (bool, int, float)):
        # scalars come back as 0-d arrays (MATLAB-style) that compare equal
        assert out == value
    else:
        _assert_equal(value, out)


def _assert_equal(a, b):
    if isinstance(a, np.ndarray):
        np.testing.assert_array_equal(a, b)
    elif isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _assert_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _assert_equal(x, y)
    else:
        assert a == b


def test_uuid_roundtrip():
    u = uuid4()
    assert djblob.unpack(djblob.pack(u)) == u


def test_mym_protocol_chosen_for_pure_arrays():
    assert djblob.pack(np.zeros(3), compress=False)[:4] == b"mYm\0"
    assert djblob.pack([np.zeros(3)], compress=False)[:4] == b"dj0\0"


def test_legacy_ppb1_blobs_still_unpack():
    value = {"keypoints": np.arange(12.0).reshape(4, 3), "n": 4}
    raw = ppb1.pack(value)
    out = djblob.unpack(raw)
    np.testing.assert_array_equal(out["keypoints"], value["keypoints"])
    assert out["n"] == 4


def test_nested_tracks_blob_like_reference():
    """The exact shape TrackingBbox stores: per-frame lists of per-track
    dicts (reference pipeline.py:506-578)."""
    tracks = [[{"track_id": t, "tlbr": np.random.rand(4),
                "confidence": 0.9} for t in range(2)] for _ in range(3)]
    out = djblob.unpack(djblob.pack(tracks))
    assert len(out) == 3 and len(out[0]) == 2
    assert out[1][1]["track_id"] == 1
    np.testing.assert_array_equal(out[2][0]["tlbr"], tracks[2][0]["tlbr"])


def test_engine_stores_dj_format(schema):
    """Blob columns written through the engine are dj-format on disk."""
    import sqlite3

    from posepipeline_tpu.core.engine import Manual

    @schema
    class Blobby(Manual):
        definition = """
        id: int
        ---
        data: longblob
        """

    Blobby.insert1({"id": 1, "data": np.arange(6.0).reshape(2, 3)})
    Blobby.insert1({"id": 2, "data": [np.zeros(2), "text", None]})
    con = sqlite3.connect(schema.db_path)
    rows = dict(con.execute(f'SELECT id, data FROM "{Blobby.table_name}"').fetchall())
    con.close()
    assert bytes(rows[1])[:4] == b"mYm\0"
    assert bytes(rows[2])[:4] in (b"dj0\0", b"ZL123"[:4] + b"\0")
    np.testing.assert_array_equal((Blobby & "id=1").fetch1("data"),
                                  np.arange(6.0).reshape(2, 3))
    out = (Blobby & "id=2").fetch1("data")
    assert out[1] == "text" and out[2] is None
