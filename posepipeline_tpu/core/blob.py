"""Binary blob serialization for table attributes of type ``longblob``.

The reference stores numpy arrays, nested dicts/lists and datetime objects as
DataJoint longblobs (mYm/dj0 format) — e.g. ``VideoInfo.timestamps`` is a list of
``datetime`` objects (reference: pose_pipeline/pipeline.py:118) and
``TrackingBbox.tracks`` is a list of dicts of numpy arrays
(pose_pipeline/pipeline.py:506-578).

This module provides an equivalent self-describing, versioned binary format
(``PPB1``) that round-trips the same Python value space without using pickle
(no arbitrary code execution on load). Supported values:

- ``None``, ``bool``, ``int``, ``float``, ``complex``, ``str``, ``bytes``
- ``datetime.datetime``, ``datetime.timedelta``
- numpy scalars and ndarrays of any numeric/bool dtype (C-contiguous copy)
- ``list`` / ``tuple`` / ``dict`` (string or scalar keys), nested arbitrarily
"""

from __future__ import annotations

import io
import struct
from datetime import datetime, timedelta

import numpy as np

MAGIC = b"PPB1"

# one-byte type tags
_T_NONE = b"N"
_T_TRUE = b"T"
_T_FALSE = b"F"
_T_INT = b"i"
_T_FLOAT = b"f"
_T_COMPLEX = b"c"
_T_STR = b"s"
_T_BYTES = b"b"
_T_DATETIME = b"D"
_T_TIMEDELTA = b"d"
_T_ARRAY = b"A"
_T_LIST = b"L"
_T_TUPLE = b"U"
_T_DICT = b"M"
_T_NPSCALAR = b"n"


def _w_u64(f: io.BytesIO, v: int) -> None:
    f.write(struct.pack("<Q", v))


def _r_u64(f: io.BytesIO) -> int:
    return struct.unpack("<Q", f.read(8))[0]


def _pack_into(f: io.BytesIO, v) -> None:
    if v is None:
        f.write(_T_NONE)
    elif isinstance(v, bool) or isinstance(v, np.bool_):
        f.write(_T_TRUE if v else _T_FALSE)
    elif isinstance(v, (int, np.integer)) and not isinstance(v, np.generic):
        f.write(_T_INT)
        f.write(struct.pack("<q", int(v)))
    elif isinstance(v, float):
        f.write(_T_FLOAT)
        f.write(struct.pack("<d", v))
    elif isinstance(v, complex):
        f.write(_T_COMPLEX)
        f.write(struct.pack("<dd", v.real, v.imag))
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        f.write(_T_STR)
        _w_u64(f, len(raw))
        f.write(raw)
    elif isinstance(v, (bytes, bytearray)):
        f.write(_T_BYTES)
        _w_u64(f, len(v))
        f.write(bytes(v))
    elif isinstance(v, datetime):
        f.write(_T_DATETIME)
        raw = v.isoformat().encode("utf-8")
        _w_u64(f, len(raw))
        f.write(raw)
    elif isinstance(v, timedelta):
        f.write(_T_TIMEDELTA)
        f.write(struct.pack("<d", v.total_seconds()))
    elif isinstance(v, np.generic):
        # numpy scalar: keep dtype
        f.write(_T_NPSCALAR)
        dt = np.dtype(v.dtype).str.encode("ascii")
        _w_u64(f, len(dt))
        f.write(dt)
        raw = np.asarray(v).tobytes()
        _w_u64(f, len(raw))
        f.write(raw)
    elif isinstance(v, np.ndarray):
        if v.dtype == object:
            # object arrays are serialized as nested lists (shape preserved)
            f.write(_T_LIST)
            _w_u64(f, 2)
            _pack_into(f, "__object_array__")
            _pack_into(f, v.tolist())
            return
        f.write(_T_ARRAY)
        arr = np.ascontiguousarray(v)
        dt = arr.dtype.str.encode("ascii")
        _w_u64(f, len(dt))
        f.write(dt)
        _w_u64(f, arr.ndim)
        for s in arr.shape:
            _w_u64(f, s)
        raw = arr.tobytes()
        _w_u64(f, len(raw))
        f.write(raw)
    elif isinstance(v, (list, tuple)):
        f.write(_T_LIST if isinstance(v, list) else _T_TUPLE)
        _w_u64(f, len(v))
        for item in v:
            _pack_into(f, item)
    elif isinstance(v, dict):
        f.write(_T_DICT)
        _w_u64(f, len(v))
        for k, item in v.items():
            _pack_into(f, k)
            _pack_into(f, item)
    else:
        # numpy ints that subclass np.generic are handled above; anything else
        # we attempt to coerce through numpy for safety.
        arr = np.asarray(v)
        if arr.dtype == object:
            raise TypeError(f"Cannot serialize value of type {type(v)!r} to blob")
        _pack_into(f, arr)


def _unpack_from(f: io.BytesIO):
    tag = f.read(1)
    if tag == _T_NONE:
        return None
    if tag == _T_TRUE:
        return True
    if tag == _T_FALSE:
        return False
    if tag == _T_INT:
        return struct.unpack("<q", f.read(8))[0]
    if tag == _T_FLOAT:
        return struct.unpack("<d", f.read(8))[0]
    if tag == _T_COMPLEX:
        re, im = struct.unpack("<dd", f.read(16))
        return complex(re, im)
    if tag == _T_STR:
        n = _r_u64(f)
        return f.read(n).decode("utf-8")
    if tag == _T_BYTES:
        n = _r_u64(f)
        return f.read(n)
    if tag == _T_DATETIME:
        n = _r_u64(f)
        return datetime.fromisoformat(f.read(n).decode("utf-8"))
    if tag == _T_TIMEDELTA:
        return timedelta(seconds=struct.unpack("<d", f.read(8))[0])
    if tag == _T_NPSCALAR:
        n = _r_u64(f)
        dt = np.dtype(f.read(n).decode("ascii"))
        ln = _r_u64(f)
        return np.frombuffer(f.read(ln), dtype=dt)[0]
    if tag == _T_ARRAY:
        n = _r_u64(f)
        dt = np.dtype(f.read(n).decode("ascii"))
        ndim = _r_u64(f)
        shape = tuple(_r_u64(f) for _ in range(ndim))
        ln = _r_u64(f)
        return np.frombuffer(f.read(ln), dtype=dt).reshape(shape).copy()
    if tag in (_T_LIST, _T_TUPLE):
        n = _r_u64(f)
        items = [_unpack_from(f) for _ in range(n)]
        return items if tag == _T_LIST else tuple(items)
    if tag == _T_DICT:
        n = _r_u64(f)
        out = {}
        for _ in range(n):
            k = _unpack_from(f)
            out[k] = _unpack_from(f)
        return out
    raise ValueError(f"Corrupt blob: unknown tag {tag!r}")


def pack(value) -> bytes:
    """Serialize a Python value to a versioned binary blob."""
    f = io.BytesIO()
    f.write(MAGIC)
    _pack_into(f, value)
    return f.getvalue()


def unpack(raw: bytes):
    """Deserialize a blob created by :func:`pack`."""
    f = io.BytesIO(raw)
    magic = f.read(4)
    if magic != MAGIC:
        raise ValueError(f"Not a PPB1 blob (magic={magic!r})")
    return _unpack_from(f)
