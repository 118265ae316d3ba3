"""DataJoint-compatible blob serialization (``mYm``/``dj0`` wire format).

SURVEY §7 "Hard parts" requires that notebooks written against the reference
can ``fetch1()`` stored blobs unchanged. The reference delegates blob
serialization to DataJoint (reference ``pose_pipeline/pipeline.py`` stores
keypoints/boxes/tracks as longblobs; store layout in
``Example_dj_local_conf.json:17-22``). This module re-implements that wire
format from its public specification — the ``mYm`` serialization introduced
by datajoint-matlab's mYm MEX layer and the ``dj0`` extension used by
datajoint-python — so blobs written here parse in datajoint-python and
vice versa. It is a from-scratch implementation of the *format*, not a copy
of either codebase.

Wire format
-----------
``blob := [compression] protocol item``

* compression (optional): ``b"ZL123\\0"`` + uint64-LE byte length of the
  decompressed ``protocol item`` + zlib stream of it.
* protocol: ``b"mYm\\0"`` (MATLAB-compatible subset) or ``b"dj0\\0"``
  (adds python-native container/scalar codes).
* item: 1-byte type code + body. Inside containers every nested item is
  preceded by a uint64-LE byte count (so readers can skip unknown codes);
  the top-level item runs to the end of the buffer.

Type codes
----------
mYm subset (MATLAB mxClassID numbering for array dtypes):

* ``A`` — dense numeric/logical/char array: uint64 ndim, ndim×uint64 shape,
  uint32 dtype-id (mxClassID), uint32 is_complex, raw data in Fortran
  (column-major) order, imaginary part appended when complex.
* ``C`` — cell array: uint64 ndim, shape, then n_elem length-prefixed items.
* ``S`` — struct array: uint64 ndim, shape, uint32 n_field, n_field
  zero-terminated field names, then n_elem×n_field length-prefixed items.

dj0 extension:

* ``\\xff`` None · ``\\x01`` tuple · ``\\x02`` list · ``\\x03`` set ·
  ``\\x04`` dict · ``\\x05`` utf-8 str · ``\\x06`` raw bytes ·
  ``t`` datetime (isoformat utf-8) · ``u`` UUID (16 bytes).

Numeric **scalars** (python int/float/complex/bool and numpy scalars) are
written as 0-d ``A`` arrays — readable by any consumer of the format; numpy
returns them as 0-d arrays, which compare equal to the original scalar.

Byte-compatibility confidence is tiered and tested accordingly
(tests/test_djblob.py): the mYm array/cell/struct subset and the ZL123
compression wrapper follow the published format exactly (golden-byte
tests); the dj0 python-type codes follow datajoint-python's published code
assignments and container framing. ``unpack`` also accepts this package's
legacy ``PPB1`` blobs (core/blob.py) for databases written before this
module became the default.
"""

from __future__ import annotations

import io
import struct
import zlib
from datetime import datetime
from uuid import UUID

import numpy as np

PROTO_MYM = b"mYm\0"
PROTO_DJ0 = b"dj0\0"
ZLIB_MAGIC = b"ZL123\0"

# MATLAB mxClassID → numpy dtype (index == class id)
_MX_DTYPES = [
    None,                # 0 unknown
    None,                # 1 cell
    None,                # 2 struct
    np.dtype(np.bool_),  # 3 logical (stored as uint8)
    None,                # 4 char (utf-16-ish, handled specially)
    None,                # 5 void
    np.dtype(np.float64),   # 6
    np.dtype(np.float32),   # 7
    np.dtype(np.int8),      # 8
    np.dtype(np.uint8),     # 9
    np.dtype(np.int16),     # 10
    np.dtype(np.uint16),    # 11
    np.dtype(np.int32),     # 12
    np.dtype(np.uint32),    # 13
    np.dtype(np.int64),     # 14
    np.dtype(np.uint64),    # 15
]
_MX_ID = {dt: i for i, dt in enumerate(_MX_DTYPES) if dt is not None}
_MX_LOGICAL, _MX_CHAR = 3, 4


def _u64(v: int) -> bytes:
    return struct.pack("<Q", v)


def _u32(v: int) -> bytes:
    return struct.pack("<I", v)


class _Packer:
    def __init__(self):
        self.protocol = PROTO_MYM

    def _dj0(self):
        self.protocol = PROTO_DJ0

    def item(self, v) -> bytes:
        # --- mYm-representable values -----------------------------------
        if isinstance(v, np.ndarray) and v.dtype.fields is None and v.dtype != object:
            return self.array(v)
        if v is None:
            self._dj0()
            return b"\xff"
        if isinstance(v, (bool, np.bool_)):
            return self.array(np.asarray(v))
        if isinstance(v, (int, np.integer)):
            return self.array(np.asarray(v, np.int64))
        if isinstance(v, (float, np.floating)):
            return self.array(np.asarray(v, np.float64))
        if isinstance(v, (complex, np.complexfloating)):
            return self.array(np.asarray(v, np.complex128))
        # --- dj0 extension ----------------------------------------------
        if isinstance(v, str):
            self._dj0()
            return b"\x05" + v.encode("utf-8")
        if isinstance(v, (bytes, bytearray)):
            self._dj0()
            return b"\x06" + bytes(v)
        if isinstance(v, datetime):
            self._dj0()
            return b"t" + v.isoformat().encode("utf-8")
        if isinstance(v, UUID):
            self._dj0()
            return b"u" + v.bytes
        if isinstance(v, tuple):
            return self.sequence(b"\x01", v)
        if isinstance(v, list):
            return self.sequence(b"\x02", v)
        if isinstance(v, (set, frozenset)):
            return self.sequence(b"\x03", sorted(v, key=repr))
        if isinstance(v, dict):
            self._dj0()
            out = [b"\x04", _u64(len(v))]
            for k, val in v.items():
                kb = self.item(k)
                vb = self.item(val)
                out += [_u64(len(kb)), kb, _u64(len(vb)), vb]
            return b"".join(out)
        if isinstance(v, np.ndarray) and v.dtype == object:
            # object arrays → MATLAB cell arrays (shape preserved)
            return self.cell(v)
        raise TypeError(f"Cannot serialize value of type {type(v)!r} to dj blob")

    def sequence(self, code: bytes, seq) -> bytes:
        self._dj0()
        out = [code, _u64(len(seq))]
        for item in seq:
            b = self.item(item)
            out += [_u64(len(b)), b]
        return b"".join(out)

    def array(self, arr: np.ndarray) -> bytes:
        is_complex = np.iscomplexobj(arr)
        if is_complex:
            real, imag = np.real(arr), np.imag(arr)
        else:
            real, imag = arr, None
        if real.dtype == np.bool_:
            mx_id, data = _MX_LOGICAL, np.ascontiguousarray(real, np.uint8)
        else:
            dt = np.dtype(real.dtype)
            if dt not in _MX_ID:
                # non-native width (e.g. float16/longdouble): widen to double
                data = real.astype(np.float64)
                mx_id = _MX_ID[np.dtype(np.float64)]
            else:
                mx_id, data = _MX_ID[dt], real
        head = (b"A" + _u64(data.ndim)
                + b"".join(_u64(s) for s in data.shape)
                + _u32(mx_id) + _u32(1 if is_complex else 0))
        body = np.asfortranarray(data).tobytes(order="F")
        if is_complex:
            body += np.asfortranarray(imag.astype(data.dtype)).tobytes(order="F")
        return head + body

    def cell(self, arr: np.ndarray) -> bytes:
        items = []
        for v in arr.reshape(-1, order="F"):
            b = self.item(v)
            items += [_u64(len(b)), b]
        return (b"C" + _u64(arr.ndim) + b"".join(_u64(s) for s in arr.shape)
                + b"".join(items))


def pack(value, compress: bool = True) -> bytes:
    """Serialize ``value`` to a DataJoint-format blob.

    Blobs >1000 bytes are zlib-wrapped when that actually shrinks them
    (the same threshold/no-regression rule the format's other writers use).
    """
    p = _Packer()
    payload = p.item(value)
    out = p.protocol + payload
    if compress and len(out) > 1000:
        z = ZLIB_MAGIC + _u64(len(out)) + zlib.compress(out)
        if len(z) < len(out):
            out = z
    return out


class _Reader:
    def __init__(self, buf: bytes, protocol: bytes):
        self.f = io.BytesIO(buf)
        self.n = len(buf)
        self.protocol = protocol

    def u64(self) -> int:
        return struct.unpack("<Q", self.f.read(8))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.f.read(4))[0]

    def cstring(self) -> str:
        out = bytearray()
        while True:
            c = self.f.read(1)
            if c in (b"", b"\0"):
                return out.decode("utf-8")
            out += c

    def item(self, n_bytes: int | None = None):
        """Read one item. ``n_bytes`` is the container-provided span; the
        top-level item spans the rest of the buffer."""
        end = (self.f.tell() + n_bytes) if n_bytes is not None else self.n
        code = self.f.read(1)
        if code == b"A":
            return self.array(end)
        if code == b"C":
            return self.cell()
        if code == b"S":
            return self.struct()
        if code == b"P":
            return self.sparse()
        if code == b"\xff":
            return None
        if code == b"\x01":
            return tuple(self.seq())
        if code == b"\x02":
            return self.seq()
        if code == b"\x03":
            return set(self.seq())
        if code == b"\x04":
            n = self.u64()
            out = {}
            for _ in range(n):
                k = self.item(self.u64())
                out[_hashable(k)] = self.item(self.u64())
            return out
        if code == b"\x05":
            return self.f.read(end - self.f.tell()).decode("utf-8")
        if code == b"\x06":
            return self.f.read(end - self.f.tell())
        if code == b"t":
            return datetime.fromisoformat(
                self.f.read(end - self.f.tell()).decode("utf-8"))
        if code == b"u":
            return UUID(bytes=self.f.read(16))
        raise ValueError(f"Unknown dj blob type code {code!r}")

    def seq(self) -> list:
        n = self.u64()
        return [self.item(self.u64()) for _ in range(n)]

    def array(self, end: int):
        ndim = self.u64()
        shape = tuple(self.u64() for _ in range(ndim))
        n_elem = int(np.prod(shape)) if shape else 1
        mx_id = self.u32()
        is_complex = self.u32()
        if mx_id == _MX_CHAR:
            # MATLAB char data: stored as uint16 code units by mYm writers
            raw = self.f.read(end - self.f.tell())
            width = 2 if len(raw) == 2 * n_elem else 1
            codes = np.frombuffer(raw[: n_elem * width],
                                  dtype=np.uint16 if width == 2 else np.uint8)
            return "".join(chr(int(c)) for c in codes)
        dtype = _MX_DTYPES[mx_id]
        if dtype is None:
            raise ValueError(f"Unsupported mxClassID {mx_id}")
        read_dt = np.uint8 if mx_id == _MX_LOGICAL else dtype
        data = np.frombuffer(self.f.read(n_elem * read_dt.itemsize if mx_id != _MX_LOGICAL
                                         else n_elem), dtype=read_dt)
        if mx_id == _MX_LOGICAL:
            data = data.astype(np.bool_)
        if is_complex:
            imag = np.frombuffer(self.f.read(n_elem * read_dt.itemsize), dtype=read_dt)
            data = data + 1j * imag
        return data.reshape(shape, order="F").copy() if shape else data.reshape(()).copy()

    def cell(self):
        ndim = self.u64()
        shape = tuple(self.u64() for _ in range(ndim))
        n_elem = int(np.prod(shape)) if shape else 1
        items = [self.item(self.u64()) for _ in range(n_elem)]
        if len(shape) <= 1 or (np.asarray(shape) > 1).sum() <= 1:
            return items  # vector cells read back as python lists
        arr = np.empty(n_elem, dtype=object)
        arr[:] = items
        return arr.reshape(shape, order="F")

    def struct(self):
        ndim = self.u64()
        shape = tuple(self.u64() for _ in range(ndim))
        n_elem = int(np.prod(shape)) if shape else 1
        n_field = self.u32()
        names = [self.cstring() for _ in range(n_field)]
        elems = []
        for _ in range(n_elem):
            elems.append({name: self.item(self.u64()) for name in names})
        return elems[0] if n_elem == 1 else elems

    def sparse(self):
        raise ValueError("Sparse mYm arrays are not supported")


def _hashable(k):
    if isinstance(k, np.ndarray) and k.ndim == 0:
        return k.item()
    return k


def unpack(raw: bytes):
    """Deserialize a DataJoint-format (or legacy PPB1) blob."""
    if raw[:4] == b"PPB1":
        from . import blob as ppb1
        return ppb1.unpack(raw)
    if raw[: len(ZLIB_MAGIC)] == ZLIB_MAGIC:
        n = struct.unpack("<Q", raw[len(ZLIB_MAGIC): len(ZLIB_MAGIC) + 8])[0]
        raw = zlib.decompress(raw[len(ZLIB_MAGIC) + 8:])
        if len(raw) != n:
            raise ValueError(f"Corrupt compressed blob: {len(raw)} != {n}")
    proto = raw[:4]
    if proto not in (PROTO_MYM, PROTO_DJ0):
        raise ValueError(f"Not a dj blob (protocol={proto!r})")
    return _Reader(raw[4:], proto).item()
