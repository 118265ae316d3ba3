"""First-party NASA CDF v3 reader (the subset H3.6M pose files need).

The reference imports raw Human3.6M ground truth through spacepy's pycdf
(reference demo/h36_dj.py:118-213); neither spacepy nor cdflib is a
baked-in dependency here, so raw-layout ingestion would otherwise require
an install the image forbids. This module parses the CDF internal format
directly from the public specification (NASA CDF Internal Format
Description, v3.x): enough to read numeric zVariables — uncompressed
(VVR), gzip-compressed per-block (CVVR), and whole-file compressed (CCR)
— which covers every Poses_D2_Positions / Poses_D3_Positions file in the
dataset.

Scope intentionally excluded (raise cleanly): VAX floating encodings,
sparse records, EPOCH16/TT2000 time types, rVariables, attributes.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Tuple

import numpy as np

_MAGIC_V3 = 0xCDF30001
_MAGIC_UNCOMPRESSED = 0x0000FFFF
_MAGIC_COMPRESSED = 0xCCCC0001

# record types
_CDR, _GDR, _RVDR, _ADR = 1, 2, 3, 4
_VXR, _VVR, _ZVDR, _CCR, _CPR, _CVVR = 6, 7, 8, 10, 11, 13

# CDF data type -> numpy dtype character (byte order applied separately)
_DTYPES = {
    1: "i1", 2: "i2", 4: "i4", 8: "i8",
    11: "u1", 12: "u2", 14: "u4",
    21: "f4", 22: "f8", 31: "f8",   # REAL4, REAL8, EPOCH
    41: "i1", 44: "f4", 45: "f8",
    51: "S1", 52: "S1",
}

# encodings whose values are little-endian (VAX float encodings 3/14/15
# are NOT plain IEEE and are rejected below)
_LITTLE = {4, 6, 13, 16, 17, 19, 20}
_BIG = {1, 2, 5, 7, 9, 11, 12, 18}
_VAX = {3, 14, 15}


class CDFFormatError(ValueError):
    pass


def _u4(buf: bytes, off: int) -> int:
    return struct.unpack_from(">i", buf, off)[0]


def _u8(buf: bytes, off: int) -> int:
    return struct.unpack_from(">q", buf, off)[0]


def _decompress_file(data: bytes) -> bytes:
    """Whole-file compression: magic + CCR wrapping the internal records.

    The CCR's data, once inflated, is the byte stream that follows the
    8-byte magic of the equivalent uncompressed file; re-assemble that
    file so the rest of the parser has one layout to handle.
    """
    # CCR: size(8) type(4) CPRoffset(8) uSize(8) rfuA(4) data...
    off = 8
    rec_size = _u8(data, off)
    rec_type = _u4(data, off + 8)
    if rec_type != _CCR:
        raise CDFFormatError(f"expected CCR after compressed magic, got {rec_type}")
    cpr_offset = _u8(data, off + 12)
    header = 8 + 4 + 8 + 8 + 4
    comp = data[off + header: off + rec_size]
    # CPR tells the algorithm; only GZIP (5) is supported
    ctype = _u4(data, cpr_offset + 12)
    if ctype != 5:
        raise CDFFormatError(f"unsupported file compression type {ctype}")
    inner = zlib.decompress(comp, 47)  # zlib|gzip auto-detect
    magic = struct.pack(">II", _MAGIC_V3, _MAGIC_UNCOMPRESSED)
    return magic + inner


class CDFReader:
    """Parses a CDF v3 file; exposes numeric zVariables as numpy arrays."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        if len(data) < 16:
            raise CDFFormatError("file too short for CDF")
        m1, m2 = struct.unpack_from(">II", data, 0)
        if m1 != _MAGIC_V3:
            raise CDFFormatError(
                f"not a CDF v3 file (magic {m1:#x}); v2.x is unsupported")
        if m2 == _MAGIC_COMPRESSED:
            data = _decompress_file(data)
        elif m2 != _MAGIC_UNCOMPRESSED:
            raise CDFFormatError(f"unrecognized CDF magic suffix {m2:#x}")
        self._buf = data
        self._parse_cdr_gdr()
        self._vars = self._scan_zvars()

    # -- layout ----------------------------------------------------------

    def _parse_cdr_gdr(self):
        buf = self._buf
        cdr_off = 8
        if _u4(buf, cdr_off + 8) != _CDR:
            raise CDFFormatError("CDR not found at offset 8")
        gdr_off = _u8(buf, cdr_off + 12)
        encoding = _u4(buf, cdr_off + 28)
        flags = _u4(buf, cdr_off + 32)
        if encoding in _VAX:
            raise CDFFormatError(f"VAX encoding {encoding} not supported")
        if encoding in _LITTLE:
            self._bo = "<"
        elif encoding in _BIG:
            self._bo = ">"
        else:
            raise CDFFormatError(f"unknown CDF encoding {encoding}")
        self._row_major = bool(flags & 0x1)
        if _u4(buf, gdr_off + 8) != _GDR:
            raise CDFFormatError("GDR offset does not point at a GDR")
        self._zvdr_head = _u8(buf, gdr_off + 20)
        self._num_zvars = _u4(buf, gdr_off + 60)

    def _scan_zvars(self) -> Dict[str, int]:
        buf = self._buf
        out: Dict[str, int] = {}
        off = self._zvdr_head
        while off:
            if _u4(buf, off + 8) != _ZVDR:
                raise CDFFormatError(f"bad zVDR link at {off}")
            # zVDR: size(8) type(4) next(8) dataType(4) maxRec(4) VXRhead(8)
            #       VXRtail(8) flags(4) sRecords(4) rfuB(4) rfuC(4) rfuF(4)
            #       numElems(4) num(4) CPRorSPR(8) blocking(4) name(256)...
            name = buf[off + 84: off + 84 + 256].split(b"\x00", 1)[0]
            out[name.decode("ascii", "replace")] = off
            off = _u8(buf, off + 12)
        return out

    @property
    def variables(self) -> List[str]:
        return list(self._vars)

    # -- data ------------------------------------------------------------

    def varget(self, name: str) -> np.ndarray:
        """Full record range of one zVariable → (n_records, *dims)."""
        buf = self._buf
        try:
            off = self._vars[name]
        except KeyError:
            raise KeyError(
                f"variable {name!r} not in CDF (has: {self.variables})")
        data_type = _u4(buf, off + 20)
        max_rec = _u4(buf, off + 24)
        vxr_head = _u8(buf, off + 28)
        flags = _u4(buf, off + 44)
        s_records = _u4(buf, off + 48)
        num_elems = _u4(buf, off + 64)
        cpr_off = _u8(buf, off + 72)
        ndims_off = off + 84 + 256
        zndims = _u4(buf, ndims_off)
        dim_sizes = [_u4(buf, ndims_off + 4 + 4 * i) for i in range(zndims)]
        dim_varys = [_u4(buf, ndims_off + 4 + 4 * zndims + 4 * i)
                     for i in range(zndims)]
        if s_records:
            raise CDFFormatError("sparse records not supported")
        if data_type not in _DTYPES:
            raise CDFFormatError(f"unsupported CDF data type {data_type}")
        base = _DTYPES[data_type]
        dtype = np.dtype(base if base.startswith("S") else self._bo + base)
        rec_dims = [d for d, v in zip(dim_sizes, dim_varys) if v]
        vals_per_rec = int(np.prod(rec_dims, dtype=np.int64)) if rec_dims else 1
        if base.startswith("S"):
            vals_per_rec *= num_elems
        n_rec = max_rec + 1
        if n_rec <= 0:
            shape = [0] + rec_dims
            return np.empty(shape, dtype)
        rec_bytes = vals_per_rec * dtype.itemsize
        compressed = bool(flags & 0x4)
        ctype = _u4(buf, cpr_off + 12) if (compressed and cpr_off) else None
        if compressed and ctype != 5:
            raise CDFFormatError(f"unsupported variable compression {ctype}")
        out = np.zeros(n_rec * vals_per_rec, dtype)
        self._walk_vxr(vxr_head, out, rec_bytes, dtype, vals_per_rec,
                       compressed)
        arr = out.reshape([n_rec] + rec_dims)
        if rec_dims and not self._row_major:
            # column-majority: per-record values are stored fastest-first
            arr = arr.reshape([n_rec] + rec_dims[::-1])
            arr = np.moveaxis(arr, range(1, 1 + len(rec_dims)),
                              range(len(rec_dims), 0, -1))
        return arr

    def _walk_vxr(self, off, out, rec_bytes, dtype, vals_per_rec,
                  compressed):
        buf = self._buf
        while off:
            if _u4(buf, off + 8) != _VXR:
                raise CDFFormatError(f"bad VXR link at {off}")
            nxt = _u8(buf, off + 12)
            n_entries = _u4(buf, off + 20)
            n_used = _u4(buf, off + 24)
            first_off = off + 28
            last_off = first_off + 4 * n_entries
            ptr_off = last_off + 4 * n_entries
            for i in range(n_used):
                first = _u4(buf, first_off + 4 * i)
                last = _u4(buf, last_off + 4 * i)
                child = _u8(buf, ptr_off + 8 * i)
                child_type = _u4(buf, child + 8)
                if child_type == _VXR:       # nested index tree
                    self._walk_vxr(child, out, rec_bytes, dtype,
                                   vals_per_rec, compressed)
                    continue
                n_recs = last - first + 1
                want = n_recs * rec_bytes
                if child_type == _VVR:
                    raw = buf[child + 12: child + 12 + want]
                elif child_type == _CVVR:
                    csize = _u8(buf, child + 16)
                    raw = zlib.decompress(
                        buf[child + 24: child + 24 + csize], 47)[:want]
                else:
                    raise CDFFormatError(
                        f"VXR entry points at record type {child_type}")
                if len(raw) < want:
                    raise CDFFormatError("variable data truncated")
                vals = np.frombuffer(raw, dtype, count=n_recs * vals_per_rec)
                out[first * vals_per_rec:(last + 1) * vals_per_rec] = vals
            off = nxt


def read_cdf_variable(path: str, name: str) -> np.ndarray:
    """One-shot helper: read a single numeric zVariable from a CDF file."""
    return CDFReader(path).varget(name)
