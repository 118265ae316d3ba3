"""Managed file store for ``attach@<store>`` attributes.

Reference semantics (DataJoint external/attach storage, used for every video
artifact: reference pose_pipeline/pipeline.py:30 ``video : attach@localattach``):

- on ``insert``: the file at the given path is *copied into the store* and the
  row records a store-relative reference,
- on ``fetch``: the file is *materialized into a scratch location* and the
  absolute path of that copy is returned; callers own (and often delete) it
  (e.g. ``os.remove(video)`` at reference pipeline.py:124).

Files are content-addressed (sha1 of contents) so repeated inserts of identical
files are deduplicated and references are stable across machines sharing the
store directory.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile


class FileStore:
    def __init__(self, location: str):
        self.location = location
        os.makedirs(location, exist_ok=True)

    def put(self, filepath: str) -> str:
        """Copy ``filepath`` into the store; return the store-relative reference."""
        h = hashlib.sha1()
        with open(filepath, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        digest = h.hexdigest()
        basename = os.path.basename(filepath)
        rel = os.path.join(digest[:2], f"{digest}-{basename}")
        dest = os.path.join(self.location, rel)
        if not os.path.exists(dest):
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            tmp = dest + ".part"
            shutil.copyfile(filepath, tmp)
            os.replace(tmp, dest)  # atomic publish
        return rel

    def get(self, ref: str, download_dir: str | None = None) -> str:
        """Materialize a stored file into a scratch copy; return its path.

        The caller owns the returned file (mirrors DataJoint attach fetch).
        """
        src = os.path.join(self.location, ref)
        if not os.path.isfile(src):
            raise FileNotFoundError(f"store reference {ref!r} missing at {src}")
        basename = ref.split("-", 1)[1] if "-" in os.path.basename(ref) else os.path.basename(ref)
        suffix = os.path.splitext(basename)[1] or ".bin"
        if download_dir is None:
            fd, out = tempfile.mkstemp(suffix=suffix)
            os.close(fd)
        else:
            os.makedirs(download_dir, exist_ok=True)
            out = os.path.join(download_dir, os.path.basename(basename))
        shutil.copyfile(src, out)
        return out

    def path(self, ref: str) -> str:
        """Absolute in-store path (read-only use; does not copy)."""
        return os.path.join(self.location, ref)
