"""Core key-addressed stage engine (DataJoint-semantics over SQLite).

Public surface mirrors the ``datajoint`` API the reference is written against
(reference pose_pipeline/pipeline.py:10 ``import datajoint as dj``):
``Schema`` (as ``schema = Schema(name)``, used as a class decorator),
``Manual`` / ``Lookup`` / ``Computed`` / ``Imported`` table bases, and the
restriction algebra on table classes.
"""

from .config import config, set_database_path, set_store_location
from .engine import (
    AutoPopulate,
    Computed,
    Imported,
    JoinExpression,
    Lookup,
    Manual,
    Not,
    QueryExpression,
    Schema,
    Table,
    key_hash,
)
from . import blob
from .store import FileStore

__all__ = [
    "AutoPopulate",
    "Computed",
    "FileStore",
    "Imported",
    "JoinExpression",
    "Lookup",
    "Manual",
    "Not",
    "QueryExpression",
    "Schema",
    "Table",
    "blob",
    "config",
    "key_hash",
    "set_database_path",
    "set_store_location",
]
