"""Key-addressed stage engine: the TPU framework's replacement for DataJoint.

The reference builds its entire pipeline on DataJoint + MySQL: each processing
stage is a table class (``dj.Manual`` / ``dj.Lookup`` / ``dj.Computed``),
dependencies are foreign keys, and computation happens lazily via
``Table.populate(key)`` calling ``Table.make(key)`` exactly once per key with
cross-machine atomic job reservation (reference pose_pipeline/pipeline.py:15-20,
utils/standard_pipelines.py:31-48).

This module re-provides those semantics natively:

- **Schema**: a named namespace of tables, backed by a single SQLite database in
  WAL mode (replaces the MySQL server at reference
  datajoint_docker/docker-compose.yaml:9). SQLite WAL + ``BEGIN IMMEDIATE``
  gives the same atomic-claim semantics DataJoint gets from InnoDB row locks.
- **Manual / Lookup / Computed / Imported** table base classes with DataJoint
  ``definition`` DDL strings parsed into headings (primary key above ``---``,
  dependent attributes below, ``-> Parent`` foreign keys, ``longblob`` payloads
  serialized via :mod:`.blob`, ``attach@store`` managed files via :mod:`.store`).
- **Restriction algebra**: ``Table & key``, ``Table - other`` (antijoin),
  ``Table * Other`` (natural join), ``.proj()``, ``.fetch()/.fetch1()``.
- **populate()**: ``key_source`` (join of FK parents, minus computed rows)
  iterated with optional atomic job reservation in the ``~jobs`` table;
  errors recorded per key (reference's ``suppress_errors`` behavior).

Everything upstream of the accelerator is deliberately small, pure Python, and
synchronous; the heavy compute lives in the JAX/Pallas layers.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import socket
import sqlite3
import threading
import traceback
from datetime import datetime
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from . import blob as blob_format
from . import djblob
from .config import config as global_config
from .store import FileStore

# ---------------------------------------------------------------------------
# Heading / definition parsing
# ---------------------------------------------------------------------------

_LOGICAL_BLOB = "blob"
_LOGICAL_ATTACH = "attach"
_LOGICAL_TIMESTAMP = "timestamp"
_LOGICAL_PLAIN = "plain"

_TYPE_MAP = [
    (re.compile(r"^varchar\(\d+\)$", re.I), "TEXT", _LOGICAL_PLAIN),
    (re.compile(r"^char\(\d+\)$", re.I), "TEXT", _LOGICAL_PLAIN),
    (re.compile(r"^enum\(.*\)$", re.I), "TEXT", _LOGICAL_PLAIN),
    (re.compile(r"^(tiny|small|medium|big)?int(\(\d+\))?( unsigned)?$", re.I), "INTEGER", _LOGICAL_PLAIN),
    (re.compile(r"^bool(ean)?$", re.I), "INTEGER", _LOGICAL_PLAIN),
    (re.compile(r"^(float|double|decimal(\(.*\))?)$", re.I), "REAL", _LOGICAL_PLAIN),
    (re.compile(r"^(long|medium|tiny)?blob$", re.I), "BLOB", _LOGICAL_BLOB),
    (re.compile(r"^attach(@\w+)?$", re.I), "TEXT", _LOGICAL_ATTACH),
    (re.compile(r"^(timestamp|datetime)(\(\d+\))?$", re.I), "TEXT", _LOGICAL_TIMESTAMP),
    (re.compile(r"^date$", re.I), "TEXT", _LOGICAL_TIMESTAMP),
]


class Attribute:
    __slots__ = ("name", "decl_type", "sql_type", "logical", "in_key", "default", "comment", "store")

    def __init__(self, name, decl_type, sql_type, logical, in_key, default, comment, store=None):
        self.name = name
        self.decl_type = decl_type
        self.sql_type = sql_type
        self.logical = logical
        self.in_key = in_key
        self.default = default
        self.comment = comment
        self.store = store

    def __repr__(self):  # pragma: no cover
        return f"Attribute({self.name}:{self.decl_type}{' KEY' if self.in_key else ''})"


class Heading:
    """Parsed table heading: ordered attributes + foreign-key references."""

    def __init__(self):
        self.attributes: Dict[str, Attribute] = {}
        self.foreign_keys: List[Tuple[str, bool]] = []  # (parent class name, in_key)
        self.comment: str = ""

    @property
    def names(self) -> List[str]:
        return list(self.attributes)

    @property
    def primary_key(self) -> List[str]:
        return [a.name for a in self.attributes.values() if a.in_key]

    @property
    def dependent(self) -> List[str]:
        return [a.name for a in self.attributes.values() if not a.in_key]


_ATTR_RE = re.compile(
    r"^(?P<name>[a-z][a-z0-9_]*)\s*(=\s*(?P<default>[^:]+?)\s*)?:\s*(?P<type>[^#]+?)\s*(#\s*(?P<comment>.*))?$",
    re.I,
)
_FK_RE = re.compile(r"^->\s*(?P<ref>[A-Za-z_][A-Za-z0-9_.]*)\s*(#.*)?$")


def parse_definition(definition: str, resolve) -> Heading:
    """Parse a DataJoint-style ``definition`` string.

    ``resolve(name) -> table class`` maps ``-> Parent`` lines to table classes.
    """
    heading = Heading()
    in_key = True
    for raw in definition.strip().splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("#"):
            if not heading.attributes and not heading.comment:
                heading.comment = line.lstrip("# ")
            continue
        if line.startswith("---") or line.startswith("___"):
            in_key = False
            continue
        fk = _FK_RE.match(line)
        if fk:
            parent_name = fk.group("ref").split(".")[-1]
            parent = resolve(parent_name)
            heading.foreign_keys.append((parent_name, in_key))
            for pk_name in parent.heading.primary_key:
                pa = parent.heading.attributes[pk_name]
                if pk_name not in heading.attributes:
                    heading.attributes[pk_name] = Attribute(
                        pk_name, pa.decl_type, pa.sql_type, pa.logical, in_key, None, pa.comment, pa.store
                    )
                elif in_key:
                    heading.attributes[pk_name].in_key = True
            continue
        m = _ATTR_RE.match(line)
        if not m:
            raise ValueError(f"Cannot parse definition line: {raw!r}")
        name = m.group("name")
        decl_type = m.group("type").strip()
        default = m.group("default")
        comment = (m.group("comment") or "").strip()
        sql_type, logical, store = None, None, None
        for rx, sqlt, logi in _TYPE_MAP:
            if rx.match(decl_type):
                sql_type, logical = sqlt, logi
                break
        if sql_type is None:
            raise ValueError(f"Unsupported attribute type {decl_type!r} for {name!r}")
        if logical == _LOGICAL_ATTACH:
            store = decl_type.split("@")[1] if "@" in decl_type else "localattach"
        if default is not None:
            default = default.strip().strip("'\"")
            if default.upper() == "NULL":
                default = None
                has_default = True
            else:
                has_default = True
            defval = (default, has_default)
        else:
            defval = None
        heading.attributes[name] = Attribute(name, decl_type, sql_type, logical, in_key, defval, comment, store)
    if not heading.primary_key:
        raise ValueError("Table definition has no primary key")
    return heading


# ---------------------------------------------------------------------------
# Value conversion
# ---------------------------------------------------------------------------


def _to_sql_value(attr: Attribute, value, store: FileStore):
    if value is None:
        return None
    if attr.logical == _LOGICAL_BLOB:
        # DataJoint wire format (mYm/dj0) by default so reference notebooks
        # fetch1() unchanged (SURVEY §7); PPB1 fallback for the few python
        # types dj blobs don't model (e.g. timedelta)
        try:
            return sqlite3.Binary(djblob.pack(value))
        except TypeError:
            return sqlite3.Binary(blob_format.pack(value))
    if attr.logical == _LOGICAL_ATTACH:
        return store.put(str(value))
    if attr.logical == _LOGICAL_TIMESTAMP:
        if isinstance(value, datetime):
            return value.isoformat(sep=" ")
        return str(value)
    if isinstance(value, np.generic):
        return value.item()
    if isinstance(value, (np.ndarray,)):
        raise TypeError(f"Attribute {attr.name} is not a blob; got ndarray")
    return value


def _from_sql_value(attr: Attribute, value, store: FileStore, materialize_attach=True):
    if value is None:
        return None
    if attr.logical == _LOGICAL_BLOB:
        return djblob.unpack(value)  # auto-detects dj0/mYm/ZL123/PPB1
    if attr.logical == _LOGICAL_ATTACH:
        return store.get(value) if materialize_attach else value
    if attr.logical == _LOGICAL_TIMESTAMP:
        if value == "CURRENT_TIMESTAMP":
            return value
        try:
            return datetime.fromisoformat(str(value))
        except ValueError:
            return value
    return value


def key_hash(key: Dict[str, Any]) -> str:
    """Stable 32-hex hash of a primary key dict (job-table addressing)."""
    payload = json.dumps({k: key[k] for k in sorted(key)}, default=str, sort_keys=True)
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------


class Schema:
    """A named table namespace over one SQLite database file."""

    def __init__(self, name: str, config=None):
        self.config = config if config is not None else global_config
        self.name = name
        self.tables: Dict[str, type] = {}
        self._local = threading.local()
        self._store: Optional[FileStore] = None
        os.makedirs(os.path.dirname(os.path.abspath(self.db_path)), exist_ok=True)
        self.connection()  # creates the DB file + ~jobs table

    @property
    def db_path(self) -> str:
        return self.config.database_path if hasattr(self.config, "database_path") else self.config.get(
            "database.path", "./pose_pipeline_tpu.db")

    @property
    def store(self) -> FileStore:
        """File store, re-bound if the config's store location changes."""
        loc = (self.config.store_location if hasattr(self.config, "store_location")
               else self.config.get("stores", {}).get("localattach", {}).get(
                   "location", "./ppt_store"))
        if self._store is None or self._store.location != loc:
            self._store = FileStore(loc)
        return self._store

    def connection(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        # re-open on fork AND on config path/host changes (tests/tools may
        # point the config at a new database after tables were declared)
        host = self.config.get("database.host") if hasattr(self.config, "get") else None
        if (conn is None or getattr(self._local, "pid", None) != os.getpid()
                or getattr(self._local, "path", None) != self.db_path
                or getattr(self._local, "host", None) != host):
            if host:
                # cross-machine worker-fleet mode: route through the
                # coordinator (core/remote.py) — the reference's MySQL-server
                # role (Example_dj_local_conf.json database.host)
                from .remote import connect_from_config

                conn = connect_from_config(self.config)
            else:
                conn = sqlite3.connect(self.db_path, timeout=60.0, isolation_level=None)
                conn.execute("PRAGMA journal_mode=WAL")
                conn.execute("PRAGMA busy_timeout=60000")
                conn.execute("PRAGMA synchronous=NORMAL")
            conn.execute(
                "CREATE TABLE IF NOT EXISTS \"~jobs\" ("
                "table_name TEXT NOT NULL, key_hash TEXT NOT NULL, status TEXT NOT NULL,"
                "key BLOB, error_message TEXT, error_stack TEXT,"
                "user TEXT, host TEXT, pid INTEGER, connection_id INTEGER,"
                "timestamp TEXT DEFAULT CURRENT_TIMESTAMP,"
                "PRIMARY KEY (table_name, key_hash))"
            )
            self._local.conn = conn
            self._local.pid = os.getpid()
            self._local.path = self.db_path
            self._local.host = host
            # a path change after declaration means the new database lacks the
            # declared tables; re-declare them all (idempotent DDL)
            for cls in list(self.tables.values()):
                self._declare(cls)
                contents = getattr(cls, "contents", None)
                if contents:
                    cls.insert([dict(r) for r in contents], skip_duplicates=True)
        return conn

    # -- decorator ---------------------------------------------------------
    def __call__(self, cls):
        cls._schema = self
        cls.database = self.name

        def resolve(name: str):
            if name == cls.__name__:
                return cls
            if name in self.tables:
                return self.tables[name]
            import sys
            mod = sys.modules.get(cls.__module__)
            if mod is not None and hasattr(mod, name):
                return getattr(mod, name)
            raise KeyError(f"Cannot resolve foreign key reference {name!r} for table {cls.__name__}")

        cls.heading = parse_definition(cls.definition, resolve)
        cls.table_name = f"{self.name}__{_camel_to_snake(cls.__name__)}"
        self.tables[cls.__name__] = cls
        self._declare(cls)
        contents = getattr(cls, "contents", None)
        if contents:
            inst = cls()
            rows = [dict(r) if isinstance(r, dict) else r for r in contents]
            inst.insert(rows, skip_duplicates=True)
        return cls

    def _declare(self, cls):
        cols = []
        for a in cls.heading.attributes.values():
            col = f'"{a.name}" {a.sql_type}'
            if a.default is not None:
                dv, _ = a.default
                if dv is None:
                    pass  # nullable
                elif dv.upper() == "CURRENT_TIMESTAMP":
                    col += " DEFAULT CURRENT_TIMESTAMP"
                else:
                    col += f" DEFAULT {json.dumps(dv)}"
            elif not a.in_key:
                pass
            cols.append(col)
        pk = ", ".join(f'"{n}"' for n in cls.heading.primary_key)
        sql = f'CREATE TABLE IF NOT EXISTS "{cls.table_name}" ({", ".join(cols)}, PRIMARY KEY ({pk}))'
        with _write_lock(self.connection()) as conn:
            conn.execute(sql)
            # FK-prefix indexes: semijoins/antijoins and natural joins
            # correlate on parent primary keys; index any FK column set not
            # already covered by this table's own PK prefix (SQLite indexes
            # the PK automatically).
            for parent_name, _in_key in cls.heading.foreign_keys:
                parent = self.tables.get(parent_name)
                if parent is None:
                    continue
                fk_cols = [c for c in parent.heading.primary_key
                           if c in cls.heading.attributes]
                if not fk_cols or fk_cols == cls.heading.primary_key[:len(fk_cols)]:
                    continue
                idx = f"idx__{cls.table_name}__{_camel_to_snake(parent_name)}"
                collist = ", ".join(f'"{c}"' for c in fk_cols)
                conn.execute(
                    f'CREATE INDEX IF NOT EXISTS "{idx}" ON "{cls.table_name}" ({collist})')

    def drop(self):
        """Drop all tables of this schema (testing helper)."""
        conn = self.connection()
        for cls in list(self.tables.values()):
            conn.execute(f'DROP TABLE IF EXISTS "{cls.table_name}"')
        conn.execute('DELETE FROM "~jobs"')

    # -- jobs --------------------------------------------------------------
    def jobs_reserve(self, table_name: str, key: Dict[str, Any]) -> bool:
        conn = self.connection()
        try:
            conn.execute("BEGIN IMMEDIATE")
            conn.execute(
                'INSERT INTO "~jobs" (table_name, key_hash, status, key, user, host, pid) '
                "VALUES (?, ?, 'reserved', ?, ?, ?, ?)",
                (table_name, key_hash(key), sqlite3.Binary(blob_format.pack(key)),
                 os.environ.get("USER", "?"), socket.gethostname(), os.getpid()),
            )
            conn.execute("COMMIT")
            return True
        except sqlite3.IntegrityError:
            conn.execute("ROLLBACK")
            return False

    def jobs_complete(self, table_name: str, key: Dict[str, Any]) -> None:
        conn = self.connection()
        conn.execute('DELETE FROM "~jobs" WHERE table_name=? AND key_hash=?', (table_name, key_hash(key)))

    def jobs_error(self, table_name: str, key: Dict[str, Any], message: str, stack: str = "") -> None:
        conn = self.connection()
        conn.execute(
            'INSERT OR REPLACE INTO "~jobs" (table_name, key_hash, status, key, error_message, error_stack, user, host, pid) '
            "VALUES (?, ?, 'error', ?, ?, ?, ?, ?, ?)",
            (table_name, key_hash(key), sqlite3.Binary(blob_format.pack(key)), message[:2047], stack,
             os.environ.get("USER", "?"), socket.gethostname(), os.getpid()),
        )

    def jobs(self) -> List[Dict[str, Any]]:
        conn = self.connection()
        cur = conn.execute('SELECT table_name, key_hash, status, key, error_message, timestamp FROM "~jobs"')
        out = []
        for tn, kh, status, key, err, ts in cur.fetchall():
            out.append(dict(table_name=tn, key_hash=kh, status=status,
                            key=blob_format.unpack(key) if key else None,
                            error_message=err, timestamp=ts))
        return out


class _write_lock:
    """Context manager: immediate transaction commit/rollback."""

    def __init__(self, conn: sqlite3.Connection):
        self.conn = conn

    def __enter__(self):
        self.conn.execute("BEGIN IMMEDIATE")
        return self.conn

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.conn.execute("COMMIT")
        else:
            self.conn.execute("ROLLBACK")
        return False


def _camel_to_snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


# ---------------------------------------------------------------------------
# Restrictions
# ---------------------------------------------------------------------------


class Not:
    """Negated restriction (antijoin operand)."""

    def __init__(self, operand):
        self.operand = operand


def _row_matches(row: Dict[str, Any], restriction, heading_names: Sequence[str]) -> bool:
    if restriction is None:
        return True
    if isinstance(restriction, Not):
        return not _row_matches(row, restriction.operand, heading_names)
    if isinstance(restriction, dict):
        for k, v in restriction.items():
            if k in heading_names and k in row:
                rv = row[k]
                if isinstance(rv, float) or isinstance(v, float):
                    try:
                        if float(rv) != float(v):
                            return False
                        continue
                    except (TypeError, ValueError):
                        return False
                if str(rv) != str(v) and rv != v:
                    return False
        return True
    if isinstance(restriction, (list, tuple)):
        if len(restriction) == 0:
            return False
        return any(_row_matches(row, r, heading_names) for r in restriction)
    if isinstance(restriction, QueryExpression):
        shared = [n for n in heading_names if n in restriction.heading.names]
        keys = restriction._shared_tuples(shared)
        return tuple(_norm(row.get(n)) for n in shared) in keys
    if isinstance(restriction, str):
        raise RuntimeError("string restrictions are resolved in SQL")  # pragma: no cover
    if isinstance(restriction, type) and issubclass(restriction, Table):
        return _row_matches(row, QueryExpression(restriction), heading_names)
    if isinstance(restriction, Table):
        return _row_matches(row, QueryExpression(type(restriction)), heading_names)
    raise TypeError(f"Unsupported restriction {restriction!r}")


def _norm(v):
    if isinstance(v, float) and v == int(v):
        return int(v)
    if isinstance(v, np.generic):
        return _norm(v.item())
    return v


def _row_matches_sql_string(row: Dict[str, Any], restriction: str,
                            heading_names: Sequence[str]) -> bool:
    """Evaluate a restriction STRING against one materialized row.

    Python-fallback join paths can't push the string into the main query;
    SQLite itself evaluates it here against a one-row scalar view of the
    row, so string semantics stay identical to the pushed-down path."""
    import sqlite3

    cols, vals = [], []
    for n in heading_names:
        v = row.get(n)
        if isinstance(v, (bytes, bytearray, np.ndarray, dict, list)):
            continue  # blob-ish columns are not addressable in strings
        vals.append(_norm(v))
        cols.append(n)
    sel = ", ".join(f'? AS "{c}"' for c in cols) or "1 AS _one"
    sql = (f"SELECT 1 FROM (SELECT {sel}) WHERE "
           + _translate_restriction_string(restriction))
    conn = sqlite3.connect(":memory:")
    try:
        return conn.execute(sql, vals).fetchone() is not None
    finally:
        conn.close()


# ---------------------------------------------------------------------------
# SQL compilation of restrictions (scale path)
#
# Everything the restriction algebra can express in SQLite is pushed down:
# dict restrictions become indexed WHERE clauses, query-expression operands
# become correlated EXISTS semijoins, Not(...) becomes NOT (so ``source -
# computed`` — the populate antijoin — is a single NOT EXISTS scan), and
# natural joins (key_source) compile to SQL JOINs. Only exotic operands
# (joins-as-restrictions, renamed projections) fall back to Python matching.
# This is what lets ``populate`` plan 10k+ keys in milliseconds instead of
# decoding every blob row in Python (the reference gets the same property
# from MySQL; see SURVEY.md §3.3).
# ---------------------------------------------------------------------------


def _expr_operand(r):
    """Normalize a restriction operand to a QueryExpression (or None)."""
    if isinstance(r, QueryExpression):
        return r
    if isinstance(r, Table):
        return QueryExpression(type(r))
    if isinstance(r, type) and issubclass(r, Table):
        return QueryExpression(r)
    return None


def _translate_restriction_string(r: str) -> str:
    """MySQL-style restriction string (``name="x"``) → SQLite SQL.

    DataJoint restriction strings quote string literals with double quotes
    (MySQL default); SQLite reserves those for identifiers. A blind
    ``"``→``'`` swap corrupts literals that *contain* quotes — instead,
    tokenize: double-quoted spans become single-quoted SQL literals with
    embedded single quotes doubled; existing single-quoted literals pass
    through untouched."""
    out = []
    i, n = 0, len(r)
    while i < n:
        c = r[i]
        if c == "'":                       # existing literal: pass through
            j = i + 1
            while j < n:
                if r[j] == "'":
                    if j + 1 < n and r[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(r[i:min(j + 1, n)])
            i = j + 1
        elif c == '"':                     # MySQL string literal: convert
            j = i + 1
            while j < n and r[j] != '"':
                j += 1
            out.append("'" + r[i + 1:j].replace("'", "''") + "'")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _compile_restriction(r, colmap, store, depth=0):
    """Compile one restriction against ``colmap`` (name → (qualified_sql,
    Attribute)). Returns (clause_sql, params) or None if not SQL-expressible."""
    if r is None:
        return "(1=1)", []
    if isinstance(r, dict):
        sub, params = [], []
        for k, v in r.items():
            if k in colmap:
                qcol, attr = colmap[k]
                sub.append(f"{qcol} = ?")
                params.append(_to_sql_value(attr, v, store)
                              if attr.logical != _LOGICAL_ATTACH else v)
        if not sub:
            return "(1=1)", []
        return "(" + " AND ".join(sub) + ")", params
    if isinstance(r, str):
        return "(" + _translate_restriction_string(r) + ")", []
    if isinstance(r, (list, tuple)):
        if len(r) == 0:
            return "(1=0)", []
        parts, params = [], []
        for x in r:
            c = _compile_restriction(x, colmap, store, depth)
            if c is None:
                return None
            parts.append(c[0])
            params.extend(c[1])
        return "(" + " OR ".join(parts) + ")", params
    if isinstance(r, Not):
        c = _compile_restriction(r.operand, colmap, store, depth)
        if c is None:
            return None
        return f"(NOT {c[0]})", c[1]
    expr = _expr_operand(r)
    if expr is not None:
        return _compile_semijoin(expr, colmap, store, depth)
    return None


def _compile_semijoin(expr, outer_colmap, store, depth):
    """EXISTS (SELECT 1 FROM inner WHERE corr AND inner-restrictions)."""
    if isinstance(expr, JoinExpression):
        return None  # joins as restriction operands: Python fallback
    if isinstance(expr, ProjExpression) and expr._renames:
        return None  # renamed columns would need reverse mapping
    alias = f"s{depth}"
    inner_names = expr.heading.names
    table_attrs = expr._table.heading.attributes
    inner_colmap = {n: (f'{alias}."{n}"', table_attrs[n])
                    for n in inner_names if n in table_attrs}
    shared = [n for n in inner_names if n in outer_colmap]
    clauses = [f"{inner_colmap[n][0]} = {outer_colmap[n][0]}" for n in shared]
    params: list = []
    for rr in expr._restrictions:
        c = _compile_restriction(rr, inner_colmap, store, depth + 1)
        if c is None:
            return None
        clauses.append(c[0])
        params.extend(c[1])
    where = " AND ".join(clauses) if clauses else "1=1"
    return (f'EXISTS (SELECT 1 FROM "{expr._table.table_name}" AS {alias} '
            f"WHERE {where})", params)


# ---------------------------------------------------------------------------
# Query expressions
# ---------------------------------------------------------------------------


class QueryExpression:
    """A restricted view over a table (or natural join of tables)."""

    def __init__(self, table_cls, restrictions: Optional[List] = None):
        self._table = table_cls
        self._restrictions = list(restrictions or [])

    # -- algebra -----------------------------------------------------------
    @property
    def heading(self) -> Heading:
        return self._table.heading

    @property
    def primary_key(self) -> List[str]:
        return self.heading.primary_key

    def restrict(self, restriction) -> "QueryExpression":
        if restriction is None:
            return self
        return self.__class__(self._table, self._restrictions + [restriction])

    def __and__(self, restriction) -> "QueryExpression":
        return self.restrict(restriction)

    def __sub__(self, other) -> "QueryExpression":
        return self.restrict(Not(other if isinstance(other, QueryExpression) else other))

    def __mul__(self, other) -> "JoinExpression":
        other_expr = other if isinstance(other, QueryExpression) else QueryExpression(other)
        return JoinExpression([self, other_expr])

    def proj(self, *attrs, **renames) -> "QueryExpression":
        return ProjExpression(self, attrs, renames)

    # -- execution ---------------------------------------------------------
    def _sql_where(self) -> Tuple[str, list, list]:
        """Push restrictions into SQL; return (where, params, residual)."""
        store = self._table._schema.store
        colmap = {n: (f't."{n}"', a) for n, a in self.heading.attributes.items()}
        clauses, params, residual = [], [], []
        for r in self._restrictions:
            c = _compile_restriction(r, colmap, store)
            if c is None:
                residual.append(r)
            else:
                clauses.append(c[0])
                params.extend(c[1])
        where = (" WHERE " + " AND ".join(clauses)) if clauses else ""
        return where, params, residual

    def _rows(self, raw_attach=True, cols: Optional[Sequence[str]] = None,
              distinct: bool = False) -> List[Dict[str, Any]]:
        """Execute. ``cols`` prunes the SELECT list (skipping blob decode for
        key-only scans); residual Python restrictions force a full fetch."""
        where, params, residual = self._sql_where()
        if residual:
            cols = None  # residual matching may need any column
        attrs = (list(self.heading.attributes.values()) if cols is None
                 else [self.heading.attributes[n] for n in cols])
        conn = self._table._schema.connection()
        sel = ", ".join(f't."{a.name}"' for a in attrs)
        verb = "SELECT DISTINCT" if distinct else "SELECT"
        cur = conn.execute(
            f'{verb} {sel} FROM "{self._table.table_name}" AS t{where}', params)
        store = self._table._schema.store
        out = []
        for values in cur.fetchall():
            row = {}
            for attr, v in zip(attrs, values):
                if attr.logical == _LOGICAL_ATTACH and raw_attach:
                    row[attr.name] = v
                else:
                    row[attr.name] = _from_sql_value(attr, v, store)
            if all(_row_matches(row, r, self.heading.names) for r in residual):
                out.append(row)
        return out

    def _shared_tuples(self, shared: Sequence[str]) -> set:
        if not shared:
            # no common attributes: DataJoint semantics — a nonempty operand
            # matches every row (the empty tuple), an empty one matches none
            return {()} if len(self) else set()
        rows = self._rows(raw_attach=True, cols=list(shared))
        return {tuple(_norm(r.get(n)) for n in shared) for r in rows}

    def __len__(self) -> int:
        # COUNT(*) fast path only for plain table expressions: subclasses
        # (projections, joins) define their own row semantics via _rows.
        if type(self) is QueryExpression:
            where, params, residual = self._sql_where()
            if not residual:
                conn = self._table._schema.connection()
                cur = conn.execute(
                    f'SELECT COUNT(*) FROM "{self._table.table_name}" AS t{where}',
                    params)
                return int(cur.fetchone()[0])
        return len(self._rows(raw_attach=True))

    def __bool__(self) -> bool:
        return len(self) > 0

    def __iter__(self):
        for row in self._rows(raw_attach=True, cols=self.primary_key):
            yield {k: row[k] for k in self.primary_key}

    def fetch(self, *attrs, order_by=None, limit: Optional[int] = None,
              as_dict: bool = False, **_ignored):
        rows = self._rows(raw_attach=True)
        if order_by:
            # DataJoint accepts "a", "a DESC", "a, b desc", or a list of
            # such terms; apply them right-to-left so the leftmost term is
            # the primary sort (Python sorts are stable)
            terms = ([t for part in order_by for t in str(part).split(",")]
                     if isinstance(order_by, (list, tuple))
                     else str(order_by).split(","))
            for term in reversed([t.strip() for t in terms if t.strip()]):
                desc = term.lower().endswith(" desc")
                col = term.split()[0]
                rows.sort(key=lambda r: (r.get(col) is None, r.get(col)),
                          reverse=desc)
        if limit is not None:
            rows = rows[:limit]
        if not attrs:
            # full rows: materialize attachments
            rows = self._materialize(rows)
            return rows
        store = self._table._schema.store
        results = []
        for a in attrs:
            if a == "KEY":
                results.append([{k: r[k] for k in self.primary_key} for r in rows])
            else:
                if a not in self.heading.attributes:
                    raise KeyError(f"Unknown attribute {a!r}")
                attr = self.heading.attributes[a]
                vals = [r[a] for r in rows]
                if attr.logical == _LOGICAL_ATTACH:
                    vals = [store.get(v) if isinstance(v, str) else v for v in vals]
                if attr.logical == _LOGICAL_PLAIN:
                    results.append(np.array(vals) if vals and not isinstance(vals[0], str) else vals)
                else:
                    results.append(vals)
        return results[0] if len(results) == 1 else tuple(results)

    def _materialize(self, rows):
        store = self._table._schema.store
        out = []
        for r in rows:
            r = dict(r)
            for attr in self.heading.attributes.values():
                if attr.logical == _LOGICAL_ATTACH and isinstance(r.get(attr.name), str):
                    r[attr.name] = store.get(r[attr.name])
            out.append(r)
        return out

    def fetch1(self, *attrs, **kwargs):
        rows = self._rows(raw_attach=True)
        if len(rows) != 1:
            raise ValueError(
                f"fetch1 requires exactly one row in {self._table.__name__}; found {len(rows)}")
        if not attrs:
            return self._materialize(rows)[0]
        row = rows[0]
        store = self._table._schema.store
        results = []
        for a in attrs:
            if a == "KEY":
                results.append({k: row[k] for k in self.primary_key})
            else:
                attr = self.heading.attributes[a]
                v = row[a]
                if attr.logical == _LOGICAL_ATTACH and isinstance(v, str):
                    v = store.get(v)
                results.append(v)
        return results[0] if len(results) == 1 else tuple(results)

    # -- mutation ----------------------------------------------------------
    def delete(self, safemode: bool = False):
        """Cascading delete (DataJoint semantics): dependent rows in child
        tables are removed first, depth-first over the FK graph, in one
        transaction — notebooks that ``(Table & key).delete()`` to recompute
        a subtree work unchanged."""
        keys = [dict(k) for k in self]
        if not keys:
            return 0
        schema = self._table._schema
        conn = schema.connection()
        # FK children of a table: any schema table declaring it as a parent
        children = {}
        for cls in schema.tables.values():
            for parent_name, _in_key in cls.heading.foreign_keys:
                children.setdefault(parent_name, []).append(cls)

        deleted = 0
        with _write_lock(conn):
            def cascade(table_cls, keys):
                nonlocal deleted
                for child in children.get(table_cls.__name__, []):
                    child_pk = set(a.name for a in child.heading.attributes.values()
                                   if a.in_key)
                    for key in keys:
                        sub = {k: v for k, v in key.items() if k in child_pk}
                        if not sub:
                            continue
                        child_keys = [dict(k) for k in (QueryExpression(child) & sub)]
                        if child_keys:
                            cascade(child, child_keys)
                            for ck in child_keys:
                                clause = " AND ".join(f'"{k}" = ?' for k in ck)
                                conn.execute(
                                    f'DELETE FROM "{child.table_name}" WHERE {clause}',
                                    list(ck.values()))
                                deleted += 1

            cascade(self._table, keys)
            for key in keys:
                clause = " AND ".join(f'"{k}" = ?' for k in key)
                conn.execute(f'DELETE FROM "{self._table.table_name}" WHERE {clause}',
                             list(key.values()))
                deleted += 1
        return deleted

    def delete_quick(self, safemode: bool = False):
        """Non-cascading delete of exactly this expression's rows
        (DataJoint's delete_quick)."""
        keys = [dict(k) for k in self]
        conn = self._table._schema.connection()
        with _write_lock(conn):
            for key in keys:
                clause = " AND ".join(f'"{k}" = ?' for k in key)
                conn.execute(f'DELETE FROM "{self._table.table_name}" WHERE {clause}',
                             list(key.values()))
        return len(keys)

    def __repr__(self):  # pragma: no cover
        return f"<{self._table.__name__} ({len(self)} rows)>"


class ProjExpression(QueryExpression):
    """Projection: keep primary key + selected attributes."""

    def __init__(self, base: QueryExpression, attrs, renames):
        super().__init__(base._table, base._restrictions)
        self._keep = list(attrs)
        self._renames = dict(renames)

    @property
    def heading(self) -> Heading:
        base = self._table.heading
        h = Heading()
        for name, a in base.attributes.items():
            if a.in_key or name in self._keep:
                h.attributes[name] = a
        for new, old in self._renames.items():
            a = base.attributes[old]
            h.attributes[new] = Attribute(new, a.decl_type, a.sql_type, a.logical, a.in_key, a.default, a.comment, a.store)
        return h

    def _rows(self, raw_attach=True, cols=None, distinct=False):
        base_cols = None
        if not self._renames:
            base_cols = [n for n in self._table.heading.attributes
                         if self._table.heading.attributes[n].in_key or n in self._keep]
        rows = QueryExpression(self._table, self._restrictions)._rows(
            raw_attach=raw_attach, cols=base_cols)
        out = []
        for r in rows:
            nr = {k: v for k, v in r.items()
                  if self._table.heading.attributes[k].in_key or k in self._keep}
            for new, old in self._renames.items():
                nr[new] = r[old]
            out.append(nr)
        return out


class JoinExpression(QueryExpression):
    """Natural join of expressions (used primarily for ``key_source``)."""

    def __init__(self, parts: List[QueryExpression], restrictions: Optional[List] = None):
        self._parts = parts
        self._restrictions = list(restrictions or [])
        self._table = parts[0]._table  # for schema access

    @property
    def heading(self) -> Heading:
        h = Heading()
        for p in self._parts:
            for name, a in p.heading.attributes.items():
                if name not in h.attributes:
                    h.attributes[name] = a
        return h

    @property
    def primary_key(self) -> List[str]:
        seen = []
        for p in self._parts:
            for n in p.primary_key:
                if n not in seen:
                    seen.append(n)
        return seen

    def restrict(self, restriction) -> "JoinExpression":
        if restriction is None:
            return self
        return JoinExpression(self._parts, self._restrictions + [restriction])

    def __mul__(self, other):
        other_expr = other if isinstance(other, QueryExpression) else QueryExpression(other)
        return JoinExpression(self._parts + [other_expr], self._restrictions)

    def _sql_join(self, cols, distinct):
        """Compile the natural join + restrictions to one SQL query.

        Returns (sql, params, attrs) or None when a part/restriction is not
        SQL-expressible (renamed projections, nested joins, custom operands).
        """
        store = self._table._schema.store
        colmap: Dict[str, tuple] = {}  # name -> (qualified, attr), first part wins
        part_maps = []
        for i, p in enumerate(self._parts):
            if type(p) is not QueryExpression:
                return None
            alias = f"j{i}"
            pmap = {n: (f'{alias}."{n}"', a) for n, a in p.heading.attributes.items()}
            part_maps.append(pmap)
            for n, qa in pmap.items():
                colmap.setdefault(n, qa)
        from_sql = f'"{self._parts[0]._table.table_name}" AS j0'
        seen_names = set(self._parts[0].heading.names)
        clauses, params = [], []
        for i, p in enumerate(self._parts[1:], 1):
            shared = [n for n in p.heading.names if n in seen_names]
            on = " AND ".join(f'{part_maps[i][n][0]} = {colmap[n][0]}' for n in shared) or "1=1"
            from_sql += f' JOIN "{p._table.table_name}" AS j{i} ON {on}'
            seen_names.update(p.heading.names)
        # String restrictions use unqualified column names, which SQLite
        # rejects as ambiguous across the join aliases. They are applied on
        # an OUTER subquery that exposes each logical column exactly once
        # (sound for inner joins: the natural-join ON clause makes shared
        # columns equal, so restricting any alias restricts them all).
        outer_clauses = []
        for i, p in enumerate(self._parts):
            for r in p._restrictions:
                if isinstance(r, str):
                    outer_clauses.append(
                        "(" + _translate_restriction_string(r) + ")")
                    continue
                c = _compile_restriction(r, part_maps[i], store)
                if c is None:
                    return None
                clauses.append(c[0])
                params.extend(c[1])
        for r in self._restrictions:
            if isinstance(r, str):
                outer_clauses.append(
                    "(" + _translate_restriction_string(r) + ")")
                continue
            c = _compile_restriction(r, colmap, store)
            if c is None:
                return None
            clauses.append(c[0])
            params.extend(c[1])
        names = self.heading.names if cols is None else list(cols)
        attrs = [self.heading.attributes[n] for n in names]
        where = (" WHERE " + " AND ".join(clauses)) if clauses else ""
        verb = "SELECT DISTINCT" if distinct else "SELECT"
        if not outer_clauses:
            sel = ", ".join(colmap[n][0] for n in names)
            return f"{verb} {sel} FROM {from_sql}{where}", params, attrs
        inner_sel = ", ".join(f'{colmap[n][0]} AS "{n}"'
                              for n in self.heading.names)
        outer_sel = ", ".join(f'q."{n}"' for n in names)
        outer_where = " WHERE " + " AND ".join(outer_clauses)
        return (f"{verb} {outer_sel} FROM (SELECT {inner_sel} FROM "
                f"{from_sql}{where}) AS q{outer_where}", params, attrs)

    def _rows(self, raw_attach=True, cols=None, distinct=False):
        compiled = self._sql_join(cols, distinct)
        if compiled is not None:
            sql, params, attrs = compiled
            conn = self._table._schema.connection()
            store = self._table._schema.store
            out = []
            for values in conn.execute(sql, params).fetchall():
                row = {}
                for attr, v in zip(attrs, values):
                    if attr.logical == _LOGICAL_ATTACH and raw_attach:
                        row[attr.name] = v
                    else:
                        row[attr.name] = _from_sql_value(attr, v, store)
                out.append(row)
            return out
        # Python fallback: nested-loop natural join + row matching
        rows = [dict(r) for r in self._parts[0]._rows(raw_attach=True)]
        for p in self._parts[1:]:
            p_rows = p._rows(raw_attach=True)
            shared = [n for n in p.heading.names
                      if any(n in q.heading.names for q in self._parts[: self._parts.index(p)])]
            index: Dict[tuple, List[dict]] = {}
            for pr in p_rows:
                index.setdefault(tuple(_norm(pr.get(n)) for n in shared), []).append(pr)
            merged = []
            for r in rows:
                for pr in index.get(tuple(_norm(r.get(n)) for n in shared), []):
                    nr = dict(pr)
                    nr.update(r)
                    merged.append(nr)
            rows = merged
        names = self.heading.names
        out = []
        for r in rows:
            ok = True
            for restr in self._restrictions:
                if isinstance(restr, str):
                    if not _row_matches_sql_string(r, restr, names):
                        ok = False
                        break
                elif not _row_matches(r, restr, names):
                    ok = False
                    break
            if ok:
                out.append(r)
        return out


# ---------------------------------------------------------------------------
# Table base classes
# ---------------------------------------------------------------------------


class TableMeta(type):
    """Lets the *class itself* act as a query expression (DataJoint idiom)."""

    def _expr(cls) -> QueryExpression:
        return QueryExpression(cls)

    def __and__(cls, restriction):
        return cls._expr() & restriction

    def __sub__(cls, other):
        return cls._expr() - other

    def __mul__(cls, other):
        return cls._expr() * other

    def __len__(cls):
        return len(cls._expr())

    def __bool__(cls):
        return True  # classes are always truthy; use len()

    def __iter__(cls):
        return iter(cls._expr())

    def proj(cls, *a, **k):
        return cls._expr().proj(*a, **k)

    def fetch(cls, *a, **k):
        return cls._expr().fetch(*a, **k)

    def fetch1(cls, *a, **k):
        return cls._expr().fetch1(*a, **k)

    def delete(cls, **k):
        return cls._expr().delete(**k)


class Table(metaclass=TableMeta):
    definition: str = ""
    heading: Heading
    table_name: str
    _schema: Schema

    def __init__(self):
        pass

    # instance-level algebra mirrors class-level
    def __and__(self, r):
        return type(self)._expr() & r

    def __sub__(self, r):
        return type(self)._expr() - r

    def __mul__(self, r):
        return type(self)._expr() * r

    def __len__(self):
        return len(type(self)._expr())

    def __getattr__(self, name):
        # Delegate query-expression methods (fetch/fetch1/proj/delete/...) from
        # table *instances* to a fresh expression over the table.
        if name.startswith("_"):
            raise AttributeError(name)
        expr = type(self)._expr()
        if hasattr(expr, name):
            return getattr(expr, name)
        raise AttributeError(name)

    # -- insertion ----------------------------------------------------------
    @classmethod
    def insert1(cls, row: Dict[str, Any], skip_duplicates: bool = False,
                allow_direct_insert: bool = False, replace: bool = False, ignore_extra_fields: bool = True):
        cls.insert([row], skip_duplicates=skip_duplicates, replace=replace,
                   ignore_extra_fields=ignore_extra_fields)

    @classmethod
    def insert(cls, rows: Iterable[Dict[str, Any]], skip_duplicates: bool = False,
               replace: bool = False, ignore_extra_fields: bool = True, **_):
        schema = cls._schema
        conn = schema.connection()
        heading = cls.heading
        prepared = []
        for row in rows:
            if not isinstance(row, dict):
                raise TypeError("rows must be dicts")
            cols, vals = [], []
            for name, attr in heading.attributes.items():
                if name in row:
                    cols.append(name)
                    vals.append(_to_sql_value(attr, row[name], schema.store))
                elif attr.in_key:
                    raise ValueError(f"Missing primary key attribute {name!r} in insert to {cls.__name__}")
                elif attr.default is None:
                    raise ValueError(f"Missing required attribute {name!r} in insert to {cls.__name__}")
            extra = set(row) - set(heading.names)
            if extra and not ignore_extra_fields:
                raise ValueError(f"Extra fields {extra} in insert to {cls.__name__}")
            prepared.append((cols, vals))
        verb = "INSERT OR REPLACE" if replace else ("INSERT OR IGNORE" if skip_duplicates else "INSERT")
        with _write_lock(conn):
            for cols, vals in prepared:
                collist = ", ".join(f'"{c}"' for c in cols)
                ph = ", ".join("?" for _ in cols)
                conn.execute(f'{verb} INTO "{cls.table_name}" ({collist}) VALUES ({ph})', vals)

    @classmethod
    def drop(cls):
        conn = cls._schema.connection()
        conn.execute(f'DROP TABLE IF EXISTS "{cls.table_name}"')
        cls._schema.tables.pop(cls.__name__, None)


class Manual(Table):
    pass


class Lookup(Table):
    contents: Iterable[Dict[str, Any]] = ()


class AutoPopulate(Table):
    """Base for Computed/Imported: ``populate()`` drives ``make(key)``."""

    @property
    def key_source(self):
        cls = type(self)
        parents = [cls._schema.tables.get(name) for name, in_key in cls.heading.foreign_keys if in_key]
        parents = [p for p in parents if p is not None]
        if not parents:
            raise RuntimeError(f"{cls.__name__} has no primary foreign keys; override key_source")
        expr = QueryExpression(parents[0])
        for p in parents[1:]:
            expr = expr * QueryExpression(p)
        return expr

    def make(self, key):  # pragma: no cover - abstract
        raise NotImplementedError

    @classmethod
    def populate(cls, *restrictions, reserve_jobs: bool = False, suppress_errors: bool = False,
                 limit: Optional[int] = None, display_progress: bool = False, order=None, **_):
        self = cls()
        source = self.key_source
        for r in restrictions:
            if r is not None:
                source = source & r
        todo = source - cls._expr()
        # key-only scan: the antijoin compiles to one NOT EXISTS SQL query
        # (no blob decode); DISTINCT collapses repeated key projections
        keys = [{k: row[k] for k in source.primary_key}
                for row in todo._rows(raw_attach=True,
                                      cols=source.primary_key, distinct=True)]
        # de-duplicate (Python-fallback paths can still produce repeats)
        seen, uniq = set(), []
        for k in keys:
            h = key_hash(k)
            if h not in seen:
                seen.add(h)
                uniq.append(k)
        if order is not None:
            # DataJoint populate(order=...): "original" (key_source order),
            # "reverse", or "random" — honored instead of silently ignored
            if order == "reverse":
                uniq.reverse()
            elif order == "random":
                import random

                random.shuffle(uniq)
            elif order != "original":
                raise ValueError(
                    f"populate(order={order!r}): expected 'original', "
                    "'reverse', or 'random'")
        if limit is not None:
            uniq = uniq[:limit]
        errors = []
        schema = cls._schema
        iterator = uniq
        if display_progress:
            try:
                from tqdm import tqdm
                iterator = tqdm(uniq, desc=f"populate {cls.__name__}")
            except ImportError:
                pass
        for key in iterator:
            if reserve_jobs and not schema.jobs_reserve(cls.table_name, key):
                continue
            if reserve_jobs and len(cls._expr() & key):
                # another worker computed this key after our todo snapshot;
                # release the (now stale) reservation and move on
                schema.jobs_complete(cls.table_name, key)
                continue
            try:
                self.make(dict(key))
                if reserve_jobs:
                    schema.jobs_complete(cls.table_name, key)
            except Exception as e:  # noqa: BLE001 - mirrors reference suppress_errors
                if reserve_jobs:
                    schema.jobs_error(cls.table_name, key, repr(e), traceback.format_exc())
                if suppress_errors:
                    errors.append((key, e))
                else:
                    if reserve_jobs is False:
                        raise
                    raise
        return errors

    @classmethod
    def progress(cls) -> Tuple[int, int]:
        self = cls()
        total = len(self.key_source)
        remaining = len(self.key_source - cls._expr())
        return remaining, total


class Computed(AutoPopulate):
    pass


class Imported(AutoPopulate):
    pass
