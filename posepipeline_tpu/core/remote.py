"""Cross-machine database coordinator: the multi-host worker-fleet backend.

The reference scales populate() workers across machines by pointing every
worker at one MySQL server (reference README.md deployment,
``Example_dj_local_conf.json`` ``database.host``; job claims in the ``~jobs``
table). The local engine (core/engine.py) keeps those exact claim semantics
on one host via SQLite-WAL; this module extends them across machines the
TPU-pod way: one lightweight coordinator process owns the database file, and
workers on other hosts speak a thin "SQLite over TCP" protocol to it.

Design:

* ``DatabaseServer`` — accept loop; each client gets its OWN server-side
  ``sqlite3`` connection, so ``BEGIN IMMEDIATE … COMMIT`` sequences from a
  worker have exactly local-SQLite transaction semantics (the engine's
  atomic ``~jobs`` claims work unchanged across hosts).
* ``RemoteConnection`` — drop-in for the ``sqlite3.Connection`` surface the
  engine uses (``execute``/``executemany`` returning fetchable cursors).
* Transport: ``multiprocessing.connection`` (length-framed pickle with
  HMAC challenge auth from ``database.password``). Like the MySQL wire
  protocol it replaces, this is an *intra-cluster* protocol: run it on the
  pod/cluster network, not the open internet.

Engine integration: set ``config["database.host"] = "host:port"`` (and
optionally ``database.password``) and every Schema connection transparently
routes here; unset, the engine opens the SQLite file directly.
"""

from __future__ import annotations

import os
import sqlite3
import threading
from multiprocessing.connection import Client, Listener
from typing import Any, List, Optional, Tuple

DEFAULT_PORT = 7760


class DatabaseServer:
    """Coordinator owning the SQLite file; one thread + connection per client."""

    def __init__(self, db_path: str, host: str = "0.0.0.0",
                 port: int = DEFAULT_PORT, authkey: bytes = b"posepipeline"):
        self.db_path = db_path
        self.address = (host, port)
        self.authkey = authkey
        self._listener: Optional[Listener] = None
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []

    def _open_db(self) -> sqlite3.Connection:
        conn = sqlite3.connect(self.db_path, timeout=60.0, isolation_level=None,
                               check_same_thread=False)
        conn.execute("PRAGMA journal_mode=WAL")
        conn.execute("PRAGMA busy_timeout=60000")
        conn.execute("PRAGMA synchronous=NORMAL")
        return conn

    def _client_loop(self, io) -> None:
        db = self._open_db()
        try:
            while not self._stop.is_set():
                try:
                    msg = io.recv()
                except (EOFError, OSError):
                    break
                try:
                    op, sql, params = msg
                    if op == "execute":
                        cur = db.execute(sql, params)
                        rows = cur.fetchall() if cur.description else []
                        io.send(("ok", rows, cur.rowcount, cur.lastrowid))
                    elif op == "executemany":
                        cur = db.executemany(sql, params)
                        io.send(("ok", [], cur.rowcount, cur.lastrowid))
                    elif op == "ping":
                        io.send(("ok", [], 0, None))
                    else:
                        io.send(("error", f"unknown op {op!r}", None, None))
                except sqlite3.Error as e:
                    io.send(("dberror", type(e).__name__, str(e), None))
        finally:
            try:
                db.execute("ROLLBACK")   # drop any transaction a dead client left
            except sqlite3.Error:
                pass
            db.close()
            io.close()

    def serve_forever(self) -> None:
        self._listener = Listener(self.address, authkey=self.authkey)
        while not self._stop.is_set():
            try:
                io = self._listener.accept()
            except (OSError, EOFError, Exception):
                if self._stop.is_set():
                    break
                continue
            t = threading.Thread(target=self._client_loop, args=(io,), daemon=True)
            t.start()
            self._threads.append(t)

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        # wait until the listener accepts
        for _ in range(200):
            try:
                c = Client(("127.0.0.1", self.address[1]), authkey=self.authkey)
                c.send(("ping", "", ()))
                c.recv()
                c.close()
                break
            except (ConnectionError, OSError):
                import time
                time.sleep(0.05)
        return t

    def shutdown(self) -> None:
        self._stop.set()
        if self._listener is not None:
            try:
                self._listener.close()
            except OSError:
                pass


class RemoteCursor:
    def __init__(self, rows: List[Tuple], rowcount: int, lastrowid):
        self._rows = rows
        self.rowcount = rowcount
        self.lastrowid = lastrowid
        self.description = None if not rows else ()

    def fetchall(self) -> List[Tuple]:
        rows, self._rows = self._rows, []
        return rows

    def fetchone(self):
        return self._rows.pop(0) if self._rows else None

    def __iter__(self):
        rows, self._rows = self._rows, []
        return iter(rows)


class RemoteConnection:
    """sqlite3.Connection-shaped proxy over the coordinator protocol."""

    def __init__(self, host: str, port: int = DEFAULT_PORT,
                 authkey: bytes = b"posepipeline"):
        self._io = Client((host, port), authkey=authkey)
        self._lock = threading.Lock()

    def _call(self, op: str, sql: str, params) -> RemoteCursor:
        with self._lock:
            self._io.send((op, sql, params))
            status, a, b, c = self._io.recv()
        if status == "ok":
            return RemoteCursor(a, b, c)
        if status == "dberror":
            exc = getattr(sqlite3, a, sqlite3.OperationalError)
            raise exc(b)
        raise RuntimeError(f"coordinator error: {a}")

    def execute(self, sql: str, params: Tuple = ()) -> RemoteCursor:
        return self._call("execute", sql, _plain_params(params))

    def executemany(self, sql: str, seq) -> RemoteCursor:
        return self._call("executemany", sql, [_plain_params(p) for p in seq])

    def commit(self) -> None:   # isolation_level=None peers: explicit COMMITs
        pass

    def close(self) -> None:
        try:
            self._io.close()
        except OSError:
            pass

    # `with conn:` transaction blocks (engine uses explicit BEGIN/COMMIT via
    # _write_lock, but keep parity with sqlite3.Connection)
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        return False


def _plain_params(params):
    """sqlite3.Binary memoryviews are not picklable — send plain bytes."""
    return tuple(bytes(p) if isinstance(p, memoryview) else p for p in params)


def connect_from_config(config) -> Optional[RemoteConnection]:
    """RemoteConnection when ``database.host`` is configured, else None."""
    host = config.get("database.host") if hasattr(config, "get") else None
    if not host:
        return None
    port = DEFAULT_PORT
    if ":" in host:
        host, port_s = host.rsplit(":", 1)
        port = int(port_s)
    port = int(config.get("database.port", port))
    authkey = str(config.get("database.password", "posepipeline")).encode()
    return RemoteConnection(host, port, authkey=authkey)


def main() -> None:
    """``python -m posepipeline_tpu.core.remote <db_path> [port]``"""
    import sys

    db_path = sys.argv[1] if len(sys.argv) > 1 else "./pose_pipeline_tpu.db"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_PORT
    authkey = os.environ.get("PPT_DB_PASSWORD", "posepipeline").encode()
    server = DatabaseServer(db_path, port=port, authkey=authkey)
    print(f"posepipeline coordinator: {db_path} on :{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
