"""Cross-machine coordinator (core/remote.py): the multi-host worker-fleet
backend replacing the reference's MySQL deployment (Example_dj_local_conf.json
database.host; ~jobs claims)."""

import multiprocessing as mp
import os

import numpy as np
import pytest

PORT = 7761


def test_remote_connection_basic(tmp_path):
    from posepipeline_tpu.core.remote import DatabaseServer, RemoteConnection

    server = DatabaseServer(str(tmp_path / "db.sqlite"), host="127.0.0.1",
                            port=PORT, authkey=b"k")
    server.start_background()
    try:
        conn = RemoteConnection("127.0.0.1", PORT, authkey=b"k")
        conn.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b BLOB)")
        conn.execute("INSERT INTO t VALUES (?, ?)", (1, b"\x00\x01"))
        rows = conn.execute("SELECT a, b FROM t").fetchall()
        assert rows == [(1, b"\x00\x01")]
        # transactions are per-client-connection
        conn.execute("BEGIN IMMEDIATE")
        conn.execute("INSERT INTO t VALUES (2, NULL)")
        conn.execute("ROLLBACK")
        assert conn.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 1
        # db errors surface as sqlite3 exceptions
        import sqlite3
        with pytest.raises(sqlite3.Error):
            conn.execute("INSERT INTO t VALUES (1, NULL)")
        conn.close()
    finally:
        server.shutdown()


def _remote_worker(db_host, db_port, tmpdir, n_keys, out_q):
    from posepipeline_tpu.core.config import Config
    from posepipeline_tpu.core.engine import Computed, Manual, Schema

    cfg = Config()
    cfg["database.path"] = os.path.join(tmpdir, "unused_local.db")
    cfg["database.host"] = f"{db_host}:{db_port}"
    cfg["database.password"] = "fleet"
    cfg["stores"] = {"localattach": {"protocol": "file",
                                     "location": os.path.join(tmpdir, "store")}}
    schema = Schema("fleet", config=cfg)

    @schema
    class Item(Manual):
        definition = """
        item_id: int
        ---
        payload: longblob
        """

    @schema
    class Result(Computed):
        definition = """
        -> Item
        ---
        doubled: longblob
        """

        def make(self, key):
            val = (Item & key).fetch1("payload")
            key["doubled"] = np.asarray(val) * 2
            self.insert1(key)

    if out_q is None:   # seeder
        Item.insert([{"item_id": i, "payload": np.full(4, i)} for i in range(n_keys)],
                    skip_duplicates=True)
        return
    made = 0
    Result.populate(reserve_jobs=True)
    made = len(Result())
    out_q.put(made)


@pytest.mark.parametrize("n_workers", [3])
def test_fleet_populate_over_tcp(tmp_path, n_workers):
    """Multiple worker *processes* (stand-ins for separate machines) populate
    through the coordinator: every key computed exactly once, no leftover
    reservations."""
    from posepipeline_tpu.core.remote import DatabaseServer

    n_keys = 12
    server = DatabaseServer(str(tmp_path / "fleet.db"), host="127.0.0.1",
                            port=PORT + 1, authkey=b"fleet")
    server.start_background()
    try:
        ctx = mp.get_context("spawn")
        _remote_worker("127.0.0.1", PORT + 1, str(tmp_path), n_keys, None)
        q = ctx.Queue()
        procs = [ctx.Process(target=_remote_worker,
                             args=("127.0.0.1", PORT + 1, str(tmp_path), n_keys, q))
                 for _ in range(n_workers)]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=120)
        totals = [q.get(timeout=5) for _ in procs]
        # all workers converge on the full table; keys computed exactly once
        assert max(totals) == n_keys
        import sqlite3
        con = sqlite3.connect(str(tmp_path / "fleet.db"))
        n_rows = con.execute('SELECT COUNT(*) FROM "fleet__result"').fetchone()[0]
        leftover = con.execute(
            "SELECT COUNT(*) FROM \"~jobs\" WHERE status='reserved'").fetchone()[0]
        con.close()
        assert n_rows == n_keys
        assert leftover == 0
    finally:
        server.shutdown()
