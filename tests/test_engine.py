"""Unit tests for the core table engine (Schema / tables / populate / jobs).

Exercises the DataJoint-semantics surface the pipeline layer is written
against (reference usage: pose_pipeline/pipeline.py, standard_pipelines.py).
"""

import os
from datetime import datetime

import numpy as np
import pytest

from posepipeline_tpu.core.engine import Computed, Lookup, Manual, key_hash


def make_tables(schema):
    @schema
    class Session(Manual):
        definition = """
        # A recording session
        project : varchar(50)
        session_id : int
        ---
        start_time : timestamp
        notes = NULL : varchar(200)
        """

    @schema
    class MethodLookup(Lookup):
        definition = """
        method : int
        ---
        method_name : varchar(50)
        """
        contents = [{"method": 0, "method_name": "alpha"}, {"method": 1, "method_name": "beta"}]

    @schema
    class MethodChoice(Manual):
        definition = """
        -> Session
        -> MethodLookup
        """

    @schema
    class Result(Computed):
        definition = """
        -> MethodChoice
        ---
        payload : longblob
        score : float
        """

        def make(self, key):
            key = dict(key)
            key["payload"] = {"arr": np.arange(6).reshape(2, 3), "t": datetime(2026, 1, 1)}
            key["score"] = float(key["session_id"]) * 2.0
            self.insert1(key)

    return Session, MethodLookup, MethodChoice, Result


def test_insert_fetch_restrict(schema):
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    Session.insert1({"project": "p1", "session_id": 1, "start_time": datetime(2026, 8, 1, 12, 0)})
    Session.insert1({"project": "p1", "session_id": 2, "start_time": datetime(2026, 8, 2, 12, 0)})
    Session.insert1({"project": "p2", "session_id": 1, "start_time": datetime(2026, 8, 3, 12, 0)})

    assert len(Session) == 3
    assert len(Session & {"project": "p1"}) == 2
    assert len(Session & 'project="p2"') == 1
    # extra fields in dict restrictions are ignored (DataJoint semantics)
    assert len(Session & {"project": "p1", "unrelated": 99}) == 2

    row = (Session & {"project": "p1", "session_id": 1}).fetch1()
    assert row["start_time"] == datetime(2026, 8, 1, 12, 0)
    assert row["notes"] is None

    keys = (Session & {"project": "p1"}).fetch("KEY")
    assert {k["session_id"] for k in keys} == {1, 2}

    with pytest.raises(ValueError):
        (Session & {"project": "p1"}).fetch1()


def test_lookup_contents_and_duplicates(schema):
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    assert len(MethodLookup) == 2
    assert (MethodLookup & {"method": 1}).fetch1("method_name") == "beta"
    # skip_duplicates
    MethodLookup.insert1({"method": 0, "method_name": "alpha"}, skip_duplicates=True)
    assert len(MethodLookup) == 2


def test_populate_and_key_source(schema):
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    Session.insert1({"project": "p1", "session_id": 1, "start_time": datetime(2026, 8, 1)})
    Session.insert1({"project": "p1", "session_id": 2, "start_time": datetime(2026, 8, 2)})
    MethodChoice.insert1({"project": "p1", "session_id": 1, "method": 0})
    MethodChoice.insert1({"project": "p1", "session_id": 2, "method": 1})

    assert len(Result().key_source) == 2
    Result.populate()
    assert len(Result) == 2
    # idempotent: already-computed keys are skipped
    Result.populate()
    assert len(Result) == 2

    r = (Result & {"session_id": 2}).fetch1()
    np.testing.assert_array_equal(r["payload"]["arr"], np.arange(6).reshape(2, 3))
    assert r["payload"]["t"] == datetime(2026, 1, 1)
    assert r["score"] == 4.0


def test_populate_restriction_and_antijoin(schema):
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    for sid in (1, 2, 3):
        Session.insert1({"project": "p1", "session_id": sid, "start_time": datetime(2026, 8, sid)})
        MethodChoice.insert1({"project": "p1", "session_id": sid, "method": 0})
    Result.populate({"session_id": 1})
    assert len(Result) == 1
    remaining = (Session - Result).fetch("KEY")
    assert {k["session_id"] for k in remaining} == {2, 3}
    Result.populate()
    assert len(Session - Result) == 0


def test_populate_error_handling_and_jobs(schema):
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)

    @schema
    class Fragile(Computed):
        definition = """
        -> Session
        ---
        value : int
        """

        def make(self, key):
            if key["session_id"] == 2:
                raise RuntimeError("boom")
            self.insert1(dict(key, value=1))

    for sid in (1, 2, 3):
        Session.insert1({"project": "p", "session_id": sid, "start_time": datetime(2026, 1, sid)})

    with pytest.raises(RuntimeError):
        Fragile.populate()

    errors = Fragile.populate(suppress_errors=True)
    assert len(Fragile) == 2
    assert len(errors) == 1 and errors[0][0]["session_id"] == 2

    # reserved-jobs path records the error in ~jobs
    (Fragile & {"session_id": 1}).delete()
    errors = Fragile.populate(reserve_jobs=True, suppress_errors=True)
    jobs = schema.jobs()
    err_jobs = [j for j in jobs if j["status"] == "error"]
    assert len(err_jobs) == 1
    assert err_jobs[0]["key"]["session_id"] == 2
    assert "boom" in err_jobs[0]["error_message"]
    # a reserved-error key is not retried while its job row exists
    before = len(Fragile)
    Fragile.populate(reserve_jobs=True, suppress_errors=True)
    assert len(Fragile) == before


def test_job_reservation_atomicity(schema):
    key = {"a": 1, "b": "x"}
    assert schema.jobs_reserve("tbl", key)
    assert not schema.jobs_reserve("tbl", key)  # second claim fails
    schema.jobs_complete("tbl", key)
    assert schema.jobs_reserve("tbl", key)


def test_attach_roundtrip(schema, tmp_path):
    @schema
    class Media(Manual):
        definition = """
        name : varchar(40)
        ---
        payload : attach@localattach
        """

    src = tmp_path / "clip.mp4"
    src.write_bytes(b"fake-video-bytes")
    Media.insert1({"name": "a", "payload": str(src)})
    src.unlink()  # original removed; store holds the copy

    out = (Media & {"name": "a"}).fetch1("payload")
    assert os.path.isfile(out)
    with open(out, "rb") as f:
        assert f.read() == b"fake-video-bytes"
    os.remove(out)


def test_join_and_proj(schema):
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    Session.insert1({"project": "p1", "session_id": 1, "start_time": datetime(2026, 8, 1)})
    MethodChoice.insert1({"project": "p1", "session_id": 1, "method": 1})
    joined = MethodChoice * MethodLookup
    rows = joined._rows()
    assert len(rows) == 1
    assert rows[0]["method_name"] == "beta"

    projected = (Session.proj()).fetch("KEY")
    assert projected == [{"project": "p1", "session_id": 1}]


def test_string_restriction_on_join(schema):
    """MySQL-style restriction strings on JOIN expressions — the idiom the
    reference notebooks use everywhere (`Table.populate(filt)` where the
    key_source is a join and `filt` is 'video_project="X"')."""
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    for sid, method in ((1, 0), (2, 1)):
        Session.insert1({"project": f"p{sid}", "session_id": sid,
                         "start_time": datetime(2026, 8, sid)})
        MethodChoice.insert1({"project": f"p{sid}", "session_id": sid,
                              "method": method})
    joined = (MethodChoice * MethodLookup) & 'project="p1"'
    rows = joined._rows()
    assert len(rows) == 1 and rows[0]["project"] == "p1"
    # string on a PART of the join (restricted-expression operand)
    joined2 = (MethodChoice & 'project="p2"') * MethodLookup
    rows2 = joined2._rows()
    assert len(rows2) == 1 and rows2[0]["method_name"] == "beta"
    # string referencing a column shared by both parts (the ambiguous case
    # SQLite would reject without the subquery wrapper)
    shared = (MethodChoice * MethodLookup) & "method = 1"
    assert len(shared._rows()) == 1
    # and on the Python fallback path (renamed projection defeats SQL)
    projected = MethodChoice.proj(m="method") * Session
    fallback = projected & 'project="p1"'
    rows3 = fallback._rows()
    assert len(rows3) == 1 and rows3[0]["project"] == "p1"


def test_key_hash_stability():
    assert key_hash({"b": 2, "a": 1}) == key_hash({"a": 1, "b": 2})
    assert key_hash({"a": 1}) != key_hash({"a": 2})


def test_blob_roundtrip():
    from posepipeline_tpu.core import blob

    cases = [
        None, True, False, 42, -1.5, "héllo", b"bytes",
        datetime(2026, 1, 2, 3, 4, 5),
        np.float32(3.5),
        np.arange(24, dtype=np.float64).reshape(2, 3, 4),
        {"nested": [1, {"x": np.ones((2, 2), dtype=np.int16)}, (1, 2)]},
        [],
        {},
    ]
    for v in cases:
        out = blob.unpack(blob.pack(v))
        if isinstance(v, np.ndarray):
            np.testing.assert_array_equal(out, v)
            assert out.dtype == v.dtype
        elif isinstance(v, dict) and v:
            np.testing.assert_array_equal(out["nested"][1]["x"], v["nested"][1]["x"])
            assert out["nested"][2] == (1, 2)
        else:
            assert out == v or (v != v and out != out)


def test_populate_scale_10k(schema):
    """Engine scale criterion: planning + executing a 10k-key populate is
    dominated by the makes themselves — the todo-key scan (SQL NOT EXISTS
    antijoin over the key_source join) must stay around a second, not minutes
    of Python-loop joins + per-row blob decode."""
    import time

    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    n = 10_000
    Session.insert([dict(project="p", session_id=i, start_time=datetime(2026, 1, 1))
                    for i in range(n)])
    MethodChoice.insert([dict(project="p", session_id=i, method=0) for i in range(n)])

    class CountingResult(Result):
        made = 0

        def make(self, key):
            type(self).made += 1
            super().make(key)

    # plan-only overhead: key scan with nothing to do after full population
    t0 = time.perf_counter()
    CountingResult.populate()
    full_run = time.perf_counter() - t0
    assert CountingResult.made == n

    t0 = time.perf_counter()
    CountingResult.populate()  # everything computed: pure planning overhead
    overhead = time.perf_counter() - t0
    assert CountingResult.made == n  # no re-makes
    assert overhead < 1.0, f"populate planning overhead {overhead:.2f}s"
    # sanity on the run itself: ~10k makes with blob writes, well under a minute
    assert full_run < 60.0


def test_semijoin_antijoin_sql_pushdown(schema):
    """Expression restrictions (semijoin / antijoin) compile to SQL EXISTS —
    verified behaviorally at a size where Python-loop matching would be slow,
    and exactly on small cases."""
    Session, MethodLookup, MethodChoice, Result = make_tables(schema)
    Session.insert([dict(project="p", session_id=i, start_time=datetime(2026, 1, 1))
                    for i in range(50)])
    MethodChoice.insert([dict(project="p", session_id=i, method=i % 2) for i in range(30)])

    # semijoin: sessions having a choice
    assert len(Session & MethodChoice) == 30
    # antijoin: sessions without a choice
    assert len(Session - MethodChoice) == 20
    # restricted operand pushes through
    assert len(Session & (MethodChoice & {"method": 1})) == 15
    # restriction lists become OR
    assert len(Session & [{"session_id": 1}, {"session_id": 2}]) == 2
    # empty list matches nothing (DataJoint convention)
    assert len(Session & []) == 0


def test_string_restriction_quote_translation(schema):
    """MySQL-style double-quoted literals translate correctly, including
    literals containing quote characters (a blind swap corrupts these)."""
    from posepipeline_tpu.core.engine import Manual, _translate_restriction_string

    assert _translate_restriction_string('name="x"') == "name='x'"
    assert _translate_restriction_string('''name="o'brien"''') == "name='o''brien'"
    assert _translate_restriction_string("name='already'") == "name='already'"
    assert _translate_restriction_string('a="x" AND b="y"') == "a='x' AND b='y'"

    @schema
    class Named(Manual):
        definition = """
        name: varchar(64)
        ---
        val: int
        """

    Named.insert([{"name": "o'brien", "val": 1}, {"name": "plain", "val": 2}])
    assert (Named & '''name="o'brien"''').fetch1("val") == 1
    assert (Named & 'name="plain"').fetch1("val") == 2


def test_delete_cascades_to_dependents(schema):
    """DataJoint semantics: (Parent & key).delete() removes dependent rows
    depth-first; delete_quick removes only the addressed rows."""
    from posepipeline_tpu.core.engine import Computed, Manual

    @schema
    class Session(Manual):
        definition = """
        session_id: int
        ---
        note: varchar(32)
        """

    @schema
    class Feature(Computed):
        definition = """
        -> Session
        ---
        val: int
        """

        def make(self, key):
            self.insert1(dict(key, val=key["session_id"] * 10))

    @schema
    class Summary(Computed):
        definition = """
        -> Feature
        ---
        total: int
        """

        def make(self, key):
            self.insert1(dict(key, total=(Feature & key).fetch1("val") + 1))

    Session.insert([{"session_id": i, "note": f"s{i}"} for i in range(3)])
    Feature.populate()
    Summary.populate()
    assert len(Feature()) == 3 and len(Summary()) == 3

    (Session & "session_id=1").delete()
    assert len(Session()) == 2
    assert len(Feature()) == 2          # cascade removed the dependent row
    assert len(Summary()) == 2          # ...two levels deep
    assert len(Feature & "session_id=1") == 0

    # delete_quick: no cascade
    (Feature & "session_id=2").delete_quick()
    assert len(Feature()) == 1
    assert len(Summary & "session_id=2") == 1   # survivor (quick = no cascade)


def test_restriction_by_disjoint_expression(schema):
    """Restricting by an expression sharing no attributes: nonempty operand
    keeps all rows, empty operand keeps none (DataJoint universal-set rule)."""
    from posepipeline_tpu.core.engine import Manual

    @schema
    class Left(Manual):
        definition = """
        left_id: int
        """

    @schema
    class Right(Manual):
        definition = """
        right_id: int
        """

    Left.insert([{"left_id": i} for i in range(3)])
    assert len(Left & Right) == 0          # Right empty -> no match
    Right.insert1({"right_id": 9})
    assert len(Left & Right) == 3          # Right nonempty -> all match
    assert len(Left - Right) == 0          # antijoin mirror


def test_fetch_multi_column_order_by(schema):
    """order_by accepts multiple columns ("a, b desc" or a list) — ported
    notebooks rely on DataJoint's multi-term sorting."""
    from posepipeline_tpu.core.engine import Manual

    @schema
    class Ordered(Manual):
        definition = """
        oid: int
        ---
        grp: int
        val: int
        """

    rows = [
        {"oid": 0, "grp": 1, "val": 5},
        {"oid": 1, "grp": 0, "val": 9},
        {"oid": 2, "grp": 1, "val": 7},
        {"oid": 3, "grp": 0, "val": 3},
    ]
    Ordered.insert(rows)
    got = Ordered().fetch("oid", order_by="grp, val desc")
    assert list(got) == [1, 3, 2, 0]
    got2 = Ordered().fetch("oid", order_by=["grp", "val desc"])
    assert list(got2) == [1, 3, 2, 0]


def test_populate_order(schema):
    """populate(order=...) is honored: 'reverse' computes keys backwards,
    'random' still computes them all, bad values raise."""
    import pytest

    from posepipeline_tpu.core.engine import Computed, Manual

    order_seen = []

    @schema
    class Src(Manual):
        definition = """
        sid: int
        """

    @schema
    class Out(Computed):
        definition = """
        -> Src
        ---
        double: int
        """

        def make(self, key):
            order_seen.append(key["sid"])
            self.insert1(dict(key, double=key["sid"] * 2))

    Src.insert([{"sid": i} for i in range(4)])
    Out.populate(order="reverse")
    assert order_seen == [3, 2, 1, 0]
    assert len(Out()) == 4
    (Out() & "sid >= 0").delete()
    order_seen.clear()
    Out.populate(order="random")
    assert sorted(order_seen) == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        Out.populate(order="sideways")
