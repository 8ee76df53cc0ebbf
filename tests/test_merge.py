"""Merge-writer tests — the FX6 behaviors (Merger.scala:55-239) plus
hypothesis property tests for the pure fold."""

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings, strategies as st

from cm_well_spark.operators.merge import (
    COMMAND_SCHEMA,
    apply_command,
    apply_commands,
    content_uuid,
    delete_fields_f,
    merge_fields,
    merge_versions,
)


def fv(value, quad=None, lang=None):
    return {"value": value, "vtype": "s", "lang": lang, "quad": quad, "num": None, "ts": None, "bool": None}


# ---- pure logic ----------------------------------------------------------


def test_field_union_on_rewrite():
    a = {"x": [fv("1")], "y": [fv("a")]}
    b = {"x": [fv("2")], "z": [fv("b")]}
    m = merge_fields(a, b)
    assert {v["value"] for v in m["x"]} == {"1", "2"}
    assert "y" in m and "z" in m


def test_union_dedups_same_value_quad():
    m = merge_fields({"x": [fv("1")]}, {"x": [fv("1")]})
    assert len(m["x"]) == 1


def test_value_precise_delete():
    cur = {"x": [fv("1"), fv("2")]}
    out = delete_fields_f(cur, {"x": [fv("1")]})
    assert [v["value"] for v in out["x"]] == ["2"]


def test_field_wipe_empty_set():
    cur = {"x": [fv("1")], "y": [fv("2")]}
    out = delete_fields_f(cur, {"x": []})
    assert "x" not in out and "y" in out


def test_quad_precise_delete():
    cur = {"x": [fv("1", quad="/g/a"), fv("1", quad="/g/b"), fv("1")]}
    out = delete_fields_f(cur, {"x": [fv("1", quad="/g/a")]})
    quads = {v.get("quad") for v in out["x"]}
    assert quads == {"/g/b", None}


def test_quad_wildcard_value_delete():
    cur = {"x": [fv("1", quad="/g/a"), fv("1", quad="/g/b"), fv("2")]}
    out = delete_fields_f(cur, {"x": [fv("1", quad="*")]})
    assert [v["value"] for v in out["x"]] == ["2"]


def test_untagged_only_delete():
    # quad None in the delete spec matches only untagged values
    cur = {"x": [fv("1", quad="/g/a"), fv("1")]}
    out = delete_fields_f(cur, {"x": [fv("1")]})
    assert [v.get("quad") for v in out["x"]] == ["/g/a"]


def test_star_field_quad_delete():
    # {'*': [FNull(quad)]} deletes every value tagged with that quad in ANY field
    cur = {"x": [fv("1", quad="/g/a"), fv("2")], "y": [fv("3", quad="/g/a")]}
    out = delete_fields_f(cur, {"*": [fv(None, quad="/g/a")]})
    assert [v["value"] for v in out["x"]] == ["2"]
    assert "y" not in out


def test_delete_then_add_in_one_update():
    state = ("ObjectInfoton", {"x": [fv("old")]})
    state = apply_command(state, {"op": "update", "delete_fields": {"x": []}, "fields": {"x": [fv("new")]}})
    assert [v["value"] for v in state[1]["x"]] == ["new"]


def test_delete_all_fields_tombstones():
    state = ("ObjectInfoton", {"x": [fv("1")]})
    state = apply_command(state, {"op": "delete_attributes", "delete_fields": {"x": []}})
    assert state[0] == "DeletedInfoton"


def test_write_after_delete_resurrects():
    state = ("DeletedInfoton", {})
    state = apply_command(state, {"op": "write", "fields": {"x": [fv("1")]}})
    assert state == ("ObjectInfoton", {"x": [fv("1")]})


def test_delete_on_delete_noop():
    state = ("DeletedInfoton", {})
    state = apply_command(state, {"op": "delete_attributes", "delete_fields": {"x": []}})
    assert state[0] == "DeletedInfoton"


def test_uuid_deterministic_and_content_addressed():
    lm = datetime(2021, 1, 1, tzinfo=timezone.utc)
    u1 = content_uuid("/a", lm, {"x": [fv("1")]})
    u2 = content_uuid("/a", lm, {"x": [fv("1")]})
    u3 = content_uuid("/a", lm, {"x": [fv("2")]})
    assert u1 == u2 != u3


# ---- property tests (reference test strategy: randomized command folds) --

_val = st.text(alphabet="abc", min_size=1, max_size=2)
_quad = st.sampled_from([None, "/g/1", "/g/2"])
_field = st.sampled_from(["f1", "f2", "f3"])


@st.composite
def _command(draw):
    op = draw(st.sampled_from(["write", "update", "delete_attributes", "delete_path"]))
    fields = {}
    deletes = {}
    if op in ("write", "update"):
        for f in draw(st.lists(_field, max_size=2, unique=True)):
            fields[f] = [fv(draw(_val), draw(_quad)) for _ in range(draw(st.integers(1, 2)))]
    if op in ("update", "delete_attributes"):
        for f in draw(st.lists(_field, max_size=2, unique=True)):
            if draw(st.booleans()):
                deletes[f] = []
            else:
                deletes[f] = [fv(draw(_val), draw(st.sampled_from([None, "*", "/g/1"])))]
    return {"op": op, "fields": fields, "delete_fields": deletes}


@given(st.lists(_command(), max_size=8))
@settings(max_examples=200, deadline=None)
def test_fold_invariants(cmds):
    state = ("missing", {})
    for c in cmds:
        state = apply_command(state, c)
        kind, fields = state
        # invariant: no empty value-sets survive
        assert all(len(vs) > 0 for vs in fields.values())
        # invariant: tombstone <=> no fields
        if kind == "DeletedInfoton":
            assert fields == {}
        # invariant: kind is well-defined
        assert kind in ("ObjectInfoton", "DeletedInfoton")
        # write resurrection: a write command always yields a live infoton
        if c["op"] == "write" and c["fields"]:
            assert kind == "ObjectInfoton"


@given(st.dictionaries(_field, st.lists(st.builds(lambda v, q: fv(v, q), _val, _quad), max_size=3), max_size=3))
@settings(max_examples=100, deadline=None)
def test_merge_idempotent(fields):
    m1 = merge_fields(fields, fields)
    # union with itself is itself (set semantics)
    assert {k: {(v["value"], v["quad"]) for v in vs} for k, vs in m1.items()} == {
        k: {(v["value"], v["quad"]) for v in vs} for k, vs in fields.items() if vs
    }


# ---- Spark surface -------------------------------------------------------


@pytest.fixture()
def commands_df(spark):
    lm = datetime(2024, 1, 1)
    rows = [
        # two writes to region 0: field union
        ("/tpch/region/0", 1, "write", {"extra": [fv("e1")]}, None, lm, "https"),
        ("/tpch/region/0", 2, "write", {"extra": [fv("e2")]}, None, lm, "https"),
        # delete the name of region 1
        ("/tpch/region/1", 1, "delete_attributes", None, {"name": []}, lm, "https"),
        # tombstone region 2 then resurrect
        ("/tpch/region/2", 1, "delete_path", None, None, lm, "https"),
        ("/tpch/region/2", 2, "write", {"name": [fv("REBORN")]}, None, lm, "https"),
        # brand new path
        ("/tpch/region/99", 1, "write", {"name": [fv("NEWREGION")]}, None, lm, "https"),
    ]
    return spark.createDataFrame(rows, COMMAND_SCHEMA)


def test_merge_versions_spark(infotons, commands_df):
    out = merge_versions(infotons, commands_df).collect()
    by_path = {}
    for r in out:
        by_path.setdefault(r["path"], []).append(r)
    r0 = sorted(by_path["/tpch/region/0"], key=lambda r: r["seq"])
    f0 = dict(r0[-1]["fields"])
    assert {v["value"] for v in f0["extra"]} == {"e1", "e2"}
    assert {v["value"] for v in f0["name"]} == {"AFRICA"}  # union kept original
    r1 = by_path["/tpch/region/1"][0]
    assert "name" not in dict(r1["fields"] or {})
    r2 = sorted(by_path["/tpch/region/2"], key=lambda r: r["seq"])
    assert r2[0]["kind"] == "DeletedInfoton"
    assert r2[1]["kind"] == "ObjectInfoton"
    r99 = by_path["/tpch/region/99"][0]
    assert dict(r99["fields"])["name"][0]["value"] == "NEWREGION"


def test_apply_commands_versioning(infotons, commands_df):
    table = apply_commands(infotons, commands_df)
    # history retained: region 0 has 3 versions (1 original + 2 writes)
    hist = table.where("path = '/tpch/region/0'").orderBy("index_time").collect()
    assert len(hist) == 3
    assert [r["current"] for r in hist] == [False, False, True]
    # search sees only the latest
    from cm_well_spark.operators.search import read_path, search

    latest = read_path(table, "/tpch/region/0").collect()
    assert len(latest) == 1
    f = dict(latest[0]["fields"])
    assert {v["value"] for v in f["extra"]} == {"e1", "e2"}
    # tombstone resurrect: region 2 current is the reborn object
    r2 = read_path(table, "/tpch/region/2").first()
    assert dict(r2["fields"])["name"][0]["value"] == "REBORN"
    # with-deleted visibility: intermediate tombstone exists in history
    h2 = table.where("path = '/tpch/region/2'").collect()
    assert any(r["kind"] == "DeletedInfoton" for r in h2)
    # untouched paths unchanged
    assert table.where("path = '/tpch/region/3' AND current").count() == 1


def test_null_update_skipped(infotons, spark):
    from datetime import datetime

    from cm_well_spark.operators.merge import COMMAND_SCHEMA, apply_commands

    def sfv(v):
        return {"value": v, "vtype": "s", "lang": None, "quad": None, "num": None, "ts": None, "bool": None}

    cmds = spark.createDataFrame(
        [("/tpch/region/4", 1, "write", {"tag": [sfv("a")]}, None, datetime(2024, 1, 1), "https")],
        COMMAND_SCHEMA,
    )
    t1 = apply_commands(infotons, cmds)
    t2 = apply_commands(t1, cmds)  # identical content -> no new version
    assert t2.where("path = '/tpch/region/4'").count() == 2  # original + 1 merge
    assert t2.where("path = '/tpch/region/4' AND current").count() == 1


def test_top_level_path_hierarchy(spark):
    """r9 sequence-audit fix: sequence(1, 0) runs DESCENDING in Spark,
    so a 2-segment path used to list ITSELF in parent_hierarchy. A
    top-level write must report parent '/' and hierarchy ['/'] only."""
    from datetime import datetime

    from cm_well_spark.operators.merge import COMMAND_SCHEMA, apply_commands
    from cm_well_spark.model.schema import INFOTON_SCHEMA

    sfv = {"value": "v", "vtype": "s", "lang": None, "quad": None,
           "num": None, "ts": None, "bool": None}
    table = spark.createDataFrame([], INFOTON_SCHEMA)
    cmds = spark.createDataFrame(
        [("/toplevel", 1, "write", {"f": [sfv]}, None, datetime(2024, 1, 1), "https"),
         ("/a/b/c", 1, "write", {"f": [sfv]}, None, datetime(2024, 1, 1), "https")],
        COMMAND_SCHEMA,
    )
    out = {r["path"]: r for r in apply_commands(table, cmds).collect()}
    assert out["/toplevel"]["parent"] == "/"
    assert list(out["/toplevel"]["parent_hierarchy"]) == ["/"]
    assert list(out["/a/b/c"]["parent_hierarchy"]) == ["/", "/a", "/a/b"]
