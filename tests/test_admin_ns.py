import pytest
from pyspark.sql import functions as F

from cm_well_spark.functions.namespaces import DEFAULT_NAMESPACES, NamespaceError, NamespaceRegistry
from cm_well_spark.operators.admin import (
    ZzStore,
    audit,
    delete_recursive_commands,
    overwrite,
    proc_infotons,
    purge_history,
    purge_path,
    tracking_status,
    assign_tracking_ids,
)
from cm_well_spark.parsers.qp import parse_qp
from cm_well_spark.plans.compile import compile_filter


# ---- F9 namespaces -------------------------------------------------------


def test_ns_prefix_resolution():
    reg = NamespaceRegistry({"rel": "http://purl.org/vocab/relationship"})
    assert reg.internal_name("friendOf.rel") == "friendOf"
    assert reg.internal_name("plain") == "plain"
    assert reg.internal_name("system.path") == "system.path"


def test_ns_uri_resolution():
    reg = DEFAULT_NAMESPACES
    assert reg.internal_name("$http://purl.org/vocab/relationship/friendOf$") == "friendOf"


def test_ns_unknown_prefix_rejected():
    with pytest.raises(NamespaceError, match="unknown namespace prefix"):
        DEFAULT_NAMESPACES.internal_name("x.nosuchns")


def test_ns_filter_rewrite_end_to_end(infotons):
    reg = NamespaceRegistry({"tpch": "x"})
    ff = reg.resolve_filter(parse_qp("rdfType.tpch::Nation,nationkey.tpch>20"))
    n = infotons.where(compile_filter(ff)).count()
    assert n == 4  # nationkeys 21..24


# ---- S7 overwrite --------------------------------------------------------


def test_overwrite_appends_versions(infotons, spark):
    rows = infotons.where("path = '/tpch/region/0'").withColumn(
        "index_time", F.col("index_time") + 1000
    ).withColumn("uuid", F.lit("ow-uuid-1"))
    out = overwrite(infotons, rows)
    hist = out.where("path = '/tpch/region/0'").orderBy("index_time").collect()
    assert len(hist) == 2
    assert [r["current"] for r in hist] == [False, True]
    assert hist[1]["uuid"] == "ow-uuid-1"


# ---- S8 purge ------------------------------------------------------------


def test_purge_all_and_history(infotons, spark):
    from cm_well_spark.operators.merge import apply_commands

    out = purge_path(infotons, "/tpch/region/0")
    assert out.where("path = '/tpch/region/0'").count() == 0
    # build a history then purge it
    from datetime import datetime

    from cm_well_spark.operators.merge import COMMAND_SCHEMA

    def sfv(v):
        return {"value": v, "vtype": "s", "lang": None, "quad": None, "num": None, "ts": None, "bool": None}

    cmds = spark.createDataFrame(
        [("/tpch/region/1", 1, "write", {"t": [sfv("x")]}, None, datetime(2024, 1, 1), "https")], COMMAND_SCHEMA
    )
    t = apply_commands(infotons, cmds)
    assert t.where("path = '/tpch/region/1'").count() == 2
    t2 = purge_history(t, "/tpch/region/1")
    left = t2.where("path = '/tpch/region/1'").collect()
    assert len(left) == 1 and left[0]["current"]


def test_delete_recursive(infotons, spark):
    from cm_well_spark.operators.merge import apply_commands

    cmds = delete_recursive_commands(spark, infotons, "/tpch/region")
    assert cmds.count() == 5
    t = apply_commands(infotons, cmds)
    cur = t.where(F.col("path").startswith("/tpch/region/") & F.col("current"))
    kinds = {r["kind"] for r in cur.collect()}
    assert kinds == {"DeletedInfoton"}
    # search no longer sees them
    from cm_well_spark.operators.search import list_children

    assert list_children(t, "/tpch/region") .count() == 0


# ---- S10 zz --------------------------------------------------------------


def test_zz_store(spark, tmp_path):
    zz = ZzStore(spark, str(tmp_path / "zz"))
    zz.put("a", b"hello")
    zz.put("b", b"world")
    zz.put("a", b"hello2")  # overwrite
    assert zz.get("a") == b"hello2"
    assert zz.get("missing") is None
    assert zz.list_keys() == ["a", "b"]


# ---- S11 /proc -----------------------------------------------------------


def test_proc_infotons(infotons):
    rows = {r["kind"]: r for r in proc_infotons(infotons).collect()}
    assert rows["ObjectInfoton"]["current_rows"] > 0
    assert rows["ObjectInfoton"]["path"] == "/proc/kind/ObjectInfoton"


# ---- W6 tracking ---------------------------------------------------------


def test_tracking(infotons, spark):
    from datetime import datetime

    from cm_well_spark.operators.merge import COMMAND_SCHEMA, apply_commands

    def sfv(v):
        return {"value": v, "vtype": "s", "lang": None, "quad": None, "num": None, "ts": None, "bool": None}

    cmds = spark.createDataFrame(
        [("/tpch/region/3", 1, "write", {"t": [sfv("x")]}, None, datetime(2024, 1, 1), "https")], COMMAND_SCHEMA
    )
    tid, tracked = assign_tracking_ids(cmds)
    t = apply_commands(infotons, cmds)
    status = tracking_status(t, tracked).collect()
    assert status[0]["status"] == "Done" and status[0]["tracking_id"] == tid


# ---- W7 audit ------------------------------------------------------------


def test_audit_clean_table(infotons):
    rows = {r["check"]: r["violations"] for r in audit(infotons).collect()}
    assert all(v == 0 for v in rows.values()), rows


def test_audit_detects_double_current(infotons, spark):
    dup = infotons.where("path = '/tpch/region/0'")
    broken = infotons.unionByName(dup)
    rows = {r["check"]: r["violations"] for r in audit(broken).collect()}
    assert rows["exactly_one_current_per_path"] == 1


# ---- F9 type-set expansion (RawFieldFilter.scala:103-148, ManglingTests) ---


TYPED_NT = [
    '<http://e.org/a> <http://e.org/val> "33"^^<http://www.w3.org/2001/XMLSchema#long> .',
    '<http://e.org/b> <http://e.org/val> "33" .',
    '<http://e.org/c> <http://e.org/val> "44"^^<http://www.w3.org/2001/XMLSchema#long> .',
    '<http://e.org/d> <http://e.org/other> "x" .',
]


@pytest.fixture()
def mixed_typed(spark):
    from cm_well_spark.model.lakehouse import triples_of
    from cm_well_spark.sources.rdf import infotons_from_rdf, parse_rdf_lines

    lines = spark.createDataFrame([(l,) for l in TYPED_NT], ["value"])
    docs = infotons_from_rdf(parse_rdf_lines(lines))
    inf = docs.withColumn("current", F.lit(True)).withColumn("kind", F.lit("ObjectInfoton")).withColumn(
        "parent", F.lit("/e.org")
    )
    return inf, triples_of(inf.withColumn("index_time", F.lit(1)))


def test_types_cache_builds_from_triples(mixed_typed):
    from cm_well_spark.functions.types_cache import FieldTypesCache

    _, tri = mixed_typed
    cache = FieldTypesCache.from_triples(tri)
    assert set(cache.field_vtypes["val"]) == {"l", "s"}
    assert cache.field_vtypes["other"] == ("s",)


def test_expand_multi_typed_to_should_group(mixed_typed):
    from cm_well_spark.functions.types_cache import FieldTypesCache
    from cm_well_spark.parsers.qp import MultiFieldFilter, parse_qp
    from cm_well_spark.plans.compile import compile_filter

    inf, tri = mixed_typed
    cache = FieldTypesCache.from_triples(tri)
    expanded = cache.expand_filter(parse_qp("val::33"))
    assert isinstance(expanded, MultiFieldFilter)
    assert {f.name for f in expanded.filters} == {"l$val", "s$val"}
    # expansion matches BOTH the long-typed and string-typed docs
    got = {r["path"] for r in inf.where(compile_filter(expanded)).select("path").collect()}
    assert got == {"/e.org/a", "/e.org/b"}


def test_mangled_name_restricts_to_type(mixed_typed):
    from cm_well_spark.parsers.qp import parse_qp
    from cm_well_spark.plans.compile import compile_filter

    inf, _ = mixed_typed
    only_long = {r["path"] for r in inf.where(compile_filter(parse_qp("l$val::33"))).collect()}
    only_str = {r["path"] for r in inf.where(compile_filter(parse_qp("s$val::33"))).collect()}
    assert only_long == {"/e.org/a"} and only_str == {"/e.org/b"}


def test_single_typed_field_expands_to_mangled(mixed_typed):
    from cm_well_spark.functions.types_cache import FieldTypesCache
    from cm_well_spark.parsers.qp import SingleFieldFilter, parse_qp

    _, tri = mixed_typed
    cache = FieldTypesCache.from_triples(tri)
    out = cache.expand_filter(parse_qp("other::x"))
    assert isinstance(out, SingleFieldFilter) and out.name == "s$other"


def test_replace_graph_retracts_and_versions(infotons):
    from pyspark.sql import functions as F

    from cm_well_spark.operators.admin import replace_graph

    out = replace_graph(infotons, "/graphs/src3")
    # affected docs: new current version without the source field
    affected_cur = out.where(
        F.col("current") & F.col("path").startswith("/docs/")
        & F.col("fields").getItem("source").isNull()
    )
    n_src3 = infotons.where(
        F.col("current")
        & F.coalesce(
            F.exists(
                F.col("fields").getItem("source"), lambda v: v["quad"] == "/graphs/src3"
            ),
            F.lit(False),
        )
    ).count()
    assert affected_cur.count() == n_src3 > 0
    # history retained: each affected path now has one extra version
    one = affected_cur.select("path").first()["path"]
    assert out.where(F.col("path") == one).count() == infotons.where(F.col("path") == one).count() + 1
    assert out.where((F.col("path") == one) & F.col("current")).count() == 1
    # untouched rows pass through: non-doc current count unchanged
    before = infotons.where(F.col("current") & ~F.col("path").startswith("/docs/")).count()
    after = out.where(F.col("current") & ~F.col("path").startswith("/docs/")).count()
    assert before == after
