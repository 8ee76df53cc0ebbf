import pytest
from pyspark.sql import functions as F

from cm_well_spark.functions.udfs import FunctionRegistry, StoredQueries
from cm_well_spark.operators.gremlin import g


# ---- §2.10 user functions + stored queries -------------------------------


def test_python_udf_registration(spark, infotons):
    reg = FunctionRegistry(spark)
    reg.register_python("rev_str", lambda s: s[::-1] if s else None)
    infotons.createOrReplaceTempView("inf_udf_test")
    row = spark.sql("SELECT rev_str(path) AS r FROM inf_udf_test WHERE path = '/tpch/region/0'").first()
    assert row["r"] == "/tpch/region/0"[::-1]


def test_sql_function_registration(spark):
    reg = FunctionRegistry(spark)
    reg.register_sql("shout", ["s"], "upper(concat(s, '!'))")
    assert spark.sql("SELECT shout('hi') AS r").first()["r"] == "HI!"


def test_stored_queries_substitution(spark, triples):
    sq = StoredQueries()
    sq.put("by_type", 'SELECT ?x WHERE { ?x <rdfType> "%kind%" }')
    out = sq.run_sparql(triples, "by_type", kind="Region")
    assert out.count() == 5


def test_stored_queries_missing_placeholder():
    sq = StoredQueries()
    sq.put("q", "SELECT %a% FROM t WHERE x = %b%")
    with pytest.raises(ValueError, match="unsubstituted"):
        sq.get("q", a="1")


def test_stored_queries_unknown():
    with pytest.raises(KeyError):
        StoredQueries().get("nope")


# ---- J6 gremlin-style traversal ------------------------------------------


def test_gremlin_out_chain(infotons, triples):
    n = g(infotons, triples).V().has("rdfType", "Customer").out("inNation").out("ofRegion").count()
    assert n == 5  # all regions reachable


def test_gremlin_in_step(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    raw = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_nationkey") == 3).count()
    n = (
        g(infotons, triples)
        .V("/tpch/nation/3")
        .in_("inNation")
        .has("rdfType", "Customer")
        .count()
    )
    assert n == raw


def test_gremlin_values(infotons, triples):
    vals = g(infotons, triples).V("/tpch/nation/3").out("ofRegion").values("name").collect()
    assert len(vals) == 1 and vals[0]["value"].isupper()


def test_gremlin_ghost_skip(infotons, triples):
    # events point at /users/* ghosts: out() lands nowhere
    n = g(infotons, triples).V().has("rdfType", "Event").out("byUser").count()
    assert n == 0


def test_gremlin_both(infotons, triples):
    # nation 3: out(ofRegion) -> 1 region; in(inNation) -> customers+suppliers
    t = g(infotons, triples).V("/tpch/nation/3")
    assert t.both("ofRegion").count() == 1  # only the region (no one points at nation/3 via ofRegion)


# ---- T2 mstream ----------------------------------------------------------


def test_mstream_partitions(infotons):
    from cm_well_spark.operators.consume import mstream, sstream_partition_counts

    n_parts, df = mstream(infotons, path="/tpch/nation")
    assert n_parts >= 1 and df.count() == 25
    counts = sstream_partition_counts(infotons, path="/tpch/nation")
    assert counts.agg(F.sum("count")).first()[0] == 25


def test_gremlin_full_vertex_no_broadcast_hint(infotons, triples):
    # V() = whole vertex set: the hop must NOT carry a static broadcast
    # hint (AQE decides at runtime); explicit V(paths) seeds MUST carry it
    full = g(infotons, triples).V().out("inNation").paths()
    plan = full._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in plan.lower()
    seeded = g(infotons, triples).V("/tpch/nation/3").in_("inNation").paths()
    plan = seeded._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" in plan.lower()


def test_gremlin_filter_numeric(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    n = (
        g(infotons, triples)
        .V()
        .has("rdfType", "Order")
        .filter("totalprice", ">", 400000)
        .count()
    )
    raw = tbl.load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    assert n == raw.count()


def test_gremlin_loop_emits_chain(infotons, triples):
    got = sorted(
        r["path"]
        for r in g(infotons, triples).V("/events/40").loop(3, "prevEvent").paths().collect()
    )
    assert got == [f"/events/{i}" for i in (37, 38, 39, 40)]


def test_gremlin_repeat_final_only(infotons, triples):
    got = [
        r["path"]
        for r in g(infotons, triples)
        .V("/events/40")
        .repeat(3, lambda t: t.out("prevEvent"))
        .paths()
        .collect()
    ]
    assert got == ["/events/37"]


def test_gremlin_as_back(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    t = (
        g(infotons, triples)
        .V()
        .has("rdfType", "Order")
        .as_("o")
        .out("byCustomer")
        .has("mktsegment", "BUILDING")
        .back("o")
    )
    raw = (
        tbl.load_table(spark, sf_dir, "orders")
        .join(
            tbl.load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    assert t.count() == raw.count()


def test_gremlin_select_and_path(infotons, triples):
    t = (
        g(infotons, triples)
        .V("/tpch/nation/3")
        .as_("n")
        .out("ofRegion")
        .as_("r")
        .out()  # region has no outgoing refs -> empty
    )
    assert t.count() == 0
    t2 = g(infotons, triples).V("/tpch/nation/3").as_("n").out("ofRegion")
    rows = t2.select("n").collect()
    assert len(rows) == 1 and rows[0]["n"] == "/tpch/nation/3"
    trail = t2.path().collect()[0]
    assert trail["n"] == "/tpch/nation/3" and trail["path"].startswith("/tpch/region/")


def test_gremlin_back_unknown_label(infotons, triples):
    with pytest.raises(ValueError, match="no step labeled"):
        g(infotons, triples).V("/tpch/nation/3").back("nope")


def test_gremlin_dedup_and_where(infotons, triples):
    t = (
        g(infotons, triples)
        .V()
        .has("rdfType", "Nation")
        .out("ofRegion")
        .dedup()
    )
    assert t.count() == 5
    t2 = g(infotons, triples).V().has("rdfType", "Nation").where_(
        F.element_at(F.col("fields").getItem("name"), 1)["value"] == "NATION_3"
    )
    assert t2.count() == 1


def test_gremlin_string_eval_chain(infotons, triples):
    from cm_well_spark.operators.gremlin import eval_gremlin

    out = eval_gremlin(
        infotons,
        triples,
        'g.V("/tpch/nation/3").out("ofRegion").values("name")',
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["path"].startswith("/tpch/region/") and rows[0]["value"]


def test_gremlin_string_eval_back(infotons, triples):
    from cm_well_spark.operators.gremlin import eval_gremlin, g

    s = eval_gremlin(
        infotons,
        triples,
        'g.V().has("rdfType", "Order").filter("totalprice", ">", 400000)'
        '.as("o").out("byCustomer").has("mktsegment", "BUILDING").back("o").count()',
    )
    fluent = (
        g(infotons, triples).V().has("rdfType", "Order").filter("totalprice", ">", 400000)
        .as_("o").out("byCustomer").has("mktsegment", "BUILDING").back("o").count()
    )
    assert s == fluent > 0


def test_gremlin_string_eval_errors(infotons, triples):
    import pytest

    from cm_well_spark.operators.gremlin import GremlinParseError, eval_gremlin

    with pytest.raises(GremlinParseError, match="must start at the graph"):
        eval_gremlin(infotons, triples, 'V().count()')
    with pytest.raises(GremlinParseError, match="unsupported gremlin step"):
        eval_gremlin(infotons, triples, 'g.V().frobnicate()')
    with pytest.raises(GremlinParseError, match="must end the chain"):
        eval_gremlin(infotons, triples, 'g.V().count().out("x")')


def test_gremlin_closure_filter_matches_declarative(infotons, triples):
    from cm_well_spark.operators.gremlin import eval_gremlin, g

    got = eval_gremlin(
        infotons, triples,
        'g.V().has("rdfType", "Order").filter{it.totalprice > 400000}.count()',
    )
    want = g(infotons, triples).V().has("rdfType", "Order").filter("totalprice", ">", 400000).count()
    assert got == want > 0
    # getProperty access + string equality
    got2 = eval_gremlin(
        infotons, triples,
        'g.V().filter{it.getProperty("mktsegment") == "BUILDING"}.count()',
    )
    want2 = g(infotons, triples).V().filter("mktsegment", "==", "BUILDING").count()
    assert got2 == want2 > 0


def test_gremlin_closure_connectives_and_contains(infotons, triples):
    from cm_well_spark.operators.gremlin import eval_gremlin, g

    conj = eval_gremlin(
        infotons, triples,
        'g.V().filter{it.mktsegment == "BUILDING" && it.acctbal > 5000}.count()',
    )
    want = (
        g(infotons, triples).V()
        .filter("mktsegment", "==", "BUILDING").filter("acctbal", ">", 5000).count()
    )
    assert conj == want > 0
    disj = eval_gremlin(
        infotons, triples,
        'g.V().filter{it.mktsegment == "BUILDING" || it.mktsegment == "MACHINERY"}.count()',
    )
    b = g(infotons, triples).V().filter("mktsegment", "==", "BUILDING").count()
    m = g(infotons, triples).V().filter("mktsegment", "==", "MACHINERY").count()
    assert disj == b + m
    sub = eval_gremlin(
        infotons, triples, 'g.V().filter{it["name"].contains("widget")}.count()'
    )
    assert sub == g(infotons, triples).V().filter("name", "contains", "widget").count() > 0


def test_gremlin_closure_rejects_unsupported(infotons, triples):
    import pytest

    from cm_well_spark.operators.gremlin import GremlinParseError, eval_gremlin

    with pytest.raises(GremlinParseError, match="single connective"):
        eval_gremlin(
            infotons, triples,
            'g.V().filter{it.a == "x" && it.b == "y" || it.c == "z"}.count()',
        )
    with pytest.raises(GremlinParseError, match="unsupported closure term"):
        eval_gremlin(infotons, triples, 'g.V().filter{it.out("x").count() > 2}.count()')
    with pytest.raises(GremlinParseError, match="filter"):
        eval_gremlin(infotons, triples, 'g.V().has{it.x == 1}.count()')


def test_gremlin_order_limit_groupcount(infotons, triples):
    t = g(infotons, triples).V().has("rdfType", "Nation")
    top = t.order("name", desc=True).limit(3).paths().collect()
    assert len(top) == 3
    gc = {r["value"]: r["n"] for r in t.group_count("ofRegion").collect()}
    assert len(gc) == 5 and all(n == 5 for n in gc.values())
    # string front-end
    from cm_well_spark.operators.gremlin import eval_gremlin

    out = eval_gremlin(
        infotons, triples, 'g.V().has("rdfType", "Nation").groupCount("ofRegion")'
    )
    assert {r["value"]: r["n"] for r in out.collect()} == gc


def test_gremlin_range_slice(infotons, triples):
    """range(lo, hi) = the INCLUSIVE ordered slice, not limit(hi)
    (VERDICT r5 / ADVICE fix)."""
    t = g(infotons, triples).V().has("rdfType", "Nation").order("name")
    all_sorted = [r["path"] for r in t.frontier.select("path").collect()]
    sliced = {r["path"] for r in t.range(5, 10).paths().collect()}
    assert sliced == set(all_sorted[5:11])
    assert len(sliced) == 6
    # degenerate one-element slice
    one = {r["path"] for r in t.range(3, 3).paths().collect()}
    assert one == {all_sorted[3]}
    import pytest

    with pytest.raises(ValueError, match="invalid range"):
        t.range(5, 2)


def test_gremlin_string_range_and_float_args(infotons, triples):
    from cm_well_spark.operators.gremlin import eval_gremlin

    # string front-end range maps to the slice
    fluent = g(infotons, triples).V().has("rdfType", "Nation").order("name").range(2, 4)
    s = eval_gremlin(
        infotons, triples, 'g.V().has("rdfType", "Nation").order("name").range(2, 4)'
    )
    assert {r["path"] for r in s.collect()} == {r["path"] for r in fluent.paths().collect()}
    # unquoted float args must not split the step chain (ADVICE fix)
    n = eval_gremlin(
        infotons, triples,
        'g.V().has("rdfType", "Order").filter("totalprice", ">", 400000.5).count()'
    )
    assert isinstance(n, int) and n > 0


# ---------------------------------------------------------------------------
# string front-end error contract (fuzz)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=120))
def test_gremlin_parser_never_leaks_foreign_exceptions(infotons, triples, payload):
    """Arbitrary input either evaluates or raises GremlinParseError —
    never an IndexError/ValueError escape from the segment splitter or
    argument parser (the same contract the qp/SPARQL/_sp parsers pin)."""
    from cm_well_spark.operators.gremlin import GremlinParseError, eval_gremlin

    try:
        eval_gremlin(infotons, triples, payload)
    except GremlinParseError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ['out("a")', 'in("b")', "both()", 'has("rdfType", "Nation")', "dedup()"]
        ),
        min_size=0,
        max_size=4,
    ),
    st.sampled_from(["paths()", "count()"]),
)
def test_gremlin_wellformed_chains_always_evaluate(infotons, triples, steps, terminal):
    from cm_well_spark.operators.gremlin import eval_gremlin

    q = "g.V()" + "".join("." + s for s in steps) + "." + terminal
    eval_gremlin(infotons, triples, q)  # must not raise


def test_gremlin_closure_arithmetic_and_string_methods(infotons, triples):
    """r7 closure-grammar extension: arithmetic on the property, string
    methods beyond contains, case-fold equality, and length — each
    checked against an equivalent plain formulation."""
    from cm_well_spark.operators.gremlin import eval_gremlin, g

    # it.x * 2 > N == it.x > N/2
    got = eval_gremlin(
        infotons, triples,
        'g.V().has("rdfType", "Order").filter{it.totalprice * 2 > 800000}.count()',
    )
    want = g(infotons, triples).V().has("rdfType", "Order").filter("totalprice", ">", 400000).count()
    assert got == want > 0
    # subtraction with a float literal
    got = eval_gremlin(
        infotons, triples,
        'g.V().has("rdfType", "Order").filter{it.totalprice - 0.5 >= 399999.5}.count()',
    )
    assert got == want
    # startsWith / endsWith vs regex matches
    sw = eval_gremlin(infotons, triples, 'g.V().filter{it.name.startsWith("NATION_1")}.count()')
    rx = eval_gremlin(infotons, triples, 'g.V().filter{it.name.matches("NATION_1.*")}.count()')
    assert sw == rx > 0
    ew = eval_gremlin(infotons, triples, 'g.V().filter{it.name.endsWith("_2")}.count()')
    rx2 = eval_gremlin(infotons, triples, 'g.V().filter{it.name.matches(".*_2")}.count()')
    assert ew == rx2 > 0
    # case-fold equality
    lc = eval_gremlin(infotons, triples, 'g.V().filter{it.mktsegment.toLowerCase() == "building"}.count()')
    assert lc == g(infotons, triples).V().filter("mktsegment", "==", "BUILDING").count() > 0
    # length comparison
    ln = eval_gremlin(infotons, triples, 'g.V().filter{it.mktsegment.length() == 8}.count()')
    assert ln == g(infotons, triples).V().filter("mktsegment", "==", "BUILDING").count()


def test_gremlin_closure_arithmetic_rejects_string_target(infotons, triples):
    import pytest

    from cm_well_spark.operators.gremlin import GremlinParseError, eval_gremlin

    with pytest.raises(GremlinParseError, match="numeric comparison target"):
        eval_gremlin(infotons, triples, 'g.V().filter{it.x * 2 == "ten"}.count()')


def test_gremlin_aggregate_except_fof(infotons, triples):
    """Blueprints side-effect steps (VERDICT r9 missing item 5): the
    classic two-hop-minus-one-hop — nations reachable from a customer's
    nation via region, EXCLUDING the already-visited frontier, via
    aggregate + except (AggregatePipe/ExceptFilterPipe semantics)."""
    t = (
        g(infotons, triples)
        .V("/tpch/customer/1")
        .out("inNation")
        .aggregate("seen")
        .out("ofRegion")
        .in_("ofRegion")
        .except_("seen")
    )
    got = {r["path"] for r in t.paths().collect()}
    # the one-hop nation itself was excluded
    one_hop = {
        r["path"]
        for r in g(infotons, triples).V("/tpch/customer/1").out("inNation").paths().collect()
    }
    assert one_hop and not (got & one_hop)
    # siblings = nations in the same region minus the origin
    siblings = {
        r["path"]
        for r in g(infotons, triples)
        .V("/tpch/customer/1")
        .out("inNation")
        .out("ofRegion")
        .in_("ofRegion")
        .paths()
        .collect()
    } - one_hop
    assert got == siblings


def test_gremlin_store_retain_and_cap(infotons, triples):
    t = g(infotons, triples).V().has("rdfType", "Region").store("regions")
    # retain keeps only members of the named set
    kept = t.V("/tpch/region/0", "/tpch/nation/3").retain("regions")
    assert {r["path"] for r in kept.paths().collect()} == {"/tpch/region/0"}
    # cap emits the stored set itself
    assert kept.cap("regions").count() == 5
    import pytest as _pt

    with _pt.raises(ValueError, match="no side-effect set"):
        t.except_("ghost")


def test_gremlin_table_and_tree(infotons, triples):
    t = (
        g(infotons, triples)
        .V("/tpch/nation/3")
        .as_("n")
        .out("ofRegion")
        .as_("r")
    )
    tab = t.table().collect()
    assert len(tab) == 1 and tab[0]["n"] == "/tpch/nation/3"
    assert tab[0]["r"] == tab[0]["path"]  # current position == last label
    tr = {(r["depth"], r["parent"], r["child"]) for r in t.tree().collect()}
    region = tab[0]["r"]
    assert tr == {
        (0, "/tpch/nation/3", region),
        (1, region, region),  # trail closes at the current position
    }


def test_gremlin_string_eval_side_effects(infotons, triples):
    from cm_well_spark.operators.gremlin import eval_gremlin

    out = eval_gremlin(
        infotons,
        triples,
        'g.V("/tpch/customer/1").out("inNation").aggregate("seen")'
        '.out("ofRegion").in("ofRegion").except("seen").paths()',
    )
    one_hop = {
        r["path"]
        for r in g(infotons, triples).V("/tpch/customer/1").out("inNation").paths().collect()
    }
    got = {r["path"] for r in out.collect()}
    assert got and not (got & one_hop)
    cap = eval_gremlin(
        infotons, triples, 'g.V().has("rdfType", "Region").store("s").cap("s")'
    )
    assert cap.count() == 5
