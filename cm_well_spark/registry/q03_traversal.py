"""J1-J3 graph traversals (xg / yg / gqp).

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "xg_expand_out",
    oracle="""
    SELECT '/tpch/orders/' || o_orderkey AS path FROM orders WHERE o_orderkey < 100
    UNION
    SELECT DISTINCT '/tpch/customer/' || o_custkey FROM orders WHERE o_orderkey < 100
    """,
)
def xg_expand_out(spark, sf_dir):
    """J1 xg 1-level: dereference FReference fields via semi join
    (deepExpandGraph wsutil:716-749)."""
    from cm_well_spark.operators.traversal import expand_out

    inf = _inf(spark, sf_dir)
    tri, st = _tri(spark, sf_dir), _stats(spark, sf_dir)
    seeds = S.search(inf, qp="rdfType::Order,orderkey<100", length=None, triples=tri, stats=st)
    return expand_out(inf, seeds, "byCustomer", triples=tri, stats=st).select("path")


@register(
    "xg_two_levels",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path FROM customer WHERE c_custkey < 20
    UNION
    SELECT DISTINCT '/tpch/nation/' || c_nationkey FROM customer WHERE c_custkey < 20
    UNION
    SELECT DISTINCT '/tpch/region/' || n_regionkey FROM customer
    JOIN nation ON n_nationkey = c_nationkey WHERE c_custkey < 20
    """,
)
def xg_two_levels(spark, sf_dir):
    """J1 xg chained levels: unrolled bounded join loop (<=9 levels)."""
    from cm_well_spark.operators.traversal import expand_out

    inf = _inf(spark, sf_dir)
    tri, st = _tri(spark, sf_dir), _stats(spark, sf_dir)
    seeds = S.search(inf, qp="rdfType::Customer,custkey<20", length=None, triples=tri, stats=st)
    return expand_out(inf, seeds, "inNation>ofRegion", triples=tri, stats=st).select("path")


@register(
    "xg_ghost_skip",
    oracle="SELECT '/events/' || event_id AS path FROM events",
)
def xg_ghost_skip(spark, sf_dir):
    """J7 ghost skipping: /users/* targets were never written; the
    expansion joins to nothing and the seeds flow through
    (GhostInfoton Infoton.scala:320; ExpansionTests.scala:238-243)."""
    from cm_well_spark.operators.traversal import expand_out

    inf = _inf(spark, sf_dir)
    tri, st = _tri(spark, sf_dir), _stats(spark, sf_dir)
    seeds = S.search(inf, qp="rdfType::Event", length=None, triples=tri, stats=st)
    return expand_out(inf, seeds, "byUser", limit=1_000_000, triples=tri, stats=st).select("path")


@register(
    "yg_reverse",
    oracle="""
    SELECT '/tpch/nation/3' AS path
    UNION
    SELECT '/tpch/customer/' || c_custkey FROM customer WHERE c_nationkey = 3
    """,
)
def yg_reverse(spark, sf_dir):
    """J2 yg '<field': reverse join via the predicate-partitioned triples
    table (expandUp wsutil:617-714)."""
    from cm_well_spark.operators.traversal import expand_paths

    inf = _inf(spark, sf_dir)
    tri, st = _tri(spark, sf_dir), _stats(spark, sf_dir)
    seeds = S.search(inf, qp="rdfType::Nation,nationkey::3", length=None, triples=tri, stats=st)
    return expand_paths(inf, tri, seeds, "<inNation[rdfType::Customer]", limit=1_000_000, stats=st).select("path")


@register(
    "gqp_semi_filter",
    oracle="""
    SELECT '/tpch/orders/' || o_orderkey AS path
    FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def gqp_semi_filter(spark, sf_dir):
    """J3 gqp: graph-pattern SEMI filter — keeps originals, adds nothing
    (gqpFilter wsutil:751-849)."""
    from cm_well_spark.operators.traversal import gqp_filter

    inf = _inf(spark, sf_dir)
    orders = S.search(inf, qp="rdfType::Order", length=None)
    return gqp_filter(inf, _tri(spark, sf_dir), orders, ">byCustomer[mktsegment::BUILDING]", stats=_stats(spark, sf_dir)).select("path")


@register(
    "gqp_two_hop",
    oracle="""
    SELECT '/tpch/orders/' || o_orderkey AS path
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_nationkey = 3
    """,
)
def gqp_two_hop(spark, sf_dir):
    """J3 gqp chained hops through two reference fields."""
    from cm_well_spark.operators.traversal import gqp_filter

    inf = _inf(spark, sf_dir)
    orders = S.search(inf, qp="rdfType::Order", length=None)
    return gqp_filter(inf, _tri(spark, sf_dir), orders, ">byCustomer>inNation[nationkey::3]", stats=_stats(spark, sf_dir)).select("path")


