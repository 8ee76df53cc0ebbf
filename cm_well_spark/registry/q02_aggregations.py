"""A1-A5 aggregations (op=stats / ap=).

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "agg_term",
    oracle="""
    SELECT c_mktsegment AS key, count(*) AS objects
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_term(spark, sf_dir):
    """A1 type:term -> groupBy.count ordered by doc count (FTSService:978)."""
    from cm_well_spark.operators.aggregations import aggregate

    tri = _tri(spark, sf_dir)
    cust = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", length=None, triples=tri, stats=_stats(spark, sf_dir))
    return aggregate(cust, "type:term,field::mktsegment", triples=tri, stats=_stats(spark, sf_dir),
                     universe_types=frozenset({"Customer"}))[0].df


@register(
    "agg_stats",
    oracle="""
    SELECT count(l_quantity) AS count, min(l_quantity) AS min,
           max(l_quantity) AS max, round(avg(l_quantity), 2) AS avg,
           round(sum(l_quantity), 2) AS sum
    FROM lineitem
    """,
)
def agg_stats(spark, sf_dir):
    """A2 type:stats -> count/min/max/avg/sum (FTSService:980)."""
    from cm_well_spark.operators.aggregations import aggregate

    tri = _tri(spark, sf_dir)
    li = S.search(_inf(spark, sf_dir), qp="rdfType::Lineitem", length=None, triples=tri, stats=_stats(spark, sf_dir))
    df = aggregate(li, "type:stats,field::quantity", triples=tri, stats=_stats(spark, sf_dir),
                   universe_types=frozenset({"Lineitem"}))[0].df
    return df.select(
        "count", "min", "max", F.round("avg", 2).alias("avg"), F.round("sum", 2).alias("sum")
    )


@register(
    "agg_hist",
    oracle="""
    SELECT CAST(floor(p_size / 10) * 10 AS DOUBLE) AS key, count(*) AS objects
    FROM part GROUP BY 1
    """,
)
def agg_hist(spark, sf_dir):
    """A3 type:hist -> interval bucketing with minDocCount (FTSService:982)."""
    from cm_well_spark.operators.aggregations import aggregate

    tri = _tri(spark, sf_dir)
    parts = S.search(_inf(spark, sf_dir), qp="rdfType::Part", length=None, triples=tri, stats=_stats(spark, sf_dir))
    return aggregate(parts, "type:hist,field::size,interval:10,minDocCount:1", triples=tri,
                     stats=_stats(spark, sf_dir), universe_types=frozenset({"Part"}))[0].df


@register(
    "agg_card_exact",
    oracle="SELECT count(DISTINCT l_partkey) AS count FROM lineitem",
)
def agg_card_exact(spark, sf_dir):
    """A5 cardinality, exact-distinct variant (approx HLL is the
    reference-faithful default; this entry is the oracle-checkable one)."""
    from cm_well_spark.operators.aggregations import card_exact

    tri = _tri(spark, sf_dir)
    li = S.search(_inf(spark, sf_dir), qp="rdfType::Lineitem", length=None, triples=tri, stats=_stats(spark, sf_dir))
    return card_exact(li, "ofPart", triples=tri, stats=_stats(spark, sf_dir),
                      universe_types=frozenset({"Lineitem"}))


@register("agg_card_approx")
def agg_card_approx(spark, sf_dir):
    """A5 type:card with HLL (±5-10%, API.Query.DataStatistics.md) — no SQL
    oracle by design; driver records rows-only."""
    from cm_well_spark.operators.aggregations import aggregate

    tri = _tri(spark, sf_dir)
    li = S.search(_inf(spark, sf_dir), qp="rdfType::Lineitem", length=None, triples=tri, stats=_stats(spark, sf_dir))
    return aggregate(li, "type:card,field::ofPart,precisionThreshold:10000", triples=tri,
                     stats=_stats(spark, sf_dir), universe_types=frozenset({"Lineitem"}))[0].df


@register(
    "agg_sig_terms",
    oracle="""
    WITH fg AS (SELECT c_mktsegment AS key, count(*) AS objects
                FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
         bg AS (SELECT c_mktsegment AS key, count(*) AS bg_count
                FROM customer GROUP BY 1),
         n AS (SELECT (SELECT count(*) FROM customer WHERE c_acctbal > 9000) AS fg_n,
                      (SELECT count(*) FROM customer) AS bg_n)
    SELECT key, objects, bg_count,
           round(((objects * 1.0 / fg_n) / (bg_count * 1.0 / bg_n))
                 * ((objects * 1.0 / fg_n) - (bg_count * 1.0 / bg_n)), 6) AS score
    FROM fg JOIN bg USING (key), n
    WHERE objects >= 1
      AND (objects * 1.0 / fg_n) > (bg_count * 1.0 / bg_n)
    ORDER BY score DESC, key ASC LIMIT 10
    """,
)
def agg_sig_terms(spark, sf_dir):
    """A4 significant terms with JLH-like score (fg%/bg%)*(fg%-bg%) —
    custom arithmetic, no engine hook (SURVEY §4)."""
    from cm_well_spark.operators.aggregations import aggregate

    from cm_well_spark.parsers.qp import parse_qp
    from cm_well_spark.plans.compile import compile_filter

    base = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", length=None)
    pred = compile_filter(parse_qp("acctbal>9000"))
    df = aggregate(
        base.where(pred), "type:sig,field::mktsegment,minDocCount:1", base=base, fg_filter=pred,
        stats=_stats(spark, sf_dir),
    )[0].df
    return df.select("key", "objects", "bg_count", F.round("score", 6).alias("score"))


@register(
    "agg_term_nested_stats",
    oracle="""
    SELECT c_mktsegment AS key, count(*) AS count, min(c_acctbal) AS min,
           max(c_acctbal) AS max, round(avg(c_acctbal), 2) AS avg,
           round(sum(c_acctbal), 2) AS sum
    FROM customer GROUP BY 1
    """,
)
def agg_term_nested_stats(spark, sf_dir):
    """A1<A2> nested sub-aggregation -> multi-level groupBy rollup."""
    from cm_well_spark.operators.aggregations import aggregate

    tri = _tri(spark, sf_dir)
    cust = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", length=None, triples=tri, stats=_stats(spark, sf_dir))
    res = aggregate(cust, "type:term,field::mktsegment<type:stats,field::acctbal>", triples=tri, stats=_stats(spark, sf_dir))[0]
    sub = res.subs[0].df
    return sub.select(
        "key", "count", "min", "max", F.round("avg", 2).alias("avg"), F.round("sum", 2).alias("sum")
    )


