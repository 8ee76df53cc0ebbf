"""Driver-contract query registry.

Every implemented operator from SURVEY.md §2 registers here as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a DuckDB
oracle SQL string over the raw test tables. The driver hash-compares them
at sf0.01 (CORRECTNESS_r{N}.json); bench.py times the headline subset at
sf0.1.

Conventions that keep the hash-compare honest:
  - every output column aliased identically in Spark and SQL;
  - doubles that aggregate get ROUND(x, 2) on both sides;
  - timestamps surface as DATE or ISO strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cm_well_spark.model import fieldvals as fv
from cm_well_spark.model.lakehouse import load_infotons, load_triples
from cm_well_spark.operators import search as S

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def _inf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_infotons(spark, sf_dir)


def _tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_triples(spark, sf_dir)


# ---------------------------------------------------------------------------
# S1/S4: point + children reads
# ---------------------------------------------------------------------------


@register(
    "read_point",
    oracle="""
    SELECT '/tpch/region/' || r_regionkey AS path, r_name AS name
    FROM region WHERE r_regionkey = 0
    """,
)
def read_point(spark, sf_dir):
    """S1 op=read: point lookup by path (CRUDServiceFS.scala:129-195)."""
    df = S.read_path(_inf(spark, sf_dir), "/tpch/region/0")
    return df.select(F.col("path"), fv.first_value("name").alias("name"))


@register(
    "list_children",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS path, n_name AS name
    FROM nation
    """,
)
def list_children_q(spark, sf_dir):
    """S4 children listing via system.parent (FTSService.scala:198-206)."""
    df = S.list_children(_inf(spark, sf_dir), "/tpch/nation")
    return df.select("path", fv.first_value("name").alias("name"))


# ---------------------------------------------------------------------------
# F1/F2: qp filter semantics
# ---------------------------------------------------------------------------


@register(
    "search_equals",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_name AS name,
           c_acctbal AS acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def search_equals(spark, sf_dir):
    """F1 `::` Equals -> termQuery on exact value (FTSService.scala:898)."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer,mktsegment::BUILDING", length=10_000)
    return df.select("path", fv.first_value("name").alias("name"), fv.first_num("acctbal").alias("acctbal"))


@register(
    "search_range_num",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_acctbal AS acctbal
    FROM customer WHERE c_acctbal > 5000.0
    """,
)
def search_range_num(spark, sf_dir):
    """F1 `>` range on a typed (double) field — typed shadow comparison."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer,acctbal>5000", length=10_000)
    return df.select("path", fv.first_num("acctbal").alias("acctbal"))


@register(
    "search_range_date",
    oracle="""
    SELECT '/tpch/lineitem/' || l_orderkey || '-' || l_linenumber AS path,
           l_quantity AS quantity, strftime(l_shipdate, '%Y-%m-%d') AS shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def search_range_date(spark, sf_dir):
    """F1 date-typed range via the ts shadow column (F4/F2 semantics)."""
    df = S.search(
        _inf(spark, sf_dir),
        qp="rdfType::Lineitem,shipdate>>1995-01-01,shipdate<1996-01-01",
        length=None,
    )
    return df.select(
        "path",
        fv.first_num("quantity").alias("quantity"),
        F.date_format(fv.first_ts("shipdate"), "yyyy-MM-dd").alias("shipdate"),
    )


@register(
    "search_mustnot",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_mktsegment AS mktsegment
    FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
)
def search_mustnot(spark, sf_dir):
    """F1 `-` MustNot -> bool mustNot clause."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer,-mktsegment::BUILDING", length=10_000)
    return df.select("path", fv.first_value("mktsegment").alias("mktsegment"))


@register(
    "search_should_group",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_mktsegment AS mktsegment
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def search_should_group(spark, sf_dir):
    """F1 `[*a,*b]` Should group -> OR (required: no musts in the level)."""
    df = S.search(
        _inf(spark, sf_dir),
        qp="rdfType::Customer,[*mktsegment::BUILDING,*mktsegment::MACHINERY]",
        length=10_000,
    )
    return df.select("path", fv.first_value("mktsegment").alias("mktsegment"))


@register(
    "search_exists",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path FROM customer
    UNION ALL
    SELECT '/tpch/supplier/' || s_suppkey AS path FROM supplier
    """,
)
def search_exists(spark, sf_dir):
    """F1 no-value existence filter -> existsQuery (FTSService.scala:911)."""
    df = S.search(
        _inf(spark, sf_dir),
        path_filter=S.PathFilter("/tpch", descendants=True),
        qp="acctbal:",
        length=None,
    )
    return df.select("path")


@register(
    "search_contains",
    oracle="""
    SELECT '/tpch/part/' || p_partkey AS path, p_name AS name
    FROM part
    WHERE contains(' ' || trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g')) || ' ', ' widget ')
    """,
)
def search_contains(spark, sf_dir):
    """F1 `:` Contains -> matchPhrase on the analyzed field (simple
    lowercase/word-split analyzer; divergence documented SURVEY §7.3)."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Part,name:widget", length=10_000)
    return df.select("path", fv.first_value("name").alias("name"))


@register(
    "search_sort_page",
    oracle="""
    SELECT path, acctbal FROM (
      SELECT '/tpch/customer/' || c_custkey AS path, c_acctbal AS acctbal
      FROM customer
      ORDER BY c_acctbal DESC, path ASC
    ) LIMIT 20 OFFSET 10
    """,
)
def search_sort_page(spark, sf_dir):
    """O1 typed sort + O2 offset/length paging with reference guards."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", sort_by="-acctbal", offset=10, length=20)
    return df.select("path", fv.first_num("acctbal").alias("acctbal"))


@register(
    "search_path_descendants",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS path FROM nation
    UNION ALL SELECT '/tpch/region/' || r_regionkey FROM region
    """,
)
def search_path_descendants(spark, sf_dir):
    """F3 recursive descendants + Should-group OR."""
    df = S.search(
        _inf(spark, sf_dir),
        path_filter=S.PathFilter("/tpch", descendants=True),
        qp="[*rdfType::Nation,*rdfType::Region]",
        length=10_000,
    )
    return df.select("path")


@register(
    "search_quad_filter",
    oracle="""
    SELECT '/docs/' || doc_id AS path, source FROM documents WHERE source = 'src7'
    """,
)
def search_quad_filter(spark, sf_dir):
    """F8 system.quad:: named-graph filter (Parsers.scala:615-624)."""
    df = S.search(_inf(spark, sf_dir), qp="system.quad::/graphs/src7", length=None)
    return df.select("path", fv.first_value("source").alias("source"))


@register(
    "batch_get_out",
    oracle="""
    SELECT '/tpch/region/' || r_regionkey AS path, r_name AS name
    FROM region WHERE r_regionkey IN (0, 2, 4)
    """,
)
def batch_get_out(spark, sf_dir):
    """S3 `_out` batch get by path set (broadcast semi join)."""
    keys = spark.createDataFrame([("/tpch/region/0",), ("/tpch/region/2",), ("/tpch/region/4",)], ["path"])
    df = S.batch_get(_inf(spark, sf_dir), keys)
    return df.select("path", fv.first_value("name").alias("name"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)


# ---------------------------------------------------------------------------
# A1-A5: aggregations (op=stats / ap=)
# ---------------------------------------------------------------------------


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

    cust = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", length=None)
    return aggregate(cust, "type:term,field::mktsegment")[0].df


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

    li = S.search(_inf(spark, sf_dir), qp="rdfType::Lineitem", length=None)
    df = aggregate(li, "type:stats,field::quantity")[0].df
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

    parts = S.search(_inf(spark, sf_dir), qp="rdfType::Part", length=None)
    return aggregate(parts, "type:hist,field::size,interval:10,minDocCount:1")[0].df


@register(
    "agg_card_exact",
    oracle="SELECT count(DISTINCT l_partkey) AS count FROM lineitem",
)
def agg_card_exact(spark, sf_dir):
    """A5 cardinality, exact-distinct variant (approx HLL is the
    reference-faithful default; this entry is the oracle-checkable one)."""
    from cm_well_spark.operators.aggregations import card_exact

    li = S.search(_inf(spark, sf_dir), qp="rdfType::Lineitem", length=None)
    return card_exact(li, "ofPart")


@register("agg_card_approx")
def agg_card_approx(spark, sf_dir):
    """A5 type:card with HLL (±5-10%, API.Query.DataStatistics.md) — no SQL
    oracle by design; driver records rows-only."""
    from cm_well_spark.operators.aggregations import aggregate

    li = S.search(_inf(spark, sf_dir), qp="rdfType::Lineitem", length=None)
    return aggregate(li, "type:card,field::ofPart,precisionThreshold:10000")[0].df


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

    base = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", length=None)
    fg = S.search(_inf(spark, sf_dir), qp="rdfType::Customer,acctbal>9000", length=None)
    df = aggregate(fg, "type:sig,field::mktsegment,minDocCount:1", base=base)[0].df
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

    cust = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", length=None)
    res = aggregate(cust, "type:term,field::mktsegment<type:stats,field::acctbal>")[0]
    sub = res.subs[0].df
    return sub.select(
        "key", "count", "min", "max", F.round("avg", 2).alias("avg"), F.round("sum", 2).alias("sum")
    )
