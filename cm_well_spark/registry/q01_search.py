"""S1-S4 point/children reads + F1/F2 qp filter semantics.

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

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


@register(
    "search_equals",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_name AS name,
           c_acctbal AS acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    ORDER BY path LIMIT 10000
    """,
)
def search_equals(spark, sf_dir):
    """F1 `::` Equals -> termQuery on exact value (FTSService.scala:898)."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer,mktsegment::BUILDING", sort_by="path", length=10_000, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
    return df.select("path", fv.first_value("name").alias("name"), fv.first_num("acctbal").alias("acctbal"))


@register(
    "search_range_num",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_acctbal AS acctbal
    FROM customer WHERE c_acctbal > 5000.0
    ORDER BY path LIMIT 10000
    """,
)
def search_range_num(spark, sf_dir):
    """F1 `>` range on a typed (double) field — typed shadow comparison."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer,acctbal>5000", sort_by="path", length=10_000, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
    return df.select("path", fv.first_num("acctbal").alias("acctbal"))


@register(
    "search_range_date",
    oracle="""
    SELECT '/tpch/lineitem/' || l_orderkey || '-' || l_linenumber || '-' ||
           row_number() OVER (PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_quantity, l_extendedprice, l_discount, l_tax,
                      l_shipdate, l_partkey, l_suppkey) AS path,
           l_quantity AS quantity, strftime(l_shipdate, '%Y-%m-%d') AS shipdate
    FROM lineitem
    QUALIFY l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def search_range_date(spark, sf_dir):
    """F1 date-typed range via the ts shadow column (F4/F2 semantics)."""
    df = S.search(
        _inf(spark, sf_dir),
        qp="rdfType::Lineitem,shipdate>>1995-01-01,shipdate<1996-01-01",
        length=None,
        triples=_tri(spark, sf_dir),
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
    ORDER BY path LIMIT 10000
    """,
)
def search_mustnot(spark, sf_dir):
    """F1 `-` MustNot -> bool mustNot clause."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer,-mktsegment::BUILDING", sort_by="path", length=10_000, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
    return df.select("path", fv.first_value("mktsegment").alias("mktsegment"))


@register(
    "search_should_group",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_mktsegment AS mktsegment
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ORDER BY path LIMIT 10000
    """,
)
def search_should_group(spark, sf_dir):
    """F1 `[*a,*b]` Should group -> OR (required: no musts in the level)."""
    df = S.search(
        _inf(spark, sf_dir),
        qp="rdfType::Customer,[*mktsegment::BUILDING,*mktsegment::MACHINERY]",
        sort_by="path",
        length=10_000,
        triples=_tri(spark, sf_dir),
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
        triples=_tri(spark, sf_dir),
    )
    return df.select("path")


@register(
    "search_contains",
    oracle="""
    SELECT '/tpch/part/' || p_partkey AS path, p_name AS name
    FROM part
    WHERE contains(' ' || trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g')) || ' ', ' widget ')
    ORDER BY path LIMIT 10000
    """,
)
def search_contains(spark, sf_dir):
    """F1 `:` Contains -> matchPhrase on the analyzed field (simple
    lowercase/word-split analyzer; divergence documented SURVEY §7.3)."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Part,name:widget", sort_by="path", length=10_000, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
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
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Customer", sort_by="-acctbal", offset=10, length=20, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
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


