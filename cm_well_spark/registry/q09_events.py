"""Like-fuzzy, events windows, gremlin, stored queries.

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "search_like_fuzzy",
    oracle="""
    SELECT '/tpch/region/' || r_regionkey AS path, r_name AS name
    FROM region WHERE levenshtein(lower(r_name), 'evrope') <= 2
    """,
)
def search_like_fuzzy(spark, sf_dir):
    """F1 `~` Like -> fuzzy match with ES AUTO edit-distance buckets
    (len>5 -> 2 edits), via levenshtein on the exact value."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Region,name~EVROPE", length=None, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
    return df.select("path", fv.first_value("name").alias("name"))


@register(
    "events_window_agg",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:00') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_window_agg(spark, sf_dir):
    """Tumbling-window aggregation over the events stream table — the
    batch twin of the Structured Streaming windowed agg (the reference
    has no windowing, SURVEY §2.9 T6 note; this is pipeline surface)."""
    from cm_well_spark.sources import tables as tbl

    ev = tbl.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "gremlin_out_chain",
    oracle="""
    SELECT DISTINCT '/tpch/region/' || n_regionkey AS path
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def gremlin_out_chain(spark, sf_dir):
    """J6 gremlin-style traversal: V().has(...).out().out() over the same
    pruned edge hops as xg/yg."""
    from cm_well_spark.operators.gremlin import g

    t = (
        g(_inf(spark, sf_dir), _tri(spark, sf_dir))
        .V()
        .has("rdfType", "Customer")
        .has("mktsegment", "BUILDING")
        .out("inNation")
        .out("ofRegion")
    )
    return t.paths()


@register(
    "stored_query_param",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS x FROM nation
    """,
)
def stored_query_param(spark, sf_dir):
    """§2.10 stored queries with %var% substitution (SpHandler:467-473)."""
    from cm_well_spark.functions.udfs import StoredQueries

    sq = StoredQueries()
    sq.put("by_type", 'SELECT ?x WHERE { ?x <rdfType> "%kind%" }')
    return sq.run_sparql(_tri(spark, sf_dir), "by_type", kind="Nation")


@register(
    "sparql_graph_revenue",
    oracle="""
    SELECT r_name AS rname, round(sum(l_extendedprice), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def sparql_graph_revenue(spark, sf_dir):
    """Flagship graph-analytics query: 6-pattern SPARQL BGP walk
    lineitem->order->customer->nation->region with GROUP BY + SUM/COUNT
    (SPARQL 1.1 aggregates; greedy reorder from predicate_stats). The
    whole pipeline is one Catalyst plan: 5 joins + hash aggregation."""
    from cm_well_spark.model.lakehouse import load_predicate_stats
    from cm_well_spark.operators.sparql import sparql_query

    stats = load_predicate_stats(spark, sf_dir)
    df = sparql_query(
        _tri(spark, sf_dir),
        """
        SELECT ?rname (SUM(?price) AS ?revenue) (COUNT(*) AS ?n_items) WHERE {
          ?li <extendedprice> ?price .
          ?li <ofOrder> ?o .
          ?o <byCustomer> ?c .
          ?c <inNation> ?n .
          ?n <ofRegion> ?r .
          ?r <name> ?rname .
        } GROUP BY ?rname
        """,
        stats=stats,
        limit_cap=None,
        infotons=_inf(spark, sf_dir),
    )
    return df.select("rname", F.round("revenue", 2).alias("revenue"), "n_items")


@register(
    "sparql_exists",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS n FROM nation
    WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
    """,
)
def sparql_exists(spark, sf_dir):
    """J5 FILTER EXISTS -> left_semi join on the shared variables (full ARQ
    in the reference, SpHandler.scala:598-670)."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?n WHERE { ?n <rdfType> "Nation" . '
        'FILTER EXISTS { ?s <inNation> ?n . ?s <rdfType> "Supplier" } }',
        limit_cap=None,
    )


@register(
    "sparql_not_exists",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS n FROM nation
    WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
    """,
)
def sparql_not_exists(spark, sf_dir):
    """J5 FILTER NOT EXISTS -> left_anti join on the shared variables:
    nations with no high-balance supplier."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?n WHERE { ?n <rdfType> "Nation" . '
        "FILTER NOT EXISTS { ?s <inNation> ?n . ?s <acctbal> ?b . "
        '?s <rdfType> "Supplier" . FILTER(?b > 9000) } }',
        limit_cap=None,
    )


@register(
    "sparql_subquery",
    oracle="""
    SELECT n_name AS name, cnt FROM nation
    JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) c
      ON n_nationkey = c.c_nationkey
    """,
)
def sparql_subquery(spark, sf_dir):
    """J5 nested sub-SELECT (SPARQL 1.1 §12): the inner aggregation
    evaluates bottom-up to a solution frame, then joins the outer pattern
    on the shared ?nat variable — one shuffle for the groupBy, a broadcast
    hash join for the 25-row name lookup under AQE."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        """
        SELECT ?name ?cnt WHERE {
          { SELECT ?nat (COUNT(?c) AS ?cnt) WHERE {
              ?c <inNation> ?nat . ?c <rdfType> "Customer" }
            GROUP BY ?nat }
          ?nat <name> ?name .
        }
        """,
        limit_cap=None,
    )


@register(
    "sparql_having",
    oracle="""
    SELECT '/tpch/nation/' || c_nationkey AS nat, COUNT(*) AS cnt
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 50
    """,
)
def sparql_having(spark, sf_dir):
    """J5 HAVING: post-aggregation filter over the projected aggregate
    alias — a where() on the agg frame, still one hash-agg job."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?nat (COUNT(?c) AS ?cnt) WHERE { ?c <inNation> ?nat . '
        '?c <rdfType> "Customer" } GROUP BY ?nat HAVING (?cnt >= 50)',
        limit_cap=None,
    )


@register(
    "sparql_path_zero_or_one",
    oracle="""
    SELECT '/tpch/nation/3' AS x
    UNION
    SELECT '/tpch/region/' || n_regionkey FROM nation WHERE n_nationkey = 3
    """,
)
def sparql_path_zero_or_one(spark, sf_dir):
    """J5 `p?` zero-or-one property path: zero-length identity ∪ one hop."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "SELECT DISTINCT ?x WHERE { </tpch/nation/3> <ofRegion>? ?x }",
        limit_cap=None,
    )


@register(
    "sparql_negated_pset",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS o FROM nation WHERE n_nationkey = 3
    UNION ALL
    SELECT '/tpch/region/' || n_regionkey FROM nation WHERE n_nationkey = 3
    """,
)
def sparql_negated_pset(spark, sf_dir):
    """J5 negated property set `!(p1|p2)`: one scan filtered to predicates
    NOT in the set — a partition-level anti-filter, no unions or joins."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "SELECT ?o WHERE { </tpch/nation/3> !(<name>|<rdfType>) ?o }",
        limit_cap=None,
    )


