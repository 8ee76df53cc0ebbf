"""J4/J5 SPARQL over the triples view.

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "sparql_bgp_join",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS c, n_name AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def sparql_bgp_join(spark, sf_dir):
    """J4 3-pattern BGP join with greedy reorder from predicate_stats
    (replaces sortTriplePatternsByAmount JenaArqExtensionsUtils:187-225)."""
    from cm_well_spark.model.lakehouse import load_predicate_stats
    from cm_well_spark.operators.sparql import sparql_query

    stats = load_predicate_stats(spark, sf_dir)
    return sparql_query(
        _tri(spark, sf_dir),
        """
        SELECT ?c ?n WHERE {
          ?c <inNation> ?nat .
          ?nat <name> ?n .
          ?c <mktsegment> "BUILDING" .
        }
        """,
        stats=stats,
        limit_cap=None,
        infotons=_inf(spark, sf_dir),
    )


@register(
    "sparql_filter_num",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS c, c_acctbal AS b
    FROM customer WHERE c_acctbal > 5000
    """,
)
def sparql_filter_num(spark, sf_dir):
    """J5 FILTER with numeric comparison through the typed num shadow."""
    from cm_well_spark.operators.sparql import sparql_query

    df = sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?c ?b WHERE { ?c <acctbal> ?b . ?c <rdfType> "Customer" . FILTER(?b > 5000) }',
        limit_cap=None,
    )
    return df.withColumn("b", F.col("b").cast("double"))


@register(
    "sparql_optional",
    oracle="""
    SELECT '/tpch/region/' || r_regionkey AS r, '/tpch/nation/' || n_nationkey AS n
    FROM region LEFT JOIN nation ON n_regionkey = r_regionkey
    """,
)
def sparql_optional(spark, sf_dir):
    """J5 OPTIONAL -> left outer join."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?r ?n WHERE { ?r <rdfType> "Region" . OPTIONAL { ?n <ofRegion> ?r } }',
        limit_cap=None,
    )


@register(
    "sparql_union",
    oracle="""
    SELECT '/tpch/region/' || r_regionkey AS x FROM region
    UNION ALL
    SELECT '/tpch/nation/' || n_nationkey AS x FROM nation
    """,
)
def sparql_union(spark, sf_dir):
    """J5 UNION -> unionByName."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?x WHERE { { ?x <rdfType> "Region" } UNION { ?x <rdfType> "Nation" } }',
        limit_cap=None,
    )


@register(
    "sparql_construct",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS s, 'locatedIn' AS p,
           '/tpch/region/' || n_regionkey AS o
    FROM nation
    """,
)
def sparql_construct(spark, sf_dir):
    """J5 CONSTRUCT -> instantiated template triples DataFrame(s,p,o)."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "CONSTRUCT { ?n <locatedIn> ?r } WHERE { ?n <ofRegion> ?r }",
        limit_cap=None,
    )


@register(
    "sparql_minus",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS s FROM nation
    WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900)
    """,
)
def sparql_minus(spark, sf_dir):
    """J5 MINUS -> left_anti join on the shared variables (W3C §8.3;
    reference evaluates full ARQ incl. MINUS, SpHandler.scala:598-670)."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?s WHERE { ?s <rdfType> "Nation" '
        "MINUS { ?c <inNation> ?s . ?c <acctbal> ?b . FILTER(?b > 9900) } }",
        limit_cap=None,
    )


@register(
    "sparql_bind",
    oracle="""
    SELECT '/tpch/region/' || r_regionkey AS s, lower(r_name) AS low FROM region
    """,
)
def sparql_bind(spark, sf_dir):
    """J5 BIND(expr AS ?v) -> withColumn over native Catalyst expressions."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?s ?low WHERE { ?s <rdfType> "Region" . ?s <name> ?n . BIND(LCASE(?n) AS ?low) }',
        limit_cap=None,
    )


@register(
    "sparql_values",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS s, n_name AS n FROM nation
    WHERE n_name IN ('NATION_3', 'NATION_7')
    """,
)
def sparql_values(spark, sf_dir):
    """J5 VALUES inline data -> broadcast join against the solution frame."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?s ?n WHERE { ?s <rdfType> "Nation" . ?s <name> ?n . '
        'VALUES ?n { "NATION_3" "NATION_7" } }',
        limit_cap=None,
    )


@register(
    "sparql_path_seq",
    oracle="""
    SELECT DISTINCT '/tpch/customer/' || c_custkey AS c, '/tpch/region/' || n_regionkey AS r
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def sparql_path_seq(spark, sf_dir):
    """J5 sequence property path p1/p2 -> chained equi joins through fresh
    internal variables, endpoints DISTINCT (ARQ path semantics)."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT DISTINCT ?c ?r WHERE { ?c <inNation>/<ofRegion> ?r . ?c <mktsegment> "BUILDING" }',
        limit_cap=None,
    )


@register(
    "sparql_path_plus",
    oracle="""
    SELECT DISTINCT '/tpch/region/' || n_regionkey AS r FROM nation WHERE n_nationkey = 3
    """,
)
def sparql_path_plus(spark, sf_dir):
    """J5 bounded one-or-more path p+ -> union of depth-1..6 join chains
    (documented bounded subset of ARQ's unbounded +)."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "SELECT DISTINCT ?r WHERE { </tpch/nation/3> <ofRegion>+ ?r }",
        limit_cap=None,
    )


@register(
    "sparql_path_inverse",
    oracle="""
    SELECT DISTINCT '/tpch/orders/' || o_orderkey AS o
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_nationkey = 3
    """,
)
def sparql_path_inverse(spark, sf_dir):
    """J5 inverse path steps: ^p walks object->subject; chained with '/'
    (ARQ path algebra subset; alternatives p1|p2 also compile)."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "SELECT DISTINCT ?o WHERE { </tpch/nation/3> ^<inNation>/^<byCustomer> ?o }",
        limit_cap=None,
    )


@register(
    "sparql_builtin_fns",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS s, upper(n_name) AS un FROM nation
    WHERE length(n_name) >= 9 AND contains(n_name, '_1')
    """,
)
def sparql_builtin_fns(spark, sf_dir):
    """J5 builtin function library (STRLEN/UCASE/CONTAINS shown; STR, LANG,
    LCASE, ABS, CEIL, FLOOR, ROUND, CONCAT, STRSTARTS, STRENDS, BOUND also
    compile) — all native Catalyst expressions, no UDFs."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?s ?un WHERE { ?s <rdfType> "Nation" . ?s <name> ?n . '
        'BIND(UCASE(?n) AS ?un) FILTER(STRLEN(?n) >= 9 && CONTAINS(?n, "_1")) }',
        limit_cap=None,
    )


@register(
    "sparql_group_concat",
    oracle="""
    SELECT '/tpch/region/' || n_regionkey AS r,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           min(n_name) AS one
    FROM nation GROUP BY 1
    """,
)
def sparql_group_concat(spark, sf_dir):
    """J5 GROUP_CONCAT (sorted, deterministic) + SAMPLE (min) aggregates."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        'SELECT ?r (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names) (SAMPLE(?n) AS ?one) '
        "WHERE { ?s <ofRegion> ?r . ?s <name> ?n . ?s <rdfType> \"Nation\" } GROUP BY ?r",
        limit_cap=None,
    )


