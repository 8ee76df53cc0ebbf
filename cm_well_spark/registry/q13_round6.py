"""Round-6 tranche: analyzer modes, packing, BPE, quality expectations.

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "gremlin_range",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS path
    FROM nation ORDER BY n_name LIMIT 6 OFFSET 5
    """,
)
def gremlin_range(spark, sf_dir):
    """J6 `range(lo, hi)` pipe: the INCLUSIVE ordered slice (TinkerPop-2
    RangeFilterPipe; reference plugin GremlinParser.scala evaluates the
    same chain over the Blueprints graph). Compiles to offset+limit on
    the sorted frontier — VERDICT r5 fix for the dropped low bound."""
    from cm_well_spark.operators.gremlin import eval_gremlin

    return eval_gremlin(
        _inf(spark, sf_dir),
        _tri(spark, sf_dir),
        'g.V().has("rdfType", "Nation").order("name").range(5, 10)',
    )


@register(
    "sparql_graph_var_zero_path",
    oracle="""
    SELECT '/graphs/' || source AS g2, 2 * count(*) + 1 AS n
    FROM documents GROUP BY source
    """,
)
def sparql_graph_var_zero_path(spark, sf_dir):
    """J4/J5 zero-length paths inside GRAPH ?var (r6 — closes the r5
    rejection at the compiler's `p?`/`p*` guard): zero-length solutions
    pair every node of THAT named graph with itself, so per graph the
    `<source>*` pair count = n one-step + (n docs + 1 source value)
    identities = 2n+1. Reference: DatasetGraphCmWell serves any pattern
    shape over quads (JenaArqExtensions.scala:323-573)."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "SELECT ?g2 (COUNT(*) AS ?n) WHERE { GRAPH ?g2 { ?d <source>* ?x } } "
        "GROUP BY ?g2",
        limit_cap=None,
    )


@register(
    "sparql_graph_subselect",
    oracle="""
    SELECT '/graphs/' || source AS g2, source AS src, count(*) AS n
    FROM documents GROUP BY source
    """,
)
def sparql_graph_subselect(spark, sf_dir):
    """J4/J5 sub-SELECT inside GRAPH ?var (SPARQL 1.1 §13.3.2, r6): the
    subquery evaluates once per named graph — the graph var threads
    through the aggregation as a hidden group key, keeping the output
    graph-correlated for the enclosing join."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "SELECT ?g2 ?src ?n WHERE { GRAPH ?g2 "
        "{ SELECT ?src (COUNT(?d) AS ?n) WHERE { ?d <source> ?src } GROUP BY ?src } }",
        limit_cap=None,
    )


@register(
    "sparql_graph_nested",
    oracle="""
    SELECT '/graphs/src2' AS g2, '/docs/' || doc_id AS d
    FROM documents WHERE source = 'src2'
    """,
)
def sparql_graph_nested(spark, sf_dir):
    """J4/J5 nested GRAPH clauses (r6): the inner constant graph
    re-scopes its patterns against the full quad source independently of
    the outer binding (SPARQL 1.1 §13.3); correlation through the shared
    ?d var leaves only the matching outer graph."""
    from cm_well_spark.operators.sparql import sparql_query

    return sparql_query(
        _tri(spark, sf_dir),
        "SELECT ?g2 ?d WHERE { GRAPH ?g2 { ?d <source> ?s1 . "
        "GRAPH </graphs/src2> { ?d <source> ?s2 } } }",
        limit_cap=None,
    )


@register(
    "search_like_fuzzy_term",
    oracle="""
    SELECT '/tpch/part/' || p_partkey AS path, p_name AS name
    FROM part
    WHERE len(list_filter(
        string_split(trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g')), ' '),
        tok -> levenshtein(tok, 'widgt') <= 1)) > 0
    """,
)
def search_like_fuzzy_term(spark, sf_dir):
    """F1 `~` Like with Lucene fuzzyQuery PARITY (r6,
    FTSService.scala:905-910): the query term matches when ANY analyzed
    token of the value is within the AUTO edit distance — `name~widgt`
    matches "large widget" through its 'widget' token. Previously a
    pinned whole-value divergence."""
    df = S.search(_inf(spark, sf_dir), qp="rdfType::Part,name~widgt", length=None, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
    return df.select("path", fv.first_value("name").alias("name"))


@register(
    "search_contains_uax29ish",
    oracle="""
    SELECT '/tpch/part/' || p_partkey AS path, p_name AS name
    FROM part
    WHERE contains(
      ' ' || trim(regexp_replace(regexp_replace(
        ' ' || regexp_replace(lower(p_name), '[^a-z0-9''._]+', ' ', 'g') || ' ',
        ' [''._]+', ' ', 'g'), '[''._]+ ', ' ', 'g')) || ' ',
      ' widget ')
    """,
)
def search_contains_uax29ish(spark, sf_dir):
    """F1 `:` Contains under the opt-in `uax29ish` analyzer (r6 oracle
    pin; r11 positional tightening — VERDICT r10 item 8): mid-word
    apostrophes/periods/underscores survive tokenization positionally
    (`@` now always breaks, matching StandardAnalyzer), edges are
    stripped — the oracle replicates the tokenizer in RE2-safe SQL (no
    lookbehind; the positional mid-char rules are invisible on this
    corpus — part names carry no mid-word punctuation — and are pinned
    by tests/test_analyzer_contract.py instead). CJK unigramming remains
    the documented divergence (SURVEY §7.3)."""
    from cm_well_spark.plans.compile import analyzer_mode

    with analyzer_mode("uax29ish"):
        df = S.search(_inf(spark, sf_dir), qp="rdfType::Part,name:widget", length=None, triples=_tri(spark, sf_dir), stats=_stats(spark, sf_dir))
    return df.select("path", fv.first_value("name").alias("name"))


@register(
    "search_score_uax29ish",
    oracle="""
    WITH base AS (SELECT p_partkey, lower(p_name) AS text FROM part),
    stats AS (
      SELECT count(*) AS n_docs,
             count(*) FILTER (WHERE length(text) > length(replace(text, 'widget', ''))) AS dft,
             avg(len(string_split(text, ' '))) AS avgdl
      FROM base
    )
    SELECT path, score FROM (
      SELECT '/tpch/part/' || p_partkey AS path,
             round(ln(1 + (n_docs - dft + 0.5) / (dft + 0.5))
                   * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6) AS score
      FROM (
        SELECT p_partkey, text,
               (length(text) - length(replace(text, 'widget', ''))) / 6.0 AS tf,
               len(string_split(text, ' ')) * 1.0 AS dl
        FROM base
        WHERE contains(' ' || trim(regexp_replace(text, '[^a-z0-9]+', ' ', 'g')) || ' ', ' widget ')
      ), stats
      ORDER BY score DESC, path ASC
    ) LIMIT 15
    """,
)
def search_score_uax29ish(spark, sf_dir):
    """O1 BM25 `-system.score` sort under the `uax29ish` analyzer (r6
    oracle pin): scores and ranking must be IDENTICAL to the simple-mode
    twin over this corpus (part names carry no mid-word punctuation, so
    both analyzers tokenize alike — the entry pins that the mode swap
    changes nothing it shouldn't, with the same BM25 oracle)."""
    from cm_well_spark.plans.compile import analyzer_mode

    with analyzer_mode("uax29ish"):
        df = S.search(
            _inf(spark, sf_dir),
            path_filter=S.PathFilter("/tpch/part"),
            qp="name:widget",
            sort_by="-system.score",
            length=15,
            keep_score=True,
        )
    return df.select("path", F.round("__score", 6).alias("score"))


@register(
    "gremlin_closure_filter",
    oracle="""
    SELECT '/tpch/orders/' || o_orderkey AS path FROM orders
    WHERE o_totalprice > 400000 AND o_orderstatus = 'O'
    """,
)
def gremlin_closure_filter(spark, sf_dir):
    """J6 Groovy-closure filter (GremlinParser.scala feeds closures to a
    live Groovy engine; the string front-end compiles the property-
    predicate subset through a safe grammar — no evaluation): conjunction
    of a typed numeric comparison and a string equality."""
    from cm_well_spark.operators.gremlin import eval_gremlin

    return eval_gremlin(
        _inf(spark, sf_dir),
        _tri(spark, sf_dir),
        'g.V().has("rdfType", "Order")'
        '.filter{it.totalprice > 400000 && it.orderstatus == "O"}.paths()',
    )


