"""W3/W4 + S5 versioned merge writer & history.

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "search_score_sort",
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
def search_score_sort(spark, sf_dir):
    """O1 relevance sort: sort-by=-system.score ranks by Okapi BM25 over
    the query's analyzed clauses — corpus stats (N, df, avgdl) from one
    broadcast aggregate over the search's base set (FTSService.scala:
    302-314 / Lucene BM25 analog; functions/scoring.py)."""
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
    "typed_field_expansion",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_acctbal AS acctbal
    FROM customer WHERE c_acctbal > 5000.0
    """,
)
def typed_field_expansion(spark, sf_dir):
    """F9 type-set expansion (RawFieldFilter.scala:103-148, ManglingTests):
    the external field `acctbal` resolves through the store's types cache
    to its mangled variant(s) (w$acctbal here), each compiled as a
    vtype-restricted match — same rows as the unexpanded query."""
    from cm_well_spark.functions.types_cache import FieldTypesCache
    from cm_well_spark.parsers.qp import parse_qp
    from cm_well_spark.plans.compile import compile_filter

    inf = _inf(spark, sf_dir)
    cache = FieldTypesCache.from_lakehouse(spark, sf_dir)
    expanded = cache.expand_filter(parse_qp("rdfType::Customer,acctbal>5000"))
    df = S.search(inf, qp=expanded, length=None)
    return df.select("path", fv.first_num("acctbal").alias("acctbal"))


@register(
    "rdf_ingest_turtle",
    oracle="""
    SELECT '/example.org/nation/' || n_nationkey AS path, n_name AS name,
           CAST(n_regionkey AS DOUBLE) AS regionkey
    FROM nation
    """,
)
def rdf_ingest_turtle(spark, sf_dir):
    """S6 Turtle ingest: render the nation table as a Turtle document
    (prefixes, 'a', ';' predicate lists, typed numbers), parse it back
    through the distributed document parser, assemble infotons, and
    surface (path, name, regionkey) — LDFormatParser.scala semantics on
    the engine's own data."""
    from cm_well_spark.sources.rdf import infotons_from_rdf
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents
    from cm_well_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "nation").collect()
    lines = ["@prefix ex: <http://example.org/> .", "@prefix n: <http://example.org/nation/> ."]
    for r in rows:
        lines.append(
            f'n:{r["n_nationkey"]} a ex:Nation ; ex:name "{r["n_name"]}" ; '
            f'ex:regionkey {r["n_regionkey"]} .'
        )
    docs = spark.createDataFrame([("\n".join(lines),)], ["value"])
    inf = infotons_from_rdf(parse_rdf_documents(docs, "ttl"))
    return inf.select(
        "path",
        fv.first_value("name").alias("name"),
        fv.first_num("regionkey").alias("regionkey"),
    )


@register(
    "rdf_ingest_jsonld",
    oracle="""
    SELECT '/example.org/region/' || r_regionkey AS path, r_name AS name
    FROM region
    """,
)
def rdf_ingest_jsonld(spark, sf_dir):
    """S6 JSON-LD ingest: @context/@graph/@id document of the region
    table, parsed distributed and assembled into infotons."""
    import json as _json

    from cm_well_spark.sources.rdf import infotons_from_rdf
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents
    from cm_well_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "region").collect()
    doc = _json.dumps(
        {
            "@context": {"@vocab": "http://example.org/"},
            "@graph": [
                {"@id": f"http://example.org/region/{r['r_regionkey']}", "name": r["r_name"]}
                for r in rows
            ],
        }
    )
    docs = spark.createDataFrame([(doc,)], ["value"])
    inf = infotons_from_rdf(parse_rdf_documents(docs, "jsonld"))
    return inf.select("path", fv.first_value("name").alias("name"))


@register(
    "merge_writer_current",
    oracle="""
    SELECT * FROM (VALUES
      ('/tpch/region/0', 'ObjectInfoton', 'AFRICA',   'e1|e2'),
      ('/tpch/region/1', 'ObjectInfoton', NULL,       NULL),
      ('/tpch/region/2', 'ObjectInfoton', 'REBORN',   NULL),
      ('/tpch/region/99','ObjectInfoton', 'NEWREGION',NULL)
    ) AS t(path, kind, name, extra)
    """,
)
def merge_writer_current(spark, sf_dir):
    """W3 merge semantics end-to-end: field union, field wipe, tombstone +
    resurrect, new-path create (Merger.scala:55-239). Constant oracle —
    the command fixture is fixed."""
    table = _merge_fixture(spark, sf_dir)
    cur = table.where(
        F.col("current") & F.col("path").isin("/tpch/region/0", "/tpch/region/1", "/tpch/region/2", "/tpch/region/99")
    )
    return cur.select(
        "path",
        "kind",
        fv.first_value("name").alias("name"),
        F.concat_ws("|", F.array_sort(F.transform(F.coalesce(F.col("fields").getItem("extra"), F.array()), lambda v: v["value"]))).alias("extra"),
    ).withColumn("extra", F.when(F.col("extra") == "", None).otherwise(F.col("extra")))


@register(
    "history_versions",
    oracle="""
    SELECT * FROM (VALUES
      ('/tpch/region/0', 3, 1),
      ('/tpch/region/2', 3, 1)
    ) AS t(path, n_versions, n_current)
    """,
)
def history_versions(spark, sf_dir):
    """S5 with-history: all versions retained, exactly one current
    (CRUDServiceFS.getInfotonHistory:197-228)."""
    table = _merge_fixture(spark, sf_dir)
    h = table.where(F.col("path").isin("/tpch/region/0", "/tpch/region/2"))
    return h.groupBy("path").agg(
        F.count("*").cast("int").alias("n_versions"),
        F.sum(F.when(F.col("current"), 1).otherwise(0)).cast("int").alias("n_current"),
    )


