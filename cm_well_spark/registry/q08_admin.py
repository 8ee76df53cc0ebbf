"""F9 + S7/S8/S11 + W6/W7 namespaces, overwrite, purge, proc, audit.

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "ns_resolved_search",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS path, n_name AS name
    FROM nation WHERE n_nationkey > 20
    """,
)
def ns_resolved_search(spark, sf_dir):
    """F9 namespace resolution: external `local.prefix` field keys rewrite
    to internal names via the broadcast namespaces dim table before
    compilation (RawFieldFilter.eval analog)."""
    from cm_well_spark.functions.namespaces import NamespaceRegistry
    from cm_well_spark.parsers.qp import parse_qp
    from cm_well_spark.plans.compile import compile_filter

    reg = NamespaceRegistry({"tpch": "cmwell://meta/tpch"})
    ff = reg.resolve_filter(parse_qp("rdfType.tpch::Nation,nationkey.tpch>20"))
    df = _inf(spark, sf_dir).where(F.col("current")).where(compile_filter(ff))
    return df.select("path", fv.first_value("name").alias("name"))


@register(
    "admin_delete_recursive",
    oracle="""
    SELECT 0 AS live_regions, 5 AS tombstones
    """,
)
def admin_delete_recursive(spark, sf_dir):
    """S8 recursive delete: tombstone command per descendant through the
    merge writer; search stops seeing them, history keeps them."""
    from cm_well_spark.operators.admin import delete_recursive_commands
    from cm_well_spark.operators.merge import apply_commands
    from cm_well_spark.operators.search import list_children

    inf = _inf(spark, sf_dir)
    cmds = delete_recursive_commands(spark, inf, "/tpch/region")
    t = apply_commands(inf, cmds)
    live = list_children(t, "/tpch/region").count()
    tombs = t.where(
        F.col("path").startswith("/tpch/region/") & F.col("current") & (F.col("kind") == "DeletedInfoton")
    ).count()
    return spark.createDataFrame([(live, tombs)], "live_regions int, tombstones int")


@register(
    "admin_overwrite_ow",
    oracle="SELECT 2 AS n_versions, 'ow-uuid-1' AS current_uuid",
)
def admin_overwrite_ow(spark, sf_dir):
    """S7 `_ow`: complete externally-authored version appended without
    merge; current flips to the highest index_time."""
    from cm_well_spark.operators.admin import overwrite

    inf = _inf(spark, sf_dir)
    rows = (
        inf.where("path = '/tpch/region/0'")
        .withColumn("index_time", F.col("index_time") + 1000)
        .withColumn("uuid", F.lit("ow-uuid-1"))
    )
    out = overwrite(inf, rows)
    h = out.where("path = '/tpch/region/0'")
    cur = h.where("current").first()
    return spark.createDataFrame([(h.count(), cur["uuid"])], "n_versions int, current_uuid string")


@register(
    "admin_audit",
    oracle="""
    SELECT * FROM (VALUES
      ('exactly_one_current_per_path', 0), ('index_time_present', 0),
      ('path_parent_consistent', 0), ('tombstones_have_no_fields', 0),
      ('uuid_present', 0)
    ) AS t(check_name, violations)
    """,
)
def admin_audit(spark, sf_dir):
    """W7: table-invariant audit (the single-source-of-truth replacement
    for the C*/ES consistency crawler)."""
    from cm_well_spark.operators.admin import audit

    return audit(_inf(spark, sf_dir)).select(F.col("check").alias("check_name"), F.col("violations").cast("int"))


@register(
    "admin_info_path",
    oracle="""
    SELECT * FROM (VALUES
      ('/tpch/region/0', 'store', 'infotons/kind=ObjectInfoton', CAST(1700000000000 AS BIGINT), true),
      ('/tpch/region/0', 'index', 'triples/p=name',      CAST(1700000000000 AS BIGINT), true),
      ('/tpch/region/0', 'index', 'triples/p=regionkey', CAST(1700000000000 AS BIGINT), true),
      ('/tpch/region/0', 'index', 'triples/p=rdfType',   CAST(1700000000000 AS BIGINT), true),
      ('/tpch/nation/3', 'store', 'infotons/kind=ObjectInfoton', CAST(1710000000003 AS BIGINT), true),
      ('/tpch/nation/3', 'index', 'triples/p=name',      CAST(1710000000003 AS BIGINT), true),
      ('/tpch/nation/3', 'index', 'triples/p=nationkey', CAST(1710000000003 AS BIGINT), true),
      ('/tpch/nation/3', 'index', 'triples/p=ofRegion',  CAST(1710000000003 AS BIGINT), true),
      ('/tpch/nation/3', 'index', 'triples/p=rdfType',   CAST(1710000000003 AS BIGINT), true)
    ) AS t(path, layer, location, index_time, current)
    """,
)
def admin_info_path(spark, sf_dir):
    """op=info analog (admin.py:info_path; Application.scala:2805
    handleInfo): per path, which lakehouse layers / partition locations
    / versions hold it — the C*-rows + ES-entries location report. The
    entry projects the engine-replayable columns (partition-relative
    location, index_time, current); the operator additionally reports
    the physical parquet basename and version uuid, which are
    random-suffixed / content-hashed and so stay out of the hash
    compare."""
    from cm_well_spark.operators.admin import info_path

    return info_path(spark, sf_dir, ["/tpch/region/0", "/tpch/nation/3"]).select(
        "path", "layer", "location", "index_time", "current"
    )


@register(
    "virtual_proc_infotons",
    oracle="""
    SELECT '/proc/kind/ObjectInfoton' AS path, 'ObjectInfoton' AS kind,
           (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
         + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
         + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
         + (SELECT count(*) FROM lineitem) + (SELECT count(*) FROM events)
         + (SELECT count(*) FROM documents) AS versions,
           (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
         + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
         + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
         + (SELECT count(*) FROM lineitem) + (SELECT count(*) FROM events)
         + (SELECT count(*) FROM documents) AS current_rows,
           1780000000000 + (SELECT max(doc_id) FROM documents) AS max_index_time
    """,
)
def virtual_proc_infotons(spark, sf_dir):
    """S11 /proc virtual infotons (ActiveInfotonGenerator analog): per-kind
    version counts + index_time horizon, computed on demand. The oracle
    derives the same stats from the raw tables (documents hold the highest
    index_time slot)."""
    from cm_well_spark.operators.admin import proc_infotons

    return proc_infotons(_inf(spark, sf_dir)).select(
        "path", "kind", "versions", "current_rows", "max_index_time"
    )


