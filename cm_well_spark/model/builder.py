"""Ingest adapter: project the test tables into the canonical infoton model.

This plays the role of the reference's `_in` ingest path (InputHandler ->
LDFormatParser -> merge -> index; SURVEY.md §3.4): external entity data
becomes one infoton per subject with typed, multi-valued, quad-taggable
fields, plus derived system fields (parent, parent_hierarchy, uuid,
index_time).

Entity graph laid over the TPC-H-ish tables (FReference fields are join
keys, like the reference's FReference values — Infoton.scala:672):

    /tpch/lineitem/{ok}-{ln} --ofOrder-->   /tpch/orders/{o_orderkey}
                             --ofPart-->    /tpch/part/{p_partkey}
                             --bySupplier-> /tpch/supplier/{s_suppkey}
    /tpch/orders/{ok}        --byCustomer-> /tpch/customer/{c_custkey}
    /tpch/customer/{ck}      --inNation-->  /tpch/nation/{n_nationkey}
    /tpch/supplier/{sk}      --inNation-->  /tpch/nation/{n_nationkey}
    /tpch/nation/{nk}        --ofRegion-->  /tpch/region/{r_regionkey}
    /events/{id}             --byUser-->    /users/{user_id}   (GHOST: never written)
    /docs/{id}               (documents; `source` value quad-tagged /graphs/{source})

The dangling /users/* references deliberately reproduce the reference's
ghost-infoton behavior (GhostInfoton Infoton.scala:320; traversals skip
404 subjects, ExpansionTests.scala:238-243).

All system values are DETERMINISTIC functions of the keys so uuids and
index_time are stable across runs (uuid determinism requirement:
Infoton.scala:139-168 computes MD5 over path+lastModified+sorted fields;
we keep the same recipe shape over our canonical serialization).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cm_well_spark.model.fieldvals import single
from cm_well_spark.sources import tables as tbl

# index_time spacing: deterministic, globally unique, ordered by (kind, key).
INDEX_TIME_BASE = 1_700_000_000_000
KIND_ORDER = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
]
KIND_SLOT = {k: i for i, k in enumerate(KIND_ORDER)}

EPOCH_2020 = 1_577_836_800  # 2020-01-01T00:00:00Z


def _system_cols(df: DataFrame, table: str, path_col, key_col) -> DataFrame:
    """Attach system fields. parent/parent_hierarchy mirror the derived
    parent (Infoton.scala:40-64) and ES `parent_hierarchy` analyzer."""
    df = df.withColumn("path", path_col)
    df = df.withColumn("parent", F.regexp_replace("path", "/[^/]+$", ""))
    df = df.withColumn("parent", F.when(F.col("parent") == "", "/").otherwise(F.col("parent")))
    # "/tpch/customer/1" -> ["/", "/tpch", "/tpch/customer"] (every ancestor
    # prefix; the leading "" split element supplies the "/" separator).
    df = df.withColumn(
        "parent_hierarchy",
        F.concat(
            F.array(F.lit("/")),
            # guard: sequence(1, 0) runs DESCENDING in Spark, so a
            # 2-segment path ("/x") would list ITSELF as an ancestor
            F.when(
                F.size(F.split(F.col("path"), "/")) >= 3,
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.size(F.split(F.col("path"), "/")) - F.lit(2)),
                        lambda i: F.concat_ws("/", F.slice(F.split(F.col("path"), "/"), 1, i + 1)),
                    ),
                    lambda p: p != "",
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
    )
    df = df.withColumn("last_modified", F.timestamp_seconds(F.lit(EPOCH_2020) + key_col.cast("long") % 10_000_000))
    df = df.withColumn("last_modified_by", F.lit("spark-graft"))
    df = df.withColumn("dc", F.lit("local"))
    df = df.withColumn(
        "index_time",
        F.lit(INDEX_TIME_BASE) + F.lit(KIND_SLOT[table] * 10_000_000_000) + key_col.cast("long"),
    )
    df = df.withColumn("current", F.lit(True))
    df = df.withColumn("protocol", F.lit("https"))
    df = df.withColumn("kind", F.lit("ObjectInfoton"))
    for c, t in [
        ("mime_type", "string"),
        ("data", "binary"),
        ("data_pointer", "string"),
        ("link_to", "string"),
        ("link_kind", "int"),
    ]:
        df = df.withColumn(c, F.lit(None).cast(t))
    return df


def _finish(df: DataFrame, table: str, key_col) -> DataFrame:
    """Drop empty fields, compute the content-hash uuid, project canon cols."""
    df = df.withColumn("fields", F.map_filter(F.col("fields"), lambda k, v: v.isNotNull() & (F.size(v) > 0)))
    # uuid = md5 over path + lastModified + sorted canonical field string —
    # same *recipe shape* as Infoton.scala:139-168 (content hash identifying a
    # version); byte layout is our own canonical serialization.
    canon_fields = F.concat_ws(
        ";",
        F.array_sort(
            F.transform(
                F.map_entries(F.col("fields")),
                lambda e: F.concat_ws(
                    ":",
                    e["key"],
                    F.concat_ws("|", F.array_sort(F.transform(e["value"], lambda v: v["value"]))),
                ),
            )
        ),
    )
    df = df.withColumn(
        "uuid",
        F.md5(F.concat_ws("\n", F.col("path"), F.date_format("last_modified", "yyyy-MM-dd'T'HH:mm:ss'Z'"), canon_fields)),
    )
    cols = [
        "path",
        "uuid",
        "kind",
        "parent",
        "parent_hierarchy",
        "last_modified",
        "last_modified_by",
        "dc",
        "index_time",
        "current",
        "protocol",
        "fields",
        "mime_type",
        "data",
        "data_pointer",
        "link_to",
        "link_kind",
    ]
    return df.select(*cols)


def _fields_map(pairs: list[tuple[str, object]]):
    args = []
    for name, arr in pairs:
        args.append(F.lit(name))
        args.append(arr)
    return F.map_from_arrays(
        F.array(*[a for i, a in enumerate(args) if i % 2 == 0]),
        F.array(*[a for i, a in enumerate(args) if i % 2 == 1]),
    )


def _build(df, table: str, key_col, path_col, field_pairs) -> DataFrame:
    df = df.withColumn("fields", _fields_map(field_pairs))
    df = _system_cols(df, table, path_col, key_col)
    return _finish(df, table, key_col)


def region_infotons(df: DataFrame) -> DataFrame:
    return _build(
        df,
        "region",
        F.col("r_regionkey"),
        F.concat(F.lit("/tpch/region/"), F.col("r_regionkey")),
        [
            ("name", single(F.col("r_name"), "s")),
            ("regionkey", single(F.col("r_regionkey"), "l")),
            ("rdfType", single(F.lit("Region"), "s")),
        ],
    )


def nation_infotons(df: DataFrame) -> DataFrame:
    return _build(
        df,
        "nation",
        F.col("n_nationkey"),
        F.concat(F.lit("/tpch/nation/"), F.col("n_nationkey")),
        [
            ("name", single(F.col("n_name"), "s")),
            ("nationkey", single(F.col("n_nationkey"), "l")),
            ("ofRegion", single(F.concat(F.lit("/tpch/region/"), F.col("n_regionkey")), "s")),
            ("rdfType", single(F.lit("Nation"), "s")),
        ],
    )


def customer_infotons(df: DataFrame) -> DataFrame:
    return _build(
        df,
        "customer",
        F.col("c_custkey"),
        F.concat(F.lit("/tpch/customer/"), F.col("c_custkey")),
        [
            ("name", single(F.col("c_name"), "s")),
            ("custkey", single(F.col("c_custkey"), "l")),
            ("acctbal", single(F.col("c_acctbal"), "w")),
            ("mktsegment", single(F.col("c_mktsegment"), "s")),
            ("inNation", single(F.concat(F.lit("/tpch/nation/"), F.col("c_nationkey")), "s")),
            ("rdfType", single(F.lit("Customer"), "s")),
        ],
    )


def supplier_infotons(df: DataFrame) -> DataFrame:
    return _build(
        df,
        "supplier",
        F.col("s_suppkey"),
        F.concat(F.lit("/tpch/supplier/"), F.col("s_suppkey")),
        [
            ("name", single(F.col("s_name"), "s")),
            ("suppkey", single(F.col("s_suppkey"), "l")),
            ("acctbal", single(F.col("s_acctbal"), "w")),
            ("inNation", single(F.concat(F.lit("/tpch/nation/"), F.col("s_nationkey")), "s")),
            ("rdfType", single(F.lit("Supplier"), "s")),
        ],
    )


def part_infotons(df: DataFrame) -> DataFrame:
    # `words` is deliberately multi-valued (values are SETS, Infoton.scala:77).
    words = F.array_distinct(F.split(F.col("p_name"), " "))
    return _build(
        df,
        "part",
        F.col("p_partkey"),
        F.concat(F.lit("/tpch/part/"), F.col("p_partkey")),
        [
            ("name", single(F.col("p_name"), "s")),
            ("partkey", single(F.col("p_partkey"), "l")),
            ("brand", single(F.col("p_brand"), "s")),
            ("ptype", single(F.col("p_type"), "s")),
            ("size", single(F.col("p_size"), "i")),
            ("retailprice", single(F.col("p_retailprice"), "w")),
            (
                "words",
                F.transform(words, lambda w: F.struct(
                    w.alias("value"),
                    F.lit("s").alias("vtype"),
                    F.lit(None).cast("string").alias("lang"),
                    F.lit(None).cast("string").alias("quad"),
                    F.lit(None).cast("double").alias("num"),
                    F.lit(None).cast("timestamp").alias("ts"),
                    F.lit(None).cast("boolean").alias("bool"),
                )),
            ),
            ("rdfType", single(F.lit("Part"), "s")),
        ],
    )


def orders_infotons(df: DataFrame) -> DataFrame:
    return _build(
        df,
        "orders",
        F.col("o_orderkey"),
        F.concat(F.lit("/tpch/orders/"), F.col("o_orderkey")),
        [
            ("orderkey", single(F.col("o_orderkey"), "l")),
            ("orderstatus", single(F.col("o_orderstatus"), "s")),
            ("totalprice", single(F.col("o_totalprice"), "w")),
            ("orderdate", single(F.col("o_orderdate"), "d")),
            ("orderpriority", single(F.col("o_orderpriority"), "s")),
            ("byCustomer", single(F.concat(F.lit("/tpch/customer/"), F.col("o_custkey")), "s")),
            ("rdfType", single(F.lit("Order"), "s")),
        ],
    )


def lineitem_infotons(df: DataFrame) -> DataFrame:
    # the synthetic lineitem table does NOT have a unique
    # (l_orderkey, l_linenumber) key — disambiguate with a deterministic
    # ordinal (same window is reproducible in the DuckDB oracle), keeping
    # the path-uniqueness invariant of the infoton model
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate", "l_partkey", "l_suppkey"
    )
    df = df.withColumn("__rn", F.row_number().over(w))
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")) * 8 + (F.col("__rn") - 1)
    return _build(
        df,
        "lineitem",
        key,
        F.concat(
            F.lit("/tpch/lineitem/"),
            F.col("l_orderkey"),
            F.lit("-"),
            F.col("l_linenumber"),
            F.lit("-"),
            F.col("__rn"),
        ),
        [
            ("orderkey", single(F.col("l_orderkey"), "l")),
            ("linenumber", single(F.col("l_linenumber"), "i")),
            ("quantity", single(F.col("l_quantity"), "w")),
            ("extendedprice", single(F.col("l_extendedprice"), "w")),
            ("discount", single(F.col("l_discount"), "w")),
            ("tax", single(F.col("l_tax"), "w")),
            ("returnflag", single(F.col("l_returnflag"), "s")),
            ("linestatus", single(F.col("l_linestatus"), "s")),
            ("shipdate", single(F.col("l_shipdate"), "d")),
            ("ofOrder", single(F.concat(F.lit("/tpch/orders/"), F.col("l_orderkey")), "s")),
            ("ofPart", single(F.concat(F.lit("/tpch/part/"), F.col("l_partkey")), "s")),
            ("bySupplier", single(F.concat(F.lit("/tpch/supplier/"), F.col("l_suppkey")), "s")),
            ("rdfType", single(F.lit("Lineitem"), "s")),
        ],
    )


def events_infotons(df: DataFrame) -> DataFrame:
    return _build(
        df,
        "events",
        F.col("event_id"),
        F.concat(F.lit("/events/"), F.col("event_id")),
        [
            ("eventType", single(F.col("event_type"), "s")),
            ("eventTs", single(F.col("ts"), "d")),
            ("value", single(F.col("value"), "w")),
            ("props", single(F.col("props"), "s")),
            # ghost reference: /users/* is never written
            ("byUser", single(F.concat(F.lit("/users/"), F.col("user_id")), "s")),
            # deep same-predicate chains (depth 15 within each 16-block):
            # the fixture for unbounded `p+` closure — a bounded-depth
            # implementation answers these incompletely. NULL at block
            # heads drops the field via _finish's map_filter.
            (
                "prevEvent",
                single(
                    F.when(
                        F.col("event_id") % 16 != 0,
                        F.concat(F.lit("/events/"), F.col("event_id") - 1),
                    ),
                    "s",
                ),
            ),
            ("rdfType", single(F.lit("Event"), "s")),
        ],
    )


def documents_infotons(df: DataFrame) -> DataFrame:
    # `source` carries a quad (named-graph) tag — value-level quad tagging
    # per Infoton.scala:507 / FX4.
    return _build(
        df,
        "documents",
        F.col("doc_id"),
        F.concat(F.lit("/docs/"), F.col("doc_id")),
        [
            ("text", single(F.col("text"), "s", lang=F.col("lang"))),
            ("lang", single(F.col("lang"), "s")),
            ("source", single(F.col("source"), "s", quad=F.concat(F.lit("/graphs/"), F.col("source")))),
            ("nchars", single(F.col("n_chars"), "l")),
            ("rdfType", single(F.lit("Document"), "s")),
        ],
    )


BUILDERS = {
    "region": region_infotons,
    "nation": nation_infotons,
    "customer": customer_infotons,
    "supplier": supplier_infotons,
    "part": part_infotons,
    "orders": orders_infotons,
    "lineitem": lineitem_infotons,
    "events": events_infotons,
    "documents": documents_infotons,
}


# Builders whose plan starts with its own keyed exchange (lineitem's
# disambiguation window) — a round-robin repartition in front of those is
# a wasted full shuffle of the raw rows: the window's hash exchange
# already spreads the build across the cluster.
_SELF_SHUFFLING = {"lineitem"}


def build_infotons(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None, shuffle: int | None = None
) -> DataFrame:
    """Union of all entity infotons for one scale factor.

    `shuffle`: repartition each RAW table before the fields-map build —
    the one shuffle of the ingest path, taken while the rows are still
    narrow columnar data. Downstream never reshuffles the struct-heavy
    built rows (r6 B8 fix: shuffling the wide fields map cost ~40 s at
    sf0.1; shuffling raw rows is a fraction of that and the writes keep
    per-task sort order instead). Defaults to the session's
    defaultParallelism (scale-adaptive: local[N] builds N-wide, a
    cluster builds cores-wide) instead of the former hard-coded 32."""
    names = only or KIND_ORDER
    width = shuffle or spark.sparkContext.defaultParallelism
    parts = []
    for name in names:
        raw = tbl.load_table(spark, sf_dir, name)
        if width and name not in _SELF_SHUFFLING:
            raw = raw.repartition(width)
        parts.append(BUILDERS[name](raw))
    return functools.reduce(lambda a, b: a.unionByName(b), parts)
