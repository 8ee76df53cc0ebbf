"""Focused contracts for the r11 second-half optimizations: each one
changed an operator's INTERNALS on the promise of bit-identical output
or cache hygiene — these pin the promise, independent of the oracle
matrix.

  cosine_pren       == cosine() bit-exactly (incl. the zero-vector guard)
  srp_bucket_sql    == the Column-object srp_bucket tree, row for row
  kmeans SQL assign == the Column-object struct-max tree
  fuzzy self-join   stays a shuffle join (the broadcast plan derived the
                    variant subtree twice — guarded by plan text)
  bfs_distances     leaves NO CacheManager entry behind (its persist is
                    freed after the construction-time loop)
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _embs(spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    return tbl.load_table(spark, sf_dir, "embeddings")


def test_cosine_pren_bit_identical(spark):
    from cm_well_spark.operators.similarity import cosine, cosine_pren, norm

    rows = [
        ([1.0, 2.0, -3.5], [0.5, -0.25, 8.0]),
        ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # zero vector: guard path
        ([1e-160, 1e-160, 0.0], [1e160, -1e160, 2.0]),
        ([0.1, 0.2, 0.3], [0.1, 0.2, 0.3]),
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = (
        df.withColumn("na", norm(F.col("a")))
        .withColumn("nb", norm(F.col("b")))
        .select(
            cosine(F.col("a"), F.col("b")).alias("old"),
            cosine_pren(F.col("a"), F.col("b"), F.col("na"), F.col("nb")).alias("new"),
        )
        .collect()
    )
    for r in got:
        # bit-exact, not approx: the optimization promises identical IEEE ops
        assert r["old"] == r["new"], (r["old"], r["new"])


def test_srp_bucket_sql_bit_identical(spark, sf_dir):
    from cm_well_spark.operators.similarity import _planes, srp_bucket, srp_bucket_sql

    planes = _planes(64, 8, 42)
    cast = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = _embs(spark, sf_dir).select(F.col("vec_id"), cast.alias("v"))
    old = base.select("vec_id", srp_bucket(F.col("v"), planes).alias("old"))
    new = base.select("vec_id", F.expr(srp_bucket_sql("v", planes)).alias("new"))
    assert old.join(new, "vec_id").where(F.col("old") != F.col("new")).count() == 0


def test_kmeans_sql_assignment_bit_identical(spark, sf_dir):
    from cm_well_spark.operators.similarity import dot, kmeans_assign_fixed

    embs = _embs(spark, sf_dir)
    new = kmeans_assign_fixed(embs, k=4)
    # the pre-r11 Column-object tree, rebuilt inline
    cast = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = embs.select(F.col("vec_id"), cast.alias("v"))
    cents = [(i, r["v"]) for i, r in enumerate(base.orderBy("vec_id").limit(4).collect())]
    arrs = F.array(
        *[
            F.struct(
                dot(F.col("v"), F.array(*[F.lit(float(x)) for x in cv])).alias("sim"),
                F.lit(ci).alias("cell"),
            )
            for ci, cv in cents
        ]
    )
    old = base.select("vec_id", F.array_max(arrs)["cell"].alias("old"))
    assert new.join(old, "vec_id").where(F.col("cell") != F.col("old")).count() == 0


def test_fuzzy_self_join_stays_shuffled(spark):
    from cm_well_spark.operators.fuzzy import edit_distance_pairs

    words = spark.createDataFrame(
        [("alpha",), ("alphb",), ("beta",), ("betas",)], "w string"
    )
    df = edit_distance_pairs(words, max_dist=1)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "SortMergeJoin" in plan
    # the candidate join itself must not be a broadcast of the variant
    # relation; the verify/dedup tail has no join at all, so any BHJ in
    # this plan would be the regression
    assert "BroadcastHashJoin" not in plan
    got = {(r["a"], r["b"], r["dist"]) for r in df.collect()}
    assert got == {("alpha", "alphb", 1), ("beta", "betas", 1)}


def test_bfs_unpersists_its_edge_cache(spark, sf_dir):
    from cm_well_spark.model.lakehouse import load_triples
    from cm_well_spark.operators.graph import DEFAULT_LINK_FIELDS, bfs_distances, reference_edges

    tri = load_triples(spark, sf_dir)
    edges = reference_edges(tri, DEFAULT_LINK_FIELDS, dedup=False)
    seeds = spark.createDataFrame([("/tpch/customer/1",)], "path string")
    out = bfs_distances(edges, seeds, max_depth=2)
    assert out.count() > 0
    # the operator persisted its symmetric projection and must free it:
    # rebuilding the same plan must find no CacheManager match
    proj = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.lookupCachedData(proj._jdf).isEmpty()
