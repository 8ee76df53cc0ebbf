"""Focused contracts for the r12 optimizations (second optimization
round). Each pins a cache-hygiene or plan-shape promise the round's
changes make, independent of the oracle matrix.

  pagerank / personalized_pagerank leave NO CacheManager entry behind:
  their lazily-persisted round relations (edges+odeg, nodes) are freed
  after the final iteration state is materialized inside the operator
  (the _static_relation contract — VERDICT r11 item 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _rebuild_round_relations(triples):
    """The exact plans pagerank persists: the out-degree-decorated edge
    relation and the node universe. CacheManager matches on analyzed-plan
    sameResult, so a fresh identical plan finds any leaked entry."""
    from cm_well_spark.operators.graph import DEFAULT_LINK_FIELDS, reference_edges

    edges = reference_edges(triples, DEFAULT_LINK_FIELDS)
    out_deg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    dec = edges.join(out_deg, "src")
    nodes = (
        dec.select(F.col("src").alias("path"))
        .union(dec.select(F.col("dst").alias("path")))
        .distinct()
    )
    return dec, nodes


def test_pagerank_unpersists_round_relations(spark, triples):
    from cm_well_spark.operators.graph import DEFAULT_LINK_FIELDS, pagerank

    out = pagerank(triples, DEFAULT_LINK_FIELDS, iterations=3)
    assert out.count() > 0
    dec, nodes = _rebuild_round_relations(triples)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.lookupCachedData(dec._jdf).isEmpty()
    assert cm.lookupCachedData(nodes._jdf).isEmpty()


def test_personalized_pagerank_unpersists_round_relations(spark, triples):
    from cm_well_spark.operators.graph import DEFAULT_LINK_FIELDS, personalized_pagerank

    seed = triples.where(F.col("current")).select("s").first()["s"]
    out = personalized_pagerank(triples, [seed], DEFAULT_LINK_FIELDS, iterations=2)
    assert out.count() > 0
    dec, nodes = _rebuild_round_relations(triples)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.lookupCachedData(dec._jdf).isEmpty()
    assert cm.lookupCachedData(nodes._jdf).isEmpty()
