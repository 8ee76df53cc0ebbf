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
    """The exact plans the pagerank family persists (r12: the raw edge
    relation and the out-degree relation — plain pagerank persists
    nothing, personalized persists both and must free them).
    CacheManager matches on analyzed-plan sameResult, so a fresh
    identical plan finds any leaked entry."""
    from cm_well_spark.operators.graph import DEFAULT_LINK_FIELDS, reference_edges

    edges = reference_edges(triples, DEFAULT_LINK_FIELDS)
    out_deg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    return edges, out_deg


def test_pagerank_unpersists_round_relations(spark, triples):
    from cm_well_spark.operators.graph import DEFAULT_LINK_FIELDS, pagerank

    out = pagerank(triples, DEFAULT_LINK_FIELDS, iterations=3)
    assert out.count() > 0
    edges, out_deg = _rebuild_round_relations(triples)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.lookupCachedData(edges._jdf).isEmpty()
    assert cm.lookupCachedData(out_deg._jdf).isEmpty()


def test_stale_stats_refuse_proof_paths(spark, sf_dir):
    """VERDICT r11 item 5: a stats snapshot whose store fingerprint no
    longer matches must degrade to NO stats (None — never an empty dict,
    which would read as proven-zero hop bounds), and the stats-less
    fallback must return identical rows."""
    import json
    import os

    from cm_well_spark.model.lakehouse import (
        _STATS_FPR,
        load_infotons,
        load_predicate_stats,
        load_triples,
        materialize,
    )
    from cm_well_spark.operators.traversal import expand_out

    out = materialize(spark, sf_dir)
    fresh = load_predicate_stats(spark, sf_dir)
    assert fresh and "inNation" in fresh

    inf = load_infotons(spark, sf_dir)
    tri = load_triples(spark, sf_dir)
    seeds = inf.where("path = '/tpch/customer/1'").select("path")
    with_stats = sorted(
        r["path"]
        for r in expand_out(inf, seeds, "inNation>ofRegion", triples=tri, stats=fresh)
        .select("path")
        .collect()
    )

    fp = os.path.join(out, _STATS_FPR)
    orig = open(fp).read()
    try:
        with open(fp, "w") as fh:
            json.dump({"store": "doctored-stale"}, fh)
        assert load_predicate_stats(spark, sf_dir) is None
        without_stats = sorted(
            r["path"]
            for r in expand_out(inf, seeds, "inNation>ofRegion", triples=tri, stats=None)
            .select("path")
            .collect()
        )
        assert with_stats == without_stats and with_stats
    finally:
        with open(fp, "w") as fh:
            fh.write(orig)
    assert load_predicate_stats(spark, sf_dir) is not None


def test_personalized_pagerank_unpersists_round_relations(spark, triples):
    from cm_well_spark.operators.graph import DEFAULT_LINK_FIELDS, personalized_pagerank

    seed = triples.where(F.col("current")).select("s").first()["s"]
    out = personalized_pagerank(triples, [seed], DEFAULT_LINK_FIELDS, iterations=2)
    assert out.count() > 0
    edges, out_deg = _rebuild_round_relations(triples)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.lookupCachedData(edges._jdf).isEmpty()
    assert cm.lookupCachedData(out_deg._jdf).isEmpty()
