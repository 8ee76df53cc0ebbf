"""Whole-graph analytics (operators/graph.py): degrees, fixed-iteration
PageRank, bounded-fanout neighborhood sampling.

Fixture graph (triples-shaped rows):

    /a --ref--> /b     /a --ref--> /c
    /b --ref--> /c
    /c --ref--> /a
    /d --ref--> /ghost          (ghost: never a source)
    plus one NON-current edge and one non-reference ("x" typed) value
    that must be invisible to every operator.
"""

from __future__ import annotations

import hashlib

import pytest

EDGES = [("/a", "/b"), ("/a", "/c"), ("/b", "/c"), ("/c", "/a"), ("/d", "/ghost")]


@pytest.fixture(scope="module")
def tri(spark):
    rows = [(s, "ref", o, "s", True) for s, o in EDGES]
    rows.append(("/a", "ref", "/zz", "s", False))  # non-current: invisible
    rows.append(("/a", "other", "not-a-path", "s", True))  # not a reference
    rows.append(("/a", "num", "/7", "l", True))  # wrong vtype: invisible
    return spark.createDataFrame(rows, "s string, p string, o string, vtype string, current boolean")


def test_link_degrees(tri):
    from cm_well_spark.operators.graph import link_degrees

    got = {r["path"]: (r["out_degree"], r["in_degree"]) for r in link_degrees(tri).collect()}
    assert got == {
        "/a": (2, 1),
        "/b": (1, 1),
        "/c": (1, 2),
        "/d": (1, 0),
        "/ghost": (0, 1),  # J7 ghost: referenced, never written
    }


def _pagerank_py(edges, iterations, damping=0.85):
    nodes = sorted({n for e in edges for n in e})
    odeg = {}
    for s, _ in edges:
        odeg[s] = odeg.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0.0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / odeg[s]
        rank = {n: (1 - damping) + damping * contrib[n] for n in nodes}
    return rank


@pytest.mark.parametrize("iterations", [1, 4])
def test_pagerank_matches_pure_python(tri, iterations):
    from cm_well_spark.operators.graph import pagerank

    want = _pagerank_py(EDGES, iterations)
    got = {r["path"]: r["rank"] for r in pagerank(tri, iterations=iterations).collect()}
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12), n


def test_pagerank_rejects_zero_iterations(tri):
    from cm_well_spark.operators.graph import pagerank

    with pytest.raises(ValueError):
        pagerank(tri, iterations=0)


def test_sample_neighborhood_bounds_and_determinism(tri, spark):
    from cm_well_spark.operators.graph import sample_neighborhood

    seeds = spark.createDataFrame([("/a",)], "path string")
    out = sample_neighborhood(tri, seeds, fanouts=(1, 2)).collect()
    h1 = [(r["src"], r["dst"]) for r in out if r["hop"] == 1]
    h2 = [(r["src"], r["dst"]) for r in out if r["hop"] == 2]
    # fanout bound per frontier node, and every sampled edge is a real edge
    assert len(h1) == 1 and h1[0][0] == "/a"
    assert set(h1) | set(h2) <= set(EDGES)
    srcs2 = {s for s, _ in h2}
    assert srcs2 <= {d for _, d in h1}
    # deterministic: same salt -> identical sample; the selected neighbor
    # is the md5-minimal one, reproducible here in pure Python
    again = sample_neighborhood(tri, seeds, fanouts=(1, 2)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    want_first = min(
        (o for s, o in EDGES if s == "/a"),
        key=lambda o: hashlib.md5(f"gnn:/a:{o}".encode()).hexdigest(),
    )
    assert h1[0][1] == want_first


def test_sample_neighborhood_ghost_frontier_dies_quietly(tri, spark):
    from cm_well_spark.operators.graph import sample_neighborhood

    seeds = spark.createDataFrame([("/d",)], "path string")
    out = sample_neighborhood(tri, seeds, fanouts=(2, 2)).collect()
    # hop 1 reaches the ghost; hop 2 joins to nothing (J7) — no error
    assert [(r["hop"], r["src"], r["dst"]) for r in out] == [(1, "/d", "/ghost")]


def test_graph_plans_stay_equi_join(tri, spark):
    """Plan contract: degrees/pagerank/sampling never plan a cartesian
    or nested-loop join — every join is keyed (the 100 TB posture)."""
    from cm_well_spark.operators.graph import link_degrees, pagerank, sample_neighborhood

    seeds = spark.createDataFrame([("/a",)], "path string")
    for df in (
        link_degrees(tri),
        pagerank(tri, iterations=2),
        sample_neighborhood(tri, seeds, fanouts=(2, 2)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
