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


# ---------------------------------------------------------------------------
# round 9 (cont.): connected components, k-core, BFS distances
# ---------------------------------------------------------------------------


def _edge_df(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def test_connected_components_basic(spark):
    from cm_well_spark.operators.graph import connected_components

    # two components: a path (tests pointer jumping over diameter) + a pair
    path = [(f"/n{i}", f"/n{i + 1}") for i in range(9)]
    pairs = path + [("/z1", "/z2")]
    got = {r["node"]: r["component"] for r in connected_components(_edge_df(spark, pairs)).collect()}
    assert got == {**{f"/n{i}": "/n0" for i in range(10)}, "/z1": "/z1", "/z2": "/z1"}


def test_connected_components_matches_union_find(spark):
    from cm_well_spark.operators.graph import connected_components

    # deterministic pseudo-random graph, compare against union-find
    pairs = []
    for i in range(60):
        h = int(hashlib.md5(f"cc:{i}".encode()).hexdigest()[:6], 16)
        pairs.append((f"/v{h % 40}", f"/v{(h // 40) % 40}"))
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = {r["node"]: r["component"] for r in connected_components(_edge_df(spark, pairs)).collect()}
    assert got == want


def test_kcore_peels_to_unique_fixpoint(spark):
    from cm_well_spark.operators.graph import k_core

    # triangle + tail: the tail peels away round by round, triangle survives
    pairs = [("/a", "/b"), ("/b", "/c"), ("/c", "/a"),
             ("/c", "/t1"), ("/t1", "/t2"), ("/t2", "/t3")]
    got = {r["node"]: r["degree"] for r in k_core(_edge_df(spark, pairs), k=2).collect()}
    assert got == {"/a": 2, "/b": 2, "/c": 2}
    # k=3 kills everything (no node has 3 neighbors in the 2-core)
    assert k_core(_edge_df(spark, pairs), k=3).count() == 0


def test_kcore_fixture_converges_within_oracle_rounds(spark, sf_dir):
    """The registry oracle chains 11 peel rounds; the pinned sf0.01 slice
    must reach fixpoint within that (it needs 9). Guards the chained-CTE
    replay against fixture drift."""
    import collections

    import duckdb

    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') WHERE l_orderkey < 300"
    ).fetchall()
    adj = collections.defaultdict(set)
    for o, p in rows:
        adj[f"o{o}"].add(f"p{p}")
        adj[f"p{p}"].add(f"o{o}")
    nodes, rounds = set(adj), 0
    while True:
        peel = {n for n in nodes if len(adj[n] & nodes) < 2}
        if not peel:
            break
        nodes -= peel
        rounds += 1
    assert rounds <= 11, f"oracle chains 11 rounds but fixture needs {rounds}"


def test_bfs_distances_min_hop_and_depth_bound(spark):
    from cm_well_spark.operators.graph import bfs_distances

    #      s - a - b - c - d   (+ shortcut s-b, so b is 1 not 2)
    pairs = [("/s", "/a"), ("/a", "/b"), ("/b", "/c"), ("/c", "/d"), ("/s", "/b")]
    seeds = spark.createDataFrame([("/s",)], "path string")
    got = {r["path"]: r["distance"] for r in bfs_distances(_edge_df(spark, pairs), seeds, max_depth=2).collect()}
    assert got == {"/s": 0, "/a": 1, "/b": 1, "/c": 2}  # /d is 3 hops: cut

    # directed mode walks edge direction only
    got_dir = {
        r["path"]: r["distance"]
        for r in bfs_distances(
            _edge_df(spark, [("/s", "/a"), ("/b", "/s")]), seeds, max_depth=2, directed=True
        ).collect()
    }
    assert got_dir == {"/s": 0, "/a": 1}


def test_bfs_isolated_seed_still_reported(spark):
    from cm_well_spark.operators.graph import bfs_distances

    seeds = spark.createDataFrame([("/lonely",)], "path string")
    got = bfs_distances(_edge_df(spark, [("/x", "/y")]), seeds, max_depth=2).collect()
    assert {(r["path"], r["distance"]) for r in got} == {("/lonely", 0)}


def test_readability_known_values(spark):
    from cm_well_spark.operators.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, ""), (3, "no terminal punctuation here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = got[1]
    # 2 sentence runs, 6 words, vowel groups: e/a/a/e/o/a -> 6
    assert (r1["n_sentences"], r1["n_words"], r1["n_syllables"]) == (2, 6, 6)
    assert r1["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)
    assert r1["fk_grade"] == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 4)
    r2 = got[2]
    assert (r2["n_words"], r2["flesch"], r2["fk_grade"]) == (0, None, None)
    assert got[3]["n_sentences"] == 1  # min-1 floor


def _ppr_py(edges, seeds, iterations, damping=0.85):
    nodes = sorted({n for e in edges for n in e})
    odeg = {}
    for s, _ in edges:
        odeg[s] = odeg.get(s, 0) + 1
    share = 1.0 / len(seeds)  # normalized teleport: total mass 1 (ADVICE r9)
    rank = {n: (share if n in seeds else 0.0) for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0.0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / odeg[s]
        rank = {
            n: ((1 - damping) * share if n in seeds else 0.0) + damping * contrib[n]
            for n in nodes
        }
    return {n: r for n, r in rank.items() if r > 0}


@pytest.mark.parametrize("iterations", [1, 3])
def test_personalized_pagerank_matches_pure_python(tri, iterations):
    from cm_well_spark.operators.graph import personalized_pagerank

    seeds = ["/a"]
    want = _ppr_py(EDGES, set(seeds), iterations)
    got = {
        r["path"]: r["rank"]
        for r in personalized_pagerank(tri, seeds, iterations=iterations).collect()
    }
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12), n
    # the /d -> /ghost island is unreachable from /a: absent, not zero-ranked
    assert "/d" not in got and "/ghost" not in got


def test_personalized_pagerank_validation(tri):
    from cm_well_spark.operators.graph import personalized_pagerank

    with pytest.raises(ValueError):
        personalized_pagerank(tri, [], iterations=3)
    with pytest.raises(ValueError):
        personalized_pagerank(tri, ["/a"], iterations=0)


def test_clustering_coefficient_triangle_plus_pendant(spark):
    from cm_well_spark.operators.graph import clustering_coefficient

    # triangle a-b-c plus pendant d on a
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")], ["src", "dst"]
    )
    got = {r["path"]: r for r in clustering_coefficient(e).collect()}
    # b, c: degree 2, 1 triangle -> cc 1.0
    assert got["b"]["clustering"] == 1.0 and got["c"]["clustering"] == 1.0
    # a: degree 3, 1 triangle -> 2*1/(3*2) = 1/3
    assert got["a"]["n_triangles"] == 1
    assert got["a"]["clustering"] == pytest.approx(1 / 3, abs=1e-6)
    # pendant: degree 1 -> 0.0 by convention, not NULL
    assert got["d"]["clustering"] == 0.0 and got["d"]["n_triangles"] == 0


def test_clustering_coefficient_k4_all_ones(spark):
    from cm_well_spark.operators.graph import clustering_coefficient

    nodes = ["w", "x", "y", "z"]
    e = spark.createDataFrame(
        [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]], ["src", "dst"]
    )
    got = clustering_coefficient(e).collect()
    assert all(r["clustering"] == 1.0 and r["n_triangles"] == 3 for r in got)


def test_assortativity_star_is_negative(spark):
    from cm_well_spark.operators.graph import assortativity

    # star graphs are maximally disassortative: r = -1
    e = spark.createDataFrame([("h", f"l{i}") for i in range(4)], ["src", "dst"])
    row = assortativity(e).collect()[0]
    assert row["r"] == pytest.approx(-1.0, abs=1e-6)
    assert row["n_edges"] == 8  # symmetric


def test_assortativity_regular_graph_is_null(spark):
    from cm_well_spark.operators.graph import assortativity

    # a 4-cycle: every degree 2 -> zero variance -> r undefined (NULL)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["src", "dst"]
    )
    assert assortativity(e).collect()[0]["r"] is None
