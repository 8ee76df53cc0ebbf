

def test_line_dedup_drops_boilerplate_and_reassembles(spark):
    """r7 line-level dedup (CCNet/RefinedWeb pass): recurring lines drop,
    unique lines stitch back in order, fully-boilerplate docs vanish."""
    from cm_well_spark.operators.dedup import line_dedup

    rows = [
        (1, "unique alpha\ncookie banner\nunique beta"),
        (2, "cookie banner\nonly here"),
        (3, "cookie banner"),
        (4, "Cookie   Banner!\nstill unique"),  # normalized dup of the banner
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in line_dedup(df, min_docs=2).collect()}
    assert got[1] == "unique alpha\nunique beta"  # order kept, middle dropped
    assert got[2] == "only here"
    assert 3 not in got  # emptied document drops out
    assert got[4] == "still unique"  # normalization catches case/punct variants


def test_keep_best_representative_policy(spark):
    """r7 representative selection: each near-dup cluster keeps its
    highest-quality member; exact ties fall to the smallest doc id."""
    from pyspark.sql import functions as F

    from cm_well_spark.operators.dedup import keep_best_representative
    from cm_well_spark.operators.text import quality_score

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the field"),
            (2, "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@"),
            (3, "a plain and readable sentence with the usual words in it"),
            (4, "a plain and readable sentence with the usual words in it"),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "doc_id long, cluster long"
    )
    best = {
        r["cluster"]: (r["doc_id"], r["best_quality"])
        for r in keep_best_representative(docs, clusters, quality_score(F.col("text"))).collect()
    }
    assert best[1][0] == 1          # readable text beats punctuation soup
    assert best[3][0] == 3          # identical quality -> smallest id
    assert set(best) == {1, 3}


def test_incremental_dedup_verdicts_and_survivors(spark):
    """r7 incremental dedup: a new batch checked against the seen corpus
    — exact copies flag exact_dup (and win over near), near-copies flag
    near_dup, fresh docs survive, and incremental_dedup returns exactly
    the surviving rows."""
    from cm_well_spark.operators.dedup import incremental_dedup, incremental_dedup_verdicts

    seen = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely different seen document about spark query planning today"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "The quick brown fox jumps over the lazy dog near the river bank!"),  # exact after norm
            (11, "the quick brown fox jumps over the lazy dog near the river edge"),  # near
            (12, "entirely novel content nothing like anything previously ingested here"),  # new
        ],
        "doc_id long, text string",
    )
    v = {r["doc_id"]: r["verdict"] for r in incremental_dedup_verdicts(new, seen, threshold=0.5).collect()}
    assert v == {10: "exact_dup", 11: "near_dup", 12: "new"}
    survivors = {r["doc_id"] for r in incremental_dedup(new, seen, threshold=0.5).collect()}
    assert survivors == {12}
    # hot-shingle guard path still yields identical verdicts on this fixture
    vg = {
        r["doc_id"]: r["verdict"]
        for r in incremental_dedup_verdicts(new, seen, threshold=0.5, max_shingle_freq=100).collect()
    }
    assert vg == v


def test_bloom_bitmap_bounds_and_no_false_negatives(spark):
    """Bloom prefilter invariants: the bitmap never exceeds m/64 rows,
    and every inserted key tests maybe=true (no false negatives) — the
    property that makes the verdict exactly the exact-join answer."""
    from cm_well_spark.operators.dedup import bloom_bitmap, bloom_maybe_member

    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)], "h string")
    m_bits, k_hashes = 1 << 12, 5
    bm = bloom_bitmap(keys, "h", m_bits, k_hashes)
    assert bm.count() <= m_bits // 64
    ids = keys.selectExpr("h", "h AS id")
    got = bloom_maybe_member(ids, "h", bm, "id", m_bits, k_hashes).collect()
    assert all(r["maybe"] for r in got)


def test_bloom_fpr_is_bounded(spark):
    """Absent keys come back maybe=true only at roughly the designed
    false-positive rate: n=500 keys in m=2^14 bits with k=5 gives
    FPR ≈ (1-e^{-kn/m})^k ≈ 0.7%; assert an order-of-magnitude bound."""
    from cm_well_spark.operators.dedup import bloom_bitmap, bloom_maybe_member

    m_bits, k_hashes = 1 << 14, 5
    seen = spark.createDataFrame([(f"seen{i}",) for i in range(500)], "h string")
    bm = bloom_bitmap(seen, "h", m_bits, k_hashes)
    absent = spark.createDataFrame([(f"absent{i}",) for i in range(2000)], "h string")
    got = bloom_maybe_member(absent.selectExpr("h", "h AS id"), "h", bm, "id", m_bits, k_hashes)
    fp = got.where("maybe").count()
    assert fp / 2000 < 0.05


def test_incremental_dedup_bloom_matches_exact_join(spark):
    """End-to-end: the bloom-prefiltered verdict equals plain exact
    membership, dup and fresh docs both present."""
    from cm_well_spark.operators.dedup import incremental_dedup_bloom

    seen = spark.createDataFrame(
        [(i, f"body of document {i}") for i in range(50)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, f"Body of DOCUMENT {i}!") for i in range(10)]  # normalizes equal
        + [(200 + i, f"genuinely new {i}") for i in range(10)],
        "doc_id long, text string",
    )
    v = {r["doc_id"]: r["verdict"] for r in incremental_dedup_bloom(new, seen).collect()}
    assert all(v[100 + i] == "exact_dup" for i in range(10))
    assert all(v[200 + i] == "new" for i in range(10))


def test_incremental_dedup_bloom_plan_contract(spark):
    """The bitmap side of the membership join is broadcast at the
    parameter-gated size, and no cartesian/nested-loop join appears."""
    from cm_well_spark.operators.dedup import incremental_dedup_bloom

    seen = spark.createDataFrame([(i, f"d{i}") for i in range(20)], "doc_id long, text string")
    new = spark.createDataFrame([(100, "d1"), (101, "x")], "doc_id long, text string")
    plan = (
        incremental_dedup_bloom(new, seen)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
