"""Round-6-continued operators: sequence packing, export sharding,
semantic dedup, int8 quantization."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    return tbl.load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    return tbl.load_table(spark, sf_dir, "embeddings").cache()


# ---------------------------------------------------------------------------
# pack_concat_windows
# ---------------------------------------------------------------------------


def test_pack_windows_token_conservation(docs):
    """Every token lands in exactly one window: per-doc win_tokens sums to
    the doc's whitespace token count."""
    from cm_well_spark.operators.packing import pack_concat_windows
    from cm_well_spark.operators.text import whitespace_token_count

    packed = pack_concat_windows(docs, budget=64, n_shards=4)
    per_doc = packed.groupBy("doc_id").agg(F.sum("win_tokens").alias("got"))
    expect = docs.select("doc_id", whitespace_token_count(F.col("text")).alias("want"))
    bad = per_doc.join(expect, "doc_id").where(F.col("got") != F.col("want"))
    assert bad.count() == 0


def test_pack_windows_are_dense_and_full(docs):
    """Within a shard, windows 0..max-1 each carry exactly `budget` tokens
    (only the last window may be short), and window ids are contiguous."""
    from cm_well_spark.operators.packing import pack_concat_windows

    budget = 64
    packed = pack_concat_windows(docs, budget=budget, n_shards=4).cache()
    per_win = (
        packed.groupBy("shard", "window")
        .agg(F.sum("win_tokens").alias("tok"))
        .cache()
    )
    stats = per_win.groupBy("shard").agg(
        F.max("window").alias("maxw"), F.count("*").alias("n")
    )
    for r in stats.collect():
        assert r["n"] == r["maxw"] + 1, "window ids must be contiguous from 0"
    short = per_win.join(
        per_win.groupBy("shard").agg(F.max("window").alias("maxw")), "shard"
    ).where((F.col("window") < F.col("maxw")) & (F.col("tok") != budget))
    assert short.count() == 0, "every non-final window must be exactly full"
    packed.unpersist()
    per_win.unpersist()


def test_pack_windows_start_off_layout(spark):
    """Hand-checked layout: docs of 3/4/5 tokens, budget 6, one shard.
    Stream: [d0:0-3, d1:3-7, d2:7-12] -> d1 straddles windows 0/1."""
    from cm_well_spark.operators.packing import pack_concat_windows

    df = spark.createDataFrame(
        [(0, "a b c"), (4, "a b c d"), (8, "a b c d e")], ["doc_id", "text"]
    )
    out = {
        (r["doc_id"], r["window"]): (r["win_tokens"], r["start_off"])
        for r in pack_concat_windows(df, budget=6, n_shards=4).collect()
    }
    assert out[(0, 0)] == (3, 0)
    assert out[(4, 0)] == (3, 3)
    assert out[(4, 1)] == (1, 0)
    assert out[(8, 1)] == (5, 1)


def test_pack_windows_rejects_bad_args(docs):
    from cm_well_spark.operators.packing import pack_concat_windows

    with pytest.raises(ValueError):
        pack_concat_windows(docs, budget=0)
    with pytest.raises(ValueError):
        pack_concat_windows(docs, n_shards=0)


# ---------------------------------------------------------------------------
# shard_order
# ---------------------------------------------------------------------------


def test_shard_order_is_a_permutation(docs):
    from cm_well_spark.operators.packing import shard_order

    out = shard_order(docs, n_shards=4).cache()
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # positions are 1..n_shard contiguous per shard
    per = out.groupBy("shard").agg(F.max("pos").alias("mx"), F.count("*").alias("n"))
    for r in per.collect():
        assert r["mx"] == r["n"]
    out.unpersist()


def test_shard_order_salt_is_an_epoch(docs):
    """Different salt -> different order; same salt -> identical order
    even after a repartition (topology independence)."""
    from cm_well_spark.operators.packing import shard_order

    a = shard_order(docs, n_shards=4, salt="e1")
    b = shard_order(docs.repartition(13), n_shards=4, salt="e1")
    assert a.exceptAll(b).count() == 0
    c = shard_order(docs, n_shards=4, salt="e2")
    assert a.exceptAll(c).count() > 0


# ---------------------------------------------------------------------------
# kmeans / semantic dedup / quantization
# ---------------------------------------------------------------------------


def test_kmeans_assign_matches_brute_argmax(embs):
    from cm_well_spark.operators.similarity import kmeans_assign_fixed

    out = kmeans_assign_fixed(embs, k=4).cache()
    assert out.count() == embs.count()
    # recompute the argmax in pandas
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in embs.orderBy("vec_id").limit(4).collect()
    ]
    rows = embs.select("vec_id", "embedding").collect()
    for r in rows[:50]:
        v = [float(x) for x in r["embedding"]]
        sims = [sum(a * b for a, b in zip(v, s)) for s in seeds]
        want = max(range(4), key=lambda i: (sims[i], i))
        got = out.where(F.col("vec_id") == r["vec_id"]).first()["cell"]
        assert got == want
    out.unpersist()


def test_semantic_dedup_keeps_smallest_id(spark):
    """Two near-identical vectors + one distant: the larger near-dup id
    is dropped, everything else kept."""
    from cm_well_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.001, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(df, k=1, threshold=0.95).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_semantic_dedup_refined_same_contract(embs):
    """Lloyd-refined clustering changes cells, not the keep-contract
    shape: one row per vector, keepers exist in every cell."""
    from cm_well_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(embs, k=4, threshold=0.99, refined=True).cache()
    assert out.count() == embs.count()
    cells = out.groupBy("cell").agg(F.max(F.col("keep").cast("int")).alias("any_keep"))
    assert cells.where(F.col("any_keep") == 0).count() == 0
    out.unpersist()


def test_quantize_int8_bounds_and_roundtrip(embs):
    from cm_well_spark.operators.similarity import quantize_int8

    out = quantize_int8(embs).cache()
    # all components within int8 range
    mx = out.select(F.max(F.array_max("q")).alias("hi"), F.min(F.array_min("q")).alias("lo")).first()
    assert mx["hi"] <= 127 and mx["lo"] >= -127
    # dequantized max relative error bounded by scale/2 per component
    joined = embs.select("vec_id", "embedding").join(out, "vec_id")
    err = joined.select(
        F.array_max(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "q",
                lambda x, q: F.abs(x - q * F.col("scale")),
            )
        ).alias("e"),
        "scale",
    ).where(F.col("e") > F.col("scale") * 0.5 + 1e-12)
    assert err.count() == 0
    out.unpersist()


def test_quantize_int8_zero_vector(spark):
    from cm_well_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame([(1, [0.0, 0.0])], ["vec_id", "embedding"])
    r = quantize_int8(df).first()
    assert r["scale"] == 0.0 and list(r["q"]) == [0, 0]


def test_kmeans_update_means_match_pandas(embs):
    """The long-form Lloyd update equals a pandas groupby-mean."""
    from cm_well_spark.operators.similarity import kmeans_assign_fixed, kmeans_update

    assigned = {r["vec_id"]: r["cell"] for r in kmeans_assign_fixed(embs, k=4).collect()}
    got = {(r["cell"], r["pos"]): r["centroid"] for r in kmeans_update(embs, k=4).collect()}
    import collections

    sums = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for r in embs.select("vec_id", "embedding").collect():
        c = assigned[r["vec_id"]]
        for p, v in enumerate(r["embedding"]):
            sums[(c, p)] += float(v)
            counts[(c, p)] += 1
    for key, s in sums.items():
        assert abs(got[key] - round(s / counts[key], 6)) < 2e-6


def test_mixture_weights_binding_source(spark):
    """The binding source samples at 1.0; realized shares hit the target."""
    from cm_well_spark.operators.curation import mixture_weights

    df = spark.createDataFrame(
        [(i, "w " * 10, "a") for i in range(10)]       # a: 100+10 tokens? no: 10 docs x 11 tokens
        + [(100 + i, "w " * 10, "b") for i in range(2)],  # b: 2 docs
        ["doc_id", "text", "source"],
    )
    # tokens: 'w '*10 -> 'w w ... w ' split-> 10 words (trailing space trimmed)
    out = {r["source"]: r for r in mixture_weights(df, {"a": 0.5, "b": 0.5}).collect()}
    # b is binding: T = 20/0.5 = 40; a rate = 0.5*40/100 = 0.2
    assert out["b"]["rate"] == 1.0
    assert abs(out["a"]["rate"] - 0.2) < 1e-9


def test_mixture_weights_rejects_nonpositive_share(docs):
    from cm_well_spark.operators.curation import mixture_weights

    with pytest.raises(ValueError):
        mixture_weights(docs, {"src0": 0.0})


def test_sample_by_rates_matches_dict_variant(docs):
    """The computed-rates join sampler keeps exactly the rows the
    literal-dict sampler keeps at the same rates."""
    from cm_well_spark.operators.curation import sample_by_rates, stratified_sample

    rates_dict = {"src0": 0.5, "src1": 1.0}
    rates_df = docs.sparkSession.createDataFrame(
        [(k, v) for k, v in rates_dict.items()], ["source", "rate"]
    )
    a = stratified_sample(docs, "source", rates_dict).select("doc_id")
    b = sample_by_rates(docs, rates_df).select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_export_pipeline_manifest_conserves_tokens(docs):
    """Manifest token totals equal the sampled survivors' token counts —
    nothing lost or double-counted through pack + rollup."""
    from cm_well_spark.operators.curation import export_pipeline
    from pyspark.sql import functions as F

    targets = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    manifest = export_pipeline(docs, targets)
    total = manifest.agg(F.sum("n_tokens").alias("t")).first()["t"]
    assert total and total > 0
    # windows are full except the last one per shard
    per_shard = manifest.groupBy("shard").agg(
        F.max("window").alias("mx"), F.count("*").alias("n")
    )
    for r in per_shard.collect():
        assert r["n"] == r["mx"] + 1


def test_pq_encode_shape_and_reconstruction(embs):
    """Codes are valid codebook ids and PQ reconstruction beats a random
    codebook assignment on squared error (sanity that argmin is real)."""
    from cm_well_spark.operators.similarity import pq_encode

    m, k = 4, 8
    out = pq_encode(embs, m=m, k=k).cache()
    assert out.count() == embs.count()
    rng = out.select(
        F.min(F.array_min("codes")).alias("lo"), F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("sz"),
    ).first()
    assert rng["lo"] >= 0 and rng["hi"] <= k - 1 and rng["sz"] == m
    # reconstruction error with argmin codes <= error with code 0 everywhere
    seeds = [
        [float(x) for x in r["embedding"]] for r in embs.orderBy("vec_id").limit(k).collect()
    ]
    rows = embs.select("vec_id", "embedding").limit(40).collect()
    codes = {r["vec_id"]: list(r["codes"]) for r in out.collect()}
    sub_d = len(seeds[0]) // m
    err_best = err_zero = 0.0
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        for j in range(m):
            sub = v[j * sub_d : (j + 1) * sub_d]
            cb = seeds[codes[r["vec_id"]][j]][j * sub_d : (j + 1) * sub_d]
            z = seeds[0][j * sub_d : (j + 1) * sub_d]
            err_best += sum((a - b) ** 2 for a, b in zip(sub, cb))
            err_zero += sum((a - b) ** 2 for a, b in zip(sub, z))
    assert err_best <= err_zero
    out.unpersist()


def test_pq_encode_rejects_indivisible_dim(spark):
    from cm_well_spark.operators.similarity import pq_encode

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        pq_encode(df, m=2)


def test_pq_topk_recall_vs_brute(embs, spark, sf_dir):
    """ADC ranking must place a decent fraction of the true top-10 in its
    top-20 — coarse 4x8 codebooks are lossy, but not random."""
    from cm_well_spark.operators.similarity import brute_force_topk, pq_topk

    q = [float(x) for x in embs.orderBy("vec_id").first()["embedding"]]
    true10 = {r["vec_id"] for r in brute_force_topk(embs, q, k=10).collect()}
    adc20 = {r["vec_id"] for r in pq_topk(embs, q, k=20, m=4, n_codes=8).collect()}
    assert len(true10 & adc20) >= 3
    # the query vector itself (vec_id 0) quantizes to its own codes ->
    # its ADC distance is the minimum achievable for those codes
    top1 = pq_topk(embs, q, k=1, m=4, n_codes=8).first()
    assert top1["adc_dist"] >= 0.0


def test_ivfpq_topk_recall(embs):
    """Two-stage approximation still finds a reasonable slice of the true
    neighborhood (IVF pruning + PQ quantization compound), and the exact
    re-rank step can only improve on the raw ADC ranking: within the
    same candidate pool, re-ranked recall@k >= ADC-only recall@k."""
    from cm_well_spark.operators.similarity import brute_force_topk, ivfpq_topk

    q = [float(x) for x in embs.orderBy("vec_id").first()["embedding"]]
    true10 = {r["vec_id"] for r in brute_force_topk(embs, q, k=10).collect()}
    adc20 = {r["vec_id"] for r in ivfpq_topk(embs, q, k=20, rerank=0).collect()}
    got20 = {r["vec_id"] for r in ivfpq_topk(embs, q, k=20).collect()}
    assert 0 in got20  # the query vector itself survives both stages
    assert len(true10 & got20) >= 2
    assert len(true10 & got20) >= len(true10 & adc20)
    # re-ranked output is exact cosine, descending
    rows = ivfpq_topk(embs, q, k=5).collect()
    assert [r["cosine"] for r in rows] == sorted((r["cosine"] for r in rows), reverse=True)


# ---------------------------------------------------------------------------
# property pins
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.integers(1, 64),
    st.integers(1, 4),
)
def test_pack_windows_conservation_random(spark, word_counts, budget, n_shards):
    """Token conservation + in-budget windows hold for arbitrary doc
    shapes (including empty texts, which count 1 whitespace token)."""
    from cm_well_spark.operators.packing import pack_concat_windows

    rows = [(i, "w " * n) for i, n in enumerate(word_counts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_concat_windows(df, budget=budget, n_shards=n_shards)
    agg = {r["doc_id"]: r["tot"] for r in packed.groupBy("doc_id").agg(F.sum("win_tokens").alias("tot")).collect()}
    for i, n in enumerate(word_counts):
        assert agg[i] == max(n, 1)  # "" and "w " both split to >=1 token
    over = packed.groupBy("shard", "window").agg(F.sum("win_tokens").alias("t")).where(F.col("t") > budget)
    assert over.count() == 0


def test_pq_topk_batch_matches_single(embs):
    """r7 batched ADC: each query's batched result equals its single
    pq_topk run (same codes, same LUT arithmetic, one plan for N)."""
    from cm_well_spark.operators.similarity import pq_topk, pq_topk_batch

    spark = embs.sparkSession
    qrows = embs.orderBy("vec_id").limit(3).collect()
    queries = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id long, embedding array<double>",
    )
    batched = pq_topk_batch(embs, queries, k=5)
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["adc_dist"]))
    for r in qrows:
        single = [
            (x["vec_id"], x["adc_dist"])
            for x in pq_topk(embs, [float(v) for v in r["embedding"]], k=5).collect()
        ]
        assert sorted(got[int(r["vec_id"])]) == sorted(single)


def test_ivfpq_topk_batch_recall_and_shape(embs):
    """r7 batched IVF-PQ + re-rank: per-query results are exact-cosine
    ranked, the query vector finds itself, and recall@20 vs brute-force
    is reasonable for every query in the batch."""
    from cm_well_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk_batch,
    )

    spark = embs.sparkSession
    qrows = embs.orderBy("vec_id").limit(3).collect()
    queries = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id long, embedding array<double>",
    )
    out = ivfpq_topk_batch(embs, queries, k=20).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {int(r["vec_id"]) for r in qrows}
    for qid, rows in by_q.items():
        assert len(rows) <= 20
        assert qid in {r["vec_id"] for r in rows}  # self-hit survives
        cos = [r["cosine"] for r in rows]
        assert cos == sorted(cos, reverse=True)
        true10 = {
            r["vec_id"]
            for r in brute_force_topk(
                embs, [float(x) for x in next(q for q in qrows if int(q["vec_id"]) == qid)["embedding"]], k=10
            ).collect()
        }
        assert len(true10 & {r["vec_id"] for r in rows}) >= 2
    # ADC-only mode returns ascending distances
    adc = ivfpq_topk_batch(embs, queries, k=5, rerank=0).collect()
    for qid in {r["query_id"] for r in adc}:
        d = [r["adc_dist"] for r in adc if r["query_id"] == qid]
        assert d == sorted(d)


def test_packing_stats_reconciles_with_packer(docs):
    """r7 packing_stats: totals agree with per-doc token counts, the
    packed bound is ceil(total/budget), and the single-shard packer
    produces exactly that many windows."""
    from cm_well_spark.operators.packing import pack_concat_windows, packing_stats
    from cm_well_spark.operators.text import whitespace_token_count

    budget = 64
    s = packing_stats(docs, context_len=budget).collect()[0]
    per_doc = docs.select(whitespace_token_count(F.col("text")).alias("n")).collect()
    total = sum(r["n"] for r in per_doc)
    assert s["n_docs"] == len(per_doc)
    assert s["total_tokens"] == total
    assert s["max_tokens"] == max(r["n"] for r in per_doc)
    assert s["n_seqs_packed"] == -(-total // budget)
    assert s["n_seqs_unpacked"] == sum(-(-r["n"] // budget) for r in per_doc)
    assert 0.0 <= s["pad_waste_frac_unpacked"] < 1.0

    packed = pack_concat_windows(docs, budget=budget, n_shards=1)
    n_windows = packed.select("shard", "window").distinct().count()
    assert n_windows == s["n_seqs_packed"]


def test_pca_fit_matches_numpy_and_project_is_columnar(spark):
    """r7 PCA: distributed moment accumulation + driver eig equals
    numpy's full-data PCA (same mean, same components up to the pinned
    sign convention); projection reproduces numpy's and carries no
    shuffle or Python in the row path."""
    import numpy as np

    from cm_well_spark.operators.similarity import pca_fit, pca_project

    rng = np.random.RandomState(7)
    # anisotropic cloud so component order is unambiguous
    base = rng.randn(200, 6) * np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    mix = rng.randn(6, 6)
    x = base @ mix
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    comps, mean = pca_fit(df, 3)
    # numpy reference on the SAME float32-truncated data the engine saw
    x32 = x.astype(np.float32).astype(np.float64)
    want_mean = x32.mean(axis=0)
    cov = np.cov(x32, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    assert np.allclose(mean, want_mean, atol=1e-6)
    for j, k in enumerate(order):
        v = vecs[:, k]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        assert np.allclose(comps[j], v, atol=1e-6), j
    # orthonormal
    c = np.array(comps)
    assert np.allclose(c @ c.T, np.eye(3), atol=1e-8)
    # projection parity on a few rows
    got = {r["vec_id"]: r["proj"] for r in pca_project(df, comps, mean).collect()}
    want = (x32 - want_mean) @ c.T
    for i in (0, 57, 199):
        assert np.allclose(got[i], want[i], atol=1e-6), i
    plan = pca_project(df, comps, mean)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF in the projection path


def test_pca_fit_empty_raises(spark):
    import pytest

    from cm_well_spark.operators.similarity import pca_fit

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        pca_fit(df, 2)
