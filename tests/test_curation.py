

def test_url_host_and_filter_subdomains(spark):
    """r7 URL blocklist pass: host extraction handles scheme/userinfo/
    port/path; filtering drops exact hosts AND subdomains of blocked
    domains, never unrelated lookalikes."""
    from pyspark.sql import functions as F

    from cm_well_spark.operators.curation import url_filter, url_host

    hosts = spark.createDataFrame(
        [
            ("https://User:pw@Sub.Example.COM:8443/a/b?q=1",),
            ("http://plain.org/x",),
            ("no-scheme.net/path",),
        ],
        "url string",
    ).select(url_host(F.col("url")).alias("h"))
    assert [r["h"] for r in hosts.collect()] == ["sub.example.com", "plain.org", "no-scheme.net"]

    docs = spark.createDataFrame(
        [
            (1, "https://ads.tracker.com/x"),       # subdomain of blocked
            (2, "https://tracker.com/y"),           # exact blocked
            (3, "https://nottracker.com/z"),        # lookalike, kept
            (4, "https://deep.a.b.tracker.com/w"),  # deep subdomain
            (5, "https://fine.org/ok"),
        ],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in url_filter(docs, ["tracker.com"]).collect()}
    assert kept == {3, 5}


def test_dsir_weights_prefer_target_like_docs(spark):
    """r7 DSIR (Xie et al. 2023): importance weights rank raw docs that
    share the target's hashed n-gram distribution above dissimilar ones,
    and the Gumbel top-k is deterministic across re-evaluation."""
    from cm_well_spark.operators.curation import dsir_resample, dsir_weights

    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(8)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog once more"),
            (101, "quick brown fox and the lazy dog jump together"),
            (102, "zzz qqq xxx www vvv kkk jjj hhh ggg fff"),
            (103, "completely unrelated tokens nowhere near target corpus"),
        ],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["log_w"] for r in dsir_weights(raw, target).collect()}
    assert w[100] > w[102] and w[100] > w[103]
    assert w[101] > w[102] and w[101] > w[103]

    top = dsir_resample(raw, target, k=2)
    first = [(r["doc_id"], r["gumbel_key"]) for r in top.collect()]
    second = [(r["doc_id"], r["gumbel_key"]) for r in top.collect()]
    assert first == second and len(first) == 2
