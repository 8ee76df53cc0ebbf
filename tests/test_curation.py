

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
