

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
