"""Training-data pipeline operators: text analysis, dedup, similarity,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from cm_well_spark.sources import tables as tbl


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return tbl.load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return tbl.load_table(spark, sf_dir, "embeddings").cache()


# ---- text ----------------------------------------------------------------


def test_token_counts(docs):
    from cm_well_spark.operators.text import token_counts

    out = token_counts(docs).collect()
    assert all(r["bpe_tokens"] >= r["ws_tokens"] > 0 for r in out if r["n_chars"] > 0)


def test_quality_features(docs):
    from cm_well_spark.operators.text import quality_features

    out = quality_features(docs)
    rows = out.collect()
    assert all(0 <= r["quality"] <= 1.0 + 1e-9 for r in rows)
    assert all(0 <= r["stop_ratio"] <= 1 for r in rows)


def test_lang_id(spark):
    from cm_well_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and the dog"),
            (2, "der hund ist nicht die katze und der vogel"),
            (3, "le chat est sur la table et les chiens"),
            (4, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprints_normalization(spark):
    from cm_well_spark.operators.text import fingerprints

    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different text")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in fingerprints(df).collect()}
    assert rows[1]["fp_doc"] == rows[2]["fp_doc"] != rows[3]["fp_doc"]
    assert rows[1]["fp_kgram_min"] == rows[2]["fp_kgram_min"]


def test_winnow_guarantee_and_density(spark):
    """Schleimer et al. §4: any shared substring of length >= k+w-1 must
    yield at least one shared fingerprint, and selection keeps at most
    one fingerprint per window (density <= 1 per gram, ~2/(w+1) expected)."""
    from cm_well_spark.operators.text import winnow_fingerprints

    k, w = 8, 4
    shared = "a common stretch of text both documents quote verbatim here"
    df = spark.createDataFrame(
        [
            (1, "left context junk " + shared + " and a distinct tail xyz"),
            (2, "totally other opening words " + shared + " closing remark"),
            (3, "no overlap with the others at all, different content entirely"),
        ],
        ["doc_id", "text"],
    )
    out = winnow_fingerprints(df, k=k, w=w).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "docs sharing a long substring must share a fp"
    # positions are 1-based and within the gram range
    assert all(1 <= r["pos"] for r in out)
    # density: selected distinct fingerprints never exceed the gram count
    n1 = len(df.where("doc_id = 1").collect()[0]["text"])
    assert len(by_doc[1]) <= n1 - k + 1
    # short doc (fewer than w grams) still emits its minimum
    tiny = spark.createDataFrame([(9, "abcdefghij")], ["doc_id", "text"])
    assert winnow_fingerprints(tiny, k=k, w=w).count() >= 1


# ---- dedup ---------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup of 1
        (4, "completely unrelated text about spark dataframes and shuffles"),
        (5, "another unrelated document mentioning parquet row groups only"),
        (6, "The Quick Brown Fox jumps over the lazy dog AGAIN and again!"),  # norm-dup of 1
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_dup_groups(dup_docs):
    from cm_well_spark.operators.dedup import exact_duplicate_groups

    groups = exact_duplicate_groups(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2, 6]


def test_distinct_documents(dup_docs):
    from cm_well_spark.operators.dedup import distinct_documents

    kept = {r["doc_id"] for r in distinct_documents(dup_docs).collect()}
    assert kept == {1, 3, 4, 5}


def test_jaccard_pairs(dup_docs):
    from cm_well_spark.operators.dedup import jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(dup_docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 6)] == 1.0 and pairs[(2, 6)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_recall_vs_exact(dup_docs):
    from cm_well_spark.operators.dedup import jaccard_pairs, minhash_dedup_pairs

    exact = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(dup_docs, threshold=0.5).collect()}
    mh = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(dup_docs, threshold=0.5).collect()}
    # verified LSH: no false positives by construction; recall on this
    # corpus with 64 hashes / 16 bands should be total
    assert mh <= exact
    assert mh == exact


def test_simhash_near_dups(dup_docs):
    from cm_well_spark.operators.dedup import simhash_pairs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(dup_docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 6)] == 0  # identical normalized text
    assert all(h <= 3 for h in pairs.values())
    assert (1, 4) not in pairs and (4, 5) not in pairs


# ---- similarity ----------------------------------------------------------


def test_brute_force_topk_self(embs):
    from cm_well_spark.operators.similarity import brute_force_topk

    q = embs.orderBy("vec_id").first()
    out = brute_force_topk(embs, [float(x) for x in q["embedding"]], k=5).collect()
    assert out[0]["vec_id"] == q["vec_id"]
    assert abs(out[0]["cosine"] - 1.0) < 1e-5
    scores = [r["cosine"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_lsh_topk_recall(embs):
    from cm_well_spark.operators.similarity import brute_force_topk, lsh_topk

    q = embs.orderBy("vec_id").first()
    qv = [float(x) for x in q["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(embs, qv, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(embs, qv, k=10, n_planes=6).collect()]
    # ANN contract: the query's own vector is found; ≥40% of the exact
    # top-10 retrieved with 6 planes on this corpus
    assert approx[0] == q["vec_id"]
    assert len(set(exact) & set(approx)) >= 4


def test_ivf_topk_recall(embs):
    from cm_well_spark.operators.similarity import brute_force_topk, ivf_topk

    q = embs.orderBy("vec_id").first()
    qv = [float(x) for x in q["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(embs, qv, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(embs, qv, k=10, n_cells=8, n_probe=4).collect()]
    assert approx[0] == q["vec_id"]
    assert len(set(exact) & set(approx)) >= 5


def test_cosine_dup_pairs_lsh_vs_exact(embs):
    from cm_well_spark.operators.similarity import cosine_dup_pairs

    sample = embs.where(F.col("vec_id") < 100)
    exact = {(r["id_a"], r["id_b"]) for r in cosine_dup_pairs(sample, threshold=0.95, exact=True).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in cosine_dup_pairs(sample, threshold=0.95, n_planes=4).collect()}
    assert lsh <= exact  # verify step kills false positives


# ---- multimodal ----------------------------------------------------------


def test_image_decode_plumbing(spark):
    from cm_well_spark.operators.multimodal import decode_images, fake_image

    df = spark.createDataFrame(
        [(1, fake_image(4, 6, 3, 100)), (2, fake_image(2, 2, 1, 200)), (3, b"NOTANIMAGE")],
        ["id", "data"],
    )
    rows = {r["id"]: r for r in decode_images(df).collect()}
    assert (rows[1]["height"], rows[1]["width"], rows[1]["channels"]) == (4, 6, 3)
    assert rows[1]["ok"] and abs(rows[1]["mean_byte"] - 100.0) < 1e-9
    assert rows[3]["ok"] is False


def test_image_resize_roundtrip(spark):
    from cm_well_spark.operators.multimodal import decode_images, fake_image, resize_images

    df = spark.createDataFrame([(1, fake_image(8, 8, 3, 50))], ["id", "data"])
    resized = resize_images(df, 2, 3)
    meta = decode_images(resized).first()
    assert (meta["height"], meta["width"]) == (2, 3) and meta["ok"]


def test_frame_sampling(spark):
    from cm_well_spark.operators.multimodal import fake_image, sample_frames

    video = b"".join(fake_image(2, 2, 1, i) for i in range(25))
    df = spark.createDataFrame([(7, video)], ["id", "data"])
    frames = sample_frames(df, every_n=10).collect()
    assert [r["frame_idx"] for r in frames] == [0, 10, 20]


def test_audio_features(spark):
    from cm_well_spark.operators.multimodal import extract_audio_features, fake_audio

    df = spark.createDataFrame([(1, fake_audio(16000, 32000, 64)), (2, b"junk")], ["id", "data"])
    rows = {r["id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["ok"] and rows[1]["duration_s"] == 2.0 and abs(rows[1]["rms"] - 64.0) < 1e-9
    assert rows[2]["ok"] is False


def test_unknown_codec_is_gated(spark):
    from cm_well_spark.operators.multimodal import decode_images, fake_image

    df = spark.createDataFrame([(1, fake_image(2, 2))], ["id", "data"])
    with pytest.raises(NotImplementedError, match="seam"):
        decode_images(df, codec="webp")


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed in this environment")
def test_pil_decode_and_resize_real_png(spark):
    """Real-codec adapter: a PNG round-trips through decode + resize."""
    import io

    from PIL import Image

    from cm_well_spark.operators.multimodal import decode_images, resize_images

    buf = io.BytesIO()
    Image.new("RGB", (8, 6), color=(10, 20, 30)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, buf.getvalue()), (2, b"junk")], ["id", "data"])
    rows = {r["id"]: r for r in decode_images(df, codec="pil").collect()}
    assert rows[1]["ok"] and (rows[1]["height"], rows[1]["width"], rows[1]["channels"]) == (6, 8, 3)
    assert rows[2]["ok"] is False
    rs = resize_images(df, 3, 4, codec="pil").collect()
    assert len(rs) == 1  # junk row dropped
    meta = decode_images(spark.createDataFrame([(1, rs[0]["data"])], ["id", "data"]), codec="pil").first()
    assert (meta["height"], meta["width"]) == (3, 4)


@pytest.mark.skipif(_has_pil(), reason="covers the missing-Pillow executor error")
def test_pil_codec_missing_library_errors_at_seam(spark):
    from cm_well_spark.operators.multimodal import decode_images, fake_image

    df = spark.createDataFrame([(1, fake_image(2, 2))], ["id", "data"])
    # the seam raises on the executor; Spark surfaces it as a PythonException
    with pytest.raises(Exception, match="Pillow"):
        decode_images(df, codec="pil").collect()


def _has_mod(name: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(name) is not None


def test_wav_audio_features_real_codec(spark):
    """codec='wav' is a REAL decoder (stdlib wave) — exercised everywhere,
    no third-party dependency. A 440-sample int16 square wave at 8 kHz:
    rms of full-scale-half amplitude 0.5 is exactly 0.5."""
    import io
    import wave

    import numpy as np

    from cm_well_spark.operators.multimodal import extract_audio_features

    samples = (np.tile([16384, -16384], 220)).astype("<i2")  # amplitude 0.5
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    df = spark.createDataFrame([(1, buf.getvalue()), (2, b"RIFFjunk")], ["id", "data"])
    rows = {r["id"]: r for r in extract_audio_features(df, codec="wav").collect()}
    assert rows[1]["ok"] and rows[1]["sample_rate"] == 8000 and rows[1]["n_samples"] == 440
    assert abs(rows[1]["duration_s"] - 0.055) < 1e-9
    assert abs(rows[1]["rms"] - 0.5) < 1e-9
    assert rows[2]["ok"] is False


@pytest.mark.skipif(not _has_mod("soundfile"), reason="libsndfile not installed")
def test_soundfile_audio_features_real_codec(spark):
    import io

    import numpy as np
    import soundfile as sf

    from cm_well_spark.operators.multimodal import extract_audio_features

    buf = io.BytesIO()
    sf.write(buf, np.zeros(1600), 16000, format="WAV", subtype="PCM_16")
    df = spark.createDataFrame([(1, buf.getvalue())], ["id", "data"])
    row = extract_audio_features(df, codec="soundfile").first()
    assert row["ok"] and row["sample_rate"] == 16000 and row["n_samples"] == 1600


@pytest.mark.skipif(_has_mod("soundfile"), reason="covers the missing-libsndfile executor error")
def test_soundfile_codec_missing_library_errors_at_seam(spark):
    from cm_well_spark.operators.multimodal import extract_audio_features, fake_audio

    df = spark.createDataFrame([(1, fake_audio(8000, 100))], ["id", "data"])
    with pytest.raises(Exception, match="soundfile"):
        extract_audio_features(df, codec="soundfile").collect()


@pytest.mark.skipif(not _has_mod("av"), reason="PyAV not installed")
def test_av_frame_sampling_real_codec(spark):
    """codec='av': encode a tiny mp4 with PyAV, sample frames back, and
    feed them to decode_images(codec='fake') — the IMG1 re-pack contract."""
    import io

    import av
    import numpy as np

    from cm_well_spark.operators.multimodal import decode_images, sample_frames

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=5)
        stream.width, stream.height, stream.pix_fmt = 16, 16, "yuv420p"
        for i in range(10):
            arr = np.full((16, 16, 3), i * 20, dtype=np.uint8)
            for packet in stream.encode(av.VideoFrame.from_ndarray(arr, format="rgb24")):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    df = spark.createDataFrame([(1, buf.getvalue()), (2, b"junk")], ["id", "data"])
    frames = sample_frames(df, every_n=4, codec="av").collect()
    assert [r["frame_idx"] for r in frames] == [0, 4, 8]  # junk row yields none
    meta = decode_images(
        spark.createDataFrame([(1, frames[0]["frame"])], ["id", "data"]), codec="fake"
    ).first()
    assert meta["ok"] and (meta["height"], meta["width"], meta["channels"]) == (16, 16, 3)


@pytest.mark.skipif(_has_mod("av"), reason="covers the missing-PyAV executor error")
def test_av_codec_missing_library_errors_at_seam(spark):
    from cm_well_spark.operators.multimodal import fake_image, sample_frames

    df = spark.createDataFrame([(1, fake_image(2, 2))], ["id", "data"])
    with pytest.raises(Exception, match="PyAV"):
        sample_frames(df, codec="av").collect()


def test_audio_unknown_codec_is_gated(spark):
    from cm_well_spark.operators.multimodal import extract_audio_features, fake_audio, sample_frames

    df = spark.createDataFrame([(1, fake_audio(8000, 10))], ["id", "data"])
    with pytest.raises(NotImplementedError, match="seam"):
        extract_audio_features(df, codec="mp3")
    with pytest.raises(NotImplementedError, match="seam"):
        sample_frames(df, codec="ffmpeg")


def test_jaccard_skew_guard_matches_exact(docs):
    """max_shingle_freq excludes hot shingles from candidate generation
    only — with a threshold above the corpus hot-spot the pairs and exact
    scores are identical to the unguarded path."""
    from cm_well_spark.operators.dedup import jaccard_pairs

    exact = {(r["id_a"], r["id_b"], r["jaccard"]) for r in jaccard_pairs(docs, threshold=0.5).collect()}
    guarded = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs(docs, threshold=0.5, max_shingle_freq=1000).collect()
    }
    assert exact == guarded and len(exact) > 0


def test_unigram_cross_entropy_orders_quality(spark):
    """Repetitive docs score low bits/token; rare-token docs score high."""
    from cm_well_spark.operators.text import unigram_cross_entropy

    docs = spark.createDataFrame(
        [
            (1, "the the the the the the the the"),
            (2, "the quick brown fox jumps over lazy dogs"),
            (3, "zxqv wblk pqrs mntd qqac"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bits_per_token"] for r in unigram_cross_entropy(docs).collect()}
    assert rows[1] < rows[2] < rows[3]


# ---- curation: clustering / sampling / decontamination / filtering -------


def test_duplicate_clusters_chain(spark):
    # a 4-node chain (0-1, 1-2, 2-3) + isolated 9: propagation needs
    # several rounds (worst case for min-label), all land on cluster 0
    from cm_well_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 9)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster"] for r in duplicate_clusters(nodes, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 9: 9}


def test_duplicate_clusters_two_components(spark):
    from cm_well_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5), (3, 4)], ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster"] for r in duplicate_clusters(nodes, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_stratified_sample_deterministic_and_bounded(docs):
    from cm_well_spark.operators.curation import stratified_sample

    rates = {"en": 0.5, "de": 1.0, "fr": 0.25}
    s1 = stratified_sample(docs, "lang", rates)
    s2 = stratified_sample(docs, "lang", rates)
    # deterministic: identical doc_id sets across runs
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2 and ids1
    by_lang = {r["lang"]: r["count"] for r in s1.groupBy("lang").count().collect()}
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert set(by_lang) <= {"en", "de", "fr"}  # absent strata dropped
    assert by_lang.get("de") == totals["de"]  # rate 1.0 keeps everything
    # Bernoulli at rate r: observed fraction within a loose band
    frac_en = by_lang.get("en", 0) / totals["en"]
    assert 0.25 < frac_en < 0.75


def test_stratified_sample_salt_changes_membership(docs):
    from cm_well_spark.operators.curation import stratified_sample

    a = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.5}, salt="a").collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.5}, salt="b").collect()}
    assert a and b and a != b


def test_contamination_detects_planted_overlap(spark):
    from cm_well_spark.operators.curation import contamination_overlap, decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "a totally unrelated document about spark partitions"),
            (2, "he saw the quick brown fox jumps far away"),
            (3, "nothing in common here at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    hits = {r["doc_id"]: r["n_hits"] for r in contamination_overlap(corpus, bench, k=3).collect()}
    assert 2 in hits and 1 not in hits and 3 not in hits
    clean = {r["doc_id"] for r in decontaminate(corpus, bench, k=3).collect()}
    assert clean == {1, 3}


def test_quality_filter_reasons(spark):
    from cm_well_spark.operators.curation import quality_filter

    df = spark.createDataFrame(
        [
            (1, "tiny"),
            (2, "the cat sat on the mat and it was a good day for everyone involved"),
            (3, "!!!! ???? ;;;; :::: !!!! ???? ;;;; :::: !!!! ????"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["keep"], r["reason"]) for r in quality_filter(df, min_words=3).collect()}
    assert out[1] == (False, "too_short")
    assert out[2] == (True, "ok")
    assert out[3][0] is False and out[3][1] == "low_quality"


def test_repetition_signals_synthetic(spark):
    from cm_well_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # 4 lines, "dup" twice: dup_line_frac = 2/4; chars: dup lines
            # contribute 3*2=6 of 3+3+5+4=15 chars
            (1, "dup\ndup\nalpha\nbeta"),
            # degenerate repetition: "a b" 2-gram everywhere
            (2, "a b a b a b a b"),
            (3, "all words distinct here now"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert abs(got[1]["dup_line_frac"] - 0.5) < 1e-9
    assert abs(got[1]["dup_line_char_frac"] - 6 / 15) < 1e-9
    # doc 2: 2-grams = [a b, b a, a b, b a, a b, b a, a b] -> top 'a b' 4/7
    assert abs(got[2]["top_kgram_frac"] - 4 / 7) < 1e-9
    assert got[2]["dup_kgram_frac"] == 1.0  # all 5-grams repeat
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["dup_kgram_frac"] == 0.0
    # doc 3 has 5 words -> exactly one 5-gram, occurring once
    assert got[3]["top_kgram_frac"] < 0.5


def test_scrub_pii(spark):
    from cm_well_spark.operators.curation import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.co.uk or call +1 555-123-4567 ok"),
            (2, "server 192.168.1.100 and 10.0.0.1 no phone"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "[PII]" in got[1]["text"] and "@" not in got[1]["text"]
    assert "555" not in got[1]["text"]
    assert got[2]["n_ipv4"] == 2 and got[2]["text"].count("[PII]") == 2
    assert got[3]["text"] == "nothing sensitive here"
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_phone"] == 0


def test_lsh_topk_batch_matches_single(embs):
    from cm_well_spark.operators.similarity import lsh_topk, lsh_topk_batch

    qrows = embs.orderBy("vec_id").limit(3).collect()
    queries = embs.sparkSession.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id long, embedding array<double>",
    )
    batch = lsh_topk_batch(embs, queries, k=5, n_planes=6)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    assert set(got) == {r["vec_id"] for r in qrows}
    for r in qrows:
        single = [
            (x["vec_id"], x["cosine"])
            for x in lsh_topk(embs, [float(v) for v in r["embedding"]], k=5, n_planes=6).collect()
        ]
        assert sorted(got[r["vec_id"]], key=lambda t: (-t[1], t[0])) == single
        # self-match comes first
        assert single[0][0] == r["vec_id"]


def test_lsh_topk_batch_fallback_guard(embs, spark):
    from cm_well_spark.operators.similarity import lsh_topk_batch

    # with many planes the query bucket is almost surely sparse -> the
    # fused fallback must still deliver k results per query
    q = embs.orderBy("vec_id").first()
    queries = spark.createDataFrame(
        [(q["vec_id"], [float(x) for x in q["embedding"]])], "query_id long, embedding array<double>"
    )
    out = lsh_topk_batch(embs, queries, k=10, n_planes=16).collect()
    assert len(out) == 10
    assert out[0]["vec_id"] == q["vec_id"] or any(r["vec_id"] == q["vec_id"] for r in out)


def test_chunk_documents_disjoint_and_overlap(spark):
    from cm_well_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b c")], ["doc_id", "text"]
    )
    disjoint = {(r["doc_id"], r["chunk_idx"]): r for r in chunk_documents(docs, size=4).collect()}
    assert disjoint[(1, 0)]["chunk"] == "w0 w1 w2 w3"
    assert disjoint[(1, 2)]["chunk"] == "w8 w9" and disjoint[(1, 2)]["n_words"] == 2
    assert disjoint[(2, 0)]["chunk"] == "a b c"  # short doc = one chunk
    assert len([k for k in disjoint if k[0] == 1]) == 3
    overlap = {(r["doc_id"], r["chunk_idx"]): r["chunk"] for r in chunk_documents(docs, size=4, stride=2).collect()}
    assert overlap[(1, 1)] == "w2 w3 w4 w5"  # stride-2 overlap
    assert len([k for k in overlap if k[0] == 1]) == 4


def test_tfidf_keywords_basics(spark):
    from cm_well_spark.operators.text import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark uniqueone common"),
            (2, "flink flink uniquetwo common"),
            (3, "common only here"),
        ],
        ["doc_id", "text"],
    )
    got = {}
    for r in tfidf_keywords(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append(r["tok"])
    # corpus-unique high-tf terms rank first; 'common' (df=3 -> idf=0) never
    assert got[1][0] == "spark" and "common" not in got[1]
    assert got[2][0] == "flink" and "uniquetwo" in got[2]
    assert all(len(v) <= 2 for v in got.values())


def test_bigram_nll_orders_fluency(spark):
    """Docs made of reference-frequent bigrams score lower (more
    predictable) than shuffled-token docs; unseen bigrams hit the
    backoff, zero-probability ones drop out rather than poisoning the
    average."""
    from cm_well_spark.operators.text import bigram_cross_entropy

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran off") for i in range(10)],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),      # all reference bigrams
            (101, "mat the on sat cat the"),      # same tokens, unseen order
            (102, "zq xv qj wk"),                 # fully out-of-vocab
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["bigram_nll"] for r in bigram_cross_entropy(docs, reference=ref).collect()}
    assert out[100] < out[101]
    assert 102 not in out or out[102] > out[100]  # all-zero-prob doc drops or scores high


def test_duplicated_spans_finds_planted_overlap(spark):
    """A 16-token span shared by two docs is reported at BOTH sites with
    the right positions; unique text reports nothing."""
    from cm_well_spark.operators.dedup import duplicated_spans

    shared = " ".join(f"tok{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (1, "prefix one two " + shared),
            (2, shared + " suffix here"),
            (3, " ".join(f"uniq{i}" for i in range(30))),
        ],
        ["doc_id", "text"],
    )
    out = duplicated_spans(df, k=16, min_docs=2).collect()
    sites = {(r["doc_id"], r["pos"]) for r in out}
    assert (1, 3) in sites and (2, 0) in sites
    assert all(r["doc_id"] != 3 for r in out)


def test_duplicated_spans_freq_cap_drops_boilerplate(spark):
    from cm_well_spark.operators.dedup import duplicated_spans

    boiler = " ".join(f"b{i}" for i in range(16))
    df = spark.createDataFrame([(i, boiler) for i in range(10)], ["doc_id", "text"])
    assert duplicated_spans(df, k=16, min_docs=2).count() == 10
    assert duplicated_spans(df, k=16, min_docs=2, max_span_freq=5).count() == 0


def test_perplexity_buckets_terciles(spark):
    """r7 CCNet bucketing: every doc gets a bucket, buckets are ordered
    by score (max(head) <= min(middle) <= ... up to threshold ties), and
    sizes are near-terciles."""
    from pyspark.sql import functions as F

    from cm_well_spark.operators.text import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, f"token{i % 7} the quick brown fox number {i} jumps " * (1 + i % 3)) for i in range(30)],
        "doc_id long, text string",
    )
    out = perplexity_buckets(docs).collect()
    assert len(out) == 30
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["bigram_nll"])
    assert set(by_bucket) <= {"head", "middle", "tail"}
    if "head" in by_bucket and "middle" in by_bucket:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if "middle" in by_bucket and "tail" in by_bucket:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_ansi_zero_denominator_guards(spark):
    """r7 ANSI-mode hardening: data-dependent denominators that can be 0
    (zero embeddings, empty-foreground sig terms, zero-token sources,
    all-empty corpora) return defined values instead of DIVIDE_BY_ZERO."""
    from pyspark.sql import functions as F

    from cm_well_spark.operators.curation import mixture_weights
    from cm_well_spark.operators.packing import packing_stats
    from cm_well_spark.operators.similarity import cosine

    # cosine with a zero vector -> 0.0
    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 2.0]), (2, [1.0, 0.0], [1.0, 0.0])],
        "id long, a array<double>, b array<double>",
    )
    got = {r["id"]: r["c"] for r in df.select("id", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[1] == 0.0 and abs(got[2] - 1.0) < 1e-12

    # mixture weights: an empty-text doc still counts one whitespace
    # token, so even a degenerate source keeps a positive denominator
    docs = spark.createDataFrame(
        [(1, "", "src0"), (2, "five words of real text", "src1")],
        "doc_id long, text string, source string",
    )
    rates = {r["source"]: r["rate"] for r in mixture_weights(docs, {"src0": 0.5, "src1": 0.5}).collect()}
    assert rates["src0"] == 1.0 and 0 < rates["src1"] <= 1.0

    # packing stats over a ZERO-ROW corpus -> defined row, waste 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = packing_stats(empty, context_len=64).collect()[0]
    assert row["n_docs"] == 0 and row["pad_waste_frac_unpacked"] == 0.0


def test_sig_terms_empty_foreground_is_empty(spark, sf_dir):
    """An agg=sig filter matching nothing returns no buckets (not a 0/0
    crash) on both sig-terms routes."""
    from cm_well_spark.model.lakehouse import load_infotons
    from cm_well_spark.operators.aggregations import aggregate
    from cm_well_spark.operators.search import search

    inf = load_infotons(spark, sf_dir)
    base = search(inf, qp="rdfType::Customer", length=None)
    fg = search(inf, qp="rdfType::Customer,mktsegment::NOSUCHSEGMENT", length=None)
    res = aggregate(fg, "type:sig,field::mktsegment,minDocCount:1", base=base)[0]
    assert res.df.count() == 0


def test_image_dhash_matches_reference_and_flags_garbage(spark):
    """r7 image perceptual hash: the Spark dHash equals an independent
    pure-numpy reimplementation per image, identical images collide
    exactly, and undecodable bytes report ok=False with a null hash
    (kept Int64-exact even when a batch mixes nulls and hashes)."""
    import numpy as np

    from cm_well_spark.operators.multimodal import (
        fake_image_pattern,
        image_dhash,
    )

    def ref_dhash(payload, h, w, c, hs=8):
        gray = payload.reshape(h, w, c).astype(float).mean(axis=2)
        rs = np.array_split(np.arange(h), hs)
        cs = np.array_split(np.arange(w), hs + 1)
        small = np.array([[gray[np.ix_(r, cc)].mean() for cc in cs] for r in rs])
        bits = (small[:, 1:] > small[:, :-1]).flatten()
        v = 0
        for b in bits:
            v = (v << 1) | int(b)
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [(i, fake_image_pattern(12, 10, 3, seed=i)) for i in range(6)]
    rows.append((50, fake_image_pattern(12, 10, 3, seed=2)))  # identical to 2
    rows.append((99, b"garbage-bytes"))
    df = spark.createDataFrame(rows, "id long, data binary")
    got = {r["id"]: (r["dhash"], r["ok"]) for r in image_dhash(df).collect()}
    assert got[99] == (None, False)
    for i in range(6):
        b = fake_image_pattern(12, 10, 3, seed=i)
        payload = np.frombuffer(b, dtype=np.uint8, offset=13)
        assert got[i] == (ref_dhash(payload, 12, 10, 3), True)
    assert got[50][0] == got[2][0]


def test_image_dup_pairs_banded_equals_brute(spark):
    """r7 banded image dedup: the pigeonhole block join returns exactly
    the pairs brute-force Hamming would, at every distance budget the
    blocks guarantee."""
    from cm_well_spark.operators.multimodal import (
        fake_image_pattern,
        image_dhash,
        image_dup_pairs,
    )

    rows = [(i, fake_image_pattern(16, 16, 3, seed=i % 4)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, data binary")
    hashes = image_dhash(df)
    hs = {r["id"]: r["dhash"] for r in hashes.collect()}
    for d in (0, 1, 3):
        got = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in image_dup_pairs(hashes, max_distance=d).collect()
        }
        want = {
            (a, b, bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1"))
            for a in hs
            for b in hs
            if a < b and bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= d
        }
        assert got == want


def test_audio_fingerprint_dedup_and_wav_parity(spark):
    """r7 audio fingerprint: identical waveforms collide, different ones
    separate, garbage flags ok=False — and the SAME samples fingerprint
    identically through the fake and real-WAV codec paths (8-bit PCM wav
    normalizes exactly like AUD1 bytes)."""
    import io
    import wave

    from cm_well_spark.operators.multimodal import (
        audio_fingerprint,
        fake_audio_pattern,
        image_dup_pairs,
    )

    rows = [(i, fake_audio_pattern(8000, 4000, seed=i % 3)) for i in range(9)]
    rows.append((99, b"not-audio"))
    df = spark.createDataFrame(rows, "id long, data binary")
    fp = audio_fingerprint(df)
    got = {r["id"]: (r["dhash"], r["ok"]) for r in fp.collect()}
    assert got[99] == (None, False)
    assert got[0][0] == got[3][0] == got[6][0]          # same seed
    assert len({got[i][0] for i in range(3)}) == 3      # three seeds separate

    pairs = {(r["id_a"], r["id_b"]) for r in image_dup_pairs(fp, max_distance=0).collect()}
    assert (0, 3) in pairs and (1, 4) in pairs and (0, 1) not in pairs

    # wav parity: pack the same byte payload as 8-bit PCM WAV
    payload = fake_audio_pattern(8000, 4000, seed=1)[12:]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(payload)
    wav_df = spark.createDataFrame([(7, buf.getvalue())], "id long, data binary")
    wav_fp = audio_fingerprint(wav_df, codec="wav").collect()[0]
    assert wav_fp["ok"] and wav_fp["dhash"] == got[1][0]


def test_video_dup_pairs_shared_frames(spark):
    """r7 video dedup: videos sharing >= min_shared sampled-frame hashes
    pair up with the exact shared count; disjoint videos never meet."""
    from cm_well_spark.operators.multimodal import fake_image_pattern, video_dup_pairs

    def vid(frame_seeds):
        return b"".join(fake_image_pattern(8, 8, 3, s) for s in frame_seeds)

    rows = [
        (1, vid([1, 2, 3, 4])),
        (2, vid([3, 4, 5, 6])),   # shares two frames with 1
        (3, vid([7, 8, 9, 10])),  # disjoint
        (4, vid([1, 2, 3, 4])),   # identical to 1
    ]
    df = spark.createDataFrame(rows, "id long, data binary")
    out = {(r["id_a"], r["id_b"]): r["n_shared"] for r in video_dup_pairs(df, min_shared=2).collect()}
    assert out == {(1, 2): 2, (1, 4): 4, (2, 4): 2}
    # raising the bar drops the partial overlaps but keeps the full dup
    strict = {(r["id_a"], r["id_b"]) for r in video_dup_pairs(df, min_shared=3).collect()}
    assert strict == {(1, 4)}


def test_script_profile_multilingual(spark):
    from cm_well_spark.operators.text import script_profile

    rows = [
        (1, "hello world"),
        (2, "привет мир"),
        (3, "日本語のテキストです"),          # han+hiragana+katakana mix
        (4, "한국어 텍스트"),
        (5, "نص عربي"),
        (6, "mixed 中文 and english text"),
        (7, "12345 !!!"),                      # no script chars at all
        (8, ""),
        (9, "ab ый"),                          # 2 latin vs 2 cyrillic: tie
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}

    assert got[1]["script"] == "latin" and got[1]["n_latin"] == 10
    assert got[2]["script"] == "cyrillic" and got[2]["n_cyrillic"] == 9
    assert got[3]["n_han"] == 3 and got[3]["n_hiragana"] == 3 and got[3]["n_katakana"] == 4
    assert got[3]["script"] == "katakana"
    assert got[4]["script"] == "hangul" and got[4]["n_hangul"] == 6
    assert got[5]["script"] == "arabic"
    assert got[6]["n_han"] == 2 and got[6]["script"] == "latin"
    assert got[7]["script"] == "und" and got[7]["n_chars"] == 9
    assert got[8]["script"] == "und" and got[8]["n_chars"] == 0
    # tie: cyrillic == latin == 2 -> alphabetically first wins
    assert got[9]["n_latin"] == 2 and got[9]["n_cyrillic"] == 2
    assert got[9]["script"] == "cyrillic"


def test_script_profile_counts_match_python_reference(spark, sf_dir):
    import re as _re

    from cm_well_spark.operators.text import SCRIPT_RANGES, script_profile
    from cm_well_spark.sources import tables as tbl

    docs = tbl.load_table(spark, sf_dir, "documents").where("doc_id < 30")
    got = {r["doc_id"]: r.asDict() for r in script_profile(docs).collect()}
    # python re has no \x{...}: expand the hex escapes to literal chars
    def expand(rng):
        out = ""
        i = 0
        while i < len(rng):
            if rng.startswith("\\x{", i):
                j = rng.index("}", i)
                out += chr(int(rng[i + 3 : j], 16))
                i = j + 1
            else:
                out += rng[i]
                i += 1
        return out

    pats = {s: _re.compile("[" + expand(r) + "]") for s, r in SCRIPT_RANGES.items()}
    for r in docs.select("doc_id", "text").collect():
        for s, pat in pats.items():
            assert got[r["doc_id"]][f"n_{s}"] == len(pat.findall(r["text"])), (r["doc_id"], s)


def test_hard_negatives_exact_and_pruned(spark, sf_dir):
    from cm_well_spark.operators.similarity import hard_negatives
    from cm_well_spark.sources import tables as tbl

    embs = tbl.load_table(spark, sf_dir, "embeddings").cache()
    anchors = embs.where("vec_id < 10")
    exact = hard_negatives(embs, anchors, k=3).collect()
    labels = {r["vec_id"]: r["label"] for r in embs.select("vec_id", "label").collect()}

    # contract: 3 per anchor, ranks 1..3, negatives never share the anchor label
    by_anchor = {}
    for r in exact:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
        assert labels[r["neg_id"]] != labels[r["anchor_id"]]
    for rows in by_anchor.values():
        assert sorted(x["rank"] for x in rows) == [1, 2, 3]
        sims = [x["cosine"] for x in sorted(rows, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True)

    # IVF-pruned path: valid output, recall vs exact pinned
    pruned = hard_negatives(embs, anchors, k=3, prune_cells=8, n_probe=4).collect()
    exact_set = {(r["anchor_id"], r["neg_id"]) for r in exact}
    pruned_set = {(r["anchor_id"], r["neg_id"]) for r in pruned}
    for a_id, n_id in pruned_set:
        assert labels[n_id] != labels[a_id]
    recall = len(exact_set & pruned_set) / len(exact_set)
    assert recall >= 0.4, recall  # 4 of 8 cells probed


def test_corpus_overlap_sketch_exact_when_small(spark):
    from cm_well_spark.operators.dedup import corpus_overlap_sketch

    # corpora small enough that bottom-256 holds EVERY shingle hash:
    # the estimator degenerates to the exact corpus Jaccard
    a_txt = "the quick brown fox jumps over the lazy dog again and again"
    b_txt = "the quick brown fox sleeps under the lazy dog again and again"
    A = spark.createDataFrame([(1, a_txt)], ["doc_id", "text"])
    B = spark.createDataFrame([(2, b_txt)], ["doc_id", "text"])

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 3, 0) + 1)}

    sa, sb = shingles(a_txt), shingles(b_txt)
    want = len(sa & sb) / len(sa | sb)
    row = corpus_overlap_sketch(A, B, k_sketch=256).first()
    assert row["n_union"] == len(sa | sb)
    assert row["n_shared"] == len(sa & sb)
    assert abs(row["jaccard_est"] - want) < 1e-6


def test_corpus_overlap_sketch_bounds(spark, sf_dir):
    from cm_well_spark.operators.dedup import corpus_overlap_sketch
    from cm_well_spark.sources import tables as tbl
    from pyspark.sql import functions as F

    docs = tbl.load_table(spark, sf_dir, "documents")
    row = corpus_overlap_sketch(
        docs.where(F.col("doc_id") % 2 == 0), docs.where(F.col("doc_id") % 2 == 1), k_sketch=64
    ).first()
    assert 0 <= row["n_shared"] <= row["n_union"] <= 64
    assert 0.0 <= row["jaccard_est"] <= 1.0
    # identical corpora -> estimate exactly 1
    same = corpus_overlap_sketch(docs.limit(50), docs.limit(50), k_sketch=64).first()
    assert same["jaccard_est"] == 1.0


def test_remove_duplicated_spans_cuts_and_restitches(spark):
    from cm_well_spark.operators.dedup import remove_duplicated_spans

    shared = " ".join(f"s{i}" for i in range(6))  # 6-token span shared by docs 1,2
    rows = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"delta {shared} epsilon zeta"),
        (3, "totally unrelated words here only once"),
        (4, shared),  # fully covered -> emptied, still present
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in remove_duplicated_spans(df, k=6, min_docs=2).collect()}

    # pure-Python twin of the cut
    def cut(words, k=6):
        grams = {}
        for did, t in rows:
            w = t.split()
            for p in range(max(len(w) - k, 0) + 1):
                grams.setdefault(" ".join(w[p : p + k]), set()).add(did)
        recurring = {g for g, ds in grams.items() if len(ds) >= 2}
        starts = [
            p
            for p in range(max(len(words) - k, 0) + 1)
            if " ".join(words[p : p + k]) in recurring
        ]
        return " ".join(
            w for i, w in enumerate(words) if not any(s <= i < s + k for s in starts)
        )

    for did, t in rows:
        assert out[did] == cut(t.split()), did
    assert out[4] == ""  # emptied doc still reported
    assert out[3] == rows[2][1]  # untouched doc passes through verbatim


def test_heavy_hitters_exact_on_skew(spark):
    """Zipf-ish stream: the sketch's answer must EQUAL the brute-force
    groupBy answer (exactness claim), and the candidate set must be a
    small subset of the distinct keys (bounded-memory claim)."""
    from cm_well_spark.operators.sketches import heavy_hitters

    rows = []
    for i in range(40):  # 40 hot keys, ~docs each
        rows += [(f"hot{i}",)] * (200 - i)
    rows += [(f"cold{j}",) for j in range(5000)]  # long unique tail
    items = spark.createDataFrame(rows, ["token"]).repartition(8)

    phi = 0.005  # threshold ~ 0.005 * 12620 = 64
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(items, phi=phi).collect()}
    import math

    n = len(rows)
    thr = max(1, math.ceil(phi * n))
    from collections import Counter

    truth = {(k, c) for k, c in Counter(t for (t,) in rows).items() if c >= thr}
    assert got == truth
    assert len(truth) == 40  # all hot keys, no cold tail


def test_heavy_hitters_boundary_and_validation(spark):
    from cm_well_spark.operators.sketches import heavy_hitters

    with pytest.raises(ValueError):
        heavy_hitters(spark.createDataFrame([("a",)], ["token"]), phi=0.0)
    # phi=1: only a key that IS the whole stream qualifies
    items = spark.createDataFrame([("a",), ("a",), ("b",)], ["token"])
    assert heavy_hitters(items, phi=1.0).count() == 0
    solo = spark.createDataFrame([("a",), ("a",)], ["token"])
    assert [tuple(r) for r in heavy_hitters(solo, phi=1.0).collect()] == [("a", 2)]


def test_snapshot_diff_statuses(spark):
    from cm_well_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")], ["doc_id", "text"]
    )
    got = {(r["doc_id"], r["status"]) for r in snapshot_diff(old, new).collect()}
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_unicode_normalize_forms(spark):
    import unicodedata

    from cm_well_spark.operators.text import unicode_normalize

    rows = [
        (1, "éclair", "x"),   # decomposed accent
        (2, "ｆullwidth", "y"),  # fullwidth letter (NFKC folds)
        (3, "ﬁle", "z"),        # ligature fi (NFKC folds)
        (4, None, "w"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tag"])
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {r["doc_id"]: (r["text"], r["tag"]) for r in unicode_normalize(df, form).collect()}
        for did, t, tag in rows:
            want = None if t is None else unicodedata.normalize(form, t)
            assert got[did] == (want, tag), (form, did)
    with pytest.raises(ValueError):
        unicode_normalize(df, form="NFX")


def test_pack_bins_ffd_parity_capacity_determinism(spark, sf_dir):
    from cm_well_spark.operators.packing import pack_bins_ffd
    from cm_well_spark.sources import tables as tbl

    docs = tbl.load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    out = pack_bins_ffd(docs, context_len=64, n_buckets=4).collect()

    # capacity invariant per (bucket, bin)
    fills = {}
    for r in out:
        if r["bin_id"] >= 0:
            fills[(r["bucket"], r["bin_id"])] = fills.get((r["bucket"], r["bin_id"]), 0) + r["n_tok"]
    assert fills and all(v <= 64 for v in fills.values())

    # parity with a pure-Python FFD over the same salted buckets
    import hashlib

    rows = [(r["doc_id"], len(r["text"].strip().split())) for r in docs.select("doc_id", "text").collect()]

    def rk(i):
        return hashlib.md5(f"ffd:{i}".encode()).hexdigest()

    def model():
        got = {}
        buckets = {}
        for i, n in rows:
            if n > 64:
                got[i] = (-1, -1)
                continue
            buckets.setdefault(int(rk(i)[:8], 16) % 4, []).append((i, n))
        for b, items in buckets.items():
            items.sort(key=lambda t: (-t[1], rk(t[0])))
            fills = []
            for i, n in items:
                for j, f in enumerate(fills):
                    if f + n <= 64:
                        fills[j] = f + n
                        got[i] = (b, j)
                        break
                else:
                    fills.append(n)
                    got[i] = (b, len(fills) - 1)
        return got

    want = model()
    got = {r["doc_id"]: (r["bucket"], r["bin_id"]) for r in out}
    assert got == want

    # determinism across re-runs
    again = {r["doc_id"]: (r["bucket"], r["bin_id"]) for r in pack_bins_ffd(docs, 64, 4).collect()}
    assert again == got

    # efficiency: FFD bins should not exceed 2x the fractional lower bound
    total_tok = sum(n for _, n in rows if n <= 64)
    n_bins = len(fills)
    import math

    assert n_bins <= 2 * math.ceil(total_tok / 64) + 4


def test_mmr_select_diversifies(spark):
    import numpy as np

    from cm_well_spark.operators.similarity import mmr_select

    rng = np.random.default_rng(7)
    # three tight clusters; cluster 0 closest to the query
    centers = np.array([[1.0, 0.0, 0.0], [0.7, 0.7, 0.0], [0.0, 0.0, 1.0]])
    rows = []
    for i in range(30):
        c = centers[i % 3] + rng.normal(0, 0.01, 3)
        rows.append((i, [float(x) for x in c]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = [1.0, 0.0, 0.0]

    got = mmr_select(df, q, k=4, lam=0.5, fetch=30).collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4]

    # numpy twin of the greedy chain
    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    vecs = {i: np.array(v) for i, v in rows}
    rel = {i: cos(v, np.array(q)) for i, v in vecs.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:30]
    sel = []
    for _ in range(4):
        if not sel:
            pick = max(cand, key=lambda i: (rel[i], -i))
        else:
            pick = max(
                (i for i in cand if i not in sel),
                key=lambda i: (0.5 * rel[i] - 0.5 * max(cos(vecs[i], vecs[s]) for s in sel), -i),
            )
        sel.append(pick)
    assert [r["vec_id"] for r in got] == sel
    # pure relevance would pick 4 cluster-0 near-copies; MMR must not
    assert len({r["vec_id"] % 3 for r in got}) >= 2
    with pytest.raises(ValueError):
        mmr_select(df, q, k=5, fetch=3)


def test_weighted_sample_bias_and_determinism(spark):
    from cm_well_spark.operators.curation import weighted_sample

    rows = [(i, 1.0 if i < 500 else 10.0) for i in range(1000)] + [(1000, 0.0), (1001, -3.0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_sample(df, "w", k=200).collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == 200 and 1000 not in ids and 1001 not in ids
    heavy = sum(1 for i in ids if 500 <= i < 1000) / 200
    assert heavy > 0.75  # expected ~10/11, binomial noise leaves huge margin
    again = [r["doc_id"] for r in weighted_sample(df, "w", k=200).collect()]
    assert again == ids


def test_triangle_count_edges_known_graph(spark):
    from cm_well_spark.operators.graph import triangle_count_edges

    # K4 has 4 triangles; plus a pendant edge and a duplicate/reversed
    # edge that must not change the count
    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1 :]]
    edges += [("d", "e"), ("b", "a"), ("a", "b")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_count_edges(df).first()["n_triangles"] == 4

    # triangle-free bipartite graph
    bip = spark.createDataFrame(
        [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)], ["src", "dst"]
    )
    assert triangle_count_edges(bip).first()["n_triangles"] == 0


def test_label_propagation_two_cliques(spark):
    from cm_well_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge: LPA must keep them as two
    # communities (each converges to its own max label)
    import itertools

    a = [f"/a{i}" for i in range(4)]
    b = [f"/b{i}" for i in range(4)]
    edges = list(itertools.combinations(a, 2)) + list(itertools.combinations(b, 2))
    edges.append((a[0], b[0]))
    rows = [(s, "link", o, "s", True) for s, o in edges]
    tri = spark.createDataFrame(rows, ["s", "p", "o", "vtype", "current"])
    got = {r["node"]: r["label"] for r in label_propagation(tri, ["link"], iterations=4).collect()}

    # pure-Python twin of the synchronous deterministic evolution
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for s_, o_ in edges:
        adj[s_].add(o_)
        adj[o_].add(s_)
    labels = {n: n for n in adj}
    for _ in range(4):
        nxt = {}
        for n in adj:
            c = Counter(labels[m] for m in adj[n])
            top = max(c.values())
            nxt[n] = max(l for l, v in c.items() if v == top)
        labels = nxt
    assert got == labels
    # the inner clique members (no bridge) agree on a community label
    assert len({got[n] for n in b[1:]}) == 1
    with pytest.raises(ValueError):
        label_propagation(tri, ["link"], iterations=0)


def test_build_postings_positions_and_df(spark):
    from cm_well_spark.operators.indexing import build_postings

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog")], ["doc_id", "text"]
    )
    rows = {(r["term"], r["doc"]): (r["tf"], r["positions"], r["df"]) for r in build_postings(df).collect()}
    assert rows[("the", 1)] == (2, "0,4", 2)
    assert rows[("the", 2)] == (1, "0", 2)
    assert rows[("cat", 1)] == (1, "1", 1)
    assert rows[("mat", 1)] == (1, "5", 1)
    # every doc position appears exactly once across its postings
    total_positions = sum(len(v[1].split(",")) for (t, d), v in rows.items() if d == 1)
    assert total_positions == 6


def test_score_quantiles_exact(spark):
    import numpy as np

    from cm_well_spark.operators.curation import score_quantiles

    vals = {"a": [1, 3, 4, 7, 11, 13, 29], "b": [2, 2, 2, 10]}
    rows = [(g, float(v)) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "s"])
    got = {(r["g"], r["p"]): r["q"] for r in score_quantiles(df, F.col("s"), by="g").collect()}
    for g, vs in vals.items():
        for p in (0.1, 0.25, 0.5, 0.75, 0.9):
            assert abs(got[(g, p)] - round(float(np.quantile(vs, p)), 6)) < 1e-9, (g, p)


def test_heavy_hitters_sub_support_fallback(spark):
    """phi below freqItems' 1e-4 floor exercises the Arrow-batch
    Misra-Gries fallback; the answer must still be exact."""
    from collections import Counter
    import math

    from cm_well_spark.operators.sketches import heavy_hitters

    rows = [(f"hot{i}",) for i in range(100) for _ in range(150)]
    rows += [(f"cold{j}",) for j in range(5000)]
    items = spark.createDataFrame(rows, ["token"]).repartition(6)
    phi = 8e-5  # threshold = ceil(8e-5 * 20000) = 2
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(items, phi=phi).collect()}
    thr = max(1, math.ceil(phi * len(rows)))
    truth = {(k, c) for k, c in Counter(t for (t,) in rows).items() if c >= thr}
    assert got == truth and len(truth) == 100


def test_char_entropy_known_values(spark):
    import math

    from cm_well_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["n_chars"], r["char_entropy"]) for r in char_entropy(df).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (4, 1.0)
    assert abs(got[3][1] - 2.0) < 1e-9
    # normalization folds case/punct: "A.a" -> "a a" (3 chars incl. space)
    one = {r["doc_id"]: r for r in char_entropy(
        spark.createDataFrame([(9, "A.a")], ["doc_id", "text"])
    ).collect()}
    assert one[9]["n_chars"] == 3
    assert abs(one[9]["char_entropy"] - (math.log2(3) - (2 / 3))) < 1e-6


def test_memorization_risk_fractions(spark):
    from cm_well_spark.operators.text import memorization_risk

    shared = " ".join(f"s{i}" for i in range(4))
    df = spark.createDataFrame(
        [
            (1, f"{shared} unique tail one two"),
            (2, f"prefix {shared} other tail"),
            (3, "no duplicated content here at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in memorization_risk(df, k=4, min_docs=2).collect()}
    assert got[3]["n_dup_grams"] == 0 and got[3]["dup_frac"] == 0.0
    assert got[1]["n_dup_grams"] >= 1 and 0 < got[1]["dup_frac"] <= 1
    assert got[1]["n_grams"] == 8 - 4 + 1  # 8 words, k=4
    # python twin for doc 1: grams shared with doc 2
    w1 = f"{shared} unique tail one two".split()
    w2 = f"prefix {shared} other tail".split()
    g1 = [" ".join(w1[i : i + 4]) for i in range(len(w1) - 3)]
    g2 = {" ".join(w2[i : i + 4]) for i in range(len(w2) - 3)}
    assert got[1]["n_dup_grams"] == sum(1 for g in g1 if g in g2)


def test_compression_ratio_pins(spark):
    import zlib

    from cm_well_spark.operators.text import compression_ratio

    rep = "spam " * 200
    import random

    rng = random.Random(3)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(1000))
    df = spark.createDataFrame([(1, rep), (2, noise), (3, "")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for did, t in [(1, rep), (2, noise)]:
        b = t.encode()
        assert got[did]["raw_len"] == len(b)
        assert got[did]["zip_len"] == len(zlib.compress(b, 6))
        assert abs(got[did]["ratio"] - round(len(zlib.compress(b, 6)) / len(b), 6)) < 1e-9
    assert got[1]["ratio"] < 0.1 < got[2]["ratio"]  # repetitive << random
    assert got[3]["ratio"] is None and got[3]["raw_len"] == 0


def test_corpus_datacard_python_twin(spark, sf_dir):
    from collections import Counter

    from cm_well_spark.operators.curation import corpus_datacard
    from cm_well_spark.sources import tables as tbl
    import re
    import statistics

    docs = tbl.load_table(spark, sf_dir, "documents")
    row = corpus_datacard(docs).first()
    rows = docs.select("doc_id", "text", "lang").collect()
    toks = [len(r["text"].strip().split()) for r in rows]
    langs = Counter(r["lang"] for r in rows)
    norm = [re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).strip() for r in rows]
    dup = Counter(norm)
    n_dup = sum(c for c in dup.values() if c > 1)
    assert row["n_docs"] == len(rows)
    assert row["n_tokens"] == sum(toks)
    assert abs(row["avg_tokens"] - round(sum(toks) / len(toks), 6)) < 1e-9
    assert row["p50_tokens"] == statistics.median(toks)
    assert row["n_langs"] == len(langs)
    top_c = max(langs.values())
    assert row["top_lang"] == max(l for l, c in langs.items() if c == top_c)
    assert abs(row["top_lang_frac"] - round(top_c / len(rows), 6)) < 1e-9
    assert abs(row["exact_dup_rate"] - round(n_dup / len(rows), 6)) < 1e-9


def test_binary_quantization_and_hamming(spark):
    import numpy as np

    from cm_well_spark.operators.similarity import binary_hamming_topk, quantize_binary

    rng = np.random.default_rng(11)
    vecs = {i: rng.normal(0, 1, 40).tolist() for i in range(30)}  # dim 40: ragged last word
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    codes = {r["vec_id"]: list(r["code"]) for r in quantize_binary(df).collect()}

    def pack(v):
        words = []
        for j in range(0, 40, 32):
            acc = 0
            for x in v[j : j + 32]:
                acc = acc * 2 + (1 if x > 0 else 0)
            words.append(acc)
        return words

    for i, v in vecs.items():
        assert codes[i] == pack(v), i

    q = codes[0]
    got = [(r["vec_id"], r["hamming"]) for r in binary_hamming_topk(df.sparkSession.createDataFrame(
        [(i, c) for i, c in codes.items()], ["vec_id", "code"]
    ), q, k=5).collect()]

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    want = sorted(((i, ham(c, q)) for i, c in codes.items()), key=lambda t: (t[1], t[0]))[:5]
    assert got == want
    assert got[0] == (0, 0)  # query matches itself exactly
    # hamming approximates angular order: the true nearest-by-cosine
    # neighbor should appear well inside the binary top half
    import math

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    true_nn = max((i for i in vecs if i != 0), key=lambda i: cos(vecs[i], vecs[0]))
    full = sorted(((i, ham(c, q)) for i, c in codes.items() if i != 0), key=lambda t: (t[1], t[0]))
    rank = [i for i, _ in full].index(true_nn)
    assert rank < len(full) // 2


def test_blocklist_filter_modes(spark):
    from cm_well_spark.operators.curation import blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "a perfectly CLEAN document"),
            (2, "contains badword right here"),
            (3, "superbadwordish is only a substring"),
            (4, "badword and also evil twice badword"),
        ],
        ["doc_id", "text"],
    )
    word = {r["doc_id"]: r for r in blocklist_filter(df, ["badword", "evil"], "word").collect()}
    assert word[1]["keep"] and word[1]["n_matched"] == 0 and word[1]["first_match"] is None
    assert not word[2]["keep"] and word[2]["first_match"] == "badword"
    assert word[3]["keep"]  # substring inside a longer word: word mode ignores
    assert word[4]["n_matched"] == 2 and word[4]["first_match"] == "badword"

    sub = {r["doc_id"]: r for r in blocklist_filter(df, ["badword"], "substring").collect()}
    assert not sub[3]["keep"]  # substring mode catches it
    with pytest.raises(ValueError):
        blocklist_filter(df, ["x"], mode="regex")


def test_trigram_backoff_levels(spark):
    import math

    from cm_well_spark.operators.text import trigram_cross_entropy

    ref = spark.createDataFrame(
        [(0, "a b c a b d"), (1, "a b c x y z")], ["doc_id", "text"]
    )
    # doc 10: "a b c" seen trigram; doc 11 forces bigram backoff (b d seen,
    # "c b d" trigram unseen); doc 12 forces unigram floor (q unseen pair)
    corp = spark.createDataFrame(
        [(10, "a b c"), (11, "c b d"), (12, "z z q")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["trigram_nll"] for r in trigram_cross_entropy(corp, ref).collect()}

    # reference counts: tri(a b c)=2? no: texts give trigrams
    # doc0: abc, bca, cab, abd ; doc1: abc, bcx, cxy, xyz
    # tri(a,b,c)=2 ; bi(a,b)=3 (doc0 twice? a b appears pos1 and pos4 -> 2; doc1 once -> 3)
    assert abs(got[10] - round(-math.log2(2 / 3), 6)) < 1e-6
    # doc11 "c b d": tri(c,b,d) unseen; backoff 0.4 * n(b d)/n(b):
    # bi(b,d)=1, uni b=3 -> 0.4*1/3
    assert abs(got[11] - round(-math.log2(0.4 * 1 / 3), 6)) < 1e-6
    # doc12 "z z q": tri unseen, bi(z,q) unseen -> floor 0.16*n(q)/total
    # with q UNSEEN -> p=0 -> -log2(0) null-filtered -> the doc's only
    # trigram drops and the doc disappears (the op's documented contract)
    assert 12 not in got


def test_binary_rerank_recall_vs_bruteforce(spark, sf_dir):
    from cm_well_spark.operators.similarity import binary_rerank_topk, brute_force_topk
    from cm_well_spark.sources import tables as tbl

    embs = tbl.load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in embs.orderBy("vec_id").first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(embs, q, k=10).collect()}
    two_stage = {r["vec_id"] for r in binary_rerank_topk(embs, q, k=10, shortlist=100).collect()}
    # 100-wide Hamming shortlist over 64-bit sign codes recovers most of
    # the true top-10; the floor pins the approximation from regressing
    assert len(exact & two_stage) / len(exact) >= 0.6
    # with shortlist = corpus size, the two-stage result IS brute force
    n = embs.count()
    full = {r["vec_id"] for r in binary_rerank_topk(embs, q, k=10, shortlist=n).collect()}
    assert full == exact


def test_expectations_report_semantics(spark):
    from cm_well_spark.operators.curation import expectations_report

    df = spark.createDataFrame(
        [(1, "ok", 2), (2, None, 0), (3, "", 0), (1, "dup id", 6)],
        ["doc_id", "text", "n_chars"],
    )
    rep = {r["rule"]: r for r in expectations_report(
        df,
        {
            "text_not_null": F.col("text").isNotNull(),
            "len_ok": F.length("text") == F.col("n_chars"),
        },
        unique_cols=("doc_id",),
    ).collect()}
    assert rep["text_not_null"]["n_violations"] == 1
    # null text -> null predicate -> violation; "" has len 0 == 0 passes
    assert rep["len_ok"]["n_violations"] == 1
    assert rep["doc_id_unique"]["n_violations"] == 1
    assert all(r["n_checked"] == 4 for r in rep.values())
    assert abs(rep["doc_id_unique"]["pass_rate"] - 0.75) < 1e-9


def test_corpus_kl_divergence_properties(spark):
    import math

    from cm_well_spark.operators.text import corpus_kl_divergence

    A = spark.createDataFrame([(1, "x x x y"), (2, "x y z")], ["doc_id", "text"])
    B = spark.createDataFrame([(3, "p p q x")], ["doc_id", "text"])
    row = corpus_kl_divergence(A, B).first()

    # python twin
    from collections import Counter

    ca = Counter("x x x y x y z".split())
    cb = Counter("p p q x".split())
    vocab = set(ca) | set(cb)
    v, na, nb, s = len(vocab), sum(ca.values()), sum(cb.values()), 0.5
    kl = sum(
        ((ca[w] + s) / (na + s * v)) * math.log2(((ca[w] + s) / (na + s * v)) / ((cb[w] + s) / (nb + s * v)))
        for w in vocab
    )
    assert row["vocab_size"] == v and row["n_a"] == na and row["n_b"] == nb
    assert abs(row["kl_bits"] - round(kl, 6)) < 1e-9
    # KL(A||A) == 0
    self_row = corpus_kl_divergence(A, A).first()
    assert abs(self_row["kl_bits"]) < 1e-9
    # disjoint corpora diverge more than overlapping ones
    C = spark.createDataFrame([(4, "totally different words entirely")], ["doc_id", "text"])
    far = corpus_kl_divergence(A, C).first()["kl_bits"]
    assert far > row["kl_bits"] > 0


def test_fim_transform_reconstruction(spark):
    from cm_well_spark.operators.packing import fim_transform

    rows = [(i, f"doc number {i} with some reasonable content here") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in fim_transform(df, fim_rate=0.6).collect()}
    originals = dict(rows)
    n_applied = 0
    for did, r in out.items():
        if not r["fim_applied"]:
            assert r["text"] == originals[did]
            continue
        n_applied += 1
        t = r["text"]
        assert t.startswith("<PRE>")
        pre, rest = t[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        # PSM reorder is lossless: pre + mid + suf == original
        assert pre + mid + suf == originals[did], did
        assert len(pre) >= 1 and len(suf) >= 1  # cuts strictly inside
    # gate rate lands near fim_rate
    assert 0.4 < n_applied / len(rows) < 0.8
    # deterministic across calls
    again = {r["doc_id"]: r["text"] for r in fim_transform(df, fim_rate=0.6).collect()}
    assert again == {k: v["text"] for k, v in out.items()}
    with pytest.raises(ValueError):
        fim_transform(df, fim_rate=1.5)


def test_span_corruption_invariants(spark):
    import re

    from cm_well_spark.operators.packing import span_corruption

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(50))) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_corruption(df, rate=0.3, span_len=3, stride=8).collect()}
    originals = dict(rows)
    masked_frac_total, n_tok_total = 0, 0
    for did, r in out.items():
        inp, tgt = r["inputs"], r["targets"]
        sents_in = re.findall(r"<extra_id_(\d+)>", inp)
        sents_tgt = re.findall(r"<extra_id_(\d+)>", tgt)
        # sentinels number 0..k-1 in order; target closes with one extra
        assert sents_in == [str(i) for i in range(len(sents_in))]
        assert sents_tgt == [str(i) for i in range(len(sents_in) + 1)]
        # reconstruction: splice target spans back into input == original
        spans = {}
        parts = re.split(r"<extra_id_(\d+)>", tgt)
        for k, chunk in zip(parts[1::2], parts[2::2]):
            spans[int(k)] = chunk.strip()
        rebuilt = re.sub(r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], inp)
        assert rebuilt.split() == originals[did].split(), did
        masked = sum(len(v.split()) for k, v in spans.items() if k < len(sents_in))
        masked_frac_total += masked
        n_tok_total += 50
    # masked fraction lands near the requested rate
    assert 0.15 < masked_frac_total / n_tok_total < 0.45
    with pytest.raises(ValueError):
        span_corruption(df, span_len=8, stride=8)


def test_ul2_mixture_branches(spark):
    import re

    from cm_well_spark.operators.packing import ul2_mixture

    rows = [(i, " ".join(f"u{i}_{j}" for j in range(40))) for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ul2_mixture(df).collect()}
    assert set(out) == set(dict(rows))  # every doc gets exactly one example
    byd = {}
    for r in out.values():
        byd.setdefault(r["denoiser"], []).append(r)
    assert set(byd) == {"R", "X", "S"}
    for d, rs in byd.items():
        assert len(rs) > 15, (d, len(rs))  # thirds-ish split
    # S: prefix-LM reconstruction
    for r in byd["S"]:
        pre = r["inputs"].replace(" <extra_id_0>", "")
        suf = r["targets"].replace("<extra_id_0> ", "").replace(" <extra_id_1>", "")
        assert (pre + " " + suf).split() == dict(rows)[r["doc_id"]].split()
    # X masks ~half the tokens, R ~15%
    def masked_frac(r):
        spans = re.split(r"<extra_id_\d+>", r["targets"])
        masked = sum(len(c.split()) for c in spans)
        return masked / 40

    xf = sum(masked_frac(r) for r in byd["X"]) / len(byd["X"])
    rf = sum(masked_frac(r) for r in byd["R"]) / len(byd["R"])
    assert xf > 0.4 and rf < 0.3 and xf > rf


def test_cross_entropy_survives_empty_normalized_docs(spark):
    """r9 ADVICE regression: a punctuation/emoji-only doc normalizes to
    zero tokens; the bigram slices must not go negative-length (Spark
    throws INVALID_PARAMETER_VALUE.LENGTH). The empty doc just drops
    out of the scored output; other docs score normally."""
    from cm_well_spark.operators.text import bigram_cross_entropy, trigram_cross_entropy

    rows = [
        (1, "the cat sat on the mat and the cat sat again"),
        (2, "!!! ... ??? !!!"),  # normalizes to zero tokens
        (3, "the dog sat on the mat"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for fn, col in [(bigram_cross_entropy, "bigram_nll"), (trigram_cross_entropy, "trigram_nll")]:
        out = {r["doc_id"]: r[col] for r in fn(df).collect()}
        assert 2 not in out and 4 not in out
        assert 1 in out and out[1] is not None


def test_heavy_hitters_phi_at_freqitems_floor(spark):
    """r9 ADVICE regression: phi in [1e-4, 2e-4) used to route to
    stat.freqItems with support=phi/2 < 1e-4 -> IllegalArgumentException.
    Must now take the Arrow fallback and still be exact."""
    from collections import Counter

    from cm_well_spark.operators.sketches import heavy_hitters

    rows = [("hot",)] * 50 + [(f"c{j}",) for j in range(300)]
    items = spark.createDataFrame(rows, ["token"]).repartition(4)
    phi = 1e-4  # threshold = ceil(1e-4 * 350) = 1 -> everything qualifies
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(items, phi=phi).collect()}
    truth = {(k, c) for k, c in Counter(t for (t,) in rows).items()}
    assert got == truth
    # 1.5e-4 sits strictly inside the previously-broken band
    got2 = {(r["token"], r["cnt"]) for r in heavy_hitters(items, phi=1.5e-4).collect()}
    assert got2 == truth


def test_memorization_risk_short_docs(spark):
    """r9 ADVICE regression: docs with fewer than k words report
    n_grams = 0 (not 1) and dup_frac = 0.0, never a div-by-zero."""
    from cm_well_spark.operators.text import memorization_risk

    long_a = " ".join(f"w{i}" for i in range(20))
    rows = [(1, long_a), (2, long_a), (3, "too short to gram"), (4, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in memorization_risk(df, k=16, min_docs=2).collect()}
    assert out[1]["n_grams"] == 5 and out[1]["n_dup_grams"] == 5 and out[1]["dup_frac"] == 1.0
    for short_id in (3, 4):
        assert out[short_id]["n_grams"] == 0
        assert out[short_id]["dup_frac"] == 0.0


def test_mmr_select_string_ids(spark):
    """r9 ADVICE regression: mmr_select must honor the id column's real
    type instead of hardcoding long."""
    from cm_well_spark.operators.similarity import mmr_select

    rows = [
        ("doc-a", [1.0, 0.0]),
        ("doc-b", [0.9, 0.1]),
        ("doc-c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "embedding"])
    got = mmr_select(df, [1.0, 0.0], k=2, lam=0.5, fetch=3, id_col="doc_id", vec_col="embedding").collect()
    assert [r["rank"] for r in got] == [1, 2]
    assert got[0]["doc_id"] == "doc-a"
    assert isinstance(got[1]["doc_id"], str)


def test_span_corruption_long_doc_linear(spark):
    """r9 (VERDICT r8 item 2): the coverage test is grid arithmetic, not
    an exists() per token — a 60k-token unchunked doc must build in
    seconds (the old per-token form was ~10^9 lambda evals), and the
    example must reconstruct: dropping sentinels from inputs and
    splicing targets' spans back at their grid positions yields the
    original token stream."""
    import re
    import time

    from cm_well_spark.operators.packing import span_corruption

    n_tok = 60_000
    text = " ".join(f"t{i}" for i in range(n_tok))
    df = spark.createDataFrame([(1, text), (2, "short doc here")], ["doc_id", "text"])
    t0 = time.time()
    out = {r["doc_id"]: r for r in span_corruption(df, rate=0.15, span_len=3, stride=8).collect()}
    wall = time.time() - t0
    assert wall < 30, f"long-doc span corruption took {wall:.1f}s"

    r = out[1]
    spans = re.findall(r"<extra_id_(\d+)> ((?:t\d+ ?)*)", r["targets"])
    # sentinel ids are 0..k in order, closed by a final bare sentinel
    ids = [int(i) for i, _ in spans]
    assert ids == list(range(len(ids)))
    # splice masked spans back into inputs -> original stream
    toks = []
    by_id = {int(i): c.split() for i, c in spans}
    for t in r["inputs"].split():
        m = re.fullmatch(r"<extra_id_(\d+)>", t)
        toks += by_id[int(m.group(1))] if m else [t]
    assert toks == text.split()
    # masked fraction lands near the target rate
    masked = sum(len(v) for v in by_id.values())
    assert 0.10 < masked / n_tok < 0.20


def test_ann_recall_at_k_matches_numpy_twin(spark):
    """r9: the recall@k harness must equal a numpy twin of the same
    pipeline (SRP buckets -> candidates or guard fallback -> rank by
    (round(cos,6) desc, id) -> intersection with exact top-k)."""
    import numpy as np

    from cm_well_spark.operators.similarity import _planes, ann_recall_at_k

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 16)).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k, n_planes = 4, 3
    got = {r["query_id"]: (r["n_hits"], r["recall"]) for r in
           ann_recall_at_k(df, queries, k=k, n_planes=n_planes).collect()}

    planes = np.array(_planes(16, n_planes))
    buckets = ((vecs @ planes.T) > 0).astype(int) @ (1 << np.arange(n_planes))

    def cos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    for qid in range(5):
        full = sorted(range(60), key=lambda i: (-cos(vecs[i], vecs[qid]), i))
        exact = set(full[:k])
        cand = [i for i in range(60) if buckets[i] == buckets[qid]]
        pool = cand if len(cand) >= k else range(60)
        ann = sorted(pool, key=lambda i: (-cos(vecs[i], vecs[qid]), i))[:k]
        n_hits = len(set(ann) & exact)
        assert got[qid] == (n_hits, round(n_hits / k, 6)), qid
    assert all(0.0 <= r <= 1.0 for _h, r in got.values())
    with pytest.raises(ValueError):
        ann_recall_at_k(df, queries, k=0)


def test_long_doc_linear_hashing_family(spark):
    """r9 sweep: every k-gram/windowing operator must stay linear on an
    unchunked long doc. The quadratic forms (expression re-evaluation
    inside HOF lambdas, substr-by-char-offset on long UTF-8 strings,
    array_distinct over structs) each ran 100s+ on these inputs."""
    import time

    from cm_well_spark.operators.dedup import minhash_dedup_pairs, simhash_pairs
    from cm_well_spark.operators.text import (
        chunk_documents,
        fingerprints,
        repetition_signals,
        winnow_fingerprints,
    )

    docs = [(1, " ".join(f"t{i % 97}" for i in range(20000))), (2, "x" * 5000), (3, "tiny doc")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    budget = 45  # generous for a loaded CI box; quadratic forms took 100s+
    for name, fn in [
        ("winnow", lambda: winnow_fingerprints(df).count()),
        ("fingerprints", lambda: fingerprints(df).count()),
        ("chunk", lambda: chunk_documents(df, size=64).count()),
        ("repetition", lambda: repetition_signals(df).count()),
        ("minhash", lambda: minhash_dedup_pairs(df, threshold=0.9).count()),
        ("simhash", lambda: simhash_pairs(df).count()),
    ]:
        t0 = time.time()
        fn()
        assert time.time() - t0 < budget, f"{name} exceeded {budget}s"


def test_knn_graph_bucket_contract_and_ranks(embs, spark):
    from cm_well_spark.operators.similarity import _planes, knn_graph, srp_bucket

    sample = embs.where(F.col("vec_id") < 120)
    g = knn_graph(sample, k=3, n_planes=6, dim=64)
    rows = g.collect()
    assert rows, "knn graph is empty"
    # contract: no self edges, ranks within k and dense per src
    by_src = {}
    for r in rows:
        assert r["src"] != r["dst"]
        assert 1 <= r["rank"] <= 3
        by_src.setdefault(r["src"], []).append((r["rank"], r["cosine"], r["dst"]))
    for src, lst in by_src.items():
        lst.sort()
        assert [t[0] for t in lst] == list(range(1, len(lst) + 1))
        cosines = [t[1] for t in lst]
        assert cosines == sorted(cosines, reverse=True)
    # every edge joins two bucket-mates (the candidate contract)
    planes = _planes(64, 6)
    cast = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    buckets = {
        r["vec_id"]: r["b"]
        for r in sample.select("vec_id", srp_bucket(cast, planes).alias("b")).collect()
    }
    for r in rows:
        assert buckets[r["src"]] == buckets[r["dst"]]


def test_knn_graph_is_deterministic(embs):
    from cm_well_spark.operators.similarity import knn_graph

    sample = embs.where(F.col("vec_id") < 80)
    a = {(r["src"], r["rank"]): r["dst"] for r in knn_graph(sample, k=2).collect()}
    b = {(r["src"], r["rank"]): r["dst"] for r in knn_graph(sample.repartition(7), k=2).collect()}
    assert a == b


def test_quantile_sketch_rank_error_vs_exact(spark, sf_dir):
    """GK contract: each approximate quantile's true rank is within
    1/accuracy of the requested rank (tight accuracy -> near-exact)."""
    from cm_well_spark.operators.sketches import quantile_sketch
    from cm_well_spark.operators.text import whitespace_token_count
    from cm_well_spark.sources import tables as tbl

    docs = tbl.load_table(spark, sf_dir, "documents")
    vals = sorted(
        r["v"]
        for r in docs.select(whitespace_token_count(F.col("text")).alias("v")).collect()
    )
    n = len(vals)
    got = {r["p"]: r["q"] for r in quantile_sketch(docs, whitespace_token_count(F.col("text")), accuracy=10_000).collect()}
    assert set(got) == {0.1, 0.25, 0.5, 0.75, 0.9}
    import bisect

    for p, q in got.items():
        lo = bisect.bisect_left(vals, q)
        hi = bisect.bisect_right(vals, q)
        target = p * n
        # true rank window of the returned value must cover the target
        # rank within the GK bound (1/accuracy of n, plus 1 for ties)
        eps = n / 10_000 + 1
        assert lo - eps <= target <= hi + eps, (p, q, lo, hi, target)


def test_quantile_sketch_stratified_shape(spark, sf_dir):
    from cm_well_spark.operators.sketches import quantile_sketch
    from cm_well_spark.operators.text import whitespace_token_count
    from cm_well_spark.sources import tables as tbl

    docs = tbl.load_table(spark, sf_dir, "documents")
    out = quantile_sketch(docs, whitespace_token_count(F.col("text")), by="lang")
    rows = out.collect()
    langs = {r["lang"] for r in rows}
    assert len(rows) == 5 * len(langs)
    assert out.columns == ["lang", "p", "q"]


def test_semantic_knn_clusters_total_partition_and_transitivity(embs, spark):
    from cm_well_spark.operators.similarity import knn_graph, semantic_knn_clusters

    sample = embs.where(F.col("vec_id") < 150)
    out = semantic_knn_clusters(sample, threshold=0.3, k=3)
    rows = {r["vec_id"]: r["cluster"] for r in out.collect()}
    # total partition: every vector present exactly once, labels are members
    assert len(rows) == sample.count()
    assert set(rows.values()) <= set(rows)
    # labels are the min member id of their cluster
    members = {}
    for v, c in rows.items():
        members.setdefault(c, []).append(v)
    for c, vs in members.items():
        assert c == min(vs)
    # transitive closure: every qualifying knn edge stays within a cluster
    edges = knn_graph(sample, k=3).where(F.col("cosine") >= 0.3).collect()
    assert edges, "fixture produced no qualifying edges"
    for e in edges:
        assert rows[e["src"]] == rows[e["dst"]]


def test_semantic_knn_clusters_deterministic_under_partitioning(embs):
    from cm_well_spark.operators.similarity import semantic_knn_clusters

    sample = embs.where(F.col("vec_id") < 100)
    a = {(r["vec_id"], r["cluster"]) for r in semantic_knn_clusters(sample).collect()}
    b = {(r["vec_id"], r["cluster"]) for r in semantic_knn_clusters(sample.repartition(9)).collect()}
    assert a == b


def test_centroid_drift_identical_and_opposite(spark):
    from cm_well_spark.operators.similarity import centroid_drift

    a = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    # label 0 drifts to the opposite direction in B; label 1 identical
    b = spark.createDataFrame(
        [(4, [-1.0, 0.0], 0), (5, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    got = {r["label"]: r for r in centroid_drift(a, b).collect()}
    assert got[0]["cosine"] == -1.0 and got[0]["n_a"] == 2 and got[0]["n_b"] == 1
    assert got[1]["cosine"] == 1.0
    # a label present on one side only must not appear
    c = spark.createDataFrame([(9, [1.0, 0.0], 7)], "vec_id long, embedding array<double>, label int")
    assert centroid_drift(a, c).count() == 0
