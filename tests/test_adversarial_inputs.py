"""Adversarial-input robustness sweep (r9): every text/dedup/curation/
packing operator must survive the corpus pathologies a real crawl
contains — empty docs, whitespace-only, punctuation/emoji-only (zero
tokens after normalization), single characters, unicode, a giant
single-token line, doubled whitespace — without throwing. ANSI mode is
ON (Spark 4 default), so unguarded negative slice lengths, zero
divisions, and bad substrings all crash rather than degrade; this sweep
is how the r9 bigram-slice and winnowing defects would have been caught
before an advisor did."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def nasty(spark):
    rows = [
        (1, ""),
        (2, "   "),
        (3, "!!! ??? ... 😀😀"),
        (4, "a"),
        (5, "éü中文 café naïve"),
        (6, "x" * 2000),
        (7, "word " * 3),
        (8, "a  b\tc\nd"),
        (9, "."),
        (10, "0123456789 " * 4),
        (11, "the same line\nthe same line\nunique tail"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _ops(nasty):
    from cm_well_spark.operators import curation as C
    from cm_well_spark.operators import dedup as D
    from cm_well_spark.operators import packing as P
    from cm_well_spark.operators import sketches as K
    from cm_well_spark.operators import text as T

    half_a = nasty.where("doc_id < 6")
    half_b = nasty.where("doc_id >= 6")
    return {
        "token_counts": lambda: T.token_counts(nasty),
        "quality_features": lambda: T.quality_features(nasty),
        "lang_id": lambda: T.lang_id(nasty),
        "fingerprints": lambda: T.fingerprints(nasty),
        "winnow": lambda: T.winnow_fingerprints(nasty),
        "unigram_xent": lambda: T.unigram_cross_entropy(nasty),
        "bigram_xent": lambda: T.bigram_cross_entropy(nasty),
        "trigram_xent": lambda: T.trigram_cross_entropy(nasty),
        "ppl_buckets": lambda: T.perplexity_buckets(nasty),
        "repetition_signals": lambda: T.repetition_signals(nasty),
        "chunk_documents": lambda: T.chunk_documents(nasty, size=3),
        "tfidf_keywords": lambda: T.tfidf_keywords(nasty),
        "unicode_normalize": lambda: T.unicode_normalize(nasty),
        "char_entropy": lambda: T.char_entropy(nasty),
        "memorization_risk": lambda: T.memorization_risk(nasty, k=4),
        "compression_ratio": lambda: T.compression_ratio(nasty),
        "script_profile": lambda: T.script_profile(nasty),
        "corpus_kl": lambda: T.corpus_kl_divergence(half_a, half_b),
        "exact_dup_groups": lambda: D.exact_duplicate_groups(nasty),
        "jaccard_pairs": lambda: D.jaccard_pairs(nasty, threshold=0.1),
        "minhash_pairs": lambda: D.minhash_dedup_pairs(nasty, threshold=0.1),
        "simhash_pairs": lambda: D.simhash_pairs(nasty),
        "duplicated_spans": lambda: D.duplicated_spans(nasty, k=2),
        "remove_dup_spans": lambda: D.remove_duplicated_spans(nasty, k=2),
        "line_dedup": lambda: D.line_dedup(nasty),
        "incremental_dedup": lambda: D.incremental_dedup(half_a, half_b),
        "gopher_rules": lambda: C.gopher_rules(nasty),
        "boilerplate_removal": lambda: C.boilerplate_removal(nasty),
        "scrub_pii": lambda: C.scrub_pii(nasty),
        "quality_filter": lambda: C.quality_filter(nasty),
        "decontaminate": lambda: C.decontaminate(half_a, half_b, k=2),
        "dsir_weights": lambda: C.dsir_weights(half_a, half_b),
        "snapshot_diff": lambda: C.snapshot_diff(half_a, half_a),
        "weighted_sample": lambda: C.weighted_sample(
            nasty.withColumn("w", (F.col("doc_id") % 3).cast("double")), "w", 3
        ),
        "pack_windows": lambda: P.pack_concat_windows(nasty, budget=5),
        "pack_bins_ffd": lambda: P.pack_bins_ffd(nasty, context_len=5),
        "fim_transform": lambda: P.fim_transform(nasty),
        "span_corruption": lambda: P.span_corruption(nasty, span_len=2, stride=5),
        "ul2_mixture": lambda: P.ul2_mixture(nasty),
        "word_heavy_hitters": lambda: K.word_heavy_hitters(nasty, phi=0.01),
    }


def test_every_pipeline_op_survives_nasty_corpus(nasty):
    failures = []
    for name, fn in _ops(nasty).items():
        try:
            fn().collect()
        except Exception as e:  # noqa: BLE001 — collecting a failure report
            failures.append(f"{name}: {str(e).splitlines()[0][:140]}")
    assert failures == [], "\n".join(failures)


def test_learners_survive_nasty_corpus(nasty):
    from cm_well_spark.operators.bpe import bpe_encode, learn_bpe
    from cm_well_spark.operators.unigram_lm import learn_unigram, unigram_encode

    merges = learn_bpe(nasty, n_merges=3)
    assert bpe_encode(nasty, merges).count() > 0
    vocab = learn_unigram(nasty, vocab_size=16, n_iters=1)
    assert unigram_encode(nasty, vocab).count() > 0
