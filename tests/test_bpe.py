"""BPE learning/encoding vs a pure-Python reference implementation
(Sennrich et al. 2016 — learn on the word-frequency table, merge the
most frequent adjacent pair, ties lexicographic)."""

import collections

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.bpe import bpe_encode, learn_bpe


def ref_learn(texts, k):
    vocab = collections.Counter()
    for doc in texts:
        for w in doc.lower().split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(k):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < 2:
            break
        merges.append((a, b))
        newv = collections.Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            newv[tuple(out)] += f
        vocab = newv
    return merges


def ref_encode(text, merges):
    rank = {m: i for i, m in enumerate(merges)}
    total = 0
    for w in text.lower().split():
        syms = list(w) + ["</w>"]
        while len(syms) > 1:
            best = None
            bi = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        total += len(syms)
    return total


def test_learn_matches_reference_classic_corpus(spark):
    text = (
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    assert learn_bpe(df, n_merges=10) == ref_learn([text], 10)


def test_learn_and_encode_match_reference_on_real_docs(spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    docs = tbl.load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40).cache()
    texts = [r["text"] for r in docs.select("text").collect()]
    merges = learn_bpe(docs, n_merges=12)
    assert merges == ref_learn(texts, 12)
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()}
    want = {
        r["doc_id"]: ref_encode(r["text"], merges)
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want


def test_encode_no_merges_is_char_count_plus_words(spark):
    df = spark.createDataFrame([(1, "ab cde")], ["doc_id", "text"])
    # no merges: every char + one </w> per word = 2+1 + 3+1 = 7
    assert bpe_encode(df, []).first()["bpe_tokens"] == 7


def test_learn_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    merges = learn_bpe(df, n_merges=50)
    assert len(merges) < 50  # frequency floor (2) halts the loop early
