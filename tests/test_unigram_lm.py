"""Unigram-LM learning/encoding vs a pure-Python reference of the same
hard-EM (Kudo 2018): seed substring counts -> Viterbi E-step ->
count-normalize M-step -> char-preserving prune, identical tie-breaks."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.unigram_lm import (
    UNK_LP,
    learn_unigram,
    unigram_encode,
)


def ref_viterbi(w, lp, max_len):
    n = len(w)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for length in range(1, min(max_len, i) + 1):
            piece = w[i - length : i]
            p = lp.get(piece)
            if p is None:
                if length > 1:
                    continue
                p = UNK_LP
            if best[i - length] + p > best[i]:
                best[i], back[i] = best[i - length] + p, length
    out, i = [], n
    while i > 0:
        out.append(w[i - back[i] : i])
        i -= back[i]
    return out[::-1]


def ref_learn(texts, vocab_size, n_iters, max_piece_len, seed_size):
    words = collections.Counter()
    for doc in texts:
        for w in doc.lower().split():
            words[w] += 1

    def prune(counts, size):
        chars = [(p, n) for p, n in counts if len(p) == 1]
        multi = sorted(
            ((p, n) for p, n in counts if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return chars + multi[: max(0, size - len(chars))]

    def normalize(counts):
        total = sum(n for _, n in counts)
        return {p: math.log(n) - math.log(total) for p, n in counts if n > 0}

    seed = collections.Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + l]] += f
    top = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))[
        : seed_size + 4 * vocab_size
    ]
    counts = prune(top, seed_size)
    lp = normalize(counts)

    for _ in range(n_iters):
        agg = collections.Counter()
        for w, f in words.items():
            for piece in ref_viterbi(w, lp, max_piece_len):
                agg[piece] += f
        counts = prune(list(agg.items()), vocab_size)
        lp = normalize(counts)

    final = sorted(counts, key=lambda kv: (-kv[1], kv[0]))
    return [(p, lp[p]) for p, n in final if n > 0]


def ref_encode(text, vocab):
    lp = dict(vocab)
    max_len = max((len(p) for p in lp), default=1)
    return sum(len(ref_viterbi(w, lp, max_len)) for w in text.lower().split())


def test_learn_matches_reference_classic_corpus(spark):
    text = (
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = learn_unigram(df, vocab_size=24, n_iters=2, max_piece_len=4, seed_size=64)
    want = ref_learn([text], 24, 2, 4, 64)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (wp, wl) in zip(got, want):
        assert gl == pytest.approx(wl, abs=1e-12)


def test_learn_and_encode_match_reference_on_real_docs(spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    docs = tbl.load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40).cache()
    texts = [r["text"] for r in docs.select("text").collect()]
    vocab = learn_unigram(docs, vocab_size=48, n_iters=2, max_piece_len=4, seed_size=128)
    want = ref_learn(texts, 48, 2, 4, 128)
    assert [p for p, _ in vocab] == [p for p, _ in want]
    got = {r["doc_id"]: r["unigram_tokens"] for r in unigram_encode(docs, vocab).collect()}
    expect = {
        r["doc_id"]: ref_encode(r["text"], vocab)
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == expect


def test_multichar_pieces_compress_below_char_count(spark):
    # 'abab' repeated: the learned vocab must contain multi-char pieces
    # and encode to fewer tokens than character segmentation
    df = spark.createDataFrame(
        [(1, "abab abab abab ababab ababab cd")], ["doc_id", "text"]
    )
    vocab = learn_unigram(df, vocab_size=8, n_iters=2, max_piece_len=4, seed_size=32)
    assert any(len(p) > 1 for p, _ in vocab)
    n = unigram_encode(df, vocab).first()["unigram_tokens"]
    assert n < len("ababababababababab") + 2  # well under the char count


def test_unk_chars_fall_back_to_single_char(spark):
    df = spark.createDataFrame([(1, "aa aa")], ["doc_id", "text"])
    vocab = learn_unigram(df, vocab_size=4, n_iters=1, max_piece_len=2, seed_size=8)
    enc = spark.createDataFrame([(9, "zzz")], ["doc_id", "text"])
    # 'z' is out-of-vocab: Viterbi falls back to UNK chars, never crashes
    assert unigram_encode(enc, vocab).first()["unigram_tokens"] == 3
