"""Unigram-LM tokenizer (SentencePiece-style): vocabulary learning by
hard-EM pruning + Viterbi encoding (Kudo 2018, arXiv:1804.10959).

Spark-first, same scale posture as BPE (bpe.py): everything expensive
runs over the WORD-FREQUENCY table (distinct words + integer counts —
orders of magnitude smaller than a 100 TB corpus), never the corpus
itself.

  seed vocab    every substring of length 1..L of every distinct word,
                generated columnar (nested sequence/transform + flatten,
                zero Python), freq-weighted: posexplode -> groupBy(piece)
                .sum(freq) — one small shuffle; top-K is
                TakeOrderedAndProject with a lexicographic tie-break
  hard-EM       E-step: Viterbi-segment each DISTINCT word under the
                current piece log-probs (Arrow-batched mapInPandas; the
                vocab rides the closure — BOUNDED BY DESIGN at
                vocab_size, unlike the distinct-word table, so this
                broadcast is safe at any corpus scale) and emit
                freq-weighted integer piece counts; groupBy(piece)
                .sum(freq) reduces to <= |vocab| rows on the driver.
                M-step + pruning are driver-side arithmetic over those
                bounded integer counts — exact and deterministic.
  prune         drop lowest-count multi-char pieces until vocab_size;
                single characters are never pruned (coverage guarantee,
                matching SentencePiece's character_coverage=1.0 intent)
  encode        Viterbi once per DISTINCT word (mapInPandas), token
                counts join back onto the exploded corpus — documents
                never pay the Python cost per occurrence (bpe.py:148
                pattern, AQE picks broadcast vs shuffle join at runtime)

Learning is genuinely iterative (driver-bounded EM rounds over a bounded
vocab) — registry entries are rows-only by nature; correctness is pinned
by pytest against a pure-Python reference implementation of the same
hard-EM (test_unigram_lm.py).

All tie-breaks are total orders (count desc then piece asc; shortest
piece on equal Viterbi score) so learned vocabularies are identical
across runs, partitionings, and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cm_well_spark.operators.bpe import _word_freq
from cm_well_spark.plans.iterative import iter_checkpoint, iter_checkpoint_lazy

# log-prob assigned to a character absent from the vocabulary (encode on
# text unseen at training time): well below any real piece so Viterbi
# only falls back when it must, but finite so DP always completes.
UNK_LP = -100.0


def _viterbi(w: str, lp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of `w` under piece log-probs `lp`. Ties prefer
    the SHORTEST final piece (fixed total order — determinism)."""
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
            score = best[i - length] + p
            # strict > : the shortest l reaching this score wins (scanned
            # first), giving the deterministic shortest-piece tie-break
            if score > best[i]:
                best[i], back[i] = score, length
    out, i = [], n
    while i > 0:
        out.append(w[i - back[i] : i])
        i -= back[i]
    return out[::-1]


def _seed_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, n): freq-weighted substring counts, all lengths 1..L —
    generated columnar, one groupBy shuffle."""
    # substring(w, i, l) needs i/l as lambda-bound columns: SQL expr form
    subs = F.expr(
        "flatten(transform(sequence(1, length(w)), i -> "
        "transform(sequence(1, least({L}, length(w) - i + 1)), l -> "
        "substring(w, i, l))))".format(L=max_piece_len)
    )
    return (
        words.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )


def _estep_counts(words: DataFrame, lp: dict[str, float], max_piece_len: int) -> list[tuple[str, int]]:
    """Freq-weighted Viterbi piece counts over the distinct-word table.
    Returns the bounded (<= |vocab|) collected list, (piece, n)."""
    import pandas as pd

    def seg_batch(it):
        for pdf in it:
            counts: dict[str, int] = {}
            for w, f in zip(pdf["w"], pdf["freq"]):
                for piece in _viterbi(w, lp, max_piece_len):
                    counts[piece] = counts.get(piece, 0) + int(f)
            yield pd.DataFrame(
                {"piece": list(counts.keys()), "n": list(counts.values())}
            )

    rows = (
        words.mapInPandas(seg_batch, "piece string, n long")
        .groupBy("piece")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    return [(r["piece"], r["n"]) for r in rows]


def _normalize(counts: list[tuple[str, int]]) -> dict[str, float]:
    total = sum(n for _, n in counts)
    return {p: math.log(n) - math.log(total) for p, n in counts if n > 0}


def _prune(counts: list[tuple[str, int]], vocab_size: int) -> list[tuple[str, int]]:
    """Keep all single chars + the top multi-char pieces by (count desc,
    piece asc) until vocab_size."""
    chars = [(p, n) for p, n in counts if len(p) == 1]
    multi = sorted(
        ((p, n) for p, n in counts if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = max(0, vocab_size - len(chars))
    return chars + multi[:keep]


def learn_unigram(
    docs: DataFrame,
    vocab_size: int = 64,
    n_iters: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    text_col: str = "text",
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary. Returns [(piece, logprob)]
    sorted by (count desc, piece asc) after the final E-step — a stable
    total order independent of partitioning."""
    # lazy: the seed TakeOrdered collect below computes every partition,
    # so it is also the word-table materialization job (r11)
    words = _word_freq(docs, text_col).transform(iter_checkpoint_lazy)

    seed = (
        _seed_counts(words, max_piece_len)
        .orderBy(F.desc("n"), F.asc("piece"))
        .limit(seed_size + 4 * vocab_size)  # headroom: chars are kept regardless
        .collect()
    )
    counts = _prune([(r["piece"], r["n"]) for r in seed], seed_size)
    lp = _normalize(counts)

    for _ in range(n_iters):
        counts = _estep_counts(words, lp, max_piece_len)
        counts = _prune(counts, vocab_size)
        lp = _normalize(counts)

    final = sorted(counts, key=lambda kv: (-kv[1], kv[0]))
    return [(p, lp[p]) for p, n in final if n > 0]


def unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token counts under the learned vocabulary: (doc_id,
    unigram_tokens). Viterbi runs ONCE per distinct word; counts join
    back onto the exploded corpus (no forced broadcast — AQE decides;
    see bpe.py:143 for the scale contract)."""
    import pandas as pd

    lp = dict(vocab)
    max_len = max((len(p) for p in lp), default=1)

    def count_batch(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_pieces": pdf["w"].map(lambda w: len(_viterbi(w, lp, max_len))),
                }
            )

    exploded = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    word_counts = exploded.select("w").distinct().mapInPandas(count_batch, "w string, n_pieces int")
    return (
        exploded.join(word_counts, "w")
        .groupBy(id_col)
        .agg(F.sum("n_pieces").cast("long").alias("unigram_tokens"))
    )
