"""BPE (byte-pair encoding) vocabulary learning and encoding.

The real Sennrich et al. 2016 algorithm, Spark-first: merges are learned
on the WORD-FREQUENCY table (distinct words + counts — orders of
magnitude smaller than the corpus; the classic trick that makes BPE
tractable at 100 TB), with each round's pair statistics computed as one
columnar aggregation:

  pair counts   arrays_zip(syms[:-1], syms[1:]) -> posexplode ->
                groupBy(pair).sum(freq) — map-side partial aggregation,
                one small shuffle per round
  top pair      orderBy(count DESC, pair ASC).limit(1) — deterministic
                tie-break, TakeOrderedAndProject
  merge apply   a columnar left fold over the symbol array (the merged
                pair is a per-round literal), leftmost-greedy like the
                reference implementation; vocab is iter_checkpoint'ed
                per round so the plan never nests k folds deep

Learning is genuinely iterative (k driver-bounded rounds over a bounded
vocab table) — the registry entry is rows-only by nature; correctness is
pinned by pytest against a pure-Python reference implementation.

Encoding applies the learned merge list per word in rank order. That is
sequential per word by definition, so it runs as an Arrow-batched
mapInPandas with a dict-based merge loop — the one justified Python step,
amortized over the distinct-word table, then broadcast-joined back to
the corpus (documents never pay the Python cost per occurrence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from cm_well_spark.plans.iterative import iter_checkpoint_lazy

END = "</w>"


def _word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    words = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    return (
        docs.select(words.alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _to_syms(col):
    # chars + end-of-word marker, e.g. "low" -> [l, o, w, </w>]
    # (split on the zero-width boundary emits a trailing "" — drop it)
    chars = F.filter(F.split(col, "(?!^)"), lambda x: x != "")
    return F.concat(chars, F.array(F.lit(END)))


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus. Returns the ranked
    merge list [(left, right), ...]; ties on pair frequency break
    lexicographically (deterministic across runs and engines)."""
    vocab = (
        _word_freq(docs, text_col)
        .select("freq", _to_syms(F.col("w")).alias("syms"))
        # lazy: each round's top-pair TakeOrdered collect computes every
        # partition, so it doubles as the vocab materialization job; the
        # final round's vocab (discarded) never pays a job at all (r11)
        .transform(iter_checkpoint_lazy)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        zipped = F.arrays_zip(
            F.expr("slice(syms, 1, size(syms) - 1)"),
            F.expr("slice(syms, 2, size(syms) - 1)"),
        )
        top = (
            vocab.select("freq", F.explode(zipped).alias("p"))
            .groupBy(F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        ab = a + b
        # leftmost-greedy merge as a columnar fold: if the accumulated
        # tail is `a` and the next symbol is `b`, fuse them
        fused = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.select("freq", fused.alias("syms")).transform(iter_checkpoint_lazy)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token counts under the learned vocabulary: (doc_id, bpe_tokens).

    The merge loop runs ONCE per distinct word (Arrow-batched
    mapInPandas over the word table), then the per-word token counts
    broadcast-join back onto the exploded corpus — documents never pay
    the Python cost per occurrence."""
    import pandas as pd

    rank = {tuple(m): i for i, m in enumerate(merges)}

    def encode_word(w: str) -> int:
        syms = list(w) + [END]
        while len(syms) > 1:
            best, bi = None, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        return len(syms)

    def count_batch(it):
        for pdf in it:
            yield pd.DataFrame({"w": pdf["w"], "n_syms": pdf["w"].map(encode_word)})

    exploded = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    word_counts = (
        exploded.select("w")
        .distinct()
        .mapInPandas(count_batch, "w string, n_syms int")
    )
    # No broadcast hint: the distinct-word table is unbounded (a 100 TB
    # corpus carries 10^7-10^8 distinct words) — a forced broadcast OOMs
    # the executors. AQE picks a broadcast at runtime when the table in
    # fact fits under spark.sql.autoBroadcastJoinThreshold; otherwise
    # this is a token-keyed shuffle join, which is the correct plan.
    return (
        exploded.join(word_counts, "w")
        .groupBy(id_col)
        .agg(F.sum("n_syms").cast("long").alias("bpe_tokens"))
    )
