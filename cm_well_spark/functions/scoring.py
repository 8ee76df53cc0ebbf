"""Relevance score for `system.score` sort (O1 divergence closed).

Reference: searches sort by the engine score when `sort-by=system.score`
(FTSService.scala:302-314 — ES `_score`, i.e. Lucene BM25 over the
analyzed fields). Two tiers here, both deterministic and exactly
expressible in ANSI SQL for the oracle, both pure JVM string/maths
expressions (no UDF):

  TF (score_column): Σ over the query's `:` Contains clauses of the
      case-insensitive occurrence count of the term in the field's
      joined values. No corpus state — usable anywhere.

  BM25 (bm25_column): the standard Okapi formula per clause,

      idf(t)  = ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
      score  += idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

      with k1=1.2, b=0.75, dl = the field's whitespace token count. The
      corpus constants (N, df_t, avgdl over the search's base set) come
      from ONE aggregate pass broadcast as a 1-row cross join — the
      Spark analog of the doc-frequency state Lucene keeps per shard.

Remaining divergence from ES: the analyzer is the engine's simple
lowercase/word-split (documented in SURVEY §7.3), and dl counts the
matched FIELD's tokens, not a per-field Lucene norm byte. Tie order is
path ASC (deterministic paging)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cm_well_spark.parsers.qp import (
    CONTAINS,
    MUSTNOT,
    FieldFilter,
    MultiFieldFilter,
    SingleFieldFilter,
)

BM25_K1 = 1.2
BM25_B = 0.75


def _clause_score(ff: SingleFieldFilter) -> Column | None:
    if ff.value_op != CONTAINS or ff.value is None or ff.field_op == MUSTNOT:
        return None
    name = ff.name
    if len(name) > 2 and name[1] == "$":
        name = name[2:]
    vals = F.col("fields").getItem(name)
    joined = F.lower(F.concat_ws(" ", F.transform(vals, lambda v: v["value"])))
    term = ff.value.lower()
    if not term:
        return None
    occurrences = (F.length(joined) - F.length(F.replace(joined, F.lit(term), F.lit("")))) / F.lit(
        len(term)
    )
    return F.coalesce(occurrences, F.lit(0.0))


def _analyzed_clauses(ff: FieldFilter | None) -> list[SingleFieldFilter]:
    out: list[SingleFieldFilter] = []

    def walk(f: FieldFilter) -> None:
        if isinstance(f, MultiFieldFilter):
            for sub in f.filters:
                walk(sub)
            return
        if f.value_op == CONTAINS and f.value and f.field_op != MUSTNOT:
            out.append(f)

    if ff is not None:
        walk(ff)
    return out


def score_column(ff: FieldFilter | None) -> Column:
    """Sum of TF contributions over every analyzed clause in the tree;
    0.0 when the query has no analyzed clause (constant score, like ES)."""
    clauses = [c for c in (_clause_score(f) for f in _analyzed_clauses(ff)) if c is not None]
    if not clauses:
        return F.lit(0.0)
    out = clauses[0]
    for c in clauses[1:]:
        out = out + c
    return out


def _field_text(name: str) -> Column:
    if len(name) > 2 and name[1] == "$":
        name = name[2:]
    vals = F.col("fields").getItem(name)
    return F.lower(F.concat_ws(" ", F.transform(vals, lambda v: v["value"])))


def with_bm25(matched: DataFrame, base: DataFrame, ff: FieldFilter | None, out_col: str = "__score") -> DataFrame:
    """Attach an Okapi BM25 score column to `matched` (the search's result
    rows), with corpus statistics (N, per-clause df and avgdl) computed
    over `base` (the visibility/path/date-filtered universe the search ran
    against) in ONE aggregate broadcast back as a 1-row cross join."""
    clauses = _analyzed_clauses(ff)
    if not clauses:
        return matched.withColumn(out_col, F.lit(0.0))
    aggs = [F.count(F.lit(1)).alias("__N")]
    for i, cl in enumerate(clauses):
        text = _field_text(cl.name)
        term = cl.value.lower()
        occ = (F.length(text) - F.length(F.replace(text, F.lit(term), F.lit("")))) / F.lit(len(term))
        dl = F.size(F.split(text, " "))
        aggs.append(F.count(F.when(F.coalesce(occ, F.lit(0.0)) > 0, F.lit(1))).alias(f"__df_{i}"))
        aggs.append(F.avg(F.when(text.isNotNull(), dl.cast("double"))).alias(f"__avgdl_{i}"))
    stats = base.agg(*aggs)
    df = matched.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i, cl in enumerate(clauses):
        text = _field_text(cl.name)
        term = cl.value.lower()
        tf = F.coalesce(
            (F.length(text) - F.length(F.replace(text, F.lit(term), F.lit("")))) / F.lit(len(term)),
            F.lit(0.0),
        )
        dl = F.coalesce(F.size(F.split(text, " ")).cast("double"), F.lit(0.0))
        n_col = F.col("__N").cast("double")
        df_col = F.col(f"__df_{i}").cast("double")
        avgdl = F.coalesce(F.col(f"__avgdl_{i}"), F.lit(1.0))
        idf = F.log(F.lit(1.0) + (n_col - df_col + 0.5) / (df_col + 0.5))
        norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        score = score + idf * tf * (BM25_K1 + 1.0) / norm
    drop = ["__N"] + [c for i in range(len(clauses)) for c in (f"__df_{i}", f"__avgdl_{i}")]
    return df.withColumn(out_col, score).drop(*drop)
