"""Relevance score for `system.score` sort (O1 divergence closed).

Reference: searches sort by the engine score when `sort-by=system.score`
(FTSService.scala:302-314 — ES `_score`, i.e. BM25 over the analyzed
fields). A faithful BM25 needs corpus-wide doc-frequency state; this
engine computes a deterministic TERM-FREQUENCY score instead — the sum,
over the query's analyzed (`:` Contains) clauses, of how many times the
term occurs in the matched field's joined values (case-insensitive):

    score(doc) = Σ_clauses  occurrences(lower(field_text), lower(term))

Monotone in match count, zero for non-matching clauses, exactly
expressible in ANSI SQL for the oracle, and entirely JVM-side (string
expressions — no UDF). Documented divergence: no IDF/length
normalization, so ranking differs from ES where document frequencies
differ; tie order is path ASC (deterministic paging)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cm_well_spark.parsers.qp import (
    CONTAINS,
    MUSTNOT,
    FieldFilter,
    MultiFieldFilter,
    SingleFieldFilter,
)


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


def score_column(ff: FieldFilter | None) -> Column:
    """Sum of TF contributions over every analyzed clause in the tree;
    0.0 when the query has no analyzed clause (constant score, like ES)."""
    clauses: list[Column] = []

    def walk(f: FieldFilter) -> None:
        if isinstance(f, MultiFieldFilter):
            for sub in f.filters:
                walk(sub)
            return
        c = _clause_score(f)
        if c is not None:
            clauses.append(c)

    if ff is not None:
        walk(ff)
    if not clauses:
        return F.lit(0.0)
    out = clauses[0]
    for c in clauses[1:]:
        out = out + c
    return out
