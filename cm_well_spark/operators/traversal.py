"""Graph traversals — xg / yg / gqp (SURVEY.md §2.3, J1-J3, J7).

These are CM-Well's "joins": URI-identity equi joins between FReference
field values and infoton paths.

  xg  (J1) expand-out: bounded (<=9) unrolled loop of
      explode(refs) -> join(infotons, ref == path), accumulating distinct
      paths (reference: deepExpandGraph wsutil/package.scala:716-749,
      expandIn :521-615; limit 10000 application.conf:71).
  yg  (J2) expand-up/in chains: '<field' = reverse join (who points at
      me) via the predicate-partitioned triples table (partition-pruned
      scan on p + broadcast of the frontier), '>field' = forward deref
      (pathExpansionParser wsutil:850-963, expandUp :617-714).
  gqp (J3) like yg but only FILTERS the result set: an original survives
      iff the whole segment chain reaches a non-empty population
      (gqpFilter wsutil:751-849) -> chain of semi joins.
  J7  ghost skipping: dangling references simply find no row on the
      other side of the join; the chain continues from what matched
      (GhostInfoton Infoton.scala:320; ExpansionTests.scala:238-243).

Scale posture: the frontier is bounded by the xg limit (10k), so the
frontier side of every join is broadcastable; the big side is one
partition-pruned triples scan (reverse) or one doc-table join (forward)
per hop — no iteration over collect()ed rows, no graph library needed for
bounded-depth expansion.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cm_well_spark.parsers.expansion import (
    ExpandIn,
    ExpandUp,
    FilteredField,
    LevelExpansion,
    PathsExpansion,
    parse_gqp,
    parse_xg,
    parse_yg,
)
from cm_well_spark.plans.compile import compile_filter

XG_LIMIT = 10_000  # webservice.xg.limit (application.conf:71)


def _ref_values(fields_col: Column, selectors: tuple[FilteredField, ...]) -> Column:
    """Array of reference-candidate values of the selected fields.
    Joker (None) selects every field, mirroring JokerPattern."""
    named = [s.field for s in selectors if s.field is not None]
    joker = any(s.field is None for s in selectors)
    if joker:
        vals = F.flatten(F.map_values(fields_col))
    else:
        arrs = [F.coalesce(fields_col.getItem(n), F.array()) for n in named]
        vals = F.flatten(F.array(*arrs))
    refs = F.transform(vals, lambda v: v["value"])
    # our references are path-valued ("/...") — cheap pre-filter before join
    return F.array_distinct(F.filter(refs, lambda r: r.startswith("/")))


def _target_filter(selectors: tuple[FilteredField, ...]) -> Column | None:
    qps = [s.qp for s in selectors if s.qp is not None]
    if not qps:
        return None
    return reduce(lambda a, b: a & b, (compile_filter(q) for q in qps))


def _forward_targets(infotons: DataFrame, frontier: DataFrame, selectors) -> DataFrame:
    """One expand-in hop: frontier infoton rows -> dereferenced target rows."""
    refs = frontier.select(F.explode(_ref_values(F.col("fields"), selectors)).alias("path")).distinct()
    targets = infotons.where(F.col("current")).join(refs, "path", "left_semi")
    tf = _target_filter(selectors)
    return targets.where(tf) if tf is not None else targets


def _reverse_sources(infotons: DataFrame, triples: DataFrame, frontier: DataFrame, selectors) -> DataFrame:
    """One expand-up hop: who points at the frontier through these fields?
    Triples scan is partition-pruned on p (bound predicates) and the
    frontier is broadcast — the big side never shuffles."""
    named = [s.field for s in selectors if s.field is not None]
    t = triples.where(F.col("current"))
    if named:
        t = t.where(F.col("p").isin(named))
    fr = frontier.select(F.col("path").alias("o")).distinct()
    srcs = t.join(F.broadcast(fr), "o", "left_semi").select(F.col("s").alias("path")).distinct()
    sources = infotons.where(F.col("current")).join(srcs, "path", "left_semi")
    tf = _target_filter(selectors)
    return sources.where(tf) if tf is not None else sources


def expand_out(
    infotons: DataFrame,
    seeds: DataFrame,
    xg: str | list[LevelExpansion] = "",
    limit: int = XG_LIMIT,
) -> DataFrame:
    """J1 xg: returns seeds plus all expanded infotons (distinct by path).

    Levels are bounded at 9 by the grammar, so the loop unrolls into one
    declarative plan; each hop is a semi join on path."""
    levels = parse_xg(xg) if isinstance(xg, str) else xg
    acc = seeds
    frontier = seeds
    for level in levels:
        targets = _forward_targets(infotons, frontier, level.fields)
        # drop already-seen paths to keep the frontier minimal
        frontier = targets.join(acc.select("path"), "path", "left_anti")
        acc = acc.unionByName(frontier)
    return acc.dropDuplicates(["path"]).limit(limit)


def expand_paths(
    infotons: DataFrame,
    triples: DataFrame,
    seeds: DataFrame,
    yg: str | PathsExpansion,
    limit: int = XG_LIMIT,
) -> DataFrame:
    """J2 yg: walk each `|`-alternative segment chain from the seeds and
    keep the WHOLE discovered path (seeds + every intermediate + final)."""
    pe = parse_yg(yg) if isinstance(yg, str) else yg
    acc = seeds
    for path in pe.paths:
        frontier = seeds
        for seg in path.segments:
            if isinstance(seg, ExpandIn):
                frontier = _forward_targets(infotons, frontier, seg.fields)
            elif isinstance(seg, ExpandUp):
                frontier = _reverse_sources(infotons, triples, frontier, seg.fields)
            acc = acc.unionByName(frontier)
    return acc.dropDuplicates(["path"]).limit(limit)


def gqp_filter(
    infotons: DataFrame,
    triples: DataFrame,
    results: DataFrame,
    gqp: str | PathsExpansion,
) -> DataFrame:
    """J3 gqp: keep only result rows whose full segment chain reaches a
    non-empty population; adds nothing to the result set.

    Implemented as a per-alternative chain of (orig, cur) hops — the
    original key rides along so the final distinct(orig) is a semi-join
    mask. A result survives if ANY `|`-alternative survives."""
    pe = parse_gqp(gqp) if isinstance(gqp, str) else gqp
    survivor_sets = []
    for path in pe.paths:
        if not path.segments:
            continue
        pop = results.select(F.col("path").alias("orig"), F.col("path").alias("cur"))
        for seg in path.segments:
            cur_inf = infotons.where(F.col("current")).join(
                pop.select(F.col("cur").alias("path")).distinct(), "path", "left_semi"
            )
            if isinstance(seg, ExpandIn):
                nxt = _forward_targets(infotons, cur_inf, seg.fields)
                # edges: cur -> ref target
                edges = (
                    cur_inf.select(F.col("path").alias("cur"), F.explode(_ref_values(F.col("fields"), seg.fields)).alias("nxt"))
                )
            else:
                nxt = _reverse_sources(infotons, triples, cur_inf, seg.fields)
                named = [s.field for s in seg.fields if s.field is not None]
                t = triples.where(F.col("current"))
                if named:
                    t = t.where(F.col("p").isin(named))
                edges = t.select(F.col("o").alias("cur"), F.col("s").alias("nxt"))
            nxt_paths = nxt.select(F.col("path").alias("nxt"))
            step = (
                pop.join(edges, "cur")
                .join(nxt_paths, "nxt", "left_semi")
                .select("orig", F.col("nxt").alias("cur"))
                .distinct()
            )
            pop = step
        survivor_sets.append(pop.select("orig").distinct())
    if not survivor_sets:
        return results
    survivors = reduce(lambda a, b: a.unionByName(b), survivor_sets).distinct()
    return results.join(survivors.withColumnRenamed("orig", "path"), "path", "left_semi")
