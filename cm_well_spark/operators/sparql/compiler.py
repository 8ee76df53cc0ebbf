"""SPARQL -> DataFrame compiler over the `triples` EAV table (J4/J5).

This replaces the reference's whole custom apparatus — the Jena stage
generator, per-pattern ES scrolls, and hand-rolled nested-loop substitution
join (JenaArqExtensions.scala:375-519, :151-153) — with DataFrame self-joins
that Catalyst/AQE plan (hash vs broadcast, skew handling).

Kept from the reference (because Catalyst can't know it):
  - greedy BGP ordering by estimated cardinality, const-subject patterns
    first (sortTriplePatternsByAmount, JenaArqExtensionsUtils.scala:187-225;
    our cardinalities come from the lakehouse predicate_stats table instead
    of live count() calls);
  - the error contract: fully-unbound triple patterns are rejected
    (doFindInDftGraph:504-516; SparqlTests.scala:89), unsupported query
    forms are rejected (SpHandler.scala:630-631);
  - the 10k results cap (OpSlice, JenaArqExtensions.scala:591-600).

Term mapping in this engine: subjects are infoton paths (`</tpch/...>`),
predicates are field names (`<inNation>`), objects are lexical values or
paths; numeric comparisons go through the typed `num` shadow column.

OPTIONAL -> left outer join; UNION -> unionByName(allowMissingColumns);
FILTER -> where(); DISTINCT/ORDER/LIMIT map 1:1.
"""

from __future__ import annotations

import itertools
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cm_well_spark.operators.sparql.parser import (
    Filter,
    Group,
    Iri,
    Literal,
    Query,
    SparqlParseError,
    TriplePattern,
    Var,
    parse_sparql,
)

RESULTS_LIMIT = 10_000  # Config.defaultConfig resultsLimit (JenaArqExtensions.scala:311-321)


class SparqlCompileError(ValueError):
    pass


def _est_cost(tp: TriplePattern, stats: dict | None) -> tuple:
    """Greedy order key: const-subject first (point lookups), then by
    estimated row count of the bound-predicate scan."""
    const_s = 0 if isinstance(tp.s, (Iri, Literal)) else 1
    if isinstance(tp.p, Var):
        est = 10**12  # unbound predicate: full scan — order last
    else:
        est = (stats or {}).get(tp.p.value, {}).get("n", 10**9)
        if not isinstance(tp.o, Var):
            dobj = max(1, (stats or {}).get(tp.p.value, {}).get("dobj", 1))
            est = max(1, est // dobj)
    return (const_s, est)


def _pattern_df(triples: DataFrame, tp: TriplePattern, idx: int) -> tuple[DataFrame, dict]:
    """One triple pattern -> filtered scan projecting its variables.
    Bound predicate prunes to one `p` partition; bound object hits the
    o-sorted files' min/max."""
    if isinstance(tp.s, Var) and isinstance(tp.p, Var) and isinstance(tp.o, Var):
        raise SparqlCompileError(
            "fully unbound triple pattern is not allowed (bind at least one of subject/predicate/object)"
        )
    t = triples.where(F.col("current"))
    if not isinstance(tp.p, Var):
        t = t.where(F.col("p") == tp.p.value)
    if not isinstance(tp.s, Var):
        t = t.where(F.col("s") == _term_str(tp.s))
    if not isinstance(tp.o, Var):
        if isinstance(tp.o, Literal) and tp.o.dtype == "number":
            t = t.where(F.col("num") == float(tp.o.value))
        else:
            t = t.where(F.col("o") == _term_str(tp.o))
    cols, binds = [], {}
    if isinstance(tp.s, Var):
        cols.append(F.col("s").alias(tp.s.name))
        binds[tp.s.name] = "s"
    if isinstance(tp.p, Var):
        cols.append(F.col("p").alias(tp.p.name))
        binds[tp.p.name] = "p"
    if isinstance(tp.o, Var):
        cols.append(F.col("o").alias(tp.o.name))
        cols.append(F.col("num").alias(f"__num__{tp.o.name}"))
        binds[tp.o.name] = "o"
    if not cols:
        cols = [F.lit(1).alias(f"__exists__{idx}")]
    return t.select(*cols), binds


def _term_str(t) -> str:
    if isinstance(t, Iri):
        return t.value
    if isinstance(t, Literal):
        return t.value
    raise SparqlCompileError(f"not a constant term: {t}")


def _join(left: DataFrame, right: DataFrame) -> DataFrame:
    shared = [c for c in left.columns if c in right.columns and not c.startswith("__")]
    if shared:
        # drop duplicate shadow columns from the right side
        dup_shadows = [c for c in right.columns if c.startswith("__num__") and c in left.columns]
        right = right.drop(*dup_shadows)
        return left.join(right, shared, "inner")
    return left.crossJoin(right)


def _compile_group(triples: DataFrame, g: Group, stats: dict | None) -> DataFrame:
    patterns = sorted(g.triples, key=lambda tp: _est_cost(tp, stats))
    dfs = [_pattern_df(triples, tp, i)[0] for i, tp in enumerate(patterns)]
    if dfs:
        df = reduce(_join, dfs)
    else:
        df = None
    for branches in g.unions:
        parts = [_compile_group(triples, b, stats) for b in branches]
        u = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
        df = u if df is None else _join(df, u)
    if df is None:
        raise SparqlCompileError("empty graph pattern")
    for opt in g.optionals:
        right = _compile_group(triples, opt, stats)
        shared = [c for c in df.columns if c in right.columns and not c.startswith("__")]
        right = right.drop(*[c for c in right.columns if c.startswith("__num__") and c in df.columns])
        df = df.join(right, shared, "left") if shared else df.crossJoin(right)
    for flt in g.filters:
        df = df.where(_filter_col(flt, df))
    return df


def _filter_col(f: Filter, df: DataFrame) -> Column:
    if f.op == "&&":
        return _filter_col(f.args[0], df) & _filter_col(f.args[1], df)
    if f.op == "||":
        return _filter_col(f.args[0], df) | _filter_col(f.args[1], df)
    if f.op == "!":
        return ~_filter_col(f.args[0], df)
    if f.op == "regex":
        v, pat, flags = f.args
        col = F.col(v.name)
        rx = pat.value
        if flags is not None and "i" in flags.value:
            rx = "(?i)" + rx
        return col.rlike(rx)
    left, right = f.args
    ops = {"=": "__eq__", "!=": "__ne__", "<": "__lt__", "<=": "__le__", ">": "__gt__", ">=": "__ge__"}
    py = ops[f.op]
    if isinstance(left, Var) and isinstance(right, Literal) and right.dtype == "number":
        shadow = f"__num__{left.name}"
        col = F.col(shadow) if shadow in df.columns else F.col(left.name).cast("double")
        return getattr(col, py)(F.lit(float(right.value)))
    lcol = F.col(left.name) if isinstance(left, Var) else F.lit(_term_str(left))
    rcol = F.col(right.name) if isinstance(right, Var) else F.lit(_term_str(right))
    return getattr(lcol, py)(rcol)


def sparql_query(
    triples: DataFrame,
    query: str | Query,
    stats: dict | None = None,
    limit_cap: int = RESULTS_LIMIT,
) -> DataFrame:
    """Compile + plan a SPARQL query over the triples table.

    SELECT -> DataFrame of the projected variable columns.
    CONSTRUCT -> DataFrame(s, p, o) of instantiated template triples.
    """
    from cm_well_spark.operators.sparql.parser import AggExpr

    q = parse_sparql(query) if isinstance(query, str) else query
    df = _compile_group(triples, q.where, stats)
    if q.form == "select":
        aggs = [v for v in q.variables if isinstance(v, AggExpr)]
        if aggs or q.group_by:
            # SPARQL 1.1 aggregates -> groupBy + agg (partial+final hash agg
            # via Catalyst); numeric aggs use the typed num shadow column
            def agg_col(a: AggExpr) -> Column:
                if a.fn == "count":
                    if a.var is None:
                        c = F.count("*")
                    elif a.distinct:
                        c = F.countDistinct(a.var.name)
                    else:
                        c = F.count(a.var.name)
                    return c.alias(a.alias)
                shadow = f"__num__{a.var.name}"
                src = F.col(shadow) if shadow in df.columns else F.col(a.var.name).cast("double")
                fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
                return fns[a.fn](src).alias(a.alias)

            keys = [v.name for v in q.group_by]
            plain = [v.name for v in q.variables if isinstance(v, Var)]
            missing_keys = [v for v in plain if v not in keys]
            if missing_keys:
                raise SparqlCompileError(
                    f"non-aggregated SELECT variables must appear in GROUP BY: {missing_keys}"
                )
            gdf = df.groupBy(*keys) if keys else df.groupBy()
            df = gdf.agg(*[agg_col(a) for a in aggs]) if aggs else gdf.agg(F.count("*").alias("__n")).drop("__n")
            df = df.select(*[v.name if isinstance(v, Var) else v.alias for v in q.variables])
            if q.distinct:
                df = df.distinct()
            if q.order_by:
                df = df.orderBy(*[F.col(v.name).desc() if d else F.col(v.name).asc() for v, d in q.order_by])
            if q.limit is not None:
                df = df.limit(q.limit)
            return df
        if q.variables:
            missing = [v.name for v in q.variables if v.name not in df.columns]
            if missing:
                raise SparqlCompileError(f"SELECT variables not bound in pattern: {missing}")
            df = df.select(*[v.name for v in q.variables])
        else:
            df = df.select(*[c for c in df.columns if not c.startswith("__")])
        if q.distinct:
            df = df.distinct()
        if q.order_by:
            df = df.orderBy(*[F.col(v.name).desc() if d else F.col(v.name).asc() for v, d in q.order_by])
    else:  # construct
        sols = df
        parts = []
        for tp in q.template:
            def col_of(term):
                if isinstance(term, Var):
                    if term.name not in sols.columns:
                        raise SparqlCompileError(f"CONSTRUCT variable ?{term.name} not bound")
                    return F.col(term.name).cast("string")
                return F.lit(_term_str(term))

            parts.append(sols.select(col_of(tp.s).alias("s"), col_of(tp.p).alias("p"), col_of(tp.o).alias("o")))
        df = reduce(lambda a, b: a.unionByName(b), parts).distinct()
    cap = limit_cap
    if q.limit is not None:
        cap = min(q.limit, limit_cap) if limit_cap else q.limit
    if q.offset:
        from pyspark.sql import Window

        order = [F.col(v.name).desc() if d else F.col(v.name).asc() for v, d in q.order_by] or [
            F.col(df.columns[0]).asc()
        ]
        w = Window.orderBy(*order)
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > q.offset)
            .drop("__rn")
        )
    if cap:
        df = df.limit(cap)
    return df
