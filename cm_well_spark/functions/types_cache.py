"""F9 type-set expansion (RawFieldFilter.scala:103-148).

In the reference, an external (unmangled) field name expands into a
Should-group over every type-mangled variant the cluster has seen for
that field, via `typesCache` (TimeBasedAccumulatedNamespacesCache /
ManglingTests). Spark-first, the "cache" is a tiny dimension derived
from the triples table in one aggregation — (field -> set of vtype
codes) — collected once at plan-build time (#fields rows, not data
rows). Expansion is a pure qp-AST rewrite; the mangled variants compile
to vtype-restricted value matches (plans/compile.py), so

    nationkey::3   ->  [*l$nationkey::3, *s$nationkey::3]   (both seen)

matches exactly what the reference's expanded bool-Should does.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cm_well_spark.parsers.qp import (
    SHOULD,
    FieldFilter,
    MultiFieldFilter,
    SingleFieldFilter,
)

_SYSTEM_PREFIXES = ("system.", "content.")


class FieldTypesCache:
    """field name -> vtype codes seen in the store."""

    def __init__(self, field_vtypes: dict[str, tuple[str, ...]]):
        self.field_vtypes = {k: tuple(v) for k, v in field_vtypes.items()}

    @classmethod
    def from_triples(cls, triples: DataFrame) -> "FieldTypesCache":
        rows = (
            triples.where(F.col("current"))
            .groupBy("p")
            .agg(F.array_sort(F.collect_set("vtype")).alias("vts"))
            .collect()
        )
        return cls({r["p"]: tuple(r["vts"]) for r in rows})

    @classmethod
    def from_lakehouse(cls, spark, sf_dir: str) -> "FieldTypesCache":
        """Load from the materialized predicate_stats dim (one tiny file —
        no per-query aggregation; the stats ride the lakehouse build)."""
        import os

        from cm_well_spark.model.lakehouse import materialize

        out = materialize(spark, sf_dir)
        rows = spark.read.parquet(os.path.join(out, "predicate_stats")).collect()
        return cls({r["p"]: tuple(r["vtypes"]) for r in rows})

    def expand_filter(self, ff: FieldFilter) -> FieldFilter:
        """RawFieldFilter.eval analog: rewrite every unmangled field into
        its typed-variant Should-group (no-op for single-typed fields,
        mangled names, system fields, and fields the store hasn't seen)."""
        if isinstance(ff, MultiFieldFilter):
            return MultiFieldFilter(ff.field_op, tuple(self.expand_filter(f) for f in ff.filters))
        name = ff.name
        if (
            (len(name) > 2 and name[1] == "$")
            or name.startswith(_SYSTEM_PREFIXES)
            or name not in self.field_vtypes
        ):
            return ff
        vts = self.field_vtypes[name]
        if len(vts) <= 1:
            mangled = f"{vts[0]}${name}" if vts else name
            return replace(ff, name=mangled)
        # the Should-group's own role in its level stays the original op
        variants = tuple(replace(ff, name=f"{t}${name}", field_op=SHOULD) for t in vts)
        return MultiFieldFilter(ff.field_op, variants)
