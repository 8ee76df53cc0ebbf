"""Namespace / prefix resolution (F9).

Reference: external field names are `localName.nsPrefix` or `$full-uri$`
(Parsers.scala:112-131); an async resolve step maps them to internal
hashed names via namespace caches before the search executes
(RawFieldFilter.eval, cmwell-ws/app/wsutil/RawFieldFilter.scala:103-148;
TimeBasedAccumulatedNamespacesCache).

Spark-first: namespaces are a small DIMENSION TABLE broadcast at
plan-build time; resolution is a pure AST rewrite before compilation —
no async machinery, no per-query cache invalidation problem (the dim
table versions with the lakehouse).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from cm_well_spark.parsers.qp import FieldFilter, MultiFieldFilter, SingleFieldFilter


class NamespaceError(KeyError):
    pass


class NamespaceRegistry:
    """prefix -> namespace URI and URI -> internal field-name mapping."""

    def __init__(self, prefix_to_uri: dict[str, str]):
        self.prefix_to_uri = dict(prefix_to_uri)
        self.uri_to_prefix = {v: k for k, v in prefix_to_uri.items()}

    @classmethod
    def from_table(cls, df: DataFrame) -> "NamespaceRegistry":
        return cls({r["prefix"]: r["uri"] for r in df.collect()})

    def to_table(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(list(self.prefix_to_uri.items()), ["prefix", "uri"])

    def internal_name(self, external: str) -> str:
        """`local.prefix` -> `local` (validated against the registry);
        `$uri#local$` -> `local` if uri is known; bare names pass through."""
        if external.startswith("$") and external.endswith("$") and len(external) > 2:
            uri = external[1:-1]
            for ns_uri in self.uri_to_prefix:
                if uri.startswith(ns_uri):
                    local = uri[len(ns_uri) :].lstrip("#/")
                    if local:
                        return local
            raise NamespaceError(f"unknown namespace URI in field: {external}")
        if "." in external and not external.startswith("system.") and not external.startswith("content."):
            local, _, prefix = external.rpartition(".")
            if prefix in self.prefix_to_uri:
                return local
            raise NamespaceError(f"unknown namespace prefix {prefix!r} in field {external!r}")
        return external

    def resolve_filter(self, ff: FieldFilter) -> FieldFilter:
        """Rewrite every field key in a qp AST to its internal name — the
        RawFieldFilter.eval analog, done before compile_filter."""
        if isinstance(ff, SingleFieldFilter):
            return replace(ff, name=self.internal_name(ff.name))
        return MultiFieldFilter(ff.field_op, tuple(self.resolve_filter(f) for f in ff.filters))


DEFAULT_NAMESPACES = NamespaceRegistry(
    {
        "tpch": "cmwell://meta/tpch",
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns",
        "rel": "http://purl.org/vocab/relationship",
        "foaf": "http://xmlns.com/foaf/0.1",
    }
)
