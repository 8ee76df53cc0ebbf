"""Gremlin-style traversal DSL (J6) — fluent wrapper over the engine's
join-based traversal kernels.

Reference: the cmwell-plugin-gremlin module exposes a Blueprints graph
over the fetched Jena model (JenaGraph.scala, GremlinParser.scala) —
out-of-MVP in SURVEY §2.3 but expressible as iterated joins. This module
implements the core step vocabulary (V/has/out/in/both/values/path-count)
as compositions of the same pruned triples-edge hops the xg/yg operators
use, so basic gremlin traversals port 1:1:

    g(infotons, triples).V().has("rdfType", "Customer") \
        .out("inNation").out("ofRegion").values("name")

Each step stays a declarative DataFrame transform; nothing collects until
the caller acts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cm_well_spark.model import fieldvals as fv


class GraphTraversal:
    """`bounded` tracks whether the current frontier is PROVABLY small:
    True only for explicit `V(paths)` seed lists (optionally narrowed by
    `has`). A hop's fan-out is unbounded — even from a tiny seed set —
    and `V()` is the whole vertex set, so those frontiers carry no static
    broadcast hint; AQE's runtime size check converts the semi join to a
    broadcast when the actual set is small (VERDICT r1 finding 4)."""

    def __init__(
        self,
        infotons: DataFrame,
        triples: DataFrame,
        frontier: DataFrame | None = None,
        bounded: bool = False,
    ):
        self.infotons = infotons.where(F.col("current"))
        self.triples = triples.where(F.col("current"))
        self.frontier = frontier  # DataFrame["path"]
        self.bounded = bounded

    def _with(self, frontier: DataFrame, bounded: bool = False) -> "GraphTraversal":
        return GraphTraversal(self.infotons, self.triples, frontier, bounded)

    def _hinted(self, df: DataFrame) -> DataFrame:
        return F.broadcast(df) if self.bounded else df

    # ---- steps ----

    def V(self, *paths: str) -> "GraphTraversal":
        if paths:
            f = self.infotons.sparkSession.createDataFrame([(p,) for p in paths], ["path"])
            return self._with(f, bounded=True)
        return self._with(self.infotons.select("path"), bounded=False)

    def has(self, field: str, value: str | None = None) -> "GraphTraversal":
        vals = F.col("fields").getItem(field)
        cond = vals.isNotNull() & (F.size(vals) > 0)
        if value is not None:
            cond = cond & F.coalesce(F.exists(vals, lambda v: v["value"] == F.lit(value)), F.lit(False))
        keep = self.infotons.where(cond).select("path")
        return self._with(self.frontier.join(keep, "path", "left_semi"), bounded=self.bounded)

    def _edge_hop(self, labels: tuple[str, ...], reverse: bool) -> DataFrame:
        t = self.triples.where((F.col("vtype") == "s") & F.col("o").startswith("/"))
        if labels:
            t = t.where(F.col("p").isin(list(labels)))
        src, dst = ("o", "s") if reverse else ("s", "o")
        e = t.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        fr = self._hinted(self.frontier.select(F.col("path").alias("src")).distinct())
        out = e.join(fr, "src", "left_semi").select(F.col("dst").alias("path")).distinct()
        # vertices must exist (ghost skip)
        return out.join(self.infotons.select("path"), "path", "left_semi")

    def out(self, *labels: str) -> "GraphTraversal":
        return self._with(self._edge_hop(labels, reverse=False))

    def in_(self, *labels: str) -> "GraphTraversal":
        return self._with(self._edge_hop(labels, reverse=True))

    def both(self, *labels: str) -> "GraphTraversal":
        fwd = self._edge_hop(labels, reverse=False)
        rev = self._edge_hop(labels, reverse=True)
        return self._with(fwd.unionByName(rev).distinct())

    # ---- terminals ----

    def paths(self) -> DataFrame:
        return self.frontier.distinct()

    def values(self, field: str) -> DataFrame:
        hydrated = self.infotons.join(self._hinted(self.frontier.distinct()), "path", "left_semi")
        return hydrated.select(
            "path", F.explode(F.transform(F.col("fields").getItem(field), lambda v: v["value"])).alias("value")
        )

    def count(self) -> int:
        return self.frontier.distinct().count()

    def to_infotons(self) -> DataFrame:
        return self.infotons.join(self._hinted(self.frontier.distinct()), "path", "left_semi")


def g(infotons: DataFrame, triples: DataFrame) -> GraphTraversal:
    return GraphTraversal(infotons, triples)
