"""`POST /_sp` — SPARQL/Gremlin over a fetched subgraph (SURVEY §3.2).

The reference parses a "paths / import / sparql|gremlin" payload
(SPParser, controllers/SpHandler.scala:165-251), populates a Jena Dataset
by replaying each source line as an internal op=search/read nquads
request (PopulateAndQuery.populate:406-442), and evaluates the query on
the merged subgraph in a crashable-worker JVM.

Spark-first shape: populate = the SAME index-first search plan each
source line would run, reduced to a path set; the subgraph is the triples
table semi-joined to that set (one pruned equi-join — no HTTP loopback,
no worker boundary, no Dataset materialization). Execution reuses
sparql_query / eval_gremlin over the scoped frames, so every optimizer
the whole-graph route has (stats reorder, squash, fixpoint paths) applies
to the scoped run too.

Payload grammar (mirrors SPParser, case-insensitive headers):

    PATHS
    /a/path?op=search&qp=field::value&recursive
    /another/path
    <blank line>
    SPARQL            (or GREMLIN)
    SELECT ...        (multiple queries separated by a --- line)

Query params honored per source line: op=search (default: point read of
the path), qp, recursive / with-descendants, length, with-history,
with-deleted. `format`/`with-data` are populate-shaping in the reference
(nquads wire format) and are no-ops here — the subgraph is always the
matched infotons' triples. IMPORT sections carry jars/stored procedures
in the reference (SparqlQuery.evaluate:525-548) and are rejected
explicitly rather than silently dropped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import parse_qs, unquote

from pyspark.sql import DataFrame, functions as F

from cm_well_spark.operators import search as S


class SpParseError(ValueError):
    """Payload doesn't match the PATHS/IMPORT/SPARQL grammar (the
    reference raises ParsingException with the offending input)."""


@dataclass
class SpRequest:
    sources: list[str]
    imports: list[str]
    engine: str  # 'sparql' | 'gremlin'
    queries: list[str] = field(default_factory=list)


_MINUSES = re.compile(r"-{3,}")


def parse_sp_payload(payload: str) -> SpRequest:
    """Parse the _sp payload. Sections in order: PATHS (required),
    IMPORT (optional), SPARQL|GREMLIN (required), each header on its own
    line; query bodies split on `---` lines like the reference's
    `minuses` separator."""
    lines = payload.splitlines()
    i = 0
    while i < len(lines) and not lines[i].strip():
        i += 1
    if i >= len(lines) or lines[i].strip().lower() != "paths":
        raise SpParseError("payload must start with a PATHS section")
    i += 1
    sources: list[str] = []
    while i < len(lines) and lines[i].strip().startswith("/"):
        sources.append(lines[i].strip())
        i += 1
    if not sources:
        raise SpParseError("PATHS section lists no sources")
    imports: list[str] = []
    while i < len(lines) and not lines[i].strip():
        i += 1
    if i < len(lines) and lines[i].strip().lower() == "import":
        i += 1
        while i < len(lines) and lines[i].strip() and lines[i].strip().lower() not in ("sparql", "gremlin"):
            imports.append(lines[i].strip())
            i += 1
        while i < len(lines) and not lines[i].strip():
            i += 1
    if i >= len(lines) or lines[i].strip().lower() not in ("sparql", "gremlin"):
        raise SpParseError("expected a SPARQL or GREMLIN section")
    engine = lines[i].strip().lower()
    body = "\n".join(lines[i + 1 :]).strip()
    if not body:
        raise SpParseError(f"{engine.upper()} section is empty")
    queries = [q.strip() for q in _MINUSES.split(body) if q.strip()]
    return SpRequest(sources, imports, engine, queries)


def _source_paths(infotons: DataFrame, triples: DataFrame, source: str) -> DataFrame:
    """One populate line -> its matched path set (single `path` column),
    via the same search plan the reference's internal request runs."""
    base, _, qstr = source.partition("?")
    params = parse_qs(qstr, keep_blank_values=True)

    def flag(name: str) -> bool:
        return name in params

    op = params.get("op", ["read"])[0] or "read"
    if op == "read":
        return infotons.sparkSession.createDataFrame([(unquote(base),)], ["path"])
    if op != "search":
        raise SpParseError(f"populate supports op=search or a bare read path, got op={op}")
    qp = params.get("qp", [None])[0]
    length = params.get("length", [None])[0]
    df = S.search(
        infotons,
        path_filter=S.PathFilter(unquote(base), descendants=flag("recursive") or flag("with-descendants")),
        qp=unquote(qp) if qp else None,
        length=int(length) if length else None,
        with_history=flag("with-history"),
        with_deleted=flag("with-deleted"),
        enforce_limits=length is not None,
        triples=triples,
    )
    return df.select("path")


def populate(infotons: DataFrame, triples: DataFrame, sources: list[str]) -> DataFrame:
    """Union of every source line's path set, deduplicated — the Spark
    analog of the reference's merged Jena Dataset (loadRdfToDataset)."""
    out = None
    for src in sources:
        p = _source_paths(infotons, triples, src)
        out = p if out is None else out.unionByName(p)
    return out.distinct()


def sp_eval(
    infotons: DataFrame,
    triples: DataFrame,
    payload: str,
    stats: dict | None = None,
) -> list[DataFrame]:
    """Parse + populate + evaluate; one result DataFrame per query (the
    reference concatenates rendered results — callers here keep the
    frames). The subgraph scope is a semi-join of the quads on the
    populated path set: at 100 TB that set is the size of the user's
    search result (bounded by the same guards search has), and the
    semi-join broadcasts under AQE when it is small."""
    req = parse_sp_payload(payload)
    if req.imports:
        raise NotImplementedError(
            "_sp IMPORT sections (jars / stored procedures, "
            "SparqlQuery.evaluate:525-548) are not supported"
        )
    paths = populate(infotons, triples, req.sources)
    scoped_triples = triples.join(paths.withColumnRenamed("path", "s"), "s", "left_semi")
    if req.engine == "gremlin":
        from cm_well_spark.operators.gremlin import eval_gremlin

        scoped_inf = infotons.join(paths, "path", "left_semi")
        return [eval_gremlin(scoped_inf, scoped_triples, q) for q in req.queries]
    from cm_well_spark.operators.sparql import sparql_query

    return [sparql_query(scoped_triples, q, stats=stats) for q in req.queries]
