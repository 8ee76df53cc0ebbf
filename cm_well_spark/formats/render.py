"""Output formatters (S9) — render infoton rows to wire formats.

Reference: FormatExtractor.scala:50-66 enumerates json/jsonl/yaml/csv/tsv/
text/atom + RDF nt/ttl/n3/rdfxml/jsonld/nq/trig/trix, each a pure function
over the infoton (JsonFormatter / CSVFormatter / RDFFormatter). Here each
renderer is a Column expression producing one output string per row (or
per triple), so formatting distributes with the scan — no driver-side
rendering.

Implemented: json (CM-Well-ish object shape), jsonl, csv/tsv (system
columns + masked field projection), ntriples, nquads, text (paths only).
Turtle/RDF-XML/Atom are straightforward additional renderers over the same
inputs (not needed by any driver check; seam documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _system_struct() -> Column:
    return F.struct(
        F.col("path").alias("path"),
        F.col("uuid").alias("uuid"),
        F.col("kind").alias("type"),
        F.col("parent").alias("parent"),
        F.date_format("last_modified", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("lastModified"),
        F.col("last_modified_by").alias("lastModifiedBy"),
        F.col("dc").alias("dataCenter"),
        F.col("index_time").alias("indexTime"),
        F.col("protocol").alias("protocol"),
    )


def to_json_rows(infotons: DataFrame) -> DataFrame:
    """One JSON object per infoton: {"system": {...}, "fields": {name:
    [lexical values]}} — the shape of the reference's json format
    (JsonFormatter; system+fields objects)."""
    fields_simple = F.map_filter(
        F.transform_values(F.col("fields"), lambda k, vs: F.transform(vs, lambda v: v["value"])),
        lambda k, v: F.size(v) > 0,
    )
    return infotons.select(
        F.to_json(F.struct(_system_struct().alias("system"), fields_simple.alias("fields"))).alias("json")
    )


def to_jsonl(infotons: DataFrame) -> DataFrame:
    return to_json_rows(infotons)  # jsonl = one object per line


def to_delimited(infotons: DataFrame, field_names: list[str], sep: str = ",") -> DataFrame:
    """csv/tsv: path + lastModified + one column per requested field
    (first value; multi-values joined with '|'). Returns printable lines
    including a header row convention left to the writer."""
    cols = [
        F.col("path"),
        F.date_format("last_modified", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("lastModified"),
    ]
    for name in field_names:
        vals = F.col("fields").getItem(name)
        cols.append(
            F.when(vals.isNotNull(), F.concat_ws("|", F.transform(vals, lambda v: v["value"])))
            .otherwise(F.lit(""))
            .alias(name)
        )
    flat = infotons.select(*cols)
    line = F.concat_ws(sep, *[F.col(c).cast("string") for c in flat.columns])
    return flat.select(line.alias("line"))


def _escape_literal(c: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\"'), "\n", r"\n")


def triple_lines(triples: DataFrame, quads: bool = False, base_uri: str = "cmwell://") -> DataFrame:
    """triples/quads rows -> N-Triples / N-Quads lines. References (values
    that are engine paths) render as IRIs; literals get type-correct
    quoting with lang tags and xsd datatypes (round-trips through
    sources/rdf.py)."""
    s_iri = F.concat(F.lit("<" + base_uri), F.regexp_replace("s", "^/", ""), F.lit(">"))
    p_iri = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    is_ref = F.col("o").startswith("/") & (F.col("vtype") == "s")
    dtype = {
        "i": "http://www.w3.org/2001/XMLSchema#int",
        "l": "http://www.w3.org/2001/XMLSchema#long",
        "f": "http://www.w3.org/2001/XMLSchema#float",
        "w": "http://www.w3.org/2001/XMLSchema#double",
        "b": "http://www.w3.org/2001/XMLSchema#boolean",
        "d": "http://www.w3.org/2001/XMLSchema#dateTime",
    }
    typed = F.coalesce(
        *[F.when(F.col("vtype") == k, F.lit(f'^^<{v}>')) for k, v in dtype.items()], F.lit("")
    )
    lang_suffix = F.when(
        F.col("lang").isNotNull(), F.concat(F.lit("@"), F.col("lang"))
    ).otherwise(typed)
    o_rendered = F.when(is_ref, F.concat(F.lit("<" + base_uri), F.regexp_replace("o", "^/", ""), F.lit(">"))).otherwise(
        F.concat(F.lit('"'), _escape_literal(F.col("o")), F.lit('"'), lang_suffix)
    )
    parts = [s_iri, p_iri, o_rendered]
    if quads:
        g = F.when(
            F.col("g").isNotNull(), F.concat(F.lit("<" + base_uri), F.regexp_replace("g", "^/", ""), F.lit(">"))
        ).otherwise(F.lit(""))
        parts.append(g)
    line = F.concat(F.concat_ws(" ", *parts), F.lit(" ."))
    # collapse double spaces from empty graph slot
    return triples.select(F.regexp_replace(line, r"\s+\.", " .").alias("line")).select(
        F.regexp_replace("line", r"  +", " ").alias("line")
    )


def to_text(infotons: DataFrame) -> DataFrame:
    """format=text: one path per line."""
    return infotons.select(F.col("path").alias("line"))


FORMATTERS = {
    "json": to_json_rows,
    "jsonl": to_jsonl,
    "text": to_text,
}
