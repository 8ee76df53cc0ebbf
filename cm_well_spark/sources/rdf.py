"""RDF ingest — N-Triples / N-Quads line parser -> canonical model (S6).

The reference ingests RDF via Jena through `_in`
(InputHandler.scala:67,259,375; LDFormatParser.scala). Spark-first we
parse the two line-oriented formats (which cover every integration-test
fixture — SURVEY §5) entirely with JVM-side regexp expressions: one scan,
no Python in the row path, splittable by line at any scale. Turtle /
JSON-LD / RDF-XML (not line-splittable) parse per-document via
mapInPandas in sources/rdf_formats.py behind the same triples schema.

Grammar handled per line:
    <s> <p> <o> [<g>] .
    <s> <p> "lit"[@lang | ^^<dtype>] [<g>] .
Comments (#...) and blank lines skip; blank nodes (_:b) pass through as
opaque subject/object ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# IRI ref | blank node | literal with optional lang/dtype
_TERM = r'(?:<[^>]*>|_:[A-Za-z0-9]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)?)'
_LINE = rf"^\s*({_TERM})\s+({_TERM})\s+({_TERM})(?:\s+({_TERM}))?\s*\.\s*$"

# xsd datatype -> engine vtype code (mirrors the FieldValue mangling table,
# Infoton.scala:527-537)
_XSD_VTYPE = {
    "integer": "l",
    "int": "i",
    "long": "l",
    "float": "f",
    "double": "w",
    "decimal": "w",
    "boolean": "b",
    "date": "d",
    "dateTime": "d",
}


def parse_rdf_lines(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """lines (one string column) -> long-format triples:
    (s, p, o, g, vtype, lang) with IRephemeral brackets stripped and basic
    literal unescaping."""
    c = F.col(text_col)
    parsed = lines.where((F.trim(c) != "") & ~F.trim(c).startswith("#")).select(
        F.regexp_extract(c, _LINE, 1).alias("rs"),
        F.regexp_extract(c, _LINE, 2).alias("rp"),
        F.regexp_extract(c, _LINE, 3).alias("ro"),
        F.regexp_extract(c, _LINE, 4).alias("rg"),
        c.alias("__line"),
    )
    parsed = parsed.where(F.col("rs") != "").drop("__line")

    def iri(col: Column) -> Column:
        return F.when(col.startswith("<"), col.substr(F.lit(2), F.length(col) - 2)).otherwise(col)

    ro = F.col("ro")
    is_lit = ro.startswith('"')
    lit_body = F.regexp_extract(ro, r'^"((?:[^"\\]|\\.)*)"', 1)
    lit_unescaped = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(lit_body, r'\\"', '"'), r"\\n", "\n"), r"\\\\", "\\\\"
    )
    lang = F.regexp_extract(ro, r'"@([A-Za-z0-9\-]+)$', 1)
    dtype = F.regexp_extract(ro, r"\^\^<([^>]*)>$", 1)
    dtype_local = F.regexp_extract(dtype, r"[#/]([A-Za-z]+)$", 1)
    vtype_expr = F.coalesce(
        *[F.when(dtype_local == k, F.lit(v)) for k, v in _XSD_VTYPE.items()],
        F.lit("s"),
    )
    return parsed.select(
        iri(F.col("rs")).alias("s"),
        iri(F.col("rp")).alias("p"),
        F.when(is_lit, lit_unescaped).otherwise(iri(ro)).alias("o"),
        F.when(F.col("rg") == "", None).otherwise(iri(F.col("rg"))).alias("g"),
        F.when(is_lit, vtype_expr).otherwise(F.lit("s")).alias("vtype"),
        F.when(lang == "", None).otherwise(lang).alias("lang"),
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Read .nt/.nq files into the long triples form; splittable text
    source, one task per 128MB split at scale."""
    return parse_rdf_lines(spark.read.text(path))


def uri_to_path(c: Column) -> Column:
    """Subject URI -> infoton path (protocol stripped — the reference's
    path = URI minus protocol, Intro.CM-WellDataParadigms)."""
    return F.concat(F.lit("/"), F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""))


def infotons_from_rdf(triples: DataFrame, subject_as_path: bool = True) -> DataFrame:
    """Assemble parsed triples into canonical infoton rows (the `_in`
    ingest shape, ready for the merge writer): group by subject, build the
    typed multi-valued quad-tagged fields map in one aggregation."""
    s_path = uri_to_path(F.col("s")) if subject_as_path else F.col("s")
    pred_local = F.coalesce(
        F.when(F.regexp_extract("p", r"[#/]([^#/]+)$", 1) != "", F.regexp_extract("p", r"[#/]([^#/]+)$", 1)),
        F.col("p"),
    )
    value_struct = F.struct(
        F.col("o").alias("value"),
        F.col("vtype").alias("vtype"),
        F.col("lang").alias("lang"),
        F.col("g").alias("quad"),
        F.when(F.col("vtype").isin("i", "l", "f", "w"), F.col("o").cast("double")).alias("num"),
        F.when(F.col("vtype") == "d", F.col("o").cast("timestamp")).alias("ts"),
        F.when(F.col("vtype") == "b", F.col("o").cast("boolean")).alias("bool"),
    )
    per_field = (
        triples.select(s_path.alias("path"), pred_local.alias("field"), value_struct.alias("v"))
        .groupBy("path", "field")
        .agg(F.collect_list("v").alias("vs"))
    )
    docs = per_field.groupBy("path").agg(
        F.map_from_entries(F.collect_list(F.struct(F.col("field"), F.col("vs")))).alias("fields")
    )
    return docs
