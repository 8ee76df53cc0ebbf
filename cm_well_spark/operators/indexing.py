"""Search-index export: build inverted-index postings from the corpus.

The reference delegates full-text indexing to its search backend
(FTSService / es.indexer writing term postings per shard); a Spark-first
engine EXPORTS the same structure as data — (term, doc, tf, positions,
df) rows a search shard, a vector DB's keyword side, or a BM25 scorer
(functions/scoring.py) can load directly. Positional postings also feed
phrase-query verification and the duplicated-span auditors.

Shape at 100 TB: one posexplode off the scan (positions ride the word
sequence index), ONE groupBy (term, doc) whose shuffle carries
(term, doc, pos) rows, then a term-level document-frequency aggregate
over the already-reduced posting rows (orders of magnitude smaller than
the token stream) joined back on the term. Postings stay FLAT rows —
shard writers partition them by term range (repartitionByRange on term
at write time gives disjoint file ranges, the compaction.py layout
discipline); nothing nested, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cm_well_spark.operators.text import normalize_text, spread_for_cpu


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc, tf, positions, df): one posting row per (term, doc)
    with term frequency, comma-joined sorted word positions (0-based in
    the normalized word sequence), and the term's document frequency."""
    words = spread_for_cpu(docs).select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias("pos", "term"),
    ).where(F.col("term") != "")
    # sort positions numerically BEFORE rendering ("10" < "2" as strings)
    per_doc = words.groupBy("term", "doc").agg(
        F.count(F.lit(1)).alias("tf"),
        F.concat_ws(
            ",", F.transform(F.sort_array(F.collect_list("pos")), lambda p: p.cast("string"))
        ).alias("positions"),
    )
    term_df = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return per_doc.join(term_df, "term").select("term", "doc", "tf", "positions", "df")
