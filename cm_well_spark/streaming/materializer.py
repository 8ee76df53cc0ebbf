"""SPARQL-triggered materialized views (T7) — the flagship stateful
streaming capability.

Reference: SparqlTriggeredProcessor + SparqlProcessorManager
(cmwell-data-tools .../sparql/SparqlTriggeredProcessor.scala:30-59,95+;
cmwell-sparql-agent .../SparqlProcessorManager.scala): an agent consumes
per-"sensor" change feeds, detects changed subjects, re-runs a stored
SPARQL materializer over them, and writes derived infotons back.

Spark-first shape: ONE streaming query with foreachBatch —
  micro-batch of changed infotons
    -> affected subject set (the "sensor")
    -> re-run the SPARQL materializer restricted to affected subjects
    -> upsert the derived rows into the materialized table.

The CONSTRUCT form writes derived TRIPLES (the reference writes derived
infotons; triples are our canonical derived form — they re-assemble into
infotons via the doc-table builder). State = the streaming checkpoint;
exactly-once per micro-batch comes from the sink's idempotent overwrite
of affected subjects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cm_well_spark.model.lakehouse import triples_of
from cm_well_spark.operators.sparql import sparql_query
from cm_well_spark.operators.sparql.parser import parse_sparql


class SparqlTriggeredProcessor:
    """Materializes a CONSTRUCT query incrementally over a change feed.

    base_triples: the full triples table (for joins that reach beyond the
    changed subjects). derived_dir: parquet dir holding the materialized
    triples, upserted per batch (delete-matching-subjects + append)."""

    def __init__(
        self,
        spark: SparkSession,
        base_triples: DataFrame,
        construct_sparql: str,
        derived_dir: str,
    ):
        self.spark = spark
        self.base_triples = base_triples
        self.query = parse_sparql(construct_sparql)
        if self.query.form != "construct":
            raise ValueError("materializer requires a CONSTRUCT query")
        self.construct_sparql = construct_sparql
        self.derived_dir = derived_dir

    def process_batch(self, batch_df: DataFrame, batch_id: int = 0) -> DataFrame:
        """foreachBatch body: recompute derived triples for subjects whose
        source infotons changed; upsert into the derived table."""
        changed = batch_df.select("path").distinct()
        # restrict the materializer to solutions touching a changed subject:
        # run on (triples of changed docs) UNION (base triples), then keep
        # derived rows whose subject is changed-adjacent. Simple + correct;
        # an engine with Delta would MERGE on the solution keys instead.
        batch_triples = triples_of(batch_df)
        scope = self.base_triples.unionByName(
            batch_triples.select(*self.base_triples.columns), allowMissingColumns=True
        ).dropDuplicates(["s", "p", "o", "g"])
        derived = sparql_query(scope, self.construct_sparql, limit_cap=None)
        touched = derived.join(
            changed.withColumnRenamed("path", "s"), "s", "left_semi"
        )
        self._upsert(touched)
        return touched

    def _upsert(self, derived: DataFrame) -> None:
        os.makedirs(self.derived_dir, exist_ok=True)
        existing_path = os.path.join(self.derived_dir, "triples")
        subjects = [r["s"] for r in derived.select("s").distinct().collect()]
        if os.path.exists(existing_path):
            old = self.spark.read.parquet(existing_path)
            keep = old.where(~F.col("s").isin(subjects)) if subjects else old
            out = keep.unionByName(derived)
        else:
            out = derived
        tmp = existing_path + "._tmp"
        out.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(existing_path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    def start(self, feed: DataFrame, checkpoint_dir: str, trigger_available_now: bool = True):
        """Attach to a streaming feed of infoton rows."""
        writer = feed.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def read_derived(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.derived_dir, "triples"))
