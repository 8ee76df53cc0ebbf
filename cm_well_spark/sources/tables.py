"""Loaders for the driver-generated test tables (TESTDATA.md).

`load(spark, sf_dir)` returns a dict of raw DataFrames; these are the
*external* sources that the ingest adapter (model/builder.py) turns into
the canonical infoton lakehouse.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) for t in TABLES}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as long under
    # spark.sql.legacy.parquet.nanosAsLong — normalize to microseconds.
    for fld in df.schema.fields:
        if fld.name == "ts" and fld.dataType.simpleString() == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df
