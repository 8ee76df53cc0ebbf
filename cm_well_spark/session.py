"""SparkSession factory tuned for the engine.

Local-mode knobs follow the public Spark tuning guidance; on a real cluster
the same config (AQE on, sensible shuffle partitions, Arrow enabled) is what
we'd ship — only memory/partition counts change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cm_well_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("CMW_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("CMW_DRIVER_MEM", "24g"))
        # pin the heap floor to the ceiling, and keep the heap RIGHT-SIZED
        # (r11): this VM faults anonymous memory at only ~120 MB/s
        # (measured: -XX:+AlwaysPreTouch of 48 GB = 391 s), so every NEW
        # heap page a query touches is a kernel-time tax — observed as
        # 65-96% sys time and a 4-9x wall blowup on repeated sf1
        # iterative queries (pagerank 219-314 s vs 22-38 s once the heap
        # stopped wandering). -Xms pins the floor so G1 never uncommits
        # and re-faults, and 24g (plenty for every measured op, including
        # the sf1 clustering compact) bounds the one-time fault tax to
        # ~3 min amortized over a session's first heavy queries. The
        # bench's min-of-N sampling absorbs that warm-up by design.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "CMW_DRIVER_XOPTS", f"-Xms{os.environ.get('CMW_DRIVER_MEM', '24g')}"
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # test tables store TIMESTAMP(NANOS); read as long, loaders convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # batch point-lookups (write_batch's affected-path isin, _out
        # batch gets) carry 100s-1000s of values; the default threshold
        # (10) silently drops the parquet row-group pushdown for them.
        # Evaluating a few hundred min/max containment checks per row
        # group is nanoseconds against the MBs of decode it skips.
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "1000")
        # single-JVM local mode: a long full-GC pause during a heavy
        # clustering shuffle can starve the in-process heartbeat thread —
        # observed killing an sf1 compact with "unable to send heartbeats
        # to driver more than 60 times" (r10). Wider heartbeat/network
        # windows are the standard guidance and equally ship-safe on a
        # real cluster.
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "600s")
    )
    # arbitrary config overrides for experiments / deployment tuning:
    # CMW_EXTRA_CONF="spark.a=b;spark.c=d" (set before the first
    # getOrCreate — a live session keeps its original conf)
    extra = os.environ.get("CMW_EXTRA_CONF", "")
    for kv in extra.split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
