"""SparkSession factory with the engine's tuned defaults.

Designed for multi-executor clusters (spark-submit --py-files); in the
sandbox we run local[N].  AQE is on so skewed shuffles re-plan at runtime;
Arrow is on because every Python crossing is a pandas UDF batch.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kgspark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = 32
    if master.startswith("local[") and master[6:-1].isdigit():
        cores = int(master[6:-1])
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(2 * cores, 8))))

    b = (SparkSession.builder.appName(app_name).master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         # Local mode: the driver JVM is the whole cluster, and repeated
         # pipeline runs accumulate dead pinned checkpoints.  r7 measured
         # the heap both ways at sf1.0: 24g retained ~20 GB of near-dead
         # blocks and ran 25% slower run-over-run (kg 122/122/147 s)
         # than 8g (129/93/98 s) — eviction of dead pins is free — but one
         # 8g run DIED with a heap OOM mid-bench (GCLocker/humongous-
         # allocation pressure).  The 2-minute ContextCleaner periodic GC
         # (default 30min — far longer than a bench) keeps the
         # eviction-friendly regime while actually RELEASING blocks whose
         # python references died; with it in place the 24g finding no
         # longer binds (it predated the periodic GC).  16g, not 12g:
         # after the partition-starvation fix the dedup operators run 32
         # concurrent tasks in their heavy aggregation stages, and a 12g
         # heap that had survived that phase with GCLocker warnings
         # (near-OOM) tipped into a task OutOfMemoryError when it followed
         # six pipeline runs in one session; 16g restores the margin while
         # staying in the small-heap eviction regime.  Env-overridable;
         # spark-submit sizes this on a real cluster.
         .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
         # JVM unified logging defaults to STDOUT: under heap pressure the
         # G1 "Retried waiting for GCLocker" warnings land in the middle of
         # the bench's machine-parsed stdout (observed mid-sf1.0 run, right
         # before the JSON line).  Route warnings to stderr where the rest
         # of Spark's logging already goes; stdout stays clean for the
         # one-JSON-line bench contract.
         .config("spark.driver.extraJavaOptions",
                 "-Xlog:disable -Xlog:all=warning:stderr")
         .config("spark.cleaner.periodicGC.interval",
                 os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"))
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
