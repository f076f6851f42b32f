"""SparkSession factory with the engine's standard configs.

Centralized so tests, bench.py and the driver entrypoint all get the
same deterministic, scale-oriented settings (SURVEY.md §4): AQE on
(skew-join + partition coalescing), Arrow UDF transport, explicit
broadcast threshold, UTC session timezone (fixtures are naive-UTC
timestamp[us]).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "crawlfront",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("CRAWLFRONT_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("CRAWLFRONT_SHUFFLE_PARTITIONS", "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # pages scans feed Python-parse-heavy stages (~50x more CPU per
        # byte than pure columnar work), so partitions are sized for CPU
        # balance, not IO: several waves per core lets greedy scheduling
        # smooth task skew (one big task in a single-wave stage stalls
        # the whole stage).  At real cluster scale with IO-bound scans,
        # override back toward 128 MB.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.ui.enabled", "false")
        # Every action renders its physical-plan description string
        # (SQLExecutionStart event) with a default cap of ~2 GB; a deep
        # MOR/union plan late in a long-lived JVM can OOM the driver heap
        # inside that StringConcat (observed: full pytest suite, delta
        # shard write).  1 MB is plenty for real plans and bounds the
        # allocation; retainedExecutions bounds their accumulation.
        .config("spark.sql.maxPlanStringLength", str(1024 * 1024))
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.driver.memory", os.environ.get("CRAWLFRONT_DRIVER_MEM", "8g"))
    )
    # shuffle/spill scratch dir: on a cluster every executor has its own
    # local disks; in this single-box sandbox all "executors" share ONE
    # ~273 MB/s disk, which serializes shuffle I/O and caps scaling
    # measurements far below the CPU ceiling.  CRAWLFRONT_LOCAL_DIR
    # (e.g. /dev/shm/sparktmp) emulates per-executor local disks for the
    # scaling bench; durable table commits still go to the real disk.
    local_dir = os.environ.get("CRAWLFRONT_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    if master:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
