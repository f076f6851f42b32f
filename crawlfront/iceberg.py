"""Iceberg storage backend (SURVEY.md §0.3/§7.4) — behind
``EngineConfig.storage = "iceberg"``.

The engine's plain-parquet checkpoint (storage.Checkpoint) is already
Iceberg-SHAPED: immutable snapshot/delta dirs + one atomic manifest
pointer.  On a cluster with the Iceberg runtime jar, the same batch
protocol maps 1:1 onto real Iceberg tables:

    _write_snapshot(df, t)   →  df.writeTo(cat.ns.t).createOrReplace()
    _write_delta / appends   →  df.writeTo(cat.ns.t).append()
    manifest pointer commit  →  Iceberg's own atomic snapshot commit;
                                the engine manifest then records the
                                Iceberg snapshot-id per table instead of
                                a directory name
    manifest-pinned reads    →  SELECT ... VERSION AS OF <snapshot-id>

This module provides that IO surface plus the availability probe.  The
sandbox has no Iceberg runtime jar (SURVEY.md §0.3), so the roundtrip
test is skipped here and runs only where the jar is present; the
parquet backend remains the default and the only one exercised by CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 — Py4J raises wrapped ClassNotFound
        return False


class IcebergStore:
    """Table IO for ``EngineConfig.storage = "iceberg"``.

    ``catalog`` must be configured on the session, e.g.::

        spark.sql.catalog.crawl = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.crawl.type = hadoop
        spark.sql.catalog.crawl.warehouse = <path>
    """

    def __init__(self, spark: SparkSession, catalog: str = "crawl",
                 namespace: str = "crawlfront"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "storage='iceberg' needs the Iceberg Spark runtime jar on the "
                "classpath (org.apache.iceberg:iceberg-spark-runtime); this "
                "sandbox does not ship it — use the default storage='parquet'"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _q(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    # --- writes (the engine's three write shapes) -----------------------
    def write_snapshot(self, df: DataFrame, table: str) -> int:
        """Full-table replace (engine: compaction / snapshot commits)."""
        df.writeTo(self._q(table)).using("iceberg").createOrReplace()
        return self.current_snapshot_id(table)

    def append(self, df: DataFrame, table: str) -> int:
        """Append (engine: results/counters/seen_keys appends and
        frontier/url_seen deltas — merge-on-read happens in the engine's
        reader exactly as with parquet deltas)."""
        if not self.spark.catalog.tableExists(self._q(table)):
            df.writeTo(self._q(table)).using("iceberg").create()
        else:
            df.writeTo(self._q(table)).append()
        return self.current_snapshot_id(table)

    # --- reads ----------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._q(table))

    def read_at(self, table: str, snapshot_id: int) -> DataFrame:
        """Manifest-pinned read: the engine manifest records the Iceberg
        snapshot id at commit time; resume binds to it (time travel)."""
        return self.spark.read.option("snapshot-id", snapshot_id).table(self._q(table))

    def current_snapshot_id(self, table: str) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._q(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row["snapshot_id"]) if row else -1
