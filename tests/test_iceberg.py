"""Iceberg backend flag (SURVEY.md §0.3/§7.4): the flag and its guard
work everywhere; the real roundtrip runs only where the runtime jar is
installed (not this sandbox)."""

from __future__ import annotations

import pytest

from crawlfront.iceberg import IcebergStore, iceberg_available


def test_engine_refuses_iceberg_without_jar(spark, fixture_dir, tmp_path):
    from crawlfront.frontier import CrawlEngine, EngineConfig

    if iceberg_available(spark):
        pytest.skip("jar present — covered by the roundtrip test")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        CrawlEngine(spark, fixture_dir, tmp_path / "ck",
                    EngineConfig(storage="iceberg"))


def test_unknown_storage_rejected(spark, fixture_dir, tmp_path):
    from crawlfront.frontier import CrawlEngine, EngineConfig

    with pytest.raises(ValueError, match="unknown storage"):
        CrawlEngine(spark, fixture_dir, tmp_path / "ck",
                    EngineConfig(storage="hdf5"))


def test_iceberg_roundtrip_with_jar(spark, tmp_path):
    """Snapshot-replace, append, and pinned time-travel reads — the
    three IO shapes the engine's write call-sites map onto."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not installed in this sandbox")
    store = IcebergStore(spark)
    df1 = spark.range(5).withColumnRenamed("id", "k")
    s1 = store.write_snapshot(df1, "t_rt")
    df2 = spark.range(5, 8).withColumnRenamed("id", "k")
    s2 = store.append(df2, "t_rt")
    assert store.read("t_rt").count() == 8
    assert store.read_at("t_rt", s1).count() == 5
    assert store.read_at("t_rt", s2).count() == 8
