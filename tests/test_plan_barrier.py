"""plan_barrier mode equivalence: the localckpt lineage barrier (default)
must produce byte-identical batches to plain persist — same results,
frontier, and counters.  The barrier changes WHERE Catalyst work happens
(one physical-planning pass at construction vs re-analysis per sink job)
and truncates logical lineage; it must never change what is computed
(SURVEY.md §8 round-2; EngineConfig.plan_barrier)."""

from __future__ import annotations

from crawlfront.frontier import CrawlEngine, EngineConfig

N = 3


def _run(spark, fixture_dir, tmp_path, name, cfg):
    eng = CrawlEngine(spark, fixture_dir, tmp_path / name, cfg)
    # compare semantic counters only: commit_bytes is a PHYSICAL
    # measurement (parquet file sizes), and the barrier mode legitimately
    # changes write-side partitioning/encoding without changing any row
    stats = [{k: v for k, v in a.items() if k != "commit_bytes"}
             for a in eng.run(N)]
    res = sorted(map(tuple, eng.results().collect()))
    frontier = sorted(map(tuple, eng.frontier().collect()))
    return stats, res, frontier


def test_localckpt_equals_persist(spark, fixture_dir, tmp_path):
    lc = EngineConfig(plan_barrier="localckpt")
    pe = EngineConfig(plan_barrier="persist")
    s1, r1, f1 = _run(spark, fixture_dir, tmp_path, "localckpt", lc)
    s2, r2, f2 = _run(spark, fixture_dir, tmp_path, "persist", pe)
    assert s1 == s2
    assert r1 == r2
    assert f1 == f2


def _n_persisted_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_localckpt_blocks_freed_per_batch(spark, fixture_dir, tmp_path):
    """DataFrame.unpersist is a silent no-op on a localCheckpoint frame
    (its RDD is persisted outside the SQL cache manager), so without the
    explicit RDD release every batch leaks its barrier blocks — ex
    carries the batch's extracted text, the dominant frame.  A long
    drain must end with zero retained RDD blocks."""
    base = _n_persisted_rdds(spark)
    eng = CrawlEngine(spark, fixture_dir, tmp_path / "leak",
                      EngineConfig(plan_barrier="localckpt"))
    eng.run(N)
    assert _n_persisted_rdds(spark) <= base
