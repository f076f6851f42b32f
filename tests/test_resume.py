"""§5.2.4 — resume-equivalence: run k batches, drop the engine, resume
from the manifest, run more → all tables identical to an uninterrupted
run ("runs resume exactly", BASELINE.json:6,14).  Also: uncommitted
snapshot dirs from a crash mid-batch are invisible after resume."""

import shutil
import tempfile
from pathlib import Path


def _tables(eng):
    return {
        w: sorted(tuple(r) for r in getattr(eng, w)().collect())
        for w in ("results", "frontier", "seen_keys", "counters")
    }


def test_resume_equivalence(spark, fixture_dir):
    from crawlfront.frontier import CrawlEngine

    t1 = tempfile.mkdtemp(prefix="cf_resume_a_")
    e1 = CrawlEngine(spark, fixture_dir, t1)
    e1.run(4)

    t2 = tempfile.mkdtemp(prefix="cf_resume_b_")
    e2 = CrawlEngine(spark, fixture_dir, t2)
    e2.run(2)
    del e2  # "crash"
    e2b = CrawlEngine(spark, fixture_dir, t2)  # resume from manifest
    assert e2b.ckpt.current_batch() == 2
    e2b.run_batch()
    e2b.run_batch()

    a, b = _tables(e1), _tables(e2b)
    for w in a:
        assert a[w] == b[w], w
    shutil.rmtree(t1)
    shutil.rmtree(t2)


def test_crash_mid_batch_ignores_uncommitted(spark, fixture_dir):
    from crawlfront.frontier import CrawlEngine

    t = tempfile.mkdtemp(prefix="cf_crash_")
    e = CrawlEngine(spark, fixture_dir, t)
    e.run(2)
    # simulate a crash AFTER snapshot data was written but BEFORE the
    # manifest pointer swap: orphan snapshot dirs for batch 3
    for orphan in (
        Path(e.ckpt.snapshot_dir("frontier", 3)),
        Path(e.ckpt.append_dir("seen_keys", 3)),  # seen_keys is append-only
    ):
        orphan.mkdir(parents=True)
        (orphan / "garbage.parquet").write_bytes(b"not parquet")
    e2 = CrawlEngine(spark, fixture_dir, t)
    assert e2.ckpt.current_batch() == 2  # orphans invisible
    out = e2.run_batch()
    assert out["batch_id"] == 3  # overwrote the orphan cleanly
    assert e2.frontier().count() > 0
    shutil.rmtree(t)
