"""§5.2.4 — resume-equivalence: run k batches, drop the engine, resume
from the manifest, run more → all tables identical to an uninterrupted
run ("runs resume exactly", BASELINE.json:6,14).  Also: uncommitted
snapshot dirs from a crash mid-batch are invisible after resume, and
checkpoint GC (expire_snapshots) bounds on-disk history without
changing any table content or the resume point (VERDICT r4 item 2)."""

import shutil
import tempfile
from pathlib import Path

import pytest


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


def _history_dirs(root) -> list[str]:
    """Snapshot/delta dirs of the snapshot tables, e.g. 'frontier/snap-2'."""
    out = []
    for t in ("frontier", "url_seen"):
        td = Path(root) / t
        if td.exists():
            out += [f"{t}/{d.name}" for d in td.iterdir()
                    if d.is_dir() and d.name.split("-")[0] in ("snap", "delta")]
    return sorted(out)


def test_expire_snapshots_bounds_history(spark, fixture_dir):
    """Expiry soak: identical drains with GC off vs on — table content and
    resume behavior byte-equal, while the GC'd checkpoint's snapshot/delta
    dir count PLATEAUS (reachable-from-2-manifests bound) instead of
    growing with batch count, and expired manifests are gone."""
    from crawlfront.frontier import CrawlEngine, EngineConfig

    base = dict(compact_every=3, drain_k=40)
    ta = tempfile.mkdtemp(prefix="cf_expire_off_")
    tb = tempfile.mkdtemp(prefix="cf_expire_on_")
    ea = CrawlEngine(spark, fixture_dir, ta, EngineConfig(**base))
    eb = CrawlEngine(spark, fixture_dir, tb,
                     EngineConfig(**base, expire_keep_last=2))
    ea.run(4)
    eb.run(4)
    dirs_mid = len(_history_dirs(tb))
    ea.run(4)
    eb.run(4)

    # 1. GC is invisible to every reader: all four tables identical
    a, b = _tables(ea), _tables(eb)
    for w in a:
        assert a[w] == b[w], w

    # 2. history bounded: the no-GC tree keeps one dir per batch per
    #    table (16+); the GC'd tree keeps only what the last 2 manifests
    #    reach — a CYCLE-PHASE-INVARIANT bound (base + ≤compact_every
    #    deltas per table per manifest), so holding at batch 4 AND batch
    #    8 is a plateau, not linear growth (dir count oscillates within
    #    the delta/compaction cycle, it never trends up)
    bound = 2 * (2 + base["compact_every"])
    dirs_off, dirs_on = _history_dirs(ta), _history_dirs(tb)
    assert len(dirs_off) >= 16
    assert dirs_mid <= bound
    assert len(dirs_on) <= bound
    assert len(eb.ckpt.manifest_history()) == 2

    # 3. every retained manifest's reachable set survives on disk
    for bid in eb.ckpt.manifest_history():
        m = eb.ckpt.manifest_at(bid)
        for rel in m["tables"].values():
            assert (Path(tb) / rel).exists(), rel
        for t in ("frontier", "url_seen"):
            for db in m.get(f"{t}_deltas", []):
                assert (Path(tb) / t / f"delta-{db}").exists()

    # 4. time travel to an expired batch is an explicit error
    with pytest.raises(FileNotFoundError):
        eb.ckpt.manifest_at(1)

    # 5. resume AFTER expiry: fresh engine from the GC'd checkpoint picks
    #    up at the same batch and produces the same next batch
    eb2 = CrawlEngine(spark, fixture_dir, tb,
                      EngineConfig(**base, expire_keep_last=2))
    assert eb2.ckpt.current_batch() == ea.ckpt.current_batch() == 8
    eb2.init()
    ea.run_batch()
    eb2.run_batch()
    a, b = _tables(ea), _tables(eb2)
    for w in a:
        assert a[w] == b[w], w
    shutil.rmtree(ta)
    shutil.rmtree(tb)


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
