"""Pipelined (double-buffered) drain — VERDICT r2 item 2.

The pipelined loop overlaps batch k's sink flush with batch k+1's
plan/map phase, binding k+1 to k's in-memory next-state views.  These
tests pin the invariants that make that safe: row-for-row equivalence
with the sequential engine (including across compaction boundaries),
strict manifest ordering, and cross-mode resume interchangeability.
"""

import shutil
import tempfile

from crawlfront.frontier import CrawlEngine, EngineConfig


def _tables(eng):
    return {
        w: sorted(tuple(r) for r in getattr(eng, w)().collect())
        for w in ("results", "frontier", "seen_keys", "counters")
    }


def test_pipelined_equals_sequential(spark, fixture_dir):
    ta = tempfile.mkdtemp(prefix="cf_pipe_a_")
    tb = tempfile.mkdtemp(prefix="cf_pipe_b_")
    # compact_every=3 so the 4-batch run crosses a compaction boundary
    # INSIDE the pipeline (the compacting batch's snapshot write races the
    # next batch's plan — the hardest interleaving)
    seq = CrawlEngine(spark, fixture_dir, ta, EngineConfig(compact_every=3))
    seq.run(4)
    pipe = CrawlEngine(
        spark, fixture_dir, tb, EngineConfig(compact_every=3, pipelined_drain=True)
    )
    aggs = pipe.run(4)

    a, b = _tables(seq), _tables(pipe)
    for w in a:
        assert a[w] == b[w], w
    assert [g["batch_id"] for g in aggs] == [1, 2, 3, 4]
    ma, mb = seq.ckpt.manifest(), pipe.ckpt.manifest()
    for key in ("batch_id", "next_idx", "seen_batches",
                "frontier_deltas", "url_seen_deltas", "tables", "batches"):
        assert ma[key] == mb[key], key
    shutil.rmtree(ta)
    shutil.rmtree(tb)


def test_pipelined_bucketed_state_combo(spark, fixture_dir):
    """The two round-3 engine features compose: a pipelined drain over
    bucketed frontier state (catalog-table writes racing the next
    batch's plan) lands on exactly the sequential default engine's
    tables, across a compaction boundary."""
    ta = tempfile.mkdtemp(prefix="cf_pipe_bkt_a_")
    tb = tempfile.mkdtemp(prefix="cf_pipe_bkt_b_")
    seq = CrawlEngine(spark, fixture_dir, ta, EngineConfig(compact_every=3))
    seq.run(4)
    combo = CrawlEngine(
        spark, fixture_dir, tb,
        EngineConfig(compact_every=3, pipelined_drain=True, bucketed_state=True),
    )
    combo.run(4)
    a, b = _tables(seq), _tables(combo)
    for w in a:
        assert a[w] == b[w], w
    shutil.rmtree(ta)
    shutil.rmtree(tb)


def test_pipelined_resume_interop(spark, fixture_dir):
    """A checkpoint written by the pipelined loop is a normal checkpoint:
    the sequential engine resumes from it (and vice versa) and lands on
    the exact same tables as an uninterrupted sequential run."""
    ta = tempfile.mkdtemp(prefix="cf_pipe_c_")
    tb = tempfile.mkdtemp(prefix="cf_pipe_d_")
    seq = CrawlEngine(spark, fixture_dir, ta)
    seq.run(4)

    pipe = CrawlEngine(spark, fixture_dir, tb, EngineConfig(pipelined_drain=True))
    pipe.run(2)
    del pipe  # "crash" between pipelined batches
    cont = CrawlEngine(spark, fixture_dir, tb)  # plain sequential resume
    assert cont.ckpt.current_batch() == 2
    cont.run_batch()
    # and finish with one more PIPELINED batch on the same checkpoint
    cont.cfg.pipelined_drain = True
    cont.run(1)

    a, b = _tables(seq), _tables(cont)
    for w in a:
        assert a[w] == b[w], w
    shutil.rmtree(ta)
    shutil.rmtree(tb)
