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


def _plan_leaves(df):
    """Leaf count of the ANALYZED logical plan — a pure integer, immune
    to spark.sql.maxPlanStringLength truncation (which would make string
    lengths look flat even while the tree exploded)."""
    return df._jdf.queryExecution().analyzed().collectLeaves().size()


def test_pipelined_plan_size_flat(spark, fixture_dir):
    """Cross-generation plan-growth regression gate (VERDICT r3 item 6).

    The 687 MB incident: an unbarriered seen_delta chained
    new_rows(k) -> seen_delta(k-1) -> new_rows(k-1) -> ... so batch k's
    analyzed sink plans grew multiplicatively in k (hit at batch ~10 of
    a pipelined soak, fixed in aa29148).  This pins the fix at the plan
    level: across a >=6-batch pipelined run (crossing two compaction
    boundaries), every cross-generation frame handed to batch k+1 must
    be a single-leaf LogicalRDD (the localCheckpoint barrier), and the
    per-batch frames that embed the seen view may grow only LINEARLY
    (one committed append leaf per batch) — never faster.  Removing any
    `_bar` in the live branch of _plan_batch fails the ==1 assertions;
    chaining generations fails the constant-first-difference one.
    """
    from crawlfront.frontier import CrawlEngine as _Eng

    sizes = []

    class Probe(_Eng):
        def _plan_batch(self, man, live=None):
            p = super()._plan_batch(man, live)
            rec = {
                "ex": _plan_leaves(p.ex),
                "sched": _plan_leaves(p.scheduled),
                "persisted": sum(_plan_leaves(df) for df in p.persisted),
            }
            if live is not None:
                # the frame whose missing barrier caused the incident
                rec["prev_delta"] = _plan_leaves(live.seen_delta())
            sizes.append(rec)
            return p

    tmp = tempfile.mkdtemp(prefix="cf_pipe_plansize_")
    eng = Probe(spark, fixture_dir, tmp,
                EngineConfig(pipelined_drain=True, compact_every=3))
    eng.run(6)

    assert len(sizes) == 6
    for rec in sizes:
        assert rec["ex"] == 1, sizes
        assert rec["sched"] == 1, sizes
    for rec in sizes[1:]:
        assert rec["prev_delta"] == 1, sizes
    # seen-view embedders grow by exactly one committed-append leaf per
    # batch per embedding frame: constant first difference, zero second
    # difference.  Multiplicative chaining breaks this immediately.
    diffs = [b["persisted"] - a["persisted"] for a, b in zip(sizes, sizes[1:])]
    assert all(d == diffs[0] for d in diffs), (sizes, diffs)
    shutil.rmtree(tmp)


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


def test_pipelined_storage_bounded_across_generations(spark, fixture_dir):
    """VERDICT r4 item 5: the plan-size test pins LINEAGE growth; this
    pins BLOCK-MANAGER growth.  Across a 10-batch pipelined run crossing
    three compaction boundaries (compact_every=3), the cached/
    localCheckpoint footprint after each flush must track the bounded
    held-frame window (≤ 2 generations + in-flight), NOT the generation
    count, and the final release sweep must return the block manager to
    its pre-run state."""
    t = tempfile.mkdtemp(prefix="cf_pipe_soak_")
    eng = CrawlEngine(spark, fixture_dir, t,
                      EngineConfig(pipelined_drain=True, compact_every=3))
    base = eng.storage_bytes()  # session is shared — measure deltas
    eng.run_pipelined(10)
    tel = eng.storage_telemetry
    assert len(tel) == 10
    # release discipline: the held window never exceeds 2 generations
    # plus the one being planned
    assert all(e["held"] <= 3 for e in tel)
    # storage tracks the window: late generations must not dwarf the
    # steady-state early ones (batch sizes plateau at this sf, so any
    # cross-generation leak shows as monotonic growth here)
    mems = [e["storage_mem_bytes"] + e["storage_disk_bytes"] for e in tel]
    steady = max(mems[2:5])
    assert steady > 0
    assert max(mems[5:]) <= 3 * steady, mems
    # after the final sweep: nothing this run pinned is still cached
    end = eng.storage_bytes()
    assert end["cached_blocks"] <= base["cached_blocks"]
    assert end["storage_mem_bytes"] <= base["storage_mem_bytes"]
    shutil.rmtree(t)
