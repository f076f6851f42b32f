"""The unbounded-drain path (two-pass global index, no top-K cap) must
be semantically identical to the bounded path with drain_k = huge —
same fetch set, same schedule_idx, same counters (SURVEY.md §2 W3
scale path)."""

from __future__ import annotations

from crawlfront.frontier import CrawlEngine, EngineConfig

N = 3


def _run(spark, fixture_dir, tmp_path, name, cfg):
    eng = CrawlEngine(spark, fixture_dir, tmp_path / name, cfg)
    stats = eng.run(N)
    res = sorted(map(tuple, eng.results().collect()))
    frontier = sorted(map(tuple, eng.frontier().collect()))
    return stats, res, frontier


def test_unbounded_equals_bounded_with_huge_k(spark, fixture_dir, tmp_path):
    # drain_k exceeds everything pending at sf0.001 but stays small:
    # TakeOrderedAndProject allocates an O(K) heap PER TASK, so a huge K
    # OOMs the JVM — the exact failure mode unbounded_drain exists to
    # avoid at 10^10 scale.
    bounded = EngineConfig(drain_k=50_000, budget_scale=7)
    unbounded = EngineConfig(unbounded_drain=True, budget_scale=7)
    s1, r1, f1 = _run(spark, fixture_dir, tmp_path, "bounded", bounded)
    s2, r2, f2 = _run(spark, fixture_dir, tmp_path, "unbounded", unbounded)
    assert s1 == s2
    assert r1 == r2
    assert f1 == f2


def test_bucketed_fetch_equals_plain(spark, fixture_dir, tmp_path):
    """J3 against the url-bucketed pages table (the mega-batch scale
    path) fetches exactly what the plain-scan fetch does."""
    plain = EngineConfig(unbounded_drain=True, budget_scale=7)
    bucketed = EngineConfig(unbounded_drain=True, budget_scale=7,
                            bucketed_fetch=True)
    s1, r1, f1 = _run(spark, fixture_dir, tmp_path, "plain", plain)
    s2, r2, f2 = _run(spark, fixture_dir, tmp_path, "bucketed", bucketed)
    assert s1 == s2
    assert r1 == r2
    assert f1 == f2
