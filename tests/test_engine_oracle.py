"""§5.2.1/§5.2.3 — the Spark engine must match the sequential oracle
EXACTLY (fetch set, schedule_idx order, byte-identical text, URL-seen
set, counters), plus the crawl-semantic property invariants."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crawlfront.oracle_sim import robots_allows
from crawlfront.urlnorm import url_path

RES_COLS = ["schedule_idx", "url", "rank", "title", "abstract", "link", "text"]


def test_results_exact_match(engine_run):
    eng, st = engine_run
    got = sorted(tuple(r) for r in eng.results().select(*RES_COLS).collect())
    want = sorted(tuple(r[c] for c in RES_COLS) for r in st.results)
    assert got == want  # includes byte-identical text + exact global order


def test_seen_set_exact_match(engine_run):
    eng, st = engine_run
    got = {r["url_norm"] for r in eng.seen_keys().collect()}
    assert got == st.seen


def test_frontier_states_match(engine_run):
    eng, st = engine_run
    got = {
        (r["url_norm"], r["state"], r["retry_count"]) for r in eng.frontier().collect()
    }
    want = {(r.url_norm, r.state, r.retry_count) for r in st.frontier.values()}
    assert got == want


def test_counters_match(engine_run):
    eng, st = engine_run
    agg = (
        eng.counters()
        .groupBy("batch_id")
        .agg(
            *[
                F.sum(c).alias(c)
                for c in ("fetched", "deduped", "robots_blocked",
                          "politeness_deferred", "failed")
            ]
        )
        .collect()
    )
    got = {
        r["batch_id"]: (r["fetched"], r["deduped"], r["robots_blocked"],
                        r["politeness_deferred"], r["failed"])
        for r in agg
    }
    want = {
        c.batch_id: (c.fetched, c.deduped, c.robots_blocked,
                     c.politeness_deferred, c.failed)
        for c in st.counters
    }
    assert got == want


# --- property invariants (SURVEY.md §5.2.3) --------------------------------


def test_politeness_invariant(engine_run, fixture_dir):
    """∀ host, batch: fetched+scheduled ≤ budget."""
    eng, _ = engine_run
    budgets = {
        r["host"]: r["budget"]
        for r in pq.read_table(f"{fixture_dir}/politeness.parquet").to_pylist()
    }
    default = eng.cfg.default_budget
    sched = (
        eng.results()
        .select("batch_id", "url", "schedule_idx")
        .dropDuplicates(["batch_id", "url"])
        .withColumn("host", F.lower(F.try_parse_url("url", F.lit("HOST"))))
        .groupBy("batch_id", "host")
        .count()
        .collect()
    )
    for r in sched:
        assert r["count"] <= budgets.get(r["host"], default), r


def test_robots_invariant(engine_run, fixture_dir):
    """No fetched URL matches a deny rule."""
    eng, _ = engine_run
    rules = {
        r["host"]: [(x["prefix"], x["allow"]) for x in r["rules"]]
        for r in pq.read_table(f"{fixture_dir}/robots.parquet").to_pylist()
    }
    for r in eng.frontier().filter(F.col("state") == "FETCHED").collect():
        assert robots_allows(rules.get(r["host"]), url_path(r["url_norm"])), r["url"]


def test_dedup_invariant(engine_run):
    """Each url_norm fetched at most once across all batches; frontier has
    no duplicate url_norm rows."""
    eng, _ = engine_run
    fetched = eng.results().select("url").distinct().count()
    fetched_norm = (
        eng.frontier().filter(F.col("state") == "FETCHED").select("url_norm").count()
    )
    assert fetched == fetched_norm
    total = eng.frontier().count()
    distinct = eng.frontier().select("url_norm").distinct().count()
    assert total == distinct


def test_counters_conservation(engine_run):
    """Seen set size == seeds + Σ enqueued; frontier rows == seen rows."""
    eng, st = engine_run
    assert eng.seen_keys().count() == eng.frontier().count() == len(st.seen)


def test_schedule_idx_dense(engine_run):
    """schedule_idx values are dense 0..n-1 across batches (every slot,
    including failed fetches, consumes exactly one index)."""
    eng, _ = engine_run
    man = eng.ckpt.manifest()
    idxs = sorted(
        r["schedule_idx"]
        for r in eng.results().select("url", "schedule_idx").dropDuplicates().collect()
    )
    assert len(idxs) <= man["next_idx"]
    assert all(0 <= i < man["next_idx"] for i in idxs)
