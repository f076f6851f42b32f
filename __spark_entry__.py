"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl query (batch-1 schedule → fetch
→ extract) on sf0.001.  ``queries()`` exposes one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline ops;
``oracle_sql()`` gives the DuckDB twin for every SQL-expressible one.

Crawl-specific tables (pages/seeds/robots/politeness) are deterministic
synthetic fixtures (FIXTURES.md §B, seed 42) generated under
/root/repo/fixtures/sf{sf}; the oracle SQL reads them via read_parquet()
at the sf0.01 path (the driver's oracle scale).  Driver tables (region …
embeddings) are read from the given sf_dir / the pre-registered views.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawlfront import analytics
from crawlfront.fixtures import fixture_dir_for_sf, generate_media_fixtures, sf_of_dir
from crawlfront.frontier import (
    EngineConfig,
    fetch_and_extract,
    frontier_from_seeds,
    gate_and_schedule,
    results_from_extract,
    scan_pages,
    scan_politeness,
    scan_robots,
    scan_seeds,
)
from crawlfront import ops
from crawlfront.ops import hash32_of, hash64_of, host_of, partition_key, path_of, robots_allow
from crawlfront.sqlhash import murmur3_ctes, pmod_sql, xxhash64_ctes

# the oracle runs at sf0.01 — fixture paths are baked into the SQL strings
_FX = str(Path(__file__).resolve().parent / "fixtures" / "sf0.01")

# PII-scrub regex patterns — the subset Java (Spark) and RE2 (DuckDB)
# parse identically; keep in sync with analytics.pii_scrub
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}"
_PII_URL = 'https?://[^"<> ]+'
# query-surface config: a 5k drain cap keeps W3 on the cheap bounded
# window (identical results — eligible sets at contract/bench scales are
# far below any cap; the >10k global_index routing and unbounded_drain
# remain the engine's scale paths, covered by test_unbounded_drain)
_CFG = EngineConfig(drain_k=5_000)

# a4 twin sizing constants (config-derived, data-independent)
from crawlfront.bloom import bloom_params as _bloom_params  # noqa: E402

_A4_NBITS, _A4_NHASHES = _bloom_params(_CFG.shard_capacity, _CFG.bloom_fpp)

# DuckDB twins of the URL helpers (regex on the synthetic URLs, which are
# already canonical — an independent computation path from F.parse_url)
_HOST_SQL = "regexp_extract(url, '^https?://([^/]+)', 1)"
_PATH_SQL = "coalesce(nullif(regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1), ''), '/')"


def _fx(sf_dir: str) -> str:
    """Map the driver's sf dir to our crawl fixture dir (generating it
    deterministically if absent)."""
    return str(fixture_dir_for_sf(sf_of_dir(sf_dir)))


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch-1 fetch decisions in reference order + extraction,
    on sf0.001 (SURVEY.md §7.1 M1 pipeline: S2→P1→X1/X2→J1/P5→J2→W1→W2→
    O1→W3→J3→D3→O2)."""
    fx = str(fixture_dir_for_sf(0.001))
    pending = frontier_from_seeds(scan_seeds(spark, fx), _CFG)
    scheduled, _, _, _ = gate_and_schedule(
        pending, scan_robots(spark, fx), scan_politeness(spark, fx), _CFG
    )
    ex = fetch_and_extract(scheduled, scan_pages(spark, fx))
    return results_from_extract(ex, batch_id=1).orderBy("schedule_idx", "rank")


# --------------------------------------------------------------------------
# crawl-operator queries (fixtures)
# --------------------------------------------------------------------------


def _q_scan_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scan_pages(spark, _fx(sf_dir))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )


def _q_extract_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_pages(spark, _fx(sf_dir)).select("url", host_of("url").alias("host"))


def _q_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_pages(spark, _fx(sf_dir)).filter(F.col("lang") == "zh").select("url", "lang")


def _q_valid_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scan_pages(spark, _fx(sf_dir))
        .filter(F.col("html").isNotNull() & (F.length("html") < 1_000_000))
        .select("url", F.length("html").cast("long").alias("n_bytes"))
    )


def _q_robots_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fx(sf_dir)
    pages = scan_pages(spark, fx).select(
        "url", host_of("url").alias("host"), path_of("url").alias("path")
    )
    robots = scan_robots(spark, fx).select("host", "rules")
    return (
        pages.join(F.broadcast(robots), "host", "left")
        .select("url", robots_allow(F.col("path"), F.col("rules")).alias("allow"))
    )


def _q_gate_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fx(sf_dir)
    seeds = scan_seeds(spark, fx).select("url", host_of("url").alias("host"),
                                         path_of("url").alias("path"))
    robots = scan_robots(spark, fx)
    return seeds.join(F.broadcast(robots), "host", "left").select(
        "url",
        F.col("crawl_delay_ms").cast("long").alias("crawl_delay_ms"),
        robots_allow(F.col("path"), F.col("rules")).alias("allow"),
    )


def _q_gate_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fx(sf_dir)
    hosts = scan_pages(spark, fx).select(host_of("url").alias("host")).distinct()
    pol = scan_politeness(spark, fx)
    return hosts.join(F.broadcast(pol), "host", "left").select(
        "host", F.coalesce(F.col("budget"), F.lit(_CFG.default_budget)).cast("int").alias("budget")
    )


def _q_fetch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fx(sf_dir)
    return (
        scan_seeds(spark, fx)
        .join(scan_pages(spark, fx), "url")
        .select("url", F.length("html").cast("long").alias("n_bytes"), "lang")
    )


def _schedule_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fx(sf_dir)
    pending = frontier_from_seeds(scan_seeds(spark, fx), _CFG)
    scheduled, _, _, _ = gate_and_schedule(
        pending, scan_robots(spark, fx), scan_politeness(spark, fx), _CFG
    )
    return scheduled


def _q_schedule_batch1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _schedule_df(spark, sf_dir).select(
        "url", "host", F.col("host_rank").cast("int").alias("host_rank"),
        F.col("schedule_idx").cast("long").alias("schedule_idx"),
    )


def _q_pace_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fx(sf_dir)
    sched = _schedule_df(spark, sf_dir)
    robots = scan_robots(spark, fx).select("host", "crawl_delay_ms")
    batch_start_ms = 1_767_225_600_000  # 2026-01-01T00:00:00Z, fixed epoch
    return (
        sched.join(F.broadcast(robots), "host", "left")
        .select(
            "url",
            (
                F.lit(batch_start_ms)
                + (F.col("host_rank") - 1) * F.coalesce(F.col("crawl_delay_ms"), F.lit(0))
            ).cast("long").alias("planned_epoch_ms"),
        )
    )


def _q_drain_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _schedule_df(spark, sf_dir)
        .orderBy("schedule_idx")
        .limit(20)
        .select("url", F.col("schedule_idx").cast("long").alias("schedule_idx"))
    )


def _q_enforce_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — the politeness-eligible set with per-host ranks/budgets."""
    fx = _fx(sf_dir)
    pending = frontier_from_seeds(scan_seeds(spark, fx), _CFG)
    _, _, _, eligible = gate_and_schedule(
        pending, scan_robots(spark, fx), scan_politeness(spark, fx), _CFG
    )
    return eligible.select(
        "url", "host",
        F.col("host_rank").cast("int").alias("host_rank"),
        F.col("budget").cast("int").alias("budget"),
    )


def _q_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/D1 — canonicalizer over the (already-canonical) fixture URLs:
    the oracle twin asserts identity, so any normalization drift in the
    UDF shows up as a value mismatch."""
    from crawlfront.ops import udf_canonicalize

    return scan_seeds(spark, _fx(sf_dir)).select(
        "url", udf_canonicalize("url").alias("url_norm")
    )


def _q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — distinct union of two key sets (engine analog:
    frontier_union of current + discovered)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.unionByName(o).distinct()


def _q_discover_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/U1 — batch-1 discovery: outlinks of fetched pages, canonical,
    deduped, not already in the frontier.  The DuckDB twin re-derives the
    whole leg independently: regexp href extraction vs the HTMLParser
    UDF, percent-escape replace chain vs urllib redirect decode, and the
    param-sort canonical form vs canonicalize_url."""
    from crawlfront.frontier import discover_candidates

    fx = _fx(sf_dir)
    pending = frontier_from_seeds(scan_seeds(spark, fx), _CFG)
    scheduled, _, _, _ = gate_and_schedule(
        pending, scan_robots(spark, fx), scan_politeness(spark, fx), _CFG
    )
    ex = fetch_and_extract(scheduled, scan_pages(spark, fx))
    cand = discover_candidates(ex, _CFG, batch_id=1)
    fresh = cand.join(pending.select("url_norm"), "url_norm", "left_anti")
    return fresh.select("url_norm", "host", "depth", "priority").orderBy("url_norm")


def _q_url_trap_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — crawler-trap detection features per URL: calendar/session
    traps pollute a frontier with unbounded synthetic URLs, so the
    gate needs a cheap per-URL structural score BEFORE scheduling.
    Features: path depth, adjacent-repeated path segment (the /a/a/a/
    loop signature), query-param count; is_trap flags any of repeated
    segment, depth > 8, or > 5 params.  All codegen string/array ops —
    scales as a pure map over the frontier, no shuffle."""
    return ops.url_trap_features(scan_pages(spark, _fx(sf_dir)).select("url"))


def _discovered_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src host, canonical target url_norm) — one row per discovered
    outlink occurrence of the batch-1 fetch; shared by g1_host_pagerank
    and g2_anchor_stats (the DuckDB twins share the matching
    linkgraph CTE prefix)."""
    fx = _fx(sf_dir)
    pending = frontier_from_seeds(scan_seeds(spark, fx), _CFG)
    scheduled, _, _, _ = gate_and_schedule(
        pending, scan_robots(spark, fx), scan_politeness(spark, fx), _CFG
    )
    ex = fetch_and_extract(scheduled, scan_pages(spark, fx))
    return (
        ex.filter(F.col("hit"))
        .select(F.col("host").alias("src"), F.explode("ex.links").alias("link"))
        .withColumn("url_norm", ops.udf_canonicalize("link"))
        .filter(ops.is_http(F.col("url_norm")))
        .select("src", "url_norm")
    )


def _q_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — per-target in-link statistics over the discovered link
    graph: in-link count, distinct referring hosts, and the
    deterministic first referrer — the link-authority feature a crawl
    prioritizer feeds beside PageRank.  One hash-groupBy on the target
    key (map-side combinable counts; distinct hosts via a two-level agg
    that never collects a set driver-side)."""
    links = _discovered_links(spark, sf_dir)
    per_src = links.groupBy("url_norm", "src").agg(
        F.count("*").alias("n_from_src")
    )
    return per_src.groupBy("url_norm").agg(
        F.sum("n_from_src").cast("long").alias("n_inlinks"),
        F.count("*").cast("long").alias("n_src_hosts"),
        F.min("src").alias("first_src"),
    )


def _q_host_pagerank(spark: SparkSession, sf_dir: str, iters: int = 3) -> DataFrame:
    """G1 — PageRank-style host authority over the discovered link
    graph (src host → link host), the crawl-prioritization signal.

    Iterative algorithms normally can't have exact cross-engine twins
    because each iteration SUMS floating-point contributions in
    nondeterministic accumulation order.  This one does: ranks are
    INTEGER micro-units (start 1,000,000 per host), each iteration is
    r'(v) = 150000 + Σ_incoming (r(u)·85 div 100) div outdeg(u) — all
    int64 ops, exact and order-free, so 3 unrolled iterations are
    bit-identical in Spark and DuckDB.  Dangling hosts leak mass
    (documented PageRank variant); damping 0.85 as 85/100.

    At corpus scale: edges shuffle once per iteration on dst (partial
    int sums combine map-side); the iteration count is FIXED (unrolled
    in the one declarative plan), not a driver loop with actions."""
    links = _discovered_links(spark, sf_dir)
    edges = links.select("src", ops.host_of("url_norm").alias("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e2 = edges.join(deg, "src")
    ranks = nodes.select("host", F.lit(1000000).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            e2.join(ranks.withColumnRenamed("host", "src"), "src")
            .select("dst", F.expr("((r * 85) div 100) div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.host == contrib.dst, "left")
            .select(
                "host",
                (F.lit(150000) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select("host", F.col("r").alias("authority"))


#: unroll depth of the converged-PageRank DuckDB twin — safely past the
#: measured fixed point on the sf0.01 link graph (15 iterations, 80
#: hosts; extra rounds are provable no-ops because the integer
#: recurrence is already stationary).  test_pagerank_twin_unroll_margin
#: pins engine iterations + margin ≤ this, so fixture drift that slows
#: convergence fails loudly instead of silently diverging from the twin.
PR_TWIN_UNROLL = 24


def _q_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-converged (VERDICT r3 item 4) — the same integer link-graph
    PageRank as g1_host_pagerank, but iterated by the engine-side
    fixed-point loop (``analytics.pagerank_fixed_point``: semi-naive,
    plan-barriered, stop on zero changed ranks) instead of 3 unrolled
    rounds.  Because the recurrence is all-int64 and stationary at the
    fixed point, a DuckDB twin unrolled PAST convergence
    (``PR_TWIN_UNROLL`` rounds) is value-exact — the driver value-hashes
    the loop, not just pytest."""
    links = _discovered_links(spark, sf_dir)
    edges = links.select("src", ops.host_of("url_norm").alias("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks, _ = analytics.pagerank_fixed_point(nodes, edges.join(deg, "src"))
    return ranks.select("host", F.col("r").alias("authority"))


def _q_bloom_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/D4 — bloom build over the seed frontier; per-shard stats.
    Oracle twin recomputes the murmur3 shard assignment in DuckDB SQL
    (crawlfront/sqlhash.py)."""
    from crawlfront import bloom

    fx = _fx(sf_dir)
    f0 = frontier_from_seeds(scan_seeds(spark, fx), _CFG)
    n_bits, n_hashes = bloom.bloom_params(_CFG.shard_capacity, _CFG.bloom_fpp)
    shards = bloom.update_shards(
        bloom.empty_shards(spark, _CFG.n_shards, n_bits, n_hashes),
        f0.select("url_hash32", "url_hash64"),
        _CFG.n_shards, n_bits, n_hashes, batch_id=0,
    )
    return shards.select("shard", "n_items", "n_bits", "n_hashes").orderBy("shard")


def _q_drain_2batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2 — two checkpointed micro-batches end-to-end; returns the
    per-batch counter totals (deterministic at any parallelism).  The
    oracle twin rederives both batches as one SQL statement (gate →
    budget-rank → fetch → discover → dedup, chained)."""
    import tempfile

    from crawlfront.frontier import CrawlEngine

    eng = CrawlEngine(spark, _fx(sf_dir), tempfile.mkdtemp(prefix="drain_q_"), _CFG)
    eng.run(2)
    return (
        eng.counters()
        .groupBy("batch_id")
        .agg(
            *[
                F.sum(c).alias(c)
                for c in ("fetched", "deduped", "robots_blocked",
                          "politeness_deferred", "failed")
            ]
        )
        .orderBy("batch_id")
    )


def _q_drain_2batches_pipelined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-pipelined — the SAME two checkpointed micro-batches through
    the double-buffered drain (EngineConfig.pipelined_drain: batch 2
    plans against batch 1's in-memory next-state views while batch 1's
    sinks flush).  Shares t1_t2_drain_2batches' chained-SQL oracle twin
    verbatim: the pipelined engine must be value-hash-identical to the
    sequential one, so the overlap path is driver-verified every round,
    not just pytest-pinned."""
    import dataclasses
    import tempfile

    from crawlfront.frontier import CrawlEngine

    cfg = dataclasses.replace(_CFG, pipelined_drain=True)
    eng = CrawlEngine(spark, _fx(sf_dir), tempfile.mkdtemp(prefix="drain_qp_"), cfg)
    eng.run(2)
    return (
        eng.counters()
        .groupBy("batch_id")
        .agg(
            *[
                F.sum(c).alias(c)
                for c in ("fetched", "deduped", "robots_blocked",
                          "politeness_deferred", "failed")
            ]
        )
        .orderBy("batch_id")
    )


def _q_refresh_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 entry point (2) — recompute politeness from frontier
    pressure: hot hosts get the reduced budget unless explicitly set."""
    from crawlfront.frontier import refresh_gates

    fx = _fx(sf_dir)
    pending = frontier_from_seeds(scan_seeds(spark, fx), _CFG)
    new_pol, _ = refresh_gates(pending, scan_politeness(spark, fx), _CFG,
                               n_hot=10, hot_budget=2)
    return new_pol


def _q_topk_hot_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scan_pages(spark, _fx(sf_dir))
        .groupBy(host_of("url").alias("host"))
        .agg(F.count("*").alias("n_pages"))
        .orderBy(F.desc("n_pages"), F.asc("host"))
        .limit(10)
    )


def _q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scan_pages(spark, _fx(sf_dir))
        .groupBy(host_of("url").alias("host"))
        .agg(F.count("*").alias("n_pages"))
    )


def _q_rollup_host_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — hierarchy aggregate: (host, lang) rollup over pages (per-host
    per-lang, per-host subtotal, grand total in one pass)."""
    return (
        scan_pages(spark, _fx(sf_dir))
        .withColumn("host", host_of("url"))
        .rollup("host", "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"),
             F.sum(F.length("text")).alias("total_chars"))
    )


#: J7 tier bounds: [lo, hi] page-count bands (inclusive); the top band is
#: open-ended via a large sentinel
_TIERS = [(0, 9, "t0_small"), (10, 99, "t1_medium"),
          (100, 999, "t2_large"), (1000, 1 << 40, "t3_huge")]


def _q_theta_host_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — theta (range) join: classify every host's page count into a
    size tier via an inequality join against a tiny bounds table
    (BroadcastNestedLoopJoin — the broadcast side is 4 rows, so the scan
    side streams with no shuffle at any corpus size)."""
    stats = (
        scan_pages(spark, _fx(sf_dir))
        .groupBy(host_of("url").alias("host"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    tiers = spark.createDataFrame(_TIERS, "lo long, hi long, tier string")
    return stats.join(
        F.broadcast(tiers),
        (stats["n_pages"] >= tiers["lo"]) & (stats["n_pages"] <= tiers["hi"]),
    ).select("host", "n_pages", "tier")


def _q_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_pages(spark, _fx(sf_dir)).agg(
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct(host_of("url")).alias("n_hosts"),
    )


def _q_hash_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2/X3 — murmur3/xxhash64/partition keys.  The oracle twin
    recomputes Spark's exact murmur3-32 AND xxhash64 inside DuckDB
    (recursive-CTE reimplementation, crawlfront/sqlhash.py); exactness of
    the Python twin vs Spark is separately pinned in tests/test_hashing.py."""
    pages = scan_pages(spark, _fx(sf_dir)).select("url")
    df = pages.withColumn("host", host_of("url")).select(
        "url",
        hash32_of("url").alias("url_hash32"),
        hash64_of("url").alias("url_hash64"),
        hash32_of(F.col("host")).alias("host_hash"),
    )
    return df.withColumn(
        "pk", partition_key("host_hash", F.pmod(F.col("url_hash64"), F.lit(8)).cast("int"), 32)
    )


def _q_extract_text_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — the byte-identical-text contract (BASELINE.json:15): run the
    extraction UDF over every page and compare to the stored text column.
    The oracle side asserts the fixture guarantee (text was generated by
    this same pure function), so any UDF/plumbing drift shows up as a
    value mismatch."""
    from crawlfront.ops import udf_extract

    pages = scan_pages(spark, _fx(sf_dir))
    ex = pages.withColumn("ex", udf_extract("html", "url"))
    return ex.agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("ex.text") == F.col("text"), 1).otherwise(0)).alias("n_text_match"),
    )


def _q_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scan_pages(spark, _fx(sf_dir))
        .groupBy(F.date_trunc("DAY", "warc_ts").alias("day"))
        .agg(F.count("*").alias("n_pages"))
    )


def _q_throughput_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 — tumbling event-time windows via ``F.window`` (the SURVEY §2
    cat.9 promise): per-6h-window crawl throughput (pages + bytes) over
    the pages table.  Epoch-aligned windows ⇒ DuckDB ``time_bucket`` is
    the exact twin (both bucket from an origin divisible by 6h)."""
    return (
        scan_pages(spark, _fx(sf_dir))
        .groupBy(F.window("warc_ts", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).cast("long").alias("total_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_pages",
            "total_bytes",
        )
    )


def _q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (sliding) — overlapping event-time windows via
    ``F.window(ts, size, slide)``: 12h windows sliding every 6h, so every
    page lands in exactly two windows.  Spark aligns window starts to
    epoch multiples of the slide; the DuckDB twin re-derives both
    memberships with ``time_bucket(6h) - {0,1}*6h``."""
    return (
        scan_pages(spark, _fx(sf_dir))
        .groupBy(F.window("warc_ts", "12 hours", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_pages",
        )
    )


def _q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (session) — per-host crawl sessions via ``F.session_window``
    (30-min inactivity gap): batch-mode gap-based windowing, the same
    operator Structured Streaming uses for stateful session aggregation.
    Twin: classic gaps-and-islands (lag → break flag → running sum)."""
    return (
        scan_pages(spark, _fx(sf_dir))
        .select(host_of("url").alias("host"), "warc_ts")
        .groupBy("host", F.session_window("warc_ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            "host",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_pages",
        )
    )


def _q_udtf_url_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — Python UDTF surface (site-tree depth profile): a lateral
    table function explodes each URL's path into (seg_idx, segment) rows,
    then a plain aggregation profiles the site tree by depth.  UDTFs are
    NOT a hot-path tool here (SURVEY.md §2 cat.10 — everything hot stays
    in codegen/Arrow); this exercises the registration + LATERAL join
    surface on a bounded result.  Twin: DuckDB unnest(string_split)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_idx: int, segment: string")
    class UrlSegments:
        def eval(self, url: str):  # noqa: ANN001
            path = url.split("://", 1)[1].split("?", 1)[0]
            for i, seg in enumerate(path.split("/")[1:], start=1):
                yield i, seg

    spark.udtf.register("url_segments", UrlSegments)
    scan_pages(spark, _fx(sf_dir)).createOrReplaceTempView("_d7_pages")
    return spark.sql(
        """SELECT s.seg_idx AS depth,
                  count(*) AS n_pages,
                  count(DISTINCT s.segment) AS n_unique_segments
           FROM _d7_pages p, LATERAL url_segments(p.url) s
           GROUP BY 1"""
    )


def _q_udaf_host_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — grouped-aggregate pandas UDAF (Arrow-batched, one call per
    group partition — never per row): per-host median extracted-text
    length.  Median is exact in float64 for integer inputs (middle value
    or the mean of the two middle values), so the DuckDB ``median``
    (= quantile_cont 0.5) twin matches bit-for-bit."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_chars(s: pd.Series) -> float:
        return float(np.median(s.to_numpy(dtype="float64")))

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates
    # in one agg() — so the row count is a pandas aggregate too
    @pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        return len(s)

    return (
        scan_pages(spark, _fx(sf_dir))
        .select(host_of("url").alias("host"), F.length("text").alias("n_chars"))
        .groupBy("host")
        .agg(
            n_rows("n_chars").alias("n_pages"),
            median_chars("n_chars").alias("median_chars"),
        )
    )


# --------------------------------------------------------------------------
# driver-table queries (events / TPC-H-ish / embeddings)
# --------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))


def _q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


def _q_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("last_ts"), F.col("event_type").alias("last_type"))
    )


def _q_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("int").alias("seq"),
        F.round(F.sum("value").over(w), 3).alias("running_value"),
    )


def _q_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a region filter — the
    canonical mixed broadcast/shuffle multi-join.  The two tiny dims
    (nation, region) broadcast; customer/orders/lineitem/supplier join
    on their keys with the fact-side equi-condition c_nationkey =
    s_nationkey ('local' suppliers).  Catalyst orders the joins; AQE
    re-plans the post-filter sides at runtime."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join (the having-subquery
    pattern) — lineitem pre-aggregates to order totals (map-side
    combinable), the big-order slice joins orders + broadcast customer,
    top-100 by total quantity with a total tie-break so the limit cut
    is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 140)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def _q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def _q_array_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            4,
        ).alias("l2_norm"),
    )


def _q_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/export — the reference-parity CSV sink, driver-value-hashed
    (VERDICT r4 item 4): build a deterministic results-shaped frame from
    ``documents`` with the CSV torture cases baked in (embedded quote/
    comma/newline, backslashes, the literal NULL-sentinel string '\\N',
    real NULLs), push it through export_results → deterministic CSV
    shards → read_export, and return the read-back rows.  The DuckDB
    twin computes the same frame DIRECTLY (no files), so a value-hash
    match proves the on-disk round-trip is lossless — including the
    backslash-doubling that keeps real '\\N' data distinct from NULL."""
    import tempfile

    from crawlfront.export import export_results, read_export

    docs = _t(spark, sf_dir, "documents")
    res = docs.select(
        F.col("doc_id").alias("schedule_idx"),
        (F.col("doc_id") % 3 + 1).cast("long").alias("batch_id"),
        F.concat(F.lit("http://ex.org/d/"), F.col("doc_id")).alias("url"),
        (F.col("doc_id") % 10).cast("int").alias("rank"),
        F.when(F.col("doc_id") % 11 == 0, F.lit("\\N"))
        .when(F.col("doc_id") % 11 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(F.substring("text", 1, 20),
                            F.lit('"x,\n'), F.lit("\\y")))
        .alias("title"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.substring("text", 5, 30)).alias("abstract"),
        F.concat(F.lit("http://t/"), F.col("lang")).alias("link"),
    )
    out = tempfile.mkdtemp(prefix="cf_export_rt_q_")
    export_results(res, out, fmt="csv", rows_per_file=100)
    return read_export(spark, out)


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # crawl operators (SURVEY.md §2, crawl fixtures)
        "s1_scan_pages": _q_scan_pages,
        "p2_extract_host": _q_extract_host,
        "p3_lang_filter": _q_lang_filter,
        "p6_valid_page": _q_valid_page,
        "p5_robots_match": _q_robots_match,
        "j1_gate_robots": _q_gate_robots,
        "j2_gate_politeness": _q_gate_politeness,
        "j3_fetch_join": _q_fetch_join,
        "w1_w3_schedule_batch1": _q_schedule_batch1,
        "w2_enforce_budget": _q_enforce_budget,
        "w5_pace_schedule": _q_pace_schedule,
        "p1_canonicalize": _q_canonicalize,
        "u1_union_distinct": _q_union_distinct,
        "j5_discover_links": _q_discover_links,
        "g1_host_pagerank": _q_host_pagerank,
        "g1b_pagerank_converged": _q_pagerank_converged,
        "g2_anchor_stats": _q_anchor_stats,
        "p7_url_trap_score": _q_url_trap_score,
        "a4_bloom_shard_stats": _q_bloom_shard_stats,
        "t1_t2_drain_2batches": _q_drain_2batches,
        "t1p_drain_2batches_pipelined": _q_drain_2batches_pipelined,
        "o1_drain_limit": _q_drain_limit,
        "refresh_gates": _q_refresh_gates,
        "o3_topk_hot_hosts": _q_topk_hot_hosts,
        "a1_host_stats": _q_host_stats,
        "a6_rollup_host_lang": _q_rollup_host_lang,
        "j7_theta_host_tiers": _q_theta_host_tiers,
        "a3_cardinality": _q_cardinality,
        "x1_x3_hash_partition": _q_hash_partition,
        "d3_extract_text_invariant": _q_extract_text_invariant,
        "x6_time_buckets": _q_time_buckets,
        "t4_throughput_windows": _q_throughput_windows,
        "t4b_sliding_windows": _q_sliding_windows,
        "t4c_session_windows": _q_session_windows,
        "d7_udtf_url_segments": _q_udtf_url_segments,
        "d8_udaf_host_median": _q_udaf_host_median,
        # driver tables: json/window/joins/aggs/set ops/arrays
        "x9_json_props": _q_json_props,
        "j6_asof_latest": _q_asof_latest,
        "w4_running_window": _q_running_window,
        "q1_pricing_summary": _q_q1_pricing,
        "q3_top_orders": _q_q3_top_orders,
        "q5_local_volume": _q_q5_local_volume,
        "q18_large_orders": _q_q18_large_orders,
        "u2_anti_join": _q_anti_join,
        "u3_semi_join": _q_semi_join,
        "x8_array_norm": _q_array_norm,
        # training-data pipeline (documents/embeddings)
        "dedup_exact": analytics.dedup_exact,
        "dedup_minhash_lsh": analytics.dedup_minhash_lsh,
        "dedup_clusters": analytics.dedup_clusters,
        # the engine-side fixed-point loop; at the contract sf cluster
        # diameters are within the unroll depth, so the 3-round twin is
        # its exact oracle (VERDICT r3 item 4) — the loop itself is
        # additionally pinned against union-find on a diameter-6 chain
        "dedup_clusters_converged": analytics.dedup_clusters_converged,
        "dedup_simhash": analytics.dedup_simhash,
        "dedup_ngram_jaccard": analytics.dedup_ngram_jaccard,
        "dedup_embedding": analytics.dedup_embedding,
        "simhash_fingerprints": analytics.simhash_docs,
        "winnow_fingerprints": analytics.winnow_fingerprints,
        "ann_cosine_topk": analytics.ann_cosine_topk,
        "ann_ivf_topk": analytics.ann_ivf_topk,
        # int8 scalar-quantized scoring kernel (the IVF coarse tier at
        # corpus scale) — integer dot is exact, so it value-hashes
        "ann_quant_topk": analytics.ann_quant_topk,
        "lang_id": analytics.lang_id,
        "quality_score": analytics.quality_score,
        "token_count": analytics.token_count,
        "doc_fingerprint": analytics.doc_fingerprint,
        "decontaminate": analytics.decontaminate,
        # media fixture (real PNG/GIF/JPEG headers, seed 43) — decoded
        # dimensions are re-derived independently by the DuckDB twin's
        # hex()-walk, so decode correctness is value-hash-checked
        "multimodal_meta": lambda spark, sf_dir: analytics.multimodal_meta(
            spark,
            spark.read.parquet(str(generate_media_fixtures(sf_of_dir(sf_dir)))),
        ),
        "pipeline_clean_corpus": analytics.pipeline_clean_corpus,
        "bm25_topk": analytics.bm25_topk,
        "split_assign": analytics.split_assign,
        "repetition_score": analytics.repetition_score,
        "paragraph_dedup": analytics.paragraph_dedup,
        "pii_scrub": lambda spark, sf_dir: analytics.pii_scrub(
            spark, scan_pages(spark, _fx(sf_dir))
        ),
        # reference-parity deliverable files (crawlfront/export.py): the
        # twin computes the same rows without touching disk, so the hash
        # match IS the lossless-round-trip proof
        "export_roundtrip": _q_export_roundtrip,
    }


def _pagerank_sql(linkgraph_sql: str, depth: int) -> str:
    """DuckDB twin of the integer host-PageRank recurrence, unrolled to
    ``depth`` rounds over the shared link-graph CTEs.  One generator for
    both g1 (fixed 3 rounds, matching the unrolled Spark plan) and
    g1b (``PR_TWIN_UNROLL`` ≥ fixed-point rounds, matching the engine's
    converge-until-stable loop — valid because the all-int64 recurrence
    is stationary at its fixed point, so extra rounds are no-ops)."""
    rounds = "".join(
        f""",
          r{i} AS MATERIALIZED (SELECT n.host,
                   (150000 + coalesce(sum(((x.r * 85) // 100) // x.outdeg), 0))::bigint AS r
                 FROM nodes n LEFT JOIN (
                   SELECT e.dst, r{i - 1}.r, d.outdeg FROM edges e
                   JOIN r{i - 1} ON e.src = r{i - 1}.host JOIN deg d ON e.src = d.src) x
                 ON n.host = x.dst GROUP BY 1)"""
        for i in range(1, depth + 1)
    )
    # AS MATERIALIZED: DuckDB's default is to INLINE single-reference
    # CTEs — a depth-d unrolled chain then re-expands the whole
    # regexp-heavy linkgraph derivation at EVERY round (observed: the
    # depth-24 twin ran for 30+ minutes inlined, <10 s materialized).
    # Forcing materialization evaluates each round — and the shared
    # graph CTEs — exactly once, like the engine does.
    return (
        linkgraph_sql
        + """
          , edges AS MATERIALIZED (
              SELECT DISTINCT src,
                     regexp_extract(url_norm, '^https?://([^/]+)', 1) AS dst
              FROM canon
              WHERE starts_with(url_norm, 'http://') OR starts_with(url_norm, 'https://')),
          nodes AS MATERIALIZED (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
          deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
          r0 AS MATERIALIZED (SELECT host, 1000000::bigint AS r FROM nodes)"""
        + rounds
        + f"""
          SELECT host, r AS authority FROM r{depth}"""
    )


def _phash_sql(expr: str) -> str:
    """DuckDB twin of analytics.portable_hash64: first 15 hex chars of
    md5 as a (non-negative) int64."""
    return f"('0x' || substr(md5({expr}), 1, 15))::bigint"


def _canon_sql(expr: str) -> str:
    """DuckDB twin of canonicalize_url for the synthetic corpus: fixture
    URLs are already canonical except for query-param order, so the twin
    is an independent param re-sort (the canonicalizer sorts params by
    (key, value); values here are alphanumeric, no escapes)."""
    return f"""CASE WHEN contains({expr}, '?')
               THEN split_part({expr}, '?', 1) || '?' ||
                    array_to_string(list_sort(string_split(split_part({expr}, '?', 2), '&')), '&')
               ELSE {expr} END"""


def oracle_sql() -> dict[str, str]:
    # pages is a directory of part files (parallel-scan layout) — DuckDB
    # reads it via glob; row order across files follows the part numbering
    pages = f"read_parquet('{_FX}/pages.parquet/*.parquet')"
    seeds = f"read_parquet('{_FX}/seeds.parquet')"
    # media fixture must exist on disk before DuckDB parses the twin
    generate_media_fixtures(sf_of_dir(_FX))

    def _mbyte(i) -> str:
        """1-indexed byte ``i`` of the hex(html) string ``h`` as a bigint
        (try_cast → -1 past end-of-blob, so out-of-range probes compare
        false instead of erroring; mirrors the engine's bounds checks)."""
        return (
            f"coalesce(try_cast('0x' || substr(h, ({i}) * 2 - 1, 2) AS BIGINT), -1)"
        )
    robots = f"read_parquet('{_FX}/robots.parquet')"
    politeness = f"read_parquet('{_FX}/politeness.parquet')"

    # shared CTE: robots rules flattened + longest-prefix allow per url set
    def gated(urls_cte: str) -> str:
        return f"""
        WITH u AS ({urls_cte}),
        s AS (SELECT *, {_HOST_SQL} AS host, {_PATH_SQL} AS path FROM u),
        rr AS (SELECT host, unnest(rules) AS rule FROM {robots}),
        rules_flat AS (SELECT host, rule.prefix AS prefix, rule.allow AS allow FROM rr),
        gated AS (
          SELECT s.*, coalesce(
            (SELECT r.allow FROM rules_flat r
              WHERE r.host = s.host AND starts_with(s.path, r.prefix)
              ORDER BY length(r.prefix) DESC, r.prefix LIMIT 1), TRUE) AS allow
          FROM s)
        """

    # ---- generated SQL for the portable-hash dedup twins ----------------
    from crawlfront.analytics import SIMHASH_BAND_BITS, SIMHASH_BANDS, SIMHASH_BITS

    # minhash: one portable hash per shingle + 32 affine permutations
    from crawlfront.analytics import MINHASH_P, minhash_coeffs

    minhash_exprs = ",\n                 ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P})) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(32))
    )
    minhash_bands = "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"h{b * 4 + j}::varchar" for j in range(4))
        + " AS key FROM sig"
        for b in range(8)
    )
    # the shared shingle CTE (3-word shingles, non-distinct — min() is
    # duplicate-insensitive, matching analytics._shingles + explode)
    minhash_prefix = f"""
          WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          sh AS (SELECT doc_id, CASE WHEN len(toks) >= 3
                   THEN list_transform(range(len(toks) - 2),
                                       j -> array_to_string(toks[j + 1 : j + 3], ' '))
                   ELSE [array_to_string(toks, ' ')] END AS shl
                 FROM t),
          hl AS (SELECT doc_id, list_transform(shl, s -> {_phash_sql('s')} % {MINHASH_P}) AS hs
                 FROM sh),
          sig AS (SELECT doc_id,
                 {minhash_exprs}
                 FROM hl),
          banded AS ({minhash_bands})"""

    # minhash LSH candidate pairs + exact-Jaccard verification (shared
    # by dedup_minhash_lsh and the dedup_clusters twins)
    minhash_pairs_sql = minhash_prefix + """,
          pairs AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                    FROM banded l JOIN banded r
                      ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
          vsh AS (SELECT doc_id, list_distinct(shl) AS s FROM sh),
          ver AS (SELECT p.a, p.b,
                    round(len(list_intersect(sa.s, sb.s)) /
                          (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::double, 4) AS jaccard
                  FROM pairs p JOIN vsh sa ON p.a = sa.doc_id JOIN vsh sb ON p.b = sb.doc_id)"""

    # 3-round unrolled min-label propagation over the verified pair
    # graph — the twin for BOTH dedup_clusters (same unroll) and
    # dedup_clusters_converged (exact because sf0.01 diameters ≤ 3)
    clusters_sql = minhash_pairs_sql + """,
          vp AS (SELECT a, b FROM ver WHERE jaccard >= 0.5),
          sym AS (SELECT a, b FROM vp UNION ALL SELECT b AS a, a AS b FROM vp),
          l0 AS (SELECT doc_id, doc_id AS cluster_id FROM documents),
          l1 AS (SELECT l.doc_id,
                   least(l.cluster_id, coalesce(min(n.cluster_id), l.cluster_id)) AS cluster_id
                 FROM l0 l LEFT JOIN sym e ON l.doc_id = e.a
                 LEFT JOIN l0 n ON e.b = n.doc_id
                 GROUP BY l.doc_id, l.cluster_id),
          l2 AS (SELECT l.doc_id,
                   least(l.cluster_id, coalesce(min(n.cluster_id), l.cluster_id)) AS cluster_id
                 FROM l1 l LEFT JOIN sym e ON l.doc_id = e.a
                 LEFT JOIN l1 n ON e.b = n.doc_id
                 GROUP BY l.doc_id, l.cluster_id),
          l3 AS (SELECT l.doc_id,
                   least(l.cluster_id, coalesce(min(n.cluster_id), l.cluster_id)) AS cluster_id
                 FROM l2 l LEFT JOIN sym e ON l.doc_id = e.a
                 LEFT JOIN l2 n ON e.b = n.doc_id
                 GROUP BY l.doc_id, l.cluster_id)
          SELECT doc_id, cluster_id, doc_id = cluster_id AS is_kept FROM l3"""

    # simhash: 60 per-bit ±1 votes over per-token portable hashes
    simhash_votes = ",\n                 ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    simhash_fp = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {2**i}::bigint ELSE 0::bigint END"
        for i in range(SIMHASH_BITS)
    )
    band_mask = (1 << SIMHASH_BAND_BITS) - 1
    simhash_bands = "\n          UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band, "
        f"(simhash >> {SIMHASH_BAND_BITS * j}) & {band_mask} AS key FROM fp"
        for j in range(SIMHASH_BANDS)
    )
    simhash_prefix = f"""
          WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          hh AS (SELECT doc_id, {_phash_sql('tok')} AS h FROM tk),
          v AS (SELECT doc_id,
                 {simhash_votes}
                 FROM hh GROUP BY doc_id),
          fp AS (SELECT doc_id, ({simhash_fp})::bigint AS simhash FROM v)"""

    # embeddings: shared CTEs — √n hash-sampled centroids + assignment
    emb_prefix = f"""
          WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                            {_phash_sql('vec_id::varchar')} AS ph
                     FROM embeddings),
          nc AS (SELECT greatest(16, cast(floor(sqrt(count(*)) + 0.5) AS int)) AS n_cent FROM e),
          c AS (SELECT vec_id AS cent_id, emb AS cv FROM e
                QUALIFY row_number() OVER (ORDER BY ph, vec_id) <= (SELECT n_cent FROM nc)),
          a0 AS (SELECT e.vec_id, e.emb, c.cent_id,
                   round(list_dot_product(e.emb, c.cv) /
                         (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.cv, c.cv))), 9) AS csim
                 FROM e CROSS JOIN c),
          a1 AS (SELECT vec_id, emb, cent_id FROM (
                   SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS ark
                   FROM a0
                   WHERE ({_phash_sql("'kmeans|' || vec_id::varchar")} % 4) = 0
                 ) WHERE ark = 1),
          kx AS (SELECT cent_id, unnest(generate_series(1, len(emb))) AS pos, unnest(emb) AS x FROM a1),
          km AS (SELECT cent_id, pos, sum(cast(round(x * 1000000.0) AS bigint)) AS s, count(*) AS n
                 FROM kx GROUP BY 1, 2),
          c2 AS (SELECT cent_id, list(s::double / 1000000.0 / n ORDER BY pos) AS cv FROM km GROUP BY 1),
          a2 AS (SELECT e.vec_id, e.emb, c2.cent_id,
                   round(list_dot_product(e.emb, c2.cv) /
                         (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c2.cv, c2.cv))), 9) AS csim
                 FROM e CROSS JOIN c2)"""

    # ---- T1/T2 twin: the 2-batch drain as pure SQL ----------------------
    # One batch = gate (robots longest-prefix) → politeness budget rank →
    # fetch (join pages) → link discovery (the j5 regexp/replace-chain
    # rederivation) → dedup vs the seen set.  Batch 2 runs the same step
    # over (deferred ∪ missed-retry ∪ newly discovered) pending rows.
    def drain_batch_sql(i: int, pending: str, seen: str) -> str:
        return f"""
        g{i} AS (SELECT p.*,
                 regexp_extract(url_norm, '^https?://([^/]+)', 1) AS host,
                 coalesce(nullif(regexp_extract(url_norm, '^https?://[^/]+(/[^?#]*)', 1), ''), '/') AS path
                 FROM {pending} p),
        ga{i} AS (SELECT g.*, coalesce(
                   (SELECT r.allow FROM rules_flat r
                     WHERE r.host = g.host AND starts_with(g.path, r.prefix)
                     ORDER BY length(r.prefix) DESC, r.prefix LIMIT 1), TRUE) AS allow
                  FROM g{i} g),
        blocked{i} AS (SELECT * FROM ga{i} WHERE NOT allow),
        allowed{i} AS (SELECT ga{i}.*, coalesce(pol.budget, {_CFG.default_budget}) AS budget
                       FROM ga{i} LEFT JOIN {politeness} pol USING (host) WHERE allow),
        rk{i} AS (SELECT *, row_number() OVER (
                    PARTITION BY host ORDER BY priority, seed_rank, depth, url_norm) AS host_rank
                  FROM allowed{i}),
        elig{i} AS (SELECT * FROM rk{i} WHERE host_rank <= budget),
        hit{i} AS (SELECT e.*, p.html FROM elig{i} e JOIN {pages} p USING (url)
                   WHERE p.html IS NOT NULL),
        miss{i} AS (SELECT * FROM elig{i} ANTI JOIN hit{i} USING (url_norm)),
        links{i} AS (SELECT seed_rank, depth,
                       unnest(regexp_extract_all(decode(html), 'href="([^"]*)"', 1)) AS href
                     FROM hit{i}),
        res{i} AS (SELECT seed_rank, depth,
                     CASE WHEN contains(href, '/link?url=')
                       THEN replace(replace(replace(replace(replace(
                              regexp_extract(href, 'url=([^&]*)', 1),
                              '%3A', ':'), '%2F', '/'), '%3F', '?'), '%3D', '='), '%26', '&')
                       ELSE href END AS link
                   FROM links{i}),
        cn{i} AS (SELECT seed_rank, depth, link, {_canon_sql('link')} AS url_norm FROM res{i}
                  WHERE starts_with(link, 'http://') OR starts_with(link, 'https://')),
        cand{i} AS (SELECT url_norm, link AS url, seed_rank,
                           depth + 1 AS priority, depth + 1 AS depth, 0 AS retry
                    FROM (SELECT *, row_number() OVER (PARTITION BY url_norm
                            ORDER BY depth, seed_rank, link) AS rn FROM cn{i}) WHERE rn = 1),
        new{i} AS (SELECT * FROM cand{i} WHERE url_norm NOT IN (SELECT url_norm FROM {seen}))"""

    def drain_counters_sql(i: int) -> str:
        return f"""
          SELECT {i}::bigint AS batch_id,
                 (SELECT count(*) FROM hit{i})::bigint AS fetched,
                 ((SELECT count(*) FROM cand{i}) - (SELECT count(*) FROM new{i}))::bigint AS deduped,
                 (SELECT count(*) FROM blocked{i})::bigint AS robots_blocked,
                 ((SELECT count(*) FROM allowed{i}) - (SELECT count(*) FROM elig{i}))::bigint AS politeness_deferred,
                 (SELECT count(*) FROM miss{i} WHERE retry + 1 >= {_CFG.max_retries})::bigint AS failed"""

    t1t2_sql = (
        f"""
        WITH rr AS (SELECT host, unnest(rules) AS rule FROM {robots}),
        rules_flat AS (SELECT host, rule.prefix AS prefix, rule.allow AS allow FROM rr),
        seeds0 AS (SELECT url, seed_rank, priority, {_canon_sql('url')} AS url_norm FROM {seeds}),
        pend1 AS (SELECT url_norm, url, seed_rank, priority, 0 AS depth, 0 AS retry
                  FROM (SELECT *, row_number() OVER (PARTITION BY url_norm
                          ORDER BY seed_rank, priority, url) AS rn FROM seeds0) WHERE rn = 1),
        seen1 AS (SELECT url_norm FROM pend1),"""
        + drain_batch_sql(1, "pend1", "seen1")
        + """,
        pend2 AS (
          SELECT url_norm, url, seed_rank, priority, depth, retry FROM rk1 WHERE host_rank > budget
          UNION ALL
          SELECT url_norm, url, seed_rank, priority, depth, 1 AS retry FROM miss1
          UNION ALL
          SELECT url_norm, url, seed_rank, priority, depth, retry FROM new1),
        seen2 AS (SELECT url_norm FROM seen1 UNION ALL SELECT url_norm FROM new1),"""
        + drain_batch_sql(2, "pend2", "seen2")
        + drain_counters_sql(1)
        + "\n          UNION ALL"
        + drain_counters_sql(2)
    )

    schedule_sql = (
        gated(f"SELECT url, seed_rank, priority FROM {seeds}")
        + f"""
        , budgeted AS (
          SELECT g.*, coalesce(p.budget, {_CFG.default_budget}) AS budget
          FROM gated g LEFT JOIN {politeness} p USING (host)
          WHERE g.allow),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY host ORDER BY priority, seed_rank, url) AS host_rank
          FROM budgeted),
        eligible AS (SELECT * FROM ranked WHERE host_rank <= budget)
        """
    )

    # shared link-graph derivation (g1_host_pagerank / g2_anchor_stats):
    # fetch the eligible batch, re-derive hrefs + redirect decoding +
    # canonicalization in pure SQL
    linkgraph_sql = schedule_sql + f"""
          , fetched AS (
              SELECT e.host AS src, decode(p.html) AS doc
              FROM eligible e JOIN {pages} p USING (url)),
          raw_links AS (
              SELECT src, unnest(regexp_extract_all(doc, 'href="([^"]*)"', 1)) AS href
              FROM fetched),
          resolved AS (
              SELECT src,
                     CASE WHEN contains(href, '/link?url=')
                       THEN replace(replace(replace(replace(replace(
                              regexp_extract(href, 'url=([^&]*)', 1),
                              '%3A', ':'), '%2F', '/'), '%3F', '?'), '%3D', '='), '%26', '&')
                       ELSE href END AS link
              FROM raw_links),
          canon AS (
              SELECT src, {_canon_sql('link')} AS url_norm FROM resolved)"""

    return {
        # ::bigint — DuckDB's sum() of an integer column widens to HUGEINT,
        # which value-hash-mismatches Spark's BIGINT (VERDICT r1 item 1)
        "s1_scan_pages": f"SELECT lang, count(*) AS n_pages, sum(length(text))::bigint AS total_chars FROM {pages} GROUP BY lang",
        "p2_extract_host": f"SELECT url, {_HOST_SQL} AS host FROM {pages}",
        "p3_lang_filter": f"SELECT url, lang FROM {pages} WHERE lang = 'zh'",
        "p6_valid_page": f"SELECT url, octet_length(html)::bigint AS n_bytes FROM {pages} WHERE html IS NOT NULL AND octet_length(html) < 1000000",
        "p5_robots_match": gated(f"SELECT url FROM {pages}") + "SELECT url, allow FROM gated",
        "j1_gate_robots": gated(f"SELECT url FROM {seeds}")
        + f"SELECT g.url, r.crawl_delay_ms::bigint AS crawl_delay_ms, g.allow FROM gated g LEFT JOIN {robots} r USING (host)",
        "j2_gate_politeness": f"""
          WITH hosts AS (SELECT DISTINCT {_HOST_SQL} AS host FROM {pages})
          SELECT h.host, coalesce(p.budget, {_CFG.default_budget})::int AS budget
          FROM hosts h LEFT JOIN {politeness} p USING (host)""",
        "j3_fetch_join": f"""
          SELECT s.url, octet_length(p.html)::bigint AS n_bytes, p.lang
          FROM {seeds} s JOIN {pages} p USING (url)""",
        "w2_enforce_budget": schedule_sql
        + """
          SELECT url, host, host_rank::int AS host_rank, budget::int AS budget
          FROM eligible""",
        # the canonicalizer sorts query params by (key, value); fixture
        # URLs (?q=kwN&pn=0, alnum values) are otherwise already canonical,
        # so an independent param re-sort is the exact twin
        "p1_canonicalize": f"""
          SELECT url, {_canon_sql('url')} AS url_norm
          FROM {seeds}""",
        # J5 — fully independent rederivation: regexp href scrape (vs the
        # HTMLParser UDF), percent-escape replace chain (vs urllib
        # unquote; the fixture encoder quote(safe='') only ever escapes
        # the 5 URL specials present in synthetic targets), param-sort
        # canonical form, min-(seed_rank, link) parent pick, anti-join
        # against the canonicalized seed frontier
        "j5_discover_links": schedule_sql
        + f"""
          , fetched AS (
              SELECT e.seed_rank, decode(p.html) AS doc
              FROM eligible e JOIN {pages} p USING (url)),
          raw_links AS (
              SELECT seed_rank, unnest(regexp_extract_all(doc, 'href="([^"]*)"', 1)) AS href
              FROM fetched),
          resolved AS (
              SELECT seed_rank,
                     CASE WHEN contains(href, '/link?url=')
                       THEN replace(replace(replace(replace(replace(
                              regexp_extract(href, 'url=([^&]*)', 1),
                              '%3A', ':'), '%2F', '/'), '%3F', '?'), '%3D', '='), '%26', '&')
                       ELSE href END AS link
              FROM raw_links),
          canon AS (
              SELECT seed_rank, link, {_canon_sql('link')} AS url_norm
              FROM resolved),
          cand AS (
              SELECT url_norm FROM (
                SELECT url_norm,
                       row_number() OVER (PARTITION BY url_norm
                                          ORDER BY seed_rank, link) AS rn
                FROM canon) WHERE rn = 1),
          frontier0 AS (SELECT DISTINCT {_canon_sql('url')} AS url_norm FROM {seeds})
          SELECT c.url_norm,
                 regexp_extract(c.url_norm, '^https?://([^/]+)', 1) AS host,
                 1::int AS depth, 1::int AS priority
          FROM cand c ANTI JOIN frontier0 f USING (url_norm)
          ORDER BY url_norm""",
        "p7_url_trap_score": f"""
          WITH s AS (SELECT url, {_PATH_SQL} AS path FROM {pages}),
          g AS (SELECT url,
                  list_filter(string_split(path, '/'), x -> x != '') AS segs,
                  CASE WHEN contains(url, '?')
                    THEN len(string_split(split_part(url, '?', 2), '&'))
                    ELSE 0 END::int AS n_params
                FROM s),
          f AS (SELECT url, len(segs)::int AS depth,
                  CASE WHEN len(segs) >= 2
                    THEN list_contains(
                           list_transform(range(len(segs) - 1),
                                          i -> segs[i + 1] = segs[i + 2]), TRUE)
                    ELSE FALSE END AS has_repeat,
                  n_params
                FROM g)
          SELECT url, depth, has_repeat, n_params,
                 (has_repeat OR depth > 8 OR n_params > 5) AS is_trap
          FROM f""",
        "g2_anchor_stats": linkgraph_sql + """,
          http_links AS (
              SELECT src, url_norm FROM canon
              WHERE starts_with(url_norm, 'http://') OR starts_with(url_norm, 'https://')),
          per_src AS (SELECT url_norm, src, count(*) AS n_from_src
                      FROM http_links GROUP BY 1, 2)
          SELECT url_norm, sum(n_from_src)::bigint AS n_inlinks,
                 count(*)::bigint AS n_src_hosts, min(src) AS first_src
          FROM per_src GROUP BY url_norm""",
        "g1_host_pagerank": _pagerank_sql(linkgraph_sql, 3),
        # the fixed-point loop's twin: the SAME recurrence unrolled PAST
        # its measured convergence (15 rounds at sf0.01) — once ranks are
        # stationary every further round reproduces them exactly, so a
        # static depth-24 chain equals the converge-until-stable engine
        "g1b_pagerank_converged": _pagerank_sql(linkgraph_sql, PR_TWIN_UNROLL),
        "u1_union_distinct": """
          SELECT c_custkey AS k FROM customer
          UNION
          SELECT o_custkey AS k FROM orders""",
        "w1_w3_schedule_batch1": schedule_sql
        + """
          SELECT url, host, host_rank::int AS host_rank,
                 (row_number() OVER (ORDER BY priority, seed_rank, host_rank, host, url) - 1)::bigint AS schedule_idx
          FROM eligible""",
        "w5_pace_schedule": schedule_sql
        + f"""
          SELECT e.url,
                 (1767225600000 + (e.host_rank - 1) * coalesce(r.crawl_delay_ms, 0))::bigint AS planned_epoch_ms
          FROM eligible e LEFT JOIN (SELECT host, crawl_delay_ms FROM {robots}) r USING (host)""",
        "o1_drain_limit": schedule_sql
        + """
          , sched AS (
            SELECT url, (row_number() OVER (ORDER BY priority, seed_rank, host_rank, host, url) - 1)::bigint AS schedule_idx
            FROM eligible)
          SELECT url, schedule_idx FROM sched ORDER BY schedule_idx LIMIT 20""",
        "refresh_gates": f"""
          WITH stats AS (
            SELECT {_HOST_SQL} AS host, count(DISTINCT url) AS n
            FROM {seeds} GROUP BY 1),
          hot AS (SELECT host FROM stats ORDER BY n DESC, host ASC LIMIT 10),
          hot_pol AS (
            SELECT h.host, coalesce(p.budget, 2)::int AS budget
            FROM hot h LEFT JOIN {politeness} p USING (host))
          SELECT host, budget FROM hot_pol
          UNION ALL
          SELECT host, budget::int AS budget FROM {politeness}
          WHERE host NOT IN (SELECT host FROM hot)""",
        "o3_topk_hot_hosts": f"""
          SELECT {_HOST_SQL} AS host, count(*) AS n_pages FROM {pages}
          GROUP BY 1 ORDER BY n_pages DESC, host ASC LIMIT 10""",
        "a1_host_stats": f"SELECT {_HOST_SQL} AS host, count(*) AS n_pages FROM {pages} GROUP BY 1",
        "a6_rollup_host_lang": f"""
          WITH p AS (SELECT {_HOST_SQL} AS host, lang, text FROM {pages})
          SELECT host, lang, count(*) AS n_pages,
                 sum(length(text))::bigint AS total_chars
          FROM p GROUP BY ROLLUP (host, lang)""",
        "j7_theta_host_tiers": f"""
          WITH stats AS (SELECT {_HOST_SQL} AS host, count(*) AS n_pages
                         FROM {pages} GROUP BY 1),
          tiers(lo, hi, tier) AS (VALUES
            (0, 9, 't0_small'), (10, 99, 't1_medium'),
            (100, 999, 't2_large'), (1000, 1099511627776, 't3_huge'))
          SELECT host, n_pages, tier
          FROM stats JOIN tiers ON n_pages BETWEEN lo AND hi""",
        "a3_cardinality": f"SELECT count(DISTINCT url) AS n_urls, count(DISTINCT {_HOST_SQL}) AS n_hosts FROM {pages}",
        "d3_extract_text_invariant": f"SELECT count(*) AS n_pages, count(*) AS n_text_match FROM {pages}",
        "x6_time_buckets": f"SELECT date_trunc('day', warc_ts) AS day, count(*) AS n_pages FROM {pages} GROUP BY 1",
        # Spark F.window aligns tumbling windows to the epoch; DuckDB
        # time_bucket's origin (2000-01-01) is a multiple of 6h from the
        # epoch, so the buckets coincide exactly
        "t4_throughput_windows": f"""
          SELECT time_bucket(INTERVAL 6 HOUR, warc_ts) AS window_start,
                 time_bucket(INTERVAL 6 HOUR, warc_ts) + INTERVAL 6 HOUR AS window_end,
                 count(*) AS n_pages,
                 sum(octet_length(html))::bigint AS total_bytes
          FROM {pages} GROUP BY 1, 2""",
        # sliding windows: every ts belongs to exactly two 12h/6h windows,
        # starts = time_bucket(6h, ts) - {{0,1}}*6h (epoch-aligned like Spark)
        "t4b_sliding_windows": f"""
          SELECT time_bucket(INTERVAL 6 HOUR, warc_ts) - i * INTERVAL 6 HOUR AS window_start,
                 time_bucket(INTERVAL 6 HOUR, warc_ts) + (2 - i) * INTERVAL 6 HOUR AS window_end,
                 count(*) AS n_pages
          FROM {pages} CROSS JOIN (VALUES (0), (1)) k(i)
          GROUP BY 1, 2""",
        # session windows: gaps-and-islands — break where the per-host gap
        # exceeds 30 min; session end = last event + gap (Spark semantics)
        "t4c_session_windows": f"""
          WITH p AS (SELECT {_HOST_SQL} AS host, warc_ts FROM {pages}),
          m AS (SELECT host, warc_ts,
                  CASE WHEN warc_ts - lag(warc_ts) OVER (PARTITION BY host ORDER BY warc_ts)
                            <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
                FROM p),
          g AS (SELECT host, warc_ts,
                  sum(brk) OVER (PARTITION BY host ORDER BY warc_ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
                FROM m)
          SELECT host, min(warc_ts) AS session_start,
                 max(warc_ts) + INTERVAL 30 MINUTE AS session_end,
                 count(*) AS n_pages
          FROM g GROUP BY host, sid""",
        "d7_udtf_url_segments": f"""
          WITH segs AS (
            SELECT unnest(string_split(split_part(split_part(url, '://', 2), '?', 1), '/')[2:]) AS segment,
                   generate_subscripts(string_split(split_part(split_part(url, '://', 2), '?', 1), '/')[2:], 1) AS seg_idx
            FROM {pages})
          SELECT seg_idx AS depth, count(*) AS n_pages,
                 count(DISTINCT segment) AS n_unique_segments
          FROM segs GROUP BY 1""",
        "d8_udaf_host_median": f"""
          SELECT {_HOST_SQL} AS host, count(*) AS n_pages,
                 median(length(text)) AS median_chars
          FROM {pages} GROUP BY 1""",
        # driver tables (pre-registered views)
        "x9_json_props": "SELECT json_extract_string(props, '$.k')::int AS k, count(*) AS n FROM events GROUP BY 1",
        "j6_asof_latest": """
          SELECT user_id, ts AS last_ts, event_type AS last_type FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
            FROM events) WHERE rn = 1""",
        "w4_running_window": """
          SELECT event_id, user_id,
                 row_number() OVER w ::int AS seq,
                 round(sum(value) OVER w, 3) AS running_value
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
        "q1_pricing_summary": """
          SELECT l_returnflag, l_linestatus,
                 round(sum(l_quantity), 2) AS sum_qty,
                 round(sum(l_extendedprice), 2) AS sum_base_price,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                 round(avg(l_quantity), 4) AS avg_qty,
                 count(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus""",
        "q3_top_orders": """
          SELECT l_orderkey, o_orderdate,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY l_orderkey, o_orderdate
          ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
        "q5_local_volume": """
          SELECT n_name,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                 count(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01'
          GROUP BY n_name""",
        "q18_large_orders": """
          WITH big AS (
            SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 140)
          SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
          FROM big JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          ORDER BY total_qty DESC, o_orderkey ASC LIMIT 100""",
        "u2_anti_join": "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
        "u3_semi_join": """
          SELECT c_mktsegment, count(*) AS n_customers FROM customer c
          WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          GROUP BY c_mktsegment""",
        "x8_array_norm": "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, x -> x::double * x::double))), 4) AS l2_norm FROM embeddings",
        # export round-trip: the SAME deterministic results-shaped frame
        # the Spark side pushes through CSV-write→read, computed directly
        # (DuckDB string literals are escape-free, so '\N' below is a
        # literal backslash-N — the very string the sentinel scheme must
        # keep distinct from NULL)
        "export_roundtrip": """
          SELECT doc_id AS schedule_idx,
                 (doc_id % 3 + 1)::bigint AS batch_id,
                 'http://ex.org/d/' || doc_id AS url,
                 (doc_id % 10)::int AS rank,
                 CASE WHEN doc_id % 11 = 0 THEN '\\N'
                      WHEN doc_id % 11 = 1 THEN NULL
                      ELSE substr(text, 1, 20) || '"x,' || chr(10) || '\\y'
                 END AS title,
                 CASE WHEN doc_id % 7 = 0 THEN NULL
                      ELSE substr(text, 5, 30) END AS abstract,
                 'http://t/' || lang AS link
          FROM documents""",
        # training-data pipeline
        "dedup_exact": "SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keep_doc_id FROM documents GROUP BY 1",
        "dedup_ngram_jaccard": """
          WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          sh AS (SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                     THEN list_distinct(list_transform(range(len(toks) - 2),
                                                       j -> array_to_string(toks[j + 1 : j + 3], ' ')))
                     ELSE [array_to_string(toks, ' ')] END AS shl
                 FROM t),
          sizes AS (SELECT doc_id, len(shl) AS n_sh FROM sh),
          inv0 AS (SELECT doc_id, unnest(shl) AS shingle FROM sh),
          kept AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING count(*) <= 100),
          inv AS (SELECT inv0.doc_id, inv0.shingle FROM inv0 JOIN kept USING (shingle)),
          co AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_common
                 FROM inv l JOIN inv r USING (shingle)
                 WHERE l.doc_id < r.doc_id GROUP BY 1, 2)
          SELECT co.a, co.b, co.n_common::bigint AS n_common,
                 round(co.n_common / (sa.n_sh + sb.n_sh - co.n_common)::double, 4) AS jaccard
          FROM co JOIN sizes sa ON co.a = sa.doc_id JOIN sizes sb ON co.b = sb.doc_id
          WHERE round(co.n_common / (sa.n_sh + sb.n_sh - co.n_common)::double, 4) >= 0.5""",
        "dedup_minhash_lsh": minhash_pairs_sql + """
          SELECT a, b, jaccard FROM ver WHERE jaccard >= 0.5""",
        # benchmark decontamination: 8-gram overlap against the
        # deterministic pseudo-eval set (first 30 tokens of every
        # doc_id % 97 == 0 doc) — mirrors analytics.decontaminate incl.
        # the <n-token whole-doc fallback shingle
        "decontaminate": f"""
          WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          bp AS (SELECT toks[1:30] AS toks FROM t WHERE doc_id % 97 = 0),
          bsh0 AS (SELECT unnest(CASE WHEN len(toks) >= 8
                     THEN list_transform(range(len(toks) - 7),
                                         j -> array_to_string(toks[j + 1 : j + 8], ' '))
                     ELSE [array_to_string(toks, ' ')] END) AS s
                   FROM bp),
          bsh AS (SELECT DISTINCT {_phash_sql('s')} AS bh FROM bsh0),
          dsh0 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 8
                     THEN list_transform(range(len(toks) - 7),
                                         j -> array_to_string(toks[j + 1 : j + 8], ' '))
                     ELSE [array_to_string(toks, ' ')] END) AS s
                   FROM t),
          dsh AS (SELECT DISTINCT doc_id, {_phash_sql('s')} AS sh FROM dsh0)
          SELECT dsh.doc_id::bigint AS doc_id, count(*)::bigint AS n_hits
          FROM dsh JOIN bsh ON dsh.sh = bsh.bh GROUP BY dsh.doc_id""",
        "dedup_clusters": clusters_sql,
        # the converge-until-stable loop: at sf0.01 every cluster
        # diameter is within the 3-round unroll (measured: converges in
        # 2 rounds), so the unrolled twin is its exact oracle; the
        # loop's advantage (deep chains) is separately pinned by pytest
        # on a diameter-6 graph the unrolled shape provably gets wrong
        "dedup_clusters_converged": clusters_sql,
        "simhash_fingerprints": simhash_prefix + """
          SELECT doc_id, simhash FROM fp""",
        "dedup_simhash": simhash_prefix + f""",
          banded0 AS ({simhash_bands}),
          kept_b AS (SELECT band, key FROM banded0
                     GROUP BY band, key HAVING count(*) <= 100),
          banded AS (SELECT banded0.* FROM banded0 JOIN kept_b USING (band, key))
          SELECT a, b, hamming FROM (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                   bit_count(xor(l.simhash, r.simhash))::int AS hamming
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
          WHERE hamming <= 3""",
        "winnow_fingerprints": """
          WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          kg AS (SELECT doc_id, CASE WHEN len(toks) >= 5
                   THEN list_transform(range(len(toks) - 4),
                                       j -> array_to_string(toks[j + 1 : j + 5], ' '))
                   ELSE [array_to_string(toks, ' ')] END AS kgrams
                 FROM t),
          kh AS (SELECT doc_id, list_transform(kgrams, s -> {ph}) AS hs FROM kg),
          wins AS (SELECT doc_id, CASE WHEN len(hs) >= 8
                     THEN list_distinct(list_transform(range(len(hs) - 7),
                                                       j -> list_min(hs[j + 1 : j + 8])))
                     ELSE [list_min(hs)] END AS fps
                   FROM kh)
          SELECT DISTINCT doc_id, fingerprint FROM (
            SELECT doc_id, unnest(fps) AS fingerprint FROM wins)""".format(
            ph=_phash_sql("s")
        ),
        "dedup_embedding": emb_prefix + """,
          asn AS (SELECT vec_id, emb, cent_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS ark
                    FROM a2) WHERE ark = 1),
          p AS (SELECT l.vec_id AS a, r.vec_id AS b,
                  round(list_dot_product(l.emb, r.emb) /
                        (sqrt(list_dot_product(l.emb, l.emb)) * sqrt(list_dot_product(r.emb, r.emb))), 6) AS cos
                FROM asn l JOIN asn r USING (cent_id) WHERE l.vec_id < r.vec_id)
          SELECT a, b, cos FROM p WHERE cos >= 0.3""",
        # the adaptive coarse prune (analytics.ann_ivf_topk) is OFF at the
        # contract sf: est. candidates = n_assign·nprobe·n/n_centroids =
        # 3·12·500/22 ≈ 818 < prune_min_cand (10 000), so the twin ranks
        # every candidate by the exact cosine directly — the rule is a
        # pure function of (n, params), mirrored statically here
        "ann_ivf_topk": emb_prefix + """,
          asn AS (SELECT vec_id, cent_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS ark
                    FROM a2) WHERE ark <= 3),
          q AS (SELECT vec_id AS query_id, emb AS qe FROM e ORDER BY vec_id LIMIT 10),
          pr AS (SELECT query_id, cent_id FROM (
                   SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cent_id ASC) AS prk
                   FROM (SELECT q.query_id, c2.cent_id,
                           round(list_dot_product(q.qe, c2.cv) /
                                 (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c2.cv, c2.cv))), 9) AS csim
                         FROM q CROSS JOIN c2))
                 WHERE prk <= 12),
          cand AS (SELECT DISTINCT pr.query_id, asn.vec_id
                   FROM pr JOIN asn USING (cent_id) WHERE asn.vec_id != pr.query_id),
          scored AS (SELECT cand.query_id, cand.vec_id AS neighbor_id,
                       round(list_dot_product(q.qe, e.emb) /
                             (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
                     FROM cand JOIN q ON cand.query_id = q.query_id
                     JOIN e ON cand.vec_id = e.vec_id),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)::int AS rk
                     FROM scored)
          SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 5""",
        "ann_cosine_topk": """
          WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings ORDER BY vec_id LIMIT 10),
          e2 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
          scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   round(list_dot_product(q.qe, e.emb) /
                         (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
            FROM e2 e CROSS JOIN q WHERE e.vec_id != q.query_id),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)::int AS rk FROM scored)
          SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 5""",
        # int8 scalar quantization: per-vector scale 127/max|x| (scales
        # CANCEL out of the quantized cosine, so scoring is an exact
        # integer dot — list_dot_product over integer-valued lists is
        # exact in double far below 2^53); zero vectors (qn2=0) are
        # excluded on both sides
        "ann_quant_topk": """
          WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
                      FROM embeddings),
          qz AS (SELECT vec_id,
                        CASE WHEN amax > 0
                             THEN list_transform(emb, x -> round(x * (127.0 / amax))::bigint)
                             ELSE list_transform(emb, x -> 0::bigint) END AS qv
                 FROM e0),
          qn AS (SELECT vec_id, qv, list_dot_product(qv, qv)::bigint AS qn2
                 FROM qz WHERE list_dot_product(qv, qv) > 0),
          q AS (SELECT vec_id AS query_id, qv AS qq, qn2 AS qn2q
                FROM qn ORDER BY vec_id LIMIT 10),
          scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   round(list_dot_product(q.qq, e.qv) /
                         sqrt((q.qn2q * e.qn2)::double), 6) AS qcos
            FROM qn e CROSS JOIN q WHERE e.vec_id != q.query_id),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC)::int AS rk FROM scored)
          SELECT query_id, neighbor_id, qcos, rk FROM ranked WHERE rk <= 5""",
        "lang_id": """
          SELECT doc_id,
                 round((length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')))
                       / greatest(length(text), 1)::double, 4) AS cjk_ratio,
                 CASE WHEN (length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')))
                       / greatest(length(text), 1)::double > 0.2 THEN 'zh' ELSE 'en' END AS pred_lang
          FROM documents""",
        "quality_score": """
          WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          SELECT doc_id, len(toks)::int AS n_tokens,
                 round(len(list_filter(toks, x -> x IN ('the','a','and','of','to')))
                       / greatest(len(toks), 1)::double, 4) AS stopword_ratio,
                 round(0.5 * least(len(toks) / 100.0, 1.0)
                       + 0.5 * (1 - len(list_filter(toks, x -> x IN ('the','a','and','of','to')))
                                / greatest(len(toks), 1)::double), 4) AS quality
          FROM t""",
        "token_count": """
          SELECT doc_id, len(string_split(text, ' '))::int AS ws_tokens,
                 ceil(length(text) / 4.0)::int AS bpe_est_tokens
          FROM documents""",
        "doc_fingerprint": "SELECT doc_id, md5(substr(text, 1, 100)) AS fp_head, n_chars::bigint AS n_chars FROM documents",
        "repetition_score": """
          WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          b AS (SELECT doc_id, CASE WHEN len(toks) >= 2
                  THEN list_transform(range(len(toks) - 1),
                                      j -> array_to_string(toks[j + 1 : j + 2], ' '))
                  ELSE [array_to_string(toks, ' ')] END AS bg
                FROM t)
          SELECT doc_id, len(bg)::int AS n_bigrams,
                 round(1 - len(list_distinct(bg)) / greatest(len(bg), 1)::double, 4) AS rep_ratio
          FROM b""",
        "split_assign": f"""
          WITH b AS (SELECT doc_id,
                       ({_phash_sql("'split-v1|' || doc_id::varchar")} % 1000)::int AS bucket
                     FROM documents)
          SELECT doc_id, bucket,
                 CASE WHEN bucket < 900 THEN 'train'
                      WHEN bucket < 950 THEN 'val'
                      ELSE 'test' END AS split
          FROM b""",
        "bm25_topk": """
          WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          d2 AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
          st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
                   sum(list_contains(toks, 'hash')::int)   AS df_0,
                   sum(list_contains(toks, 'join')::int)   AS df_1,
                   sum(list_contains(toks, 'stream')::int) AS df_2
                 FROM d2),
          s AS (SELECT doc_id, round(
              0.0
              + ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0)
                * (len(list_filter(toks, x -> x = 'hash')) * (1.2 + 1.0))
                / (len(list_filter(toks, x -> x = 'hash'))
                   + 1.2 * (0.25 + 0.75 * dl / (sum_dl::double / n_docs)))
              + ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0)
                * (len(list_filter(toks, x -> x = 'join')) * (1.2 + 1.0))
                / (len(list_filter(toks, x -> x = 'join'))
                   + 1.2 * (0.25 + 0.75 * dl / (sum_dl::double / n_docs)))
              + ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0)
                * (len(list_filter(toks, x -> x = 'stream')) * (1.2 + 1.0))
                / (len(list_filter(toks, x -> x = 'stream'))
                   + 1.2 * (0.25 + 0.75 * dl / (sum_dl::double / n_docs)))
              , 4) AS bm25
            FROM d2 CROSS JOIN st)
          SELECT doc_id, bm25 FROM s ORDER BY bm25 DESC, doc_id ASC LIMIT 20""",
        "paragraph_dedup": """
          WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          ch0 AS (SELECT doc_id,
                    unnest(list_transform(
                      range(greatest(cast(ceil(len(toks) / 10.0) AS int), 1)),
                      j -> struct_pack(pos := j,
                                       chunk := array_to_string(toks[j*10+1 : j*10+10], ' '))
                    )) AS c
                  FROM t),
          ch AS (SELECT doc_id, c.pos AS pos, c.chunk AS chunk, md5(c.chunk) AS h
                 FROM ch0),
          fl AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) > 1 AS is_dup
                 FROM ch)
          SELECT doc_id, count(*)::int AS n_chunks,
                 sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::int AS n_dup_chunks,
                 round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::bigint / count(*), 4) AS dup_ratio,
                 md5(coalesce(string_agg(chunk, ' ' ORDER BY pos)
                              FILTER (WHERE NOT is_dup), '')) AS kept_md5
          FROM fl GROUP BY doc_id""",
        "pii_scrub": f"""
          SELECT url,
                 len(regexp_extract_all(decode(html), '{_PII_EMAIL}'))::int AS n_emails,
                 len(regexp_extract_all(decode(html), '{_PII_PHONE}'))::int AS n_phones,
                 len(regexp_extract_all(decode(html), '{_PII_URL}'))::int AS n_urls,
                 md5(regexp_replace(regexp_replace(regexp_replace(decode(html), '{_PII_EMAIL}', '<EMAIL>', 'g'),
                                                   '{_PII_PHONE}', '<PHONE>', 'g'),
                                    '{_PII_URL}', '<URL>', 'g')) AS scrubbed_md5
          FROM {pages}""",
        "pipeline_clean_corpus": """
          WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
          scored AS (
            SELECT doc_id, text,
              round(0.5 * least(len(toks) / 100.0, 1.0)
                    + 0.5 * (1 - len(list_filter(toks, x -> x IN ('the','a','and','of','to')))
                             / greatest(len(toks), 1)::double), 4) AS quality,
              CASE WHEN round((length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')))
                        / greatest(length(text), 1)::double, 4) > 0.2
                   THEN 'zh' ELSE 'en' END AS pred_lang,
              ceil(length(text) / 4.0)::int AS bpe_est_tokens
            FROM t),
          filt AS (SELECT * FROM scored WHERE pred_lang = 'en' AND quality >= 0.6),
          d1 AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM filt),
          k1 AS (SELECT doc_id, text, quality, pred_lang, bpe_est_tokens FROM d1 WHERE rn = 1),
          d2 AS (SELECT *, row_number() OVER (PARTITION BY md5(substr(text, 1, 100)) ORDER BY doc_id) AS rn FROM k1)
          SELECT doc_id, pred_lang, quality, bpe_est_tokens,
                 (('0x' || substr(md5(md5(text)), 1, 15))::bigint % 8)::int AS shard
          FROM d2 WHERE rn = 1""",
        # multimodal: the twin re-decodes PNG/GIF/JPEG/WebP/WAV header
        # fields from hex(html) — fixed-offset reads for PNG IHDR / GIF
        # LSD / the three WebP bitstream variants (VP8X 24-bit canvas,
        # VP8L 14+14-bit LE bitfield, VP8 sync+14-bit dims) / the WAV
        # fmt chunk, and a recursive-CTE marker walk for JPEG (SOF is at
        # a VARIABLE offset behind APP0/COM segments; byte/offset math
        # mirrors analytics.parse_media_dims exactly, 1-indexed where
        # the engine is 0-indexed)
        "multimodal_meta": f"""
          WITH RECURSIVE
          hx AS (SELECT url, octet_length(html)::bigint AS n_bytes, hex(html) AS h
                 FROM read_parquet('{_FX}/media.parquet')),
          png AS (SELECT url, 'png' AS kind,
                         ('0x' || substr(h, 33, 8))::bigint::int AS width,
                         ('0x' || substr(h, 41, 8))::bigint::int AS height
                  FROM hx
                  WHERE n_bytes >= 24 AND substr(h, 1, 16) = '89504E470D0A1A0A'
                    AND substr(h, 25, 8) = '49484452'),
          gif AS (SELECT url, 'gif' AS kind,
                         ({_mbyte(7)} + 256 * {_mbyte(8)})::int AS width,
                         ({_mbyte(9)} + 256 * {_mbyte(10)})::int AS height
                  FROM hx
                  WHERE n_bytes >= 10
                    AND substr(h, 1, 12) IN ('474946383761', '474946383961')),
          jw AS (
            SELECT url, h, n_bytes, 3::bigint AS pos, 0 AS it FROM hx
            WHERE substr(h, 1, 4) = 'FFD8'
            UNION ALL
            SELECT url, h, n_bytes,
                   pos + 2 + {_mbyte('pos + 2')} * 256 + {_mbyte('pos + 3')},
                   it + 1
            FROM jw
            WHERE pos + 8 <= n_bytes AND it < 64 AND {_mbyte('pos')} = 255
              AND {_mbyte('pos + 1')} NOT IN (192, 193, 194, 1, 216, 217)
              AND NOT ({_mbyte('pos + 1')} BETWEEN 208 AND 215)),
          jpg AS (SELECT url, 'jpeg' AS kind,
                         ({_mbyte('pos + 7')} * 256 + {_mbyte('pos + 8')})::int AS width,
                         ({_mbyte('pos + 5')} * 256 + {_mbyte('pos + 6')})::int AS height
                  FROM jw
                  WHERE pos + 8 <= n_bytes AND {_mbyte('pos')} = 255
                    AND {_mbyte('pos + 1')} IN (192, 193, 194)),
          riff AS (SELECT * FROM hx WHERE substr(h, 1, 8) = '52494646'),
          vp8x AS (SELECT url, 'webp' AS kind,
                          (1 + {_mbyte(25)} + 256 * {_mbyte(26)} + 65536 * {_mbyte(27)})::int AS width,
                          (1 + {_mbyte(28)} + 256 * {_mbyte(29)} + 65536 * {_mbyte(30)})::int AS height
                   FROM riff
                   WHERE n_bytes >= 30 AND substr(h, 17, 8) = '57454250'
                     AND substr(h, 25, 8) = '56503858'),
          vp8l AS (SELECT url, 'webp' AS kind,
                          (1 + ((({_mbyte(22)} + 256 * {_mbyte(23)} + 65536 * {_mbyte(24)}
                                  + 16777216 * {_mbyte(25)}) & 16383)))::int AS width,
                          (1 + (((({_mbyte(22)} + 256 * {_mbyte(23)} + 65536 * {_mbyte(24)}
                                   + 16777216 * {_mbyte(25)}) >> 14) & 16383)))::int AS height
                   FROM riff
                   WHERE n_bytes >= 25 AND substr(h, 17, 8) = '57454250'
                     AND substr(h, 25, 8) = '5650384C' AND {_mbyte(21)} = 47),
          vp8 AS (SELECT url, 'webp' AS kind,
                         ((({_mbyte(27)} + 256 * {_mbyte(28)}) & 16383))::int AS width,
                         ((({_mbyte(29)} + 256 * {_mbyte(30)}) & 16383))::int AS height
                  FROM riff
                  WHERE n_bytes >= 30 AND substr(h, 17, 8) = '57454250'
                    AND substr(h, 25, 8) = '56503820'
                    AND {_mbyte(24)} = 157 AND {_mbyte(25)} = 1 AND {_mbyte(26)} = 42),
          wav AS (SELECT url, 'wav' AS kind,
                         ({_mbyte(25)} + 256 * {_mbyte(26)} + 65536 * {_mbyte(27)}
                          + 16777216 * {_mbyte(28)})::int AS width,
                         ({_mbyte(23)} + 256 * {_mbyte(24)})::int AS height
                  FROM riff
                  WHERE n_bytes >= 28 AND substr(h, 17, 8) = '57415645'
                    AND substr(h, 25, 8) = '666D7420'),
          d AS (SELECT * FROM png UNION ALL SELECT * FROM gif
                UNION ALL SELECT * FROM jpg
                UNION ALL SELECT * FROM vp8x UNION ALL SELECT * FROM vp8l
                UNION ALL SELECT * FROM vp8 UNION ALL SELECT * FROM wav)
          SELECT hx.url, hx.n_bytes,
                 lower(substr(h, 1, 8)) AS head,
                 substr(h, 1, 10) = '3C68746D6C' AS is_html,
                 d.kind IS NOT NULL AS decoded,
                 coalesce(d.kind, CASE WHEN substr(h, 1, 10) = '3C68746D6C'
                                       THEN 'html' ELSE 'bin' END) AS kind,
                 coalesce(d.width, (hx.n_bytes % 640))::int AS width,
                 coalesce(d.height, (hx.n_bytes % 480))::int AS height
          FROM hx LEFT JOIN d USING (url)""",
        # X1–X3 — Spark murmur3-32 / xxhash64 / partition keys, recomputed
        # bit-for-bit inside DuckDB (recursive-CTE reimplementation,
        # crawlfront/sqlhash.py, pinned by tests/test_sqlhash.py)
        "x1_x3_hash_partition": f"""
          WITH RECURSIVE
          src AS (SELECT url, {_HOST_SQL} AS host FROM {pages}),
          {murmur3_ctes("mu", "src", "url")},
          {xxhash64_ctes("xu", "src", "url")},
          {murmur3_ctes("mh", "src", "host")}
          SELECT s.url, mu.h32 AS url_hash32, xu.h64 AS url_hash64,
                 mh.h32 AS host_hash,
                 {pmod_sql("mh.h32::bigint + " + pmod_sql("xu.h64", 8), 32)}::int AS pk
          FROM src s
          JOIN mu_m mu ON mu.v = s.url
          JOIN xu_x xu ON xu.v = s.url
          JOIN mh_m mh ON mh.v = s.host""",
        # A4 — bloom shard assignment: canonicalized seed frontier hashed
        # with the murmur3 twin, sharded by pmod; n_bits/n_hashes are the
        # config-derived sizing constants (data-independent)
        "a4_bloom_shard_stats": f"""
          WITH RECURSIVE
          sl AS (SELECT DISTINCT {_canon_sql('url')} AS url_norm FROM {seeds}),
          {murmur3_ctes("a4", "sl", "url_norm")},
          cnt AS (SELECT {pmod_sql('h32', _CFG.n_shards)}::int AS shard,
                         count(*) AS n FROM a4_m GROUP BY 1),
          allsh AS (SELECT unnest(range({_CFG.n_shards}))::int AS shard)
          SELECT a.shard, coalesce(cnt.n, 0)::bigint AS n_items,
                 {_A4_NBITS}::bigint AS n_bits, {_A4_NHASHES}::int AS n_hashes
          FROM allsh a LEFT JOIN cnt USING (shard)""",
        # T1/T2 — the checkpointed 2-batch drain's per-batch counters,
        # rederived as one SQL statement (batch 2 consumes batch 1's
        # deferred/missed/discovered sets; dedup is an anti-join against
        # the growing seen set — the bloom+confirm two-tier path is
        # EXACT by construction, so plain set difference is its twin)
        "t1_t2_drain_2batches": t1t2_sql,
        # the pipelined drain must equal the sequential one row-for-row —
        # same chained-SQL twin, so the driver value-hashes the overlap path
        "t1p_drain_2batches_pipelined": t1t2_sql,
    }
