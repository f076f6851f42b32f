"""The URL-frontier engine — SURVEY.md §2 cat. 1/3/5/6/7/9, §3.2.

One micro-batch (``CrawlEngine.run_batch``) is a single declarative
DataFrame DAG (SURVEY.md §3.2) implementing, distributed, EXACTLY the
batch semantics of the sequential oracle (oracle_sim.py — the normative
spec; the reference crawler's nested keyword×page loop generalized per
BASELINE.json:6,14):

    scan frontier → robots gate (broadcast join + JVM longest-prefix
    match) → politeness budget (broadcast join) → two-phase per-host
    rank (skew-safe window) → drain top-K → global schedule_idx →
    fetch (join pages) → extract (Arrow UDF) → discover links →
    canonicalize+hash → bloom prefilter → exact anti-join dedup →
    enqueue → atomic snapshot commit (frontier, seen_keys, bloom
    shards, results, per-partition counters + lineage)

Determinism at any parallelism: every window/sort key ends in the unique
total tie-break ``url_norm``; no monotonically_increasing_id, no rand, no
wall clock (discovered_ts is a pure function of batch_id).  The
parallelism-invariance test (local[2] vs local[8] → identical tables,
including schedule_idx) is what makes the N-vs-4N scaling bench claim
meaningful (SURVEY.md §5.2.5).

Skew (SURVEY.md §4): the per-host politeness window is the one operator
AQE cannot fix (skew-join handling does not cover windows), so W1 runs in
two phases: rank within (host, salt) — at most ~pending/n_salts rows per
task even for a pathological host — keep local_rank ≤ budget (the global
per-host top-budget is a subset of the union of per-salt top-budgets,
since ranks only shrink when restricting to a subset), then exact rank
over host on ≤ n_salts·budget rows per host.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from . import bloom
from .oracle_sim import DEFAULT_BUDGET, DEFAULT_DRAIN_K, MAX_RETRIES, discovered_ts
from .ops import (
    global_index,
    hash32_of,
    hash64_of,
    host_of,
    is_http,
    partition_key,
    path_of,
    robots_allow,
    udf_canonicalize,
    udf_extract,
)
from .schemas import (
    BLOCKED,
    COUNTERS_SCHEMA,
    FAILED,
    FETCHED,
    FRONTIER_SCHEMA,
    PAGES_SCHEMA,
    PENDING,
    POLITENESS_SCHEMA,
    RESULTS_SCHEMA,
    ROBOTS_SCHEMA,
    SEEDS_SCHEMA,
    SEEN_KEYS_SCHEMA,
    URL_SEEN_SHARDS_SCHEMA,
)
from .storage import Checkpoint

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]
_HOST_ORDER = ["priority", "seed_rank", "depth", "url_norm"]
_SCHED_ORDER = ["priority", "seed_rank", "host_rank", "host", "url_norm"]


@dataclass
class EngineConfig:
    default_budget: int = DEFAULT_BUDGET
    drain_k: int = DEFAULT_DRAIN_K
    max_retries: int = MAX_RETRIES
    #: multiplies every per-host budget (politeness table and default).
    #: 1 = reference-faithful politeness; the throughput bench raises it
    #: so timed batches are compute-bound rather than budget-starved.
    budget_scale: int = 1
    #: drain EVERYTHING eligible each batch (no top-K cap).  Switches W3
    #: to the two-pass global-index formulation (no single-partition
    #: window, no TakeOrdered of the full frontier) — the 10^10-scale
    #: path.  Semantically identical to drain_k = +inf.
    unbounded_drain: bool = False
    n_partitions: int = 32  # logical frontier partitions (pmod(host_hash+salt, P))
    n_salts: int = 8
    n_shards: int = 64
    shard_capacity: int = 50_000
    bloom_fpp: float = 0.01
    #: directory-partition buckets for seen_keys appends (design scale:
    #: thousands — each bucket dir holds ~history/n files to prune over)
    n_seen_buckets: int = 32
    #: engage the kb-pruned confirm scan only once the history spans
    #: more than this many committed batches: pruning trades one extra
    #: driver-side job (collecting the candidate bucket list) for
    #: skipping (1 - |kbs|/n_seen_buckets) of the history scan — a loss
    #: while the whole history is a few MB, the difference between
    #: scanning GBs and TBs later.  The pruned plan itself is
    #: shape-asserted in test_plans regardless of this cutover.
    prune_confirm_after: int = 8
    #: "delta" (default): each batch commits only CHANGED frontier rows
    #: and TOUCHED bloom shards; readers merge base+deltas latest-wins
    #: (Iceberg-style merge-on-read).  Per-batch commit I/O is then
    #: ∝ batch size, not table size — at design scale the frontier is
    #: ~1 TB and the shard table ~12 GB, so full-table rewrites per
    #: batch (mode "snapshot") are fatal.  Deltas fold into a new base
    #: snapshot every ``compact_every`` batches to bound read fan-in.
    frontier_commit: str = "delta"
    compact_every: int = 8
    #: fetch J3 against the url-bucketed pages table (ingest-time layout;
    #: see bucketed_pages_table) — the mega-batch path where the URL list
    #: can't broadcast and the pages corpus must never be shuffled
    bucketed_fetch: bool = False
    #: "parquet" (default): Iceberg-shaped manifest checkpoints on plain
    #: parquet.  "iceberg": real Iceberg tables via crawlfront.iceberg
    #: (needs the runtime jar — unavailable in this sandbox, so the
    #: engine refuses early with a clear error; see iceberg.IcebergStore
    #: for the 1:1 call-site mapping)
    storage: str = "parquet"
    #: URL-seen prefilter structure: "bloom" (default) or "cuckoo"
    #: (crawlfront.cuckoo — deletable fingerprints, ≤2 bucket reads per
    #: probe).  Both are prefilters only; J4's exact anti-join keeps
    #: correctness independent of filter FPP.
    seen_filter: str = "bloom"
    #: Lineage barrier for the heavy reused per-batch frames (MOR views,
    #: discovery chain).  "persist": cache only — every downstream plan
    #: re-embeds the full producing tree, and because Catalyst trees
    #: expand shared subtrees along every DAG path, the *expanded* tree
    #: grows multiplicatively with MOR delta fan-in (observed: 170 MB
    #: plan renderings, with the matching serial driver-side analyzer
    #: cost paid inside every sink job submission).  "localckpt":
    #: ``localCheckpoint(eager=False)`` — the same one-time
    #: materialization the persist already does, but downstream plans
    #: see a compact scan-of-RDD leaf, so per-sink Catalyst work is O(1)
    #: in delta fan-in.  Trade-off: checkpointed partitions are not
    #: recomputable on executor loss; the batch loop's answer is
    #: idempotent batch retry from the last manifest (test_resume), so a
    #: lost block fails one batch attempt, never correctness.  Default
    #: localckpt: measured 2x batch wall at sandbox scale (sinks 9-13 s
    #: -> ~2 s), and the win GROWS with delta fan-in; flip to "persist"
    #: on clusters where executor loss is routine and batch retries are
    #: expensive (mode equivalence pinned by test_plan_barrier).
    plan_barrier: str = "localckpt"
    #: Materialize the fetch+extract barrier (``ex``) with a dedicated
    #: count() before any concurrent consumer is submitted.  All five
    #: sinks and the discovery legs fan out from ex; left lazy, the
    #: concurrent first touch parks the losing jobs' tasks on the block
    #: manager's per-partition cache lock, each parked task occupying a
    #: scheduler slot (stage profiles at sf0.1 showed three 114-task
    #: consumer stages burning ~50 s of slot time each at ~3 s cpu).
    #: Sandbox A/B (5 interleaved pairs sf0.1 + 1 pair sf2): WALL-NEUTRAL
    #: within the noise band — parked tasks don't burn cpu and local mode
    #: has no other tenant for the wasted slots.  Kept ON for cluster
    #: semantics (a parked task holds a real executor slot that dynamic
    #: allocation or a co-tenant stage could use) and because it isolates
    #: the map phase as its own timing mark.
    eager_map: bool = True
    #: Double-buffered drain (run_pipelined): batch k+1 plans and
    #: materializes its map phase against batch k's IN-MEMORY next-state
    #: views while batch k's five sinks flush in the background; manifest
    #: commits stay strictly batch-ordered, so crash-resume semantics are
    #: unchanged (an interrupted pipeline resumes from the last committed
    #: manifest and deterministically reproduces the same batches —
    #: pinned by test_pipelined).  Motivation: the measured drain profile
    #: is ~45% sink wall that is core-count-invariant (single-disk +
    #: task-scheduling floor, BENCH_r02 per-batch decomposition).
    #: Measured A/B (interleaved fresh-JVM repeats, local[32]): at sf2 —
    #: where the sinks are real I/O — pipelined wins 26.7/26.9 s vs
    #: 29.3/34.9 s sequential (835 vs 763 urls/s best-of, ~1.1-1.2×); at
    #: sf0.1 — where commits are 0.9 MB and the sinks are pure
    #: scheduling/CPU overhead — it LOSES ~15% (both phases contend for
    #: the same saturated cores: plan 3.7→7 s, sinks 3.8→7.9 s under
    #: overlap).  Default OFF: flip it on when sink wall is genuine I/O
    #: wait (big batches locally, object-store commits on a cluster),
    #: keep it off for metadata-sized commits.
    pipelined_drain: bool = False
    #: Bucket-aligned frontier state (SURVEY §7.3(6) / VERDICT r2 item 6):
    #: frontier snapshots AND deltas are written as url_norm-bucketed,
    #: url_norm-sorted catalog tables (the plain-parquet stand-in for an
    #: Iceberg bucket(url_norm) partition transform, mirroring
    #: bucketed_pages_table).  The merge-on-read view then becomes a
    #: chain of bucketed-scan anti-joins instead of union+window — NO
    #: Exchange anywhere in the view (plan-asserted in test_plans): at
    #: 10^10 rows the un-bucketed MOR merge re-shuffles base+deltas
    #: (≈ the whole ~1 TB frontier) at every batch's first read, the one
    #: per-batch full-table exchange left after round 2.
    bucketed_state: bool = False
    #: Checkpoint GC (Iceberg ``expireSnapshots`` parity): after each
    #: commit, delete snapshot/delta dirs + manifest files older than the
    #: newest ``expire_keep_last`` manifests (Checkpoint.expire_snapshots).
    #: None = keep all history (time travel to any batch).  With expiry
    #: on, a long-running drain's on-disk snapshot-table footprint
    #: plateaus at O(keep_last × table) instead of O(batches × table)
    #: (pinned by test_resume's expiry soak).  Append tables (results/
    #: counters/seen_keys) are never expired — they are the crawl output
    #: and the dedup history.  Pipelined drains need keep_last ≥ 2
    #: (enforced): flush(k+1) overlaps planning that may still bind to
    #: manifest k's paths.
    expire_keep_last: int | None = None


# --- scans (S1-S4) ---------------------------------------------------------


def scan_pages(spark: SparkSession, fixture_dir: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(str(Path(fixture_dir) / "pages.parquet"))


def scan_seeds(spark: SparkSession, fixture_dir: str) -> DataFrame:
    return spark.read.schema(SEEDS_SCHEMA).parquet(str(Path(fixture_dir) / "seeds.parquet"))


def scan_robots(spark: SparkSession, fixture_dir: str) -> DataFrame:
    return spark.read.schema(ROBOTS_SCHEMA).parquet(str(Path(fixture_dir) / "robots.parquet"))


def scan_politeness(spark: SparkSession, fixture_dir: str) -> DataFrame:
    return spark.read.schema(POLITENESS_SCHEMA).parquet(
        str(Path(fixture_dir) / "politeness.parquet")
    )


# --- plan builders (shared by the checkpointed loop and the pure queries) --


def frontier_from_seeds(seeds: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Batch-0 frontier: canonicalize, dedup by url_norm (min seed wins),
    derive host/hashes/salt/partition columns.  Matches oracle init."""
    s = seeds.withColumn("url_norm", udf_canonicalize("url"))
    s = (
        s.groupBy("url_norm")
        .agg(F.min(F.struct("seed_rank", "priority", "url")).alias("m"))
        .select("url_norm", "m.url", "m.seed_rank", "m.priority")
    )
    return _with_frontier_cols(
        s, depth=F.lit(0), discovered_batch=0, state=PENDING, cfg=cfg
    ).select(*FRONTIER_COLS)


def _with_frontier_cols(df: DataFrame, depth, discovered_batch: int, state: str,
                        cfg: EngineConfig) -> DataFrame:
    return (
        df.withColumn("url_hash32", hash32_of("url_norm"))
        .withColumn("url_hash64", hash64_of("url_norm"))
        .withColumn("host", host_of("url_norm"))
        .withColumn("host_hash", hash32_of(F.col("host")))
        .withColumn("salt", F.pmod(F.col("url_hash64"), F.lit(cfg.n_salts)).cast("int"))
        .withColumn("depth", depth.cast("int"))
        .withColumn("discovered_batch", F.lit(discovered_batch).cast("long"))
        .withColumn(
            "discovered_ts", F.lit(discovered_ts(discovered_batch)).cast("timestamp")
        )
        .withColumn("state", F.lit(state))
        .withColumn("retry_count", F.lit(0).cast("int"))
        .withColumn("priority", F.col("priority").cast("int"))
        .withColumn("seed_rank", F.col("seed_rank").cast("int"))
    )


def gate_and_schedule(
    pending: DataFrame,
    robots: DataFrame,
    politeness: DataFrame,
    cfg: EngineConfig,
    base_idx: int = 0,
):
    """J1/P5 → J2 → W1 (two-phase) / W2 → O1 → W3.

    Returns (scheduled, blocked, allowed, eligible):
      - scheduled: top drain_k eligible rows + ``schedule_idx``
      - blocked: robots-denied pending rows (frontier cols only)
      - allowed / eligible: intermediate sets, for counters
    """
    g = pending.join(
        F.broadcast(robots.select("host", "rules")), "host", "left"
    ).withColumn("allow", robots_allow(path_of("url_norm"), F.col("rules")))
    blocked = g.filter(~F.col("allow")).select(
        *[F.lit(BLOCKED).alias(c) if c == "state" else F.col(c) for c in FRONTIER_COLS]
    )
    allowed = g.filter(F.col("allow")).drop("rules", "allow")

    p = allowed.join(F.broadcast(politeness), "host", "left").withColumn(
        "budget",
        F.coalesce(F.col("budget"), F.lit(cfg.default_budget)) * F.lit(cfg.budget_scale),
    )
    # W1 phase 1: skew-safe local rank within (host, salt)
    w_local = Window.partitionBy("host", "salt").orderBy(*_HOST_ORDER)
    local = p.withColumn("local_rank", F.row_number().over(w_local)).filter(
        F.col("local_rank") <= F.col("budget")
    )
    # W1 phase 2: exact per-host rank over the pruned set (≤ n_salts·budget rows/host)
    w_host = Window.partitionBy("host").orderBy(*_HOST_ORDER)
    ranked = local.withColumn("host_rank", F.row_number().over(w_host))
    eligible = ranked.filter(F.col("host_rank") <= F.col("budget"))

    if cfg.unbounded_drain:
        # O1 skipped (K = +inf); W3 via the two-pass range-partitioned
        # index — no serial stage anywhere in the schedule path
        scheduled = global_index(
            eligible, _SCHED_ORDER, cfg.n_partitions, "schedule_idx", base=base_idx
        )
    else:
        # O1: distributed top-K (TakeOrderedAndProject) on the total schedule key
        scheduled = eligible.orderBy(*_SCHED_ORDER).limit(cfg.drain_k)
        # W3: global schedule_idx via the same range-partitioned two-pass
        # index as the unbounded path (the ordering is total — tie-break
        # url_norm — so the indices are identical either way).  A plain
        # window here would be unpartitioned: Catalyst folds any literal
        # partitionBy away, leaving a WindowExec that warns on every
        # drain plan execution even though the post-limit input is a
        # single partition already.
        scheduled = global_index(
            scheduled, _SCHED_ORDER, cfg.n_partitions, "schedule_idx", base=base_idx
        )
    return scheduled, blocked, allowed, eligible


def fetch_prefilter(pages: DataFrame, urls: DataFrame, bounded: bool) -> DataFrame:
    """The J3 semi-join that prunes the pages corpus to the scheduled
    URL set.  Bounded drains broadcast the (≤drain_k) URL list; for
    unbounded mega-batches no hint is applied — and when ``pages`` is
    the url-bucketed table (``bucketed_pages_table``), the planner joins
    it WITHOUT shuffling the pages side at all: the bucketed scan
    already satisfies the join's hash-partitioning requirement, so only
    the URL list is exchanged (plan-asserted in test_plans)."""
    return pages.select("url", "html").join(
        F.broadcast(urls) if bounded else urls, "url", "left_semi"
    )


def bucketed_pages_table(spark: SparkSession, fixture_dir: str,
                         n_buckets: int = 32) -> str:
    """Register (writing once per fixture dir) a url-bucketed copy of
    the pages table and return its catalog name.

    This is the ingest-time layout the 10^10-scale fetch needs: at that
    size the per-batch URL list can never broadcast (8 GB BroadcastExchange
    hard limit) and an unbucketed SMJ would re-shuffle the ~100 TB html
    corpus EVERY batch.  Bucketing pages by url once at ingest makes the
    fetch semi-join exchange-free on the pages side forever after — the
    plain-parquet stand-in for an Iceberg table with a bucket(url)
    partition transform (SURVEY.md §0.3).  The bucketed copy lives next
    to the fixtures (gitignored) and is reused across sessions via
    CREATE TABLE ... CLUSTERED BY DDL."""
    import hashlib

    fdir = Path(fixture_dir).resolve()
    tag = hashlib.md5(f"{fdir}|{n_buckets}".encode()).hexdigest()[:10]
    name = f"pages_bkt_{tag}"
    if spark.catalog.tableExists(name):
        return name
    path = fdir / f"pages_bucketed_{n_buckets}"
    if path.exists():
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in PAGES_SCHEMA.fields
        )
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"CLUSTERED BY (url) SORTED BY (url) INTO {n_buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
    else:
        (
            scan_pages(spark, str(fdir))
            .write.bucketBy(n_buckets, "url")
            .sortBy("url")
            .option("path", str(path))
            .saveAsTable(name)
        )
    return name


def fetch_and_extract(scheduled: DataFrame, pages: DataFrame,
                      bounded: bool = True) -> DataFrame:
    """J3 + D3: resolve each scheduled URL to its page bytes, run the
    extraction UDF.  Left join — a miss is a fetch failure (retry path).

    Join strategy (SURVEY.md §4): when the drain is BOUNDED the scheduled
    URL LIST is tiny (capped at drain_k) while pages carries the wide
    ``html`` column, so the urls are broadcast for a semi-join prefilter
    of pages — the full corpus is scanned but never SHUFFLED (no 100-TB
    html exchange; a plain SMJ here shuffles the whole pages table every
    batch).  With ``bounded=False`` (EngineConfig.unbounded_drain) the
    scheduled set is the whole eligible frontier slice and CANNOT be
    broadcast (at 10^10 scale it exceeds Spark's 8 GB BroadcastExchange
    limit and OOMs the driver), so no hint is applied: AQE picks the
    strategy at runtime, and the scale path is the bucketed pages table
    (see fetch_bucketed / storage.write_bucketed_pages) where the
    semi-join is an exchange-free SMJ on the pages side.  The surviving
    pages then left-join back to scheduled; ``html`` is projected only
    here, never upstream (column-pruning design rule)."""
    wanted = fetch_prefilter(pages, scheduled.select("url"), bounded)
    # extract BEFORE the join-back: the UDF runs inside the scan stage
    # (no shuffle upstream of it), and the join then exchanges extracted
    # text instead of raw html — roughly half the shuffle bytes when a
    # mega-batch fetches most of the corpus
    extracted = (
        wanted.filter(F.col("html").isNotNull())
        .withColumn("ex", udf_extract("html", "url"))
        .drop("html")
    )
    fetched = scheduled.join(extracted, "url", "left")
    # a miss (url absent from pages, or null html) is a fetch failure
    return fetched.withColumn("hit", F.col("ex").isNotNull())


def results_from_extract(ex: DataFrame, batch_id: int) -> DataFrame:
    """Explode per-result records (W4 rank comes from the extractor's
    in-page order, like the reference's SERP emission order)."""
    hits = ex.filter(F.col("hit"))
    return hits.select(
        "url",
        F.lit(batch_id).cast("long").alias("batch_id"),
        "schedule_idx",
        F.explode("ex.results").alias("r"),
        F.col("ex.text").alias("text"),
    ).select(
        "url", "batch_id", "schedule_idx",
        F.col("r.rank").alias("rank"), F.col("r.title").alias("title"),
        F.col("r.abstract").alias("abstract"), F.col("r.link").alias("link"),
        "text",
    )


def _unpersist_barrier(df: DataFrame) -> None:
    """Free a ``_bar`` frame's storage at batch end.  persist-mode frames
    release through the SQL cache manager, but a localCheckpoint frame
    persists its RDD OUTSIDE it — ``DataFrame.unpersist`` is a silent
    no-op there, leaking each batch's biggest frames (ex carries the
    extracted text) until JVM GC happens to collect the RDD handle.  The
    block release must go through the checkpointed RDD on the LogicalRDD
    plan node instead."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — py4j surface drift: fall through
        pass
    df.unpersist()


def discover_candidates(ex: DataFrame, cfg: EngineConfig, batch_id: int) -> DataFrame:
    """Outlinks of fetched pages → canonical candidates, one row per
    distinct url_norm (deterministic min-struct parent pick)."""
    links = (
        ex.filter(F.col("hit"))
        .select("seed_rank", "depth", F.explode("ex.links").alias("link"))
        .withColumn("url_norm", udf_canonicalize("link"))
        .filter(is_http(F.col("url_norm")))
    )
    cand = (
        links.groupBy("url_norm")
        .agg(
            F.min(
                F.struct(
                    (F.col("depth") + 1).alias("priority"),
                    F.col("seed_rank").alias("seed_rank"),
                    (F.col("depth") + 1).alias("depth"),
                    F.col("link").alias("url"),
                )
            ).alias("m")
        )
        .select("url_norm", "m.priority", "m.seed_rank", "m.depth", "m.url")
    )
    return _with_frontier_cols(
        cand, depth=F.col("depth"), discovered_batch=batch_id, state=PENDING, cfg=cfg
    ).select(*FRONTIER_COLS)


def seen_bucket(url_hash64, n_buckets: int):
    """The seen_keys directory-partition bucket of a URL key."""
    c = F.col(url_hash64) if isinstance(url_hash64, str) else url_hash64
    return F.pmod(c, F.lit(n_buckets)).cast("int")


def confirm_unseen(seen: DataFrame, maybe: DataFrame, kbs: list[int],
                   bounded: bool = True) -> DataFrame:
    """J4 exact confirm — the anti-join that makes bloom-positive
    candidates exact, designed so the 10^10-row seen-keys HISTORY is
    never shuffled or sorted (VERDICT r1 item 3):

    1. partition pruning: the scan reads only ``seen_keys/batch=*/kb=K``
       directories for the buckets ``kbs`` the candidates hash into
       (literal ``kb IN (...)`` → PartitionFilters at the source);
    2. the (small, bloom-positive-only) candidate set broadcasts into a
       LEFT-SEMI against the pruned history — the history side streams
       map-side: no Exchange, no Sort on the big side;
    3. the resulting hit set (≤ |maybe|) anti-joins back — both sides
       tiny.

    With ``bounded=False`` (mega-batch discovery) the broadcast hint is
    dropped and AQE picks the strategy — the pruning in (1) still holds.
    ``maybe`` needs (url_norm); ``kbs`` is the pre-collected distinct
    bucket list (≤ n_seen_buckets ints — driver-side metadata, not data).
    """
    pruned = seen.filter(F.col("kb").isin(kbs)) if kbs else seen
    m = maybe.select("url_norm")
    hits = pruned.join(F.broadcast(m) if bounded else m, "url_norm", "left_semi")
    return m.join(hits.select("url_norm"), "url_norm", "left_anti")


def refresh_gates(pending: DataFrame, politeness: DataFrame, cfg: EngineConfig,
                  n_hot: int = 10, hot_budget: int = 2):
    """SURVEY.md §3.2 entry point (2) — the proxy-pool-refresh analog:
    recompute the gating tables from frontier pressure (A1/O3 stats).

    Returns ``(new_politeness, hot_hosts)``:
    - ``hot_hosts``: top-``n_hot`` hosts by pending count (deterministic
      total order: count desc, host asc) — the salt-candidate list; the
      frontier's salt column spreads exactly these hosts' rows across
      partitions.
    - ``new_politeness``: explicit budgets are preserved; hot hosts
      WITHOUT an explicit budget get ``hot_budget`` (pressure-triggered
      pacing, like the reference demoting a banned proxy); everything
      else keeps the default implicitly.
    """
    stats = pending.groupBy("host").agg(F.count("*").alias("n_pending"))
    hot = stats.orderBy(F.desc("n_pending"), F.asc("host")).limit(n_hot)
    hot_pol = hot.join(F.broadcast(politeness), "host", "left").select(
        "host",
        F.coalesce(F.col("budget"), F.lit(hot_budget)).cast("int").alias("budget"),
    )
    rest_pol = politeness.join(F.broadcast(hot.select("host")), "host", "left_anti")
    return hot_pol.unionByName(rest_pol), hot


# --- the engine ------------------------------------------------------------


class _PlannedBatch:
    """Everything ``CrawlEngine._plan_batch`` computed for one batch,
    handed to ``_flush_batch`` — and, in pipelined mode, to the NEXT
    batch's plan via the ``next_frontier``/``next_shards``/``seen_delta``
    in-memory views (which contain, by construction, exactly the rows the
    committed files will hold once this batch's flush lands)."""

    def __init__(self, b: int, base_idx: int, man: dict):
        self.b = b
        self.base_idx = base_idx
        self.man = man
        self.timings: dict = {}
        self._n_scheduled: int | None = None
        self._seen_delta: DataFrame | None = None
        # populated by _plan_batch:
        #   pool, fut_results, cobs, timed, mark, n_scheduled, next_manifest,
        #   write_frontier/write_shards/write_seen/write_counters,
        #   frontier_base, f_deltas, f_compact, url_seen_base, u_deltas,
        #   u_compact, scheduled, ex, cached, persisted,
        #   next_frontier, next_shards, seen_delta


class CrawlEngine:
    """Checkpointed multi-batch crawl loop (T1/T2).

    Every batch is a pure function of the previous committed snapshot —
    that is what makes resume-equivalence and parallelism-invariance
    provable.  All state lives in the Checkpoint (storage.py); nothing is
    carried driver-side between batches except the manifest pointer.
    """

    def __init__(self, spark: SparkSession, fixture_dir: str | Path,
                 ckpt_dir: str | Path, cfg: EngineConfig | None = None):
        self.spark = spark
        self.fixture_dir = str(fixture_dir)
        self.ckpt = Checkpoint(ckpt_dir)
        self.cfg = cfg or EngineConfig()
        self._sink_pool = None  # in-flight concurrent-sink pool (see run_batch)
        if self.cfg.storage == "iceberg":
            from .iceberg import IcebergStore

            # probes the classpath and raises a clear error without the
            # runtime jar; with it, the store exposes the writeTo/append/
            # time-travel surface the four write call-sites below map to
            self.iceberg = IcebergStore(spark)
        elif self.cfg.storage != "parquet":
            raise ValueError(f"unknown storage backend {self.cfg.storage!r}")
        if self.cfg.seen_filter == "bloom":
            self._n_bits, self._n_hashes = bloom.bloom_params(
                self.cfg.shard_capacity, self.cfg.bloom_fpp
            )
        elif self.cfg.seen_filter == "cuckoo":
            from . import cuckoo

            self._n_buckets = cuckoo.cuckoo_params(self.cfg.shard_capacity)
        else:
            raise ValueError(f"unknown seen_filter {self.cfg.seen_filter!r}")

    # --- URL-seen filter dispatch (bloom | cuckoo, same cogroup shape) --
    @property
    def _filter_schema(self):
        if self.cfg.seen_filter == "cuckoo":
            from .cuckoo import CUCKOO_SHARDS_SCHEMA

            return CUCKOO_SHARDS_SCHEMA
        return URL_SEEN_SHARDS_SCHEMA

    def _filter_empty(self) -> DataFrame:
        if self.cfg.seen_filter == "cuckoo":
            from . import cuckoo

            return cuckoo.empty_shards(self.spark, self.cfg.n_shards, self._n_buckets)
        return bloom.empty_shards(
            self.spark, self.cfg.n_shards, self._n_bits, self._n_hashes
        )

    def _filter_update(self, old: DataFrame, keys: DataFrame, batch_id: int) -> DataFrame:
        if self.cfg.seen_filter == "cuckoo":
            from . import cuckoo

            return cuckoo.update_shards(
                old, keys, self.cfg.n_shards, self._n_buckets, batch_id
            )
        return bloom.update_shards(
            old, keys, self.cfg.n_shards, self._n_bits, self._n_hashes, batch_id
        )

    def _filter_probe(self, cand: DataFrame, shards: DataFrame,
                      passthrough: list[str]) -> DataFrame:
        mod = bloom
        if self.cfg.seen_filter == "cuckoo":
            from . import cuckoo as mod  # noqa: PLC0415
        return mod.probe(cand, shards, self.cfg.n_shards,
                         passthrough_cols=passthrough)

    def _filter_shard_col(self, h32_col):
        """The backend's shard key — routed through the same dispatch as
        update/probe so the touched-shard pruning in write_shards can
        never diverge from the expression the probe actually uses."""
        mod = bloom
        if self.cfg.seen_filter == "cuckoo":
            from . import cuckoo as mod  # noqa: PLC0415
        return mod.shard_col(h32_col, self.cfg.n_shards)

    # --- snapshot IO ---
    def _read(self, table: str, schema) -> DataFrame:
        return self.spark.read.schema(schema).parquet(self.ckpt.table_path(table))

    def _write_snapshot(self, df: DataFrame, table: str, batch_id: int,
                        partition_expr=None) -> None:
        out = df
        if partition_expr is not None:
            out = df.repartition(self.cfg.n_partitions, partition_expr)
        out.write.mode("overwrite").parquet(self.ckpt.snapshot_dir(table, batch_id))

    def _write_delta(self, df: DataFrame, table: str, batch_id: int,
                     partition_expr=None) -> None:
        out = df
        if partition_expr is not None:
            out = df.repartition(self.cfg.n_partitions, partition_expr)
        out.write.mode("overwrite").parquet(self.ckpt.delta_dir(table, batch_id))

    def _base_id(self, man: dict, table: str) -> int:
        """Snapshot batch id the manifest's table pointer names."""
        return int(man["tables"][table].rsplit("-", 1)[1])

    def _merge_mor(self, table: str, schema, deltas: list[int], key: str) -> DataFrame:
        """Merge-on-read: base snapshot ∪ committed deltas, newest
        version of each ``key`` wins (delta order is the version order —
        a key appears at most once per delta by construction).  The
        window is keyed, not global — it scales with the table."""
        from functools import reduce

        pieces = [self._read(table, schema).withColumn("_v", F.lit(0))]
        for i, db in enumerate(deltas, start=1):
            d = self.spark.read.schema(schema).parquet(self.ckpt.delta_dir(table, db))
            pieces.append(d.withColumn("_v", F.lit(i)))
        merged = reduce(DataFrame.unionByName, pieces)
        w = Window.partitionBy(key).orderBy(F.desc("_v"))
        return (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_v", "_rn")
        )

    # --- bucket-aligned frontier state (cfg.bucketed_state) -------------
    def _bucket_table_name(self, table: str, kind: str, batch_id: int) -> str:
        import hashlib

        tag = hashlib.md5(str(self.ckpt.root.resolve()).encode()).hexdigest()[:10]
        return f"cf_{tag}_{table}_{kind}_{batch_id}"

    def _write_bucketed(self, df: DataFrame, table: str, kind: str,
                        batch_id: int) -> None:
        """Write a snapshot/delta as a url_norm-bucketed, url_norm-sorted
        catalog table at the SAME checkpoint path the plain writer uses
        (the manifest layout is unchanged; only the file organization and
        the catalog bucket spec differ).  Repartitioned on url_norm first
        so each task owns one bucket — one file per bucket, not
        tasks × buckets small files."""
        import shutil as _sh

        path = (self.ckpt.snapshot_dir if kind == "snap"
                else self.ckpt.delta_dir)(table, batch_id)
        name = self._bucket_table_name(table, kind, batch_id)
        if self.spark.catalog.tableExists(name):
            self.spark.sql(f"DROP TABLE {name}")
        _sh.rmtree(path, ignore_errors=True)  # overwrite semantics on retry
        (
            df.repartition(self.cfg.n_partitions, F.col("url_norm"))
            .write.bucketBy(self.cfg.n_partitions, "url_norm")
            .sortBy("url_norm")
            .option("path", path)
            .saveAsTable(name)
        )

    def _read_bucketed(self, table: str, kind: str, batch_id: int) -> DataFrame:
        """Catalog-scan of a bucketed snapshot/delta — registering the
        external table first when this session didn't write it (resume in
        a fresh session): bucket metadata lives in the catalog, so a
        plain parquet read would lose the exchange-free property."""
        name = self._bucket_table_name(table, kind, batch_id)
        if not self.spark.catalog.tableExists(name):
            path = (self.ckpt.snapshot_dir if kind == "snap"
                    else self.ckpt.delta_dir)(table, batch_id)
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in FRONTIER_SCHEMA.fields
            )
            self.spark.sql(
                f"CREATE TABLE {name} ({cols}) USING PARQUET "
                f"CLUSTERED BY (url_norm) SORTED BY (url_norm) "
                f"INTO {self.cfg.n_partitions} BUCKETS LOCATION '{path}'"
            )
        return self.spark.table(name)

    def _merge_mor_bucketed(self, man: dict, deltas: list[int]) -> DataFrame:
        """Exchange-free merge-on-read over bucketed state: newest-wins =
        ⊎_i (piece_i ANTI piece_{i+1} ANTI … ANTI piece_N), newest piece
        unfiltered.  Every anti-join is bucketed-scan vs bucketed-scan on
        the bucket key, and LeftAnti preserves the left side's
        partitioning, so the whole view plans with ZERO Exchange
        (asserted in test_plans) — where union+window re-shuffles
        base+deltas every read.  A full-outer-join fold would NOT work:
        FullOuter SMJ reports UnknownPartitioning, re-introducing an
        exchange from the second join on.  Join count is O(d²/2) with
        d ≤ compact_every deltas, each right side batch-sized."""
        pieces = [self._read_bucketed("frontier", "snap",
                                      self._base_id(man, "frontier"))]
        pieces += [self._read_bucketed("frontier", "delta", db) for db in deltas]
        legs = []
        for i, piece in enumerate(pieces):
            leg = piece
            for newer in pieces[i + 1:]:
                leg = leg.join(newer.select("url_norm"), "url_norm", "left_anti")
            legs.append(leg)
        from functools import reduce

        # the USING-column join fronts url_norm — restore schema order
        return reduce(DataFrame.unionByName, legs).select(*FRONTIER_COLS)

    def frontier(self) -> DataFrame:
        man = self.ckpt.manifest() or {}
        deltas = man.get("frontier_deltas", [])
        if self.cfg.bucketed_state:
            if not deltas:
                return self._read_bucketed("frontier", "snap",
                                           self._base_id(man, "frontier"))
            return self._merge_mor_bucketed(man, deltas)
        if not deltas:
            return self._read("frontier", FRONTIER_SCHEMA)
        return self._merge_mor("frontier", FRONTIER_SCHEMA, deltas, key="url_norm")

    def seen_keys(self) -> DataFrame:
        """Union of the committed per-batch key appends (append-only —
        the write per batch is O(new keys), not O(all history)).  Each
        append is directory-partitioned by ``kb`` so the J4 confirm leg
        prunes the scan to candidate buckets (confirm_unseen)."""
        man = self.ckpt.manifest() or {}
        return self._seen_union(man.get("seen_batches", []))

    def _seen_union(self, batches: list[int]) -> DataFrame:
        if not batches:
            return self.spark.createDataFrame([], SEEN_KEYS_SCHEMA)
        # one scan per committed append dir, unioned — uncommitted
        # (crash-orphan) batch dirs are never even LISTED, preserving the
        # manifest-gating contract; basePath per dir makes kb a real
        # partition column so the confirm leg's kb filter is pushed
        # through the union into every scan as a partition filter
        from functools import reduce

        dfs = [
            self.spark.read.schema(SEEN_KEYS_SCHEMA)
            .option("basePath", self.ckpt.append_dir("seen_keys", sb))
            .parquet(self.ckpt.append_dir("seen_keys", sb))
            for sb in batches
        ]
        return reduce(DataFrame.unionByName, dfs)

    def _write_seen_append(self, rows: DataFrame, batch_id: int) -> None:
        """O(new keys) append, kb-partitioned for pruned confirm scans.
        Repartitioned ON kb first — without it every write task emits a
        file into every kb dir (tasks × buckets small files per batch:
        measured 40% slower batches at sf0.1 from listing alone)."""
        (
            rows.select(
                "url_norm", "url_hash64",
                seen_bucket("url_hash64", self.cfg.n_seen_buckets).alias("kb"),
            )
            .repartition(self.cfg.n_seen_buckets, F.col("kb"))
            .write.mode("overwrite")
            .partitionBy("kb")
            .parquet(self.ckpt.append_dir("seen_keys", batch_id))
        )

    def shards(self) -> DataFrame:
        man = self.ckpt.manifest() or {}
        deltas = man.get("url_seen_deltas", [])
        if not deltas:
            return self._read("url_seen", self._filter_schema)
        return self._merge_mor("url_seen", self._filter_schema, deltas, key="shard")

    def results(self) -> DataFrame:
        paths = self.ckpt.append_paths("results")
        if not paths:
            return self.spark.createDataFrame([], RESULTS_SCHEMA)
        return self.spark.read.schema(RESULTS_SCHEMA).parquet(*paths)

    def counters(self) -> DataFrame:
        paths = self.ckpt.append_paths("counters")
        if not paths:
            return self.spark.createDataFrame([], COUNTERS_SCHEMA)
        return self.spark.read.schema(COUNTERS_SCHEMA).parquet(*paths)

    # --- batch 0 ---
    def init(self) -> None:
        if self.ckpt.current_batch() >= 0:
            return
        cfg = self.cfg
        seeds = scan_seeds(self.spark, self.fixture_dir)
        f0 = frontier_from_seeds(seeds, cfg)
        if cfg.bucketed_state:
            self._write_bucketed(f0, "frontier", "snap", 0)
        else:
            self._write_snapshot(
                f0, "frontier", 0, partition_key("host_hash", "salt", cfg.n_partitions)
            )
        f0c = self.spark.read.schema(FRONTIER_SCHEMA).parquet(self.ckpt.snapshot_dir("frontier", 0))
        self._write_seen_append(f0c, 0)
        shards0 = self._filter_update(
            self._filter_empty(), f0c.select("url_hash32", "url_hash64"), batch_id=0
        )
        self._write_snapshot(shards0, "url_seen", 0)
        self.ckpt.commit(
            0, {"frontier": 0, "url_seen": 0},
            extra={"next_idx": 0, "seen_batches": [0],
                   "frontier_deltas": [], "url_seen_deltas": []},
            append_batch=False,
        )

    # --- one micro-batch -------------------------------------------------
    #
    # run_batch is split into PLAN (build every frame, materialize the map
    # phase, kick off the early results write) and FLUSH (write the
    # remaining sinks, commit the manifest, read the metrics back).  The
    # sequential path runs plan→flush back-to-back — the same jobs in the
    # same order as the pre-split implementation; the pipelined drain
    # (run_pipelined) overlaps batch k's FLUSH with batch k+1's PLAN.

    def _plan_batch(self, man: dict, live: _PlannedBatch | None = None) -> _PlannedBatch:
        import time as _time

        cfg = self.cfg
        b = man["batch_id"] + 1
        base_idx = man["next_idx"]
        pk = partition_key("host_hash", "salt", cfg.n_partitions)
        p = _PlannedBatch(b=b, base_idx=base_idx, man=man)
        timings = p.timings
        _t0 = _time.monotonic()

        def _mark(phase: str) -> None:
            nonlocal _t0
            now = _time.monotonic()
            timings[phase] = round(now - _t0, 3)
            _t0 = now

        # persisted ONLY in delta/pipelined mode, where frontier() and
        # shards() are merge-on-read views or in-memory unions — the
        # branches below (pending/rest, probe, shard update) must not
        # re-run the merge.  In snapshot mode they are plain parquet
        # scans: re-scanning is cheaper than caching.
        def _bar(df: DataFrame) -> DataFrame:
            """Materialize-once barrier (cfg.plan_barrier).  localckpt
            additionally truncates logical lineage, so downstream sink
            plans stay O(1) in MOR delta fan-in.  NOT applied to frames
            carrying an Observation (the metrics need a SQL-execution
            first touch, which an RDD checkpoint job is not)."""
            if cfg.plan_barrier == "localckpt":
                return df.localCheckpoint(eager=False)
            return df.persist()

        if live is not None:
            # pipelined mode: bind to the PREVIOUS batch's in-memory
            # next-state views instead of its (possibly still-flushing)
            # committed files.  The views hold exactly the rows the commit
            # will publish — same frames feed both — so this plan sees the
            # state a resume would read from disk.  The barriers both cut
            # lineage (the chain of batches must not accrete into one
            # plan) and pin the frames the previous batch persisted.
            frontier = _bar(live.next_frontier)
            shards = _bar(live.next_shards)
            # the seen view unions COMMITTED appends (batches ≤ k-1, all
            # durable: flush(k-1) finished before this plan started) with
            # the previous batch's in-memory key delta — never a recursive
            # chain of views, which would pin every ancestor's frames
            seen = self._seen_union(live.man.get("seen_batches", [])).unionByName(
                live.seen_delta()
            )
            cached = [frontier, shards]
        else:
            frontier = self.frontier()
            shards = self.shards()
            seen = self.seen_keys()
            cached = []
            if man.get("frontier_deltas"):
                frontier = _bar(frontier)
                cached.append(frontier)
            if man.get("url_seen_deltas"):
                shards = _bar(shards)
                cached.append(shards)
        pending = frontier.filter(F.col("state") == PENDING)
        rest = frontier.filter(F.col("state") != PENDING)
        robots = scan_robots(self.spark, self.fixture_dir)
        politeness = scan_politeness(self.spark, self.fixture_dir)

        # The gate outputs are re-read by the frontier transition, the
        # counters, and the discovery legs — persist them once instead of
        # re-running the scan→join→window→top-k pipeline per action.
        # S7: n_scheduled is counted lazily (memoized) from scheduled's
        # already-materialized barrier blocks (an O(partitions) cache
        # scan, no recompute) — which frees scheduled to be lineage-
        # barriered (an Observation here would never fire: localCheckpoint
        # materialization is an RDD job, not a SQL execution, so its
        # CollectMetrics never reports).
        #
        # Barrier placement: each _bar call has a fixed construction cost
        # (physical planning + RDD creation), so ONLY the multiplicity
        # sources get one — the MOR views above (quadratic in delta
        # fan-in) and the two frames every downstream leg fans out from
        # (scheduled, ex).  The shallow single-purpose frames (blocked/
        # allowed/eligible/discovery chain) stay persist(): their trees
        # are one or two operators over a barrier leaf, so re-analysis
        # per consumer is cheap.
        scheduled, blocked, allowed, eligible = gate_and_schedule(
            pending, robots, politeness, cfg, base_idx
        )
        # persist BEFORE compiling scheduled's barrier: the planner then
        # substitutes eligible's InMemoryRelation into scheduled's plan,
        # so materializing scheduled fills the cache the counter legs read
        blocked = blocked.persist()
        allowed = allowed.persist()
        eligible = eligible.persist()
        scheduled = _bar(scheduled)
        pages = (
            self.spark.table(
                bucketed_pages_table(self.spark, self.fixture_dir, cfg.n_partitions)
            )
            if cfg.bucketed_fetch
            else scan_pages(self.spark, self.fixture_dir)
        )
        ex = _bar(fetch_and_extract(scheduled, pages,
                                    bounded=not cfg.unbounded_drain))
        _mark("plan_schedule_fetch")
        if cfg.eager_map:
            # Materialize the map phase NOW, while no other job competes,
            # so every later first touch is a cache read instead of a
            # cache-lock park that holds a scheduler slot (see
            # EngineConfig.eager_map for the measured trade-off).
            ex.count()
            _mark("map_materialize")

        # results sink (S5) — independent of the other sinks; with
        # eager_map its job reads ex's already-materialized blocks
        results = results_from_extract(ex, b)

        def write_results() -> None:
            results.select([f.name for f in RESULTS_SCHEMA.fields]).write.mode(
                "overwrite"
            ).parquet(self.ckpt.append_dir("results", b))

        def _timed(fn, *a):
            t = _time.monotonic()
            r = fn(*a)
            return r, round(_time.monotonic() - t, 3)

        # The results write starts NOW, concurrent with the discovery
        # planning below: with the localckpt barrier the driver-side
        # Catalyst work (building the discovery chains' physical plans)
        # is the serial cost of the batch, and the results job — which
        # materializes scheduled/ex for everyone — is pure cluster work
        # that overlaps it fully.  The pool is tracked on self so that a
        # batch that fails mid-discovery cannot leave this write racing
        # a later retry of the same (uncommitted) batch directory; the
        # pipelined loop nulls the tracker right after each plan (the
        # in-flight flush owns its pool, and batch dirs never collide
        # across batch ids).
        if self._sink_pool is not None:  # leftover from a failed batch
            self._sink_pool.shutdown(wait=True)
        pool = self._sink_pool = ThreadPoolExecutor(max_workers=5)
        fut_results = pool.submit(_timed, write_results)

        # discovery + two-tier dedup (D5 bloom prefilter → J4 exact anti-join)
        cand = discover_candidates(ex, cfg, b).persist()
        _mark("disc_cand")
        probed = self._filter_probe(
            cand.select("url_norm", "url_hash32", "url_hash64"), shards,
            passthrough=["url_norm"],
        )
        probed = probed.persist()  # read 3×: fresh, maybe, bucket list
        _mark("disc_probe")
        fresh_norms = probed.filter(~F.col("maybe_seen")).select("url_norm")
        maybe = probed.filter(F.col("maybe_seen")).select(
            "url_norm", seen_bucket("url_hash64", cfg.n_seen_buckets).alias("kb")
        )
        # distinct candidate buckets: ≤ n_seen_buckets ints (metadata,
        # not data) — the literals that partition-prune the history
        # scan.  Skipped while the history is only a few batches deep
        # (cfg.prune_confirm_after): there the extra driver job costs
        # more than the full (tiny) scan it would save.
        if len(man.get("seen_batches", [])) > cfg.prune_confirm_after:
            kbs = [r["kb"] for r in maybe.select("kb").distinct().collect()]
        else:
            kbs = []
        confirmed_new_norms = confirm_unseen(
            seen, maybe, kbs, bounded=not cfg.unbounded_drain
        )
        # persisted: read twice (new_rows semi-join + deduped counter) and
        # its lineage crosses the bloom-probe cogroup UDF — recompute is
        # a whole extra Python stage
        new_norms = fresh_norms.unionByName(confirmed_new_norms).persist()
        _mark("disc_confirm")
        new_rows = cand.join(new_norms, "url_norm", "left_semi").select(*FRONTIER_COLS).persist()
        _mark("discover_dedup")

        # --- independent sinks, prepared here, written by _flush_batch --
        # frontier / seen_keys / bloom shards / counters have no
        # inter-dependency (all derive from the persisted frames above),
        # so each runs as its own Spark job from a thread.  Sequentially
        # they cost ~4 small jobs' worth of stage-scheduling latency per
        # batch; in parallel the scheduler interleaves their (tiny)
        # stages across idle cores — the same property that lets a real
        # cluster overlap sink I/O.  Concurrent first-touch of a
        # persisted frame is safe: the block manager's per-partition
        # cache lock makes one thread compute while others wait, never
        # duplicating work.  The manifest commit stays strictly AFTER
        # every sink has durably written (crash mid-batch → resume
        # re-runs the whole batch, unchanged).

        # frontier transition for scheduled rows
        sched_after = ex.select(
            *[c for c in FRONTIER_COLS if c not in ("state", "retry_count")],
            F.when(F.col("hit"), F.lit(FETCHED))
            .when(F.col("retry_count") + 1 >= cfg.max_retries, F.lit(FAILED))
            .otherwise(F.lit(PENDING))
            .alias("state"),
            F.when(F.col("hit"), F.col("retry_count"))
            .otherwise(F.col("retry_count") + 1)
            .cast("int")
            .alias("retry_count"),
        )
        # frontier commit: a batch CHANGES only (newly blocked) ∪
        # (scheduled outcomes) ∪ (new rows) — unscheduled pending rows
        # and already-terminal rows are untouched, so in delta mode only
        # the changed slice is written (commit I/O ∝ batch, not table).
        # Every compact_every-th commit folds base+deltas into a fresh
        # base snapshot to bound merge-on-read fan-in.
        frontier_delta = (
            blocked
            .unionByName(sched_after.select(*FRONTIER_COLS))
            .unionByName(new_rows)
        )
        f_deltas = man.get("frontier_deltas", [])
        f_compact = (cfg.frontier_commit == "snapshot"
                     or len(f_deltas) + 1 >= cfg.compact_every)
        unscheduled = (
            allowed.join(scheduled.select("url_norm"), "url_norm", "left_anti")
            .select(*FRONTIER_COLS)
        )
        # the full next frontier — written on compaction, and the
        # pipelined live view either way.  rest ⊎ unscheduled ⊎ delta is
        # an exact partition of the next state (pending = blocked ⊎
        # allowed; allowed = scheduled ⊎ unscheduled; new rows are
        # confirmed-unseen), so it equals the MOR merge row-for-row.
        next_frontier = (
            rest.select(*FRONTIER_COLS)
            .unionByName(unscheduled)
            .unionByName(frontier_delta)
        )

        def write_frontier() -> None:
            if cfg.bucketed_state:
                self._write_bucketed(next_frontier if f_compact else frontier_delta,
                                     "frontier", "snap" if f_compact else "delta", b)
            elif f_compact:
                self._write_snapshot(next_frontier, "frontier", b, pk)
            else:
                self._write_delta(frontier_delta, "frontier", b, pk)

        # seen_keys (append-only: O(new) write, kb-partitioned) + bloom
        # shards (delta mode: only TOUCHED shards are rewritten — a full
        # shard-table rewrite per batch is ~12 GB at design scale even
        # for a 1-row batch)
        new_keys = new_rows.select("url_hash32", "url_hash64")
        u_deltas = man.get("url_seen_deltas", [])
        u_compact = (cfg.frontier_commit == "snapshot"
                     or len(u_deltas) + 1 >= cfg.compact_every)
        # the shard update is computed ONCE for both the sink and the
        # pipelined live view: cogroup only the touched shards (a few
        # bitsets, not the table) and splice the untouched rows around
        # them.  update_shards leaves keyless shards byte-identical, so
        # untouched ∪ updated(touched) == updated(all) row-for-row — the
        # compact write keeps identical content in a cheaper plan.
        touched = new_keys.select(
            self._filter_shard_col(F.col("url_hash32")).alias("shard")
        ).distinct()
        delta_shards = self._filter_update(
            shards.join(touched, "shard", "left_semi"), new_keys, batch_id=b
        ).persist()
        next_shards = shards.join(touched, "shard", "left_anti").unionByName(delta_shards)

        def write_shards() -> None:
            if u_compact:
                self._write_snapshot(next_shards, "url_seen", b)
            else:
                self._write_delta(delta_shards, "url_seen", b)

        p.f_compact, p.u_compact = f_compact, u_compact
        p.frontier_base = b if f_compact else self._base_id(man, "frontier")
        p.f_deltas = [] if f_compact else f_deltas + [b]
        p.url_seen_base = b if u_compact else self._base_id(man, "url_seen")
        p.u_deltas = [] if u_compact else u_deltas + [b]

        # per-partition counters + lineage (A2/S6) — grouped by the
        # LOGICAL partition key, so counters are parallelism-invariant.
        lineage = json.dumps(
            {
                "batch": b,
                "frontier_in": f"frontier/snap-{self._base_id(man, 'frontier')}"
                + (f"+delta<={b - 1}" if man.get("frontier_deltas") else ""),
                "frontier_out": f"frontier/{'snap' if f_compact else 'delta'}-{b}",
                "seen_in": f"seen_keys/batch<={b - 1}",
                "seen_out": f"seen_keys/batch={b}",
                "url_seen_out": f"url_seen/{'snap' if u_compact else 'delta'}-{b}",
                "results_out": f"results/batch={b}",
            },
            sort_keys=True,
        )

        # single-pass counters: tag every counted row with its kind, ONE
        # shuffle (groupBy partition + pivot over the fixed kind list)
        # instead of five aggregations joined four ways — all inputs are
        # already persisted above
        def tagged(df: DataFrame, kind: str) -> DataFrame:
            return df.select(pk.alias("partition_id"), F.lit(kind).alias("kind"))

        kinds = ["fetched", "failed", "robots_blocked", "n_allowed",
                 "n_eligible", "deduped"]
        events = (
            tagged(ex.filter(F.col("hit")), "fetched")
            .unionByName(tagged(
                ex.filter(~F.col("hit") & (F.col("retry_count") + 1 >= cfg.max_retries)),
                "failed"))
            .unionByName(tagged(blocked, "robots_blocked"))
            .unionByName(tagged(allowed, "n_allowed"))
            .unionByName(tagged(eligible, "n_eligible"))
            .unionByName(tagged(cand.join(new_norms, "url_norm", "left_anti"), "deduped"))
        )
        pivoted = events.groupBy("partition_id").pivot("kind", kinds).count().na.fill(0)
        counters = pivoted.select(
            F.lit(b).cast("long").alias("batch_id"),
            F.col("partition_id").cast("int"),
            F.col("fetched").cast("long"),
            F.col("deduped").cast("long"),
            F.col("robots_blocked").cast("long"),
            (F.col("n_allowed") - F.col("n_eligible")).cast("long").alias("politeness_deferred"),
            F.col("failed").cast("long"),
            F.lit(lineage).alias("lineage"),
        )
        # batch summary via a second Observation measured DURING the
        # counters write — no separate agg job, no persist needed
        cobs = Observation(f"batch-{b}-counters")
        counters = counters.observe(
            cobs,
            *[
                F.coalesce(F.sum(c), F.lit(0)).alias(c)
                for c in ("fetched", "deduped", "robots_blocked",
                          "politeness_deferred", "failed")
            ],
        )

        def write_counters() -> None:
            counters.write.mode("overwrite").parquet(self.ckpt.append_dir("counters", b))

        def n_scheduled() -> int:
            # cache-scan count over scheduled's materialized barrier blocks
            if p._n_scheduled is None:
                p._n_scheduled = scheduled.count()
            return p._n_scheduled

        def next_manifest() -> dict:
            """The manifest _flush_batch will commit — available at plan
            time so the pipelined loop can plan the NEXT batch before this
            one's flush lands."""
            return {
                "batch_id": b,
                "next_idx": base_idx + n_scheduled(),
                "tables": {"frontier": f"frontier/snap-{p.frontier_base}",
                           "url_seen": f"url_seen/snap-{p.url_seen_base}"},
                "seen_batches": man.get("seen_batches", []) + [b],
                "frontier_deltas": p.f_deltas,
                "url_seen_deltas": p.u_deltas,
            }

        # next-state views for the pipelined drain: exactly what
        # frontier()/shards()/seen_keys() will return once this batch's
        # manifest commits
        p.next_frontier = next_frontier
        p.next_shards = next_shards
        # seen_delta MUST be lineage-barriered: the next batch's confirm
        # leg embeds it, and ITS new_rows tree embeds the previous
        # batch's seen_delta — un-barriered, the analyzed plan chains
        # through every prior pipelined batch and grows multiplicatively
        # (observed: a 687 MB plan rendering by batch ~10 of a pipelined
        # soak, the same Catalyst subtree-expansion failure mode the
        # plan_barrier exists for).  The barrier makes seen(k) =
        # committed parquet ∪ one compact leaf, constant-depth forever.
        # Built lazily (memoized) so the sequential path — which never
        # reads it — pays no barrier-construction cost.
        def seen_delta() -> DataFrame:
            if p._seen_delta is None:
                p._seen_delta = _bar(
                    new_rows.select(
                        "url_norm", "url_hash64",
                        seen_bucket("url_hash64", cfg.n_seen_buckets).alias("kb"),
                    )
                )
                cached.append(p._seen_delta)  # released with the batch's frames
            return p._seen_delta

        p.seen_delta = seen_delta

        p.pool, p.fut_results, p.cobs = pool, fut_results, cobs
        p.timed, p.mark = _timed, _mark
        p.n_scheduled, p.next_manifest = n_scheduled, next_manifest
        p.write_frontier, p.write_shards = write_frontier, write_shards
        p.write_seen = lambda: self._write_seen_append(new_rows, b)
        p.write_counters = write_counters
        p.scheduled, p.ex, p.cached = scheduled, ex, cached
        p.persisted = [cand, probed, new_rows, new_norms, blocked, allowed,
                       eligible, delta_shards]
        return p

    def _flush_batch(self, p: _PlannedBatch, extra_manifest: dict | None = None,
                     release: bool = True) -> dict:
        """Write the four remaining sinks concurrently, harvest the early
        results write, commit the manifest (data first, pointer last), and
        read the Observation metrics back.  ``release=False`` defers frame
        cleanup to the pipelined loop (the NEXT batch's lazy legs still
        reference this batch's persisted frames)."""
        b, man, pool = p.b, p.man, p.pool
        try:
            fut_frontier = pool.submit(p.timed, p.write_frontier)
            fut_seen = pool.submit(p.timed, p.write_seen)
            fut_shards = pool.submit(p.timed, p.write_shards)
            fut_counters = pool.submit(p.timed, p.write_counters)
            _, t_f = fut_frontier.result()
            _, t_sh = fut_shards.result()
            _, t_re = p.fut_results.result()
            _, t_se = fut_seen.result()
            _, t_c = fut_counters.result()
        finally:
            pool.shutdown(wait=True)
            if self._sink_pool is pool:
                self._sink_pool = None
        p.timings["sink_each"] = {"results": t_re, "frontier": t_f,
                                  "shards": t_sh, "seen": t_se, "counters": t_c}
        p.mark("sinks_parallel")

        n_scheduled = p.n_scheduled()

        self.ckpt.commit(
            b,
            {"frontier": p.frontier_base, "url_seen": p.url_seen_base},
            extra={"next_idx": p.base_idx + n_scheduled,
                   "seen_batches": man.get("seen_batches", []) + [b],
                   "frontier_deltas": p.f_deltas, "url_seen_deltas": p.u_deltas,
                   **(extra_manifest or {})},
        )
        if release:
            self._release(p)
        # batch summary from the counters-write Observation — measured in
        # passing, not a re-read of every committed batch dir
        agg = {k: (v or 0) for k, v in p.cobs.get.items()}
        agg["batch_id"] = b
        agg["scheduled"] = n_scheduled
        p.mark("commit_readback")
        # bytes this batch actually committed to storage (the incremental-
        # commit success metric: must track batch size, not table size)
        written = [
            self.ckpt.snapshot_dir("frontier", b) if p.f_compact
            else self.ckpt.delta_dir("frontier", b),
            self.ckpt.snapshot_dir("url_seen", b) if p.u_compact
            else self.ckpt.delta_dir("url_seen", b),
            self.ckpt.append_dir("seen_keys", b),
            self.ckpt.append_dir("results", b),
            self.ckpt.append_dir("counters", b),
        ]
        p.timings["commit_bytes"] = sum(
            f.stat().st_size
            for d in written
            for f in Path(d).rglob("*")
            if f.is_file()
        )
        # real measured bytes travel WITH the batch summary so pipelined
        # callers can sum per-batch commits instead of extrapolating from
        # the last batch (ADVICE r3), and so this flusher-thread method
        # never touches engine state: ``self.last_timings`` is assigned
        # only by run_batch / run_pipelined on the caller thread, after
        # the flush future resolves (happens-before via Future.result).
        agg["commit_bytes"] = p.timings["commit_bytes"]
        return agg

    def _release(self, p: _PlannedBatch) -> None:
        """Free a planned batch's persisted/barriered frames (idempotent:
        unpersisting an unpersisted frame is a no-op)."""
        for df in p.persisted:
            df.unpersist()
        for df in (p.ex, p.scheduled, *p.cached):  # the _bar frames
            _unpersist_barrier(df)

    def run_batch(self, extra_manifest: dict | None = None) -> dict:
        man = self.ckpt.manifest()
        assert man is not None, "call init() first"
        p = self._plan_batch(man)
        agg = self._flush_batch(p, extra_manifest)
        self.last_timings = p.timings
        self._maybe_expire()
        return agg

    def evict_seen(self, urls: DataFrame) -> dict:
        """Maintenance op: evict URLs from the frontier AND the URL-seen
        set, so a future re-discovery re-enqueues (and re-fetches) them
        exactly once — the recrawl/TTL flow (VERDICT r4 item 7; e.g.
        ``evict_seen(results.filter(batch_id <= T).select(url))`` expires
        everything fetched before T).

        One atomic maintenance batch, same data-first/pointer-last
        protocol as a drain batch:

        - frontier: new base snapshot WITHOUT the evicted rows;
        - url_seen filter: "cuckoo" → shard-parallel fingerprint DELETE
          (cuckoo.delete_from_shards — O(evicted) work, the deletable-
          membership property the cuckoo backend exists for); "bloom" →
          full REBUILD from the compacted key set (bloom bits can't be
          unset — O(table) work, the documented cost of choosing bloom);
        - exact seen_keys: compacted to one append dir (all committed
          appends ∪, minus evicted) and ``seen_batches`` reset to just
          it — the per-batch confirm path stays untouched (no tombstone
          anti-join added to the hot loop; eviction pays O(history) once
          instead of every future batch paying an extra join, the right
          trade at 10^10 keys where maintenance is rare and batches are
          not).

        Soundness: deletes are issued ONLY for keys present in the exact
        seen set (inner-join below), which is cuckoo.delete_keys'
        no-false-negative contract.  Returns counts.  Not valid inside a
        running pipelined window (no live planned batch may be in
        flight)."""
        man = self.ckpt.manifest()
        assert man is not None, "call init() first"
        b = man["batch_id"] + 1
        ev = urls.select(F.col(urls.columns[0]).alias("url_norm")).distinct()
        # exact-set join: what we will delete from the filter is EXACTLY
        # what leaves the exact set (and frontier rows carry the h32 the
        # shard routing needs)
        fr = self.frontier()
        ev_rows = (
            fr.join(ev, "url_norm", "left_semi")
            .select("url_norm", "url_hash32", "url_hash64")
            .persist()
        )
        n_evicted = ev_rows.count()  # also materializes before any write
        next_frontier = fr.join(ev, "url_norm", "left_anti").select(*FRONTIER_COLS)
        pk = partition_key("host_hash", "salt", self.cfg.n_partitions)
        if self.cfg.bucketed_state:
            self._write_bucketed(next_frontier, "frontier", "snap", b)
        else:
            self._write_snapshot(next_frontier, "frontier", b, pk)
        compacted = self.seen_keys().join(ev, "url_norm", "left_anti")
        self._write_seen_append(compacted, b)
        if self.cfg.seen_filter == "cuckoo":
            from . import cuckoo

            new_shards = cuckoo.delete_from_shards(
                self.shards(), ev_rows.select("url_hash32", "url_hash64"),
                self.cfg.n_shards, batch_id=b,
            )
        else:
            # bloom rebuild: re-key the compacted exact set through the
            # standard update path against empty shards
            keys = self.spark.read.schema(SEEN_KEYS_SCHEMA).parquet(
                self.ckpt.append_dir("seen_keys", b)
            ).join(
                fr.select("url_norm", "url_hash32"), "url_norm", "left"
            ).select("url_hash32", "url_hash64")
            new_shards = self._filter_update(self._filter_empty(), keys, batch_id=b)
        self._write_snapshot(new_shards, "url_seen", b)
        ev_rows.unpersist()
        self.ckpt.commit(
            b, {"frontier": b, "url_seen": b},
            extra={"next_idx": man["next_idx"], "seen_batches": [b],
                   "frontier_deltas": [], "url_seen_deltas": []},
            append_batch=False,
        )
        self._maybe_expire()
        return {"batch_id": b, "evicted": n_evicted}

    def _maybe_expire(self, min_keep: int = 1) -> None:
        """Post-commit checkpoint GC (EngineConfig.expire_keep_last).

        Runs on the caller thread strictly AFTER the manifest commit, so
        every deletable dir is already superseded; the current manifest's
        whole reachable set (base + deltas) is always retained, which is
        exactly what the next batch's merge-on-read view binds to."""
        if self.cfg.expire_keep_last is not None:
            self.ckpt.expire_snapshots(max(self.cfg.expire_keep_last, min_keep))

    def run_pipelined(self, n_batches: int) -> list[dict]:
        """T1 double-buffered drain: overlap batch k's sink flush with
        batch k+1's plan/map phase (EngineConfig.pipelined_drain).

        Batch k+1 plans against batch k's in-memory next-state views
        (next_frontier/next_shards/seen_delta) — definitionally the rows
        batch k's commit publishes — while batch k's sinks flush on a
        background thread.  Invariants preserved:

        - STRICT COMMIT ORDER: flush(k).result() is awaited before
          flush(k+1) is submitted, so manifest k is durable before
          manifest k+1 is written — a crash anywhere leaves the newest
          committed manifest as a consistent resume point, and resume
          deterministically reproduces the interrupted batches
          (test_pipelined crash test).
        - FRAME LIFETIME: batch k's persisted frames are referenced by
          batch k+1's lazy discovery/sink legs until flush(k+1)
          completes, so releases run exactly one flush behind (the
          ``held`` window is ≤ 2 batches + the one being planned).
        - EXACT EQUIVALENCE: every batch is the same deterministic
          function of the same state rows; only the storage the plan
          binds to differs (in-memory frames vs committed files) —
          pinned row-for-row against the sequential engine by
          test_pipelined.
        """
        self.init()
        aggs: list[dict] = []
        flusher = ThreadPoolExecutor(max_workers=1)
        held: list[_PlannedBatch] = []  # frames still pinned, oldest first
        fut = None
        in_flight: _PlannedBatch | None = None
        man = self.ckpt.manifest()
        # per-generation block-manager telemetry (VERDICT r4 item 5): the
        # plan-size test pins LINEAGE growth; this records STORAGE-MEMORY
        # growth — bytes of cached/localCheckpoint'd blocks after each
        # flush — so a soak can assert the held-frame window stays
        # bounded across compaction boundaries, not just the plans
        self.storage_telemetry: list[dict] = []
        try:
            for _ in range(n_batches):
                prev = held[-1] if held else None
                p = self._plan_batch(man, live=prev)
                # the in-flight flush owns its pool; keep the failed-batch
                # fence from shutting it down mid-flight
                self._sink_pool = None
                held.append(p)
                man = p.next_manifest()  # counts scheduled (cache scan)
                if fut is not None:
                    aggs.append(fut.result())  # strict commit order
                    # last_timings only ever updated on THIS thread, after
                    # the flush future resolved (ADVICE r3: the flusher
                    # thread no longer writes engine state)
                    self.last_timings = in_flight.timings
                    while len(held) > 2:
                        # flush(k) done ⇒ nothing references k-1 any more
                        self._release(held.pop(0))
                    # GC only after a flush resolved, on this thread, and
                    # with ≥2 manifests retained: batch k+1 was planned
                    # against manifest k's paths and is still in flight
                    self._maybe_expire(min_keep=2)
                    self.storage_telemetry.append(
                        {"batch_id": aggs[-1]["batch_id"], "held": len(held),
                         **self.storage_bytes()})
                fut = flusher.submit(self._flush_batch, p, None, False)
                in_flight = p
            if fut is not None:
                aggs.append(fut.result())
                self.last_timings = in_flight.timings
                self._maybe_expire(min_keep=2)
                self.storage_telemetry.append(
                    {"batch_id": aggs[-1]["batch_id"], "held": len(held),
                     **self.storage_bytes()})
        finally:
            flusher.shutdown(wait=True)
            while held:  # normal exit and failure paths both sweep here
                q = held.pop(0)
                q.pool.shutdown(wait=True)
                self._release(q)
        return aggs

    def storage_bytes(self) -> dict:
        """Live block-manager footprint: bytes (memory + disk) and block
        count of every RDD with cached/localCheckpoint'd partitions.
        Driver-side metadata read — no job, O(#cached RDDs)."""
        sc = self.spark.sparkContext
        mem = disk = blocks = 0
        for info in sc._jsc.sc().getRDDStorageInfo():
            mem += info.memSize()
            disk += info.diskSize()
            blocks += info.numCachedPartitions()
        return {"storage_mem_bytes": mem, "storage_disk_bytes": disk,
                "cached_blocks": blocks}

    def run(self, n_batches: int) -> list[dict]:
        self.init()
        if self.cfg.pipelined_drain:
            return self.run_pipelined(n_batches)
        return [self.run_batch() for _ in range(n_batches)]
