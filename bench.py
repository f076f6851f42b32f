"""Bench harness (SURVEY.md §7.1 M6) — prints ONE JSON line.

Default mode (what the driver runs per round):
    python bench.py
runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32)
and prints
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "drain_urls_per_sec": ..., "drain_batches": ...}

Scaling mode (the BASELINE.json N-vs-4N evidence — no real cluster in
this sandbox, so two parallelism levels on identical input):
    python bench.py --scaling
runs the SAME frontier-drain job at local[8] and local[32], each
sample a fresh JVM launched via ``spark-submit --py-files
crawlfront.zip`` (the north_star launch mode; ``--launcher python``
falls back to plain subprocesses), and prints throughput at both plus
``efficiency = thr(32) / (4 * thr(8))``; results are recorded in
BASELINE.md.

Timing rules (BASELINE.md §measurement): same seed/fixtures/drain-K for
every run; queries are materialized with the ``noop`` sink (full compute,
no driver collect); drain throughput = (scheduled + fetched) rows /
wall-clock of the timed batches, from the counters table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
#: untimed leading batches in --scaling mode (crawl ramp-up: batch 1 is
#: seed-sized, batch 2 first-hop — both overhead-bound at any core count)
WARMUP_BATCHES = 2

# headline queries() keys benched in default mode — one per major operator
# family (crawl scheduling, extraction UDF, TPC-H joins/aggs, dedup family,
# ANN, text analysis).
HEADLINE = [
    "w1_w3_schedule_batch1",
    "d3_extract_text_invariant",
    "p5_robots_match",
    "a1_host_stats",
    "q1_pricing_summary",
    "q3_top_orders",
    "j6_asof_latest",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "lang_id",
    "quality_score",
    "token_count",
    "pipeline_clean_corpus",
    "bm25_topk",
]


def _materialize(df) -> None:
    # noop sink: full distributed execution, zero driver-side result transfer
    df.write.format("noop").mode("overwrite").save()


def run_drain(spark, sf: float, n_batches: int, cfg=None, warmup: int = 1,
              pipelined: bool = False) -> dict:
    """Timed frontier drain: the first ``warmup`` batches are excluded
    (JIT + crawl ramp-up — early batches are seed-sized and overhead
    dominated), the following ``n_batches`` are timed individually.
    Throughput comes from the counters table.

    ``pipelined=True`` times the double-buffered drain
    (CrawlEngine.run_pipelined): batch k+1's plan/map overlaps batch k's
    sink flush, so only the whole-window wall is meaningful (per-batch
    entries then carry rows, not wall)."""
    from crawlfront.fixtures import fixture_dir_for_sf
    from crawlfront.frontier import CrawlEngine, EngineConfig

    fx = fixture_dir_for_sf(sf)
    ck = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        # Drains in the engine-default delta commit mode (the 10^10-scale
        # path: commit bytes ∝ batch, not table).  Round 2's snapshot-mode
        # exception is gone: the localckpt plan barrier removed delta's
        # ~4-5 s/batch of per-sink Catalyst overhead — measured equal at
        # sf0.1 (12.4 s delta vs 12.3 s snapshot, same protocol).
        cfg = cfg or EngineConfig(drain_k=max(2000, int(20000 * sf)))
        eng = CrawlEngine(spark, fx, ck, cfg)
        eng.init()
        for _ in range(warmup):
            eng.run_batch()
        rows = 0
        commit_bytes = 0
        per_batch = []
        t_all = time.monotonic()
        if pipelined:
            aggs = eng.run_pipelined(n_batches)
            dt_all = time.monotonic() - t_all
            for agg in aggs:
                r = agg["scheduled"] + agg["fetched"]
                rows += r
                # real measured bytes per committed batch (each flush
                # stats its own written dirs) — not an extrapolation from
                # the last batch (ADVICE r3)
                cb = agg.get("commit_bytes", 0)
                commit_bytes += cb
                per_batch.append({"batch": agg["batch_id"], "rows": r,
                                  "commit_mb": round(cb / 1e6, 2)})
            return {
                "drain_batches": n_batches,
                "drain_sec": round(dt_all, 3),
                "drain_rows": rows,
                "drain_urls_per_sec": round(rows / dt_all, 1) if dt_all > 0 else 0.0,
                "drain_commit_mb": round(commit_bytes / 1e6, 2),
                "pipelined": True,
                "per_batch": per_batch,
            }
        for _ in range(n_batches):
            t0 = time.monotonic()
            agg = eng.run_batch()
            dt = time.monotonic() - t0
            r = agg["scheduled"] + agg["fetched"]
            rows += r
            cb = eng.last_timings.get("commit_bytes", 0)
            commit_bytes += cb
            per_batch.append({"batch": agg["batch_id"], "rows": r,
                              "sec": round(dt, 3),
                              "commit_mb": round(cb / 1e6, 2),
                              "timings": {k: v for k, v in eng.last_timings.items()
                                          if k != "commit_bytes"}})
        dt_all = time.monotonic() - t_all
        return {
            "drain_batches": n_batches,
            "drain_sec": round(dt_all, 3),
            "drain_rows": rows,
            "drain_urls_per_sec": round(rows / dt_all, 1) if dt_all > 0 else 0.0,
            "drain_commit_mb": round(commit_bytes / 1e6, 2),
            "per_batch": per_batch,
        }
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def bench_default(sf_dir: str, cpus: int) -> dict:
    from crawlfront.fixtures import sf_of_dir
    from crawlfront.session import get_spark

    import __spark_entry__ as entrymod

    sf = sf_of_dir(sf_dir)
    spark = get_spark(f"local[{cpus}]", app_name="crawlfront-bench",
                      shuffle_partitions=cpus)
    try:
        # drain FIRST: the query sweep leaves the session with dozens of
        # finished shuffles/broadcasts whose async cleanup competes with
        # the drain's many small stages (measured +5 s/batch when the
        # drain runs last)
        drain = run_drain(spark, sf, n_batches=2)
        qs = entrymod.queries()
        times: dict[str, float] = {}
        for key in HEADLINE:
            # run 1 = warm-up (codegen compile + parquet footer cache),
            # run 2 = the reported steady-state time (BASELINE.md rules)
            _materialize(qs[key](spark, sf_dir))
            t0 = time.monotonic()
            _materialize(qs[key](spark, sf_dir))
            times[key] = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()
    total = round(sum(times.values()) + drain["drain_sec"], 3)
    return {
        "metric": "headline_queries_plus_drain_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        **drain,
        "cpus": cpus,
    }


def _burn(_arg):
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < 2.0:
        x += 1
    return x


def _copy_mb(_arg):
    # memory-bandwidth probe: stream-copy a buffer much larger than LLC
    # for 2 s, return MB copied.  Spark's hot loops (parquet decode,
    # Arrow transfer, shuffle serialization, Python string building) are
    # bandwidth-bound, so THIS — not the pure-ALU burn loop — is the
    # hardware ceiling that actually binds the drain at high core counts.
    import numpy as np

    src = np.random.default_rng(0).integers(0, 255, 64 * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < 2.0:
        np.copyto(dst, src)
        n += src.nbytes
    return n // (1024 * 1024)


def platform_ceiling(cores_low: int = 8, cores_high: int = 32) -> dict:
    """Measured hardware scaling ceiling of this sandbox: total
    throughput of N independent pure-CPU processes at N=8 vs N=32.

    On this virtualized host the aggregate clock drops as more cores go
    busy (turbo/steal), so even embarrassingly parallel work cannot reach
    4x from 8->32 cores.  ``ceiling`` is that measured max; Spark's drain
    efficiency is reported both raw and normalized by it."""
    import multiprocessing as mp

    out, mem = {}, {}
    for n in (cores_low, cores_high):
        with mp.Pool(n) as pool:
            out[n] = sum(pool.map(_burn, range(n)))
        with mp.Pool(n) as pool:
            mem[n] = sum(pool.map(_copy_mb, range(n)))
    factor = cores_high / cores_low
    ratio = out[cores_high] / out[cores_low]
    mratio = mem[cores_high] / mem[cores_low]
    return {f"iters_{cores_low}": out[cores_low], f"iters_{cores_high}": out[cores_high],
            "ceiling": round(ratio / factor, 3), "speedup": round(ratio, 2),
            f"membw_mb_{cores_low}": mem[cores_low],
            f"membw_mb_{cores_high}": mem[cores_high],
            "mem_ceiling": round(mratio / factor, 3), "mem_speedup": round(mratio, 2)}


def package_crawlfront_zip(dest_dir: Path) -> Path:
    """Zip the ``crawlfront`` package for ``spark-submit --py-files``
    (shared by the --scaling launcher and tests/test_spark_submit.py so
    the benched launch mode and the tested one can't drift apart)."""
    import zipfile

    repo = Path(__file__).resolve().parent
    zip_path = dest_dir / "crawlfront.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in sorted((repo / "crawlfront").rglob("*.py")):
            z.write(p, f"crawlfront/{p.relative_to(repo / 'crawlfront')}")
    return zip_path


def spark_submit_path() -> Path:
    import pyspark

    return Path(pyspark.__file__).resolve().parent / "bin" / "spark-submit"


def _stage_submit_launch(stage_dir: Path) -> tuple[str, str, str]:
    """Package the engine for the mandated launch mode (BASELINE.json
    north_star: "launched via spark-submit --py-files"): zip
    ``crawlfront/`` and copy this script into ``stage_dir`` so the
    subprocess resolves the package ONLY from the zip (cwd is the stage
    dir, PYTHONPATH is cleared).  Returns (spark_submit, zip, script)."""
    zip_path = package_crawlfront_zip(stage_dir)
    script = stage_dir / "bench.py"
    shutil.copyfile(Path(__file__).resolve().parent / "bench.py", script)
    return str(spark_submit_path()), str(zip_path), str(script)


def _master_for(cores: int, exec_cores: int, exec_mem_mb: int) -> str:
    """Master string for one scaling level.

    ``exec_cores == 0`` → classic ``local[cores]`` (all tasks in the one
    driver JVM).  ``exec_cores > 0`` → ``local-cluster[N,C,M]``: N
    SEPARATE executor JVMs of C cores / M MB each, driven over a real
    netty RPC + shuffle service — the closest in-sandbox analog of a
    multi-executor cluster ("N vs 4N executors", BASELINE.json).  A
    2×4-core vs 8×4-core pair removes two documented confounds of the
    local[N] evidence (shared driver-JVM GC/JIT, in-process task bus):
    each executor has its own heap, GC, JIT profile, and Python worker
    pool, and every shuffle block crosses process boundaries through
    netty exactly as on a real cluster (minus the network)."""
    if exec_cores <= 0:
        return f"local[{cores}]"
    if cores % exec_cores:
        raise ValueError(f"cores={cores} not divisible by exec_cores={exec_cores}")
    return f"local-cluster[{cores // exec_cores},{exec_cores},{exec_mem_mb}]"


def bench_scaling(sf: float, n_batches: int, cores_low: int = 8,
                  cores_high: int = 32, repeats: int = 2,
                  launcher: str = "submit", pipelined: bool = False,
                  exec_cores: int = 0, exec_mem_mb: int = 3072) -> dict:
    """Same drain job, identical input/seed/config, at local[N] and
    local[4N] — the sandbox stand-in for N vs 4N executors.  With
    ``exec_cores > 0`` the two levels run as multi-executor
    ``local-cluster[N,C,M]`` masters instead (separate executor JVMs,
    real netty shuffle): same total cores, so thr ratios stay
    comparable with the local[N] campaigns.

    Uses a throughput-oriented config (large drain_k, effectively
    unlimited default politeness budget — the per-host hot-host caps in
    the politeness fixture still apply) so the timed batches are
    compute-bound (extraction + dedup + bloom over hundreds of thousands
    of pages), not dominated by per-job scheduling overhead that no
    number of cores can shrink.

    Measurement discipline (this sandbox is a SHARED VM with
    time-varying external CPU steal — the pure-CPU burn probe's 8->32
    speedup was observed anywhere between 1.33x and 3.13x minutes
    apart):
      - levels run INTERLEAVED (L,H,L,H,...) so slow drift hits both;
      - ``repeats`` samples per level, per-level BEST throughput is the
        estimator (external steal only ever subtracts capacity, so the
        max is the least-contaminated observation of the machine);
      - each sample runs in a FRESH subprocess (a reused driver JVM
        inherits JIT-compiled codegen from the previous run — observed
        2x super-linear inflation);
      - a burn+membw ceiling probe brackets the samples, recording what
        the HARDWARE allowed at that moment."""
    import subprocess

    worker_args = ["--drain-once", "--sf", str(sf), "--batches", str(n_batches)]
    if pipelined:
        worker_args.append("--pipelined")
    stage_ctx = tempfile.TemporaryDirectory(prefix="crawlfront-submit-")
    if launcher == "submit":
        # the mandated launch mode: a real ``spark-submit --py-files
        # crawlfront.zip`` per sample, package importable ONLY from the
        # zip (cwd is the stage dir, PYTHONPATH cleared) — same fresh-JVM
        # discipline as the plain-python launcher, same timed code path.
        spark_submit, zip_path, script = _stage_submit_launch(Path(stage_ctx.name))
        env = {**os.environ, "PYTHONPATH": "",
               # local-cluster worker JVMs launch their own Python workers;
               # pin them to this interpreter (the driver's) explicitly
               "PYSPARK_PYTHON": sys.executable,
               "CRAWLFRONT_FIXTURE_ROOT": str(Path(__file__).resolve().parent / "fixtures")}

        def one(cores: int) -> dict:
            master = _master_for(cores, exec_cores, exec_mem_mb)
            extra = []
            if exec_cores > 0:
                # the master string caps the WORKER at M MB; the executor
                # itself still requests spark.executor.memory (default 1g)
                # — size it to the worker minus overhead or tasks spill
                extra = ["--conf", f"spark.executor.memory={max(512, exec_mem_mb - 384)}m"]
            proc = subprocess.run(
                [spark_submit, "--master", master,
                 "--driver-memory", os.environ.get("CRAWLFRONT_DRIVER_MEM", "8g"),
                 *extra, "--py-files", zip_path, script,
                 "--cpus", str(cores), "--master-str", master, *worker_args],
                capture_output=True, text=True, check=True,
                cwd=stage_ctx.name, env=env,
            )
            line = next(ln for ln in reversed(proc.stdout.strip().splitlines())
                        if ln.startswith("{"))
            return json.loads(line)
    else:
        def one(cores: int) -> dict:
            master = _master_for(cores, exec_cores, exec_mem_mb)
            proc = subprocess.run(
                [sys.executable, __file__, "--cpus", str(cores),
                 "--master-str", master, *worker_args],
                capture_output=True, text=True, check=True,
            )
            return json.loads(proc.stdout.strip().splitlines()[-1])

    ceiling_pre = platform_ceiling(cores_low, cores_high)
    samples: dict[str, list[dict]] = {str(cores_low): [], str(cores_high): []}
    for _ in range(repeats):
        for cores in (cores_low, cores_high):
            samples[str(cores)].append(one(cores))
    ceiling_post = platform_ceiling(cores_low, cores_high)

    factor = cores_high / cores_low
    best = {
        k: max(v, key=lambda d: d["drain_urls_per_sec"]) for k, v in samples.items()
    }
    thr_lo = best[str(cores_low)]["drain_urls_per_sec"]
    thr_hi = best[str(cores_high)]["drain_urls_per_sec"]
    eff = round(thr_hi / (factor * thr_lo), 3) if thr_lo else 0.0
    ceil = max(ceiling_pre["ceiling"], ceiling_post["ceiling"])
    m_lo = _master_for(cores_low, exec_cores, exec_mem_mb)
    m_hi = _master_for(cores_high, exec_cores, exec_mem_mb)
    return {
        "metric": f"scaling_efficiency_{m_lo}_to_{m_hi}",
        "masters": {str(cores_low): m_lo, str(cores_high): m_hi},
        "value": eff,
        "unit": "ratio",
        "sf": sf,
        f"thr_local{cores_low}_urls_per_sec": thr_lo,
        f"thr_local{cores_high}_urls_per_sec": thr_hi,
        "samples": {
            k: [d["drain_urls_per_sec"] for d in v] for k, v in samples.items()
        },
        "platform_ceiling": {"pre": ceiling_pre, "post": ceiling_post},
        "normalized_efficiency": round(eff / ceil, 3) if ceil else None,
        "detail": best,
    }


def scaling_cfg(pipelined: bool = False):
    from crawlfront.frontier import EngineConfig

    # snapshot commits: mega-batches change ~every frontier row, so a
    # delta IS the full table there — only the merge-on-read overhead
    # would remain (BASELINE.md §commit-modes).  bucketed_fetch: the
    # mega-batch scale path — J3 against the url-bucketed pages table
    # (ingest-time layout), so neither html nor extracted text is ever
    # shuffled; without it the unbounded drain falls back to a shuffled
    # semi-join that exchanges the whole pages corpus every batch (the
    # single shared sandbox disk then serializes all cores).
    return EngineConfig(budget_scale=10_000, unbounded_drain=True,
                        n_shards=256, shard_capacity=100_000,
                        frontier_commit="snapshot", bucketed_fetch=True,
                        pipelined_drain=pipelined)


def drain_once(sf: float, cores: int, n_batches: int,
               pipelined: bool = False, master: str | None = None) -> dict:
    """Subprocess worker for --scaling: one parallelism level, fresh JVM.

    Runs the WHOLE drain once untimed first (JIT/codegen warm-up — at 32
    concurrent threads a cold JVM runs every first-wave task interpreted,
    which would bias the comparison against the higher parallelism), then
    reports the steady-state timed drain on a fresh checkpoint.
    ``master`` overrides the default ``local[cores]`` (the --scaling
    local-cluster mode passes its ``local-cluster[N,C,M]`` string)."""
    from crawlfront.session import get_spark

    spark = get_spark(master or f"local[{cores}]",
                      app_name=f"crawlfront-scale-{cores}",
                      shuffle_partitions=32)
    try:
        # warm-up drain (JIT/codegen across every stage shape), then the
        # timed drain on a fresh checkpoint: warmup batches inside cover
        # the crawl ramp-up (seed-sized batches), the timed batches are
        # the full-grown frontier drains
        wu = max(0, WARMUP_BATCHES)
        run_drain(spark, sf, wu + n_batches, cfg=scaling_cfg(pipelined), warmup=0,
                  pipelined=pipelined)
        return run_drain(spark, sf, n_batches, cfg=scaling_cfg(pipelined), warmup=wu,
                  pipelined=pipelined)
    finally:
        spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--drain-once", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--sf", type=float, default=0.1,
                    help="crawl-fixture scale for --scaling mode")
    ap.add_argument("--cores-low", type=int, default=8)
    ap.add_argument("--cores-high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--pipelined", action="store_true",
                    help="drain via the double-buffered pipeline "
                         "(EngineConfig.pipelined_drain) in both "
                         "--drain-once and --scaling modes")
    ap.add_argument("--launcher", choices=("submit", "python"), default="submit",
                    help="--scaling per-sample launch mode: real spark-submit "
                         "--py-files crawlfront.zip (default, the mandated "
                         "launch mode) or a plain python subprocess")
    ap.add_argument("--exec-cores", type=int, default=0,
                    help="--scaling: >0 runs each level as a multi-executor "
                         "local-cluster[cores/exec_cores, exec_cores, mem] "
                         "master (separate executor JVMs, real netty "
                         "shuffle) instead of local[cores]")
    ap.add_argument("--exec-mem-mb", type=int, default=3072,
                    help="--scaling local-cluster mode: worker memory MB "
                         "per executor JVM")
    ap.add_argument("--master-str", default=None,
                    help="--drain-once: explicit master URL overriding "
                         "local[cpus] (set by the --scaling launcher)")
    args = ap.parse_args()
    if args.drain_once:
        result = drain_once(args.sf, args.cpus, args.batches, args.pipelined,
                            master=args.master_str)
    elif args.scaling:
        result = bench_scaling(args.sf, args.batches, args.cores_low,
                               args.cores_high, args.repeats, args.launcher,
                               args.pipelined, args.exec_cores,
                               args.exec_mem_mb)
    else:
        result = bench_default(args.sf_dir, args.cpus)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
