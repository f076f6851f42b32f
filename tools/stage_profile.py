"""Stage-level scaling profiler (measurement tool, not part of the engine).

Runs ONE timed drain batch with Spark event logging enabled, then parses
the event log into per-stage wall/CPU/GC/shuffle totals — the evidence
for WHICH stages fail to scale between parallelism levels.

Usage:
    python tools/stage_profile.py --cpus 32 --sf 2.0
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(cpus: int, sf: float, batches: int) -> None:
    from bench import WARMUP_BATCHES, run_drain, scaling_cfg
    from crawlfront.session import get_spark

    evdir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        f"local[{cpus}]",
        app_name=f"stage-profile-{cpus}",
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    import time

    try:
        run_drain(spark, sf, WARMUP_BATCHES + batches, cfg=scaling_cfg(), warmup=0)
        # second drain: warm-up batches untimed, then the timed ones —
        # t0 marks where the profile window starts (events before it are
        # warm-up noise and excluded)
        ck = tempfile.mkdtemp(prefix="prof_ckpt_")
        from crawlfront.fixtures import fixture_dir_for_sf
        from crawlfront.frontier import CrawlEngine

        eng = CrawlEngine(spark, fixture_dir_for_sf(sf), ck, scaling_cfg())
        eng.init()
        for _ in range(WARMUP_BATCHES):
            eng.run_batch()
        t0_ms = time.time() * 1000
        t_wall = time.monotonic()
        rows = 0
        for _ in range(batches):
            a = eng.run_batch()
            rows += a["scheduled"] + a["fetched"]
        wall = time.monotonic() - t_wall
        out = {"rows": rows, "wall_s": round(wall, 2),
               "urls_per_sec": round(rows / wall, 1),
               "timings": eng.last_timings}
    finally:
        spark.stop()
    print(json.dumps({"drain": out}))

    stages: dict[int, dict] = {}
    agg = defaultdict(float)
    for evfile in Path(evdir).glob("*"):
        for line in evfile.open(errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if si.get("Submission Time", 0) < t0_ms:
                    continue
                sid = si["Stage ID"]
                wall = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:60],
                    "tasks": si.get("Number of Tasks", 0),
                    "wall_s": round(wall, 2),
                }
            elif ev.get("Event") == "SparkListenerTaskEnd":
                ti = ev.get("Task Info") or {}
                if ti.get("Finish Time", 0) < t0_ms:
                    continue
                m = ev.get("Task Metrics") or {}
                agg["run_s"] += m.get("Executor Run Time", 0) / 1e3
                agg["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                agg["gc_s"] += m.get("JVM GC Time", 0) / 1e3
                agg["deser_s"] += m.get("Executor Deserialize Time", 0) / 1e3
                agg["result_ser_s"] += m.get("Result Serialization Time", 0) / 1e3
                sw = m.get("Shuffle Write Metrics") or {}
                agg["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                agg["shuffle_write_s"] += sw.get("Shuffle Write Time", 0) / 1e9
                sr = m.get("Shuffle Read Metrics") or {}
                agg["shuffle_read_mb"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                agg["shuffle_fetch_wait_s"] += sr.get("Fetch Wait Time", 0) / 1e3
                py = {x["Name"]: x for x in (ev.get("Accumulables") or [])}
                # pandas/python UDF time accumulators when present
                for k in py:
                    if "python" in k.lower() and "time" in k.lower():
                        pass
    top = sorted(stages.values(), key=lambda s: -s["wall_s"])[:15]
    print(json.dumps({"totals": {k: round(v, 1) for k, v in agg.items()},
                      "n_stages": len(stages),
                      "top_stages": top}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", type=float, default=2.0)
    ap.add_argument("--batches", type=int, default=1)
    args = ap.parse_args()
    run(args.cpus, args.sf, args.batches)
