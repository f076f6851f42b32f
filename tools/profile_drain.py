"""Per-stage profile of a frontier drain (scratch diagnostic tool).

Runs the same drain bench.scaling_cfg() uses, then scrapes the Spark UI
REST API for completed-stage metrics.  For each stage: wall duration,
summed executor run time, task count, and max/median task time — the
numbers that separate "not enough parallel work" (tasks < cores),
"straggler/skew" (max >> median), and "driver/serial gap" (sum of stage
walls << batch wall).

Usage: python tools/profile_drain.py [--cores 32] [--sf 2.0] [--batches 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def stage_metrics(ui_url: str) -> list[dict]:
    app = json.load(urllib.request.urlopen(f"{ui_url}/api/v1/applications"))[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui_url}/api/v1/applications/{app}/stages?status=complete&details=false"
        )
    )
    out = []
    for s in stages:
        out.append(
            {
                "stage": s["stageId"],
                "attempt": s["attemptId"],
                "name": s["name"].split("\n")[0][:80],
                "tasks": s["numCompleteTasks"],
                "wall_ms": s.get("executorRunTime", 0) and None,  # filled below
                "exec_run_ms": s.get("executorRunTime", 0),
                "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6, 1),
                "first_launch": s.get("firstTaskLaunchedTime"),
                "submission": s.get("submissionTime"),
                "completion": s.get("completionTime"),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                "output_mb": round(s.get("outputBytes", 0) / 1e6, 2),
            }
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--sf", type=float, default=2.0)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--out", default="profile_drain.json")
    args = ap.parse_args()

    from bench import run_drain, scaling_cfg
    from crawlfront.session import get_spark

    spark = get_spark(
        f"local[{args.cores}]",
        app_name=f"profile-drain-{args.cores}",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    try:
        res = run_drain(spark, args.sf, args.batches, cfg=scaling_cfg(), warmup=2)
        ui = "http://localhost:4040"
        stages = stage_metrics(ui)
    finally:
        spark.stop()

    import datetime as dt

    def _ms(ts: str | None) -> float | None:
        if not ts:
            return None
        return dt.datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp() * 1e3

    for s in stages:
        sub, comp = _ms(s.pop("submission")), _ms(s.pop("completion"))
        s.pop("first_launch", None)
        s["wall_ms"] = round(comp - sub, 0) if sub and comp else None
        s["t_end"] = comp
    stages.sort(key=lambda s: s["stage"])
    payload = {"drain": res, "cores": args.cores, "stages": stages}
    Path(args.out).write_text(json.dumps(payload, indent=1))
    # quick console digest: total stage wall vs drain wall
    tot_wall = sum(s["wall_ms"] or 0 for s in stages) / 1e3
    tot_exec = sum(s["exec_run_ms"] for s in stages) / 1e3
    print(
        json.dumps(
            {
                "drain_sec": res["drain_sec"],
                "sum_stage_wall_sec": round(tot_wall, 1),
                "sum_exec_run_sec": round(tot_exec, 1),
                "avg_parallelism": round(tot_exec / tot_wall, 1) if tot_wall else None,
                "n_stages": len(stages),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
