"""Structured-Streaming surface — SURVEY.md §2 category 9 (T1–T5).

The PRIMARY loop is the deterministic driver-side batch loop
(frontier.CrawlEngine) — that is what makes exact ordering and
resume-equivalence provable (SURVEY.md §2 cat. 9 design decision).  This
module is the optional streaming RUNNER around it plus the streaming
operators the survey mandates:

- T1-wrapper: ``run_streaming`` — ``readStream`` over a tick directory →
  ``foreachBatch(run_batch)`` with ``Trigger.AvailableNow``; one tick
  file = one frontier micro-batch, so the streaming run commits exactly
  the same checkpoints as ``CrawlEngine.run(n)``.
- T3: ``watermarked_dedup`` — late-data-bounded URL dedup
  (``withWatermark`` + ``dropDuplicatesWithinWatermark``); wrapper-mode
  only — the batch loop gets exactness from the bloom+anti-join path.
- T5: ``stateful_host_budget`` — per-host remaining-budget carried
  across micro-batches via ``applyInPandasWithState`` (GroupState), the
  streaming analog of the politeness table.
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .frontier import CrawlEngine, EngineConfig

TICK_SCHEMA = T.StructType([T.StructField("tick", T.LongType(), False)])


def write_ticks(tick_dir: str | Path, n: int) -> None:
    """One JSON file per planned micro-batch (deterministic file names;
    the file source reads them in order with maxFilesPerTrigger=1)."""
    d = Path(tick_dir)
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        (d / f"tick-{i:06d}.json").write_text(json.dumps({"tick": i}) + "\n")


def run_streaming(
    spark: SparkSession,
    fixture_dir: str | Path,
    ckpt_dir: str | Path,
    n_batches: int,
    cfg: EngineConfig | None = None,
    tick_dir: str | Path | None = None,
    stream_ckpt: str | Path | None = None,
) -> list[dict]:
    """T1 wrapper: drive the frontier drain from a Structured Streaming
    query.  Each micro-batch of the tick stream runs one engine batch;
    ``Trigger.AvailableNow`` processes exactly the pending ticks and
    stops.  Spark's stream checkpoint tracks tick offsets; the ENGINE's
    manifest checkpoints remain the source of truth for state, so a
    killed streaming run resumes exactly like a killed batch run."""
    root = Path(ckpt_dir)
    tick_dir = Path(tick_dir) if tick_dir else root / "_ticks"
    stream_ckpt = Path(stream_ckpt) if stream_ckpt else root / "_stream_ckpt"
    engine = CrawlEngine(spark, fixture_dir, root, cfg)
    engine.init()
    write_ticks(tick_dir, n_batches)

    stats: list[dict] = []

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # one engine micro-batch per tick.  foreachBatch is at-least-once:
        # a crash after the engine manifest commit but before the stream
        # epoch commit replays the tick on restart, and the file source
        # may deliver tick files in any order — so each processed tick id
        # is recorded IN the engine manifest, atomically with that batch's
        # commit, and a replayed tick is skipped.  This keeps the
        # tick→batch mapping exactly 1:1 under replay (T2 equivalence).
        ticks = [r["tick"] for r in batch_df.select("tick").collect()]
        man = engine.ckpt.manifest() or {}
        done = set(man.get("ticks_done", []))
        for tick in sorted(ticks):
            if tick in done:
                continue
            done.add(tick)
            stats.append(
                engine.run_batch(extra_manifest={"ticks_done": sorted(done)})
            )

    ticks = (
        spark.readStream.schema(TICK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tick_dir))
    )
    q = (
        ticks.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(stream_ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


def watermarked_dedup(discovered: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T3 — streaming URL dedup bounded by an event-time watermark.

    ``discovered`` is a STREAMING DataFrame with (url_norm,
    discovered_ts).  State for a url_norm is dropped once the watermark
    passes it — bounded memory at 10^10 scale; exactness within the
    watermark horizon.  (The batch loop instead uses the bloom+anti-join
    two-tier path, which is exact over all history.)"""
    return discovered.withWatermark("discovered_ts", watermark).dropDuplicatesWithinWatermark(
        ["url_norm"]
    )


_BUDGET_STATE = T.StructType([T.StructField("used", T.LongType(), False)])
_BUDGET_OUT = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("admitted", T.BooleanType(), False),
        T.StructField("used_after", T.LongType(), False),
    ]
)


def _budget_fn(budget: int):
    def fn(key, pdfs, state: GroupState):
        (host,) = key
        used = state.get[0] if state.exists else 0
        # a group's rows arrive as multiple Arrow chunks in arbitrary
        # order — gather them all, THEN admit in deterministic url order
        chunks = [pdf for pdf in pdfs if len(pdf)]
        urls = sorted(pd.concat(chunks)["url_norm"]) if chunks else []
        rows = []
        for url in urls:
            admit = used < budget
            used += 1 if admit else 0
            rows.append((host, url, admit, used))
        state.update((used,))
        yield pd.DataFrame(rows, columns=["host", "url_norm", "admitted", "used_after"])

    return fn


def stateful_host_budget(
    frontier_stream: DataFrame, budget: int
) -> DataFrame:
    """T5 — per-host cumulative admission across micro-batches.

    ``frontier_stream`` is a STREAMING DataFrame with (host, url_norm).
    GroupState carries the per-host used-count forever (no timeout —
    politeness is not time-bounded); each arriving URL is admitted while
    the host's lifetime count is under ``budget``.  The batch loop keeps
    the same state in the politeness/frontier tables instead."""
    return frontier_stream.groupBy("host").applyInPandasWithState(
        _budget_fn(budget),
        outputStructType=_BUDGET_OUT,
        stateStructType=_BUDGET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
