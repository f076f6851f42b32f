"""Streaming surface tests (SURVEY.md §2 cat. 9): the foreachBatch
wrapper commits the same state as the batch loop; watermark dedup and
stateful budget behave across micro-batches."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlfront.frontier import CrawlEngine
from crawlfront.streaming import (
    TICK_SCHEMA,
    run_streaming,
    stateful_host_budget,
    watermarked_dedup,
)

SF_DIR = "fixtures/sf0.001"


def test_streaming_wrapper_matches_batch_loop(spark, tmp_path):
    stats = run_streaming(spark, SF_DIR, tmp_path / "stream", n_batches=2)
    assert [s["batch_id"] for s in stats] == [1, 2]

    eng = CrawlEngine(spark, SF_DIR, tmp_path / "batch")
    batch_stats = eng.run(2)
    # identical counters...
    assert stats == batch_stats
    # ...and byte-identical results tables
    s_eng = CrawlEngine(spark, SF_DIR, tmp_path / "stream")
    a = sorted(map(tuple, s_eng.results().collect()))
    b = sorted(map(tuple, eng.results().collect()))
    assert a == b


def test_streaming_wrapper_resumes(spark, tmp_path):
    """Ticks processed in two separate streaming runs == one run (the
    stream checkpoint + engine manifest together resume exactly)."""
    d = tmp_path / "s"
    run_streaming(spark, SF_DIR, d, n_batches=1)
    stats2 = run_streaming(spark, SF_DIR, d, n_batches=3)  # 2 new ticks
    eng = CrawlEngine(spark, SF_DIR, tmp_path / "b")
    all_stats = eng.run(3)
    assert stats2 == all_stats[1:]


def test_streaming_tick_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: wipe the STREAM checkpoint (forcing
    every tick to replay) while keeping the engine manifest — replayed
    ticks must be skipped, not run as extra frontier batches."""
    import shutil

    d = tmp_path / "s"
    run_streaming(spark, SF_DIR, d, n_batches=2)
    shutil.rmtree(d / "_stream_ckpt")
    stats = run_streaming(spark, SF_DIR, d, n_batches=2)
    assert stats == []  # every tick replayed, none re-run
    eng = CrawlEngine(spark, SF_DIR, d)
    assert eng.ckpt.current_batch() == 2


def _stream_rows(spark, tmp_path, rows, schema, name):
    d = tmp_path / name
    d.mkdir()
    for i, batch in enumerate(rows):
        (d / f"b{i:04d}.json").write_text(
            "\n".join(json.dumps(r) for r in batch) + "\n"
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )


def test_watermarked_dedup(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("url_norm", T.StringType()),
            T.StructField("discovered_ts", T.TimestampType()),
        ]
    )
    rows = [
        [
            {"url_norm": "https://a/x", "discovered_ts": "2026-01-01T00:00:00"},
            {"url_norm": "https://a/x", "discovered_ts": "2026-01-01T00:00:01"},
            {"url_norm": "https://a/y", "discovered_ts": "2026-01-01T00:00:02"},
        ],
        [
            {"url_norm": "https://a/x", "discovered_ts": "2026-01-01T00:10:00"},
            {"url_norm": "https://a/z", "discovered_ts": "2026-01-01T00:10:01"},
        ],
    ]
    stream = _stream_rows(spark, tmp_path, rows, schema, "wm")
    out = watermarked_dedup(stream, "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_dedup")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    urls = [r["url_norm"] for r in spark.sql("SELECT url_norm FROM wm_dedup").collect()]
    # duplicate x within the watermark horizon dropped (both in-batch and
    # across micro-batches); y and z pass
    assert sorted(urls) == ["https://a/x", "https://a/y", "https://a/z"]


def test_stateful_host_budget(spark, tmp_path):
    """GroupState carries the per-host used-count across two separate
    query RUNS sharing a checkpoint (stronger than micro-batch carry:
    the state store round-trips through disk)."""
    schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("url_norm", T.StringType()),
        ]
    )
    d = tmp_path / "budget"
    d.mkdir()

    def run_once(qname):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )
        out = stateful_host_budget(stream, budget=4)
        rows = []

        def collect(batch_df, _eid):
            rows.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(collect)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["url_norm"]: r["admitted"] for r in rows}

    (d / "b0.json").write_text(
        "\n".join(json.dumps({"host": "h1", "url_norm": f"https://h1/{i}"}) for i in range(3))
        + "\n"
    )
    got1 = run_once("hb1")
    assert got1 == {f"https://h1/{i}": True for i in range(3)}  # 3 of 4 used

    rows2 = [{"host": "h1", "url_norm": f"https://h1/n{i}"} for i in range(2)] + [
        {"host": "h2", "url_norm": "https://h2/a"}
    ]
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in rows2) + "\n")
    got2 = run_once("hb2")
    # h1 state resumed at used=3: admits one more, rejects the fifth;
    # h2 is fresh state
    assert got2 == {
        "https://h1/n0": True,
        "https://h1/n1": False,
        "https://h2/a": True,
    }
