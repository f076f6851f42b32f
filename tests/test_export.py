"""Reference-parity export sink: deterministic CSV/JSONL shards of the
results table (crawlfront/export.py).

Pins the property the module exists for: file membership and in-file
byte content depend only on the DATA (schedule_idx div rows_per_file),
never on the input DataFrame's partitioning — the failure mode of a
sampled RangePartitioner write.  Plus lossless round-trip.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest

from crawlfront.export import data_files, export_results, read_export


def _shard_bytes(out_dir: str) -> dict[str, bytes]:
    """file_id dir name -> concatenated data-file bytes."""
    got: dict[str, bytes] = {}
    for f in data_files(out_dir):
        p = Path(f)
        got[p.parent.name] = got.get(p.parent.name, b"") + p.read_bytes()
    return got


@pytest.mark.parametrize("fmt", ["csv", "jsonl"])
def test_export_partitioning_invariant(engine_run, fmt):
    """Same bytes per shard whether the input arrives in 3 or 7
    partitions — file boundaries are schedule_idx arithmetic, not
    sampled range bounds."""
    eng, _ = engine_run
    results = eng.results()
    dirs = []
    for n_parts in (3, 7):
        d = tempfile.mkdtemp(prefix=f"cf_export_{fmt}_{n_parts}_")
        export_results(results.repartition(n_parts), d, fmt=fmt,
                       rows_per_file=5)
        dirs.append(d)
    a, b = _shard_bytes(dirs[0]), _shard_bytes(dirs[1])
    assert a.keys() == b.keys() and len(a) >= 2
    for k in a:
        assert a[k] == b[k], f"shard {k} bytes differ across input layouts"


def test_export_round_trip_and_order(engine_run, spark):
    """CSV round-trips losslessly (embedded quotes/commas in extracted
    titles included) and each shard is schedule_idx-sorted with the
    arithmetic file assignment."""
    eng, _ = engine_run
    results = eng.results()
    d = tempfile.mkdtemp(prefix="cf_export_rt_")
    export_results(results, d, fmt="csv", rows_per_file=7)

    back = read_export(spark, d, fmt="csv")
    want = results.select("schedule_idx", "batch_id", "url", "rank",
                          "title", "abstract", "link")
    assert back.count() == want.count()
    assert want.exceptAll(back).count() == 0
    assert back.exceptAll(want).count() == 0

    # per-shard: (schedule_idx, rank)-sorted whole pages, idx in
    # [k*7, (k+1)*7).  Parse with a real RFC-4180 reader (quotes doubled,
    # quoted fields may span physical lines) — ADVICE r4: string-split
    # parsing miscounts if a url/title ever contains '","'.
    import csv

    n_parsed = 0
    for f in data_files(d):
        k = int(Path(f).parent.name.split("=", 1)[1])
        keys = []
        with open(f, newline="") as fh:
            for row in csv.reader(fh, doublequote=True):
                keys.append((int(row[0]), int(row[3])))
        assert keys == sorted(keys)
        assert all(k * 7 <= i < (k + 1) * 7 for i, _ in keys)
        n_parsed += len(keys)
    assert n_parsed == want.count()


def test_export_with_text_multiline_round_trip(engine_run, spark):
    """include_text=True: extracted text embeds real newlines
    (extract.py joins text nodes with '\\n'), so rows span physical
    lines — the quoted-CSV round-trip must still be lossless."""
    from pyspark.sql import functions as F

    from crawlfront.export import EXPORT_COLS

    eng, _ = engine_run
    results = eng.results()
    assert results.filter(F.col("text").contains("\n")).count() > 0

    d = tempfile.mkdtemp(prefix="cf_export_text_")
    export_results(results, d, fmt="csv", rows_per_file=9, include_text=True)
    back = read_export(spark, d, fmt="csv", include_text=True)
    want = results.select(*EXPORT_COLS, "text")
    assert back.count() == want.count()
    assert want.exceptAll(back).count() == 0
    assert back.exceptAll(want).count() == 0


def test_export_null_vs_empty_distinguished(spark):
    """Nullable record fields: a NULL title and an EMPTY title must
    round-trip as themselves (the writer's nullValue sentinel keeps
    them distinct in quoted CSV)."""
    rows = [
        (0, 1, "http://a/", 1, None, "abs\nwith newline", "http://t/",
         "text"),
        (1, 1, "http://b/", 1, "", None, None, "t2"),
    ]
    df = spark.createDataFrame(
        rows,
        "schedule_idx long, batch_id long, url string, rank int, "
        "title string, abstract string, link string, text string",
    )
    d = tempfile.mkdtemp(prefix="cf_export_null_")
    export_results(df, d, fmt="csv", rows_per_file=10)
    back = {r["schedule_idx"]: r for r in read_export(spark, d).collect()}
    assert back[0]["title"] is None
    assert back[0]["abstract"] == "abs\nwith newline"
    assert back[1]["title"] == ""
    assert back[1]["abstract"] is None and back[1]["link"] is None


def test_export_sentinel_and_backslash_collision(spark):
    """ADVICE r4: a field whose VALUE is the literal string '\\N' (or any
    backslash-bearing scrape) must survive the round-trip as itself, not
    come back as NULL — the writer's backslash-doubling makes the NULL
    sentinel unreachable by real data."""
    rows = [
        (0, 1, "http://a/", 1, "\\N", "literal-sentinel", None, "t"),
        (1, 1, "http://b/", 1, "C:\\tmp\\x", "back\\slash", "\\\\N", "t"),
        (2, 1, "http://c/", 1, None, "real null title", "\\", "t"),
    ]
    df = spark.createDataFrame(
        rows,
        "schedule_idx long, batch_id long, url string, rank int, "
        "title string, abstract string, link string, text string",
    )
    d = tempfile.mkdtemp(prefix="cf_export_sent_")
    export_results(df, d, fmt="csv", rows_per_file=10)
    back = {r["schedule_idx"]: r for r in read_export(spark, d).collect()}
    assert back[0]["title"] == "\\N"          # NOT null
    assert back[0]["link"] is None            # real null still null
    assert back[1]["title"] == "C:\\tmp\\x"
    assert back[1]["link"] == "\\\\N"
    assert back[2]["title"] is None
    assert back[2]["link"] == "\\"


def test_export_rejects_bad_args(engine_run):
    eng, _ = engine_run
    with pytest.raises(ValueError):
        export_results(eng.results(), tempfile.mkdtemp(), fmt="xml")
    with pytest.raises(ValueError):
        export_results(eng.results(), tempfile.mkdtemp(), rows_per_file=0)
