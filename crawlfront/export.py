"""Reference-parity results export — CSV / JSONL files of parsed records.

The reference crawler persists each parsed SERP record (rank, title,
abstract, resolved link) by appending lines to local text/CSV output
files [PK-med; BASELINE.json:6 "the reference's parsed Baidu-SERP
outputs (title/abstract/link extraction)"].  The engine's system of
record is the parquet/Iceberg-shaped ``results`` table; this module is
the compatibility sink that renders that table back into the reference's
medium so a reference user gets the same deliverable files.

Determinism is the hard part at scale.  A naive ``orderBy().write``
splits files at RangePartitioner boundaries, which are *sampled* — the
same data at a different parallelism yields different file boundaries.
Instead we exploit an engine invariant: ``schedule_idx`` is the dense
global crawl-order index (ops.global_index), so

    file_id = schedule_idx div pages_per_file

is a pure function of the row — file membership and in-file order are
byte-stable across parallelism, input partitioning, resume boundaries,
and cluster size.  One shuffle (hash on file_id), one sorted file per
``file_id=N/`` directory, no driver-side collect, no global sort.
``schedule_idx`` indexes fetched *pages*; a page's records share one
idx and are ordered by their on-page ``rank`` — so a file holds whole
pages, exactly like the reference's per-page appends.

The in-task sort is on ``(file_id, schedule_idx, rank)``: leading with
the partition column satisfies the dynamic-partition writer's required
ordering, so Spark does NOT insert its own (order-destroying) sort
before splitting rows into per-file_id files.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, functions as F

# The reference's record fields, plus the engine's provenance columns in
# front so a file is self-describing (url + global crawl order).
EXPORT_COLS = ["schedule_idx", "batch_id", "url", "rank",
               "title", "abstract", "link"]

#: RFC-4180-style CSV: quotes escaped by doubling, every field quoted so
#: embedded newlines/commas in extracted titles/abstracts round-trip.
#: nullValue makes NULL distinguishable from the empty string (title/
#: abstract/link are nullable) — without it both write as "" and a null
#: silently becomes '' on read-back.
#:
#: Sentinel collision (ADVICE r4): with quoteAll a GENUINE field value
#: "\\N" would be written identically to the NULL sentinel and read back
#: as NULL.  Closed by escaping, not by picking a rarer sentinel (any
#: literal sentinel has the same hole): the writer doubles every literal
#: backslash in string fields (\ → \\) and the reader halves them back,
#: so no non-null field can ever equal the sentinel byte-for-byte —
#: mysqldump's classic \N scheme.  JSONL needs none of this (native
#: null + mandated string escaping).
#: ignore*WhiteSpace: Spark's CSV WRITER defaults both to true and
#: silently trims leading/trailing whitespace out of every field —
#: caught by the export_roundtrip contract key (a scraped abstract with
#: an edge space came back shortened).  The reader's defaults are
#: already false.
_CSV_OPTS = {"quoteAll": "true", "escape": '"', "header": "false",
             "nullValue": "\\N",
             "ignoreLeadingWhiteSpace": "false",
             "ignoreTrailingWhiteSpace": "false"}
_STRING_COLS = ("url", "title", "abstract", "link", "text")


def _escape_csv(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*[
        F.replace(F.col(c), F.lit("\\"), F.lit("\\\\")).alias(c)
        if c in _STRING_COLS else c
        for c in cols
    ])


def _unescape_csv(df: DataFrame) -> DataFrame:
    return df.select(*[
        F.replace(F.col(c), F.lit("\\\\"), F.lit("\\")).alias(c)
        if c in _STRING_COLS else c
        for c in df.columns
    ])


def export_results(results: DataFrame, out_dir: str | Path, fmt: str = "csv",
                   rows_per_file: int = 100_000,
                   include_text: bool = False) -> list[str]:
    """Write ``results`` as deterministic CSV or JSONL shards.

    Rows land in ``<out_dir>/file_id=<k>/`` with ``k = schedule_idx div
    rows_per_file`` (``rows_per_file`` counts *pages*, i.e. distinct
    schedule_idx values), sorted by ``(schedule_idx, rank)`` within each
    file.  File *contents* are invariant to the input DataFrame's
    partitioning and the session's parallelism (pinned by
    tests/test_export.py).  Returns the data-file paths in file_id order.
    """
    if rows_per_file < 1:
        raise ValueError("rows_per_file must be >= 1")
    if fmt not in ("csv", "jsonl"):
        raise ValueError(f"fmt must be csv|jsonl, got {fmt!r}")
    cols = EXPORT_COLS + (["text"] if include_text else [])
    selected = results.select(*cols)
    if fmt == "csv":
        selected = _escape_csv(selected, cols)
    out = (
        selected
        # pure INTEGER division (ADVICE r4): float floor-div loses
        # exactness for schedule_idx ≥ 2^53
        .withColumn("file_id", F.expr(f"schedule_idx div {int(rows_per_file)}"))
        # hash-repartition on file_id: every file's rows meet in one task,
        # so each file_id directory holds exactly one sorted data file.
        .repartition(F.col("file_id"))
        .sortWithinPartitions("file_id", "schedule_idx", "rank")
    )
    writer = out.write.mode("overwrite").partitionBy("file_id")
    if fmt == "csv":
        for k, v in _CSV_OPTS.items():
            writer = writer.option(k, v)
        writer.csv(str(out_dir))
    else:
        writer.json(str(out_dir))
    return data_files(out_dir)


def data_files(out_dir: str | Path) -> list[str]:
    """The export's data files, ordered by file_id (deterministic)."""
    root = Path(out_dir)
    shards = sorted(
        (d for d in root.iterdir() if d.name.startswith("file_id=")),
        key=lambda d: int(d.name.split("=", 1)[1]),
    )
    files: list[str] = []
    for d in shards:
        parts = sorted(p for p in d.iterdir()
                       if p.name.startswith("part-") and not p.name.endswith(".crc"))
        files.extend(str(p) for p in parts)
    return files


def read_export(spark, out_dir: str | Path, fmt: str = "csv",
                include_text: bool = False) -> DataFrame:
    """Round-trip reader with the matching parse options (tests/tools)."""
    from pyspark.sql import types as T

    cols = EXPORT_COLS + (["text"] if include_text else [])
    types = {"schedule_idx": T.LongType(), "batch_id": T.LongType(),
             "rank": T.IntegerType()}
    schema = T.StructType(
        [T.StructField(c, types.get(c, T.StringType()), True) for c in cols]
    )
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = (reader.option("multiLine", "true").option("escape", '"')
                  .option("header", "false").option("nullValue", "\\N"))
        return _unescape_csv(reader.csv(str(out_dir) + "/file_id=*/"))
    return reader.json(str(out_dir) + "/file_id=*/")
