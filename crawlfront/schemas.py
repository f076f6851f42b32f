"""Explicit StructType schemas for every engine table — SURVEY.md §1.2.

Schemas are always declared, never inferred: inference order-depends on
partition layout and the contract demands exact reproducibility
(BASELINE.json:6,14).  ``pages`` shape is fixed verbatim by the driver
(BASELINE.json:15): (url, warc_ts, html:binary, text, lang).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seed_rank", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("prefix", T.StringType(), False),
                        T.StructField("allow", T.BooleanType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("fetched_ts", T.TimestampType(), False),
    ]
)

POLITENESS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget", T.IntegerType(), False),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash32", T.IntegerType(), False),
        T.StructField("url_hash64", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_hash", T.IntegerType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seed_rank", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovered_batch", T.LongType(), False),
        T.StructField("discovered_ts", T.TimestampType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
    ]
)

# Frontier row states
PENDING = "PENDING"
FETCHED = "FETCHED"
BLOCKED = "BLOCKED"  # robots-denied (terminal)
FAILED = "FAILED"  # exhausted retries (url absent from corpus)

SEEN_KEYS_SCHEMA = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash64", T.LongType(), False),
        # kb = pmod(url_hash64, n_seen_buckets): the directory-partition
        # key of every append (seen_keys/batch=<b>/kb=<k>/) — the J4
        # confirm leg prunes the history scan to the buckets its
        # candidates actually hash into
        T.StructField("kb", T.IntegerType(), False),
    ]
)

URL_SEEN_SHARDS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("bloom", T.BinaryType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("updated_batch", T.LongType(), False),
    ]
)

COUNTERS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("deduped", T.LongType(), False),
        T.StructField("robots_blocked", T.LongType(), False),
        T.StructField("politeness_deferred", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("lineage", T.StringType(), False),
    ]
)

RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("schedule_idx", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("abstract", T.StringType(), True),
        T.StructField("link", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# D3 output struct: per-page extraction before the per-result explode.
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("page_title", T.StringType(), True),
        T.StructField(
            "results",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("rank", T.IntegerType(), False),
                        T.StructField("title", T.StringType(), True),
                        T.StructField("abstract", T.StringType(), True),
                        T.StructField("link", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("text", T.StringType(), True),
    ]
)
