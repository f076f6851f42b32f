"""Sharded Bloom URL-seen set — SURVEY.md §1.2(3), §2 A4/A5/D4/D5.

Mandated by BASELINE.json:6 ("sharded Bloom/cuckoo-filter URL-seen set
maintained via vectorized Arrow UDFs for canonicalize+murmur3-hash
dedup").  The Bloom set is a PREFILTER only: candidates it flags as
maybe-seen are confirmed by an exact anti-join against ``seen_keys``
(J4), because Bloom false positives would otherwise wrongly drop URLs and
the contract demands the exact URL-seen set (BASELINE.json:14).  Its
value is at 10^10 scale: only bloom-positive rows (seen rows + ~fpp of
new rows) ever reach the big anti-join.

Design scale math (SURVEY.md §1.2): 10^10 keys @ 1% FPP → ~9.6×10^10
bits ≈ 12 GB total, k=7, 4096 shards ≈ 3 MB each.  Test scale: 64 shards.

Bit positions use Kirsch-Mitzenmacher double hashing over the two hashes
the frontier already carries (murmur3-32 = Spark ``F.hash``, xxhash64 =
Spark ``F.xxhash64`` — both reproducible in Python, hashing.py):
``pos_i = (h32 + i·h64) mod n_bits`` in uint64 arithmetic.  Build and
probe are both NumPy over Arrow batches; shard id = pmod(h32, n_shards)
is computed JVM-side so the shuffle is a plain hash partition.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import URL_SEEN_SHARDS_SCHEMA


def bloom_params(capacity: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for a shard sized to ``capacity`` keys at ``fpp``."""
    n_bits = max(64, int(math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2))))
    n_bits = (n_bits + 7) & ~7  # byte-align
    k = max(1, round((n_bits / max(1, capacity)) * math.log(2)))
    return n_bits, min(k, 16)


def _positions(h32: np.ndarray, h64: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions, uint64 double hashing (wrapping is fine —
    both build and probe use this exact function)."""
    a = h32.astype(np.int64).astype(np.uint64)
    b = h64.astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (a[None, :] + i * b[None, :]) % np.uint64(n_bits)


def set_bits(bits: np.ndarray, h32: np.ndarray, h64: np.ndarray, n_bits: int, k: int) -> None:
    pos = _positions(h32, h64, n_bits, k)
    np.bitwise_or.at(bits, (pos >> 3).astype(np.int64), (1 << (pos & 7)).astype(np.uint8))


def contains(bits: np.ndarray, h32: np.ndarray, h64: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    if len(h32) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(h32, h64, n_bits, k)
    hit = (bits[(pos >> 3).astype(np.int64)] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=0).astype(bool)


def empty_shards(spark, n_shards: int, n_bits: int, k: int) -> DataFrame:
    """Batch-0 shard table: all-zero bitsets (kept explicit so every batch
    cogroups against a complete shard set)."""
    zero = bytes(n_bits // 8)
    rows = [(s, bytearray(zero), n_bits, k, 0, 0) for s in range(n_shards)]
    return spark.createDataFrame(rows, URL_SEEN_SHARDS_SCHEMA)


def shard_col(h32_col, n_shards: int):
    return F.pmod(h32_col, F.lit(n_shards)).cast("int")


def update_shards(old_shards: DataFrame, new_keys: DataFrame, n_shards: int,
                  n_bits: int, k: int, batch_id: int) -> DataFrame:
    """A5 — merge a batch of new keys into the shard table.

    ``new_keys`` needs (url_hash32, url_hash64).  Cogroup by shard: one
    Arrow batch per shard ORs the new bit positions into the old bitset —
    grouped-map pandas UDF, no per-row Python (BASELINE.json:15).
    """
    keys = new_keys.select(
        shard_col(F.col("url_hash32"), n_shards).alias("shard"),
        "url_hash32", "url_hash64",
    )

    def merge(key, old_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        if len(old_pdf):
            row = old_pdf.iloc[0]
            bits = np.frombuffer(bytes(row["bloom"]), dtype=np.uint8).copy()
            nb, kk, n_items, ub = int(row["n_bits"]), int(row["n_hashes"]), int(row["n_items"]), int(row["updated_batch"])
        else:
            bits = np.zeros(n_bits // 8, dtype=np.uint8)
            nb, kk, n_items, ub = n_bits, k, 0, 0
        if len(keys_pdf):
            set_bits(bits, keys_pdf["url_hash32"].to_numpy(), keys_pdf["url_hash64"].to_numpy(), nb, kk)
            n_items += len(keys_pdf)
            ub = batch_id
        return pd.DataFrame(
            [(int(shard), bits.tobytes(), nb, kk, n_items, ub)],
            columns=["shard", "bloom", "n_bits", "n_hashes", "n_items", "updated_batch"],
        )

    return (
        old_shards.groupBy("shard")
        .cogroup(keys.groupBy("shard"))
        .applyInPandas(merge, URL_SEEN_SHARDS_SCHEMA)
    )


def probe(candidates: DataFrame, shards: DataFrame, n_shards: int,
          passthrough_cols: list[str]) -> DataFrame:
    """D5 — maybe-seen prefilter.

    Cogroups candidates with their shard (one bitset deserialization per
    shard, not per row) and appends ``maybe_seen:boolean``.  Shards are
    never broadcast: at design scale the shard table is 12 GB, so the
    probe co-partitions candidates by shard instead — the same shuffle key
    the bloom build uses.
    """
    cand = candidates.withColumn("shard", shard_col(F.col("url_hash32"), n_shards))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in cand.schema.fields
        if f.name in set(passthrough_cols) | {"url_hash32", "url_hash64"}
    ) + ", maybe_seen boolean"
    cols = [c for c in cand.columns if c in set(passthrough_cols) | {"url_hash32", "url_hash64"}]

    def check(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf[cols].copy()
        if not len(cand_pdf):
            out["maybe_seen"] = np.zeros(0, dtype=bool)
            return out
        if not len(shard_pdf):
            out["maybe_seen"] = False
            return out
        row = shard_pdf.iloc[0]
        bits = np.frombuffer(bytes(row["bloom"]), dtype=np.uint8)
        out["maybe_seen"] = contains(
            bits,
            cand_pdf["url_hash32"].to_numpy(),
            cand_pdf["url_hash64"].to_numpy(),
            int(row["n_bits"]),
            int(row["n_hashes"]),
        )
        return out

    return (
        cand.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(check, out_schema)
    )
