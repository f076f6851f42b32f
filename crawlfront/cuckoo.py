"""Sharded cuckoo-filter URL-seen set — the mandate's alternative to the
Bloom prefilter (BASELINE.json:6 "sharded Bloom/cuckoo-filter URL-seen
set"), selected via ``EngineConfig.seen_filter = "cuckoo"``.

Same two-tier contract as bloom.py: the filter is a PREFILTER whose
positives are confirmed by the exact anti-join (J4) — so false positives
only cost work, never correctness.  False NEGATIVES would be a
correctness bug (a seen URL re-enqueued), therefore: deletions are
issued ONLY by the engine's eviction flow (CrawlEngine.evict_seen),
which deletes exactly the keys it removes from the exact seen set in
the same committed maintenance batch, and a failed insert (table
overfull) raises loudly instead of silently dropping the fingerprint.

Vs. Bloom (why the engine offers both): a cuckoo filter at the same FPP
uses comparable space but supports deletion (future frontier eviction),
has better cache locality per probe (≤2 bucket reads vs k scattered bit
reads), and its fingerprints can be relocated — which is what would let
a 10^10-key table re-shard incrementally.

Layout per shard: ``n_buckets`` buckets × 4 slots of uint16 fingerprints
(0 = empty), n_buckets a power of two.  Candidate buckets use the
standard partial-key cuckoo scheme: ``i2 = i1 XOR h(fp)`` — XOR makes
the pair self-inverse, so relocation needs only the stored fingerprint.
Determinism: keys are inserted in sorted (h32, h64) order regardless of
Arrow chunk arrival order, and the eviction victim slot is a pure
function of (fingerprint, kick count) — no randomness anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4  # slots per bucket (the classic (2,4)-cuckoo: ~95% max load)
MAX_KICKS = 500

CUCKOO_SHARDS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("table", T.BinaryType(), False),  # uint16 LE, n_buckets*SLOTS
        T.StructField("n_buckets", T.LongType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("updated_batch", T.LongType(), False),
    ]
)


def cuckoo_params(capacity: int) -> int:
    """n_buckets (power of two) sized so ``capacity`` keys load the
    table to ≤~84% — comfortably under the (2,4)-cuckoo ~95% ceiling."""
    need = max(8, int(capacity / (SLOTS * 0.84)))
    n = 1
    while n < need:
        n <<= 1
    return n


def _fingerprints(h64: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from the key's xxhash64."""
    fp = ((h64.astype(np.int64).astype(np.uint64)) >> np.uint64(20)) & np.uint64(0xFFFF)
    fp = fp.astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _bucket1(h64: np.ndarray, n_buckets: int) -> np.ndarray:
    """Primary bucket from the key's xxhash64 LOW bits.

    Deliberately NOT derived from h32: the shard key is
    ``pmod(url_hash32, n_shards)`` and n_shards is a power of two, so
    within one shard every key agrees on its low log2(n_shards) bits of
    h32 — bucketing on h32 would collapse the shard's primary buckets
    to n_buckets/n_shards and overfill at a fraction of nominal
    capacity.  h64 is independent of the shard key, and its low bucket
    bits are disjoint from the fingerprint bits (h64 >> 20) for any
    n_buckets ≤ 2^20."""
    return h64.astype(np.int64).astype(np.uint64) & np.uint64(n_buckets - 1)


def _alt_bucket(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    # h(fp): one multiplicative mix round — must match insert & probe
    mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(n_buckets - 1)
    return i ^ mix


def insert_keys(table: np.ndarray, h32: np.ndarray, h64: np.ndarray,
                n_buckets: int) -> int:
    """Insert each key; returns the number inserted.  ``table`` is a
    (n_buckets*SLOTS,) uint16 array mutated in place.  Raises on a full
    table (a silent drop would create false negatives → duplicates)."""
    order = np.lexsort((h64, h32))  # deterministic insert order
    fps = _fingerprints(h64[order])
    i1s = _bucket1(h64[order], n_buckets)
    for fp, i1 in zip(fps, i1s):
        i2 = int(_alt_bucket(np.uint64(i1), np.uint16(fp), n_buckets))
        placed = False
        for b in (int(i1), i2):
            base = b * SLOTS
            for s in range(SLOTS):
                if table[base + s] == 0:
                    table[base + s] = fp
                    placed = True
                    break
            if placed:
                break
        if placed:
            continue
        # eviction path: start at i2, kick deterministically
        cur, curfp = i2, int(fp)
        for kick in range(MAX_KICKS):
            slot = (curfp + kick) % SLOTS  # pure function of (fp, kick)
            base = cur * SLOTS
            victim = int(table[base + slot])
            table[base + slot] = curfp
            curfp = victim
            cur = int(_alt_bucket(np.uint64(cur), np.uint16(curfp), n_buckets))
            base = cur * SLOTS
            empt = np.nonzero(table[base:base + SLOTS] == 0)[0]
            if len(empt):
                table[base + int(empt[0])] = curfp
                curfp = 0
                break
        if curfp != 0:
            raise RuntimeError(
                "cuckoo shard overfull (insert failed after "
                f"{MAX_KICKS} kicks) — raise shard_capacity; a silent drop "
                "would create false negatives"
            )
    return len(fps)


def delete_keys(table: np.ndarray, h32: np.ndarray, h64: np.ndarray,
                n_buckets: int) -> int:
    """Remove ONE stored fingerprint per key (partial-key cuckoo delete;
    the property Bloom filters lack — what makes frontier eviction /
    recrawl-TTL possible without rebuilding the filter).

    SOUNDNESS CONTRACT: only ever called with keys that were actually
    inserted and not yet deleted — the engine's eviction flow guarantees
    this by deleting exactly the keys it removes from the EXACT seen set.
    Deleting an un-inserted key whose fingerprint collides in-bucket
    would strip another key's fingerprint → a false NEGATIVE →
    duplicate fetches.  When two inserted keys share (bucket, fp), one
    copy each was stored, so removing one per delete keeps the survivor
    probing positive (at worst a transient false positive — the
    prefilter contract).  A key whose fp is absent from both candidate
    buckets raises loudly: that is the contract being violated."""
    order = np.lexsort((h64, h32))  # deterministic delete order
    fps = _fingerprints(h64[order])
    i1s = _bucket1(h64[order], n_buckets)
    for fp, i1 in zip(fps, i1s):
        i2 = int(_alt_bucket(np.uint64(i1), np.uint16(fp), n_buckets))
        removed = False
        for b in (int(i1), i2):
            base = b * SLOTS
            for s in range(SLOTS):
                if table[base + s] == fp:
                    table[base + s] = 0
                    removed = True
                    break
            if removed:
                break
        if not removed:
            raise RuntimeError(
                "cuckoo delete of a key whose fingerprint is absent — "
                "eviction must only delete keys present in the exact "
                "seen set (a blind delete risks false negatives)"
            )
    return len(fps)


def delete_from_shards(old_shards: DataFrame, del_keys: DataFrame,
                       n_shards: int, batch_id: int) -> DataFrame:
    """Shard-parallel delete (same cogroup shape as update_shards): each
    touched shard's table loses the evicted fingerprints in one Arrow
    batch; untouched shards pass through byte-identical."""
    keys = del_keys.select(
        shard_col(F.col("url_hash32"), n_shards).alias("shard"),
        "url_hash32", "url_hash64",
    )

    def merge(key, old_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        if not len(old_pdf):
            raise RuntimeError(
                f"cuckoo delete routed to missing shard {shard} — the "
                "shard table must cover every shard"
            )
        row = old_pdf.iloc[0]
        table = np.frombuffer(bytes(row["table"]), dtype=np.uint16).copy()
        nb, n_items, ub = int(row["n_buckets"]), int(row["n_items"]), int(row["updated_batch"])
        if len(keys_pdf):
            n_items -= delete_keys(
                table, keys_pdf["url_hash32"].to_numpy(),
                keys_pdf["url_hash64"].to_numpy(), nb,
            )
            ub = batch_id
        return pd.DataFrame(
            [(int(shard), table.tobytes(), nb, n_items, ub)],
            columns=["shard", "table", "n_buckets", "n_items", "updated_batch"],
        )

    return (
        old_shards.groupBy("shard")
        .cogroup(keys.groupBy("shard"))
        .applyInPandas(merge, CUCKOO_SHARDS_SCHEMA)
    )


def contains(table: np.ndarray, h32: np.ndarray, h64: np.ndarray,
             n_buckets: int) -> np.ndarray:
    """Vectorized membership: fp present in bucket i1 or i2?"""
    if len(h32) == 0:
        return np.zeros(0, dtype=bool)
    fp = _fingerprints(h64)
    i1 = _bucket1(h64, n_buckets)
    i2 = _alt_bucket(i1, fp, n_buckets)
    tb = table.reshape(n_buckets, SLOTS)
    hit1 = (tb[i1.astype(np.int64)] == fp[:, None]).any(axis=1)
    hit2 = (tb[i2.astype(np.int64)] == fp[:, None]).any(axis=1)
    return hit1 | hit2


# --- Spark surface (mirrors bloom.py: empty_shards / update_shards / probe) --


def empty_shards(spark, n_shards: int, n_buckets: int) -> DataFrame:
    zero = bytes(n_buckets * SLOTS * 2)
    rows = [(s, bytearray(zero), n_buckets, 0, 0) for s in range(n_shards)]
    return spark.createDataFrame(rows, CUCKOO_SHARDS_SCHEMA)


def shard_col(h32_col, n_shards: int):
    return F.pmod(h32_col, F.lit(n_shards)).cast("int")


def update_shards(old_shards: DataFrame, new_keys: DataFrame, n_shards: int,
                  n_buckets: int, batch_id: int) -> DataFrame:
    """Merge a batch of keys into the shard table (cogroup by shard; one
    Arrow batch per shard — no per-row Python)."""
    keys = new_keys.select(
        shard_col(F.col("url_hash32"), n_shards).alias("shard"),
        "url_hash32", "url_hash64",
    )

    def merge(key, old_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        if len(old_pdf):
            row = old_pdf.iloc[0]
            table = np.frombuffer(bytes(row["table"]), dtype=np.uint16).copy()
            nb, n_items, ub = int(row["n_buckets"]), int(row["n_items"]), int(row["updated_batch"])
        else:
            table = np.zeros(n_buckets * SLOTS, dtype=np.uint16)
            nb, n_items, ub = n_buckets, 0, 0
        if len(keys_pdf):
            n_items += insert_keys(
                table, keys_pdf["url_hash32"].to_numpy(),
                keys_pdf["url_hash64"].to_numpy(), nb,
            )
            ub = batch_id
        return pd.DataFrame(
            [(int(shard), table.tobytes(), nb, n_items, ub)],
            columns=["shard", "table", "n_buckets", "n_items", "updated_batch"],
        )

    return (
        old_shards.groupBy("shard")
        .cogroup(keys.groupBy("shard"))
        .applyInPandas(merge, CUCKOO_SHARDS_SCHEMA)
    )


def probe(candidates: DataFrame, shards: DataFrame, n_shards: int,
          passthrough_cols: list[str]) -> DataFrame:
    """maybe_seen prefilter — same contract as bloom.probe."""
    cand = candidates.withColumn("shard", shard_col(F.col("url_hash32"), n_shards))
    keep = set(passthrough_cols) | {"url_hash32", "url_hash64"}
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in cand.schema.fields
        if f.name in keep
    ) + ", maybe_seen boolean"
    cols = [c for c in cand.columns if c in keep]

    def check(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf[cols].copy()
        if not len(cand_pdf):
            out["maybe_seen"] = np.zeros(0, dtype=bool)
            return out
        if not len(shard_pdf):
            out["maybe_seen"] = False
            return out
        row = shard_pdf.iloc[0]
        table = np.frombuffer(bytes(row["table"]), dtype=np.uint16)
        out["maybe_seen"] = contains(
            table,
            cand_pdf["url_hash32"].to_numpy(),
            cand_pdf["url_hash64"].to_numpy(),
            int(row["n_buckets"]),
        )
        return out

    return (
        cand.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(check, out_schema)
    )
