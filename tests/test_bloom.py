"""A4/A5/D4/D5 — Bloom soundness: NO false negatives ever (a false
negative would re-enqueue a seen URL and break the exact-ordering
contract); FPP within ~2× of design (SURVEY.md §5.2.3)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from crawlfront import bloom


def _keys(rng, n):
    h32 = rng.integers(-(2**31), 2**31, n).astype(np.int32)
    h64 = rng.integers(-(2**63), 2**63, n).astype(np.int64)
    return h32, h64


def test_numpy_build_probe_roundtrip():
    rng = np.random.default_rng(1)
    n_bits, k = bloom.bloom_params(5000, 0.01)
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    h32, h64 = _keys(rng, 5000)
    bloom.set_bits(bits, h32, h64, n_bits, k)
    assert bloom.contains(bits, h32, h64, n_bits, k).all()  # no false negatives
    o32, o64 = _keys(rng, 20000)
    fpp = bloom.contains(bits, o32, o64, n_bits, k).mean()
    assert fpp < 0.02, fpp  # within 2x of 1% design


def test_spark_shard_update_and_probe(spark):
    n_shards = 8
    n_bits, k = bloom.bloom_params(1000, 0.01)
    rng = np.random.default_rng(2)
    h32, h64 = _keys(rng, 800)
    keys = spark.createDataFrame(
        pd.DataFrame({"url_hash32": h32, "url_hash64": h64})
    )
    shards = bloom.update_shards(
        bloom.empty_shards(spark, n_shards, n_bits, k), keys, n_shards, n_bits, k, 1
    )
    shards = shards.cache()
    assert shards.count() == n_shards
    assert shards.agg(F.sum("n_items")).collect()[0][0] == 800

    # probe the same keys → all maybe_seen
    cand = keys.withColumn("url_norm", F.concat(F.lit("u"), F.col("url_hash32").cast("string")))
    probed = bloom.probe(cand, shards, n_shards, passthrough_cols=["url_norm"])
    assert probed.filter(~F.col("maybe_seen")).count() == 0

    # unseen keys → low positive rate
    o32, o64 = _keys(rng, 4000)
    other = spark.createDataFrame(
        pd.DataFrame({"url_hash32": o32, "url_hash64": o64})
    ).withColumn("url_norm", F.lit("x"))
    p2 = bloom.probe(other, shards, n_shards, passthrough_cols=["url_norm"])
    fp = p2.filter(F.col("maybe_seen")).count() / 4000
    assert fp < 0.05, fp

    # incremental merge keeps old keys
    n32, n64 = _keys(rng, 300)
    more = spark.createDataFrame(pd.DataFrame({"url_hash32": n32, "url_hash64": n64}))
    shards2 = bloom.update_shards(shards, more, n_shards, n_bits, k, 2)
    probed2 = bloom.probe(cand, shards2, n_shards, passthrough_cols=["url_norm"])
    assert probed2.filter(~F.col("maybe_seen")).count() == 0
