"""X1/X2 — the pure-Python hash twins must equal Spark's JVM columns
bit-for-bit, including multibyte UTF-8 and non-4-aligned tails
(SURVEY.md §0.3: canonical murmur3 libraries do NOT match Spark there)."""

import numpy as np
from pyspark.sql import functions as F

from crawlfront.hashing import murmur3_32, pmod, xxhash64

PROBES = [
    "", "a", "ab", "abc", "abcd", "abcde",
    "https://host00001.example.com/serp?q=kw0&pn=0",
    "héllo wörld", "中文测试字符串", "emoji 🕷️ tail", "x" * 257,
]


def _random_strings(n=200):
    rng = np.random.default_rng(7)
    out = []
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789:/?&=._-%中文搜索引擎"
    for _ in range(n):
        ln = int(rng.integers(0, 40))
        out.append("".join(alphabet[i] for i in rng.integers(0, len(alphabet), ln)))
    return out


def test_hash_twins_match_spark(spark):
    probes = PROBES + _random_strings()
    df = spark.createDataFrame([(s,) for s in probes], "s string").select(
        "s", F.hash("s").alias("h32"), F.xxhash64("s").alias("h64")
    )
    got = {r["s"]: (r["h32"], r["h64"]) for r in df.collect()}
    for s in probes:
        assert got[s] == (murmur3_32(s), xxhash64(s)), repr(s)


def test_pmod_matches_spark(spark):
    vals = [-(2**31), -7, -1, 0, 1, 7, 2**31 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v int").select(
        "v", F.pmod(F.col("v"), F.lit(64)).alias("p")
    )
    got = {r["v"]: r["p"] for r in df.collect()}
    for v in vals:
        assert got[v] == pmod(v, 64)


def test_hash_types():
    assert -(2**31) <= murmur3_32("anything") < 2**31
    assert -(2**63) <= xxhash64("anything") < 2**63
