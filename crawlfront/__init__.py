"""crawlfront — a from-scratch PySpark-native URL-frontier + fetch scheduler.

Reimplements the *capabilities* of the reference crawler
(LunaBlack/BaiduCrawler — see SURVEY.md §0: reference dir was empty at
survey time; behavior is reconstructed from BASELINE.json's north_star /
north_rule, which are the binding contract) as an idiomatic Spark
DataFrame engine:

- partitioned priority-queue frontier keyed by host-hash, salted for skew
- per-host politeness budgets + robots.txt gating (the distributed analog
  of the reference's proxy-pool rotation and request pacing)
- sharded Bloom URL-seen set (canonicalize + murmur3) with an exact
  anti-join confirming leg
- deterministic crawl ordering (total tie-breaks) independent of
  parallelism
- checkpoint/resume via atomic manifest snapshots (Iceberg-shaped layout
  on plain parquet; the sandbox has no Iceberg jar)

Design scale: 10^10-URL frontier on a multi-executor cluster; tested at
sf0.001..sf0.1 on local[N].
"""

__version__ = "0.1.0"
