"""Spark column operators and vectorized UDFs — SURVEY.md §2 cat. 2/8/10.

Design rules (SURVEY.md §4):

- everything that CAN stay JVM-side does: host/path extraction
  (``F.parse_url``), hashing (``F.hash``/``F.xxhash64``), robots
  longest-prefix matching (higher-order array functions — no UDF),
  partition keys (``F.pmod``).  These stay inside whole-stage codegen and
  keep predicate pushdown intact.
- Python crosses the Arrow boundary in exactly two scalar pandas UDFs on
  the hot path: D1 ``udf_canonicalize`` (stdlib urllib logic, no JVM
  equivalent) and D3 ``udf_extract`` (stdlib html.parser).  Both are
  vectorized over Arrow batches — no per-row Python anywhere
  (BASELINE.json:15).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import extract_page
from .schemas import EXTRACT_SCHEMA
from .urlnorm import canonicalize_url

# --- D1: canonicalize (scalar pandas UDF, Series→Series) -----------------


@F.pandas_udf(T.StringType())
def udf_canonicalize(urls: pd.Series) -> pd.Series:
    # map over uniques: discovered-link batches repeat URLs heavily
    uniq = {u: canonicalize_url(u) for u in urls.dropna().unique()}
    return urls.map(uniq)


# --- D3: extract (scalar pandas UDF returning a struct) -------------------


@F.pandas_udf(EXTRACT_SCHEMA)
def udf_extract(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    rows = []
    for h, u in zip(html, url):
        if h is None:
            rows.append((None, None, None, None))
            continue
        ex = extract_page(h, base_url=u or "")
        rows.append(
            (
                ex.title,
                [(r.rank, r.title, r.abstract, r.link) for r in ex.results],
                ex.links,
                ex.text,
            )
        )
    return pd.DataFrame(rows, columns=["page_title", "results", "links", "text"])


# --- JVM-side column helpers (P2, X1-X5, P5) ------------------------------


def host_of(url: Column | str) -> Column:
    """P2 — host for partitioning/politeness. url_norm hosts are already
    lowercase (canonicalizer contract), so no extra lower() is needed on
    normalized input; applied anyway for raw URLs. Stays in codegen."""
    return F.lower(F.try_parse_url(F.col(url) if isinstance(url, str) else url, F.lit("HOST")))


def path_of(url: Column | str) -> Column:
    """URL path with the canonical empty→'/' rule (twin of urlnorm.url_path)."""
    c = F.col(url) if isinstance(url, str) else url
    p = F.try_parse_url(c, F.lit("PATH"))
    return F.when(p.isNull() | (p == ""), F.lit("/")).otherwise(p)


def hash32_of(col: Column | str) -> Column:
    """X1 — murmur3-32, bit-identical to crawlfront.hashing.murmur3_32."""
    return F.hash(F.col(col) if isinstance(col, str) else col)


def hash64_of(col: Column | str) -> Column:
    """X2 — xxhash64, bit-identical to crawlfront.hashing.xxhash64."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)


def partition_key(host_hash: Column | str, salt: Column | str, n_partitions: int) -> Column:
    """X3 — the frontier's logical partition id: pmod(host_hash + salt, P)."""
    hh = F.col(host_hash) if isinstance(host_hash, str) else host_hash
    s = F.col(salt) if isinstance(salt, str) else salt
    return F.pmod(hh + s, F.lit(n_partitions)).cast("int")


def robots_allow(path: Column, rules: Column) -> Column:
    """P5 — RFC 9309-style longest-prefix match, all JVM-side.

    ``rules`` is array<struct<prefix,allow>>.  Folds over the matching
    prefixes keeping the longest; NULL/missing rules ⇒ allow.  Higher-order
    functions keep this out of Python entirely (SURVEY.md §2 P5: "choose
    HOF (stays in JVM)").
    """
    matched = F.filter(rules, lambda r: path.startswith(r["prefix"]))
    best = F.aggregate(
        matched,
        F.struct(F.lit(-1).alias("plen"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            F.length(r["prefix"]) > acc["plen"],
            F.struct(F.length(r["prefix"]).alias("plen"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    return F.when(rules.isNull(), F.lit(True)).otherwise(best["allow"])


def is_http(url: Column) -> Column:
    return url.startswith("http://") | url.startswith("https://")


def url_trap_features(urls):
    """P7 — crawler-trap structural features per URL (calendar/session
    traps pollute a frontier with unbounded synthetic URLs; the gate
    needs a cheap per-URL score BEFORE scheduling).  Features: path
    depth, adjacent-repeated path segment (the /a/a/a/ loop signature),
    query-param count; ``is_trap`` flags repeated segment ∨ depth > 8 ∨
    > 5 params.  All codegen string/array ops — a pure map over the
    frontier, no shuffle at any scale."""
    path = path_of("url")
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs)
    # length clamped at 0: a root path ('/') has depth 0 and slice
    # rejects negative lengths at runtime (caught by the positive-path
    # unit test — the fixture corpus never exercises depth 0)
    adj = F.greatest(depth - 1, F.lit(0))
    has_repeat = F.exists(
        F.zip_with(
            F.slice(segs, F.lit(1), adj),
            F.slice(segs, F.lit(2), adj),
            lambda a, b: a == b,
        ),
        lambda x: x,
    )
    q = F.try_parse_url(F.col("url"), F.lit("QUERY"))
    n_params = (
        F.when(q.isNull() | (q == ""), F.lit(0))
        .otherwise(F.size(F.split(q, "&")))
        .cast("int")
    )
    return urls.select(
        "url",
        depth.cast("int").alias("depth"),
        has_repeat.alias("has_repeat"),
        n_params.alias("n_params"),
        (has_repeat | (depth > 8) | (n_params > 5)).alias("is_trap"),
    )


def global_index(df, order_cols: list[str], n_partitions: int = 64,
                 name: str = "global_idx", base: int = 0):
    """Global dense 0-based index over an UNBOUNDED dataframe without a
    single-partition window (SURVEY.md §2 W3 scale path): range-partition
    by the order key, rank within partitions, then add broadcasted
    per-partition offsets (two-pass cumulative-count trick).  Both the
    capped and unbounded drain paths route W3 through this."""
    from pyspark.sql import Window

    part = df.repartitionByRange(n_partitions, *order_cols)
    w_in = Window.partitionBy(F.spark_partition_id()).orderBy(*order_cols)
    with_local = part.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_local", F.row_number().over(w_in)
    )
    counts = with_local.groupBy("_pid").agg(F.count("*").alias("_n"))
    # cumulative offsets over ≤n_partitions count rows via a θ-self-join
    # (O(P²) rows, P ≤ a few hundred) instead of an unpartitioned window:
    # Catalyst constant-folds any literal partitionBy away, so a window
    # here would single-partition silently and WindowExec would warn on
    # every execution of every drain plan.
    earlier = counts.select(
        F.col("_pid").alias("_qid"), F.col("_n").alias("_qn")
    )
    offsets = (
        counts.join(F.broadcast(earlier), F.col("_qid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_qn"), F.lit(0)).alias("_off"))
    )
    return (
        with_local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn(name, (F.col("_local") - 1 + F.col("_off") + F.lit(base)).cast("long"))
        .drop("_pid", "_local")
    )
