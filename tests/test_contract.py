"""Driver-contract smoke: entry() yields rows; a representative subset of
queries() matches oracle_sql() via DuckDB exactly as the driver compares
them (full sweep: python tools/check_contract.py)."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tools.check_contract import SF_DIR, TABLES, canon  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SUBSET = [
    "w1_w3_schedule_batch1",
    "p5_robots_match",
    "q1_pricing_summary",
    "dedup_exact",
    "ann_cosine_topk",
    "lang_id",
    "quality_score",
    "x9_json_props",
    "d3_extract_text_invariant",
    # the former rows-only keys — twinned via crawlfront/sqlhash.py and
    # the chained 2-batch drain SQL; pinned here so a twin regression
    # fails fast, not only in the driver sweep
    "x1_x3_hash_partition",
    "a4_bloom_shard_stats",
    "t1_t2_drain_2batches",
    # round-2 surface-completion ops (former deliberate omissions)
    "t4b_sliding_windows",
    "t4c_session_windows",
    "d7_udtf_url_segments",
    "d8_udaf_host_median",
    "pipeline_clean_corpus",
    # round-3 additions
    "paragraph_dedup",
    "pii_scrub",
    "g2_anchor_stats",
    "multimodal_meta",  # now a REAL decode (hex-walk twin) — pin it here
    # round-4 addition
    "decontaminate",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "schedule_idx", "rank", "title", "abstract", "link", "text"} <= set(
        df.columns
    )


def test_every_query_runs_has_oracle_or_reason():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("key", SUBSET)
def test_query_matches_oracle(spark, duck, key):
    sdf = entrymod.queries()[key](spark, SF_DIR).toPandas()
    ddf = duck.execute(entrymod.oracle_sql()[key]).df()
    sn, sc, sv = canon(sdf)
    dn, dc, dv = canon(ddf)
    assert sc == dc
    assert sn == dn
    assert sv == dv
