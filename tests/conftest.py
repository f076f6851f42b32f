"""Shared fixtures: one SparkSession per test session (local[8]),
deterministic crawl fixtures at sf0.001, and one 3-batch engine-vs-oracle
run reused by the equality/invariant tests (SURVEY.md §5.2)."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlfront.fixtures import generate_fixtures  # noqa: E402

N_BATCHES = 3


@pytest.fixture(scope="session")
def fixture_dir() -> str:
    d = REPO / "fixtures" / "sf0.001"
    generate_fixtures(0.001, d)
    return str(d)


@pytest.fixture(scope="session")
def spark():
    from crawlfront.session import get_spark

    s = get_spark("local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine_run(spark, fixture_dir):
    """(engine, oracle_state) after the same 3 batches on both sides."""
    from crawlfront.frontier import CrawlEngine
    from crawlfront.oracle_sim import OracleSim

    ckpt = tempfile.mkdtemp(prefix="crawlfront_test_")
    eng = CrawlEngine(spark, fixture_dir, ckpt)
    eng.run(N_BATCHES)
    sim = OracleSim(fixture_dir)
    st = sim.run(N_BATCHES)
    return eng, st
