"""FIXTURES.md §B — generator determinism, schema shape, link closure,
and the text-column invariant (text == extract_page(html).text)."""

import pyarrow.parquet as pq

from crawlfront.extract import extract_page
from crawlfront.fixtures import fixture_sizes


def test_sizes():
    s = fixture_sizes(0.001)
    assert s["n_pages"] == 2000 and s["n_hosts"] == 20 and s["n_keywords"] == 5


def test_pages_schema_matches_driver_hint(fixture_dir):
    t = pq.read_table(f"{fixture_dir}/pages.parquet")
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert str(t.schema.field("html").type) == "binary"


def test_text_is_extractor_output(fixture_dir):
    t = pq.read_table(f"{fixture_dir}/pages.parquet", columns=["html", "text"])
    rows = t.slice(0, 50).to_pylist()
    for r in rows:
        assert extract_page(r["html"]).text == r["text"]


def test_link_closure(fixture_dir):
    """≥95% of extracted hrefs resolve in-corpus (FIXTURES.md B1)."""
    t = pq.read_table(f"{fixture_dir}/pages.parquet", columns=["url", "html"]).to_pylist()
    urls = {r["url"] for r in t}
    total = hits = 0
    for r in t[:300]:
        for link in extract_page(r["html"]).links:
            total += 1
            hits += link in urls
    assert total > 0 and hits / total >= 0.95


def test_urls_unique_and_sorted(fixture_dir):
    t = pq.read_table(f"{fixture_dir}/pages.parquet", columns=["url"])
    urls = t.column("url").to_pylist()
    assert urls == sorted(urls)
    assert len(set(urls)) == len(urls)


def test_seed_order(fixture_dir):
    s = pq.read_table(f"{fixture_dir}/seeds.parquet").to_pylist()
    assert [r["seed_rank"] for r in s] == list(range(len(s)))
    assert all(r["url"].endswith("pn=0") for r in s)
