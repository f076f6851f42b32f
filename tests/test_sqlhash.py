"""sqlhash: the DuckDB-SQL hash twins match crawlfront.hashing bit-for-bit.

crawlfront.hashing is itself pinned against Spark's F.hash / F.xxhash64
in test_hashing.py, so equality here makes the SQL twins Spark-exact by
transitivity (no SparkSession needed in this test).
"""

import duckdb
import pytest

from crawlfront.hashing import murmur3_32, xxhash64
from crawlfront.sqlhash import murmur3_ctes, pmod_sql, xxhash64_ctes

CASES = [
    "",
    "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg", "abcdefgh",
    "1234567890123456789012345678901",    # 31 bytes (small path, all tails)
    "12345678901234567890123456789012",   # 32 bytes (one stripe, no tail)
    "123456789012345678901234567890123456789",  # stripe + 7-byte tail
    "http://site-000123.example.com/page/000045?pn=0&q=kw1",
    "https://host.example.org/very/long/path/segments/here/0123456789?x=1&y=2&z=3",
    "é", "中文漢字", "http://x.y/é中文/ß?q=ü",   # non-ASCII (multi-byte UTF-8)
    "\x7f\x01 mixed \x00" if False else "mixed ascii ~!@#$%^&*()",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE u(s VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(c,) for c in CASES])
    return con


def test_murmur3_sql_twin(duck):
    sql = f"WITH RECURSIVE {murmur3_ctes('m', 'u', 's')} SELECT v, h32 FROM m_m"
    got = dict(duck.execute(sql).fetchall())
    for c in CASES:
        assert got[c] == murmur3_32(c), c


def test_xxhash64_sql_twin(duck):
    sql = f"WITH RECURSIVE {xxhash64_ctes('x', 'u', 's')} SELECT v, h64 FROM x_x"
    got = dict(duck.execute(sql).fetchall())
    for c in CASES:
        assert got[c] == xxhash64(c), c


def test_pmod_sql(duck):
    assert duck.execute(f"SELECT {pmod_sql('-7', 32)}").fetchone()[0] == 25
    assert duck.execute(f"SELECT {pmod_sql('7', 32)}").fetchone()[0] == 7


def test_fixture_urls_both(duck, fixture_dir):
    """Every distinct seed/page URL at sf0.001 hashes identically."""
    fx = fixture_dir
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE u AS SELECT url AS s FROM read_parquet('{fx}/seeds.parquet') "
        f"UNION SELECT url FROM read_parquet('{fx}/pages.parquet/*.parquet')"
    )
    sql = (
        f"WITH RECURSIVE {murmur3_ctes('m', 'u', 's')}, "
        f"{xxhash64_ctes('x', 'u', 's')} "
        "SELECT m.v, m.h32, x.h64 FROM m_m m JOIN x_x x USING (v)"
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) > 100
    for v, h32, h64 in rows:
        assert h32 == murmur3_32(v)
        assert h64 == xxhash64(v)


# --- property-based fuzz (hypothesis): arbitrary unicode through all twins --

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# NUL is excluded: DuckDB VARCHAR rejects embedded \x00 at bind time, and
# no operational input (URLs, shingles) can carry it.  Surrogates
# (U+D800–DFFF) are excluded too: they are not encodable as UTF-8, so no
# Spark string (UTF8String) or DuckDB VARCHAR can ever hold one — the
# pybind bind layer rejects them outright.  Everything else — multibyte
# UTF-8, astral plane, non-4-byte-aligned tails — is fair game.
_chars = st.characters(blacklist_characters="\x00",
                       blacklist_categories=("Cs",))
_texts = st.lists(st.text(_chars, max_size=64), min_size=1, max_size=8)


@settings(max_examples=40, deadline=None)
@given(_texts)
def test_sql_twins_fuzz(strings):
    con = duckdb.connect()
    con.execute("CREATE TABLE u(s VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(s,) for s in strings])
    sql = (
        f"WITH RECURSIVE {murmur3_ctes('m', 'u', 's')}, "
        f"{xxhash64_ctes('x', 'u', 's')} "
        "SELECT m.v, m.h32, x.h64 FROM m_m m JOIN x_x x USING (v)"
    )
    for v, h32, h64 in con.execute(sql).fetchall():
        assert h32 == murmur3_32(v), repr(v)
        assert h64 == xxhash64(v), repr(v)


@settings(max_examples=60, deadline=None)
@given(st.text(_chars, max_size=64))
def test_portable_hash64_twin_fuzz(s):
    """The engine-portable md5-derived hash (analytics.portable_hash64 /
    __spark_entry__._phash_sql) has THREE legs: Spark conv(substr(md5)),
    DuckDB ('0x'||substr(md5))::bigint, Python int(md5[:15],16).  The
    Spark≡DuckDB legs are pinned by every minhash/simhash/winnow contract
    row; this pins DuckDB≡Python on arbitrary unicode."""
    import hashlib

    expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    got = duckdb.execute(
        "SELECT ('0x' || substr(md5(?), 1, 15))::bigint", [s]
    ).fetchone()[0]
    assert got == expect, repr(s)
