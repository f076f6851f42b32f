"""DuckDB-SQL twins of Spark's hash functions, for the driver oracle.

Generates recursive-CTE SQL that reproduces ``F.hash`` (Murmur3_x86_32,
seed 42, including Spark's non-canonical sign-extended tail handling) and
``F.xxhash64`` (canonical XXH64, seed 42) bit-for-bit inside DuckDB, so
contract queries whose outputs are Spark hash values (X1–X3 partition
keys, A4 bloom shard assignment) get full value-hash oracle rows instead
of rows-only checks.

Technique: strings → UTF-8 bytes via ``hex(encode(col))`` (two hex chars
per byte, decoded with a strpos table that maps '0'→0 for free), then a
recursive CTE steps the hash state one word (or tail byte) per iteration.
All modular arithmetic runs in HUGEINT: 32-bit products fit directly;
64-bit multiplication is split into 32-bit halves so no intermediate
exceeds 2^127.  Rotations are arithmetic ((x*2^r) % 2^w + x // 2^(w-r))
— the two parts occupy disjoint bit ranges so ``+`` equals ``|``.

Verified bit-identical to crawlfront.hashing (itself pinned against
Spark in tests/test_hashing.py) over fixture URLs, empty strings, all
tail lengths, and non-ASCII input — tests/test_sqlhash.py.

Ref parity: the reference crawler has no hashing (SURVEY.md §2 X1);
murmur3 dedup is mandated by BASELINE.json:6,14 and this module exists
so the mandate's correctness gate (driver DuckDB comparison) can cover
the hash-bearing queries too.
"""

from __future__ import annotations

_M32 = 1 << 32
_M64 = 1 << 64

# xxhash64 primes
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def pmod_sql(x: str, m: int) -> str:
    """Spark ``F.pmod`` twin (non-negative modulus)."""
    return f"((({x}) % {m} + {m}) % {m})"


def _rotl(x: str, r: int, w: int) -> str:
    m = 1 << w
    return f"((({x}) * {1 << r}) % {m} + (({x}) // {1 << (w - r)}))"


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::hugeint, ({b})::hugeint)"


def _mm64(a: str, c: int) -> str:
    """(a * c) % 2^64 for a < 2^64, constant c — split so the largest
    intermediate is < 2^97 (HUGEINT-safe)."""
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return f"((({a}) * {cl} + ((({a}) * {ch}) % {_M32}) * {_M32}) % {_M64})"


def _bytes_cte(p: str, src: str, col: str) -> str:
    """CTE ``{p}_b(v, bl, n)``: distinct input values with their UTF-8
    byte list (1-based HUGEINT values) and byte length."""
    return f"""{p}_b AS (
  SELECT v,
         list_transform(range(octet_length(encode(v))),
            i -> (strpos('123456789ABCDEF', substr(hex(encode(v)), 2*i+1, 1)) * 16
                + strpos('123456789ABCDEF', substr(hex(encode(v)), 2*i+2, 1)))::hugeint
         ) AS bl,
         octet_length(encode(v))::hugeint AS n
  FROM (SELECT DISTINCT {col} AS v FROM {src}))"""


# --- murmur3-32, Spark flavor -------------------------------------------

def _mixk1(k: str) -> str:
    e = f"((({k}) * 3432918353) % {_M32})"
    return f"(({_rotl(e, 15, 32)} * 461845907) % {_M32})"


def _mixh1(h: str, k: str) -> str:
    e = _rotl(_xor(h, k), 13, 32)
    return f"(({e} * 5 + 3864292196) % {_M32})"


def murmur3_ctes(p: str, src: str, col: str) -> str:
    """CTE chain ending in ``{p}_m(v, h32)`` = Spark F.hash(col), seed 42.

    Splice into a ``WITH RECURSIVE`` list.  ``src`` is any relation,
    ``col`` the string column; duplicates are deduped and joined back by
    the caller.  Spark's tail quirk is preserved: each trailing byte is
    sign-extended and mixed as a full word (mixK1 + mixH1).
    """
    word = f"""CASE WHEN j < nw
        THEN bl[(4*j+1)::int] + bl[(4*j+2)::int]*256
           + bl[(4*j+3)::int]*65536 + bl[(4*j+4)::int]*16777216
        ELSE CASE WHEN bl[(4*nw + (j - nw) + 1)::int] >= 128
               THEN 4294967040 + bl[(4*nw + (j - nw) + 1)::int]
               ELSE bl[(4*nw + (j - nw) + 1)::int] END
      END"""
    return f"""{_bytes_cte(p, src, col)},
{p}_st AS (
  SELECT v, bl, n, n // 4 AS nw, n % 4 AS nt, 0::hugeint AS j, 42::hugeint AS h
  FROM {p}_b
  UNION ALL
  SELECT v, bl, n, nw, nt, j + 1, {_mixh1('h', _mixk1(word))}
  FROM {p}_st WHERE j < nw + nt),
{p}_f1 AS (
  SELECT v, {_xor('h', 'n')} AS h FROM {p}_st WHERE j = nw + nt),
{p}_f2 AS (SELECT v, ((xor(h, h // 65536) * 2246822507) % {_M32}) AS h FROM {p}_f1),
{p}_f3 AS (SELECT v, ((xor(h, h // 8192) * 3266489909) % {_M32}) AS h FROM {p}_f2),
{p}_m AS (
  SELECT v, (CASE WHEN xor(h, h // 65536) >= 2147483648
             THEN xor(h, h // 65536) - {_M32}
             ELSE xor(h, h // 65536) END)::int AS h32 FROM {p}_f3)"""


# --- xxhash64 (canonical XXH64 = Spark F.xxhash64), seed 42 --------------

def _word8(off: str) -> str:
    return "(" + " + ".join(
        f"bl[(({off}) + {k + 1})::int] * {1 << (8 * k)}" for k in range(8)) + ")"


def _word4(off: str) -> str:
    return "(" + " + ".join(
        f"bl[(({off}) + {k + 1})::int] * {1 << (8 * k)}" for k in range(4)) + ")"


def _xxround(acc: str, w: str) -> str:
    s = f"(({acc} + {_mm64(w, _P2)}) % {_M64})"
    return _mm64(_rotl(s, 31, 64), _P1)


def _mergev(h: str, v: str) -> str:
    e = _xor(h, _xxround("0::hugeint", v))
    return f"(({_mm64(e, _P1)} + {_P4}) % {_M64})"


def xxhash64_ctes(p: str, src: str, col: str) -> str:
    """CTE chain ending in ``{p}_x(v, h64)`` = Spark F.xxhash64(col)."""
    t8 = f"(({_mm64(_rotl(_xor('h', _xxround('0::hugeint', _word8('i'))), 27, 64), _P1)} + {_P4}) % {_M64})"
    w4p1 = f"(({_word4('i')}) * {_P1} % {_M64})"
    t4 = f"(({_mm64(_rotl(_xor('h', w4p1), 23, 64), _P2)} + {_P3}) % {_M64})"
    tb = _mm64(_rotl(_xor("h", f"((bl[(i+1)::int] * {_P5}) % {_M64})"), 11, 64), _P1)
    merged = _mergev(_mergev(_mergev(_mergev(
        f"(({_rotl('v1', 1, 64)} + {_rotl('v2', 7, 64)} + {_rotl('v3', 12, 64)} + {_rotl('v4', 18, 64)}) % {_M64})",
        "v1"), "v2"), "v3"), "v4")
    return f"""{_bytes_cte(p, src, col)},
{p}_sp AS (
  SELECT v, bl, n, 0::hugeint AS i,
         {(42 + _P1 + _P2) % _M64}::hugeint AS v1,
         {(42 + _P2) % _M64}::hugeint AS v2,
         42::hugeint AS v3,
         {(42 - _P1) % _M64}::hugeint AS v4
  FROM {p}_b WHERE n >= 32
  UNION ALL
  SELECT v, bl, n, i + 32,
         {_xxround('v1', _word8('i'))}, {_xxround('v2', _word8('i + 8'))},
         {_xxround('v3', _word8('i + 16'))}, {_xxround('v4', _word8('i + 24'))}
  FROM {p}_sp WHERE i <= n - 32),
{p}_big AS (
  SELECT v, bl, n, i, {merged} AS h FROM {p}_sp WHERE i > n - 32),
{p}_sm AS (
  SELECT v, bl, n, 0::hugeint AS i, {(42 + _P5) % _M64}::hugeint AS h
  FROM {p}_b WHERE n < 32),
{p}_ln AS (
  SELECT v, bl, n, i, (h + n) % {_M64} AS h
  FROM (SELECT * FROM {p}_big UNION ALL SELECT * FROM {p}_sm)),
{p}_t8 AS (
  SELECT * FROM {p}_ln
  UNION ALL
  SELECT v, bl, n, i + 8, {t8} FROM {p}_t8 WHERE i <= n - 8),
{p}_t8d AS (SELECT * FROM {p}_t8 WHERE i > n - 8),
{p}_t4 AS (
  SELECT v, bl, n,
    CASE WHEN i <= n - 4 THEN i + 4 ELSE i END AS i,
    CASE WHEN i <= n - 4 THEN {t4} ELSE h END AS h
  FROM {p}_t8d),
{p}_tb AS (
  SELECT * FROM {p}_t4
  UNION ALL
  SELECT v, bl, n, i + 1, {tb} FROM {p}_tb WHERE i < n),
{p}_a1 AS (SELECT v, {_mm64('xor(h, h // 8589934592)', _P2)} AS h
           FROM {p}_tb WHERE i = n),
{p}_a2 AS (SELECT v, {_mm64('xor(h, h // 536870912)', _P3)} AS h FROM {p}_a1),
{p}_x AS (
  SELECT v, (CASE WHEN xor(h, h // {1 << 32}) >= {1 << 63}
             THEN xor(h, h // {1 << 32}) - {_M64}
             ELSE xor(h, h // {1 << 32}) END)::bigint AS h64 FROM {p}_a2)"""
