"""Deterministic crawl-fixture generator — FIXTURES.md §B.

Synthesizes the Common-Crawl-style corpus the driver's input_hint fixes
(pages: url, warc_ts, html:binary, text, lang — BASELINE.json:15) plus
seeds / robots / politeness, at ``n_pages = 2_000_000 × sf``.  Pure
pyarrow (no SparkSession needed), single RNG ``PCG64(42)``, timestamps
derived from content hashes (never wall-clock), rows sorted by url —
byte-reproducible per FIXTURES.md determinism rules.

The ``text`` column is EXACTLY ``extract_page(html).text`` — the same
pure function the engine's D3 UDF runs — so the byte-identical-text
invariant (BASELINE.json:15) is checkable end-to-end.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from pathlib import Path
from urllib.parse import quote

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_page
from .hashing import xxhash64

EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)  # naive UTC, matches parquet timestamp[us]
_90D_S = 90 * 24 * 3600
SERP_PAGES_PER_KW = 10
RESULTS_PER_SERP = 10
DANGLING_EVERY = 40  # every 40th SERP result targets a non-existent article
DEFAULT_BUDGET = 8
HOT_BUDGET = 2

# Mixed-script vocabulary: multibyte UTF-8 tokens exercise Spark's
# non-aligned murmur3 tail path (SURVEY.md §0.3).
_VOCAB = (
    "data spark crawl frontier queue politeness robots shard bloom filter "
    "index page query result link host fetch batch snapshot lineage "
    "搜索 引擎 网页 抓取 排序 队列 数据 分析 索引 结果"
).split()


def _words(rng: np.random.Generator, n: int) -> str:
    return " ".join(_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n))


def _host(h: int) -> str:
    tld = ("com", "org", "net", "cn")[h % 4]
    return f"host{h:05d}.example.{tld}"


def _warc_ts(url: str) -> _dt.datetime:
    return EPOCH + _dt.timedelta(seconds=(xxhash64(url) & 0x7FFFFFFFFFFFFFFF) % _90D_S)


def _zipf_hosts(rng: np.random.Generator, n_draws: int, n_hosts: int) -> np.ndarray:
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks**-1.2
    p /= p.sum()
    return rng.choice(n_hosts, size=n_draws, p=p)


def _serp_url(host: str, k: int, p: int) -> str:
    return f"https://{host}/serp?q=kw{k}&pn={p}"


def _article_url(host: str, i: int) -> str:
    return f"https://{host}/a/{i:08d}"


def _serp_html(rng: np.random.Generator, host: str, k: int, p: int,
               targets: list[str]) -> str:
    blocks = []
    for rank, tgt in enumerate(targets, 1):
        title = f"title kw{k} r{rank} {_words(rng, 3)}"
        abstract = f"abstract {_words(rng, 8)}"
        redirect = f"https://{host}/link?url={quote(tgt, safe='')}"
        blocks.append(
            f'<div class="result"><h3 class="t"><a href="{redirect}">{title}</a></h3>'
            f'<div class="c-abstract">{abstract}</div></div>'
        )
    nav = ""
    if p + 1 < SERP_PAGES_PER_KW:
        nav = f'<a class="next" href="{_serp_url(host, k, p + 1)}">next page</a>'
    return (
        f"<html><head><title>kw{k} - page {p}</title>"
        '<style>.t{font-weight:bold}</style></head><body>'
        f'{"".join(blocks)}{nav}</body></html>'
    )


def _article_html(rng: np.random.Generator, i: int, outlinks: list[str]) -> str:
    paras = "".join(f"<p>{_words(rng, 24)}</p>" for _ in range(int(rng.integers(2, 5))))
    anchors = "".join(f'<a href="{u}">{_words(rng, 2)}</a>' for u in outlinks)
    return (
        f"<html><head><title>article {i:08d} {_words(rng, 2)}</title>"
        f"<script>var x={i};</script></head><body>{paras}{anchors}</body></html>"
    )


def fixture_sizes(sf: float) -> dict:
    n_pages = int(2_000_000 * sf)
    n_hosts = max(20, n_pages // 100)
    n_keywords = max(5, n_pages // 400)
    n_serps = n_keywords * SERP_PAGES_PER_KW
    n_articles = n_pages - n_serps
    return {
        "sf": sf,
        "n_pages": n_pages,
        "n_hosts": n_hosts,
        "n_keywords": n_keywords,
        "n_serps": n_serps,
        "n_articles": n_articles,
    }


def generate_fixtures(sf: float, out_dir: str | Path, force: bool = False) -> Path:
    """Write pages/seeds/robots/politeness parquet into ``out_dir``.

    Idempotent: skipped when ``meta.json`` already records this sf.
    """
    out = Path(out_dir)
    meta_p = out / "meta.json"
    sizes = fixture_sizes(sf)
    if not force and meta_p.exists():
        if json.loads(meta_p.read_text()).get("sf") == sf:
            return out
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(np.random.PCG64(42))
    nh, nk, na = sizes["n_hosts"], sizes["n_keywords"], sizes["n_articles"]

    # --- one fixed draw order (FIXTURES.md determinism rule 1) ---
    kw_hosts = _zipf_hosts(rng, nk, nh)  # keyword k's SERPs live on this host
    art_hosts = _zipf_hosts(rng, na, nh)
    article_urls = [_article_url(_host(int(art_hosts[i])), i) for i in range(na)]

    urls: list[str] = []
    htmls: list[bytes] = []
    hosts_of: list[int] = []

    # SERPs: keyword-major, page-minor — the reference's nested loop shape.
    for k in range(nk):
        h = int(kw_hosts[k])
        host = _host(h)
        for p in range(SERP_PAGES_PER_KW):
            tgt_idx = rng.integers(0, na, RESULTS_PER_SERP)
            targets = []
            for j, ti in enumerate(tgt_idx):
                serial = (k * SERP_PAGES_PER_KW + p) * RESULTS_PER_SERP + j
                if serial % DANGLING_EVERY == DANGLING_EVERY - 1:
                    targets.append(_article_url(_host(h), na + serial))  # dangling
                else:
                    targets.append(article_urls[int(ti)])
            urls.append(_serp_url(host, k, p))
            htmls.append(_serp_html(rng, host, k, p, targets).encode("utf-8"))
            hosts_of.append(h)

    for i in range(na):
        n_out = int(rng.integers(1, 4))
        out_idx = rng.integers(0, na, n_out)
        outlinks = [article_urls[int(j)] for j in out_idx]
        urls.append(article_urls[i])
        htmls.append(_article_html(rng, i, outlinks).encode("utf-8"))
        hosts_of.append(int(art_hosts[i]))

    texts = [extract_page(h).text for h in htmls]
    langs = ["zh" if h % 5 == 0 else "en" for h in hosts_of]
    tss = [_warc_ts(u) for u in urls]

    order = sorted(range(len(urls)), key=lambda i: urls[i])
    pages = pa.table(
        {
            "url": pa.array([urls[i] for i in order], pa.string()),
            "warc_ts": pa.array([tss[i] for i in order], pa.timestamp("us")),
            "html": pa.array([htmls[i] for i in order], pa.binary()),
            "text": pa.array([texts[i] for i in order], pa.string()),
            "lang": pa.array([langs[i] for i in order], pa.string()),
        }
    )
    # pages is the big table and carries the per-row Python extraction
    # cost downstream — write it as a DIRECTORY of deterministic part
    # files with small row groups so Spark scans parallelize (a single
    # 80 MB one-row-group file = one task = one core, SURVEY.md §4).
    pages_dir = out / "pages.parquet"
    if pages_dir.exists() and pages_dir.is_file():
        pages_dir.unlink()
    pages_dir.mkdir(parents=True, exist_ok=True)
    for old in pages_dir.glob("part-*.parquet"):
        old.unlink()
    chunk = 8192
    for fi, lo in enumerate(range(0, max(pages.num_rows, 1), chunk)):
        pq.write_table(
            pages.slice(lo, chunk),
            pages_dir / f"part-{fi:05d}.parquet",
            row_group_size=chunk,
        )

    seeds = pa.table(
        {
            "url": pa.array(
                [_serp_url(_host(int(kw_hosts[k])), k, 0) for k in range(nk)], pa.string()
            ),
            "seed_rank": pa.array(range(nk), pa.int32()),
            "priority": pa.array([0] * nk, pa.int32()),
        }
    )
    pq.write_table(seeds, out / "seeds.parquet", row_group_size=1 << 20)

    rule_t = pa.list_(
        pa.struct([pa.field("prefix", pa.string(), False), pa.field("allow", pa.bool_(), False)])
    )
    r_hosts, r_rules, r_delay, r_ts = [], [], [], []
    for h in range(nh):
        r_hosts.append(_host(h))
        if h % 7 == 0:
            rules = [{"prefix": "/serp", "allow": False}, {"prefix": "/", "allow": True}]
        elif h % 11 == 0:
            rules = [{"prefix": "/a/", "allow": False}, {"prefix": "/", "allow": True}]
        else:
            rules = [{"prefix": "/", "allow": True}]
        r_rules.append(rules)
        r_delay.append(100 + (h % 5) * 200)
        r_ts.append(EPOCH)
    robots = pa.table(
        {
            "host": pa.array(r_hosts, pa.string()),
            "rules": pa.array(r_rules, rule_t),
            "crawl_delay_ms": pa.array(r_delay, pa.int64()),
            "fetched_ts": pa.array(r_ts, pa.timestamp("us")),
        }
    )
    pq.write_table(robots, out / "robots.parquet", row_group_size=1 << 20)

    host_counts = np.bincount(hosts_of, minlength=nh)
    n_hot = max(1, nh // 20)
    hot = np.argsort(-host_counts, kind="stable")[:n_hot]
    politeness = pa.table(
        {
            "host": pa.array(sorted(_host(int(h)) for h in hot), pa.string()),
            "budget": pa.array([HOT_BUDGET] * n_hot, pa.int32()),
        }
    )
    pq.write_table(politeness, out / "politeness.parquet", row_group_size=1 << 20)

    meta_p.write_text(json.dumps(sizes, indent=1))
    return out


# --- multimodal media fixtures ----------------------------------------------
# Real byte-level PNG / GIF / JPEG headers (stdlib struct/zlib only — no
# image libs in this sandbox), so the multimodal_meta decode path parses
# TRUE dimensions instead of fakes.  JPEGs carry a variable number of
# variable-length APP0/COM segments before the SOF marker, so the
# marker-walk is genuinely exercised (SOF is never at a fixed offset).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_blob(rng: np.random.Generator, w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    crc = struct.pack(">I", zlib.crc32(ihdr[4:]))
    payload = rng.integers(0, 256, size=int(rng.integers(16, 128)), dtype=np.uint8).tobytes()
    return _PNG_SIG + ihdr + crc + payload + b"\x00\x00\x00\x00IEND\xaeB`\x82"


def _gif_blob(rng: np.random.Generator, w: int, h: int) -> bytes:
    import struct

    payload = rng.integers(0, 256, size=int(rng.integers(8, 64)), dtype=np.uint8).tobytes()
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00" + payload + b"\x3b"


def _jpeg_blob(rng: np.random.Generator, w: int, h: int) -> bytes:
    import struct

    out = b"\xff\xd8"
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    for _ in range(int(rng.integers(0, 4))):  # 0–3 comment segments
        com = rng.integers(0, 256, size=int(rng.integers(4, 64)), dtype=np.uint8).tobytes()
        out += b"\xff\xfe" + struct.pack(">H", len(com) + 2) + com
    sof_marker = (b"\xff\xc0", b"\xff\xc1", b"\xff\xc2")[int(rng.integers(0, 3))]
    sof = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    scan = rng.integers(0, 256, size=int(rng.integers(16, 128)), dtype=np.uint8).tobytes()
    out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"
    return out + scan + b"\xff\xd9"


def _webp_blob(rng: np.random.Generator, w: int, h: int, variant: int) -> bytes:
    """Real RIFF/WEBP container with one of the three bitstream headers:
    variant 0 = VP8 lossy (frame tag + 0x9D012A sync + 14-bit LE dims),
    1 = VP8L lossless (0x2F signature + 14+14-bit LE dim bitfield),
    2 = VP8X extended (24-bit LE canvas−1 fields)."""
    import struct

    tail = rng.integers(0, 256, size=int(rng.integers(8, 64)), dtype=np.uint8).tobytes()
    if variant == 0:
        payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + tail
        chunk_id = b"VP8 "
    elif variant == 1:
        bits = (w - 1) | ((h - 1) << 14)
        payload = b"\x2f" + struct.pack("<I", bits) + tail
        chunk_id = b"VP8L"
    else:
        payload = (b"\x00\x00\x00\x00"
                   + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3] + tail)
        chunk_id = b"VP8X"
    chunk = chunk_id + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _wav_blob(rng: np.random.Generator, rate: int, channels: int) -> bytes:
    """Real RIFF/WAVE header: canonical 16-byte PCM fmt chunk first."""
    import struct

    data = rng.integers(0, 256, size=int(rng.integers(16, 96)), dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def generate_media_fixtures(sf: float, out_dir: str | Path | None = None,
                            force: bool = False) -> Path:
    """Write ``media.parquet`` (url:string, html:binary) next to the crawl
    fixtures: a deterministic mix of real-header PNG / GIF / JPEG / WebP
    (all three bitstream variants, rotating) / WAV blobs, html-text rows,
    and signatureless junk rows (seed 43, independent of the crawl
    fixtures' seed 42 — adding media never perturbs the engine-vs-oracle
    crawl invariants).  Idempotent per (sf, path)."""
    out = Path(out_dir) if out_dir is not None else fixture_dir_for_sf(sf)
    out.mkdir(parents=True, exist_ok=True)
    path = out / "media.parquet"
    if path.exists() and not force:
        return path
    rng = np.random.default_rng(np.random.PCG64(43))
    n = max(70, int(4000 * sf))
    urls, blobs = [], []
    for i in range(n):
        urls.append(f"https://media{i % 97:03d}.example.org/asset/{i:06d}")
        kind = i % 7
        w = int(rng.integers(1, 4000))
        h = int(rng.integers(1, 3000))
        if kind == 0:
            blobs.append(_png_blob(rng, w, h))
        elif kind == 1:
            blobs.append(_gif_blob(rng, w, h))
        elif kind == 2:
            blobs.append(_jpeg_blob(rng, w, h))
        elif kind == 3:
            blobs.append(_webp_blob(rng, w, h, (i // 7) % 3))
        elif kind == 4:
            rate = int(rng.integers(8, 97)) * 500  # 4k–48k Hz
            blobs.append(_wav_blob(rng, rate, int(rng.integers(1, 9))))
        elif kind == 5:
            blobs.append(f"<html><body>asset {i} landing page</body></html>".encode())
        else:  # junk: no known signature, first byte NUL so nothing matches
            junk = rng.integers(0, 256, size=int(rng.integers(8, 96)), dtype=np.uint8)
            blobs.append(b"\x00BIN" + junk.tobytes())
    t = pa.table({"url": pa.array(urls, pa.string()),
                  "html": pa.array(blobs, pa.binary())})
    tmp = path.with_suffix(".parquet.tmp")
    pq.write_table(t, tmp, row_group_size=4096)
    os.replace(tmp, path)
    return path


# Repo-stable fixture roots: queries()/oracle_sql() (driver contract) need a
# path that is identical between the Spark side and the DuckDB SQL string.
# CRAWLFRONT_FIXTURE_ROOT overrides for launch modes where the package is
# imported from a --py-files zip (``__file__`` then points inside the zip,
# which is not a writable/readable fixture directory).
FIXTURE_ROOT = Path(
    os.environ.get("CRAWLFRONT_FIXTURE_ROOT")
    or Path(__file__).resolve().parent.parent / "fixtures"
)


def fixture_dir_for_sf(sf: float, generate: bool = True) -> Path:
    d = FIXTURE_ROOT / f"sf{sf:g}"
    if generate:
        generate_fixtures(sf, d)
    return d


def sf_of_dir(sf_dir: str) -> float:
    """Parse the driver's sf dir name (…/sf0.01) into the scale factor."""
    name = Path(sf_dir).name
    return float(name[2:]) if name.startswith("sf") else 0.01
