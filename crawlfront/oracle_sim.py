"""Sequential oracle simulator — SURVEY.md §5.2.1.

A pure-Python, single-threaded, no-Spark reimplementation of the
reference crawler's nested-loop semantics (seed order × page order,
per-host politeness budget, robots gate, canonicalize+dedup), sharing the
SAME pure functions (canonicalize_url, extract_page, hashing) as the
Spark engine.  The engine must match it exactly: same fetch set, same
``schedule_idx`` order (BASELINE.json:6,14), byte-identical ``text`` per
url (BASELINE.json:15).

This file is the normative definition of batch semantics; the Spark
pipeline in frontier.py implements the same rules distributed.  Kept
small and imperative so it can be audited against the real reference if
/root/reference is ever populated (it was empty this session — SURVEY §0).

Batch semantics (normative):

1. ``pending`` = frontier rows with state PENDING.
2. Robots gate first: longest-prefix match of the url path against the
   host's rules (missing host ⇒ allow).  Disallowed rows → state BLOCKED
   now (terminal), counted ``robots_blocked`` this batch.
3. ``host_rank`` = 1-based rank within host over allowed pending rows,
   ordered by (priority, seed_rank, depth, url_norm) — total order.
4. Politeness: rows with host_rank > budget (politeness table, default
   DEFAULT_BUDGET) stay PENDING, counted ``politeness_deferred``.
5. Global schedule order = (priority, seed_rank, host_rank, host,
   url_norm); first ``drain_k`` rows are scheduled this batch and get
   consecutive global ``schedule_idx`` (cumulative across batches,
   starting 0).  Rows beyond drain_k stay PENDING (not counted deferred).
6. Fetch = exact-url lookup in the pages corpus.  Hit → FETCHED, extract
   (rank/title/abstract/link per result + page text).  Miss →
   retry_count += 1; >= MAX_RETRIES ⇒ FAILED (counted), else PENDING.
7. Discovery: links of fetched pages, redirect-resolved, canonicalized,
   http(s) only.  Per distinct url_norm keep the lexicographically least
   (priority, seed_rank, depth, url) candidate where priority = depth =
   parent depth + 1 and seed_rank is inherited.  url_norms already seen
   → counted ``deduped``; the rest enqueue as PENDING with
   discovered_batch = b, discovered_ts = EPOCH + b seconds, and enter the
   seen set.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow.parquet as pq

from .extract import extract_page
from .fixtures import EPOCH
from .hashing import murmur3_32, xxhash64
from .urlnorm import canonicalize_url, url_host, url_path

DEFAULT_BUDGET = 8
MAX_RETRIES = 2
DEFAULT_DRAIN_K = 100_000


def robots_allows(rules: list[tuple[str, bool]] | None, path: str) -> bool:
    """RFC 9309-style longest-prefix match; no rules / no match ⇒ allow."""
    if not rules:
        return True
    best_len, best_allow = -1, True
    for prefix, allow in rules:
        if path.startswith(prefix) and len(prefix) > best_len:
            best_len, best_allow = len(prefix), allow
    return best_allow


@dataclass
class FrontierRow:
    url: str
    url_norm: str
    host: str
    priority: int
    seed_rank: int
    depth: int
    discovered_batch: int
    state: str = "PENDING"
    retry_count: int = 0

    @property
    def url_hash32(self) -> int:
        return murmur3_32(self.url_norm)

    @property
    def url_hash64(self) -> int:
        return xxhash64(self.url_norm)


@dataclass
class BatchCounters:
    batch_id: int
    fetched: int = 0
    deduped: int = 0
    robots_blocked: int = 0
    politeness_deferred: int = 0
    failed: int = 0


@dataclass
class SimState:
    frontier: dict[str, FrontierRow] = field(default_factory=dict)  # url_norm → row
    seen: set[str] = field(default_factory=set)
    results: list[dict] = field(default_factory=list)
    counters: list[BatchCounters] = field(default_factory=list)
    next_idx: int = 0


class OracleSim:
    def __init__(self, fixture_dir: str | Path, default_budget: int = DEFAULT_BUDGET,
                 drain_k: int = DEFAULT_DRAIN_K, max_retries: int = MAX_RETRIES):
        d = Path(fixture_dir)
        pages = pq.read_table(d / "pages.parquet", columns=["url", "html", "text"]).to_pylist()
        self.pages = {r["url"]: (r["html"], r["text"]) for r in pages}
        self.robots: dict[str, list[tuple[str, bool]]] = {}
        for r in pq.read_table(d / "robots.parquet").to_pylist():
            self.robots[r["host"]] = [(x["prefix"], x["allow"]) for x in r["rules"]]
        self.budgets = {
            r["host"]: r["budget"] for r in pq.read_table(d / "politeness.parquet").to_pylist()
        }
        self.seeds = sorted(
            pq.read_table(d / "seeds.parquet").to_pylist(), key=lambda r: r["seed_rank"]
        )
        self.default_budget = default_budget
        self.drain_k = drain_k
        self.max_retries = max_retries

    def init_state(self) -> SimState:
        st = SimState()
        for s in self.seeds:
            norm = canonicalize_url(s["url"])
            if norm in st.seen:
                continue
            st.seen.add(norm)
            st.frontier[norm] = FrontierRow(
                url=s["url"], url_norm=norm, host=url_host(s["url"]),
                priority=s["priority"], seed_rank=s["seed_rank"], depth=0,
                discovered_batch=0,
            )
        return st

    def run_batch(self, st: SimState, batch_id: int) -> BatchCounters:
        c = BatchCounters(batch_id)
        pending = [r for r in st.frontier.values() if r.state == "PENDING"]

        allowed: list[FrontierRow] = []
        for r in pending:
            if robots_allows(self.robots.get(r.host), url_path(r.url_norm)):
                allowed.append(r)
            else:
                r.state = "BLOCKED"
                c.robots_blocked += 1

        allowed.sort(key=lambda r: (r.priority, r.seed_rank, r.depth, r.url_norm))
        host_rank: dict[str, int] = {}
        eligible: list[tuple] = []
        for r in allowed:
            hr = host_rank.get(r.host, 0) + 1
            host_rank[r.host] = hr
            if hr <= self.budgets.get(r.host, self.default_budget):
                eligible.append((r.priority, r.seed_rank, hr, r.host, r.url_norm, r))
            else:
                c.politeness_deferred += 1

        eligible.sort(key=lambda t: t[:5])
        scheduled = eligible[: self.drain_k]

        discovered: dict[str, tuple] = {}  # url_norm → (prio, seed_rank, depth, url)
        for prio, srank, hr, host, norm, r in scheduled:
            idx = st.next_idx
            st.next_idx += 1
            page = self.pages.get(r.url)
            if page is None:
                r.retry_count += 1
                if r.retry_count >= self.max_retries:
                    r.state = "FAILED"
                    c.failed += 1
                continue
            html, _text = page
            r.state = "FETCHED"
            c.fetched += 1
            ex = extract_page(html, base_url=r.url)
            for res in ex.results:
                st.results.append(
                    {
                        "url": r.url, "batch_id": batch_id, "schedule_idx": idx,
                        "rank": res.rank, "title": res.title,
                        "abstract": res.abstract, "link": res.link, "text": ex.text,
                    }
                )
            for link in ex.links:
                norm2 = canonicalize_url(link)
                if not norm2.startswith(("http://", "https://")):
                    continue
                cand = (r.depth + 1, r.seed_rank, r.depth + 1, link)
                prev = discovered.get(norm2)
                if prev is None or cand < prev:
                    discovered[norm2] = cand

        for norm2 in sorted(discovered):
            prio2, srank2, depth2, link = discovered[norm2]
            if norm2 in st.seen:
                c.deduped += 1
                continue
            st.seen.add(norm2)
            st.frontier[norm2] = FrontierRow(
                url=link, url_norm=norm2, host=url_host(link),
                priority=prio2, seed_rank=srank2, depth=depth2,
                discovered_batch=batch_id,
            )
        st.counters.append(c)
        return c

    def run(self, n_batches: int) -> SimState:
        st = self.init_state()
        for b in range(1, n_batches + 1):
            self.run_batch(st, b)
        return st


def discovered_ts(batch_id: int) -> _dt.datetime:
    """Deterministic discovery timestamp used by BOTH oracle and engine."""
    return EPOCH + _dt.timedelta(seconds=batch_id)
