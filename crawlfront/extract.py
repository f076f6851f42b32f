"""SERP/article extraction — SURVEY.md §2 D3; BASELINE.json:6,15.

The reference crawler parses each fetched Baidu SERP into per-result
(rank, title, abstract, link) records, resolving redirect links to real
target URLs, and the contract demands *byte-identical extracted text per
url* (BASELINE.json:15).  This module is the single source of truth for
those bytes: the same pure function is used by

- the Spark engine (vectorized over Arrow batches in ops.py)
- the sequential oracle simulator (tests/oracle parity)
- the fixture generator (the ``pages.text`` column IS this function's
  output over ``pages.html`` — FIXTURES.md B1)

Constraints: stdlib ``html.parser`` only (no lxml/bs4 in the sandbox —
SURVEY.md §0.3); decode bytes as UTF-8 with errors='replace', fixed and
deterministic.

SERP markup contract (FIXTURES.md B1): result blocks are
``<div class="result"><h3 class="t"><a href=REDIRECT>title</a></h3>
<div class="c-abstract">abstract</div></div>``; article pages are
``<title>…</title>`` + ``<p>`` body.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from .urlnorm import resolve_redirect

# Tags whose text content is never part of the visible text.
_SKIP_TEXT_TAGS = frozenset({"script", "style", "head", "noscript", "template"})
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


@dataclass
class SerpResult:
    rank: int
    title: str
    abstract: str
    link: str


@dataclass
class PageExtract:
    title: str = ""
    results: list = field(default_factory=list)  # list[SerpResult]
    links: list = field(default_factory=list)  # all hrefs, redirect-resolved
    text: str = ""


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[tuple[str, frozenset]] = []  # (tag, classes)
        self.title_parts: list[str] = []
        self.text_parts: list[str] = []
        self.links: list[str] = []
        self.results: list[SerpResult] = []
        # in-flight result block state
        self._in_result = 0
        self._cur_title: list[str] = []
        self._cur_abstract: list[str] = []
        self._cur_link: str = ""
        self._in_res_title = 0
        self._in_res_abstract = 0

    @staticmethod
    def _classes(attrs) -> frozenset:
        for k, v in attrs:
            if k == "class" and v:
                return frozenset(v.split())
        return frozenset()

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        classes = self._classes(attrs)
        self.stack.append((tag, classes))
        if tag == "div" and "result" in classes:
            self._in_result += 1
            self._cur_title, self._cur_abstract, self._cur_link = [], [], ""
        elif self._in_result:
            if tag == "h3" and "t" in classes:
                self._in_res_title += 1
            elif tag == "div" and "c-abstract" in classes:
                self._in_res_abstract += 1
        if tag == "a":
            href = next((v for k, v in attrs if k == "href" and v), "")
            if href:
                resolved = resolve_redirect(href)
                self.links.append(resolved)
                if self._in_res_title and not self._cur_link:
                    self._cur_link = resolved

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        # pop to the matching open tag (tolerates mis-nesting)
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                t, classes = self.stack[i]
                del self.stack[i:]
                if t == "div" and "result" in classes and self._in_result:
                    self._in_result -= 1
                    self.results.append(
                        SerpResult(
                            rank=len(self.results) + 1,
                            title=" ".join(self._cur_title),
                            abstract=" ".join(self._cur_abstract),
                            link=self._cur_link,
                        )
                    )
                elif t == "h3" and "t" in classes and self._in_res_title:
                    self._in_res_title -= 1
                elif t == "div" and "c-abstract" in classes and self._in_res_abstract:
                    self._in_res_abstract -= 1
                return

    def handle_data(self, data):
        chunk = " ".join(data.split())
        if not chunk:
            return
        tags = [t for t, _ in self.stack]
        if any(t in _SKIP_TEXT_TAGS for t in tags):
            if "title" in tags and "head" in tags:
                self.title_parts.append(chunk)
            return
        if "title" in tags:
            self.title_parts.append(chunk)
            return
        self.text_parts.append(chunk)
        if self._in_res_title:
            self._cur_title.append(chunk)
        elif self._in_res_abstract:
            self._cur_abstract.append(chunk)


def extract_page(html: bytes | str, base_url: str = "") -> PageExtract:
    """Parse one page.  Deterministic: UTF-8 errors='replace', fixed
    whitespace normalization (runs of whitespace → single space inside a
    text node; text nodes joined by '\\n').

    For pages with no ``div.result`` blocks (article pages) a single
    synthetic result is emitted: rank 1, the <title> text, the first text
    chunk as abstract, link = base_url — mirroring the reference's
    one-record-per-parse shape.
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # tolerate malformed markup; keep whatever was extracted
    out = PageExtract(
        title=" ".join(p.title_parts),
        results=p.results,
        links=p.links,
        text="\n".join(p.text_parts),
    )
    if not out.results:
        abstract = p.text_parts[0] if p.text_parts else ""
        out.results = [SerpResult(rank=1, title=out.title, abstract=abstract, link=base_url)]
    return out
