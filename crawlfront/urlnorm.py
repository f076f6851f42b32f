"""URL canonicalization — SURVEY.md §2 P1/X4/X5.

One pure function, ``canonicalize_url``, shared verbatim by:

- the Spark engine (vectorized inside a pandas UDF, crawlfront/ops.py D1)
- the sequential oracle simulator (tests/oracle equivalence)
- the fixture generator (so fixtures are pre-canonical where intended)

The reference crawler builds request URLs by string formatting and has no
explicit canonicalizer (SURVEY.md §2 P1 — `[PK-med]`); canonicalize+hash
dedup is mandated by BASELINE.json:6,14.  Rules follow RFC 3986 §6 plus
the usual crawler extras (tracking-param strip, param sort).

Determinism: no locale, no wall clock, no dict-order dependence (query
params are sorted), pure string→string.
"""

from __future__ import annotations

from urllib.parse import quote, unquote, urlsplit

# Query parameters that never affect page content — dropped before hashing.
TRACKING_PARAMS = frozenset(
    {
        "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
        "gclid", "fbclid", "msclkid", "ref", "ref_src", "spm",
    }
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}
# RFC 3986 unreserved + sub-delims we keep literal in paths/queries.
_SAFE_PATH = "/:@!$&'()*+,;=~-._"
_SAFE_QUERY = ":@!$&'()*+,;/?~-._"


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — collapse ``.`` and ``..`` path segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash semantics of "." / ".." endings
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def canonicalize_url(url: str) -> str:
    """Canonical form used for the URL-seen set and all dedup joins.

    - lowercase scheme and host; strip fragment; strip default port
    - strip trailing dot in host; empty path → "/"
    - collapse dot-segments; re-encode percent-escapes minimally
      (decode-then-quote with a fixed safe set → normalizes %7E vs ~ and
      uppercases remaining escapes)
    - drop tracking params; sort remaining query params by (key, value)
    """
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return url  # unparseable: canonical form is itself (still hashable)
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return url
    host = (parts.hostname or "").lower().rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"

    path = _remove_dot_segments(parts.path) or "/"
    path = quote(unquote(path), safe=_SAFE_PATH)

    query = ""
    if parts.query:
        pairs = []
        for item in parts.query.split("&"):
            if not item:
                continue
            k, sep, v = item.partition("=")
            k = unquote(k)
            if k in TRACKING_PARAMS:
                continue
            pairs.append((k, unquote(v) if sep else None))
        pairs.sort(key=lambda kv: (kv[0], kv[1] or ""))
        enc = []
        for k, v in pairs:
            kq = quote(k, safe=_SAFE_QUERY)
            enc.append(kq if v is None else f"{kq}={quote(v, safe=_SAFE_QUERY)}")
        query = "&".join(enc)

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def url_host(url: str) -> str:
    """Host for partitioning/politeness — twin of F.parse_url(url,'HOST')
    modulo lowercasing (we always lowercase; fixtures are lowercase)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def url_path(url: str) -> str:
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


def resolve_redirect(href: str) -> str:
    """X5 — decode a SERP redirect link to its real target.

    The reference resolves Baidu ``…/link?url=…`` redirects to target URLs
    (SURVEY.md §2 X5, BASELINE.json:6).  The synthetic corpus embeds the
    target url-encoded in the ``url`` query param of ``/link`` anchors;
    anything else passes through unchanged.
    """
    try:
        parts = urlsplit(href)
    except ValueError:
        return href
    if parts.path.endswith("/link") and parts.query:
        for item in parts.query.split("&"):
            k, _, v = item.partition("=")
            if k == "url" and v:
                return unquote(v)
    return href
