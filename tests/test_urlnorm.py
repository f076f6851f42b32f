"""P1 — canonicalization rules and properties (idempotence is what makes
the URL-seen set well-defined)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlfront.urlnorm import canonicalize_url, resolve_redirect, url_host, url_path

CASES = {
    "HTTPS://Host00001.Example.COM:443/a/x": "https://host00001.example.com/a/x",
    "http://h.example.com:80/": "http://h.example.com/",
    "http://h.example.com:8080/": "http://h.example.com:8080/",
    "https://h.example.com": "https://h.example.com/",
    "https://h.example.com/a/../b/./c": "https://h.example.com/b/c",
    "https://h.example.com/a%7Eb": "https://h.example.com/a~b",
    "https://h.example.com/x#frag": "https://h.example.com/x",
    "https://h.example.com/s?b=2&a=1": "https://h.example.com/s?a=1&b=2",
    "https://h.example.com/s?q=1&utm_source=x&fbclid=y": "https://h.example.com/s?q=1",
    "https://h.example.com/s?q=%E4%B8%AD": "https://h.example.com/s?q=%E4%B8%AD",
    "https://h.example.com./x": "https://h.example.com/x",
    "ftp://h.example.com/x": "ftp://h.example.com/x",  # non-http passthrough
}


def test_cases():
    for raw, want in CASES.items():
        assert canonicalize_url(raw) == want, raw


def test_idempotent_on_cases():
    for raw in CASES:
        c = canonicalize_url(raw)
        assert canonicalize_url(c) == c, raw


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet="abcxyz09:/?&=._-%#~ 中",
        max_size=30,
    )
)
def test_idempotent_property(tail):
    url = "https://h.example.com/" + tail
    c = canonicalize_url(url)
    assert canonicalize_url(c) == c


def test_host_path():
    assert url_host("https://A.B.example.com:8443/x?q=1") == "a.b.example.com"
    assert url_path("https://h.example.com") == "/"
    assert url_path("https://h.example.com/serp?q=1") == "/serp"


def test_resolve_redirect():
    assert (
        resolve_redirect("https://h/link?url=https%3A%2F%2Ft.example.com%2Fa%2F1")
        == "https://t.example.com/a/1"
    )
    assert resolve_redirect("https://h/a/1") == "https://h/a/1"
    assert resolve_redirect("https://h/link?x=1") == "https://h/link?x=1"
