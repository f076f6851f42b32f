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


def test_url_trap_features_positive_paths(spark):
    """ops.url_trap_features flags the three trap signatures (the
    fixture corpus is trap-free, so the contract row only exercises the
    negative path — this pins the positives)."""
    from crawlfront.ops import url_trap_features

    cases = [
        ("https://h.example/a/b/c", False),                       # clean
        ("https://h.example/cal/cal/2020", True),                 # repeat
        ("https://h.example/" + "/".join("abcdefghij"), True),    # depth 10
        ("https://h.example/x?a=1&b=2&c=3&d=4&e=5&f=6", True),    # params
        ("https://h.example/", False),                            # root
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r for r in url_trap_features(df).collect()}
    for u, trap in cases:
        assert got[u]["is_trap"] == trap, (u, dict(got[u].asDict()))
    assert got["https://h.example/"]["depth"] == 0
    assert got["https://h.example/cal/cal/2020"]["has_repeat"]
    assert got["https://h.example/x?a=1&b=2&c=3&d=4&e=5&f=6"]["n_params"] == 6
