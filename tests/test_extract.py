"""D3 — extraction determinism and SERP parsing shape (the byte-identical
text contract, BASELINE.json:15)."""

from crawlfront.extract import extract_page

SERP = (
    '<html><head><title>kw1 - page 0</title><style>.t{}</style></head><body>'
    '<div class="result"><h3 class="t">'
    '<a href="https://h/link?url=https%3A%2F%2Ft%2Fa%2F00000001">title one</a></h3>'
    '<div class="c-abstract">abs one</div></div>'
    '<div class="result"><h3 class="t">'
    '<a href="https://h/link?url=https%3A%2F%2Ft%2Fa%2F00000002">title two</a></h3>'
    '<div class="c-abstract">abs two</div></div>'
    '<a class="next" href="https://h/serp?q=kw1&amp;pn=1">next page</a>'
    "</body></html>"
).encode()


def test_serp_results():
    ex = extract_page(SERP)
    assert ex.title == "kw1 - page 0"
    assert [(r.rank, r.title, r.abstract, r.link) for r in ex.results] == [
        (1, "title one", "abs one", "https://t/a/00000001"),
        (2, "title two", "abs two", "https://t/a/00000002"),
    ]
    assert ex.links == [
        "https://t/a/00000001",
        "https://t/a/00000002",
        "https://h/serp?q=kw1&pn=1",
    ]
    assert "title one" in ex.text and ".t{}" not in ex.text  # style excluded


def test_article_fallback():
    ex = extract_page(b"<html><head><title>art</title></head><body><p>para</p></body></html>",
                      base_url="https://h/a/1")
    assert len(ex.results) == 1
    r = ex.results[0]
    assert (r.rank, r.title, r.abstract, r.link) == (1, "art", "para", "https://h/a/1")


def test_deterministic_bytes():
    a = extract_page(SERP)
    b = extract_page(SERP)
    assert a.text == b.text and a.text.encode("utf-8") == b.text.encode("utf-8")


def test_malformed_tolerated():
    ex = extract_page(b"<div class=result><h3 class=t><a href='x'>t</a><p>unclosed")
    assert isinstance(ex.text, str)


def test_bad_utf8_replaced():
    ex = extract_page(b"<html><body><p>ok \xff\xfe bad</p></body></html>")
    assert "ok" in ex.text  # errors='replace' keeps going deterministically


# --- property-based fuzz (hypothesis) ---------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=512))
def test_extract_total_on_arbitrary_bytes(data):
    """D3 totality: the shared extractor never raises and is
    deterministic on ARBITRARY bytes — the engine UDF, oracle and
    fixture generator all call this one function, so a crash here is a
    crawl-stopping poison page at corpus scale."""
    a = extract_page(data, base_url="http://h.example/x")
    b = extract_page(data, base_url="http://h.example/x")
    assert a == b
    assert a.text is not None
    assert all(r.rank >= 1 for r in a.results)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=256))
def test_extract_total_on_arbitrary_text(html):
    ex = extract_page(html, base_url="")
    assert extract_page(html, base_url="") == ex
