"""HTML kernel tests — ports of TestGather.scala and TestLinkContext.scala
message-level expectations to the pure kernels."""

from webcrawler_spark.kernels import (
    extract_links,
    extract_text,
    link_context,
    term_counts,
)


def tools_xml(n: int) -> str:
    """The reference test page (Tools.scala:16-29)."""
    links = "".join(
        f'<a href="http://example.org/{k}">\n Test Test Test Test Test\n </a>\n'
        for k in (n, n + 1, n + 2)
    )
    return f"<html>\n<title>\n Text{n}\n</title> <body>\n{links}</body>\n</html>"


def test_term_counts_golden():
    # TestGather.scala:70-73 — body with 3 anchors x 5 "Test" => one term, 15
    assert term_counts(tools_xml(1)) == {"test": 15.0}


def test_term_counts_excludes_title():
    # title word "Text1" must not appear (body-only vectorization)
    assert "text1" not in term_counts(tools_xml(1))


def test_extract_links_same_host():
    out = extract_links(
        tools_xml(1), base="http://example.org/1", allowed_hosts={"example.org"}
    )
    assert set(out) == {
        "http://example.org/1",
        "http://example.org/2",
        "http://example.org/3",
    }


def test_extract_links_foreign_host_dropped():
    # TestGather.scala:249-295
    html = """<html><body>
        <a href="http://test.example.org"/>
        <a href="http://example.org/1"/>
    </body></html>"""
    out = extract_links(html, base="http://example.org/1", allowed_hosts={"example.org"})
    assert out == ["http://example.org/1"]


def test_extract_links_allhosts():
    html = '<html><body><a href="http://other.org/x">x</a></body></html>'
    assert extract_links(html, base="http://example.org/", allhosts=True) == [
        "http://other.org/x"
    ]


def test_extract_links_within_page_dedup():
    html = (
        '<html><body><a href="/a">1</a><a href="/a#frag">2</a>'
        '<a href="/a?q=2">3</a></body></html>'
    )
    out = extract_links(html, base="http://example.org/", allowed_hosts={"example.org"})
    assert out == ["http://example.org/a"]


def test_extract_text_title_underlined():
    txt = extract_text(tools_xml(1))
    lines = txt.split("\n")
    assert lines[0] == "Text1"
    assert lines[1] == "=" * len("Text1")
    assert "Test Test Test Test Test" in txt
    assert txt.endswith("\n")


def test_extract_text_mw_content_div_preferred():
    html = (
        "<html><title>T</title><body><p>outside</p>"
        '<div id="mw-content-text"><p>inside</p></div></body></html>'
    )
    txt = extract_text(html)
    assert "inside" in txt
    assert "outside" not in txt
    assert txt.startswith("T\n=\n")


def test_extract_text_whitespace_collapsed():
    html = "<html><body><p>a   b\n\t c</p></body></html>"
    assert extract_text(html) == "a b c\n"


def test_extract_text_deterministic():
    assert extract_text(tools_xml(2)) == extract_text(tools_xml(2))


# ---------------------------------------------------------------------------
# LinkContext (TestGather.scala:128-169, TestLinkContext.scala)
# ---------------------------------------------------------------------------


def _feats(v):
    return dict(v.items())


def test_link_context_simple():
    # anchors directly under body => {a:1, body:1}; html root contributes nothing
    ctx = link_context(tools_xml(1), base="http://example.org/1")
    assert set(ctx) == {
        "http://example.org/1",
        "http://example.org/2",
        "http://example.org/3",
    }
    for v in ctx.values():
        assert _feats(v) == {"a": 1.0, "body": 1.0}


def test_link_context_complicated_page():
    # TestGather.scala:128-169 "elicit a LinkContext from a complicate page"
    html = """<html><head><title>It's about a test</title></head><body>
        <h1><a href="http://example.org/1" shape="rect">Test of Gather Class</a></h1>
        <p><a href="http://example.org/2" shape="rect">Gather!</a></p>
    </body></html>"""
    ctx = link_context(html, base="http://example.org/1")
    assert _feats(ctx["http://example.org/1"]) == {"a": 1.0, "body": 1.0, "h1": 1.0}
    assert _feats(ctx["http://example.org/2"]) == {"a": 1.0, "body": 1.0, "p": 1.0}


def test_link_context_relative_links_excluded():
    # LinkContext.scala:94-96 quirk: raw href host must equal base host
    html = '<html><body><a href="/rel">r</a><a href="http://example.org/abs">a</a></body></html>'
    ctx = link_context(html, base="http://example.org/")
    assert set(ctx) == {"http://example.org/abs"}


def test_link_context_id_class_features_and_page_filter():
    html = (
        '<html><body><div id="nav" class="menu pagehdr top">'
        '<a href="http://example.org/x">x</a></div></body></html>'
    )
    ctx = link_context(html, base="http://example.org/")
    v = _feats(ctx["http://example.org/x"])
    assert v == {
        "body": 1.0,
        "div": 1.0,
        'id="nav"': 1.0,
        'class="menu"': 1.0,
        'class="top"': 1.0,
        "a": 1.0,
    }
    assert 'class="pagehdr"' not in v


def test_link_context_repeat_links_sum():
    html = (
        '<html><body><a href="http://example.org/x">1</a>'
        '<a href="http://example.org/x">2</a></body></html>'
    )
    ctx = link_context(html, base="http://example.org/")
    assert _feats(ctx["http://example.org/x"]) == {"a": 2.0, "body": 2.0}
