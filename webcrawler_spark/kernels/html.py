"""HTML kernels: lenient parse, text extraction, link extraction,
tokenization, link-context features.

Reference semantics (SURVEY.md §2.3):
- P1 parse: tagsoup lenient HTML->DOM (Gather.scala:73-77). Here: a small
  stack-based lenient parser over stdlib html.parser.
- P3 xml2seeds (Gather.scala:87-92): every <a href> under <body>, resolved
  + canonicalized, kept if allhosts or host in allowed set, de-duplicated
  within the page.
- P4 xml2intel (Gather.scala:98-112): render all <title> elements plus the
  <div id="mw-content-text"> if present else the <body>, as plain text.
  The reference's Html2Ascii lives in an unreachable external library; the
  rendering spec below is OURS, pinned once here and frozen by golden
  tests (SURVEY.md §7 hard-part 2). Observable anchors reproduced from
  sample/Html2ASCIIExample.sc:56-73: titles underlined with '=' rows,
  blocks separated by blank lines, whitespace runs collapsed.
- P5 xml2vector (Gather.scala:94-96): term counts over the rendered <body>
  text. Golden behavior (TestGather.scala:70-73): body containing 3 anchors
  x "Test Test Test Test Test" -> a single term with count 15.
- P6 LinkContext.extract (LinkContext.scala:69-112): recursive DOM walk
  accumulating (tag-name, id=, class= token) features from root to node;
  each *absolute same-host* <a href> receives the accumulated ancestor
  vector; repeated links merge by vector sum. Class tokens starting with
  "page" are dropped (LinkContext.scala:85); the raw (unresolved) href's
  host must equal the base host (LinkContext.scala:94-96 — relative links
  get no context; a reference quirk we preserve).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urlsplit

from webcrawler_spark.kernels.urls import canonicalize
from webcrawler_spark.kernels.vectors import SparseVector

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements that start a new output block in extract_text.
BLOCK_TAGS = frozenset(
    (
        "p div li ul ol table tr td th blockquote pre body html head article "
        "section header footer nav aside form figure figcaption dl dt dd a "
        "h1 h2 h3 h4 h5 h6 title br hr"
    ).split()
)
# Elements rendered as '='-underlined headings.
HEADING_TAGS = frozenset("title h1 h2 h3 h4 h5 h6".split())


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_rendered")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list = []  # Node or str (text)
        self.parent = parent
        #: render_text memo — the tree is immutable after parse, and the
        #: engine renders the same <body> for both text extraction and
        #: tokenization (one render, two consumers)
        self._rendered: str | None = None

    # -- queries ----------------------------------------------------------
    def iter_elements(self):
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_elements()

    def find_all(self, tag: str):
        return [n for n in self.iter_elements() if n.tag == tag]

    def find(self, tag: str):
        for n in self.iter_elements():
            if n.tag == tag:
                return n
        return None

    def text(self) -> str:
        out = []
        for c in self.children:
            if isinstance(c, Node):
                out.append(c.text())
            else:
                out.append(c)
        return "".join(out)

    def __repr__(self):
        return f"<{self.tag} {self.attrs}>"


# tagsoup-style implied end tags: opening key closes an open value at the top
_IMPLIED_END = {
    "p": {"p"},
    "li": {"li"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "tr": {"tr", "td", "th"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
    "option": {"option"},
}
# block containers also imply </p>
_CLOSES_P = frozenset(
    "p div ul ol table h1 h2 h3 h4 h5 h6 blockquote pre section article".split()
)


class _LenientParser(HTMLParser):
    """Stack-based lenient HTML -> Node tree (tagsoup-style recovery)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            # <body> implicitly closes <head> and anything left open in it
            while self.stack[-1].tag not in ("html", "#document"):
                self.stack.pop()
        closes = _IMPLIED_END.get(tag, ())
        while len(self.stack) > 1 and self.stack[-1].tag in closes:
            self.stack.pop()
        if tag in _CLOSES_P and self.stack[-1].tag == "p":
            self.stack.pop()
        node = Node(tag, attrs, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, attrs, self.stack[-1]))

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str | bytes) -> Node:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _LenientParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # lenient: keep whatever parsed
    return p.root


# ---------------------------------------------------------------------------
# P4: text extraction ("intel") — the byte-identical invariant surface
# ---------------------------------------------------------------------------

def _collapse(s: str) -> str:
    # C-speed equivalent of re.sub(r"\s+", " ", s).strip(): str.split()
    # splits on the same Unicode whitespace set as \s — measured ~4x
    # faster on the hot render path (the 100 TB determinant is this
    # kernel's per-page cost)
    return " ".join(s.split())


def _render_blocks(node: Node, blocks: list[list[str]], inline: list[str]):
    """Depth-first render: block tags flush the current inline run."""
    for c in node.children:
        if isinstance(c, str):
            inline.append(c)
            continue
        if c.tag in ("script", "style"):
            continue
        if c.tag in HEADING_TAGS:
            _flush(blocks, inline)
            t = _collapse(c.text())
            if t:
                blocks.append([t + "\n" + "=" * len(t)])
            continue
        if c.tag in BLOCK_TAGS:
            _flush(blocks, inline)
            _render_blocks(c, blocks, inline)
            _flush(blocks, inline)
        else:
            _render_blocks(c, blocks, inline)


def _flush(blocks: list[list[str]], inline: list[str]):
    if inline:
        t = _collapse("".join(inline))
        inline.clear()
        if t:
            blocks.append([t])


def render_text(node: Node) -> str:
    """Plain-text rendering of a subtree (the Html2Ascii 'rectify' spec):
    blocks separated by one blank line, whitespace collapsed, headings
    underlined with '='. No wrapping. Memoized per node (post-parse the
    tree is immutable; body is rendered by two consumers)."""
    if node._rendered is not None:
        return node._rendered
    blocks: list[list[str]] = []
    inline: list[str] = []
    _render_blocks(node, blocks, inline)
    _flush(blocks, inline)
    node._rendered = "\n\n".join(b[0] for b in blocks)
    return node._rendered


def extract_text(html: str | bytes) -> str:
    """xml2intel (Gather.scala:98-112): all <title>s, then the
    <div id="mw-content-text"> if present, else the <body>."""
    return extract_text_doc(parse_html(html))


def extract_text_doc(doc: Node) -> str:
    """extract_text over an already-parsed document — the engine's parse
    UDF parses each page ONCE and shares the tree across all four
    consumers (text, tokens, links, link-context), mirroring the
    reference's single page2xml parse (Gather.scala:151-182)."""
    parts = []
    for title in doc.find_all("title"):
        t = _collapse(title.text())
        if t:
            parts.append(t + "\n" + "=" * len(t))
    content = None
    for div in doc.find_all("div"):
        if div.attrs.get("id") == "mw-content-text":
            content = div
            break
    if content is None:
        content = doc.find("body") or doc
    body_text = render_text(content)
    if body_text:
        parts.append(body_text)
    return "\n\n".join(parts) + "\n"


# ---------------------------------------------------------------------------
# P5: tokenization / term counts
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"[a-z0-9][a-z0-9']*")


def page_tokens(html: str | bytes) -> list[str]:
    """Tokens of the rendered <body> text (body only — titles excluded,
    matching the golden TF vector of TestGather.scala:70-73). Lowercased
    ``[a-z0-9']`` words — our pinned tokenizer spec."""
    return page_tokens_doc(parse_html(html))


def page_tokens_doc(doc: Node) -> list[str]:
    body = doc.find("body")
    if body is None:
        return []
    return _TOKEN.findall(render_text(body).lower())


def term_counts(html: str | bytes) -> dict[str, float]:
    return term_counts_doc(parse_html(html))


def term_counts_doc(doc: Node) -> dict[str, float]:
    counts: dict[str, float] = {}
    for tok in page_tokens_doc(doc):
        counts[tok] = counts.get(tok, 0.0) + 1.0
    return counts


# ---------------------------------------------------------------------------
# P3: link extraction
# ---------------------------------------------------------------------------


def extract_links(
    html: str | bytes,
    base: str,
    allowed_hosts: frozenset[str] | set[str] = frozenset(),
    allhosts: bool = False,
) -> list[str]:
    """Canonical outlinks of the page (order: first occurrence; set
    semantics — duplicates collapse, D3).

    The allowed-host set must already include the page's own host
    (Gather.scala:153 adds the fetched page's host before filtering)."""
    return extract_links_doc(parse_html(html), base, allowed_hosts, allhosts)


def extract_links_doc(
    doc: Node,
    base: str,
    allowed_hosts: frozenset[str] | set[str] = frozenset(),
    allhosts: bool = False,
) -> list[str]:
    body = doc.find("body")
    if body is None:
        return []
    seen: dict[str, None] = {}
    for a in body.find_all("a"):
        href = a.attrs.get("href")
        if href is None:
            continue
        canon = canonicalize(href, base=base)
        if canon is None:
            continue
        host = urlsplit(canon).hostname
        if allhosts or host in allowed_hosts:
            seen.setdefault(canon, None)
    return list(seen)


# ---------------------------------------------------------------------------
# P6: link-context features
# ---------------------------------------------------------------------------

# Feature encoding (LinkContext.scala:31-47): name -> "tag",
# id -> 'id="v"', class -> 'class="v"'.


def link_context(html: str | bytes, base: str) -> dict[str, SparseVector]:
    """Map canonical link -> feature vector summed over its anchors.

    Walk starts at the document root's child elements (the <html> element
    itself contributes no feature — pinned by TestGather.scala:128-169
    where anchor vectors are {a, body} without 'html')."""
    return link_context_doc(parse_html(html), base)


def link_context_doc(doc: Node, base: str) -> dict[str, SparseVector]:
    roots = [c for c in doc.children if isinstance(c, Node)]
    base_host = urlsplit(base).hostname
    out: dict[str, SparseVector] = {}

    def walk(node: Node, v: SparseVector):
        for c in node.children:
            if not isinstance(c, Node):
                continue
            feats = [c.tag]
            if "id" in c.attrs and c.attrs["id"] is not None:
                feats.append(f'id="{c.attrs["id"]}"')
            cls = c.attrs.get("class")
            if cls:
                for tok in cls.split(" "):
                    if tok and not tok.startswith("page"):
                        feats.append(f'class="{tok}"')
            v1 = v + SparseVector([(f, 1.0) for f in feats])
            href = c.attrs.get("href")
            if href is not None:
                try:
                    href_host = urlsplit(href.replace("|", "%124")).hostname
                except ValueError:
                    href_host = None
                if href_host is not None and href_host == base_host:
                    canon = canonicalize(href, base=base)
                    if canon is not None:
                        prev = out.get(canon)
                        out[canon] = (prev + v1) if prev is not None else v1
            walk(c, v1)

    for r in roots:
        # the root element's own features are not accumulated
        walk(r, SparseVector())
    return out
