"""Deterministic synthetic Common-Crawl-style web (FIXTURES.md §1).

Generates a ``pages`` table with exactly the BASELINE.json input_hint shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus a ``robots`` table. Per-page RNG is derived from (seed, page index) so
generation is order-independent (parallelizable) and stable across runs.

Topical structure reproduces the focused-crawl scenario of the reference's
README (topic-0 pages mutually similar and interlinked; distractor hubs
linking everywhere), so a crawl seeded on topic-0 pages has a meaningful
"target cluster" to lock onto.
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from webcrawler_spark.kernels.html import extract_text

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_SHARED = [f"common{j}" for j in range(40)]
_STOP = ["the", "of", "and", "to", "in", "is", "that", "for", "with", "as"]


def page_url(host_i: int, page_i: int, private: bool = False) -> str:
    prefix = "private" if private else "page"
    return f"http://site{host_i}.example.org/{prefix}/{page_i}"


@dataclass(frozen=True)
class SiteSpec:
    n_pages: int = 2000
    n_hosts: int = 8
    n_topics: int = 5
    seed: int = 42
    #: fraction of pages on host 0 — the deliberately hot domain (skew)
    hot_host_frac: float = 0.4
    #: every k-th page is a hub linking widely (distractor)
    hub_every: int = 97
    #: fraction of pages under a robots-disallowed /private prefix
    private_frac: float = 0.05
    lang_xx_frac: float = 0.05
    #: fraction of pages served with a non-HTML Content-Type (pdf/zip/…) —
    #: the MIME admission case (WebGet.scala:46). Own RNG stream so 0.0
    #: keeps every existing page byte-identical.
    nonhtml_frac: float = 0.0
    #: extra body paragraphs appended per page (0 = classic output; >0
    #: approximates real Common-Crawl page weight for compute-bound
    #: benchmarking). Uses its own RNG stream so pages with heavy=0 are
    #: byte-identical to the original generator.
    heavy_paras: int = 0


def _topic_words(t: int) -> list[str]:
    return [f"topic{t}word{j}" for j in range(60)]


def page_meta(spec: SiteSpec, i: int) -> dict:
    """Pure function of (spec, i): host, topic, hub/private flags."""
    rng = random.Random(spec.seed * 1_000_003 + i)
    host = 0 if rng.random() < spec.hot_host_frac else 1 + (i % (spec.n_hosts - 1))
    # topic 0 is the target topic: ~30% of pages
    topic = 0 if rng.random() < 0.30 else 1 + (i % (spec.n_topics - 1))
    hub = spec.hub_every > 0 and i % spec.hub_every == 0 and i > 0
    private = rng.random() < spec.private_frac and i > 10
    return {"host": host, "topic": topic, "hub": hub, "private": private}


def gen_page(spec: SiteSpec, i: int) -> dict:
    """One page row: url, warc_ts, html (bytes), text (frozen extraction),
    lang — plus generation metadata (topic, outlink targets) for tests."""
    rng = random.Random(spec.seed * 7_368_787 + i * 31 + 1)
    meta = page_meta(spec, i)
    host, topic, hub = meta["host"], meta["topic"], meta["hub"]
    url = page_url(host, i, meta["private"])

    words = _topic_words(topic) + _SHARED + _STOP
    title = f"Page {i} about topic{topic}word0 {rng.choice(words)}"

    # outlink targets: mostly same-topic, some random; hubs link widely
    n_links = rng.randint(40, 60) if hub else rng.randint(4, 12)
    targets = []
    for _ in range(n_links):
        if not hub and rng.random() < 0.7:
            # same-topic target: probe candidate indices deterministically
            for _probe in range(8):
                j = rng.randrange(spec.n_pages)
                if page_meta(spec, j)["topic"] == topic:
                    break
        else:
            j = rng.randrange(spec.n_pages)
        targets.append(j)

    anchors = []
    for k, j in enumerate(targets):
        tm = page_meta(spec, j)
        target = page_url(tm["host"], j, tm["private"])
        # exercise normalization: relative / query / fragment / dot-segment
        style = rng.randrange(6)
        if tm["host"] == host and style == 0:
            href = f"/{'private' if tm['private'] else 'page'}/{j}"
        elif tm["host"] == host and style == 1:
            href = f"../{'private' if tm['private'] else 'page'}/./{j}"
        elif style == 2:
            href = target + "?utm_source=synth"
        elif style == 3:
            href = target + "#section"
        else:
            href = target
        text = " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        cls = rng.choice(["nav-item", "pagelink", "ref external", "topiclink"])
        anchors.append(f'<a href="{href}" class="{cls}">{text}</a>')

    paras = []
    for _ in range(rng.randint(3, 6)):
        n = rng.randint(25, 55)
        para = " ".join(rng.choice(words) for _ in range(n))
        paras.append(f"<p>{para}</p>")
    if spec.heavy_paras > 0:
        hrng = random.Random(spec.seed * 104_729 + i * 17 + 7)
        for _ in range(spec.heavy_paras):
            n = hrng.randint(40, 80)
            para = " ".join(hrng.choice(words) for _ in range(n))
            paras.append(f"<p>{para}</p>")

    nav = f'<div id="nav" class="menu"><ul>{"".join(f"<li>{a}" for a in anchors[: len(anchors) // 2])}</ul></div>'
    body_links = " ".join(anchors[len(anchors) // 2 :])
    content = "".join(paras) + f"<p>{body_links}</p>"
    if rng.random() < 0.3:
        content = f'<div id="mw-content-text">{content}</div><div id="footer"><p>footer boilerplate common0</p></div>'

    html = (
        f"<html><head><title>{title}</title></head>"
        f'<body class="site topic{topic}">{nav}{content}</body></html>'
    ).encode("utf-8")

    lang = "xx" if rng.random() < spec.lang_xx_frac else "en"
    ts = EPOCH + timedelta(seconds=zlib.crc32(url.encode()) % 10_000_000)
    # separate RNG stream: nonhtml_frac=0.0 leaves all other draws intact
    crng = random.Random(spec.seed * 9_176_777 + i * 13 + 3)
    if spec.nonhtml_frac > 0 and crng.random() < spec.nonhtml_frac and i > 4:
        content_type = crng.choice(
            ["application/pdf", "image/png", "text/plain; charset=utf-8"]
        )
    else:
        content_type = "text/html; charset=utf-8" if crng.random() < 0.5 else "text/html"
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": extract_text(html),
        "lang": lang,
        "content_type": content_type,
        "_topic": topic,
        "_targets": targets,
        "_host": host,
    }


def gen_pages(spec: SiteSpec) -> list[dict]:
    return [gen_page(spec, i) for i in range(spec.n_pages)]


def gen_robots(spec: SiteSpec) -> list[dict]:
    """Robots surface: every host disallows /private; crawl delay varies by
    host (hot host gets a tighter budget)."""
    rows = []
    for h in range(spec.n_hosts):
        rows.append(
            {
                "host": f"site{h}.example.org",
                "disallow_prefixes": ["/private"],
                "crawl_delay_ms": 100 if h == 0 else 0,
            }
        )
    return rows


def gen_pages_df(spark, spec: SiteSpec, include_meta: bool = False):
    """Distributed page generation: gen_page is a pure function of
    (spec, i), so the synthetic web materializes as a mapInPandas over a
    range — exactly how a 10^10-row bench input would be produced on a
    cluster (no driver-side list, no collect)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: N812

    n = spec.n_pages
    base = spark.range(0, n).repartition(max(spark.sparkContext.defaultParallelism, 8))

    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
        ", content_type string"
    )
    if include_meta:
        schema += ", _topic int, _host int"

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                p = gen_page(spec, int(i))
                row = [
                    p["url"], p["warc_ts"], p["html"], p["text"], p["lang"],
                    p["content_type"],
                ]
                if include_meta:
                    row += [p["_topic"], p["_host"]]
                rows.append(row)
            cols = ["url", "warc_ts", "html", "text", "lang", "content_type"]
            if include_meta:
                cols += ["_topic", "_host"]
            yield pd.DataFrame(rows, columns=cols)

    return base.mapInPandas(gen, schema)


def pages_as_site(pages: list[dict]) -> dict[str, bytes]:
    """url -> html map for the oracle's fetch function."""
    return {p["url"]: p["html"] for p in pages}


def write_parquet(pages: list[dict], out_dir: str, robots: list[dict] | None = None):
    """Write pages (and robots) as parquet via pyarrow — no Spark needed."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    cols = {
        "url": pa.array([p["url"] for p in pages], pa.string()),
        "warc_ts": pa.array([p["warc_ts"] for p in pages], pa.timestamp("us", tz="UTC")),
        "html": pa.array([p["html"] for p in pages], pa.binary()),
        "text": pa.array([p["text"] for p in pages], pa.string()),
        "lang": pa.array([p["lang"] for p in pages], pa.string()),
    }
    pq.write_table(pa.table(cols), os.path.join(out_dir, "pages.parquet"))
    if robots is not None:
        tbl = pa.table(
            {
                "host": pa.array([r["host"] for r in robots], pa.string()),
                "disallow_prefixes": pa.array(
                    [r["disallow_prefixes"] for r in robots], pa.list_(pa.string())
                ),
                "crawl_delay_ms": pa.array(
                    [r["crawl_delay_ms"] for r in robots], pa.int32()
                ),
            }
        )
        pq.write_table(tbl, os.path.join(out_dir, "robots.parquet"))
