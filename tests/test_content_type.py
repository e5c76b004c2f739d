"""Content-type admission (WebGet.scala:46): only `text/html` responses
reach the parser; any other MIME behaves exactly like a failed fetch —
the URL is dispatched and counted, but yields no links, corpus, seen or
term effects. Budget=1 parity against the sequential oracle, whose fetch
returns None for non-HTML (the same WebGet drop)."""

from __future__ import annotations

import pytest

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.crawler import SparkCrawler
from webcrawler_spark.plans.oracle import OracleCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_pages

SPEC = SiteSpec(
    n_pages=40, n_hosts=2, n_topics=2, seed=42, private_frac=0.0,
    nonhtml_frac=0.35,
)


def _is_html(p):
    return p["content_type"].split(";")[0] == "text/html"


@pytest.fixture(scope="module")
def site(spark):
    pages = gen_pages(SPEC)
    seeds = [p["url"] for p in pages if p["_topic"] == 0 and _is_html(p)][:2]
    df = spark.createDataFrame(
        [(p["url"], p["html"], p["content_type"]) for p in pages],
        "url string, html binary, content_type string",
    ).cache()
    return pages, seeds, df


def test_nonhtml_matches_oracle_budget1(spark, site, tmp_path):
    pages, seeds, df = site
    by_url = {p["url"]: p for p in pages}
    cfg = CrawlConfig(
        seeds=tuple(seeds), limit=12, targets=3, targeting=0.001,
        allhosts=True, budget=1, respect_robots=False,
    )

    def fetch(url):
        p = by_url.get(url)
        if p is None or not _is_html(p):
            return None  # WebGet.scala:46 — non-HTML never reaches Gather
        return p["html"]

    oracle = OracleCrawler(cfg, fetch=fetch).run()
    engine = SparkCrawler(spark, cfg, df, str(tmp_path / "c"), checkpoint_every=50)
    res = engine.run()

    assert res.dispatched == oracle.dispatched
    assert res.accepted == oracle.accepted
    seen = {r["url"] for r in engine.tables["seen"].collect()}
    assert seen == oracle.seen

    # the scenario is real: at least one dispatched URL was non-HTML...
    nonhtml = [u for u in res.dispatched if u in by_url and not _is_html(by_url[u])]
    assert nonhtml, "no non-HTML page was dispatched — weak scenario"
    # ...and it left no corpus rows and no edges
    corpus_urls = {r["url"] for r in engine.tables["corpus"].collect()}
    assert not (set(nonhtml) & corpus_urls)
    page_ids = {
        r["url"]: r["seed_id"] for r in engine.tables["url_ids"].collect()
    }
    src_ids = {r["src"] for r in engine.tables["net_edges"].collect()}
    for u in nonhtml:
        if u in page_ids:
            assert page_ids[u] not in src_ids


def test_gen_pages_df_carries_content_type(spark):
    """The distributed generator (the bench's input path) must emit the
    same content_type column the driver-side gen_pages produces, so the
    engine's MIME admission is exercisable from the same source the
    bench uses (synth.py gen_pages_df)."""
    from webcrawler_spark.sources.synth import gen_pages_df

    pages = gen_pages(SPEC)
    got = {
        r["url"]: r["content_type"]
        for r in gen_pages_df(spark, SPEC).select("url", "content_type").collect()
    }
    assert got == {p["url"]: p["content_type"] for p in pages}
    assert any(not _is_html(p) for p in pages)


def test_distributed_generator_admission_budget1(spark, site, tmp_path):
    """Full budget=1 oracle parity with the engine fed straight from
    gen_pages_df (not a hand-built DataFrame): MIME admission drops the
    same URLs the oracle's fetch refuses."""
    from webcrawler_spark.sources.synth import gen_pages_df

    pages, seeds, _ = site
    by_url = {p["url"]: p for p in pages}
    cfg = CrawlConfig(
        seeds=tuple(seeds), limit=12, targets=3, targeting=0.001,
        allhosts=True, budget=1, respect_robots=False,
    )

    def fetch(url):
        p = by_url.get(url)
        if p is None or not _is_html(p):
            return None
        return p["html"]

    oracle = OracleCrawler(cfg, fetch=fetch).run()
    df = gen_pages_df(spark, SPEC).select("url", "html", "content_type")
    engine = SparkCrawler(spark, cfg, df, str(tmp_path / "g"), checkpoint_every=50)
    res = engine.run()

    assert res.dispatched == oracle.dispatched
    assert res.accepted == oracle.accepted
    seen = {r["url"] for r in engine.tables["seen"].collect()}
    assert seen == oracle.seen
