"""Robots.txt compliance (north-rule new surface): links under a
disallowed prefix never enter the frontier, so they are never dispatched;
with compliance off the same crawl does fetch them."""

from __future__ import annotations

import pytest

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.crawler import SparkCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_pages, gen_robots

SPEC = SiteSpec(n_pages=60, n_hosts=3, seed=17, private_frac=0.35)


@pytest.fixture(scope="module")
def fixtures(spark):
    pages = gen_pages(SPEC)
    pages_df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    ).cache()
    robots_df = spark.createDataFrame(
        [(r["host"], r["disallow_prefixes"], r["crawl_delay_ms"]) for r in gen_robots(SPEC)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms int",
    )
    seeds = [p["url"] for p in pages if "/private/" not in p["url"]][:2]
    return pages_df, robots_df, seeds


def _cfg(seeds, respect):
    return CrawlConfig(
        seeds=tuple(seeds), limit=12, targets=3, targeting=0.0,
        allhosts=True, budget=4, respect_robots=respect,
    )


def test_robots_blocks_disallowed_prefix(spark, fixtures, tmp_path):
    pages_df, robots_df, seeds = fixtures
    c = SparkCrawler(
        spark, _cfg(seeds, True), pages_df, str(tmp_path / "on"),
        robots=robots_df, checkpoint_every=1000,
    )
    res = c.run()
    assert res.processed > 0
    assert not any("/private/" in u for u in res.dispatched)
    frontier = [r["url"] for r in c.tables["frontier"].collect()]
    assert not any("/private/" in u for u in frontier)


def test_without_robots_private_reachable(spark, fixtures, tmp_path):
    pages_df, robots_df, seeds = fixtures
    c = SparkCrawler(
        spark, _cfg(seeds, False), pages_df, str(tmp_path / "off"),
        robots=robots_df, checkpoint_every=1000,
    )
    c.run()
    frontier = [r["url"] for r in c.tables["frontier"].collect()]
    assert any("/private/" in u for u in frontier)  # the filter was the only guard


def test_crawl_delay_caps_per_host_dispatch(spark, fixtures, tmp_path):
    """crawl_delay_ms translates to a per-host wave cap: with a 5000 ms
    delay and a 10000 ms wave period, at most 2 pages per host per wave."""
    pages_df, _, seeds = fixtures
    robots_slow = spark.createDataFrame(
        [(f"site{h}.example.org", [], 5000) for h in range(3)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms int",
    )
    cfg = CrawlConfig(
        seeds=tuple(seeds), limit=16, targets=3, targeting=0.0,
        allhosts=True, budget=12, respect_robots=True,
    )
    c = SparkCrawler(
        spark, cfg, pages_df, str(tmp_path / "delay"),
        robots=robots_slow, checkpoint_every=1000,
    )
    c.run()
    # after the run (fifo drained), an estimating-phase dispatch must
    # respect the cap for every host
    from collections import Counter

    from webcrawler_spark.kernels.urls import url_host

    batch = c._dispatch()
    counts = Counter(url_host(u) for _, u in batch)
    assert all(n <= 2 for n in counts.values()), counts
