"""C3: in-loop periodic graph snapshot (EvaluatePriorityMatrix.scala:
291-293 dumps the estimator to GML every 500 processed pages). The wave
engine dumps at the first wave boundary after ``ns`` crosses each
``cfg.dump_every`` multiple — at budget=1 (one page per wave) that is
exactly the reference's per-page cadence, so the dumped graph at each
mark must contain precisely the oracle's first-ns fetched pages."""

from __future__ import annotations

import os
import re

import pytest

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.kernels.urls import seed_to_filename
from webcrawler_spark.plans.crawler import SparkCrawler
from webcrawler_spark.plans.oracle import OracleCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_pages, pages_as_site

SPEC = SiteSpec(n_pages=40, n_hosts=2, seed=11, private_frac=0.0)


@pytest.fixture(scope="module")
def site_df(spark):
    pages = gen_pages(SPEC)
    df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    ).cache()
    return pages, df


def test_dump_cadence_matches_oracle_page_counts(spark, site_df, tmp_path):
    pages, df = site_df
    cfg = CrawlConfig(
        seeds=(pages[0]["url"],),
        limit=10,
        targets=3,
        targeting=0.001,
        allhosts=True,
        budget=1,
        respect_robots=False,
        dump_every=3,
        with_incomplete=True,  # every fetched node appears in the dump
    )
    oracle = OracleCrawler(cfg, fetch=pages_as_site(pages).get).run()

    root = str(tmp_path / "crawl")
    c = SparkCrawler(spark, cfg, df, root, checkpoint_every=100)
    dumps = []
    orig = c.export_snapshot

    def spy(outdir):
        orig(outdir)
        with open(os.path.join(outdir, "network.gml")) as f:
            dumps.append((c.ns, f.read()))

    c.export_snapshot = spy
    res = c.run()
    assert res.dispatched == oracle.dispatched  # sanity: oracle parity

    # cadence: one dump per crossed dump_every multiple, at exactly that ns
    assert [ns for ns, _ in dumps] == [3, 6, 9]

    # each dump's node set is the oracle's first-ns fetched pages
    for ns, gml in dumps:
        labels = set(re.findall(r'label "([^"]+)"', gml))
        want = {seed_to_filename(u) for u in oracle.dispatched[:ns]}
        assert labels == want, f"dump at ns={ns}"

    # a statistic.NNNNNNNN.txt lands per dump, named by graph size
    stat_files = sorted(os.listdir(os.path.join(root, "export")))
    stats = [f for f in stat_files if f.startswith("statistic.")]
    assert len(stats) == 3
    sizes = [int(f.split(".")[1]) for f in stats]
    assert sizes == sorted(sizes) and sizes[-1] <= 10
