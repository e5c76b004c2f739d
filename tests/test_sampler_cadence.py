"""S9 in-loop sampler cadence (SampleHierarchy2Priority.scala:58-60): the
crawl loop itself emits sample.NNNN dumps every `sample_every` link
priority updates — round 1 only had the batch sampler job."""

from __future__ import annotations

import os

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.crawler import SparkCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_pages

SPEC = SiteSpec(n_pages=40, n_hosts=2, n_topics=2, seed=42, private_frac=0.0)


def test_crawl_emits_sample_dumps(spark, tmp_path):
    pages = gen_pages(SPEC)
    seeds = [p["url"] for p in pages if p["_topic"] == 0][:2]
    df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    )
    cfg = CrawlConfig(
        seeds=tuple(seeds), limit=20, targets=3, targeting=0.001,
        allhosts=True, budget=2, respect_robots=False, sample_every=25,
    )
    root = str(tmp_path / "c")
    c = SparkCrawler(spark, cfg, df, root, checkpoint_every=100)
    c.run()
    assert c._sampler_nseed > 25, "site produced too few priority updates"
    dumps = sorted(os.listdir(os.path.join(root, "samples")))
    assert dumps and dumps[0] == "sample.0001"
    assert len(dumps) == c._sampler_dumps

    # dump format: '  prio : c c c...' rows ascending by priority, then a
    # column-count line per row, legend last — and every legend feature
    # passed the count>10 filter
    body = open(os.path.join(root, "samples", dumps[-1])).read().splitlines()
    legend = body[-1].split()
    assert legend, "empty legend"
    prios = [float(line.split(" : ")[0]) for line in body[:-1:2]]
    assert prios == sorted(prios)
    from pyspark.sql import functions as F

    counts = {
        r["feature"]: r["n"]
        for r in c.tables["linkctx"]
        .groupBy("feature")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for feat in legend:
        assert counts[feat] > 10
