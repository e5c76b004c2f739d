"""Bounded wave fold (fold_mode="bounded", VERDICT round 1 item 3): the
10^10-scale path must (a) reproduce the exact fold's crawl on the synth
site, and (b) actually bound what reaches the driver — full term vectors
only for the candidate set, never the whole wave."""

from __future__ import annotations

import tempfile
from dataclasses import replace

import pytest

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.crawler import SparkCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_pages

SPEC = SiteSpec(n_pages=40, n_hosts=2, n_topics=2, seed=42, private_frac=0.0)


@pytest.fixture(scope="module")
def site_df(spark):
    pages = gen_pages(SPEC)
    seeds = [p["url"] for p in pages if p["_topic"] == 0][:2]
    df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    ).cache()
    return seeds, df


def _base(seeds):
    return CrawlConfig(
        seeds=tuple(seeds),
        limit=25,
        targets=3,
        targeting=0.001,
        allhosts=True,
        budget=2,
        respect_robots=False,
    )


def _run(spark, cfg, df):
    with tempfile.TemporaryDirectory() as td:
        c = SparkCrawler(spark, cfg, df, td, checkpoint_every=100)
        r = c.run()
        seen = sorted(x["url"] for x in c.tables["seen"].collect())
        return c, (r.dispatched, r.accepted, r.processed, seen)


def test_bounded_matches_exact_on_synth_site(spark, site_df):
    seeds, df = site_df
    _, exact = _run(spark, replace(_base(seeds), fold_mode="exact"), df)
    _, bounded = _run(spark, replace(_base(seeds), fold_mode="bounded"), df)
    assert bounded == exact


def test_bounded_driver_transfer_is_bounded(spark, site_df):
    seeds, df = site_df
    cfg = replace(_base(seeds), fold_mode="bounded")
    with tempfile.TemporaryDirectory() as td:
        c = SparkCrawler(spark, cfg, df, td, checkpoint_every=100)
        orig = c._fold_summaries
        waves = []

        def spy(parsed, dr_lt=None):
            rows = orig(parsed, dr_lt)
            waves.append(rows)
            return rows

        c._fold_summaries = spy
        c.run()
    assert waves, "bounded fold never ran"
    per_partition_cap = (cfg.targets + 1) * (cfg.fold_margin + 1)
    nparts = df.rdd.getNumPartitions()
    for rows in waves:
        # VERDICT r2 item 3: the summary pass ships per-page scalars and
        # candidate vectors only — never word-sum rows (the running
        # average lives in the distributed avg_sum table)
        assert all(r["kind"] == 0 for r in rows)
        with_terms = [r for r in rows if r["terms"] is not None]
        assert len(with_terms) <= per_partition_cap * nparts


def test_bounded_kill_and_resume_replays(spark, site_df, tmp_path):
    """The distributed running average rides the delta-commit chain: a
    bounded crawl killed mid-run and resumed (avg_sum re-aggregated from
    its committed wave deltas, scalars recomputed) finishes with the same
    dispatch order, accepted set and seen set as an uninterrupted run."""
    import os

    from webcrawler_spark.plans.crawler import SparkCrawler as SC

    seeds, df = site_df
    cfg = replace(_base(seeds), fold_mode="bounded")

    full_root = str(tmp_path / "full")
    c_full = SC(spark, cfg, df, full_root, checkpoint_every=1)
    r_full = c_full.run()
    want = (
        r_full.dispatched,
        r_full.accepted,
        r_full.processed,
        sorted(x["url"] for x in c_full.tables["seen"].collect()),
    )

    root = str(tmp_path / "interrupted")
    c1 = SC(spark, cfg, df, root, checkpoint_every=1)
    c1.run(max_waves=3)
    assert any(d.startswith("wave=") for d in os.listdir(root))

    c2 = SC.resume(spark, cfg, df, root, checkpoint_every=1)
    r2 = c2.run()
    got = (
        c2.result.dispatched,
        c2.result.accepted,
        c2.result.processed,
        sorted(x["url"] for x in c2.tables["seen"].collect()),
    )
    assert got == want
