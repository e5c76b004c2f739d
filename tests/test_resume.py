"""Kill-and-resume invariant (north rule; SURVEY.md §7 step 7): a crawl
interrupted at any committed wave and resumed from its snapshot produces
exactly the same dispatch order, accepted set and seen set as an
uninterrupted run — including when waves committed after the resume point
are lost (a crash between commits replays the tail identically)."""

from __future__ import annotations

import os
import shutil

import pytest

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.crawler import SparkCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_pages

SPEC = SiteSpec(n_pages=50, n_hosts=3, seed=13, private_frac=0.0)


@pytest.fixture(scope="module")
def site_df(spark):
    pages = gen_pages(SPEC)
    df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    ).cache()
    return pages, df


def cfg_for(pages):
    return CrawlConfig(
        seeds=(pages[0]["url"], pages[1]["url"]),
        limit=12,
        targets=3,
        targeting=0.0,
        allhosts=True,
        budget=4,
        respect_robots=False,
    )


def final_state(spark, crawler, res):
    seen = sorted(r["url"] for r in crawler.tables["seen"].collect())
    return (res.dispatched, res.accepted, res.processed, seen)


def test_kill_and_resume_replays_identically(spark, site_df, tmp_path):
    pages, df = site_df
    cfg = cfg_for(pages)

    # reference: uninterrupted run
    c_full = SparkCrawler(spark, cfg, df, str(tmp_path / "full"), checkpoint_every=100)
    want = final_state(spark, c_full, c_full.run())

    # interrupted run: commit every wave, stop after 3 waves
    root = str(tmp_path / "interrupted")
    c1 = SparkCrawler(spark, cfg, df, root, checkpoint_every=1)
    c1.run(max_waves=3)
    committed = sorted(
        d for d in os.listdir(root) if d.startswith("wave=")
    )
    assert len(committed) >= 3

    # simulate a crash that lost everything after wave 1's commit
    for d in committed[2:]:
        shutil.rmtree(os.path.join(root, d))

    # resume from the surviving snapshot and run to completion
    c2 = SparkCrawler.resume(spark, cfg, df, root, checkpoint_every=1)
    assert c2.wave == 2  # resumed after wave 1
    got = final_state(spark, c2, c2.run())

    assert got == want


def test_resume_noop_when_finished(spark, site_df, tmp_path):
    """Resuming a completed crawl dispatches nothing further."""
    pages, df = site_df
    cfg = cfg_for(pages)
    root = str(tmp_path / "done")
    c1 = SparkCrawler(spark, cfg, df, root, checkpoint_every=1)
    r1 = c1.run()
    c2 = SparkCrawler.resume(spark, cfg, df, root, checkpoint_every=1)
    r2 = c2.run()
    assert r2.processed == r1.processed
    assert r2.dispatched == r1.dispatched  # restored, nothing appended


def test_pipeline_inflight_batch_survives_crash(spark, site_df, tmp_path):
    """pipeline_waves dispatches wave N+1 BEFORE wave N's commit, so the
    committed frontier/FIFO no longer contain that batch. The commit must
    carry it (state['inflight']) and resume must re-enqueue it — pre-fix,
    a crash after the commit silently never crawled those URLs."""
    import json

    from dataclasses import replace

    pages, df = site_df
    cfg = replace(cfg_for(pages), pipeline_waves=True)

    full = SparkCrawler(spark, cfg, df, str(tmp_path / "pfull"), checkpoint_every=1)
    want = final_state(spark, full, full.run())

    root = str(tmp_path / "pcrash")
    c1 = SparkCrawler(spark, cfg, df, root, checkpoint_every=1)
    c1.run(max_waves=3)
    committed = sorted(d for d in os.listdir(root) if d.startswith("wave="))
    # the scenario is real: wave 1's manifest carries a non-empty in-flight
    # batch (dispatched for wave 2, not yet processed)
    with open(os.path.join(root, committed[1], "manifest.json")) as f:
        m1 = json.load(f)
    assert m1["state"]["inflight"], "expected an in-flight batch in the commit"
    for d in committed[2:]:
        shutil.rmtree(os.path.join(root, d))

    c2 = SparkCrawler.resume(spark, cfg, df, root, checkpoint_every=1)
    assert [u for _, u in c2._inflight] == [u for _, u in m1["state"]["inflight"]]
    got = final_state(spark, c2, c2.run())
    assert got == want


def test_compact_and_prune_preserve_state(spark, site_df, tmp_path):
    """catalog.compact rewrites the head wave as full commits (resetting
    delta chains); prune can then drop history; resume still reconstructs
    the identical state."""
    from webcrawler_spark.sources.catalog import SnapshotCatalog

    pages, df = site_df
    cfg = cfg_for(pages)
    root = str(tmp_path / "compact")
    c1 = SparkCrawler(spark, cfg, df, root, checkpoint_every=1)
    r1 = c1.run()
    cat = SnapshotCatalog(spark, root)
    head = cat.latest()["wave"]
    before = sorted(x["url"] for x in cat.load_table(head, "seen").collect())

    cat.compact()
    cat.prune(keep_last=1)
    assert len(cat._manifests()) == 1  # history gone
    after = sorted(x["url"] for x in cat.load_table(head, "seen").collect())
    assert after == before

    c2 = SparkCrawler.resume(spark, cfg, df, root, checkpoint_every=1)
    r2 = c2.run()
    assert r2.dispatched == r1.dispatched
    assert sorted(x["url"] for x in c2.tables["seen"].collect()) == before
