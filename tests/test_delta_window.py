"""Intra-commit-window delete/delta ordering (ADVICE round 1, high).

The manifest's delete keys are applied by ``load_table`` to PRIOR commits
only; rows added and then delete-keyed INSIDE one commit window
(checkpoint_every > 1) must therefore be filtered out of the pended delta
at delete time. The live trigger: in the estimating phase every dispatch
delete-keys ``net_edges.dst`` for the batch, and many of those edges were
added by an earlier wave of the SAME window — pre-fix, the stale edges
survived in the durable state (observed 30 durable vs 14 in-memory rows
on this site), so a killed-and-resumed run diverged from an uninterrupted
one. Same mechanism protects page_terms re-fetch overwrites (recrawl
expiry path)."""

from __future__ import annotations

import os
import shutil

import pytest

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.crawler import SparkCrawler
from webcrawler_spark.sources.catalog import SnapshotCatalog
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


def _cfg(seeds):
    # budget=2 / limit=25 pushes the crawl well into the estimating phase
    # (frontier dispatch with eliminate-deletes), including seed re-dispatch
    return CrawlConfig(
        seeds=tuple(seeds),
        limit=25,
        targets=3,
        targeting=0.001,
        allhosts=True,
        budget=2,
        respect_robots=False,
    )


def _tables_state(src, wave=None):
    names = ("page_terms", "net_edges", "seen", "url_ids")
    if wave is None:
        return {n: sorted(map(tuple, src[n].collect())) for n in names}
    return {n: sorted(map(tuple, src.load_table(wave, n).collect())) for n in names}


def test_inwindow_delete_durable_equals_memory(spark, site_df, tmp_path):
    seeds, df = site_df
    root = str(tmp_path / "win")
    c = SparkCrawler(spark, _cfg(seeds), df, root, checkpoint_every=100)
    res = c.run()
    cat = SnapshotCatalog(spark, root)
    head = cat.latest()
    # the scenario is real: edges were added AND delete-keyed in one window
    ne_dels = head["tables"]["net_edges"]["deletes"]
    assert ne_dels and ne_dels[0]["values"], "expected in-window dst deletes"
    assert len(res.dispatched) > len(set(res.dispatched)), "expected seed re-dispatch"
    assert _tables_state(cat, head["wave"]) == _tables_state(c.tables)


def test_resume_midwindow_crash_replays_identically(spark, site_df, tmp_path):
    seeds, df = site_df
    cfg = _cfg(seeds)

    full = SparkCrawler(spark, cfg, df, str(tmp_path / "full"), checkpoint_every=100)
    rf = full.run()
    want = _tables_state(full.tables)

    # interrupted run with multi-wave windows: commits at waves 0,4,8,...
    root = str(tmp_path / "crash")
    c1 = SparkCrawler(spark, cfg, df, root, checkpoint_every=4)
    c1.run(max_waves=10)
    waves = sorted(d for d in os.listdir(root) if d.startswith("wave="))
    assert "wave=000008" in waves  # window [5..8] holds in-window deletes
    for d in waves:
        if d > "wave=000008":
            shutil.rmtree(os.path.join(root, d))

    c2 = SparkCrawler.resume(spark, cfg, df, root, checkpoint_every=4)
    r2 = c2.run()
    assert r2.dispatched == rf.dispatched
    assert r2.accepted == rf.accepted
    assert _tables_state(c2.tables) == want
