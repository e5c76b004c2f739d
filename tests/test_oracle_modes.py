"""Mode coverage at the oracle level (pure Python, no Spark):
F2 breadth-first, A4 sigma cluster policy, C4 targeting abort."""

from __future__ import annotations

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.oracle import OracleCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_pages, pages_as_site


def _site(**kw):
    spec = SiteSpec(n_pages=60, n_hosts=3, seed=11, private_frac=0.0, **kw)
    pages = gen_pages(spec)
    return pages, pages_as_site(pages)


def _run(cfg, site):
    return OracleCrawler(cfg, lambda u: site.get(u)).run()


def test_breadth_first_fifo_order():
    """F2 (NetworkEstimator.scala:43-48): queue ordered by SeedId only —
    dispatch after the initial wave follows first-seen id order, not
    priority order."""
    pages, site = _site()
    base = dict(seeds=(pages[0]["url"],), limit=14, targets=3, targeting=0.0,
                allhosts=True)
    t_prio = _run(CrawlConfig(**base), site)
    t_bfs = _run(CrawlConfig(**base, use_breadthsearch=True), site)
    assert t_prio.dispatched != t_bfs.dispatched  # ordering differs
    assert len(t_bfs.processed) == len(t_prio.processed)


def test_cluster_policy_sigma():
    """A4 (TargetVectorCluster.scala:28-66): the sigma criterion accepts
    only pages that shrink the cluster RMS distance — a different (usually
    smaller) accepted set than the top-k collinearity policy."""
    pages, site = _site()
    base = dict(seeds=(pages[0]["url"], pages[1]["url"]), limit=16, targets=3,
                targeting=0.0, allhosts=True)
    t_target = _run(CrawlConfig(**base, cluster_policy="target"), site)
    t_sigma = _run(CrawlConfig(**base, cluster_policy="cluster"), site)
    # both crawl; acceptance policies diverge on this site
    assert t_target.processed and t_sigma.processed
    assert t_target.accepted != t_sigma.accepted


def test_targeting_abort_on_drained_frontier():
    """C4 (EvaluatePriorityMatrix.scala:225-229): if the frontier drains
    before the targeting threshold is reached, the crawl aborts ('too
    little casualties')."""
    pages, site = _site()
    # unreachably high targeting threshold + tiny site slice: only allow
    # the seed page itself to be fetched (no other pages resolvable)
    seed = pages[0]["url"]
    tiny = {seed: site[seed]}
    cfg = CrawlConfig(seeds=(seed,), limit=50, targets=3, targeting=1e9,
                      allhosts=True)
    t = _run(cfg, tiny)
    assert t.aborted
