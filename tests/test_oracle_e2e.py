"""End-to-end sequential oracle crawl over the tiny synthetic site."""

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.plans.oracle import OracleCrawler
from webcrawler_spark.sources.synth import SiteSpec, gen_page, gen_pages, pages_as_site

SPEC = SiteSpec(n_pages=60, n_hosts=3, n_topics=3, seed=42, private_frac=0.0)


def make_crawler(cfg=None) -> OracleCrawler:
    pages = gen_pages(SPEC)
    site = pages_as_site(pages)
    seeds = [p["url"] for p in pages if p["_topic"] == 0][:2]
    cfg = cfg or CrawlConfig(
        seeds=tuple(seeds), limit=25, targets=3, targeting=0.001, allhosts=True
    )
    return OracleCrawler(cfg, fetch=site.get)


def test_generator_deterministic():
    a = gen_page(SPEC, 7)
    b = gen_page(SPEC, 7)
    assert a == b
    assert a["text"] == b["text"]
    assert isinstance(a["html"], bytes)


def test_oracle_crawl_runs_and_is_deterministic():
    t1 = make_crawler().run()
    t2 = make_crawler().run()
    assert t1.dispatched == t2.dispatched
    assert t1.accepted == t2.accepted
    assert t1.seen == t2.seen
    assert t1.frontier_final == t2.frontier_final
    # the crawl did real work
    assert len(t1.processed) >= 10
    assert len(t1.accepted) >= 3
    assert len(t1.seen) > len(t1.processed)
    # corpus texts are the frozen extraction
    for url, text in t1.corpus.items():
        assert text.endswith("\n")


def test_oracle_respects_limit():
    cfg = CrawlConfig(
        seeds=tuple(make_crawler().cfg.seeds), limit=12, targets=3,
        targeting=0.001, allhosts=True,
    )
    t = make_crawler(cfg).run()
    # ns counts processed pages; stop fires when ns exceeds limit in estimating
    assert len(t.processed) <= cfg.limit + 1


def test_no_repeat_dispatch_of_emitted_links():
    """URL-seen semantics: a link emitted once is never re-enqueued via the
    frontier (dispatches are unique except the documented initial-seed /
    self-link re-fetch quirk)."""
    t = make_crawler().run()
    non_seed = [u for u in t.dispatched]
    # each frontier URL dispatched at most twice (quirk bound), once in practice
    from collections import Counter

    counts = Counter(non_seed)
    assert max(counts.values()) <= 2
    repeats = [u for u, c in counts.items() if c > 1]
    # repeats can only be initial seeds re-linked later
    assert set(repeats) <= set(make_crawler().cfg.seeds)
