"""RFC 9309 robots.txt parser kernel + its distributed face, including
parity with the synthetic robots table the crawl e2e uses."""

from __future__ import annotations

from webcrawler_spark.kernels.robots import (
    RobotsRules,
    is_allowed,
    parse_robots,
    robots_df_from_text,
)

BASIC = """
# example file
User-agent: *
Disallow: /private
Crawl-delay: 0.1

User-agent: goodbot
Disallow: /tmp
Allow: /tmp/ok
"""


def test_wildcard_group():
    r = parse_robots(BASIC, agent="somebot")
    assert r.disallow_prefixes == ["/private"]
    assert r.crawl_delay_ms == 100


def test_specific_agent_overrides_wildcard():
    r = parse_robots(BASIC, agent="goodbot/2.1")
    assert r.disallow_prefixes == ["/tmp"]
    assert r.allow_prefixes == ["/tmp/ok"]
    assert r.crawl_delay_ms == 0


def test_shared_group_and_case_insensitivity():
    txt = "USER-AGENT: A\nuser-agent: B\nDISALLOW: /x\ncrawl-DELAY: 2\n"
    for agent in ("a", "b", "A-bot"):
        r = parse_robots(txt, agent)
        assert r.disallow_prefixes == ["/x"]
        assert r.crawl_delay_ms == 2000
    assert parse_robots(txt, "c").disallow_prefixes == []


def test_empty_disallow_means_allow_all():
    r = parse_robots("User-agent: *\nDisallow:\n")
    assert r.disallow_prefixes == []


def test_garbage_tolerated():
    txt = "\x00\x01 nonsense\nDisallow: /early-ignored\nUser-agent: *\nDisallow: /a\nNotAField whatever\nBadLine\n"
    r = parse_robots(txt.encode("utf-8"))
    assert r.disallow_prefixes == ["/a"]


def test_longest_match_allow_wins_ties():
    r = RobotsRules(disallow_prefixes=["/p"], allow_prefixes=["/p/ok"])
    assert not is_allowed(r, "/p/secret")
    assert is_allowed(r, "/p/ok/page")
    assert is_allowed(r, "/other")
    # tie length: allow wins
    r2 = RobotsRules(disallow_prefixes=["/ab"], allow_prefixes=["/ab"])
    assert is_allowed(r2, "/abc")


def test_render_parse_round_trip_property():
    """Any rule set rendered as robots.txt parses back identically."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    path = st.text(
        alphabet="abcdefghij/-_.~%", min_size=1, max_size=20
    ).map(lambda s: "/" + s.lstrip("/"))

    @settings(max_examples=100, deadline=None)
    @given(
        dis=st.lists(path, max_size=5),
        allow=st.lists(path, max_size=5),
        delay_ms=st.integers(0, 10_000_000),
    )
    def run(dis, allow, delay_ms):
        txt = "User-agent: *\n"
        txt += "".join(f"Disallow: {p}\n" for p in dis)
        txt += "".join(f"Allow: {p}\n" for p in allow)
        if delay_ms:
            txt += f"Crawl-delay: {delay_ms / 1000}\n"
        r = parse_robots(txt)
        assert r.disallow_prefixes == dis
        assert r.allow_prefixes == allow
        assert r.crawl_delay_ms == delay_ms

    run()


def test_distributed_parse_matches_synth_robots_table(spark):
    """Render the synth robots rules as real robots.txt text, parse it
    back distributed, and compare to the table the crawl e2e consumes."""
    from webcrawler_spark.sources.synth import SiteSpec, gen_robots

    spec = SiteSpec(n_pages=50, seed=11)
    expected = gen_robots(spec)
    texts = spark.createDataFrame(
        [
            (
                r["host"],
                "User-agent: *\n"
                + "".join(f"Disallow: {p}\n" for p in r["disallow_prefixes"])
                + (
                    f"Crawl-delay: {r['crawl_delay_ms'] / 1000}\n"
                    if r["crawl_delay_ms"]
                    else ""
                ),
            )
            for r in expected
        ],
        "host string, robots_txt string",
    )
    got = {
        r.host: (list(r.disallow_prefixes), r.crawl_delay_ms)
        for r in robots_df_from_text(texts).collect()
    }
    assert got == {
        r["host"]: (r["disallow_prefixes"], r["crawl_delay_ms"]) for r in expected
    }
