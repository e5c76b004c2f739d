"""WARC container source: byte-exact round trip page table -> segments ->
page table (plain and per-record-gzip), tolerant parsing of corrupt and
foreign records, and hypothesis property coverage of the record walker."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawler_spark.sources.synth import SiteSpec, gen_pages_df
from webcrawler_spark.sources.warc import (
    pages_to_warc_df,
    parse_warc,
    read_warc_df,
    write_record,
    write_warc,
)

TS = datetime(2024, 5, 1, 12, 30, 0, tzinfo=timezone.utc)


def test_single_record_round_trip():
    rec = write_warc([("http://a.com/x", TS, b"<html>hi</html>")])
    rows = parse_warc(rec)
    assert rows == [("http://a.com/x", TS, b"<html>hi</html>")]


def test_gzip_members_round_trip():
    rows_in = [
        ("http://a.com/1", TS, b"one"),
        ("http://b.com/2", TS, b"two\r\n\r\nwith crlf inside"),
    ]
    blob = write_warc(rows_in, per_record_gzip=True)
    assert blob[:2] == b"\x1f\x8b"
    assert parse_warc(blob) == rows_in


def test_non_response_records_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    rec = info + write_record("http://a.com/x", TS, b"payload")
    assert parse_warc(rec) == [("http://a.com/x", TS, b"payload")]


def test_truncated_tail_dropped():
    good = write_record("http://a.com/x", TS, b"payload")
    bad = write_record("http://a.com/y", TS, b"longer payload")[:-10]
    assert parse_warc(good + bad) == [("http://a.com/x", TS, b"payload")]


def test_header_case_and_order_insensitive():
    rec = (
        b"WARC/1.0\r\n"
        b"content-length: 4\r\n"
        b"warc-target-uri: http://c.com/z\r\n"
        b"WARC-DATE: 2024-05-01T12:30:00Z\r\n"
        b"Warc-Type: response\r\n"
        b"X-Unknown: whatever\r\n"
        b"\r\nbody\r\n\r\n"
    )
    assert parse_warc(rec) == [("http://c.com/z", TS, b"body")]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.binary(max_size=200),
        ),
        max_size=8,
    ),
    st.booleans(),
)
def test_round_trip_property(items, gz):
    rows = [
        (f"http://h{i}.com/p{i}", datetime.fromtimestamp(t, tz=timezone.utc), b)
        for i, (t, b) in enumerate(items)
    ]
    assert parse_warc(write_warc(rows, per_record_gzip=gz)) == rows


@pytest.mark.parametrize("gz", [False, True])
def test_distributed_round_trip(spark, gz):
    """pages -> N warc segments (applyInPandas) -> pages (mapInPandas):
    url/ts/html byte-identical, html included."""
    pages = gen_pages_df(spark, SiteSpec(n_pages=200, seed=7)).select(
        "url", "warc_ts", "html"
    )
    segs = pages_to_warc_df(pages, n_segments=5, per_record_gzip=gz)
    seg_rows = segs.collect()
    assert {r.segment for r in seg_rows} <= set(range(5))
    assert sum(r.n_records for r in seg_rows) == 200

    back = read_warc_df(segs.select("blob"))
    orig = {
        r.url: (r.warc_ts, bytes(r.html)) for r in pages.collect()
    }
    got = {r.url: (r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert got == orig


def test_crawl_from_warc_segments_matches_parquet_pages(spark, tmp_path):
    """The engine consumes a WARC-sourced page table identically to the
    canonical parquet shape: same dispatch order and accepted set under
    the same seeds and budget — the Common-Crawl ingestion path e2e."""
    from webcrawler_spark.config import CrawlConfig
    from webcrawler_spark.plans.crawler import SparkCrawler
    from webcrawler_spark.sources.synth import SiteSpec, gen_pages

    spec = SiteSpec(n_pages=40, n_hosts=2, n_topics=2, seed=42, private_frac=0.0)
    pages = gen_pages(spec)
    seeds = [p["url"] for p in pages if p["_topic"] == 0][:2]
    cfg = CrawlConfig(
        seeds=tuple(seeds), limit=8, targets=3, targeting=0.001,
        allhosts=True, budget=4, respect_robots=False,
    )

    plain = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    ).cache()
    a = SparkCrawler(spark, cfg, plain, str(tmp_path / "a"), checkpoint_every=50).run()

    full = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"]) for p in pages],
        "url string, warc_ts timestamp, html binary",
    )
    segs = pages_to_warc_df(full, n_segments=3, per_record_gzip=True)
    from_warc = read_warc_df(segs.select("blob")).select("url", "html").cache()
    assert from_warc.count() == len(pages)
    b = SparkCrawler(
        spark, cfg, from_warc, str(tmp_path / "b"), checkpoint_every=50
    ).run()

    assert a.dispatched == b.dispatched
    assert a.accepted == b.accepted


def test_read_warc_df_no_shuffle(spark):
    import contextlib
    import io as _io

    pages = gen_pages_df(spark, SiteSpec(n_pages=50, seed=3)).select(
        "url", "warc_ts", "html"
    )
    segs = pages_to_warc_df(pages, n_segments=2).select("blob")
    segs = spark.createDataFrame(segs.collect(), "blob binary")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        read_warc_df(segs).explain("formatted")
    assert "Exchange" not in buf.getvalue()
