"""Structured Streaming surface: streaming seen-dedup, windowed host
metrics, and the foreachBatch frontier merge (cross-batch D1)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from webcrawler_spark.streaming import (
    LINK_EVENT_SCHEMA,
    host_window_counts,
    run_frontier_stream,
)


def _write_events(path: str, name: str, events: list[dict]):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _ev(minute: int, url: str, host: str, pr: float = 1.0, parent: str = "s"):
    return {
        "ts": f"2024-01-01 00:{minute:02d}:00",
        "url": url,
        "host": host,
        "priority": pr,
        "parent": parent,
    }


def test_frontier_stream_dedup_across_batches(spark, tmp_path):
    indir = str(tmp_path / "in")
    frontier = str(tmp_path / "frontier")
    ckpt = str(tmp_path / "ckpt")

    _write_events(
        indir,
        "b1.json",
        [
            _ev(1, "http://a.org/1", "a.org", 0.5),
            _ev(2, "http://a.org/2", "a.org", 0.7),
            _ev(2, "http://a.org/1", "a.org", 0.9),  # within-stream dup
        ],
    )
    links = (
        spark.readStream.schema(LINK_EVENT_SCHEMA).json(indir)
    )
    q = run_frontier_stream(spark, links, frontier, ckpt)
    q.awaitTermination(120)

    got = {r["url"] for r in spark.read.parquet(frontier).collect()}
    assert got == {"http://a.org/1", "http://a.org/2"}

    # second batch: one repeat (cross-batch dedup), one new
    _write_events(
        indir,
        "b2.json",
        [
            _ev(3, "http://a.org/1", "a.org", 1.5),
            _ev(3, "http://b.org/9", "b.org", 0.2),
        ],
    )
    links2 = spark.readStream.schema(LINK_EVENT_SCHEMA).json(indir)
    q2 = run_frontier_stream(spark, links2, frontier, ckpt)
    q2.awaitTermination(120)

    rows = spark.read.parquet(frontier).collect()
    assert len(rows) == 3  # the repeat did not re-enter
    assert {r["url"] for r in rows} == {
        "http://a.org/1",
        "http://a.org/2",
        "http://b.org/9",
    }


def test_host_window_counts(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_events(
        indir,
        "b1.json",
        [
            _ev(0, "http://a.org/1", "a.org", 0.5),
            _ev(0, "http://a.org/2", "a.org", 0.9),
            _ev(0, "http://b.org/1", "b.org", 0.1),
            _ev(5, "http://a.org/3", "a.org", 0.2),
            # watermark-advancing late marker
            _ev(30, "http://z.org/1", "z.org", 0.0),
        ],
    )
    links = spark.readStream.schema(LINK_EVENT_SCHEMA).json(indir)
    counts = host_window_counts(links, window="1 minute", watermark="10 minutes")
    q = (
        counts.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["host"], str(r["window_start"])): (r["n_links"], r["max_priority"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert rows[("a.org", "2024-01-01 00:00:00")] == (2, 0.9)
    assert rows[("b.org", "2024-01-01 00:00:00")] == (1, 0.1)
    assert rows[("a.org", "2024-01-01 00:05:00")] == (1, 0.2)


def test_host_budget_stream_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState per-host budget: batch 1 admits the top-2
    links of a.org by priority; batch 2 must admit NOTHING more for a.org
    (state persisted across micro-batches via the checkpoint) while b.org
    still gets its own budget."""
    from webcrawler_spark.streaming import host_budget_stream

    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_batch(events, name):
        _write_events(indir, name, events)
        links = spark.readStream.schema(LINK_EVENT_SCHEMA).json(indir)
        out = host_budget_stream(links, max_per_host=2)
        q = (
            out.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch(
        [
            _ev(1, "http://a.org/1", "a.org", 0.5),
            _ev(1, "http://a.org/2", "a.org", 0.9),
            _ev(1, "http://a.org/3", "a.org", 0.7),
        ],
        "b1.json",
    )
    got1 = {r["url"] for r in spark.read.parquet(outdir).collect()}
    assert got1 == {"http://a.org/2", "http://a.org/3"}  # top-2 by priority

    run_batch(
        [
            _ev(2, "http://a.org/4", "a.org", 9.9),  # over budget — dropped
            _ev(2, "http://b.org/1", "b.org", 0.1),
        ],
        "b2.json",
    )
    got2 = {r["url"] for r in spark.read.parquet(outdir).collect()}
    assert got2 == got1 | {"http://b.org/1"}
