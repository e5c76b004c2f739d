"""Structured Streaming surface for continuous crawl operation.

The reference is a feedback-driven iterative process, not an event-time
stream (SURVEY.md §2.10) — the batch wave loop in plans/crawler.py is the
parity engine. This module is the *continuous-ingest* face of the same
design: when link discoveries arrive as a stream (e.g. from a fetch fleet
writing WARC-derived link events), the seen-dedup, politeness metrics and
frontier-merge steps run as one Structured Streaming job with
watermarked state instead of per-wave anti-joins.

- ``dedup_links_stream``: streaming URL-seen — ``dropDuplicates('url')``
  with a watermark bounds the dedup state exactly like the partitioned
  bloom+anti-join bounds the batch path (D1).
- ``host_window_counts``: tumbling event-time windows per host — the
  politeness/monitoring rollup (F5's metrics face), tolerant of late
  events up to the watermark.
- ``run_frontier_stream``: foreachBatch merge into the parquet frontier —
  each micro-batch is exactly the batch engine's admission step (seen
  anti-join against the persistent table, then append), giving end-to-end
  exactly-once via checkpointed offsets + idempotent dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINK_EVENT_SCHEMA = (
    "ts timestamp, url string, host string, priority double, parent string"
)


def dedup_links_stream(links: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming D1: first occurrence of each url wins; state bounded by
    the event-time watermark."""
    return links.withWatermark("ts", watermark).dropDuplicates(["url"])


def host_window_counts(
    links: DataFrame, window: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-host discovery rate over tumbling event-time windows (append
    mode capable — closed windows only)."""
    return (
        links.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_links"),
            F.max("priority").alias("max_priority"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_links",
            "max_priority",
        )
    )


#: output/state schemas for host_budget_stream (module-level so callers
#: and tests can assert against them)
BUDGET_OUT_SCHEMA = "url string, host string, priority double"
BUDGET_STATE_SCHEMA = "used long"


def host_budget_stream(links: DataFrame, max_per_host: int) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): a per-host crawl
    budget enforced ACROSS micro-batches — the streaming twin of the batch
    engine's ``per_host_budget`` (F5, EvaluatePriorityMatrix.scala:206-215
    politeness cap). Each host's group keeps one long of state (URLs
    admitted so far); a micro-batch admits its highest-priority links
    (priority desc, url asc — deterministic) until the host's lifetime
    budget is spent, then drops the rest forever. State is O(hosts), not
    O(links) — at a 10^10-URL frontier the state store holds one counter
    per host."""
    import pandas as pd

    def admit(key, pdfs, state):
        used = state.get[0] if state.exists else 0
        remaining = max(0, max_per_host - used)
        parts = [p for p in pdfs if len(p)]  # drop empties: concat of
        # all-NA frames is deprecated and the result dtype would drift
        if not parts:
            state.update((used,))
            return
        batch = pd.concat(parts)  # one host's slice of the micro-batch
        take = batch.sort_values(["priority", "url"], ascending=[False, True]).iloc[
            :remaining
        ]
        state.update((used + len(take),))
        yield take[["url", "host", "priority"]]

    return links.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=BUDGET_OUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_frontier_stream(
    spark: SparkSession,
    links: DataFrame,
    frontier_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """Continuous frontier ingestion: watermarked within-stream dedup,
    then per-micro-batch exact anti-join against the persistent frontier
    parquet (cross-batch D1) and append. Returns the StreamingQuery
    (caller triggers/awaits)."""
    import os

    deduped = dedup_links_stream(links, watermark)

    def merge(batch: DataFrame, batch_id: int):
        s = batch.sparkSession
        cols = ["url", "host", "priority", "parent"]
        b = batch.select(*cols).dropDuplicates(["url"])
        if os.path.exists(frontier_dir):
            existing = s.read.parquet(frontier_dir).select("url")
            b = b.join(existing, "url", "left_anti")
        b.write.mode("append").parquet(frontier_dir)

    return (
        deduped.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
