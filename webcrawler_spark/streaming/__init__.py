from webcrawler_spark.streaming.waves import (  # noqa: F401
    LINK_EVENT_SCHEMA,
    dedup_links_stream,
    host_budget_stream,
    host_window_counts,
    run_frontier_stream,
)
