"""Crawl engine: driver-side estimator state, the sequential oracle, and
the distributed wave-loop crawler."""
