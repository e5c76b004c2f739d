"""webcrawler_spark — a PySpark-native focused-crawler analytics engine.

A from-scratch reimplementation of the capabilities of
electricmind/webcrawler (a single-JVM Akka focused crawler) as an
idiomatic Spark engine:

- the simulated web is an immutable ``pages`` table
  ``(url, warc_ts, html, text, lang)`` partitioned by url-hash bucket;
- a crawl is an iterative sequence of *waves*, each one a declarative
  DataFrame job (fetch-join -> parse/extract pandas UDFs -> seen
  anti-join -> distributed priority scoring -> top-k dispatch);
- tiny cluster state (the target cluster / topic factor of the
  reference's SemanticEstimator) lives on the driver and is broadcast
  down; all big state (frontier, seen-set, edges, term vectors) is
  distributed and checkpointed per wave.

Layout:
    kernels/    pure-Python reference kernels (no Spark) -- the single
                source of truth used by both pandas UDFs and pytest oracles
    functions/  pandas/Arrow UDF wrappers and column helpers
    sources/    synthetic web generator + snapshot table catalog
    plans/      the crawl engine (frontier, estimators, wave loop, oracle)
    operators/  training-data pipeline ops (dedup, similarity, text, multimodal)
    exports/    GML / Octave / statistics text renderers
    learn/      offline TuneVocabulary-style perceptron
    streaming/  structured-streaming wave sugar
"""

__version__ = "0.1.0"
