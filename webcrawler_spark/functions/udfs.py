"""Arrow-batched UDFs wrapping the pure kernels (no per-row Python at the
DataFrame boundary — mapInPandas / pandas_udf throughout, per the
input_hint).

The parse UDF is the engine's whole Gather hot path (reference
Gather.scala:151-182): one HTML parse per page shared by text extraction,
link extraction, term counting and link-context features — mirroring the
reference's single page2xml parse feeding all four consumers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql import functions as F

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("dr", T.LongType()),  # dispatch rank within the wave
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pos", T.IntegerType()),
                        T.StructField("url", T.StringType()),
                        T.StructField("host", T.StringType()),
                    ]
                )
            ),
        ),
        # first-occurrence-ORDERED term list (arrays keep order; maps do
        # not) — position feeds the deterministic first-seen vocab ids
        T.StructField(
            "terms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("word", T.StringType()),
                        T.StructField("tf", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "linkctx",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("link", T.StringType()),
                        T.StructField("feature", T.StringType()),
                        T.StructField("weight", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_pages(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: input batches with (dr, url, html) — html None
    for fetch misses; output PARSED_SCHEMA. Link extraction here is
    host-UNfiltered (all canonical links, in first-occurrence order); the
    host allowlist is applied engine-side as a join so the allowlist never
    rides inside the UDF closure."""
    from urllib.parse import urlsplit

    from webcrawler_spark.kernels import (
        extract_links_doc,
        extract_text_doc,
        link_context_doc,
        parse_html,
        term_counts_doc,
    )

    for pdf in it:
        rows = []
        for dr, url, html in zip(pdf["dr"], pdf["url"], pdf["html"]):
            host = urlsplit(url).hostname
            if html is None:
                rows.append((dr, url, host, False, None, [], [], []))
                continue
            try:
                doc = parse_html(html)  # ONE parse, four consumers
                links = extract_links_doc(doc, url, allhosts=True)
                rows.append(
                    (
                        dr,
                        url,
                        host,
                        True,
                        extract_text_doc(doc),
                        [
                            (i, l, urlsplit(l).hostname)
                            for i, l in enumerate(links)
                        ],
                        list(term_counts_doc(doc).items()),
                        [
                            (link, feat, w)
                            for link, vec in link_context_doc(doc, url).items()
                            for feat, w in vec.items()
                        ],
                    )
                )
            except Exception:
                # Gather.scala:178-180 — failures swallowed
                rows.append((dr, url, host, False, None, [], [], []))
        yield pd.DataFrame(
            rows,
            columns=["dr", "url", "host", "ok", "text", "links", "terms", "linkctx"],
        )


def canonicalize_udf():
    """Vectorized canonicalization column function (U1)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _canon(urls: pd.Series) -> pd.Series:
        from webcrawler_spark.kernels import canonicalize

        return urls.map(lambda u: canonicalize(u) if u is not None else None)

    return _canon


def seed_to_filename_udf():
    """U2 as a vectorized UDF (JVM hashCode parity included)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _fn(urls: pd.Series) -> pd.Series:
        from webcrawler_spark.kernels import seed_to_filename

        return urls.map(seed_to_filename)

    return _fn


def with_url_hash(df, url_col: str = "url", out: str = "url_hash"):
    """64-bit join/partition key — JVM-side xxhash64, no Python."""
    return df.withColumn(out, F.xxhash64(F.col(url_col)))
