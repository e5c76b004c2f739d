"""Pure-Python kernels — no Spark imports allowed here.

These functions are the single source of truth for per-row semantics.
The Spark engine wraps them in vectorized pandas UDFs
(webcrawler_spark.functions); the pytest oracles call them directly.
"""

from webcrawler_spark.kernels.urls import (  # noqa: F401
    canonicalize,
    java_string_hashcode,
    seed_to_filename,
    url_hash64,
)
from webcrawler_spark.kernels.vectors import SparseVector  # noqa: F401
from webcrawler_spark.kernels.html import (  # noqa: F401
    extract_links,
    extract_links_doc,
    extract_text,
    extract_text_doc,
    link_context,
    link_context_doc,
    page_tokens,
    page_tokens_doc,
    parse_html,
    term_counts,
    term_counts_doc,
)
