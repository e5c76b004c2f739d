"""URL kernels: canonicalization, filenames, hashing.

Reference semantics:
- ``normalize`` — /root/reference/src/main/scala/ru/wordmetrix/webcrawler/package.scala:17-28:
  resolve the (possibly relative) reference against the base, then rebuild
  the URI keeping scheme + host + path only (query, fragment, port and
  userinfo dropped) and collapse ``.``/``..`` segments (RFC 3986).
  Behavior pinned by /root/reference/src/test/scala/ru/wordmetrix/webcrawler/TestWebCrawler.scala:16-38.
- ``seedToFilename`` — Storage.scala:14-21: strip ``https?://``, replace
  ``[/:\\]`` with ``-``; if longer than 120 chars truncate to 120 and append
  the JVM ``String.hashCode`` of the truncation.

Divergence (documented): we lowercase scheme and host during
canonicalization — real-web hygiene the reference gets implicitly from
test data being lowercase already.
"""

from __future__ import annotations

import posixpath
import zlib
from urllib.parse import urljoin, urlsplit


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal (matches java.net.URI.normalize
    for the cases the reference exercises)."""
    if not path:
        return path
    # posixpath.normpath collapses '.'/'..' but also strips trailing '/';
    # restore it, and keep a lone '/'.
    normed = posixpath.normpath(path)
    if path.endswith("/") and not normed.endswith("/"):
        normed += "/"
    if normed == ".":
        normed = ""
    return normed


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Canonical URL per the reference's ``normalize``.

    Returns None for unparseable / non-http(s) results (the reference wraps
    normalize in ``Try`` at Gather.scala:89 and drops failures).
    """
    try:
        raw = url.strip()
        if base is not None:
            # LinkContext.scala:97-100 works around '|' breaking java.net.URI
            raw = urljoin(base.strip().replace("|", "%124"), raw.replace("|", "%124"))
        parts = urlsplit(raw)
        scheme = (parts.scheme or "").lower()
        if scheme not in ("http", "https"):
            return None
        host = (parts.hostname or "").lower()
        if not host:
            return None
        path = _remove_dot_segments(parts.path or "")
        # scheme + host + path only: port, userinfo, query, fragment dropped
        return f"{scheme}://{host}{path}"
    except (ValueError, AttributeError):
        return None


def url_host(url: str) -> str | None:
    try:
        return urlsplit(url).hostname
    except ValueError:
        return None


def java_string_hashcode(s: str) -> int:
    """JVM String.hashCode (32-bit signed) — needed for byte-parity of
    seedToFilename labels (Storage.scala:18-19)."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    if h >= 0x80000000:
        h -= 0x100000000
    return h


def seed_to_filename(url: str) -> str:
    """Storage.seedToFilename (Storage.scala:14-21)."""
    import re

    s = re.sub(r"^https?://", "", url, count=1)
    s = re.sub(r"[/:\\\\]", "-", s)
    if len(s) > 120:
        head = s[:120]
        return head + str(java_string_hashcode(head))
    return s


def url_hash64(url: str) -> int:
    """Deterministic 64-bit hash of a canonical URL (Python side).

    Used by the synthetic generator and the partitioned bloom filter. The
    Spark engine uses ``F.xxhash64`` for its own join/partition keys; the
    two never need to agree — every cross-boundary comparison is on the
    canonical URL string.
    """
    data = url.encode("utf-8")
    hi = zlib.crc32(data)
    lo = zlib.crc32(data, 0x9E3779B9)
    return ((hi << 32) | lo) - 0x8000000000000000
