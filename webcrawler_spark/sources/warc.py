"""WARC/1.0 container source — read and write Common-Crawl-style WARC
blobs as Spark DataFrames.

The engine's canonical page input is the Iceberg-shaped parquet table
``(url, warc_ts, html, text, lang)``; real Common Crawl deliveries arrive
as ``.warc.gz`` segment files instead. This module closes that gap with a
struct-level WARC implementation (no external warc lib in the sandbox):

- :func:`write_warc` serializes page rows into one WARC blob —
  ``WARC-Type: response`` records with the standard header block, payload,
  and the two-CRLF record terminator. ``per_record_gzip=True`` compresses
  each record as its own gzip member and concatenates them, which is the
  Common Crawl packaging convention (it is what makes byte-range record
  fetches possible).
- :func:`parse_warc` walks a blob back into page rows, tolerantly:
  headers in any order and case, unknown headers skipped, non-``response``
  records (warcinfo, request, metadata) skipped, a truncated trailing
  record dropped rather than raised.
- :func:`read_warc_df` turns a DataFrame of blobs into the canonical page
  shape with one Arrow-batched ``mapInPandas`` pass — each 1 GiB segment
  is an independent task, so a 100 TB delivery of ~100k segments reads as
  an embarrassingly parallel stage; at real scale the blob column comes
  from ``spark.read.format("binaryFile").load("s3://.../\\*.warc.gz")``.
- :func:`pages_to_warc_df` is the reverse direction (re-packaging a page
  table into N-record segments) — groupBy segment + ``applyInPandas``.

Format per the public ISO 28500 WARC spec; record layout mirrors what the
reference crawler ultimately consumes as raw fetched bytes
(WebGet.scala:40-60 reads the HTTP response body; a WARC response record
is that body plus capture envelope)."""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary"


def _warc_date(ts: datetime) -> str:
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc
    )


def write_record(url: str, ts: datetime, payload: bytes) -> bytes:
    """One WARC/1.0 response record (uncompressed)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Date: " + _warc_date(ts).encode("ascii"),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(payload)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF * 2 + payload + _CRLF * 2


def write_warc(
    rows: list[tuple[str, datetime, bytes]], per_record_gzip: bool = False
) -> bytes:
    """Serialize (url, ts, html) rows into one WARC blob. With
    ``per_record_gzip`` each record is an independent gzip member
    (mtime pinned to 0 so output is deterministic)."""
    out = io.BytesIO()
    for url, ts, payload in rows:
        rec = write_record(url, ts, payload)
        if per_record_gzip:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            rec = buf.getvalue()
        out.write(rec)
    return out.getvalue()


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the CC convention)."""
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(blob), mode="rb") as gz:
        # Python's GzipFile already iterates concatenated members
        while True:
            chunk = gz.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def parse_warc(blob: bytes) -> list[tuple[str, datetime, bytes]]:
    """Walk a WARC blob into (url, warc_ts, html) rows. Tolerant: header
    order/case-insensitive, non-response records skipped, short/corrupt
    tail dropped."""
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = _gunzip_members(blob)
        except (OSError, EOFError):
            return []
    rows: list[tuple[str, datetime, bytes]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip any inter-record CRLFs
        while blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = blob.find(_CRLF * 2, pos)
        if hdr_end < 0:
            break  # truncated header block
        head_lines = blob[pos:hdr_end].split(_CRLF)
        if not head_lines or not head_lines[0].startswith(b"WARC/"):
            break  # lost sync — stop rather than guess
        fields: dict[str, str] = {}
        for line in head_lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                fields[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break  # unrecoverable: cannot find the record boundary
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            break  # truncated payload
        if fields.get("warc-type") == "response":
            url = fields.get("warc-target-uri")
            date = fields.get("warc-date")
            if url and date:
                try:
                    rows.append(
                        (url, _parse_warc_date(date), blob[body_start:body_end])
                    )
                except ValueError:
                    pass  # malformed date: skip record, keep walking
        pos = body_end
    return rows


def read_warc_df(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """DataFrame of WARC blobs -> canonical page rows (url, warc_ts, html).

    One Arrow-batched pass; no shuffle — the parse pipelines with the
    blob scan, and each segment's records land in the same partition."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": []}
            for blob in pdf[blob_col]:
                for url, ts, html in parse_warc(bytes(blob)):
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(html)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(parse, PAGE_SCHEMA)


def pages_to_warc_df(
    pages: DataFrame,
    n_segments: int = 16,
    per_record_gzip: bool = False,
) -> DataFrame:
    """Re-package a page table into WARC segments: deterministic segment
    assignment by URL hash, record order within a segment pinned by
    (warc_ts, url) so output blobs are reproducible run-to-run."""
    import pandas as pd

    seg = pages.select(
        "url",
        "warc_ts",
        "html",
        (F.abs(F.xxhash64("url")) % F.lit(max(1, n_segments))).alias("_seg"),
    )

    def pack(key, pdf):
        pdf = pdf.sort_values(["warc_ts", "url"])
        rows = [
            (u, t.to_pydatetime(), bytes(h))
            for u, t, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
        ]
        return pd.DataFrame(
            {
                "segment": [int(key[0])],
                "n_records": [len(rows)],
                "blob": [write_warc(rows, per_record_gzip=per_record_gzip)],
            }
        )

    return seg.groupBy("_seg").applyInPandas(
        pack, "segment int, n_records long, blob binary"
    )
