"""WARC source + sink — the web-archive interchange format (ISO 28500).

CommonCrawl, the Internet Archive, and every large crawl corpus ship as
WARC: a stream of length-delimited records, usually one gzip member per
record.  The reference stores pages in Elasticsearch and has no archival
format (elasticsearch_storage.py); for a 100 TB webtext engine WARC
ingestion is the front door, so this module adds it as a first-class
source/sink pair:

* ``read_warc(spark, path)`` — ``binaryFile`` scan → ``mapInPandas``
  parser.  File-per-task is the standard Spark pattern for WARC (the
  format is a sequential record stream with no mid-file sync points;
  CommonCrawl segments are ~1 GB so a file is the natural split unit, and
  a 100 TB corpus is ~10^5 files = plenty of parallelism).  Only
  ``response`` records surface; the HTTP envelope is stripped so ``payload``
  is the body bytes.  Handles plain ``.warc`` and member-per-record
  ``.warc.gz`` (multi-member gzip — stdlib ``gzip`` decompresses
  concatenated members).

* ``write_warc(df, path)`` — per-partition sink: each task serializes its
  rows as WARC response records into ``part-NNNNN.warc.gz`` under ``path``.
  A sink is legitimately per-partition imperative (same shape as Spark's
  own file sinks); at cluster scale the target is shared storage.

Record layout written (and expected back):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:uuid-or-hash>\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <iso8601>\r\n
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: <len(http_block)>\r\n
    \r\n
    HTTP/1.1 <status> OK\r\n
    Content-Type: <mime>\r\n
    \r\n
    <payload bytes>
    \r\n\r\n
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

from pyspark.sql import DataFrame, SparkSession

READ_SCHEMA = (
    "src_file string, record_id string, url string, warc_date string, "
    "http_status int, mime string, payload binary"
)

_CRLF = b"\r\n"


def build_record(
    url: str,
    payload: bytes,
    warc_date: str = "2020-01-01T00:00:00Z",
    http_status: int = 200,
    mime: str = "text/html",
    record_id: str | None = None,
) -> bytes:
    """One WARC ``response`` record (bytes, uncompressed).  Deterministic:
    the default record id is derived from url+date, never random."""
    if record_id is None:
        h = hashlib.sha256(f"{url}\x00{warc_date}".encode()).hexdigest()[:32]
        record_id = f"<urn:uuid:{h}>"
    http = (
        f"HTTP/1.1 {http_status} OK\r\nContent-Type: {mime}\r\n\r\n".encode()
        + payload
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: " + record_id.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + warc_date.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def parse_warc_stream(data: bytes, src_file: str = ""):
    """Yield dict rows for every ``response`` record in a WARC byte stream.
    Non-response records (warcinfo, request, metadata) are skipped but must
    still be walked — Content-Length drives the cursor.  Truncated trailing
    records are dropped, not raised (a killed crawl leaves one)."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break  # truncated header
        headers: dict[str, str] = {}
        first = True
        for line in data[pos:head_end].split(_CRLF):
            if first:
                first = False  # "WARC/1.0" version line
                continue
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # unwalkable — bail rather than misparse the rest
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            break  # truncated body
        pos = body_end
        if headers.get("warc-type") != "response":
            continue
        body = data[body_start:body_end]
        status, mime, payload = 0, "", body
        http_end = body.find(_CRLF + _CRLF)
        if body.startswith(b"HTTP/") and http_end >= 0:
            http_lines = body[:http_end].split(_CRLF)
            parts = http_lines[0].split(b" ")
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for line in http_lines[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-type":
                    mime = v.strip().decode("utf-8", "replace")
            payload = body[http_end + 4 :]
        yield {
            "src_file": src_file,
            "record_id": headers.get("warc-record-id", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": status,
            "mime": mime,
            "payload": payload,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame of response records from ``.warc`` / ``.warc.gz`` files
    under ``path`` (file-per-task; see module docstring for why)."""
    import pandas as pd  # noqa: F401  (worker-side)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if path_.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)  # multi-member OK
                rows.extend(parse_warc_stream(data, src_file=path_))
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_file",
                    "record_id",
                    "url",
                    "warc_date",
                    "http_status",
                    "mime",
                    "payload",
                ],
            )

    return files.mapInPandas(parse, READ_SCHEMA)


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    payload_col: str = "payload",
    date_col: str | None = None,
    compress: bool = True,
) -> int:
    """Write rows as WARC response records, one ``part-NNNNN.warc[.gz]``
    per partition under ``path``; returns the number of files written.
    Member-per-record gzip (the CommonCrawl convention), so readers can
    seek to any record boundary.

    ``path`` must be a filesystem visible to the EXECUTORS: each task
    opens its part file directly (and makedirs it first), so on a
    multi-node cluster this needs a shared mount (NFS/fuse); in local
    mode any directory works.  The returned count is one collect of one
    filename per non-empty partition — not data-scale."""
    cols = [url_col, payload_col] + ([date_col] if date_col else [])
    slim = df.select(*cols)
    ext = ".warc.gz" if compress else ".warc"

    def dump(idx, rows):
        buf = io.BytesIO()
        wrote = False
        for r in rows:
            wrote = True
            payload = r[payload_col]
            if isinstance(payload, str):
                payload = payload.encode()
            # NULL dates fall back to build_record's deterministic default
            # rather than crashing on None.encode().
            date = r[date_col] if date_col else None
            rec = build_record(
                r[url_col],
                bytes(payload or b""),
                **({"warc_date": date} if date is not None else {}),
            )
            if compress:
                g = io.BytesIO()
                with gzip.GzipFile(fileobj=g, mode="wb", mtime=0) as zf:
                    zf.write(rec)
                buf.write(g.getvalue())
            else:
                buf.write(rec)
        if wrote:
            os.makedirs(path, exist_ok=True)  # executor-side, per task
            name = os.path.join(path, f"part-{idx:05d}{ext}")
            with open(name, "wb") as f:
                f.write(buf.getvalue())
            yield name

    written = slim.rdd.mapPartitionsWithIndex(dump).collect()
    return len(written)
