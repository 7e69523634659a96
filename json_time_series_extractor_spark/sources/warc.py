"""WARC (ISO 28500 / WARC 1.0) source — the container Common Crawl
actually ships.

A crawl pipeline that claims Common-Crawl-shape input must read WARC:
each file is a sequence of records

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of block>
    \\r\\n\\r\\n

and the crawl convention (which Common Crawl follows) compresses each
record as its OWN GZIP MEMBER, so readers can skip records without
decompressing the file — and so a per-file reader can stream members
with bounded memory. ``response`` records carry an HTTP response in
the block; the page payload is the HTTP body.

Spark shape: ``.warc.gz`` files are NOT splittable (gzip), and real
crawl files are ~1 GB — so parallelism is per-FILE, the industry
pattern for WARC (one task per file; 100 TB is ~100k files, plenty of
tasks). The reader is ``binaryFile`` → ``mapInPandas`` with a
streaming member iterator: peak memory is one record, not one file.

Deviations, documented as explicit plug points (ValueError taxonomy,
the multimodal corrupt-blob policy): HTTP chunked transfer-encoding
and content-encoded (gzip/deflate) bodies are rejected, not silently
mis-read — Common Crawl stores identity bodies; ``revisit``/
``metadata``/request records pass through with a NULL payload unless
filtered.

Spec anchors: ISO 28500 §4 (record layout), RFC 1952 (gzip members),
RFC 9110 §6 (HTTP response framing).
"""

from __future__ import annotations

import io
import zlib
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

#: Output schema of :func:`read_warc_pages`.
WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, warc_type string, record_id string, "
    "http_status int, content_type string, payload binary"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream one member at a time
    (RFC 1952 members concatenate; ``zlib``'s ``unused_data`` hands the
    next member back)."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(blob[pos:])
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        out += d.flush()
        yield out
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc: gzip member consumed no bytes")
        pos += consumed


def _parse_headers(raw: bytes) -> List[Tuple[str, str]]:
    headers = []
    for line in raw.split(b"\r\n"):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"warc: malformed header line {line!r}")
        headers.append((k.decode("latin-1").strip().lower(),
                        v.decode("latin-1").strip()))
    return headers


def _records_from_plain(data: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Iterate (headers-dict, block) records of an UNCOMPRESSED WARC
    stream (also used per gzip member, where each member is exactly
    one record)."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"warc: expected record version marker at {pos}")
        eol = data.index(b"\r\n", pos)
        version = data[pos:eol].decode("latin-1")
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"warc: unsupported version {version!r}")
        hdr_end = data.index(b"\r\n\r\n", eol)
        headers = dict(_parse_headers(data[eol + 2:hdr_end]))
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("warc: record without Content-Length")
        block_start = hdr_end + 4
        block_end = block_start + length
        if block_end > n:
            raise ValueError("warc: record block overruns the file")
        if data[block_end:block_end + 4] not in (b"\r\n\r\n", b""):
            raise ValueError("warc: missing record separator")
        yield headers, data[block_start:block_end]
        pos = block_end + 4


def parse_warc(blob: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Iterate (headers, block) over a WARC file's bytes — gzip
    (member-per-record or whole-file) or plain, auto-detected."""
    if blob[:2] == _GZIP_MAGIC:
        for member in _gzip_members(blob):
            yield from _records_from_plain(member)
    else:
        yield from _records_from_plain(blob)


def _http_payload(block: bytes) -> Tuple[Optional[int], Optional[str],
                                         bytes]:
    """Split an HTTP response block into (status, content-type, body).
    Chunked / content-encoded bodies are rejected loudly (plug point —
    Common Crawl stores identity bodies)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        raise ValueError("warc: response block is not an HTTP response")
    head = block[:sep]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split(b" ")[1])
    except (IndexError, ValueError):
        raise ValueError(f"warc: malformed status line {lines[0]!r}")
    ctype = None
    for k, v in _parse_headers(b"\r\n".join(lines[1:])):
        if k == "transfer-encoding" and v.lower() != "identity":
            raise ValueError(
                f"warc: transfer-encoding {v!r} not supported")
        if k == "content-encoding" and v.lower() != "identity":
            raise ValueError(
                f"warc: content-encoding {v!r} not supported")
        if k == "content-type":
            ctype = v
    return status, ctype, block[sep + 4:]


def _warc_ts(value: str) -> datetime:
    # ISO 28500 mandates the W3C subset YYYY-MM-DDThh:mm:ssZ
    return (datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc))


def read_warc_pages(spark: SparkSession, path: str, *,
                    types: Tuple[str, ...] = ("response",),
                    on_error: str = "raise") -> DataFrame:
    """Read WARC files into page rows (:data:`WARC_PAGES_SCHEMA`).

    ``types`` filters by WARC-Type (non-response records have NULL
    http fields and the raw block as payload). ``on_error`` is the
    multimodal corrupt-blob policy: ``'raise'`` fails the task,
    ``'skip'`` drops the offending FILE (a torn gzip member poisons
    the rest of its stream, so file granularity is honest).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    want = tuple(types)
    files = spark.read.format("binaryFile").load(path)

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                try:
                    for headers, block in parse_warc(bytes(blob)):
                        wtype = headers.get("warc-type", "")
                        if want and wtype not in want:
                            continue
                        status = ctype = None
                        payload = block
                        if wtype == "response":
                            status, ctype, payload = _http_payload(block)
                        rows.append((
                            headers.get("warc-target-uri"),
                            _warc_ts(headers["warc-date"]),
                            wtype,
                            headers.get("warc-record-id"),
                            status, ctype, payload))
                except ValueError:
                    if on_error == "raise":
                        raise
            yield pd.DataFrame(rows, columns=[
                "url", "warc_ts", "warc_type", "record_id",
                "http_status", "content_type", "payload"])

    return files.select("content").mapInPandas(gen, WARC_PAGES_SCHEMA)


def build_warc(records, *, gzip_per_record: bool = True) -> bytes:
    """Spec-construct a WARC file (the test/fixture writer — kept
    beside the parser but sharing no parsing code with it): records
    are (url, ts datetime, html bytes); each becomes a ``response``
    record wrapping an HTTP 200 with identity framing."""
    import gzip as _gzip

    out = []
    for i, (url, ts, body) in enumerate(records):
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n"
                b"\r\n" + body)
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: " + url.encode() + b"\r\n"
               b"WARC-Date: "
               + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
               b"WARC-Record-ID: <urn:uuid:" + str(i).encode()
               + b">\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: " + str(len(http)).encode() + b"\r\n"
               b"\r\n" + http + b"\r\n\r\n")
        out.append(_gzip.compress(rec, mtime=0) if gzip_per_record
                   else rec)
    return b"".join(out)
