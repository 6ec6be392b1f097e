"""WARC crawl-container ingestion (ISO 28500 — the Common Crawl format).

The step BEFORE sources/corpus.py in a real pretraining pipeline: raw
crawls arrive as ``.warc`` / ``.warc.gz`` files — a sequence of WARC
records (version line, ``Name: value`` headers, ``Content-Length``
payload, double-CRLF terminator), where the ``.gz`` convention writes
ONE GZIP MEMBER PER RECORD so readers can resume at member boundaries.

100 TB stance:

- **Parallelism is per-file**: the scan is ``binaryFile`` (one task
  per file), matching how crawl corpora ship (thousands of ~1 GB
  segments). A single task streams its file member-by-member in O(1)
  memory over the compressed stream — the gzip-member layout is what
  makes per-record streaming possible without decompressing the whole
  file first.
- **Quarantine, not crash**: a malformed record quarantines the REST
  of that file (a framing error poisons every later offset — there is
  no trustworthy resync point) with the records before it kept; the
  quarantine row carries (source_file, record_index, error) for
  audit/replay, same shape as the JSONL front door.
- **Python parsing is the seam, Arrow is the transport**: records are
  exploded by a mapInPandas kernel (batched, zero-copy into Arrow);
  at true 100 TB you'd bind a native WARC splitter behind the same
  kernel signature.

Parsers are pure stdlib (no Spark imports) and uphold the
ValueError-only contract: truncation, bad gzip, bad headers and
undecodable header bytes all raise ValueError (UnicodeDecodeError is
a ValueError subclass), never IndexError/zlib.error/KeyError.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

_GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"
_CHUNK = 1 << 16


# ----------------------------------------------------------------- writer


def build_warc_record(headers: dict[str, str], payload: bytes) -> bytes:
    """One WARC/1.0 record; Content-Length is computed, not passed."""
    out = bytearray(b"WARC/1.0\r\n")
    for k, v in headers.items():
        if k.lower() == "content-length":
            raise ValueError("Content-Length is derived from the payload")
        if "\r" in v or "\n" in v:
            raise ValueError(f"header value for {k} contains CR/LF")
        out += f"{k}: {v}\r\n".encode()
    out += f"Content-Length: {len(payload)}\r\n".encode()
    out += b"\r\n"
    out += payload
    out += _CRLF2
    return bytes(out)


def gzip_member(record: bytes) -> bytes:
    """Compress one record as a standalone gzip member (the .warc.gz
    one-member-per-record convention; mtime pinned for determinism)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(record) + co.flush()


# ----------------------------------------------------------------- parser


MAX_MEMBER_PLAINTEXT = 64 << 20
"""Per-member decompressed-size cap (64 MiB).

A crafted small .warc.gz member can expand ~1000x (gzip bomb); without
a cap the full plaintext is buffered and a many-GB expansion raises
MemoryError, which escapes the ValueError-only quarantine contract and
kills the whole batch — the same hazard class the FLAC/JPEG allocation
guards close.  Real crawl records are single web resources, orders of
magnitude under this cap."""


def _gunzip_member(mv: memoryview, pos: int) -> tuple[bytes, int]:
    """Decompress the gzip member starting at ``pos``; returns
    (plaintext, next_pos). Feeds fixed chunks so a stream of N members
    costs O(total), not O(N x remaining); output is budgeted via
    ``decompress(chunk, max_length)`` so a gzip bomb raises ValueError
    (quarantine) before any oversized allocation, never MemoryError."""
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    out = bytearray()
    p = pos
    try:
        while not d.eof:
            if d.unconsumed_tail:
                chunk = d.unconsumed_tail
            else:
                if p >= len(mv):
                    raise ValueError("truncated gzip member")
                chunk = bytes(mv[p : p + _CHUNK])
                p += len(chunk)
            # Budget = cap + 1 so overflow is observable: the extra
            # byte only ever materializes when the cap is crossed.
            out += d.decompress(chunk, MAX_MEMBER_PLAINTEXT + 1 - len(out))
            if len(out) > MAX_MEMBER_PLAINTEXT:
                raise ValueError(
                    "gzip member exceeds decompressed size cap "
                    f"({MAX_MEMBER_PLAINTEXT} bytes)"
                )
    except zlib.error as e:
        raise ValueError(f"corrupt gzip member: {e}") from e
    return bytes(out), p - len(d.unused_data)


def _parse_record(buf: bytes, pos: int) -> tuple[dict[str, str], bytes, int]:
    """Parse one record at ``pos`` in ``buf``; returns
    (lowercased headers, payload, next_pos)."""
    hdr_end = buf.find(_CRLF2, pos)
    if hdr_end < 0:
        raise ValueError("truncated WARC header")
    header = buf[pos:hdr_end].decode("utf-8")
    lines = header.split("\r\n")
    if not lines[0].startswith("WARC/"):
        raise ValueError("missing WARC version line")
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        name, sep, value = ln.partition(":")
        if not sep or not name.strip():
            raise ValueError(f"malformed WARC header line: {ln[:60]!r}")
        fields[name.strip().lower()] = value.strip()
    if "content-length" not in fields:
        raise ValueError("missing Content-Length")
    try:
        length = int(fields["content-length"])
    except ValueError as e:
        raise ValueError("non-numeric Content-Length") from e
    if length < 0:
        raise ValueError("negative Content-Length")
    body_start = hdr_end + 4
    if body_start + length + 4 > len(buf):
        raise ValueError("truncated WARC payload")
    payload = buf[body_start : body_start + length]
    if buf[body_start + length : body_start + length + 4] != _CRLF2:
        raise ValueError("missing WARC record terminator")
    return fields, payload, body_start + length + 4


def iter_warc_records(
    data: bytes | bytearray | memoryview,
) -> Iterator[tuple[dict[str, str], bytes, bool]]:
    """Yield (headers, payload, was_gzip_member) for every record.

    Handles plain streams, gzip-member-per-record streams, and mixed
    streams (each record position is sniffed independently), plus
    members that carry several records. Any framing error raises
    ValueError — callers quarantine from the failing record onward.
    """
    buf = bytes(data)
    mv = memoryview(buf)
    pos = 0
    while pos < len(buf):
        if buf[pos : pos + 2] == _GZIP_MAGIC:
            plain, pos = _gunzip_member(mv, pos)
            inner = 0
            while inner < len(plain):
                fields, payload, inner = _parse_record(plain, inner)
                yield fields, payload, True
        else:
            fields, payload, pos = _parse_record(buf, pos)
            yield fields, payload, False


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split a ``application/http;msgtype=response`` payload into
    (status_code, lowercased headers, body)."""
    sep = payload.find(_CRLF2)
    if sep < 0:
        raise ValueError("truncated HTTP response")
    head = payload[:sep].decode("utf-8")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"malformed HTTP status line: {lines[0][:60]!r}")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise ValueError("non-numeric HTTP status") from e
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        name, s, value = ln.partition(":")
        if not s:
            raise ValueError(f"malformed HTTP header line: {ln[:60]!r}")
        headers[name.strip().lower()] = value.strip()
    return status, headers, payload[sep + 4 :]


# ------------------------------------------------------------ Spark reader

WARC_DOC_SCHEMA = (
    "source_file string, record_index int, warc_type string, "
    "record_id string, warc_date string, target_uri string, "
    "content_type string, is_gzip boolean, payload binary"
)
WARC_SCAN_SCHEMA = WARC_DOC_SCHEMA + ", error string"


def _scan_kernel(batches):
    """mapInPandas kernel: (path, content) -> exploded record rows;
    on a framing error, one quarantine row for the file's remainder."""
    import pandas as pd

    cols = [
        "source_file", "record_index", "warc_type", "record_id",
        "warc_date", "target_uri", "content_type", "is_gzip",
        "payload", "error",
    ]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            idx = 0
            try:
                for fields, payload, was_gzip in iter_warc_records(content):
                    rows.append(
                        (
                            path, idx,
                            fields.get("warc-type"),
                            fields.get("warc-record-id"),
                            fields.get("warc-date"),
                            fields.get("warc-target-uri"),
                            fields.get("content-type"),
                            was_gzip, bytes(payload), None,
                        )
                    )
                    idx += 1
            except ValueError as e:
                rows.append(
                    (path, idx, None, None, None, None, None, None, None,
                     str(e))
                )
        yield pd.DataFrame(rows, columns=cols)


def read_warc(spark, path):
    """Read WARC files under ``path`` -> (records, quarantine).

    ``records``: one row per parsed record (WARC_DOC_SCHEMA).
    ``quarantine``: (source_file, record_index, error) — record_index
    is the first unparseable record; everything before it is in
    ``records``, everything after is untrusted and dropped.
    """
    from pyspark.sql import functions as F

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    scanned = raw.mapInPandas(_scan_kernel, WARC_SCAN_SCHEMA)
    records = scanned.where(F.col("error").isNull()).drop("error")
    quarantine = scanned.where(F.col("error").isNotNull()).select(
        "source_file", "record_index", "error"
    )
    return records, quarantine
