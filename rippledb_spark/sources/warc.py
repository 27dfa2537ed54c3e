"""WARC in/out — the web-archive record format (ISO 28500 / WARC 1.0,
the container format of Common Crawl and every web-scale pretraining
corpus's raw tier).

A WARC file is a sequence of records::

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: http://...\\r\\n
    WARC-Date: 2024-01-01T00:00:00Z\\r\\n
    Content-Type: text/plain\\r\\n
    Content-Length: <payload bytes>\\r\\n
    \\r\\n
    <payload>\\r\\n
    \\r\\n

The READER is Content-Length-driven (the spec's framing): the payload is
sliced by its declared byte count, so payloads may contain anything —
including the literal text ``WARC/1.0`` — without confusing the scanner.
Records with a missing/invalid Content-Length or a truncated payload are
skipped (skip semantics, like the N-Triples reader); the scanner resyncs
just past the bad record's header block. Documented residual: a
malformed record's payload extent is unknown, so record-looking text
embedded in THAT payload can surface as phantom records — well-framed
records are immune (their payloads are length-sliced, never rescanned).
Inter-record whitespace is tolerated. ``.gz`` members decompress in-task via stdlib
gzip (Common Crawl ships ``.warc.gz``).

Spark shape: one task per WARC file (binaryFile + mapInPandas — the
same per-file parallelism as sources/rdfio.read_rdfxml; WARC's gzip
members are not splittable, so per-file IS the scale unit, and a 100 TB
crawl is ~100k files — ample parallelism). The WRITER builds each record
as one pure-expression string column and sinks via ``df.write.text``
(executor-parallel, no driver involvement); ``write.text`` terminates
rows with ``\\n``, which lands in the tolerated inter-record whitespace.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, warc_date string,"
    " content_type string, content_length bigint, payload binary"
)

_MARKER = b"WARC/1.0"


def parse_warc_bytes(data: bytes) -> list[tuple]:
    """All well-formed records in one WARC member → rows (skip semantics
    for malformed records)."""
    out: list[tuple] = []
    pos = 0
    n = len(data)
    while True:
        start = data.find(_MARKER, pos)
        if start < 0:
            break
        # header block ends at the first blank line — WHICHEVER terminator
        # comes first (a later CRLF record must not shadow a bare-\n
        # record's own, earlier terminator)
        i_crlf = data.find(b"\r\n\r\n", start)
        i_lf = data.find(b"\n\n", start)
        if i_crlf < 0 and i_lf < 0:
            break
        if i_lf < 0 or (0 <= i_crlf < i_lf):
            hdr_end, sep = i_crlf, b"\r\n"
        else:
            hdr_end, sep = i_lf, b"\n"
        headers: dict[str, str] = {}
        for line in data[start : hdr_end].split(sep)[1:]:
            name, _, value = line.partition(b":")
            if _:
                headers[name.strip().decode("utf-8", "replace").lower()] = (
                    value.strip().decode("utf-8", "replace")
                )
        body_start = hdr_end + 2 * len(sep)
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            # malformed: resync AFTER the declared header block, not at
            # start+8 — never re-match marker-looking text inside the bad
            # record's own header bytes. DOCUMENTED RESIDUAL of skip-mode
            # resync: the bad record's payload extent is unknown, so
            # content-controlled payload text that spells a complete
            # record ("WARC/1.0\r\nContent-Length: N\r\n\r\n...") can
            # surface as a phantom record; only well-framed records are
            # immune (their payloads are sliced, never rescanned).
            pos = body_start
            continue
        if body_start + clen > n:
            # truncated final record OR a corrupt overdeclared length
            # mid-member: resync past the header block (skip semantics —
            # at EOF the find simply fails). Same documented residual as
            # above: the tail claimed by the overdeclared frame is
            # rescanned, so payload-embedded record text there can
            # surface.
            pos = body_start
            continue
        payload = data[body_start : body_start + clen]
        out.append(
            (
                headers.get("warc-record-id"),
                headers.get("warc-type"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("content-type"),
                clen,
                payload,
            )
        )
        pos = body_start + clen
    return out


def warc_pandas_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body shared by the batch AND streaming WARC readers:
    (path, content) file batches → parsed record batches, with
    transparent .gz member decompression."""
    cols = [
        "record_id",
        "warc_type",
        "target_uri",
        "warc_date",
        "content_type",
        "content_length",
        "payload",
    ]
    for pdf in it:
        for fpath, content in zip(pdf["path"], pdf["content"]):
            data = bytes(content)
            if str(fpath).endswith(".gz") or data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
            rows = parse_warc_bytes(data)
            if rows:
                yield pd.DataFrame(rows, columns=cols)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s)/glob → DataFrame(WARC_SCHEMA); one task per file,
    transparent .gz member decompression."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(warc_pandas_batches, schema=WARC_SCHEMA)


def warc_record_expr(
    uri, date, payload, content_type="text/plain", warc_type="response"
):
    """Pure-expression WARC record string for one row: CRLF header block,
    Content-Length = payload OCTET count, deterministic record id derived
    from (uri, date) — no RNG, so re-serialization is byte-stable."""
    rid = F.concat(
        F.lit("<urn:md5:"), F.md5(F.concat(uri, F.lit("|"), date)), F.lit(">")
    )
    body = payload.cast("string")
    return F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit(f"WARC-Type: {warc_type}\r\n"),
        F.lit("WARC-Record-ID: "), rid, F.lit("\r\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit(f"Content-Type: {content_type}\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n"),
    )


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str = "target_uri",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    mode: str = "overwrite",
) -> None:
    """Distributed WARC sink: one record per row, one .warc part-file per
    partition, pure column expressions (no UDF in the serializer)."""
    rec = warc_record_expr(
        F.col(uri_col), F.col(date_col), F.col(payload_col)
    )
    df.select(rec.alias("value")).write.mode(mode).text(path)
