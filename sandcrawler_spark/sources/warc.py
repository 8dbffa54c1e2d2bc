"""WARC container I/O — the reference's native archive format,
readable and writable here with stdlib only (no `warcio`/`wayback`).

Reference surface:

- ``ia.py:435-520`` (``fetch_petabox``): the reference random-accesses
  one WARC record by ``(warc_path, offset, csize)`` — each record in a
  ``.warc.gz`` is its own gzip member, so a member can be fetched and
  gunzipped independently. :func:`read_warc_records` reproduces those
  keys for every record it scans, and :func:`fetch_warc_record` is the
  single-record random-access twin (same contract as
  ``fetch_petabox(csize, offset, warc_path)``).
- ``ia.py:520-530``: HTTP status + Content-Type come from the record's
  embedded HTTP response block; revisit records carry no body.
- WARC/1.0 (ISO 28500): header block of ``Name: value`` lines ending
  with a blank line, ``Content-Length`` bytes of content, then CRLF
  CRLF. ``response`` records wrap an HTTP response message.

Scale shape: ``spark.read.format("binaryFile")`` lists the WARC files
and the Arrow-batched ``mapInPandas`` parses each file inside one
task — parallelism = number of WARC files, which matches the real
corpus layout (petabox stores ~1-GiB WARCs by the hundred thousand;
one task per gigabyte-file is the right grain). Member-gzip means the
parse is a single streaming pass that never holds more than one
record decompressed.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_path string, offset long, csize long, record_type string, "
    "target_uri string, warc_date string, http_status int, "
    "mimetype string, payload binary, payload_len long, sha1hex string"
)


def build_warc_record_bytes(
    target_uri: str,
    warc_date: str,
    payload: bytes,
    http_status: int = 200,
    mimetype: str = "application/pdf",
    record_type: str = "response",
) -> bytes:
    """One WARC/1.0 record as a standalone gzip member (the petabox
    layout, ia.py:435-443). Deterministic: the record id derives from
    the payload sha1, never a uuid4/now()."""
    sha1 = hashlib.sha1(payload).hexdigest()
    http_block = (
        f"HTTP/1.1 {http_status} {'OK' if http_status == 200 else 'X'}\r\n"
        f"Content-Type: {mimetype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii") + payload
    headers = (
        "WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Record-ID: <urn:sha1:{sha1}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http_block)}\r\n\r\n"
    ).encode("ascii")
    record = headers + http_block + b"\r\n\r\n"
    buf = io.BytesIO()
    # mtime=0 pins the gzip header; the member is byte-deterministic
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def _parse_record(raw: bytes) -> dict | None:
    """Parse one decompressed WARC record → field dict (None if the
    block isn't a WARC/1.0 record)."""
    if not raw.startswith(b"WARC/1.0"):
        return None
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    fields: dict[str, str] = {}
    for line in raw[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        fields[k.decode("ascii", "replace").strip().lower()] = v.decode(
            "utf-8", "replace"
        ).strip()
    try:
        clen = int(fields.get("content-length", ""))
    except ValueError:
        return None
    content = raw[head_end + 4 : head_end + 4 + clen]
    status = None
    mimetype = None
    payload = b""
    if fields.get("warc-type") == "response" and content.startswith(b"HTTP/"):
        http_end = content.find(b"\r\n\r\n")
        if http_end >= 0:
            http_lines = content[:http_end].split(b"\r\n")
            parts = http_lines[0].split()
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for hl in http_lines[1:]:
                hk, _, hv = hl.partition(b":")
                if hk.decode("ascii", "replace").strip().lower() == "content-type":
                    mimetype = hv.decode("utf-8", "replace").strip()
            payload = content[http_end + 4 :]
    return {
        "record_type": fields.get("warc-type"),
        "target_uri": fields.get("warc-target-uri"),
        "warc_date": fields.get("warc-date"),
        "http_status": status,
        "mimetype": mimetype,
        "payload": payload,
        "payload_len": len(payload),
        "sha1hex": hashlib.sha1(payload).hexdigest(),
    }


def iter_warc_members(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Stream (offset, csize, decompressed_record) over a member-gzip
    ``.warc.gz`` byte string — one zlib pass, one record resident at a
    time. Plain (uncompressed) WARC input yields a single pseudo-member
    covering the whole file."""
    if not blob.startswith(b"\x1f\x8b"):
        yield 0, len(blob), blob
        return
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        raw = d.decompress(blob[pos:])
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        yield pos, consumed, raw
        pos += consumed


def fetch_warc_record(path: str, offset: int, csize: int) -> dict | None:
    """Random-access one record by the reference's petabox key
    ``(warc_path, offset, csize)`` (ia.py:435-443): read exactly that
    byte range, gunzip the member, parse. No full-file scan."""
    with open(path, "rb") as f:
        f.seek(offset)
        member = f.read(csize)
    raw = (
        gzip.decompress(member) if member.startswith(b"\x1f\x8b") else member
    )
    return _parse_record(raw)


def read_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` listing → one Arrow task
    per WARC file → one row per record, keyed by the petabox fetch
    triple (warc_path, offset, csize) so any downstream consumer can
    re-fetch a single record without the scan."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_path", "offset", "csize", "record_type", "target_uri",
            "warc_date", "http_status", "mimetype", "payload",
            "payload_len", "sha1hex",
        ]
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                for off, csize, raw in iter_warc_members(bytes(blob)):
                    # a plain-WARC pseudo-member may hold many records
                    start = 0
                    while True:
                        rec_start = raw.find(b"WARC/1.0", start)
                        if rec_start < 0:
                            break
                        rec = _parse_record(raw[rec_start:])
                        if rec is None:
                            break
                        rec["warc_path"] = p
                        rec["offset"] = off
                        rec["csize"] = csize
                        rows.append(rec)
                        head_end = raw.find(b"\r\n\r\n", rec_start)
                        clen = len(raw)
                        try:
                            for line in raw[rec_start:head_end].split(b"\r\n"):
                                if line.lower().startswith(b"content-length:"):
                                    clen = int(line.split(b":")[1])
                        except ValueError:
                            pass
                        start = head_end + 4 + clen
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_to_captures(records: "DataFrame") -> "DataFrame":
    """Adapter: WARC record scan → the capture-history shape the
    frontier fetch simulation joins (url, dt, mimetype, status_code,
    sha1hex + the petabox fetch triple). WARC-Date is ISO
    (2020-06-01T00:00:00Z); CDX wants the 14-digit form — same
    separator strip as the revisit normalization (ia.py:542-556).
    Pure Catalyst over the scan output."""
    from pyspark.sql import functions as F

    return records.where(F.col("record_type") == "response").select(
        F.col("target_uri").alias("url"),
        F.substring(F.translate("warc_date", "-:TZ", ""), 1, 14).alias("dt"),
        F.coalesce("mimetype", F.lit("application/octet-stream")).alias("mimetype"),
        F.col("http_status").alias("status_code"),
        "sha1hex",
        F.col("payload_len").alias("size_bytes"),
        "warc_path",
        F.col("offset").alias("warc_offset"),
        F.col("csize").alias("warc_csize"),
    )


def warc_to_cdx_lines(records: "DataFrame") -> "DataFrame":
    """The CDX-11 indexing job — the batch job that PRODUCES the
    reference's CDX inputs from raw WARCs (wayback's cdx-indexer;
    field layout per misc.py:190-242 / our parse_cdx_lines): urlkey
    (SURT), 14-digit timestamp, original URL, mimetype, status, base32
    SHA-1 digest, '-' redirect, '-' meta, compressed member size,
    member offset, WARC filename — one space-joined line per response
    record. Round-trips: parse_cdx_lines(warc_to_cdx_lines(scan))
    recovers the capture rows exactly (pytest-pinned).

    Scale shape: one projection over the scan; SURT and hex→b32 are the
    only Python (Arrow-batched)."""
    from pyspark.sql import functions as F

    from sandcrawler_spark.functions.hashes import hex_b32_udf
    from sandcrawler_spark.functions.urlkeys import surt_udf

    caps = warc_to_captures(records)
    return caps.select(
        F.concat_ws(
            " ",
            surt_udf(F.col("url")),
            "dt",
            "url",
            "mimetype",
            F.col("status_code").cast("string"),
            F.upper(hex_b32_udf(F.col("sha1hex"))),
            F.lit("-"),
            F.lit("-"),
            F.col("warc_csize").cast("string"),
            F.col("warc_offset").cast("string"),
            F.element_at(F.split("warc_path", "/"), -1),
        ).alias("value")
    )


def write_warc_fanout(
    df: DataFrame, out_dir: str, num_shards: int = 16
) -> DataFrame:
    """Archive-side sink: crawl results → member-gzip ``.warc.gz``
    shard files, written executor-side (the WARC twin of the S13 blob
    fan-out; the reference archives fetched bodies back into petabox
    WARCs). Input columns: url, dt (14-digit CDX), payload binary,
    http_status int, mimetype string.

    Determinism: shard = xxhash64(url) mod num_shards, records sorted
    by (url, dt) inside each shard, gzip mtime pinned — reruns produce
    byte-identical files. Writes are tmp + os.replace (atomic per
    shard). Returns a manifest DataFrame (shard, path, records,
    bytes); the actual record keys are recoverable by scanning the
    output with :func:`read_warc_records`."""
    import os

    from pyspark.sql import functions as F

    iso = F.concat(
        F.substring("dt", 1, 4), F.lit("-"), F.substring("dt", 5, 2),
        F.lit("-"), F.substring("dt", 7, 2), F.lit("T"),
        F.substring("dt", 9, 2), F.lit(":"), F.substring("dt", 11, 2),
        F.lit(":"), F.substring("dt", 13, 2), F.lit("Z"),
    )
    src = (
        df.select(
            "url", "dt", iso.alias("warc_date"), "payload",
            "http_status", "mimetype",
            F.pmod(F.xxhash64("url"), F.lit(num_shards)).alias("__shard"),
        )
        .repartition(num_shards, "__shard")
        .sortWithinPartitions("__shard", "url", "dt")
    )

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: dict[int, list[bytes]] = {}
        for pdf in batches:
            for url, wd, payload, status, mime, shard in zip(
                pdf["url"], pdf["warc_date"], pdf["payload"],
                pdf["http_status"], pdf["mimetype"], pdf["__shard"],
            ):
                buf.setdefault(int(shard), []).append(
                    build_warc_record_bytes(
                        target_uri=url, warc_date=wd,
                        payload=bytes(payload),
                        http_status=int(status), mimetype=mime,
                    )
                )
        rows = []
        for shard, members in sorted(buf.items()):
            path = os.path.join(out_dir, f"shard-{shard:05d}.warc.gz")
            blob = b"".join(members)
            with open(path + ".tmp", "wb") as f:
                f.write(blob)
            os.replace(path + ".tmp", path)
            rows.append(
                {"shard": shard, "path": path,
                 "records": len(members), "bytes": len(blob)}
            )
        yield pd.DataFrame(
            rows, columns=["shard", "path", "records", "bytes"]
        )

    os.makedirs(out_dir, exist_ok=True)
    return src.mapInPandas(
        write, schema="shard int, path string, records long, bytes long"
    )
