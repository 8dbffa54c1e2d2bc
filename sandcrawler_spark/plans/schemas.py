"""StructType schemas for every frontier table.

Shapes follow FIXTURES.md, which derives them from the reference:

- ``DOCS``: the mandated interleaved text+media input table
  (BASELINE.json input_hint); models an HTML capture = text body +
  ordered typed sub-resources (``WebResource``, ingest_html.py:74-87;
  extraction order html_metadata.py:1034-1077).
- ``SEEDS``: IngestRequest (proposals/2019_ingest.md:84-114;
  sql/sandcrawler_schema.sql:134-153) + the north_rule priority keys.
- ``CAPTURE_HISTORY``: 11-field CDX row (misc.py:190-242, ia.py:68-82)
  plus a synthetic ``location`` column standing in for the redirect
  target that the reference obtains from wayback replay (ia.py:894).
- ``ROBOTS``: politeness rules; reference analogue is the in-repo URL
  blocklists (ingest_file.py:118-187) + SPN per-domain slot caps
  (ia.py:1071-1084).
- ``URL_SEEN``: the dedup/result state table = ingest_file_result PK
  semantics (sql/sandcrawler_schema.sql:156-171; upsert db.py:462-508).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # text|link|image|script|stylesheet|audio|media|subdocument
        T.StructField("text", T.StringType()),       # null for pure media spans
        T.StructField("media_ref", T.StringType()),  # absolute URL; null for text spans
        T.StructField("offset", T.IntegerType()),    # 0-based extraction order
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # sha1hex of content
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),        # arrival order (last-wins batch dedup, db.py:186-190)
        T.StructField("ingest_type", T.StringType(), False),
        T.StructField("base_url", T.StringType(), False),
        T.StructField("link_source", T.StringType()),
        T.StructField("link_source_id", T.StringType()),
        T.StructField("priority", T.IntegerType(), False),        # 0=priority,1=daily,2=bulk
        T.StructField("citation_priority", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

CAPTURE_HISTORY = T.StructType(
    [
        T.StructField("surt", T.StringType(), False),
        T.StructField("datetime", T.StringType(), False),  # 14-digit
        T.StructField("url", T.StringType(), False),       # canonical
        T.StructField("mimetype", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("sha1b32", T.StringType()),
        T.StructField("sha1hex", T.StringType()),
        T.StructField("warc_csize", T.LongType()),
        T.StructField("warc_offset", T.LongType()),
        T.StructField("warc_path", T.StringType()),
        T.StructField("location", T.StringType()),         # redirect target for 3xx
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rule_kind", T.StringType(), False),  # block|wall|cookie|allow
        T.StructField("path_prefix", T.StringType(), False),  # '' = whole host
        T.StructField("crawl_delay_ms", T.IntegerType()),
        T.StructField("host_budget", T.IntegerType()),       # max fetches/round
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("ingest_type", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("hit", T.BooleanType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("terminal_url", T.StringType()),
        T.StructField("terminal_dt", T.StringType()),
        T.StructField("terminal_status_code", T.IntegerType()),
        T.StructField("terminal_sha1hex", T.StringType()),
        T.StructField("round_id", T.IntegerType(), False),
    ]
)

COUNTERS = T.StructType(
    [
        T.StructField("round_id", T.IntegerType(), False),
        T.StructField("counter", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)

# Status slug vocabulary (subset the batch rebuild can reach), matching
# reference slugs in ingest_file.py / ia.py.
STATUS_SUCCESS = "success"
STATUS_NO_CAPTURE = "no-capture"
STATUS_TERMINAL_BAD = "terminal-bad-status"
STATUS_WRONG_MIME = "wrong-mimetype"
STATUS_BLOCKLIST = "skip-url-blocklist"
STATUS_WALL = "skip-wall"
STATUS_COOKIE = "blocked-cookie"
STATUS_REDIRECT = "redirect"          # internal: produced candidate at depth+1
STATUS_LINK_LOOP = "link-loop"
STATUS_MAX_HOPS = "max-hops-exceeded"
# transient server-side failure (reference slug: ingest_file.py /
# ia.py "remote-server-error"): with retries enabled the scheduler
# re-enqueues these with exponential backoff instead of recording a
# terminal result; the slug only reaches url_seen once retries are
# exhausted.
STATUS_TRANSIENT = "remote-server-error"

MAX_HOPS = 8  # reference ingest_file.py:107

# HTTP statuses treated as retryable when run_crawl(max_retries>0):
# rate limiting + upstream/server errors. Everything else non-2xx/3xx
# stays terminal-bad (permanent), matching the reference's split of
# permanent vs transient failures in its ingest workers.
TRANSIENT_HTTP_CODES = (429, 500, 502, 503, 504)

# full status vocabulary (used for Observation-based counters)
ALL_STATUSES = (
    STATUS_SUCCESS,
    STATUS_NO_CAPTURE,
    STATUS_TERMINAL_BAD,
    STATUS_WRONG_MIME,
    STATUS_BLOCKLIST,
    STATUS_WALL,
    STATUS_COOKIE,
    STATUS_REDIRECT,
    STATUS_LINK_LOOP,
    STATUS_MAX_HOPS,
    STATUS_TRANSIENT,
)
