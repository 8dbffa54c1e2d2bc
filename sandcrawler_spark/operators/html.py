"""HTML → interleaved span rows: the producer of the engine's core
``(doc_id, spans[])`` table (input_hint schema).

Reference semantics (``python/sandcrawler/html_metadata.py``):

- ``html_extract_resources`` (:1034-1077): collect replay-critical
  resource refs with the selector set {script[src],
  link[rel=stylesheet][href], img[src], audio[src], video[src],
  source[src], track[src], iframe[src], embed[src]}, resolve each
  against the page URL (urljoin), exact-dedup. The adblock filter hook
  exists but is a pass-through here (braveblock is not in this
  environment — clearly stubbed, injection point kept).
- anchors (``<a href>``) become ``link`` spans — the outlink feed the
  frontier expands on.
- visible text chunks become ``text`` spans.

Spans carry a document-order ``offset`` so the per-row invariant —
span-sequence equality (kind, text, media_ref, order) — is checkable
downstream. The parser is Python stdlib ``html.parser`` (selectolax is
not in this environment); the Spark form is an Arrow-batched pandas UDF
returning ``array<struct<kind,text,media_ref,offset>>``.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tag → (attr, span kind); the html_extract_resources selector set
_RESOURCE_TAGS = {
    "script": ("src", "script"),
    "img": ("src", "image"),
    "audio": ("src", "audio"),
    "video": ("src", "media"),
    "source": ("src", "media"),
    "track": ("src", "media"),
    "embed": ("src", "media"),
    "iframe": ("src", "subdocument"),
}
_SKIP_TEXT_IN = {"script", "style"}

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)


class _SpanParser(HTMLParser):
    def __init__(self, base_url: str | None) -> None:
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.spans: list[tuple[str, str | None, str | None]] = []
        self.seen_resources: set[tuple[str, str]] = set()
        self._stack: list[str] = []

    def _resource(self, kind: str, ref: str | None) -> None:
        if not ref:
            return
        url = urljoin(self.base, ref) if self.base else ref
        key = (kind, url)
        if key in self.seen_resources:  # first-occurrence exact dedup
            return
        self.seen_resources.add(key)
        self.spans.append((kind, None, url))

    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        self._stack.append(tag)
        if tag == "a":
            if a.get("href"):
                # links are NOT deduped: each anchor is an outlink span
                self.spans.append(("link", None, a["href"]))
        elif tag == "link":
            if (a.get("rel") or "").lower() == "stylesheet":
                self._resource("stylesheet", a.get("href"))
        elif tag in _RESOURCE_TAGS:
            attr, kind = _RESOURCE_TAGS[tag]
            self._resource(kind, a.get(attr))

    def handle_endtag(self, tag: str) -> None:
        while self._stack and self._stack.pop() != tag:
            pass

    def handle_data(self, data: str) -> None:
        if self._stack and self._stack[-1] in _SKIP_TEXT_IN:
            return
        chunk = " ".join(data.split())
        if chunk:
            self.spans.append(("text", chunk, None))


def extract_spans(html: str | None, base_url: str | None = None) -> list[dict]:
    """Pure kernel: html → ordered span dicts (kind, text, media_ref,
    offset). Feeds the oracle/tests; the UDF wraps it."""
    if html is None:
        return []
    p = _SpanParser(base_url)
    try:
        p.feed(html)
        p.close()
    except Exception:
        return []  # malformed HTML → no spans (counter 'bad-html' in prod)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(p.spans)
    ]


@F.pandas_udf(SPAN_TYPE)
def extract_spans_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None
            if h is None
            else [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in extract_spans(h, b)
            ]
            for h, b in zip(html, base_url)
        ]
    )


def html_to_spans(
    df: DataFrame, id_col: str, html_col: str, url_col: str
) -> DataFrame:
    """(doc_id, spans[]) — the interleaved-documents producer. Arrow
    batches carry whole HTML strings; parsing is per-row Python by
    necessity (tree state machine), scaled by partition parallelism."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        extract_spans_udf(F.col(html_col), F.col(url_col)).alias("spans"),
    )
