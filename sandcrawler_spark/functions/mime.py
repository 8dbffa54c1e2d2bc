"""Mimetype normalization (reference misc.py:142-188; Scala twin
CdxBackfillJob.scala:95-117).

Semantics: lowercase+strip, prefix-match against a canonical list, then
special-cases (application/xml→text/xml, application/x-pdf→
application/pdf, '.pdf'→application/pdf, a download-alias set →
application/octet-stream), else None.

Spark form: a pure ``when()/otherwise()`` chain — Catalyst folds it into
whole-stage codegen; no UDF, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NORMAL_MIME = (
    "application/pdf",
    "application/postscript",
    "text/html",
    "text/xml",
    "application/octet-stream",
)

_OCTET_ALIASES = (
    "application/download",
    "binary/octet-stream",
    "unk",
    "application/x-download",
    "application/octetstream",
    "application/force-download",
    "application/unknown",
)


def normalize_mime(raw: str | None) -> str | None:
    if raw is None:
        return None
    raw = raw.lower().strip()
    for norm in NORMAL_MIME:
        if raw.startswith(norm):
            return norm
    if raw.startswith("application/xml"):
        return "text/xml"
    if raw.startswith("application/x-pdf"):
        return "application/pdf"
    if raw == ".pdf":
        return "application/pdf"
    if raw in _OCTET_ALIASES:
        return "application/octet-stream"
    return None


def normalize_mime_col(col: Column | str) -> Column:
    """Codegen'd column form of :func:`normalize_mime`."""
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    expr = F.lit(None).cast("string")
    # build the chain back-to-front so earlier rules win
    expr = F.when(c.isin(*_OCTET_ALIASES), F.lit("application/octet-stream")).otherwise(expr)
    expr = F.when(c == ".pdf", F.lit("application/pdf")).otherwise(expr)
    expr = F.when(c.startswith("application/x-pdf"), F.lit("application/pdf")).otherwise(expr)
    expr = F.when(c.startswith("application/xml"), F.lit("text/xml")).otherwise(expr)
    for norm in reversed(NORMAL_MIME):
        expr = F.when(c.startswith(norm), F.lit(norm)).otherwise(expr)
    return expr
