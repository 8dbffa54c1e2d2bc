"""Differential fuzz for the two new parsing kernels: the Spark
expression is evaluated once over a seeded adversarial corpus and
compared element-wise to a pure-Python model of the reference
contract (ia.py:542-556 dt normalization; fetch_cdx_sha1hex.py:111-122
wayback URL reconstruction)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _dt_model(dt: str | None) -> str | None:
    """Reference contract (ia.py:542-556): trim sub-second ISO-Z to
    seconds+Z, require pre-strip length 14/19/20, strip - : T Z from
    the first 19 chars, require exactly 14 digits."""
    if dt is None:
        return None
    t = dt
    if len(t) > 20 and t.endswith("Z"):
        t = t[:19] + "Z"
    if len(t) not in (14, 19, 20):
        return None
    d = t[:19].translate(str.maketrans("", "", "-:TZ"))
    return d if len(d) == 14 and d.isdigit() else None


def test_normalize_revisit_dt_differential(spark):
    from sandcrawler_spark.sources.cdx import normalize_revisit_dt

    rng = random.Random(1887)
    alphabet = "0123456789-:TZ. abZ"
    corpus: list[str | None] = [
        None, "", "Z", "20200101000000", "2020-01-01T00:00:00",
        "2020-01-01T00:00:00Z", "2020-01-01T00:00:00.173133737Z",
        "2020-01-01 00:00:00.173",  # >20, no trailing Z
        "2020-01-01T00:00:0xZ",     # non-digit after strip
        "20200101000000Z",          # 15 chars → reject (not 14/19/20)
        "2020:01:01T00-00-00",      # separators in odd spots, still 14 digits
        "9" * 14, "9" * 19, "9" * 20, "9" * 21,
    ]
    for _ in range(400):
        n = rng.randint(0, 26)
        corpus.append("".join(rng.choice(alphabet) for _ in range(n)))
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i int, dt string")
    got = {
        r.i: r.norm
        for r in df.select("i", normalize_revisit_dt(F.col("dt")).alias("norm")).collect()
    }
    for i, s in enumerate(corpus):
        assert got[i] == _dt_model(s), (i, s, got[i], _dt_model(s))


def _wayback_model(u: str) -> str | None:
    """fetch_cdx_sha1hex.py:111-122 verbatim semantics."""
    seg = u.split("/")
    if len(seg) < 6:
        return None
    if seg[2] != "web.archive.org" or seg[3] != "web" or not seg[4].isdigit():
        return None
    return "/".join(seg[5:])


def test_wayback_original_url_differential(spark):
    from sandcrawler_spark.operators.imports import cdx_sha1hex_resolve

    rng = random.Random(1888)
    parts = [
        "https:", "http:", "", "web.archive.org", "web", "x.org", "2020",
        "20200101000000", "*", "a", "p?q=1", "http://inner/x", "..",
    ]
    corpus = [
        "https://web.archive.org/web/20200101000000/http://site.org/f.pdf",
        "https://web.archive.org/web/*/http://star",
        "http://plain.example/x",
        "https://web.archive.org/web/2020",  # exactly 5 segments → skip
    ]
    for _ in range(300):
        n = rng.randint(1, 9)
        corpus.append("/".join(rng.choice(parts) for _ in range(n)))
    df = spark.createDataFrame(
        [(str(i), [u]) for i, u in enumerate(corpus)], "sha1hex string, urls array<string>"
    )
    empty_cdx = spark.createDataFrame([], "sha1hex string, url string, dt string")
    empty_api = spark.createDataFrame([], "url string, sha1hex string, dt string")
    out = {
        r.sha1hex: r.status
        for r in cdx_sha1hex_resolve(df, empty_cdx, empty_api).collect()
    }
    for i, u in enumerate(corpus):
        expected = "skip-no-urls" if _wayback_model(u) is None else "fail-not-found"
        assert out[str(i)] == expected, (i, u, out[str(i)], expected)
