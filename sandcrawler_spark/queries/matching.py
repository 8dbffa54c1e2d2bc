"""Fuzzy bibliographic match benchmark (reference
``MatchBenchmarkJob.scala`` + ``match_test_data/RESULTS.txt``): the one
end-to-end match-ACCURACY measurement the reference ships.

Pipeline (Scorable.scala:17-31, BibjsonScorable.scala:26-50):

    bibjson lines → (slug, features)      slug = ScorableFeatures.toSlug
      → slug equi-join left × right       (the fuzzy-match key, J5)
      → score = similarity(title1, title2) × 1000   (C8 Levenshtein)

The reference scored 76.27% of 944 common-sha docs matched
(match_test_data/RESULTS.txt:2-16); the pytest golden pins our
reproduction of that number against the same public corpus, read from
the reference checkout at test time.

Slug semantics here are the SCALDING ones (ScorableFeatures.scala:40-56
— NFD accent strip, the explicit \\p{Punct}+extras set, whitespace
removal, ≥8 chars, resource denylist), which differ in small ways from
the engine's C7 ``title_slug`` ([\\W_]+ strip): both are kept because
the battery oracles pin C7 while this module pins the benchmark.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sandcrawler_spark.functions.slug import MIN_SLUG_LEN, SLUG_DENYLIST

# Java \p{Punct} (ASCII punctuation) + the extra unicode marks listed in
# StringUtilities.scala:40 — semantic pin, cited.
_PUNCT_CLASS = (
    "!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~"
    "’·“”‘’«»「」¿–±§ʿ"
)
_PUNCT_RE = re.compile(f"[{_PUNCT_CLASS}]")
_ACCENT_MAP = {"Ł": "L", "ł": "l", "Ø": "O", "ø": "o"}


def remove_accents(s: str) -> str:
    """StringUtilities.removeAccents (scala:17-35): NFD + strip combining
    marks, with the Ł/ł/Ø/ø manual mappings."""
    s = "".join(_ACCENT_MAP.get(c, c) for c in s)
    norm = unicodedata.normalize("NFD", s)
    return "".join(c for c in norm if not unicodedata.combining(c))


def remove_punctuation(s: str) -> str:
    return _PUNCT_RE.sub("", s)


def scorable_slug(title: str | None, denylist: frozenset[str] | None = None) -> str | None:
    """ScorableFeatures.toSlug (scala:40-56): accent strip → lowercase →
    punctuation strip → whitespace removal; reject short/denylisted."""
    if title is None:
        return None
    deny = denylist if denylist is not None else SLUG_DENYLIST
    # Java-regex \s (ASCII-only) — a NBSP etc. SURVIVES into the scala
    # slug, so it must survive here too (measured: unicode \s inflates
    # the benchmark join by ~1.5%)
    slug = re.sub(
        r"[ \t\n\x0b\f\r]", "", remove_punctuation(remove_accents(title).lower())
    )
    if not slug or len(slug) < MIN_SLUG_LEN or slug in deny:
        return None
    return slug


def clean_for_similarity(s: str) -> str:
    """The normalization similarity() applies to both sides
    (StringUtilities.scala:43-45): remove punctuation, then accents
    (input already lowercased by the caller, Scorable.scala:91)."""
    return remove_accents(remove_punctuation(s))


def _slug_udf(denylist: frozenset[str]):
    @F.pandas_udf(T.StringType())
    def slug_udf(titles: pd.Series) -> pd.Series:
        return titles.map(lambda t: scorable_slug(t, denylist), na_action="ignore")

    return slug_udf


@F.pandas_udf(T.StringType())
def _clean_udf(titles: pd.Series) -> pd.Series:
    return titles.map(
        lambda t: clean_for_similarity(t.lower()), na_action="ignore"
    )


_BIBJSON_SCHEMA = (
    "title string, doi string, sha string, authors array<string>, year string"
)


def load_bibjson(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(_BIBJSON_SCHEMA).json(path)


def _prep_side(df: DataFrame, tag: str, deny: frozenset[str]) -> DataFrame:
    """(title, doi, sha[, authors]) -> (slug, ctitle<tag>, doi<tag>,
    sha<tag>[, authors<tag>]) — the per-side half of the benchmark."""
    slug_udf = _slug_udf(deny)
    cols = [
        slug_udf("title").alias("slug"),
        _clean_udf("title").alias(f"ctitle{tag}"),
        F.col("doi").alias(f"doi{tag}"),
        F.col("sha").alias(f"sha{tag}"),
    ]
    if "authors" in df.columns:
        cols.append(F.col("authors").alias(f"authors{tag}"))
    return (
        df.filter(F.col("title").isNotNull())
        .select(*cols)
        .filter(F.col("slug").isNotNull())
    )


def _score_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    longer = F.greatest(F.length("ctitle1"), F.length("ctitle2"))
    score = F.when(longer == 0, F.lit(1000)).otherwise(
        (
            (longer - F.levenshtein("ctitle1", "ctitle2"))
            / longer.cast("double")
            * 1000
        ).cast("int")
    )
    return left.join(right, "slug").withColumn("score", score)


def match_benchmark(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    denylist: frozenset[str] | None = None,
) -> DataFrame:
    """(slug, score, doi1, sha1, doi2, sha2) for every slug-join pair —
    the MatchBenchmarkJob output shape. Score is the Levenshtein
    similarity ×1000 over cleaned titles; the distance itself runs on
    the JVM (builtin ``levenshtein``), only the unicode cleanup is a
    pandas UDF."""
    deny = denylist if denylist is not None else SLUG_DENYLIST
    left = _prep_side(load_bibjson(spark, left_path).drop("authors"), "1", deny)
    right = _prep_side(load_bibjson(spark, right_path).drop("authors"), "2", deny)
    return _score_pairs(left, right).select(
        "slug", "score", "doi1", "sha1", "doi2", "sha2"
    )


def match_benchmark_html(
    spark: SparkSession,
    html_df: DataFrame,
    right_path: str,
    denylist: frozenset[str] | None = None,
    check_author_overlap: bool = False,
) -> DataFrame:
    """The HTML-input benchmark variant: the left side is raw HTML
    pages — ``(doc_id, url, html)`` — run through the biblio extractor
    (operators.biblio ⇔ html_metadata.py:886-955), so the chain the
    reference runs as separate stages (HTML → biblio → slug join →
    author check, C9/J5/W4) executes end-to-end in one plan.

    ``check_author_overlap=True`` appends the C9 filter: the extracted
    page authors must pass ``check_authors`` against the right-side
    bibjson authors (filter_scored_matches.py:38-58 semantics)."""
    from sandcrawler_spark.operators.biblio import html_to_biblio
    from sandcrawler_spark.operators.text import check_authors

    deny = denylist if denylist is not None else SLUG_DENYLIST
    bib = html_to_biblio(html_df, "doc_id", "html", "url").select(
        F.col("biblio.title").alias("title"),
        F.col("biblio.doi").alias("doi"),
        F.col("doc_id").cast("string").alias("sha"),
        F.col("biblio.contrib_names").alias("authors"),
    )
    left = _prep_side(bib, "1", deny)
    right = _prep_side(load_bibjson(spark, right_path), "2", deny)
    pairs = _score_pairs(left, right)

    if check_author_overlap:
        @F.pandas_udf(T.BooleanType())
        def authors_ok(l: pd.Series, r: pd.Series) -> pd.Series:
            def aslist(v):  # arrow hands arrays back as numpy, not list
                return list(v) if v is not None else []

            return pd.Series(
                [check_authors(aslist(a), aslist(b)) for a, b in zip(l, r)]
            )

        pairs = pairs.filter(authors_ok("authors2", "authors1"))

    return pairs.select("slug", "score", "doi1", "sha1", "doi2", "sha2")


def match_stats(pairs: DataFrame, n_common_sha: int) -> dict:
    """RESULTS.txt bookkeeping: pair count, distinct matched sha, and
    percentage on the 'out of N common-sha lines' basis."""
    n_pairs = pairs.count()
    n_same_sha = pairs.filter(F.col("sha1") == F.col("sha2")).count()
    return {
        "n_pairs": n_pairs,
        "n_same_sha_pairs": n_same_sha,
        "pct_of_common": round(100.0 * n_pairs / n_common_sha, 2),
    }
