"""Title slug normalization (C7) — the fuzzy-match join key.

Reference semantics (StringUtilities.scala:17-40 +
ScorableFeatures.scala:40-56): NFD/NFKD-normalize, strip accents, strip
punctuation, lowercase, strip whitespace; slugs shorter than 8 chars or
in a junk denylist are rejected (no match key).

Pure form feeds the oracle/tests; Spark form is a pandas UDF
(accent-strip needs unicodedata — no Catalyst builtin).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MIN_SLUG_LEN = 8
# junk titles that must never become match keys (spirit of
# ScorableFeatures.scala's SlugBlacklist)
SLUG_DENYLIST = frozenset(
    {
        "abstract", "editorial", "introduction", "preface", "untitled",
        "bookreviews", "commentary", "inthisissue", "letterstotheeditor",
    }
)

_PUNCT_WS = re.compile(r"[\W_]+", flags=re.UNICODE)


def title_slug(title: str | None) -> str | None:
    """None when the title yields no usable match key."""
    if title is None:
        return None
    norm = unicodedata.normalize("NFKD", title)
    no_accents = "".join(c for c in norm if not unicodedata.combining(c))
    slug = _PUNCT_WS.sub("", no_accents).lower()
    if len(slug) < MIN_SLUG_LEN or slug in SLUG_DENYLIST:
        return None
    return slug


@F.pandas_udf(T.StringType())
def title_slug_udf(titles: pd.Series) -> pd.Series:
    return titles.map(title_slug, na_action="ignore")


def similarity_ratio(a: str, b: str) -> float:
    """Levenshtein similarity ratio in [0,1] (StringUtilities.scala:43-74
    scores ×1000; `1 - dist/max_len` is the same ordering)."""
    if not a or not b:
        return 0.0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return 1.0 - prev[lb] / max(la, lb)
