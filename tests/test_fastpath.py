"""Property test for the canonicalization fast path: whenever the
vectorized detector takes the pass-through branch, the slow-path pure
function must agree that the URL is a fixed point."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sandcrawler_spark.functions.urlkeys import (
    _CANONICAL_FAST_RE,
    _canonicalize_series,
    canonical_url,
)

_FAST = re.compile(_CANONICAL_FAST_RE)


def _fast_match(u: str) -> bool:
    if not _FAST.match(u):
        return False
    if "/./" in u or "/../" in u or u.endswith(("/.", "/..")):
        return False
    return True


url_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-._~!$&'()*+,;=:@/?#%[] \t"
    '"|<>{}\\^`é中',  # chars canonical_url percent-encodes — must NOT fast-match
    max_size=40,
)


@given(
    scheme=st.sampled_from(["http", "https", "ftp", "HTTP", "hTTps"]),
    host=st.from_regex(r"[a-zA-Z0-9.-]{1,30}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080", ":"]),
    path=url_chars,
)
@settings(max_examples=400, deadline=None)
def test_fast_path_implies_fixed_point(scheme, host, port, path):
    u = f"{scheme}://{host}{port}/{path}"
    if _fast_match(u):
        assert canonical_url(u) == u, u


def test_series_parity_on_mixed_batch():
    urls = [
        "http://h.example.org/papers/d1/p2.pdf",     # fast
        "HTTP://H.EXAMPLE.ORG/papers/d1/p2.pdf",     # slow (case)
        "http://h.example.org:80/x",                  # slow (port)
        "http://h.example.org/a/../b",                # slow (dots)
        "http://h.example.org/a%2fb",                 # slow (percent)
        "http://h.example.org/a?q=1",                 # fast w/ query
        None,
        "not a url at all",
    ]
    got = _canonicalize_series(pd.Series(urls)).tolist()
    want = [canonical_url(u) if u is not None else None for u in urls]
    assert got == want
