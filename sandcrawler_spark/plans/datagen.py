"""Deterministic synthetic frontier generator (SURVEY §7.1 M0).

Everything is a pure function of (seed, n_urls, n_hosts): numpy PCG64
streams, no wall clock, no OS entropy. Host mass is power-law
(Zipf-ish, s≈1.1) so the top hosts create real skew — the property the
salted politeness window must defuse (north_rule; reference evidence of
domain skew: "Broken domains" reports, sql/monitoring_queries.md:18-40).

Outputs (parquet via pyarrow, one file per table — small-scale fixture
form of the Iceberg tables):

- ``seeds``       messy raw URLs (case/www/:80/dot-segment variants) to
                  exercise canonicalization, + priority keys
- ``capture_history`` synthetic CDX incl. redirects/loops/revisits
- ``docs``        interleaved (doc_id, spans[]) for fetched HTML pages;
                  link spans drive frontier expansion
- ``robots``      per-host budget + block/wall/cookie path rules
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sandcrawler_spark.functions.hashes import hex_b32
from sandcrawler_spark.functions.urlkeys import canonical_url, surt

INGEST_TYPES = np.array(["pdf", "pdf", "pdf", "html", "xml"])  # pdf-heavy like reference
LINK_SOURCES = np.array(["doi", "unpaywall", "pmc", "arxiv", "mag"])


def _zipf_host_probs(n_hosts: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def _sha1hex_like(rng_ints: np.ndarray) -> np.ndarray:
    """Deterministic 40-char hex ids (content stand-ins)."""
    return np.char.zfill(
        np.vectorize(lambda v: format(v & ((1 << 63) - 1), "x"))(rng_ints), 40
    )


def gen_frontier(
    out_dir: str,
    n_urls: int = 10_000,
    n_hosts: int = 100,
    n_seeds: int | None = None,
    seed: int = 42,
) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(np.random.PCG64(seed))
    n_seeds = n_seeds if n_seeds is not None else max(1, n_urls // 4)

    hosts = np.array([f"h{i}.example.org" for i in range(n_hosts)])
    host_idx = rng.choice(n_hosts, size=n_urls, p=_zipf_host_probs(n_hosts))
    path_no = rng.integers(0, max(4, n_urls // n_hosts) * 4, size=n_urls)
    sub = rng.integers(0, 5, size=n_urls)
    paths = np.array(
        [f"/papers/d{d}/p{p}.pdf" if d else f"/p{p}.pdf" for d, p in zip(sub, path_no)]
    )
    canon_urls = np.array(
        [f"http://{h}{p}" for h, p in zip(hosts[host_idx], paths)]
    )
    # canonical identity dedup: distinct (host,path) pairs only
    canon_urls, first_idx = np.unique(canon_urls, return_index=True)
    host_idx = host_idx[first_idx]
    n = len(canon_urls)

    # ------------------------------------------------------------- seeds
    seed_pick = rng.choice(n, size=min(n_seeds, n), replace=False)
    messy_kind = rng.integers(0, 5, size=len(seed_pick))
    raw_urls = []
    for k, i in zip(messy_kind, seed_pick):
        u = canon_urls[i]
        host = hosts[host_idx[i]]
        path = u.split(host, 1)[1]
        if k == 1:
            raw_urls.append(f"HTTP://{host.upper()}{path}")
        elif k == 2:
            raw_urls.append(f"http://www.{host}{path}")  # NOTE: different canonical host!
        elif k == 3:
            raw_urls.append(f"http://{host}:80{path}")
        elif k == 4:
            raw_urls.append(f"http://{host}/x/..{path}")
        else:
            raw_urls.append(u)
    # messy kind 2 introduces genuinely new hosts (www.-prefixed); that is
    # intentional — canonicalization must treat them as distinct identities.
    seeds = pa.table(
        {
            "seq": pa.array(np.arange(len(seed_pick)), pa.int64()),
            "ingest_type": pa.array(INGEST_TYPES[rng.integers(0, len(INGEST_TYPES), len(seed_pick))]),
            "base_url": pa.array(raw_urls),
            "link_source": pa.array(LINK_SOURCES[rng.integers(0, len(LINK_SOURCES), len(seed_pick))]),
            "link_source_id": pa.array([f"src-{i}" for i in range(len(seed_pick))]),
            "priority": pa.array(rng.integers(0, 3, len(seed_pick)), pa.int32()),
            "citation_priority": pa.array(
                np.round(rng.random(len(seed_pick)), 6), pa.float64()
            ),
            "depth": pa.array(np.zeros(len(seed_pick)), pa.int32()),
        }
    )

    # --------------------------------------------------- capture history
    # per URL: 0 captures (8%), else 1-3; statuses weighted to 200
    n_caps = rng.choice([0, 1, 2, 3], size=n, p=[0.08, 0.55, 0.27, 0.10])
    cap_url_idx = np.repeat(np.arange(n), n_caps)
    m = len(cap_url_idx)
    statuses = rng.choice(
        [200, 200, 200, 301, 302, 404, 503], size=m
    ).astype(np.int32)
    # one deterministic redirect loop pair + chain for loop-detection tests
    years = 2015 + (rng.integers(0, 8, size=m))
    months = rng.integers(1, 13, size=m)
    days = rng.integers(1, 29, size=m)
    hhmmss = rng.integers(0, 86400, size=m)
    dt14 = np.array(
        [
            f"{y:04d}{mo:02d}{d:02d}{s // 3600:02d}{(s % 3600) // 60:02d}{s % 60:02d}"
            for y, mo, d, s in zip(years, months, days, hhmmss)
        ]
    )
    sha_ints = rng.integers(1, 1 << 62, size=m)
    sha1hex = _sha1hex_like(sha_ints)
    sha1b32 = np.array([hex_b32(h) for h in sha1hex])
    mimes = np.where(
        statuses >= 300,
        "warc/revisit",
        rng.choice(["application/pdf", "application/pdf", "text/html"], size=m),
    )
    # redirect targets: next URL index (same-host bias), occasional self-loop
    redir_target = (cap_url_idx + 1 + rng.integers(0, 3, size=m)) % n
    loop_mask = rng.random(m) < 0.02
    redir_target = np.where(loop_mask, cap_url_idx, redir_target)  # self-loop → redirect-loop
    location = np.where(
        (statuses == 301) | (statuses == 302),
        canon_urls[redir_target],
        None,
    )
    warc_path = np.where(
        rng.random(m) < 0.9,
        np.char.add("CRAWL-2020/", np.char.add(sha1b32, ".warc.gz")),
        "liveweb-no-slash",  # SPN/liveweb rows: no '/' (persist.py:278 filter)
    )
    caps = pa.table(
        {
            "surt": pa.array([surt(u) for u in canon_urls[cap_url_idx]]),
            "datetime": pa.array(dt14),
            "url": pa.array(canon_urls[cap_url_idx]),
            "mimetype": pa.array(mimes),
            "status_code": pa.array(statuses, pa.int32()),
            "sha1b32": pa.array(sha1b32),
            "sha1hex": pa.array(sha1hex),
            "warc_csize": pa.array(rng.integers(1_000, 5_000_000, size=m), pa.int64()),
            "warc_offset": pa.array(rng.integers(0, 1 << 40, size=m), pa.int64()),
            "warc_path": pa.array(warc_path),
            "location": pa.array(location),
        }
    )

    # ---------------------------------------------------------------- docs
    # docs exist for sha1s of 200/text-html captures; spans carry outlinks
    html_mask = (statuses == 200) & (mimes == "text/html")
    html_idx = np.flatnonzero(html_mask)
    doc_ids, spans_col = [], []
    for j in html_idx:
        u_i = cap_url_idx[j]
        k = int(rng.integers(2, 14))
        spans = []
        n_links = 0
        for off in range(k):
            kind_roll = int(rng.integers(0, 10))
            if kind_roll < 4:
                spans.append(
                    {"kind": "text", "text": f"paragraph {off} of {sha1hex[j][:8]}", "media_ref": None, "offset": off}
                )
            elif kind_roll < 8 and n_links < 6:
                tgt = int((u_i + 7 + rng.integers(0, 23)) % n)
                spans.append(
                    {"kind": "link", "text": None, "media_ref": canon_urls[tgt], "offset": off}
                )
                n_links += 1
            else:
                kind = ["image", "script", "stylesheet", "media"][int(rng.integers(0, 4))]
                spans.append(
                    {
                        "kind": kind,
                        "text": None,
                        "media_ref": f"http://{hosts[host_idx[u_i]]}/static/{kind}{off}.bin",
                        "offset": off,
                    }
                )
        doc_ids.append(sha1hex[j])
        spans_col.append(spans)
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    docs = pa.table(
        {"doc_id": pa.array(doc_ids), "spans": pa.array(spans_col, pa.list_(span_t))}
    )

    # -------------------------------------------------------------- robots
    rule_kind = np.where(
        np.arange(n_hosts) % 17 == 13,
        "block",
        np.where(np.arange(n_hosts) % 11 == 7, "cookie", "allow"),
    )
    robots = pa.table(
        {
            "host": pa.array(hosts),
            "rule_kind": pa.array(rule_kind),
            "path_prefix": pa.array(np.where(rule_kind == "cookie", "/papers/d3", "")),
            "crawl_delay_ms": pa.array(rng.integers(100, 2000, n_hosts), pa.int32()),
            "host_budget": pa.array(rng.integers(2, 12, n_hosts), pa.int32()),
        }
    )

    paths_out = {}
    for name, tbl in [("seeds", seeds), ("capture_history", caps), ("docs", docs), ("robots", robots)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        # small row groups keep single-file tables splittable: Spark maps
        # file byte-ranges to row groups, so 1 row group = 1 task no
        # matter how many cores — the classic local-bench anti-pattern
        pq.write_table(tbl, p, row_group_size=65536)
        paths_out[name] = p
    return paths_out
