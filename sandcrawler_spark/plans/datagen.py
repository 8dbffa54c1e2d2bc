"""Deterministic synthetic frontier generator (SURVEY §7.1 M0).

Everything is a pure function of (seed, n_urls, n_hosts): numpy PCG64
streams, no wall clock, no OS entropy. Host mass is power-law
(Zipf-ish, s≈1.1) so the top hosts create real skew — the property the
salted politeness window must defuse (north_rule; reference evidence of
domain skew: "Broken domains" reports, sql/monitoring_queries.md:18-40).

Fully numpy-vectorized (no per-row Python), so bench-scale fixtures
(10^7 URLs) generate in seconds; spans are assembled as flat arrays +
offsets via ``pa.ListArray.from_arrays``.

Outputs (parquet, 64k row groups so single files stay splittable):

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

INGEST_TYPES = np.array(["pdf", "pdf", "pdf", "html", "xml"])  # pdf-heavy like reference
LINK_SOURCES = np.array(["doi", "unpaywall", "pmc", "arxiv", "mag"])
_SPAN_KINDS = np.array(["text", "link", "image", "script", "stylesheet", "media"])


def _zipf_host_probs(n_hosts: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def _hex15(ints: np.ndarray) -> np.ndarray:
    """Vectorized 40-char lowercase hex ids from int64s (content-hash
    stand-ins: enough entropy for joins, zero-padded to sha1 width)."""
    out = np.full(len(ints), "0" * 25, dtype="U25")
    return np.char.add(out, _tohex(ints & ((1 << 60) - 1)))


def _tohex(ints: np.ndarray) -> np.ndarray:
    # np.char.mod uses the C-level per-element formatter — far faster
    # than a Python loop, and deterministic
    return np.char.mod("%015x", ints)


def _zfill14(ints: np.ndarray) -> np.ndarray:
    return np.char.zfill(ints.astype("U14"), 14)


def gen_frontier(
    out_dir: str,
    n_urls: int = 10_000,
    n_hosts: int = 100,
    n_seeds: int | None = None,
    seed: int = 42,
    budget_range: tuple[int, int] = (2, 12),
    force_recrawl_pct: float = 0.0,
) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(np.random.PCG64(seed))
    n_seeds = n_seeds if n_seeds is not None else max(1, n_urls // 4)

    hosts = np.char.add(
        np.char.add("h", np.arange(n_hosts).astype("U8")), ".example.org"
    )
    host_idx = rng.choice(n_hosts, size=n_urls, p=_zipf_host_probs(n_hosts))
    path_no = rng.integers(0, max(4, n_urls // n_hosts) * 4, size=n_urls)
    sub = rng.integers(0, 5, size=n_urls)
    # canonical identity dedup on INTEGER keys (np.unique over strings is
    # ~100× slower at 10^7 scale), then build the string forms once;
    # sorting by key ≠ lexicographic URL order, which is irrelevant —
    # only uniqueness and determinism matter
    key = (host_idx.astype(np.int64) * (max(4, n_urls // n_hosts) * 4) + path_no) * 5 + sub
    _, first_idx = np.unique(key, return_index=True)
    first_idx.sort()
    host_idx, path_no, sub = host_idx[first_idx], path_no[first_idx], sub[first_idx]
    paths = np.where(
        sub > 0,
        np.char.add(
            np.char.add("/papers/d", sub.astype("U1")),
            np.char.add(np.char.add("/p", path_no.astype("U10")), ".pdf"),
        ),
        np.char.add(np.char.add("/p", path_no.astype("U10")), ".pdf"),
    )
    canon_urls = np.char.add(np.char.add("http://", hosts[host_idx]), paths)
    n = len(canon_urls)

    # ------------------------------------------------------------- seeds
    seed_pick = rng.choice(n, size=min(n_seeds, n), replace=False)
    kind = rng.integers(0, 5, size=len(seed_pick))
    base = canon_urls[seed_pick]
    tails = np.char.partition(base, "://")[:, 2]  # host+path
    raw = base.astype("U96")
    raw = np.where(kind == 1, np.char.add("HTTP://", np.char.upper(tails)), raw)
    raw = np.where(kind == 2, np.char.add("http://www.", tails), raw)
    # :80 after host (host ends at first '/')
    part = np.char.partition(tails, "/")
    raw = np.where(
        kind == 3,
        np.char.add(
            np.char.add(np.char.add("http://", part[:, 0]), ":80/"), part[:, 2]
        ),
        raw,
    )
    raw = np.where(
        kind == 4,
        np.char.add(np.char.add("http://", part[:, 0]), np.char.add("/x/../", part[:, 2])),
        raw,
    )
    # kind==2 introduces genuinely new hosts (www.-prefixed) — intentional:
    # canonicalization must treat them as distinct identities.
    seeds = pa.table(
        {
            "seq": pa.array(np.arange(len(seed_pick)), pa.int64()),
            "ingest_type": pa.array(INGEST_TYPES[rng.integers(0, len(INGEST_TYPES), len(seed_pick))]),
            "base_url": pa.array(raw),
            "link_source": pa.array(LINK_SOURCES[rng.integers(0, len(LINK_SOURCES), len(seed_pick))]),
            "link_source_id": pa.array(np.char.add("src-", np.arange(len(seed_pick)).astype("U10"))),
            "priority": pa.array(rng.integers(0, 3, len(seed_pick)), pa.int32()),
            "citation_priority": pa.array(np.round(rng.random(len(seed_pick)), 6), pa.float64()),
            "depth": pa.array(np.zeros(len(seed_pick), dtype=np.int32), pa.int32()),
            "force_recrawl": pa.array(rng.random(len(seed_pick)) < force_recrawl_pct),
        }
    )

    # --------------------------------------------------- capture history
    n_caps = rng.choice([0, 1, 2, 3], size=n, p=[0.08, 0.55, 0.27, 0.10])
    cap_url_idx = np.repeat(np.arange(n), n_caps)
    m = len(cap_url_idx)
    statuses = rng.choice([200, 200, 200, 301, 302, 404, 503], size=m).astype(np.int32)
    dt_num = (
        (2015 + rng.integers(0, 8, size=m)) * 10_000_000_000
        + rng.integers(1, 13, size=m) * 100_000_000
        + rng.integers(1, 29, size=m) * 1_000_000
        + rng.integers(0, 24, size=m) * 10_000
        + rng.integers(0, 60, size=m) * 100
        + rng.integers(0, 60, size=m)
    )
    dt14 = _zfill14(dt_num)
    sha_ints = rng.integers(1, 1 << 59, size=m)
    sha1hex = _hex15(sha_ints)
    # sha1b32 column kept CDX-shaped but derived vectorized (32 chars of
    # the hex id); the engine itself only consumes sha1hex
    sha1b32 = np.char.upper(np.char.ljust(_tohex(sha_ints), 32, "q"))
    mimes = np.where(
        statuses >= 300,
        "warc/revisit",
        np.array(["application/pdf", "application/pdf", "text/html"])[
            rng.integers(0, 3, size=m)
        ],
    )
    # ~3% of 200s report no mimetype at all (exercises the NULL-guarded
    # mime gate: 200 + missing mime on a gated type = wrong-mimetype)
    mime_null = (statuses < 300) & (rng.random(m) < 0.03)
    redir_target = (cap_url_idx + 1 + rng.integers(0, 3, size=m)) % n
    loop_mask = rng.random(m) < 0.02
    redir_target = np.where(loop_mask, cap_url_idx, redir_target)
    is_redir = (statuses == 301) | (statuses == 302)
    location = np.where(is_redir, canon_urls[redir_target], None)
    # ~30% of same-host redirects send a ROOT-RELATIVE Location (C11:
    # real servers do; the engine must urljoin against the fetch URL)
    same_host = host_idx[redir_target] == host_idx[cap_url_idx]
    rel_loc = is_redir & same_host & (rng.random(m) < 0.30)
    location = np.where(rel_loc, paths[redir_target], location)
    warc_path = np.where(
        rng.random(m) < 0.9,
        np.char.add("CRAWL-2020/", np.char.add(sha1b32, ".warc.gz")),
        "liveweb-no-slash",  # SPN/liveweb rows: no '/' (persist.py:278 filter)
    )
    # SURT is only needed shape-wise here; keep it cheap + sorted-friendly
    surts = np.char.add("org,example)", paths[cap_url_idx])
    caps = pa.table(
        {
            "surt": pa.array(surts),
            "datetime": pa.array(dt14),
            "url": pa.array(canon_urls[cap_url_idx]),
            "mimetype": pa.array(mimes, mask=mime_null),
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
    # vectorized span assembly: flat arrays + list offsets
    html_idx = np.flatnonzero((statuses == 200) & (mimes == "text/html"))
    nd = len(html_idx)
    span_counts = rng.integers(2, 14, size=nd)
    total = int(span_counts.sum())
    doc_of_span = np.repeat(np.arange(nd), span_counts)
    offs_in_doc = np.concatenate([np.arange(c) for c in span_counts]) if nd else np.array([], dtype=np.int64)
    kind_roll = rng.integers(0, 10, size=total)
    kinds = np.where(
        kind_roll < 4,
        "text",
        np.where(kind_roll < 8, "link", _SPAN_KINDS[2 + (kind_roll % 4)]),
    )
    src_url_idx = cap_url_idx[html_idx][doc_of_span]
    texts = np.where(
        kinds == "text",
        np.char.add(
            np.char.add("paragraph ", offs_in_doc.astype("U4")),
            np.char.add(" of ", np.char.mod("%08x", sha_ints[html_idx][doc_of_span] & 0xFFFFFFFF)),
        ),
        None,
    )
    link_tgt = (src_url_idx + 7 + rng.integers(0, 23, size=total)) % n
    # C11: 40% of hrefs are RELATIVE (root-relative, bare filename,
    # ../-chains, protocol-relative) — the engine must urljoin them
    # against the page URL; every real HTML corpus has these
    link_form = rng.integers(0, 10, size=total)
    link_raw = canon_urls[link_tgt].astype("U160")
    basenames = np.char.rpartition(paths[link_tgt], "/")[:, 2]
    link_raw = np.where(link_form == 6, paths[link_tgt], link_raw)
    link_raw = np.where(link_form == 7, basenames, link_raw)
    link_raw = np.where(link_form == 8, np.char.add("../..", paths[link_tgt]), link_raw)
    link_raw = np.where(
        link_form == 9,
        np.char.add("//", np.char.add(hosts[host_idx[link_tgt]], paths[link_tgt])),
        link_raw,
    )
    media = np.where(
        kinds == "link",
        link_raw,
        np.where(
            kinds == "text",
            None,
            np.char.add(
                np.char.add("http://", hosts[host_idx[src_url_idx]]),
                np.char.add(np.char.add("/static/", kinds.astype("U12")), np.char.add(offs_in_doc.astype("U4"), ".bin")),
            ),
        ),
    )
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    def _flat(a) -> pa.Array:
        arr = pa.array(a)
        if isinstance(arr, pa.ChunkedArray):  # large inputs chunk; structs need flat
            arr = arr.combine_chunks()
        return arr

    struct_arr = pa.StructArray.from_arrays(
        [
            _flat(kinds),
            _flat(texts.tolist()),
            _flat(media.tolist()),
            _flat(offs_in_doc.astype(np.int32)),
        ],
        fields=list(span_t),
    )
    offsets = pa.array(np.concatenate([[0], np.cumsum(span_counts)]).astype(np.int32))
    docs = pa.table(
        {
            "doc_id": pa.array(sha1hex[html_idx]),
            "spans": pa.ListArray.from_arrays(offsets, struct_arr),
        }
    )

    # -------------------------------------------------------------- robots
    hr = np.arange(n_hosts)
    rule_kind = np.where(hr % 17 == 13, "block", np.where(hr % 11 == 7, "cookie", "allow"))
    robots = pa.table(
        {
            "host": pa.array(hosts),
            "rule_kind": pa.array(rule_kind),
            "path_prefix": pa.array(np.where(rule_kind == "cookie", "/papers/d3", "")),
            "crawl_delay_ms": pa.array(rng.integers(100, 2000, n_hosts), pa.int32()),
            "host_budget": pa.array(
                rng.integers(budget_range[0], budget_range[1], n_hosts), pa.int32()
            ),
        }
    )

    paths_out = {}
    for name, tbl in [("seeds", seeds), ("capture_history", caps), ("docs", docs), ("robots", robots)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        # small row groups keep single-file tables splittable: Spark maps
        # file byte-ranges to row groups, so 1 row group = 1 task no
        # matter how many cores
        pq.write_table(tbl, p, row_group_size=65536)
        paths_out[name] = p
    return paths_out
