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

# rows of string-assembly per parquet-write chunk; module-level so tests
# can shrink it to exercise the multi-chunk path on small fixtures
GEN_CHUNK_ROWS = 4_000_000


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

    # Strings are the memory hazard at 10^7-10^8 rows (numpy U-dtypes are
    # fixed-width UTF-32: one 90M-span U160 column is ~57 GB), so every
    # string-bearing table below is assembled and written in CHUNKS via
    # ParquetWriter. All RNG draws stay global and in their original
    # order — output is bit-identical to the monolithic path (pytest
    # pins this), only peak memory changes (40M-URL fixture: OOM -> <25 GB).
    CHUNK = GEN_CHUNK_ROWS

    def _chunked(path: str, total_rows: int, build) -> None:
        """build(lo, hi) -> pa.table for row slice [lo, hi)."""
        writer = None
        try:
            for lo in range(0, total_rows, CHUNK) or [0]:
                tbl = build(lo, min(lo + CHUNK, total_rows))
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                # small row groups keep single-file tables splittable:
                # Spark maps byte-ranges to row groups, so 1 row group =
                # 1 task no matter how many cores
                for rg in range(0, tbl.num_rows, 65536):
                    writer.write_table(tbl.slice(rg, 65536))
            if writer is None:  # empty table still needs schema+file
                tbl = build(0, 0)
                writer = pq.ParquetWriter(path, tbl.schema)
                writer.write_table(tbl)
        finally:
            if writer is not None:
                writer.close()

    paths_out = {name: os.path.join(out_dir, f"{name}.parquet")
                 for name in ("seeds", "capture_history", "docs", "robots")}

    # ------------------------------------------------------------- seeds
    seed_pick = rng.choice(n, size=min(n_seeds, n), replace=False)
    kind = rng.integers(0, 5, size=len(seed_pick))
    n_sd = len(seed_pick)
    sd_ingest = INGEST_TYPES[rng.integers(0, len(INGEST_TYPES), n_sd)]
    sd_source = LINK_SOURCES[rng.integers(0, len(LINK_SOURCES), n_sd)]
    sd_priority = rng.integers(0, 3, n_sd)
    sd_citation = np.round(rng.random(n_sd), 6)
    sd_force = rng.random(n_sd) < force_recrawl_pct

    def _seeds_chunk(lo: int, hi: int) -> pa.Table:
        pick, knd = seed_pick[lo:hi], kind[lo:hi]
        base = canon_urls[pick]
        tails = np.char.partition(base, "://")[:, 2]  # host+path
        raw = base.astype("U96")
        raw = np.where(knd == 1, np.char.add("HTTP://", np.char.upper(tails)), raw)
        raw = np.where(knd == 2, np.char.add("http://www.", tails), raw)
        # :80 after host (host ends at first '/')
        part = np.char.partition(tails, "/")
        raw = np.where(
            knd == 3,
            np.char.add(
                np.char.add(np.char.add("http://", part[:, 0]), ":80/"), part[:, 2]
            ),
            raw,
        )
        raw = np.where(
            knd == 4,
            np.char.add(np.char.add("http://", part[:, 0]), np.char.add("/x/../", part[:, 2])),
            raw,
        )
        # knd==2 introduces genuinely new hosts (www.-prefixed) — intentional:
        # canonicalization must treat them as distinct identities.
        return pa.table(
            {
                "seq": pa.array(np.arange(lo, hi), pa.int64()),
                "ingest_type": pa.array(sd_ingest[lo:hi]),
                "base_url": pa.array(raw),
                "link_source": pa.array(sd_source[lo:hi]),
                "link_source_id": pa.array(np.char.add("src-", np.arange(lo, hi).astype("U10"))),
                "priority": pa.array(sd_priority[lo:hi], pa.int32()),
                "citation_priority": pa.array(sd_citation[lo:hi], pa.float64()),
                "depth": pa.array(np.zeros(hi - lo, dtype=np.int32), pa.int32()),
                "force_recrawl": pa.array(sd_force[lo:hi]),
            }
        )

    _chunked(paths_out["seeds"], n_sd, _seeds_chunk)

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
    sha_ints = rng.integers(1, 1 << 59, size=m)
    mime_pick = rng.integers(0, 3, size=m)
    # ~3% of 200s report no mimetype at all (exercises the NULL-guarded
    # mime gate: 200 + missing mime on a gated type = wrong-mimetype)
    mime_null = (statuses < 300) & (rng.random(m) < 0.03)
    redir_target = (cap_url_idx + 1 + rng.integers(0, 3, size=m)) % n
    loop_mask = rng.random(m) < 0.02
    redir_target = np.where(loop_mask, cap_url_idx, redir_target)
    is_redir = (statuses == 301) | (statuses == 302)
    # ~30% of same-host redirects send a ROOT-RELATIVE Location (C11:
    # real servers do; the engine must urljoin against the fetch URL)
    same_host = host_idx[redir_target] == host_idx[cap_url_idx]
    rel_loc = is_redir & same_host & (rng.random(m) < 0.30)
    liveweb = rng.random(m) >= 0.9  # SPN rows: no '/' (persist.py:278 filter)
    warc_csize = rng.integers(1_000, 5_000_000, size=m)
    warc_offset = rng.integers(0, 1 << 40, size=m)

    def _caps_chunk(lo: int, hi: int) -> pa.Table:
        ui = cap_url_idx[lo:hi]
        st = statuses[lo:hi]
        sha1b32 = np.char.upper(np.char.ljust(_tohex(sha_ints[lo:hi]), 32, "q"))
        mimes = np.where(
            st >= 300,
            "warc/revisit",
            np.array(["application/pdf", "application/pdf", "text/html"])[mime_pick[lo:hi]],
        )
        rt = redir_target[lo:hi]
        location = np.where(is_redir[lo:hi], canon_urls[rt], None)
        location = np.where(rel_loc[lo:hi], paths[rt], location)
        warc_path = np.where(
            ~liveweb[lo:hi],
            np.char.add("CRAWL-2020/", np.char.add(sha1b32, ".warc.gz")),
            "liveweb-no-slash",
        )
        return pa.table(
            {
                # SURT only needs shape; keep it cheap + sorted-friendly
                "surt": pa.array(np.char.add("org,example)", paths[ui])),
                "datetime": pa.array(_zfill14(dt_num[lo:hi])),
                "url": pa.array(canon_urls[ui]),
                "mimetype": pa.array(mimes, mask=mime_null[lo:hi]),
                "status_code": pa.array(st, pa.int32()),
                "sha1b32": pa.array(sha1b32),
                "sha1hex": pa.array(_hex15(sha_ints[lo:hi])),
                "warc_csize": pa.array(warc_csize[lo:hi], pa.int64()),
                "warc_offset": pa.array(warc_offset[lo:hi], pa.int64()),
                "warc_path": pa.array(warc_path),
                "location": pa.array(location),
            }
        )

    _chunked(paths_out["capture_history"], m, _caps_chunk)

    # ---------------------------------------------------------------- docs
    # flat span arrays + list offsets; strings built per doc-chunk
    html_idx = np.flatnonzero((statuses == 200) & (mime_pick == 2))
    nd = len(html_idx)
    span_counts = rng.integers(2, 14, size=nd)
    span_start = np.concatenate([[0], np.cumsum(span_counts)])
    total = int(span_start[-1])
    kind_roll = rng.integers(0, 10, size=total)
    link_jump = rng.integers(0, 23, size=total)
    link_form = rng.integers(0, 10, size=total)

    def _docs_chunk(lo: int, hi: int) -> pa.Table:
        s0, s1 = int(span_start[lo]), int(span_start[hi])
        cnt = span_counts[lo:hi]
        doc_of_span = np.repeat(np.arange(hi - lo), cnt)
        # vectorized within-doc offsets (no per-doc Python loop)
        starts = span_start[lo:hi] - s0
        offs_in_doc = (np.arange(s1 - s0) - np.repeat(starts, cnt)).astype(np.int64)
        kr = kind_roll[s0:s1]
        kinds = np.where(
            kr < 4, "text", np.where(kr < 8, "link", _SPAN_KINDS[2 + (kr % 4)])
        )
        hidx = html_idx[lo:hi]
        src_url_idx = cap_url_idx[hidx][doc_of_span]
        texts = np.where(
            kinds == "text",
            np.char.add(
                np.char.add("paragraph ", offs_in_doc.astype("U4")),
                np.char.add(" of ", np.char.mod("%08x", sha_ints[hidx][doc_of_span] & 0xFFFFFFFF)),
            ),
            None,
        )
        link_tgt = (src_url_idx + 7 + link_jump[s0:s1]) % n
        # C11: 40% of hrefs are RELATIVE (root-relative, bare filename,
        # ../-chains, protocol-relative) — the engine must urljoin them
        # against the page URL; every real HTML corpus has these
        lf = link_form[s0:s1]
        link_raw = canon_urls[link_tgt].astype("U160")
        basenames = np.char.rpartition(paths[link_tgt], "/")[:, 2]
        link_raw = np.where(lf == 6, paths[link_tgt], link_raw)
        link_raw = np.where(lf == 7, basenames, link_raw)
        link_raw = np.where(lf == 8, np.char.add("../..", paths[link_tgt]), link_raw)
        link_raw = np.where(
            lf == 9,
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
                    np.char.add(np.char.add("/static/", kinds.astype("U12")),
                                np.char.add(offs_in_doc.astype("U4"), ".bin")),
                ),
            ),
        )
        span_t = pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]
        )

        def _flat(a) -> pa.Array:
            arr = pa.array(a)
            if isinstance(arr, pa.ChunkedArray):  # structs need flat arrays
                arr = arr.combine_chunks()
            return arr

        struct_arr = pa.StructArray.from_arrays(
            [_flat(kinds), _flat(texts.tolist()), _flat(media.tolist()),
             _flat(offs_in_doc.astype(np.int32))],
            fields=list(span_t),
        )
        offsets = pa.array(np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32))
        return pa.table(
            {
                "doc_id": pa.array(_hex15(sha_ints[hidx])),
                "spans": pa.ListArray.from_arrays(offsets, struct_arr),
            }
        )

    # chunk docs by DOC rows (span strings dominate; ~7.5 spans/doc)
    _chunked(paths_out["docs"], nd, _docs_chunk)

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
    pq.write_table(robots, paths_out["robots"], row_group_size=65536)
    return paths_out
