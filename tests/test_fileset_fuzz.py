"""Randomized parity for the fileset URL grammars: the Catalyst
dataverse-persistentId and figshare-path parsers (operators/fileset.py)
against independent Python mirrors of the documented grammar
(fileset_platforms.py:66-128,360-391), over seeded structured variants
— 400 of each, one Spark job per grammar.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from sandcrawler_spark.operators import fileset


def _py_dataverse(pid: str):
    """Mirror of the reference grammar (see fileset.dataverse_pid)."""
    if pid.startswith("doi:10.") or pid.startswith("hdl:"):
        body = pid[4:]
    else:
        return (False, None, None)
    comp = body.split("/")
    if len(comp) < 2:
        return (False, None, None)
    ds = fid = None
    if len(comp[1]) != 6 and len(comp) == 3:
        ds = comp[2]
    elif len(comp[1]) != 6 and len(comp) == 4:
        ds, fid = comp[2], comp[3]
    elif len(comp[1]) == 6 and len(comp) == 2:
        ds = comp[1]
    elif len(comp[1]) == 6 and len(comp) == 3:
        ds, fid = comp[1], comp[2]
    else:
        return (False, None, None)
    if len(ds) != 6:
        return (False, None, None)
    if fid and len(fid) != 6:
        return (False, None, None)
    # the engine normalizes an empty (falsy) file id to NULL
    return (True, ds, fid or None)


def _py_figshare(path: str):
    """Mirror of the reference grammar (see fileset.figshare_ids)."""
    comp = path.split("/")
    if len(comp) < 4 or comp[1] != "articles":
        return (None, None)
    comp = comp[2:]
    if comp[0] in ("dataset", "journal_contribution", "presentation", "poster", "thesis"):
        comp = comp[1:]
    if len(comp) == 3 and comp[1].isdigit() and comp[2].isdigit():
        return (comp[1], comp[2])
    if len(comp) == 2 and comp[1].isdigit():
        return (comp[1], None)
    return (None, None)


def test_dataverse_pid_fuzz_parity(spark):
    rng = random.Random(1234)
    prefixes = ["doi:10.5072", "doi:10.", "doi:1", "hdl:20.500", "hdl:", "ark:x", "doi"]
    seg_pool = ["", "FK2", "AB1234", "CD5678", "XY98765", "Q1", "abcdef", "123456"]
    pids = []
    for _ in range(400):
        parts = [rng.choice(seg_pool) for _ in range(rng.randint(0, 4))]
        pids.append("/".join([rng.choice(prefixes)] + parts))
    urls = [f"https://data.example.org/ds?persistentId={p}" for p in pids]
    df = spark.createDataFrame(list(enumerate(urls)), ["i", "url"])
    got = {
        r["i"]: (r["p"]["valid"], r["p"]["dataset_id"], r["p"]["file_id"])
        for r in df.select("i", fileset.dataverse_pid(F.col("url")).alias("p")).collect()
    }
    for i, pid in enumerate(pids):
        assert got[i] == _py_dataverse(pid), (pid, got[i], _py_dataverse(pid))


def test_figshare_path_fuzz_parity(spark):
    rng = random.Random(5678)
    seg_pool = [
        "articles", "dataset", "poster", "thesis", "name", "a_b", "",
        "123", "8987858", "4", "12x", "0",
    ]
    paths = []
    for _ in range(400):
        n = rng.randint(0, 6)
        paths.append("/" + "/".join(rng.choice(seg_pool) for _ in range(n)))
    urls = [f"https://figshare.com{p}" for p in paths]
    df = spark.createDataFrame(list(enumerate(urls)), ["i", "url"])
    got = {
        r["i"]: (r["p"]["article_id"], r["p"]["version"])
        for r in df.select("i", fileset.figshare_ids(F.col("url")).alias("p")).collect()
    }
    for i, p in enumerate(paths):
        assert got[i] == _py_figshare(p), (p, got[i], _py_figshare(p))
