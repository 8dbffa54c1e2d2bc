"""Binary/zip blob sources (S12, S9-shape).

Reference: ZipfilePusher iterates .pdf members of a zip as blobs
(workers.py:461-497); WARC random-access fetches (ia.py:435-584) are an
external I/O boundary modeled as content-addressed blob lookups.

Spark shape: ``binaryFile`` data source for directories of blobs; zip
members via a mapInPandas expansion (zip decoding is per-partition
imperative work — the sanctioned use of the Python boundary).
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S9/S12: directory of blobs → (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def explode_zip_members(binary_df: DataFrame, suffix: str = ".pdf") -> DataFrame:
    """S12: one row per zip member with the given suffix.

    Input: binaryFile rows (path, content). Arrow-batched; each zip is
    opened once per batch row, members streamed out.
    """

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, names, blobs = [], [], []
            for zpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(content)))
                except zipfile.BadZipFile:
                    continue  # counter 'bad-zip' in production
                for info in zf.infolist():
                    if not info.filename.lower().endswith(suffix):
                        continue
                    paths.append(zpath)
                    names.append(os.path.basename(info.filename))
                    blobs.append(zf.read(info))
            yield pd.DataFrame({"zip_path": paths, "member": names, "blob": blobs})

    return binary_df.select("path", "content").mapInPandas(
        expand, schema="zip_path string, member string, blob binary"
    )
