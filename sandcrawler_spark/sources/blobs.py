"""Binary/zip blob sources (S12, S9-shape).

Reference: ZipfilePusher iterates .pdf members of a zip as blobs
(workers.py:461-497); WARC random-access fetches (ia.py:435-584) are an
external I/O boundary modeled as content-addressed blob lookups.

Spark shape: ``binaryFile`` data source for directories of blobs; zip
members via a mapInPandas expansion (zip decoding is per-partition
imperative work — the sanctioned use of the Python boundary).
"""

from __future__ import annotations

import hashlib
import io
import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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

def blob_path(folder: str, sha1hex: str, extension: str = "", prefix: str = "") -> str:
    """S14 key convention (minio.py:35-49): content-addressed object key
    ``{prefix}{folder}/{sha1[0:2]}/{sha1[2:4]}/{sha1}{extension}``."""
    extension = extension or ""
    prefix = prefix or ""
    assert len(sha1hex) == 40
    return f"{prefix}{folder}/{sha1hex[0:2]}/{sha1hex[2:4]}/{sha1hex}{extension}"


def blob_path_col(folder: str, sha1hex="sha1hex", extension=None, prefix: str = ""):
    """Catalyst-side form of :func:`blob_path` — whole-stage-codegen
    concat, for planning object keys without touching Python."""
    ext = F.coalesce(F.col(extension), F.lit("")) if extension else F.lit("")
    c = F.col(sha1hex)
    return F.concat(
        F.lit(prefix + folder + "/"), c.substr(1, 2), F.lit("/"),
        c.substr(3, 2), F.lit("/"), c, ext,
    )


def content_type_for(extension: str) -> str:
    """Extension → Content-Type, mirroring minio.py:78-86 exactly
    (including the independent .xml check before the png/jpg/txt chain)."""
    content_type = "application/octet-stream"
    if extension.endswith(".xml"):
        content_type = "application/xml"
    if extension.endswith(".png"):
        content_type = "image/png"
    elif extension.endswith(".jpg") or extension.endswith(".jpeg"):
        content_type = "image/jpeg"
    elif extension.endswith(".txt"):
        content_type = "text/plain"
    return content_type


def put_blobs(
    df: DataFrame,
    store_uri: str,
    folder: str,
    bucket: str = "sandcrawler",
    blob_col: str = "blob",
    sha1_col: str = "sha1hex",
    extension_col: str | None = None,
    prefix: str = "",
) -> DataFrame:
    """S14: distributed object-store blob sink (minio.py:51-95).

    Each EXECUTOR writes its own partition's blobs straight to the
    store under the reference's ``folder/aa/bb/<sha1><ext>`` key
    convention — no driver funnel, so PUT bandwidth scales with the
    cluster. A ``file://`` / plain-path ``store_uri`` writes through
    the local filesystem (the sandbox / NFS case and the test path);
    an ``s3://`` / ``minio://`` URI requires the ``minio`` client
    library on the executors (gated import — not baked into this
    container, same jar/client boundary as the Kafka source).

    Rows with a NULL ``sha1_col`` get the sha1 computed from the blob,
    matching ``put_blob``'s "if not supplied it will be calculated".
    Returns a receipts DataFrame (bucket, obj_path, n_bytes,
    content_type) — an action on it performs the writes.
    """
    if store_uri.startswith(("s3://", "minio://")):
        raise NotImplementedError(
            "object-store endpoint requires the 'minio' client on executors "
            "(not in this container); filesystem store_uri exercises the "
            "same plan and key layout"
        )
    base = store_uri[7:] if store_uri.startswith("file://") else store_uri

    cols = [blob_col, sha1_col] + ([extension_col] if extension_col else [])

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, sizes, ctypes = [], [], []
            for row in pdf.itertuples(index=False):
                blob = bytes(getattr(row, blob_col))
                sha1 = getattr(row, sha1_col)
                if sha1 is None or (isinstance(sha1, float) and pd.isna(sha1)):
                    sha1 = hashlib.sha1(blob).hexdigest()
                ext = getattr(row, extension_col) if extension_col else ""
                if not isinstance(ext, str):  # None / NaN under pandas
                    ext = ""
                key = blob_path(folder, sha1, ext, prefix)
                dest = os.path.join(base, bucket, key)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                with open(dest, "wb") as f:
                    f.write(blob)
                paths.append(key)
                sizes.append(len(blob))
                ctypes.append(content_type_for(ext))
            yield pd.DataFrame({
                "bucket": [bucket] * len(paths), "obj_path": paths,
                "n_bytes": sizes, "content_type": ctypes,
            })

    return df.select(*cols).mapInPandas(
        write_partition,
        schema="bucket string, obj_path string, n_bytes long, content_type string",
    )
