"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing is REAL — schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior — while the codec layer is
STUBBED: the image/audio libraries are not in this container, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True`` is requested, which produces a deterministic stand-in
derived from the blob's hash (stable across runs and engines).

Reference analogue: PDFs interleave extracted text with a binary
``page0_thumbnail`` (pdfextract.py:174-204); blobs are content-addressed
by sha1 (minio.py / persist.py:396-402).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "doc_id string, size_bytes long, md5hex string, sha256hex string, "
    "width int, height int"
)


def decode_image(blob: bytes, fake: bool = False) -> tuple[int, int]:
    """STUB: real decode needs PIL/libvips (absent here). ``fake=True``
    derives deterministic dimensions from the content hash — exercising
    the full distributed plumbing without the codec."""
    if not fake:
        raise NotImplementedError("image codecs not available in this environment")
    h = hashlib.md5(blob).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192  # (width, height)


def binary_meta(df: DataFrame, id_col: str, binary_col: str, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    Partition-parallel ``mapInPandas``; each batch hashes + (stub-)
    decodes vectorized in Python. At 100 TB this is the shape of every
    decode/feature-extract stage: binary in, typed columns out, no
    row-at-a-time serde.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["blob"]]
            dims = [decode_image(b, fake=fake_decode) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "size_bytes": [len(b) for b in blobs],
                    "md5hex": [hashlib.md5(b).hexdigest() for b in blobs],
                    "sha256hex": [hashlib.sha256(b).hexdigest() for b in blobs],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return src.mapInPandas(extract, schema=BINARY_META_SCHEMA)
