"""CDX 14-digit datetime ↔ timestamp (reference misc.py:245-271;
Scala twin CdxBackfillJob.scala:150-154).

Spark form: builtin ``to_timestamp`` / ``date_format`` with the
'yyyyMMddHHmmss' pattern — codegen'd, no UDF.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

CDX_FMT = "yyyyMMddHHmmss"


def parse_cdx_datetime(dt_str: str | None) -> datetime.datetime | None:
    if not dt_str:
        return None
    try:
        return datetime.datetime.strptime(dt_str, "%Y%m%d%H%M%S")
    except ValueError:
        return None


def datetime_to_cdx(dt: datetime.datetime) -> str:
    return "%04d%02d%02d%02d%02d%02d" % (
        dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second,
    )


def cdx_to_timestamp_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # try_to_timestamp ↔ reference returns None on malformed input
    return F.try_to_timestamp(c, F.lit(CDX_FMT))


def timestamp_to_cdx_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, CDX_FMT)
