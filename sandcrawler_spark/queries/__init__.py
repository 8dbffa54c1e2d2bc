from sandcrawler_spark.queries.battery import ORACLES, QUERIES, flagship  # noqa: F401
from sandcrawler_spark.queries.training import ORACLES2, QUERIES2

QUERIES = {**QUERIES, **QUERIES2}
ORACLES = {**ORACLES, **ORACLES2}
