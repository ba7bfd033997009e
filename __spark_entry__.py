"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the driver's correctness gate.

Float policy: any aggregate over doubles goes through DECIMAL(38,6)
accumulation on BOTH engines (see functions/exact.py) so value hashes
match bit-for-bit regardless of partitioning or aggregation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from building_coffee_commodity_trading_data_warehouse_spark import catalog
from building_coffee_commodity_trading_data_warehouse_spark.session import tune
from building_coffee_commodity_trading_data_warehouse_spark.operators import windows

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference ODS.py:59-80 re-expressed): W1-W5
    window analytics over the lineitem price series."""
    tune(spark)
    return windows.flagship(catalog.table(spark, SMOKE_SF_DIR, "lineitem"))


# ---------------------------------------------------------------------------
# query registry
# ---------------------------------------------------------------------------

def _q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return windows.flagship(catalog.table(spark, sf_dir, "lineitem"))


_SQL_MA = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) OVER "
    "(PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber "
    "ROWS BETWEEN {n} PRECEDING AND CURRENT ROW) AS DOUBLE) / "
    "COUNT(l_extendedprice) OVER "
    "(PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber "
    "ROWS BETWEEN {n} PRECEDING AND CURRENT ROW)"
)

_FLAGSHIP_SQL = f"""
SELECT
  l_orderkey,
  l_linenumber,
  l_partkey,
  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
  l_extendedprice AS price,
  COALESCE(LEAD(CAST(l_suppkey AS VARCHAR), 1) OVER
    (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber),
    'NaN') AS next_supp,
  LEAD(l_extendedprice, 1) OVER
    (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    AS next_price,
  ROUND(l_extendedprice - LAG(l_extendedprice, 1) OVER
    (PARTITION BY l_shipdate ORDER BY l_partkey DESC, l_orderkey, l_linenumber),
    2) AS spread,
  {_SQL_MA.format(n=200)} AS ma_200,
  {_SQL_MA.format(n=50)} AS ma_50
FROM lineitem
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_windows": _q_flagship,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_windows": _FLAGSHIP_SQL,
    }
