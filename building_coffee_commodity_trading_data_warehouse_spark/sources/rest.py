"""REST/JSON dimension source (S5, STG.py:329-351).

The reference GETs a WHO GHO-style endpoint and tabulates
``payload['value']`` into a country dimension. Spark-first: the fetch
is a driver-side edge concern (one small payload); tabulation is
relational — ``from_json`` with an explicit schema, ``explode`` over
the value array, field projection. For many URLs the fetch itself
moves executor-side (mapInPandas over a URL table); the parse below is
identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VALUE_SCHEMA = (
    "STRUCT<value: ARRAY<STRUCT<"
    "Code: STRING, Title: STRING, Dimension: STRING, "
    "ParentDimension: STRING, ParentCode: STRING, ParentTitle: STRING>>>"
)

DIMENSION_COLUMNS = ("code", "dimension", "parent_dimension", "parent_code", "parent_title")


def fetch_payload(url: str, timeout: int = 30) -> str:
    """Driver-side GET. ``file://`` urls go through stdlib urllib —
    which also makes the whole fetch→tabulate path testable end to end
    without a network (gate e_rest_dimension); http(s) uses requests
    when available, urllib otherwise, so no environment lacks the
    path."""
    if url.startswith("file://"):
        from urllib.request import urlopen

        with urlopen(url) as fh:  # noqa: S310 — file scheme only
            return fh.read().decode("utf-8")
    try:
        import requests
    except ImportError:  # pragma: no cover
        from urllib.request import urlopen

        with urlopen(url, timeout=timeout) as fh:  # noqa: S310
            return fh.read().decode("utf-8")
    return requests.get(url, timeout=timeout).text


def dimension_from_json(spark: SparkSession, payload: str) -> DataFrame:
    """Tabulate one JSON payload into the country-dimension shape
    (code, dimension, parent_*): explicit schema (no inference at the
    catalog edge), explode, snake_case projection."""
    raw = spark.createDataFrame([(payload,)], "payload string")
    return (
        raw.select(F.from_json("payload", VALUE_SCHEMA).alias("j"))
        .select(F.explode("j.value").alias("v"))
        .select(
            F.col("v.Code").alias("code"),
            F.col("v.Dimension").alias("dimension"),
            F.col("v.ParentDimension").alias("parent_dimension"),
            F.col("v.ParentCode").alias("parent_code"),
            F.col("v.ParentTitle").alias("parent_title"),
        )
    )
