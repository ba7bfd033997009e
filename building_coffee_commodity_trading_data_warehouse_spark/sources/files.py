"""JSON-lines and ORC file sources/sinks — the two columnar/semi-
structured formats the engine supports beyond parquet and CSV
(reference scope: the CSV/parquet pipelines of STG.py; these are the
Spark-native additions a lake deployment expects).

Scale notes:
  * JSON-lines reads take an EXPLICIT schema — schema inference scans
    the data twice and silently unions drifting types; at 100 TB that
    is both a full extra pass and a correctness hazard.
  * ORC gets the same predicate-pushdown / column-pruning treatment as
    parquet from the DataSource V2 path; writes go through the same
    partitioned-layout conventions as plans/ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line (the interchange format of every
    LLM-data toolchain); compression stays off so downstream line
    splitters parallelize by byte range."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-first JSON-lines scan. ``schema`` is the DDL string;
    malformed lines surface in the PERMISSIVE default's
    _corrupt_record column rather than failing the job."""
    return spark.read.schema(schema).json(path)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution scan: ``mergeSchema=true`` unions the footer
    schemas of every file under ``path`` — batches written before a
    column existed read back as NULL in that column, so a landing zone
    can add columns without rewriting history.

    Scale note: schema merging reads every file FOOTER (not the data)
    on the driver; at 100 TB of small files pin the merged schema in a
    catalog instead and pass it explicitly — this helper is for the
    landing-zone case where batches are few and drift is expected."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (built-in since Spark 4.0 — the spark-xml package
    merged upstream): one ``row_tag`` element per row. XML is the
    interchange format regulators and legacy trade systems still emit;
    a commodity warehouse ingests it or loses the feed."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession, path: str, schema: str, row_tag: str = "row"
) -> DataFrame:
    """Schema-first XML scan. Like read_jsonl, an EXPLICIT schema —
    XML inference reads the files twice and widens drifting numeric
    types silently; at 100 TB that is an extra full pass and a
    correctness hazard."""
    return (
        spark.read.schema(schema).format("xml").option("rowTag", row_tag).load(path)
    )
