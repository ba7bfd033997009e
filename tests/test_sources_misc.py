"""S6 HTML scrape + S7 JDBC bounds helpers."""

from __future__ import annotations

from building_coffee_commodity_trading_data_warehouse_spark.sources import html_scrape, jdbc

HTML = """
<html><body>
<a href="/r/1" data-release-date="2023-06-30">June</a>
<a href="/r/2">no date</a>
<a href="/r/3" data-release-date="2023-07-28">July</a>
<a href="/r/4" data-release-date="2023-07-31">July fix</a>
</body></html>
"""


def test_release_dates_in_order():
    assert html_scrape.release_dates(HTML) == ["2023-06-30", "2023-07-28", "2023-07-31"]


def test_report_release_date_first_match():
    assert html_scrape.report_release_date(HTML, "2023-07") == "2023-07-28"
    assert html_scrape.report_release_date(HTML, "2023-08") is None


def test_jdbc_partition_bounds():
    bounds = jdbc.partition_bounds(10, 4)
    assert bounds == [(0, 3), (3, 6), (6, 9), (9, 10)]
    # covers [0, n) with no gaps/overlaps
    flat = [x for lo, hi in bounds for x in range(lo, hi)]
    assert flat == list(range(10))
    assert jdbc.partition_bounds(3, 8) == [(0, 1), (1, 2), (2, 3)]


def test_orc_and_jsonlines_round_trip(spark, sf_dir, tmp_path):
    """Format breadth beyond parquet/CSV: the same table written as ORC
    and as JSON-lines reads back value-identical (ORC is the other
    columnar format Spark ships; JSON-lines is the standard training-
    data interchange shape)."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "n_chars", "text")
        .orderBy("doc_id")
        .limit(100)
    )
    want = [tuple(r) for r in docs.collect()]

    orc_path = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(orc_path)
    got_orc = [
        tuple(r)
        for r in spark.read.orc(orc_path).orderBy("doc_id").collect()
    ]
    assert got_orc == want

    json_path = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(json_path)
    got_json = [
        tuple(r)
        for r in spark.read.schema(docs.schema).json(json_path).orderBy("doc_id").collect()
    ]
    assert got_json == want
