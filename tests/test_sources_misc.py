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
