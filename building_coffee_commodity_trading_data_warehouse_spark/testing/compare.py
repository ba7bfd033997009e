"""Local DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate: run a Spark query and the
equivalent ANSI SQL in DuckDB over the same parquet tables, then compare
row count, column names, and an order-insensitive canonical value dump.
Used by tests/test_oracle_parity.py so mismatches surface locally before
the driver's CORRECTNESS run.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from ..catalog import TABLES

_EPS = 1e-9


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical float with enough digits to distinguish real drift
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (int, str, bool, bytes)):
        return v
    # Decimal and friends
    return str(v)


def _frame_rows(pdf):
    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_canon(v) for v in t))
    return cols, sorted(rows, key=repr)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= _EPS * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, sql: str, sf_dir: str, exact: bool = True) -> dict:
    """Returns a report dict; report['ok'] means hash-identical
    (exact=True) or within float tolerance (exact=False)."""
    import pandas as pd  # noqa: F401

    spdf = spark_df.toPandas()
    con = duck_connect(sf_dir)
    try:
        ddf = con.execute(sql).fetchdf()
    finally:
        con.close()

    report = {
        "spark_rows": len(spdf),
        "oracle_rows": len(ddf),
        "spark_cols": sorted(spdf.columns),
        "oracle_cols": sorted(ddf.columns),
        "ok": False,
        "detail": "",
    }
    if report["spark_cols"] != report["oracle_cols"]:
        report["detail"] = "column mismatch"
        return report
    if len(spdf) != len(ddf):
        report["detail"] = "row count mismatch"
        return report
    _, s_rows = _frame_rows(spdf)
    _, d_rows = _frame_rows(ddf)
    if s_rows == d_rows:
        report["ok"] = True
        report["detail"] = "exact match"
        return report
    # locate first difference for diagnostics
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            if not exact and _values_equal(a, b):
                continue
            report["detail"] = f"first diff at sorted row {i}: spark={a!r} oracle={b!r}"
            return report
    if not exact:
        report["ok"] = True
        report["detail"] = "match within float tolerance"
        return report
    report["detail"] = "rows differ"
    return report
