"""Scalar function surface (SURVEY.md §2.8, F1-F15) and the header /
table normalization pipeline (P2-P8, reference STG.py:168-229).

The scalar battery is pure ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, no Python in the hot path. The normalization
helpers operate on schemas (driver-side, cheap) and columns (native
expressions), re-expressing the reference's pandas cleanup:

  P2  header canonicalizer: messy source headers → catalog names
      (typo-tolerant map, STG.py:168-186)
  P3  drop auto-generated ``Unnamed*`` columns (STG.py:203)
  P4  all-null column repair from a neighbor column (STG.py:196-202)
  P5  drop all-null columns (STG.py:206)
  P6  drop sparse rows, keep >= thresh non-null (STG.py:207)
  P7  split space-joined columns into N columns (STG.py:210-221)
  P8  scrub thousands separators (STG.py:205)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# P2 — canonical header map, typo-tolerant like the reference's switcher
# (STG.py:168-186 maps 'productio' → 'production', 'total dom.' →
# 'total_dom_cons', ...). Keys are lowercase prefixes.
HEADER_MAP = {
    "beginning": "beginning_stocks",
    "productio": "production",
    "production": "production",
    "imports": "imports",
    "total supply": "total_supply",
    "domestic": "domestic_use",
    "loss": "loss",
    "exports": "exports",
    "ending": "ending_stocks",
    "area": "area",
    "total dom.": "total_dom_cons",
    "total dom": "total_dom_cons",
    "total distribute": "total_distribute",
    "country": "country",
}


def normalize_header(name: str) -> str:
    """One header → catalog name: lowercase, trim, prefix-match the
    canonical map, else snake_case."""
    low = name.strip().lower()
    for prefix, canon in HEADER_MAP.items():
        if low.startswith(prefix):
            return canon
    return re.sub(r"[^a-z0-9]+", "_", low).strip("_")


def normalize_headers(df: DataFrame) -> DataFrame:
    """P2: apply the canonicalizer to every column (schema-only op)."""
    return df.toDF(*[normalize_header(c) for c in df.columns])


def drop_unnamed(df: DataFrame) -> DataFrame:
    """P3: drop pandas-style auto columns (``Unnamed: 3``...)."""
    return df.drop(*[c for c in df.columns if re.match(r"(?i)^unnamed", c.strip())])


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """P5: one aggregate pass counts non-nulls per column; drop the
    empty ones. Single job, no per-column scans."""
    counts = df.agg(
        *[F.count(F.col(f"`{c}`")).alias(c) for c in df.columns]
    ).first()
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*[F.col(f"`{c}`") for c in keep])


def repair_null_column(df: DataFrame, col: str, donor: str) -> DataFrame:
    """P4 (STG.py:196-202): if ``col`` is entirely null, copy the donor
    column into it; otherwise unchanged."""
    nonnull = df.agg(F.count(F.col(f"`{col}`"))).first()[0]
    if nonnull == 0:
        return df.withColumn(col, F.col(f"`{donor}`"))
    return df


def drop_sparse_rows(df: DataFrame, thresh: int = 2) -> DataFrame:
    """P6: keep rows with at least ``thresh`` non-null cells
    (exact twin of df.na.drop(thresh=...))."""
    return df.na.drop(thresh=thresh)


def scrub_thousands(df: DataFrame) -> DataFrame:
    """P8: remove ',' thousands separators from every string column."""
    out = df
    for field in df.schema.fields:
        if field.dataType.simpleString() == "string":
            out = out.withColumn(
                field.name, F.regexp_replace(F.col(f"`{field.name}`"), ",", "")
            )
    return out


def split_space_joined(df: DataFrame, col: str, out_cols: list[str]) -> DataFrame:
    """P7 (STG.py:210-221): one space-joined column → N columns."""
    parts = F.split(F.col(f"`{col}`"), r"\s+")
    df = df.withColumns(
        {name: parts.getItem(i) for i, name in enumerate(out_cols)}
    )
    return df.drop(col)


def clean_report(df: DataFrame) -> DataFrame:
    """The composed P2-P8 pipeline (reference ``convert_dataframe``,
    STG.py:190-229): normalize headers, drop junk columns, scrub
    separators, drop empty columns and sparse rows."""
    out = normalize_headers(df)
    out = drop_unnamed(out)
    out = scrub_thousands(out)
    out = drop_all_null_columns(out)
    out = drop_sparse_rows(out, thresh=2)
    return out
