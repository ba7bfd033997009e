"""Messy-source normalization: the reference's PDF/CSV table cleanup
re-expressed as composable DataFrame transforms.

Reference semantics (capability parity, not translation):
  * header canonicalization via a typo-tolerant rename map
    (``convert_columns``, STG.py:168-186) — P2
  * drop auto-generated ``Unnamed*`` columns (STG.py:203) — P3
  * all-null column repair from a neighbor column (STG.py:196-202) — P4
  * drop all-null columns + the header-echo data row (STG.py:206) — P5
  * drop sparse rows, keep >= ``thresh`` non-null (STG.py:207) — P6
  * split space-joined headers into N columns (STG.py:210-221) — P7
  * scrub thousands separators everywhere (STG.py:205) — P8

Scale posture: every transform is a pure projection/filter except the
null-profile (one aggregate producing a single row to the driver —
schema-sized, independent of row count). Nothing else leaves the
executors; all of it runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical header map for the USDA-report shape (STG.py:168-185);
# keys are matched case-insensitively and typo-tolerantly (prefix):
# 'productio' still lands on 'production'.
HEADER_CANON = {
    "beginning": "beginning_stocks",
    "beginning stocks": "beginning_stocks",
    "production": "production",
    "imports": "imports",
    "total supply": "total_supply",
    "domestic use": "domestic_use",
    "loss": "loss",
    "exports": "exports",
    "ending stocks": "ending_stocks",
    "area": "area",
    "total dom.": "total_dom_cons",
    "total dom. cons.": "total_dom_cons",
    "total distribute": "total_distribute",
    "country": "country",
}


def canonical_header(name: str, canon: dict[str, str] | None = None) -> str:
    """Map one raw header to its canonical name: exact (case-folded)
    first, then longest prefix-in-either-direction match so truncated
    headers ('productio') and suffixed ones ('production 1000 ha')
    resolve; unknown headers pass through snake_cased."""
    canon = HEADER_CANON if canon is None else canon
    key = name.strip().lower()
    if key in canon:
        return canon[key]
    if " " in key:
        # unknown space-joined header ('imports exports'): keep it
        # verbatim so split_joined_columns can expand it (P7)
        return key
    best = ""
    for raw, target in canon.items():
        if (key.startswith(raw) or raw.startswith(key)) and len(raw) > len(best):
            best, hit = raw, target
    if best:
        return hit
    return key


def normalize_headers(df: DataFrame, canon: dict[str, str] | None = None) -> DataFrame:
    """P2 — rename every column through the canonical map (schema-level,
    no data movement)."""
    return df.toDF(*[canonical_header(c, canon) for c in df.columns])


def drop_unnamed(df: DataFrame) -> DataFrame:
    """P3 — drop pandas-style auto headers (``Unnamed: 3`` etc.)."""
    return df.drop(*[c for c in df.columns if c.lower().startswith("unnamed")])


def scrub_thousands(df: DataFrame) -> DataFrame:
    """P8 — remove ',' thousands separators from every string column."""
    return df.withColumns(
        {
            c: F.regexp_replace(F.col(c), ",", "")
            for c, t in df.dtypes
            if t == "string"
        }
    )


def split_joined_columns(df: DataFrame) -> DataFrame:
    """P7 — a header containing spaces ('imports exports') holds
    space-joined values; split it into one column per token."""
    out = df
    for c in df.columns:
        parts = c.split(" ")
        if len(parts) < 2 or c.lower() in HEADER_CANON:
            continue
        toks = F.split(F.col(c), " ")
        out = out.withColumns(
            {canonical_header(p): toks.getItem(i) for i, p in enumerate(parts)}
        ).drop(c)
    return out


def null_profile(df: DataFrame) -> dict[str, int]:
    """Non-null count per column in ONE pass; the only driver-visible
    result is one row of schema width."""
    row = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    return {} if row is None else row.asDict()


def _donor_for(cols: list[str], i: int) -> str | None:
    """Neighbor that repairs an all-null column: the left neighbor when
    it is ``country``, else the right neighbor (STG.py:196-202)."""
    if i > 0 and cols[i - 1].lower() == "country":
        return cols[i - 1]
    if i + 1 < len(cols):
        return cols[i + 1]
    return None


def repair_null_columns(df: DataFrame, profile: dict[str, int] | None = None) -> DataFrame:
    """P4 — an entirely-null column inherits its neighbor's values."""
    profile = null_profile(df) if profile is None else profile
    cols = df.columns
    out = df
    for i, c in enumerate(cols):
        donor = _donor_for(cols, i)
        if profile.get(c, 0) == 0 and donor is not None:
            out = out.withColumn(c, F.col(donor))
    return out


def drop_all_null_columns(df: DataFrame, profile: dict[str, int] | None = None) -> DataFrame:
    """P5a — prune columns with zero non-null values. ``profile`` must
    describe the CURRENT df: a column just repaired by
    ``repair_null_columns`` is no longer all-null and must survive, so
    the composition computes still-dead columns donor-aware instead of
    reusing the pre-repair profile blindly."""
    profile = null_profile(df) if profile is None else profile
    dead = [c for c in df.columns if profile.get(c, 0) == 0]
    return df.drop(*dead) if dead else df


def _still_dead(cols: list[str], profile: dict[str, int]) -> list[str]:
    """Columns that remain all-null even after P4 repair: profile says
    zero AND the donor (if any) is also zero."""
    dead = []
    for i, c in enumerate(cols):
        if profile.get(c, 0) != 0:
            continue
        donor = _donor_for(cols, i)
        if donor is None or profile.get(donor, 0) == 0:
            dead.append(c)
    return dead


def drop_header_echo(df: DataFrame, first_col: str | None = None) -> DataFrame:
    """P5b — extracted tables repeat the header as the first data row;
    drop rows whose first column equals its own column name (a
    predicate, not a positional ``iloc`` — order-independent and
    distributed-safe)."""
    c = first_col or df.columns[0]
    return df.filter(~(F.lower(F.col(c)) == c.lower()) | F.col(c).isNull())


def drop_sparse_rows(df: DataFrame, thresh: int = 2) -> DataFrame:
    """P6 — keep rows with at least ``thresh`` non-null values
    (exact ``df.na.drop(thresh=)`` built-in)."""
    return df.na.drop(thresh=thresh)


def sentinel_to_null(df: DataFrame, sentinels: tuple[str, ...] = ("null", "NaN")) -> DataFrame:
    """CSV sentinel handling (KC=F.csv 'null' cells; 'NaN' coalesce
    targets, ODS.py:62): map sentinel strings to real NULLs on every
    string column."""
    conds = {}
    for c, t in df.dtypes:
        if t != "string":
            continue
        col = F.col(c)
        for s in sentinels:
            col = F.nullif(col, F.lit(s))
        conds[c] = col
    return df.withColumns(conds) if conds else df


def clean_extracted_table(df: DataFrame, thresh: int = 2) -> DataFrame:
    """``convert_dataframe`` (STG.py:190-229) as one composition:
    P2 → P3 → P8 → P7 → (single null-profile) P4 → P5 → P6."""
    out = (
        df.transform(normalize_headers)
        .transform(drop_unnamed)
        .transform(scrub_thousands)
        .transform(split_joined_columns)
    )
    profile = null_profile(out)
    out = repair_null_columns(out, profile)
    dead = _still_dead(out.columns, profile)
    if dead:
        out = out.drop(*dead)
    out = drop_header_echo(out)
    return drop_sparse_rows(out, thresh)
