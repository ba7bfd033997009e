"""Report-document ingestion (the reference's PDF pipeline, E2).

Reference shape (STG.py:233-315): open a multi-page report, find the
pages carrying the data tables by marker text, parse the season token,
extract the tables, keep tables wide enough to be real (>5 columns),
clean, union, stamp lineage.

Spark-first shape: ``spark.read.format("binaryFile")`` scans the
report files as (path, content) rows — executors hold the bytes, the
driver never sees a payload — and a ``mapInPandas`` UDTF runs the
parser per file, streaming one Arrow batch of table rows out per
report (1 input row → N output rows, the reference's only true UDTF).

The container has no PDF codecs (tabula/PyPDF2), so the *parser* for
real PDFs is a documented stub; the fixture parser reads a
deterministic text format with the same structure (pages, marker,
season token, embedded tables) and the Spark-side plumbing — binary
scan, UDTF schema, batching, downstream relational cleanup — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.normalize import HEADER_CANON

PAGE_MARKER = "SUPPLY AND DISTRIBUTION"
SEASON_TOKEN = "Season:"
MIN_TABLE_COLUMNS = 6  # reference keeps tables with >5 columns (STG.py:299)

REPORT_VALUE_COLUMNS = (
    "beginning_stocks",
    "production",
    "imports",
    "total_supply",
    "domestic_use",
    "loss",
    "exports",
    "ending_stocks",
    "area",
    "total_dom_cons",
    "total_distribute",
)

EXTRACT_SCHEMA = (
    "report_path string, season string, country string, "
    + ", ".join(f"{c} string" for c in REPORT_VALUE_COLUMNS)
)


def parse_text_report(content: bytes) -> tuple[str, list[list[list[str]]]]:
    """Fixture parser: pages separated by form-feed; data pages carry
    PAGE_MARKER; season is the 7 chars after SEASON_TOKEN (reference
    parses 'YYYY/YY', STG.py:244,288); tables are CSV blocks between
    <TABLE> and </TABLE> lines, first line = headers."""
    text = content.decode("utf-8", errors="replace")
    season = ""
    tables: list[list[list[str]]] = []
    for page in text.split("\f"):
        if PAGE_MARKER not in page:
            continue
        if not season and SEASON_TOKEN in page:
            after = page.split(SEASON_TOKEN, 1)[1].lstrip()
            season = after[:7]
        block: list[list[str]] | None = None
        for line in page.splitlines():
            s = line.strip()
            if s == "<TABLE>":
                block = []
            elif s == "</TABLE>":
                if block:
                    tables.append(block)
                block = None
            elif block is not None and s:
                import csv as _csv

                block.append([c.strip() for c in next(_csv.reader([s]))])
    return season, tables


def parse_pdf_report(content: bytes) -> tuple[str, list[list[list[str]]]]:
    """Real-PDF parser (the reference's PyPDF2 page scan + tabula
    table extraction, STG.py:233-253,294), reimplemented pure-Python
    in sources/pdf_text.py — no third-party toolchain.

    Mirrors ``find_page_table``/``read_data_report`` semantics: scan
    each page's extracted text for the marker, take the 7-char season
    token, pull positional tables from the marker pages, keep tables
    wide enough to be real. A page with NO text layer extracts as ''
    — exactly what PyPDF2 returns for such pages — so a vector-outline
    report (the reference's own ``COT Report Sample.pdf`` draws every
    glyph as paths; zero /Font objects) legitimately yields
    ``("", [])`` rather than an error; callers can distinguish that
    case via ``pdf_text.has_text_layer``."""
    from . import pdf_text

    # ONE parse (object scan + Flate decompress + text-run interpret);
    # text and tables are projections of the same per-page rows
    rows_by_page = pdf_text.page_rows(content)
    season = ""
    marker_pages = []
    for i, rows in enumerate(rows_by_page):
        text = pdf_text.rows_to_text(rows)
        if PAGE_MARKER in text:
            marker_pages.append(i)
            if not season and SEASON_TOKEN in text:
                season = text.split(SEASON_TOKEN, 1)[1].lstrip()[:7]
    tables: list[list[list[str]]] = []
    for i in marker_pages:
        tables.extend(
            t
            for t in pdf_text.rows_to_tables(rows_by_page[i])
            if t and len(t[0]) >= 2
        )
    return season, tables


def read_report_files(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path)


def extract_report_tables(
    reports: DataFrame,
    parser: Callable[[bytes], tuple[str, list[list[list[str]]]]] | None = None,
) -> DataFrame:
    """The UDTF: one report file in, one row per country/table-row out.
    Header canonicalization happens inside the parse (per-file, pure
    Python, executor-side); numeric scrub/cast stay relational
    downstream (operators/normalize.py).

    Everything the workers execute is a NESTED closure over plain data
    (the canon dict, marker strings): cloudpickle ships it by value, so
    the operator runs even when this package isn't importable on the
    workers (module-level functions would pickle by reference)."""
    canon = dict(HEADER_CANON)
    marker, season_token = PAGE_MARKER, SEASON_TOKEN
    min_cols = MIN_TABLE_COLUMNS
    value_cols = list(REPORT_VALUE_COLUMNS)

    def _canon_header(name: str) -> str:
        # by-value twin of operators.normalize.canonical_header
        key = name.strip().lower()
        if key in canon:
            return canon[key]
        if " " in key:
            return key
        best, hit = "", key
        for raw, target in canon.items():
            if (key.startswith(raw) or raw.startswith(key)) and len(raw) > len(best):
                best, hit = raw, target
        return hit if best else key

    def _default_parser(content: bytes):
        # by-value twin of parse_text_report
        import csv as _csv

        text = content.decode("utf-8", errors="replace")
        season, tables = "", []
        for page in text.split("\f"):
            if marker not in page:
                continue
            if not season and season_token in page:
                season = page.split(season_token, 1)[1].lstrip()[:7]
            block = None
            for line in page.splitlines():
                s = line.strip()
                if s == "<TABLE>":
                    block = []
                elif s == "</TABLE>":
                    if block:
                        tables.append(block)
                    block = None
                elif block is not None and s:
                    block.append([c.strip() for c in next(_csv.reader([s]))])
        return season, tables

    use_parser = parser or _default_parser

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                season, tables = use_parser(bytes(content))
                for table in tables:
                    if not table or len(table[0]) < min_cols:
                        continue
                    headers = [_canon_header(h) for h in table[0]]
                    for cells in table[1:]:
                        rec = dict(zip(headers, cells))
                        out.append(
                            {
                                "report_path": path,
                                "season": season,
                                "country": rec.get("country"),
                                **{c: rec.get(c) for c in value_cols},
                            }
                        )
            yield _pd.DataFrame(
                out, columns=["report_path", "season", "country", *value_cols]
            )

    return reports.select("path", "content").mapInPandas(gen, EXTRACT_SCHEMA)


def with_lineage(
    extracted: DataFrame, snapshot_date: str, report_date: str
) -> DataFrame:
    """P11 — constant lineage columns (STG.py:309-312)."""
    return extracted.withColumns(
        {
            "snapshot_date": F.lit(snapshot_date).cast("date"),
            "report_date": F.lit(report_date).cast("date"),
            "created_date": F.date_format(
                F.current_timestamp(), "yyyy-MM-dd HH:mm:ss"
            ),
        }
    )


def report_pipeline(
    spark: SparkSession,
    path: str,
    snapshot_date: str,
    report_date: str,
    parser: Callable[[bytes], tuple[str, list[list[list[str]]]]] | None = None,
) -> DataFrame:
    """E2 end-to-end: binary scan → UDTF extract → numeric scrub/cast →
    lineage. Natural key (country, report_date) feeds plans/ingest
    merge_into for the idempotent load (E1)."""
    raw = extract_report_tables(read_report_files(spark, path), parser)
    cleaned = raw.withColumns(
        {
            c: F.regexp_replace(F.col(c), ",", "").cast("long")
            for c in REPORT_VALUE_COLUMNS
        }
    )
    return with_lineage(cleaned, snapshot_date, report_date)
