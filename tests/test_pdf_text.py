"""Pure-Python PDF extraction (sources/pdf_text.py) — the S3 codec
slot closed without a third-party toolchain.

Two proof obligations:
  * a REAL text-layer PDF (built here byte-by-byte: Flate-compressed
    content streams, Tm/Td/T*/TJ positioning — the operator surface a
    report generator actually emits) round-trips through
    parse_pdf_report and the full binaryFile→mapInPandas UDTF;
  * the reference's own ``COT Report Sample.pdf`` — which draws every
    glyph as vector outlines, zero /Font objects — must parse cleanly
    to ("", []) with has_text_layer() False, matching what PyPDF2's
    extractText would produce on the same file (reference
    STG.py:233-253 would find no marker pages).
"""

from __future__ import annotations

import zlib

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import pdf_text, report

SAMPLE_PDF = "/root/reference/Data Sample/COT Report Sample.pdf"


def _pdf(pages: list[bytes], compress: bool = True) -> bytes:
    """Assemble a minimal n-page PDF: catalog → pages → page+content
    pairs, one Helvetica font. No xref (parsers that need one can
    rebuild it; ours scans objects linearly, like repair mode)."""
    objs: list[bytes] = []
    page_nums = []
    font_num = 3 + 2 * len(pages)
    kids = []
    for i, content in enumerate(pages):
        pnum = 3 + 2 * i
        cnum = pnum + 1
        page_nums.append(pnum)
        kids.append(f"{pnum} 0 R".encode())
        data = zlib.compress(content) if compress else content
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            b"%d 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>\nendobj\n"
            % (pnum, cnum, font_num)
        )
        objs.append(
            b"%d 0 obj\n<< /Length %d %s>>\nstream\n" % (cnum, len(data), filt)
            + data
            + b"\nendstream\nendobj\n"
        )
    objs.append(
        b"%d 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        % font_num
    )
    head = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [" + b" ".join(kids) + b"] /Count %d >>\nendobj\n" % len(pages)
    )
    return head + b"".join(objs) + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"


def _row(y: int, cells: list[str], x0: int = 40, dx: int = 75) -> bytes:
    return b"".join(
        b"1 0 0 1 %d %d Tm (%s) Tj\n" % (x0 + i * dx, y, c.encode())
        for i, c in enumerate(cells)
    )


HEADERS = [
    "Country",
    "Beginning Stocks",
    "Production",
    "Imports",
    "Total Supply",
    "Exports",
    "Ending Stocks",
]


def _report_pdf() -> bytes:
    cover = b"BT /F1 12 Tf\n1 0 0 1 200 700 Tm (Annual Coffee Report) Tj\nET\n"
    data_page = (
        b"BT /F1 10 Tf\n"
        b"1 0 0 1 40 750 Tm (COFFEE: SUPPLY AND DISTRIBUTION) Tj\n"
        # season emitted through a TJ array with a word-gap kern and a
        # T* newline — the positioning ops real generators use
        b"20 TL\n1 0 0 1 40 730 Tm [(Season:) -400 (2023/24)] TJ\n"
        b"T* (units: thousand bags) Tj\n"
        + _row(690, HEADERS)
        + _row(670, ["Brazil", "100", "3200", "5", "3305", "2400", "905"])
        + _row(650, ["Vietnam", "80", "1700", "2", "1782", "1500", "282"])
        + b"ET\n"
    )
    return _pdf([cover, data_page])


def test_parse_pdf_report_text_layer():
    pdf = _report_pdf()
    assert pdf_text.n_pages(pdf) == 2
    assert pdf_text.has_text_layer(pdf)
    texts = pdf_text.page_texts(pdf)
    assert "SUPPLY AND DISTRIBUTION" in texts[1]
    assert "Season: 2023/24" in texts[1]

    season, tables = report.parse_pdf_report(pdf)
    assert season == "2023/24"
    assert len(tables) == 1
    assert tables[0][0] == HEADERS
    assert tables[0][1][0] == "Brazil" and tables[0][2][0] == "Vietnam"


def test_pdf_report_udtf_end_to_end(spark, tmp_path):
    (tmp_path / "report.pdf").write_bytes(_report_pdf())
    rows = (
        report.extract_report_tables(
            report.read_report_files(spark, str(tmp_path)),
            parser=report.parse_pdf_report,
        )
        .orderBy("country")
        .collect()
    )
    assert [r["country"] for r in rows] == ["Brazil", "Vietnam"]
    assert rows[0]["season"] == "2023/24"
    assert rows[0]["production"] == "3200"
    assert rows[0]["ending_stocks"] == "905"


def test_uncompressed_streams_and_escapes():
    page = (
        b"BT /F1 10 Tf\n"
        b"1 0 0 1 40 700 Tm (paren \\(x\\) oct \\101 cont\\\ninued) Tj\n"
        b"1 0 0 1 40 680 Tm <48692C207065726321> Tj\n"
        b"ET\n"
    )
    pdf = _pdf([page], compress=False)
    text = pdf_text.page_texts(pdf)[0]
    assert "paren (x) oct A continued" in text
    assert "Hi, perc!" in text


def test_reference_sample_pdf_matches_pypdf2_behavior():
    try:
        data = open(SAMPLE_PDF, "rb").read()
    except OSError:
        pytest.skip("reference sample not mounted")
    assert pdf_text.n_pages(data) == 5
    # every glyph is a vector outline (no /Font anywhere): text
    # extraction legitimately yields nothing, like PyPDF2 on this file
    assert not pdf_text.has_text_layer(data)
    assert all(t == "" for t in pdf_text.page_texts(data))
    season, tables = report.parse_pdf_report(data)
    assert (season, tables) == ("", [])
