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

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import pdf_text, report

SAMPLE_PDF = "/root/reference/Data Sample/COT Report Sample.pdf"


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
        + pdf_text.text_cells_ops(690, HEADERS)
        + pdf_text.text_cells_ops(670, ["Brazil", "100", "3200", "5", "3305", "2400", "905"])
        + pdf_text.text_cells_ops(650, ["Vietnam", "80", "1700", "2", "1782", "1500", "282"])
        + b"ET\n"
    )
    return pdf_text.build_pdf([cover, data_page])


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
    pdf = pdf_text.build_pdf([page], compress=False)
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


def test_e_pdf_report_gate_roundtrip(spark, sf_dir):
    """The driver gate: documents head → rendered text-layer PDF →
    binaryFile → UDTF → relational rows, values equal to the source."""
    import __spark_entry__ as entry_mod

    out = {
        r["country"]: r
        for r in entry_mod.queries()["e_pdf_report"](spark, sf_dir).collect()
    }
    docs = (
        entry_mod._t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(10)
        .collect()
    )
    assert len(out) == 10
    for d in docs:
        r = out[f"doc{d['doc_id']}"]
        assert r["season"] == "2023/24"
        assert r["production"] == str(d["n_chars"])
        assert r["imports"] == d["lang"]
        assert r["total_supply"] == d["source"]


def test_invalid_digit_escape_keeps_char():
    """\\8 is not an octal escape: the spec drops the backslash and
    keeps the character (this used to crash the tokenizer)."""
    from building_coffee_commodity_trading_data_warehouse_spark.sources import pdf_text

    toks = list(pdf_text._tokens(rb'(\8bad\q) Tj'))
    assert toks[0] == ("str", b"8badq")


def test_tokenizer_skips_brace_delimiters_without_hanging():
    """'{'/'}' bytes (Type-4 function streams) must be skipped, not
    spun on — the zero-width fallback token used to loop forever."""
    import itertools

    from building_coffee_commodity_trading_data_warehouse_spark.sources.pdf_text import (
        _tokens,
    )

    toks = list(itertools.islice(_tokens(b"BT { (hi) Tj } ET"), 100))
    assert ("op", b"") not in toks
    assert ("op", b"Tj") in toks and ("op", b"ET") in toks
