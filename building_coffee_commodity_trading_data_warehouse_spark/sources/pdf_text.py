"""Pure-Python PDF text + table extraction (stdlib only: re, zlib).

Closes the S3 codec slot (reference ``ETL Process/STG.py:233-253``
PyPDF2 page scan, ``STG.py:294`` tabula table extraction) without any
third-party PDF toolchain: enough of PDF 32000-1 to run the
reference's ``find_page_table`` semantics on real report files.

Scope (deliberately bounded, like PyPDF2's classic ``extractText``):
  * objects located by a linear ``N 0 obj … endobj`` scan — no xref
    table needed (works on linearized and appended files; object
    streams /ObjStm are not unpacked);
  * streams: FlateDecode (zlib) or raw; other filters are skipped;
  * text: BT/ET blocks, Tm/Td/TD/T*/TL text positioning, Tj/TJ/'/"
    show ops, literal + hex strings, simple byte encodings
    (WinAnsi/Latin-1-ish). CID/Type0 composite fonts come out as
    best-effort bytes; no ToUnicode CMap handling.
  * tables: runs grouped into rows by y (± tolerance), cells ordered
    by x — the positional heuristic tabula calls "stream mode".

A page whose content draws glyphs as vector outlines (no /Font, no
text operators — e.g. the reference's own ``COT Report Sample.pdf``)
yields an EMPTY string, exactly as PyPDF2 does; ``has_text_layer``
lets callers distinguish "no tables in text" from "no text at all".

Driver/executor contract: all functions are pure bytes→values and run
executor-side inside the report UDTF (sources/report.py); nothing here
touches Spark.
"""

from __future__ import annotations

import re
import zlib

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _objects(data: bytes) -> dict[int, bytes]:
    """Linear object scan: {object number: body bytes}. Later
    definitions win (incremental updates append re-definitions)."""
    out: dict[int, bytes] = {}
    for m in re.finditer(rb"(?:^|[\r\n>])\s*(\d+)\s+\d+\s+obj\b(.*?)endobj", data, re.S):
        out[int(m.group(1))] = m.group(2)
    return out


def _stream(body: bytes) -> bytes | None:
    """Decode an object's stream payload; None if the object has no
    stream or an unsupported filter."""
    m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.S)
    if not m:
        return None
    raw = m.group(1)
    filt = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", body)
    if filt is None:
        return raw
    if filt.group(1) == b"FlateDecode":
        try:
            return zlib.decompress(raw)
        except zlib.error:
            try:  # tolerate trailing garbage / missing EOD
                return zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
    return None


def _page_objects(objs: dict[int, bytes]) -> list[bytes]:
    """Page bodies in document order: walk /Pages /Kids when present
    (preserves order), else fall back to object-number order."""
    kids_order: list[int] = []

    def walk(num: int, seen: frozenset[int]) -> None:
        body = objs.get(num)
        if body is None or num in seen:
            return
        if re.search(rb"/Type\s*/Pages\b", body):
            kids = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
            if kids:
                for r in re.findall(rb"(\d+)\s+\d+\s+R", kids.group(1)):
                    walk(int(r), seen | {num})
        elif re.search(rb"/Type\s*/Page\b", body):
            kids_order.append(num)

    roots = [
        n
        for n, b in objs.items()
        if re.search(rb"/Type\s*/Pages\b", b) and b"/Parent" not in b
    ]
    for r in roots:
        walk(r, frozenset())
    if not kids_order:
        kids_order = sorted(
            n for n, b in objs.items() if re.search(rb"/Type\s*/Page\b", b)
        )
    return [objs[n] for n in kids_order]


def _page_content(objs: dict[int, bytes], page: bytes) -> bytes:
    m = re.search(rb"/Contents\s*(?:\[(.*?)\]|(\d+)\s+\d+\s+R)", page, re.S)
    if not m:
        return b""
    refs = (
        re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))
        if m.group(1) is not None
        else [m.group(2)]
    )
    parts = []
    for r in refs:
        s = _stream(objs.get(int(r), b""))
        if s:
            parts.append(s)
    return b"\n".join(parts)


def _tokens(s: bytes):
    """Content-stream tokenizer: yields ('num', float) | ('str', bytes)
    | ('name', bytes) | ('op', bytes) | array/dict delimiters."""
    i, n = 0, len(s)
    while i < n:
        c = s[i : i + 1]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == b"%":  # comment to EOL
            j = i
            while j < n and s[j : j + 1] not in b"\r\n":
                j += 1
            i = j
        elif c == b"(":
            depth, j, out = 1, i + 1, bytearray()
            while j < n and depth:
                ch = s[j : j + 1]
                if ch == b"\\":
                    nxt = s[j + 1 : j + 2]
                    if nxt in _ESCAPES:
                        out += _ESCAPES[nxt]
                        j += 2
                    elif nxt in b"01234567" and nxt:
                        # octal escape: only 0-7 start one (\8 or \9 is
                        # NOT octal — isdigit() here crashed on int('',8))
                        k, oc = j + 1, b""
                        while k < n and len(oc) < 3 and s[k : k + 1] in b"01234567":
                            oc += s[k : k + 1]
                            k += 1
                        out.append(int(oc, 8) & 0xFF)
                        j = k
                    elif nxt in b"\r\n" and nxt:
                        j += 2  # line continuation: both chars vanish
                    else:
                        # unknown escape: the spec drops the backslash
                        # and KEEPS the character (PDF 32000 §7.3.4.2)
                        out += nxt
                        j += 2
                elif ch == b"(":
                    depth += 1
                    out += ch
                    j += 1
                elif ch == b")":
                    depth -= 1
                    if depth:
                        out += ch
                    j += 1
                else:
                    out += ch
                    j += 1
            yield ("str", bytes(out))
            i = j
        elif c == b"<" and s[i + 1 : i + 2] == b"<":
            yield ("dict_open", None)
            i += 2
        elif c == b">" and s[i + 1 : i + 2] == b">":
            yield ("dict_close", None)
            i += 2
        elif c == b"<":
            j = s.find(b">", i)
            if j < 0:
                return
            hx = re.sub(rb"\s", b"", s[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            try:
                yield ("str", bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and s[j : j + 1] not in b" \t\r\n\x00()<>[]{}/%":
                j += 1
            yield ("name", s[i + 1 : j])
            i = j
        elif c in b"+-.0123456789":
            j = i + 1
            while j < n and s[j : j + 1] in b"+-.0123456789eE":
                j += 1
            try:
                yield ("num", float(s[i:j]))
            except ValueError:
                pass
            i = j
        else:  # operator: run of regular characters (also ' " *)
            j = i
            while j < n and s[j : j + 1] not in b" \t\r\n\x00()<>[]{}/%":
                j += 1
            if j == i:
                # c itself is a delimiter this branch doesn't handle
                # ('{' / '}' from Type-4 function streams, stray '%'
                # survivors): a zero-width token would loop forever —
                # skip the byte instead.
                i += 1
                continue
            yield ("op", s[i:j])
            i = j


def _decode(b: bytes) -> str:
    """Best-effort byte→str: UTF-16BE when BOM'd, else Latin-1 (a
    superset of WinAnsi for the printable range)."""
    if b[:2] == b"\xfe\xff":
        try:
            return b[2:].decode("utf-16-be", errors="replace")
        except Exception:
            pass
    return b.decode("latin-1", errors="replace")


# kern (thousandths of em) more negative than this inserts a space —
# the classic PyPDF2/pdfminer word-gap heuristic
_TJ_SPACE_KERN = -180.0


def text_runs(content: bytes) -> list[tuple[float, float, str]]:
    """Interpret BT/ET text blocks → [(x, y, text)] in text-space
    coordinates. Positioning handled: Tm, Td, TD, T*, TL. The CTM
    (``cm``) is ignored — rows produced by one generator stay
    y-consistent, which is all the row-grouping needs."""
    runs: list[tuple[float, float, str]] = []
    stack: list = []
    in_text = False
    tlx = tly = 0.0  # line matrix translation
    tx = ty = 0.0  # current text position
    leading = 0.0

    def emit(txt: str) -> None:
        if txt:
            runs.append((tx, ty, txt))

    for kind, val in _tokens(content):
        if kind in ("num", "str", "name", "arr_open", "arr_close",
                    "dict_open", "dict_close"):
            stack.append((kind, val))
            continue
        op = val
        if op == b"BT":
            in_text = True
            tlx = tly = tx = ty = 0.0
            leading = 0.0
        elif op == b"ET":
            in_text = False
        elif not in_text:
            stack.clear()
            continue
        elif op == b"Tm" and len(stack) >= 6:
            nums = [v for k, v in stack[-6:] if k == "num"]
            if len(nums) == 6:
                tlx, tly = nums[4], nums[5]
                tx, ty = tlx, tly
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            nums = [v for k, v in stack[-2:] if k == "num"]
            if len(nums) == 2:
                if op == b"TD":
                    leading = -nums[1]
                tlx += nums[0]
                tly += nums[1]
                tx, ty = tlx, tly
        elif op == b"TL" and stack and stack[-1][0] == "num":
            leading = stack[-1][1]
        elif op == b"T*":
            tly -= leading
            tx, ty = tlx, tly
        elif op == b"Tj" and stack and stack[-1][0] == "str":
            emit(_decode(stack[-1][1]))
        elif op in (b"'", b'"'):
            tly -= leading
            tx, ty = tlx, tly
            strs = [v for k, v in stack if k == "str"]
            if strs:
                emit(_decode(strs[-1]))
        elif op == b"TJ":
            # operands since arr_open: strings show, big negative
            # kerns become spaces
            parts: list[str] = []
            depth_items: list = []
            for k, v in reversed(stack):
                if k == "arr_open":
                    break
                depth_items.append((k, v))
            for k, v in reversed(depth_items):
                if k == "str":
                    parts.append(_decode(v))
                elif k == "num" and v < _TJ_SPACE_KERN:
                    parts.append(" ")
            emit("".join(parts))
        stack.clear()
    return runs


def _rows_from_runs(
    runs: list[tuple[float, float, str]], y_tol: float = 2.0
) -> list[list[tuple[float, str]]]:
    """Group runs into visual rows by y (± y_tol), top-to-bottom
    (descending y — PDF user space points up), cells left-to-right."""
    rows: list[tuple[float, list[tuple[float, str]]]] = []
    for x, y, t in sorted(runs, key=lambda r: (-r[1], r[0])):
        if rows and abs(rows[-1][0] - y) <= y_tol:
            rows[-1][1].append((x, t))
        else:
            rows.append((y, [(x, t)]))
    return [sorted(cells) for _, cells in rows]


def page_rows(
    data: bytes, y_tol: float = 2.0
) -> list[list[list[tuple[float, str]]]]:
    """Parse the document ONCE into per-page visual rows of (x, text)
    cells — the shared substrate behind ``page_texts`` and
    ``page_tables``. Consumers that need both views (the report UDTF's
    marker scan + table pull) should call this and project, instead of
    paying the object scan and Flate decompression twice."""
    objs = _objects(data)
    return [
        _rows_from_runs(text_runs(_page_content(objs, page)), y_tol)
        for page in _page_objects(objs)
    ]


def rows_to_text(rows: list[list[tuple[float, str]]]) -> str:
    """One page's rows → plain text (rows joined by newline, cells by
    space) — the ``PyPDF2.extractText`` analogue."""
    return "\n".join(" ".join(t for _, t in cells) for cells in rows)


def rows_to_tables(
    rows: list[list[tuple[float, str]]], min_cols: int = 2
) -> list[list[list[str]]]:
    """One page's rows → positional tables (tabula "stream mode"
    analogue): a table is a maximal block of consecutive visual rows
    each having ≥ ``min_cols`` cells; each cell is one text run."""
    tables: list[list[list[str]]] = []
    block: list[list[str]] = []
    for cells in rows:
        if len(cells) >= min_cols:
            block.append([t for _, t in cells])
        elif block:
            tables.append(block)
            block = []
    if block:
        tables.append(block)
    return tables


def page_texts(data: bytes) -> list[str]:
    """Per-page plain text. Pages without a text layer come out as ''."""
    return [rows_to_text(rows) for rows in page_rows(data)]


def page_tables(
    data: bytes, min_cols: int = 2, y_tol: float = 2.0
) -> list[list[list[list[str]]]]:
    """Per-page positional tables: pages → tables → rows → cells."""
    return [rows_to_tables(rows, min_cols) for rows in page_rows(data, y_tol)]


def has_text_layer(data: bytes) -> bool:
    """True if any page content stream contains text-show operators.
    False means extraction legitimately yields '' (vector-outline or
    scanned pages — the reference's own sample PDF is one)."""
    objs = _objects(data)
    for page in _page_objects(objs):
        c = _page_content(objs, page)
        if re.search(rb"\)\s*Tj|>\s*Tj|\]\s*TJ|\)\s*'|\)\s*\"", c):
            return True
    return False


def n_pages(data: bytes) -> int:
    return len(_page_objects(_objects(data)))


# --------------------------------------------------------------- writer
# A minimal PDF *writer* — the inverse of the extractor, used to build
# deterministic report fixtures (tests, the e_pdf_report driver gate)
# and as a genuine text-layer PDF emitter for pipeline outputs. Bytes
# are a pure function of the inputs: no timestamps, no ids.


def escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def text_cells_ops(
    y: float, cells: list[str], x0: float = 40.0, dx: float = 75.0
) -> bytes:
    """Content-stream ops drawing one visual row: each cell its own Tm
    + Tj at a fixed column pitch."""
    return b"".join(
        b"1 0 0 1 %.2f %.2f Tm (%s) Tj\n"
        % (x0 + i * dx, y, escape_pdf_string(c).encode("latin-1", "replace"))
        for i, c in enumerate(cells)
    )


def build_pdf(pages: list[bytes], compress: bool = True) -> bytes:
    """Assemble an n-page PDF from raw content streams: catalog →
    pages tree → page+content pairs, one shared Helvetica font. No
    xref table (readers that require one rebuild it in repair mode;
    this module's reader scans objects linearly)."""
    objs: list[bytes] = []
    kids = []
    font_num = 3 + 2 * len(pages)
    for i, content in enumerate(pages):
        pnum = 3 + 2 * i
        cnum = pnum + 1
        kids.append(b"%d 0 R" % pnum)
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
        b"2 0 obj\n<< /Type /Pages /Kids ["
        + b" ".join(kids)
        + b"] /Count %d >>\nendobj\n" % len(pages)
    )
    return head + b"".join(objs) + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
