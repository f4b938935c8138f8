"""Minimal dependency-free .xlsx writer (OOXML SpreadsheetML).

The reference exports query results and metadata workbooks to Excel
(scanner/DGIS_SCAN_2_stable.py:662-676 single-sheet results,
:344-357 and :429-451 multi-sheet discovery/catalog workbooks via
pandas/openpyxl); this environment has no openpyxl, so the sink falls
back to this writer: an xlsx file is just a zip of XML parts, and
writing sheets of inline-string/number cells needs nothing beyond the
stdlib.  Output opens in Excel/LibreOffice/pandas(openpyxl) unchanged.
"""
from __future__ import annotations

import datetime as _dt
import zipfile
from typing import Any, Iterable, Sequence
from xml.sax.saxutils import escape

_SHEET_CT = ("application/vnd.openxmlformats-officedocument"
             ".spreadsheetml.worksheet+xml")

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value: Any) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    if isinstance(value, (_dt.date, _dt.datetime)):
        value = value.isoformat(sep=" " if isinstance(value, _dt.datetime)
                                else "T")
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def _sheet_xml(header: Sequence[str], rows: Iterable[Sequence[Any]]) -> tuple[str, int]:
    """Worksheet XML + data-row count for one sheet."""
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    n = 0
    all_rows = [list(header)]
    all_rows.extend(rows)
    for r, row in enumerate(all_rows, start=1):
        cells = "".join(_cell_xml(f"{_col_ref(c)}{r}", v)
                        for c, v in enumerate(row))
        parts.append(f'<row r="{r}">{cells}</row>')
        n += 1
    parts.append("</sheetData></worksheet>")
    return "".join(parts), n - 1


def write_xlsx_workbook(
        path: str,
        sheets: Sequence[tuple[str, Sequence[str], Iterable[Sequence[Any]]]],
) -> dict[str, int]:
    """Write an N-sheet workbook; ``sheets`` is ``(name, header, rows)``
    per sheet.  Returns ``{sheet_name: data_row_count}``.  Mirrors the
    reference's pd.ExcelWriter multi-sheet workbooks
    (scanner/DGIS_SCAN_2_stable.py:344-357,429-451)."""
    if not sheets:
        raise ValueError("workbook needs at least one sheet")
    names = [name for name, _, _ in sheets]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate sheet names: {names!r}")
    counts: dict[str, int] = {}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            f'ContentType="{_SHEET_CT}"/>'
            for i in range(1, len(sheets) + 1))
        zf.writestr("[Content_Types].xml",
                    _CONTENT_TYPES.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _RELS)
        sheet_tags = "".join(
            f'<sheet name="{escape(name)}" sheetId="{i}" r:id="rId{i}"/>'
            for i, name in enumerate(names, start=1))
        zf.writestr("xl/workbook.xml", _WORKBOOK.format(sheets=sheet_tags))
        rels = "\n".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats'
            f'.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1))
        zf.writestr("xl/_rels/workbook.xml.rels",
                    _WORKBOOK_RELS.format(rels=rels))
        for i, (name, header, rows) in enumerate(sheets, start=1):
            xml, n = _sheet_xml(header, rows)
            zf.writestr(f"xl/worksheets/sheet{i}.xml", xml)
            counts[name] = n
    return counts


def write_xlsx(path: str, header: Sequence[str],
               rows: Iterable[Sequence[Any]],
               sheet_name: str = "Sheet1") -> int:
    """Write one worksheet; returns the number of data rows written.
    Strings go as inline strings (no sharedStrings part needed),
    numbers/bools as native cells."""
    return write_xlsx_workbook(
        path, [(sheet_name, header, rows)])[sheet_name]
