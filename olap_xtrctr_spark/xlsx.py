"""Minimal dependency-free .xlsx writer (OOXML SpreadsheetML).

The reference exports query results to Excel
(scanner/DGIS_SCAN_2_stable.py:662-676 via pandas/openpyxl); this
environment has no openpyxl, so the sink falls back to this writer:
an xlsx file is just a zip of five XML parts, and writing one sheet of
inline-string/number cells needs nothing beyond the stdlib.  Output
opens in Excel/LibreOffice/pandas(openpyxl) unchanged.
"""
from __future__ import annotations

import datetime as _dt
import zipfile
from typing import Any, Iterable, Sequence
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
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


def write_xlsx(path: str, header: Sequence[str],
               rows: Iterable[Sequence[Any]],
               sheet_name: str = "Sheet1") -> int:
    """Write one worksheet; returns the number of data rows written.
    Strings go as inline strings (no sharedStrings part needed),
    numbers/bools as native cells."""
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("xl/workbook.xml",
                    _WORKBOOK.format(name=escape(sheet_name)))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<worksheet xmlns="http://schemas.openxmlformats.org/'
                 'spreadsheetml/2006/main"><sheetData>']
        all_rows = [list(header)]
        all_rows.extend(rows)
        for r, row in enumerate(all_rows, start=1):
            cells = "".join(_cell_xml(f"{_col_ref(c)}{r}", v)
                            for c, v in enumerate(row))
            parts.append(f'<row r="{r}">{cells}</row>')
            n += 1
        parts.append("</sheetData></worksheet>")
        zf.writestr("xl/worksheets/sheet1.xml", "".join(parts))
    return n - 1
