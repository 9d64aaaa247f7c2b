"""Minimal stdlib XLSX codec (zipfile + xml.etree) — fallback for the
pandas excel engine (openpyxl) when it is not installed.

The reference supports XLSX tap/sink end-to-end (reference
file.py:121-169 routes through pandas). This module keeps that surface
working without the optional dependency: an .xlsx file is a ZIP of
OOXML parts, and the subset a data pipeline needs — one sheet,
header row, string/number/bool/date cells — is small enough to read
and write directly.

Reader: resolves the first workbook sheet through the relationship
part, decodes shared strings, inline strings, booleans and numbers,
and returns list-of-dicts rows keyed by the header row. Numbers come
back as int when integral, else float (pandas read_excel behavior).

Writer: emits a self-contained single-sheet package using inline
strings (no sharedStrings part), ISO strings for datetimes, and plain
`v` numbers — readable by Excel, LibreOffice, openpyxl and pandas.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Any, Dict, List, Optional, Sequence

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_REL_DOC = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _q(tag: str) -> str:
    return f"{{{_NS_MAIN}}}{tag}"


def _col_to_idx(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27: spreadsheet column letters are base-26."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _idx_to_col(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_value(c: ET.Element, shared: List[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_q("is"))
        return "".join(el.text or "" for el in is_el.iter(_q("t"))) if is_el is not None else ""
    v_el = c.find(_q("v"))
    if v_el is None or v_el.text is None:
        return None
    v = v_el.text
    if t == "s":
        return shared[int(v)]
    if t == "b":
        return v in ("1", "true", "TRUE")
    if t == "str":
        return v
    # numeric: int when integral (pandas read_excel renders 3.0 -> 3
    # only for all-int columns; int-when-integral is the lossless choice)
    f = float(v)
    return int(f) if f.is_integer() and abs(f) < 2**53 else f


def read_xlsx(path: str) -> List[Dict[str, Any]]:
    """First worksheet -> list of dict rows keyed by the header row."""
    with zipfile.ZipFile(path) as zf:
        # workbook -> first sheet's relationship target
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = wb.find(_q("sheets"))
        if sheets is None or len(sheets) == 0:
            return []
        rid = sheets[0].get(f"{{{_NS_REL_DOC}}}id")
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target = None
        for rel in rels:
            if rel.get("Id") == rid:
                target = rel.get("Target")
                break
        if target is None:
            target = "worksheets/sheet1.xml"
        target = target.lstrip("/")
        sheet_path = target if target.startswith("xl/") else f"xl/{target}"

        shared: List[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst:
                shared.append("".join(el.text or "" for el in si.iter(_q("t"))))

        ws = ET.fromstring(zf.read(sheet_path))
        data = ws.find(_q("sheetData"))
        if data is None:
            return []
        grid: List[List[Any]] = []
        for row in data:
            cells: List[Any] = []
            for c in row:
                ref = c.get("r")
                idx = _col_to_idx(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)
                cells.append(_cell_value(c, shared))
            grid.append(cells)
    if not grid:
        return []
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    out = []
    for cells in grid[1:]:
        cells = cells + [None] * (len(header) - len(cells))
        out.append(dict(zip(header, cells)))
    return out


_XML_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    return re.sub(r'[&<>"]', lambda m: _XML_ESCAPES[m.group(0)], s)


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()  # numpy scalars (pandas to_dict output) -> Python
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, _decimal.Decimal):
        return f'<c r="{ref}"><v>{v}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and v != v:
            return ""  # NaN (pandas null) -> empty cell
        if isinstance(v, float) and v in (float("inf"), float("-inf")):
            return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    if isinstance(v, (_dt.datetime, _dt.date)):
        v = v.isoformat()
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(v))}</t></is></c>'


def write_xlsx(
    path: str, rows: Sequence[Dict[str, Any]], columns: Optional[List[str]] = None
) -> None:
    """Write a single-sheet workbook with a header row + data rows."""
    if columns is None:
        columns = list(rows[0].keys()) if rows else []
    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    lines.append(f'<worksheet xmlns="{_NS_MAIN}"><sheetData>')
    hdr = "".join(
        _cell_xml(f"{_idx_to_col(i)}1", name) for i, name in enumerate(columns)
    )
    lines.append(f'<row r="1">{hdr}</row>')
    for r, row in enumerate(rows, start=2):
        body = "".join(
            _cell_xml(f"{_idx_to_col(i)}{r}", row.get(name))
            for i, name in enumerate(columns)
        )
        lines.append(f'<row r="{r}">{body}</row>')
    lines.append("</sheetData></worksheet>")
    sheet = "".join(lines)

    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_REL_PKG}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL_DOC}">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_REL_PKG}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
