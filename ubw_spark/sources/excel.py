"""Excel source/sink (reference S5: POI-based Excel views/inputs,
doc-01.md:109-115, backup/README.md:147-149,199-203).

Spark has no built-in Excel format. On a real cluster the idiomatic
path is the spark-excel DataSource package; the reference, however,
only uses Excel as a *report* surface — paged query results rendered
to a sheet, and small sheets ingested back — never bulk data. That
shape is a driver-side concern, so we implement it directly.

An .xlsx file is a zip archive of XML parts (ECMA-376 / OOXML,
SpreadsheetML). This module writes and reads that format with only
the standard library (zipfile + xml.etree): no openpyxl, no
xlsxwriter, no JVM package. Writer choices, all within the spec:

- cells carry inline strings (``t="inlineStr"``) so no
  sharedStrings.xml part is needed;
- numbers are written as plain ``<v>`` cells, booleans as ``t="b"``,
  dates/timestamps as ISO-8601 inline strings (Excel's native date
  encoding is a float serial + a style index; ISO strings round-trip
  losslessly and stay human-readable, which is what a report wants);
- NULLs are empty cells (omitted), round-tripped back to None.

The reader also understands sharedStrings.xml so it can ingest files
produced by Excel itself or openpyxl, not just our own output.

The Spark-side contract is unchanged: DataFrame in/out, max_rows
guard on the collect (Excel is a report sink — bulk data belongs in
parquet), schema inference on ingest via spark.createDataFrame.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
import xml.etree.ElementTree as ET
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_DOC_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ... Z, AA, AB, ..."""
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _cell_xml(ref: str, value) -> str:
    """One <c> element, or '' for NULL (omitted cell)."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float, Decimal)):
        if isinstance(value, float) and value != value:  # NaN -> empty cell
            return ""
        return f'<c r="{ref}"><v>{value}</v></c>'
    if isinstance(value, (_dt.datetime, _dt.date)):
        text = value.isoformat(sep=" ") if isinstance(value, _dt.datetime) else value.isoformat()
        return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{_esc(str(value))}</t></is></c>'


def _sheet_xml(columns: list[str], rows: list[tuple]) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}"><sheetData>',
    ]
    header = "".join(
        _cell_xml(f"{_col_letter(c)}1", name) for c, name in enumerate(columns)
    )
    out.append(f'<row r="1">{header}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        out.append(f'<row r="{r}">{cells}</row>')
    out.append("</sheetData></worksheet>")
    return "".join(out)


def write_xlsx_rows(
    path: str, columns: list[str], rows: list[tuple], *, sheet: str = "Sheet1"
) -> None:
    """Write one sheet of rows to an .xlsx file using only the stdlib."""
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_DOC_REL}"><sheets>'
        f'<sheet name="{_esc(sheet)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", _sheet_xml(columns, rows))


def _parse_cell(cell: ET.Element, shared: list[str]):
    """Decode one <c> element to a Python value."""
    t = cell.get("t", "n")
    if t == "inlineStr":
        texts = [el.text or "" for el in cell.iter(f"{{{_NS}}}t")]
        return "".join(texts)
    v = cell.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    # numeric: keep ints integral
    text = v.text
    try:
        return int(text)
    except ValueError:
        return float(text)


def read_xlsx_rows(path: str, *, sheet: str | int = 0):
    """Read one sheet from an .xlsx file -> (columns, rows), stdlib-only.

    Handles inline strings (our writer), shared strings (Excel/openpyxl
    output), numbers, and booleans. Cell position is taken from the
    ``r`` attribute so sparse rows (omitted NULL cells) align."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{{{_NS}}}si"):
                shared.append("".join(el.text or "" for el in si.iter(f"{{{_NS}}}t")))
        sheet_parts = sorted(
            n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if isinstance(sheet, int):
            part = sheet_parts[sheet]
        else:
            # resolve the sheet name through workbook.xml's order
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
            titles = [s.get("name") for s in wb.iter(f"{{{_NS}}}sheet")]
            part = sheet_parts[titles.index(sheet)]
        root = ET.fromstring(zf.read(part))

    grid: list[dict[int, object]] = []
    width = 0
    for row in root.iter(f"{{{_NS}}}row"):
        cells: dict[int, object] = {}
        for c in row.findall(f"{{{_NS}}}c"):
            ref = c.get("r", "")
            col_letters = "".join(ch for ch in ref if ch.isalpha())
            idx = 0
            for ch in col_letters:
                idx = idx * 26 + (ord(ch) - ord("A") + 1)
            cells[idx - 1] = _parse_cell(c, shared)
        grid.append(cells)
        width = max(width, max(cells, default=-1) + 1)
    if not grid:
        return [], []
    columns = [str(grid[0].get(i, f"col{i}")) for i in range(width)]
    rows = [tuple(r.get(i) for i in range(width)) for r in grid[1:]]
    return columns, rows


def write_excel(
    df: DataFrame, path: str, *, sheet: str = "Sheet1", max_rows: int = 100_000
) -> None:
    """Driver-side Excel export of a (small) result set.

    max_rows guards the collect — Excel is a report sink, not a data
    sink; anything bigger belongs in parquet."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"refusing to export >{max_rows} rows to Excel (max_rows={max_rows}); "
            "use write_table for bulk data"
        )
    write_xlsx_rows(path, df.columns, [tuple(r) for r in rows], sheet=sheet)


def read_excel(
    spark: SparkSession, path: str, *, sheet: str | int = 0, schema: str | None = None
) -> DataFrame:
    """Ingest an Excel sheet as a DataFrame (driver-side stdlib read).

    Without ``schema``, types are inferred by Spark from the decoded
    Python values; pass a DDL string to coerce (e.g. ISO date strings
    back to dates)."""
    columns, rows = read_xlsx_rows(path, sheet=sheet)
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows, columns)
