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

The style layer (:class:`CellStyle`, the reference's remaining S5
surface): per-column number formats — including decimal places that
arrive as a REQUEST parameter at render time (doc-01.md problem #5) —
and column widths, written as a real ``xl/styles.xml`` whose entries
are MERGED across identical declarations (poi-collection's style-merge
trick, backup/README.md:199-203: declare per column, share one xf per
distinct treatment, stay under Excel 2003's 4000-style cap).
:func:`write_excel_view` is the JsonView→xlsx export honoring each
ColumnSpec's ``cell_style``; :func:`read_xlsx_column_styles` decodes
the layer back for round-trip verification.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CellStyle:
    """Per-column style declaration (reference S5: the POI CellStyle,
    backup/README.md:199-203 and doc-01.md's view problem #5 — Excel
    needs per-column widths, decimal places and formatters, sometimes
    decided by a REQUEST parameter at render time).

    - ``decimals``: fixed decimal places → number format ``0.00…``
      (``0`` decimals → ``0``); display-only, stored values untouched.
    - ``num_fmt``: an explicit Excel format code (overrides decimals),
      e.g. ``"#,##0.00"`` or ``"0.00%"``.
    - ``width``: column width in character units (a column property in
      OOXML, but declared here so one object carries a column's whole
      style, as the reference's per-column declaration does).

    Frozen/hashable on purpose: the writer DEDUPS identical styles into
    one shared ``<xf>`` (poi-collection's style-merge trick — declare
    independently per column, merge identical treatments — which is
    what kept POI under Excel 2003's 4000-CellStyle cap and off the
    per-cell-style perf cliff)."""

    decimals: int | None = None
    num_fmt: str | None = None
    width: float | None = None

    def format_code(self) -> str | None:
        """The effective Excel number-format code, or None (General)."""
        if self.num_fmt is not None:
            return self.num_fmt
        if self.decimals is not None:
            if self.decimals < 0:
                raise ValueError(f"decimals must be >= 0, got {self.decimals}")
            return "0" if self.decimals == 0 else "0." + "0" * self.decimals
        return None


#: Custom number formats start here; below are Excel's built-ins.
_NUMFMT_BASE = 164
#: Excel 2003's hard cap the merge trick exists to avoid.
_MAX_STYLES = 4000

#: ECMA-376 §18.8.30 implied formats — ids below _NUMFMT_BASE carry no
#: <numFmt> element, so reading foreign-producer files (Excel, openpyxl)
#: needs this table or every built-in-styled column decodes to None.
#: id 0 (General) is deliberately absent: General means "no format".
_BUILTIN_NUMFMT: dict[int, str] = {
    1: "0",
    2: "0.00",
    3: "#,##0",
    4: "#,##0.00",
    9: "0%",
    10: "0.00%",
    11: "0.00E+00",
    12: "# ?/?",
    13: "# ??/??",
    14: "mm-dd-yy",
    15: "d-mmm-yy",
    16: "d-mmm",
    17: "mmm-yy",
    18: "h:mm AM/PM",
    19: "h:mm:ss AM/PM",
    20: "h:mm",
    21: "h:mm:ss",
    22: "m/d/yy h:mm",
    37: "#,##0 ;(#,##0)",
    38: "#,##0 ;[Red](#,##0)",
    39: "#,##0.00;(#,##0.00)",
    40: "#,##0.00;[Red](#,##0.00)",
    45: "mm:ss",
    46: "[h]:mm:ss",
    47: "mmss.0",
    48: "##0.0E+0",
    49: "@",
}


def _sheet_parts(zf: "zipfile.ZipFile") -> list[tuple[str, str | None]]:
    """(worksheet part name, display title) pairs in WORKBOOK sheet order.

    The authoritative order is workbook.xml's <sheet> sequence resolved
    through workbook.xml.rels (r:id → part target): Excel keeps part
    FILE names stable when sheets are reordered or deleted, so part
    numbering need not match display order.  workbook.xml's <sheet>
    list also enumerates CHARTSHEETS (rels target chartsheets/sheetN.xml)
    — not row data; they are filtered out here, and the title rides
    along in the same walk so name resolution stays aligned with the
    filtered list.  When either part is missing (minimal producers),
    fall back to numeric-suffix order — numeric, not lexicographic, or
    sheet10.xml sorts before sheet2.xml in >9-sheet workbooks — with
    None titles."""
    names = zf.namelist()
    try:
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to = {
            r.get("Id"): (r.get("Target"), r.get("Type") or "")
            for r in rels.iter(f"{{{_REL_NS}}}Relationship")
        }
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        parts = []
        for s in wb.iter(f"{{{_NS}}}sheet"):
            rid = s.get(f"{{{_DOC_REL}}}id")
            target, rtype = rid_to[rid]
            if target is None:  # malformed Relationship: no Target attr
                continue
            # targets are workbook-relative ("worksheets/sheet1.xml")
            # unless rooted ("/xl/worksheets/sheet1.xml")
            part = target.lstrip("/") if target.startswith("/") else f"xl/{target}"
            # chartsheets are filtered by relationship TYPE (with the
            # conventional path as fallback for type-less producers) —
            # NOT by requiring xl/worksheets/: a foreign writer may
            # store real worksheets at a nonstandard part path, and a
            # prefix allowlist would reject the whole workbook
            if rtype.endswith("/chartsheet") or part.startswith(
                "xl/chartsheets/"
            ):
                continue
            parts.append((part, s.get("name")))
        if parts and all(p in names for p, _ in parts):
            return parts
    except (KeyError, ET.ParseError):
        pass
    found = [
        n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
    ]
    return [
        (n, None)
        for n in sorted(
            found, key=lambda n: int(re.search(r"sheet(\d+)\.xml", n).group(1))
        )
    ]


def _style_table(
    styles: list[CellStyle | None],
) -> tuple[str | None, list[int | None]]:
    """The style-MERGE step: distinct format codes → one shared
    ``numFmt`` + ``cellXfs`` entry each; per-column style indexes point
    into the shared table.  Identical declarations on any number of
    columns cost ONE style object (backup/README.md:199-203).

    Returns (styles.xml content or None when no column needs one,
    per-column xf index or None)."""
    code_to_xf: dict[str, int] = {}
    col_xf: list[int | None] = []
    for st in styles:
        code = st.format_code() if st is not None else None
        if code is None:
            col_xf.append(None)
            continue
        if code not in code_to_xf:
            code_to_xf[code] = len(code_to_xf) + 1  # xf 0 = default
        col_xf.append(code_to_xf[code])
    if not code_to_xf:
        return None, col_xf
    if len(code_to_xf) > _MAX_STYLES:
        raise ValueError(
            f"{len(code_to_xf)} distinct cell styles exceed the "
            f"{_MAX_STYLES}-style compatibility cap — merge formats"
        )
    num_fmts = "".join(
        f'<numFmt numFmtId="{_NUMFMT_BASE + i}" formatCode="{_esc(code)}"/>'
        for i, code in enumerate(code_to_xf)
    )
    xfs = '<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>' + "".join(
        f'<xf numFmtId="{_NUMFMT_BASE + i}" fontId="0" fillId="0" '
        'borderId="0" applyNumberFormat="1"/>'
        for i in range(len(code_to_xf))
    )
    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_NS}">'
        f'<numFmts count="{len(code_to_xf)}">{num_fmts}</numFmts>'
        '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
        '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
        '<borders count="1"><border/></borders>'
        '<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>'
        f'<cellXfs count="{len(code_to_xf) + 1}">{xfs}</cellXfs>'
        "</styleSheet>"
    )
    return xml, col_xf

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


def _cell_xml(ref: str, value, s: int | None = None) -> str:
    """One <c> element, or '' for NULL (omitted cell).  ``s`` is the
    shared-style index applied to NUMERIC cells (number formats act on
    numbers; strings/bools/dates keep the default style)."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float, Decimal)):
        if isinstance(value, float) and value != value:  # NaN -> empty cell
            return ""
        s_attr = f' s="{s}"' if s is not None else ""
        return f'<c r="{ref}"{s_attr}><v>{value}</v></c>'
    if isinstance(value, (_dt.datetime, _dt.date)):
        text = value.isoformat(sep=" ") if isinstance(value, _dt.datetime) else value.isoformat()
        return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{_esc(str(value))}</t></is></c>'


def _sheet_xml(
    columns: list[str],
    rows: list[tuple],
    styles: list[CellStyle | None] | None = None,
    col_xf: list[int | None] | None = None,
) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}">',
    ]
    if styles is not None and any(
        st is not None and st.width is not None for st in styles
    ):
        cols = "".join(
            f'<col min="{i + 1}" max="{i + 1}" width="{st.width}" '
            'customWidth="1"/>'
            for i, st in enumerate(styles)
            if st is not None and st.width is not None
        )
        out.append(f"<cols>{cols}</cols>")
    out.append("<sheetData>")
    xf = col_xf or [None] * len(columns)
    header = "".join(
        _cell_xml(f"{_col_letter(c)}1", name) for c, name in enumerate(columns)
    )
    out.append(f'<row r="1">{header}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v, xf[c] if c < len(xf) else None)
            for c, v in enumerate(row)
        )
        out.append(f'<row r="{r}">{cells}</row>')
    out.append("</sheetData></worksheet>")
    return "".join(out)


def write_xlsx_rows(
    path: str,
    columns: list[str],
    rows: list[tuple],
    *,
    sheet: str = "Sheet1",
    styles: dict[str, CellStyle] | list[CellStyle | None] | None = None,
) -> None:
    """Write one sheet of rows to an .xlsx file using only the stdlib.

    ``styles``: per-column :class:`CellStyle` declarations — a dict by
    column name (unknown names ignored, the param layer's silent-ignore
    convention) or a list aligned with ``columns``.  Identical styles
    are merged into one shared xf (see :func:`_style_table`)."""
    if isinstance(styles, dict):
        style_list: list[CellStyle | None] = [styles.get(c) for c in columns]
    else:
        style_list = list(styles) if styles is not None else [None] * len(columns)
    if len(style_list) != len(columns):
        raise ValueError(
            f"styles list length {len(style_list)} != {len(columns)} columns"
        )
    styles_xml, col_xf = _style_table(style_list)
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_DOC_REL}"><sheets>'
        f'<sheet name="{_esc(sheet)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    styles_rel = (
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        if styles_xml
        else ""
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        f"{styles_rel}"
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    styles_override = (
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        if styles_xml
        else ""
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
        f"{styles_override}"
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        if styles_xml:
            zf.writestr("xl/styles.xml", styles_xml)
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            _sheet_xml(columns, rows, style_list, col_xf),
        )


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
    if t == "e":
        # formula error cell (#DIV/0!, #N/A, ...): no value exists —
        # real Excel output contains these routinely, and letting the
        # error TEXT fall through to float() crashed the whole read
        return None
    if t == "d":
        # ISO-8601 date cell (OOXML's optional date type): keep the
        # text verbatim — the caller's schema decides the parse
        return v.text
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
        sheet_parts = _sheet_parts(zf)
        if isinstance(sheet, int):
            part = sheet_parts[sheet][0]
        else:
            # titles ride along with the (chartsheet-filtered) parts,
            # so name resolution can't drift against the part list
            titles = [t for _, t in sheet_parts]
            part = sheet_parts[titles.index(sheet)][0]
        root = ET.fromstring(zf.read(part))

    grid: list[dict[int, object]] = []
    width = 0
    for row in root.iter(f"{{{_NS}}}row"):
        cells: dict[int, object] = {}
        # cells without an ``r`` attribute are legal OOXML (position is
        # implied: one past the previous cell) — decoding them all to
        # index -1 silently dropped every such cell
        next_implied = 0
        for c in row.findall(f"{{{_NS}}}c"):
            ref = c.get("r", "")
            col_letters = "".join(ch for ch in ref if ch.isalpha())
            if col_letters:
                idx = 0
                for ch in col_letters:
                    idx = idx * 26 + (ord(ch) - ord("A") + 1)
                idx -= 1
            else:
                idx = next_implied
            next_implied = idx + 1
            cells[idx] = _parse_cell(c, shared)
        grid.append(cells)
        width = max(width, max(cells, default=-1) + 1)
    if not grid:
        return [], []
    columns = [str(grid[0].get(i, f"col{i}")) for i in range(width)]
    rows = [tuple(r.get(i) for i in range(width)) for r in grid[1:]]
    return columns, rows


def read_xlsx_column_styles(
    path: str, *, sheet: int = 0
) -> dict[str, dict]:
    """Decode the style layer back out (the round-trip half the tests
    pin): per header-column ``{"num_fmt": code-or-None, "width":
    width-or-None}``, resolved through styles.xml's shared
    numFmts/cellXfs table and the sheet's ``<cols>`` widths.  The
    format of a column is taken from its first styled data cell."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        xf_to_code: dict[int, str] = {}
        if "xl/styles.xml" in names:
            sroot = ET.fromstring(zf.read("xl/styles.xml"))
            id_to_code = {}
            for nf in sroot.iter(f"{{{_NS}}}numFmt"):
                id_to_code[int(nf.get("numFmtId"))] = nf.get("formatCode")
            cell_xfs = sroot.find(f"{{{_NS}}}cellXfs")
            if cell_xfs is not None:
                for i, xf in enumerate(cell_xfs.findall(f"{{{_NS}}}xf")):
                    fmt_id = int(xf.get("numFmtId", "0"))
                    if fmt_id in id_to_code:
                        xf_to_code[i] = id_to_code[fmt_id]
                    elif fmt_id in _BUILTIN_NUMFMT:
                        # built-in id: no <numFmt> element exists in the
                        # file — resolve through the ECMA-376 table
                        xf_to_code[i] = _BUILTIN_NUMFMT[fmt_id]
        root = ET.fromstring(zf.read(_sheet_parts(zf)[sheet][0]))

    widths: dict[int, float] = {}
    for col in root.iter(f"{{{_NS}}}col"):
        # <col> without width is legal (hidden/bestFit/styled columns
        # from Excel or openpyxl): no width to report, not a crash
        if col.get("width") is None:
            continue
        for i in range(int(col.get("min")), int(col.get("max")) + 1):
            widths[i - 1] = float(col.get("width"))

    def _idx(ref: str) -> int:
        i = 0
        for ch in ref:
            if not ch.isalpha():
                break
            i = i * 26 + (ord(ch) - ord("A") + 1)
        return i - 1

    header: dict[int, str] = {}
    col_code: dict[int, str] = {}
    for r, row in enumerate(root.iter(f"{{{_NS}}}row")):
        # same implied-position rule as read_xlsx_rows: a cell without
        # ``r`` sits one past the previous cell, not at index -1
        next_implied = 0
        for c in row.findall(f"{{{_NS}}}c"):
            ref = c.get("r", "")
            idx = _idx(ref) if any(ch.isalpha() for ch in ref) else next_implied
            next_implied = idx + 1
            if r == 0:
                texts = [el.text or "" for el in c.iter(f"{{{_NS}}}t")]
                header[idx] = "".join(texts)
            elif idx not in col_code and c.get("s") is not None:
                code = xf_to_code.get(int(c.get("s")))
                if code is not None:
                    col_code[idx] = code
    return {
        name: {"num_fmt": col_code.get(i), "width": widths.get(i)}
        for i, name in header.items()
    }


def write_excel(
    df: DataFrame,
    path: str,
    *,
    sheet: str = "Sheet1",
    max_rows: int = 100_000,
    styles: dict[str, CellStyle] | None = None,
) -> None:
    """Driver-side Excel export of a (small) result set.

    max_rows guards the collect — Excel is a report sink, not a data
    sink; anything bigger belongs in parquet.  ``styles`` declares
    per-column CellStyles by output column name."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"refusing to export >{max_rows} rows to Excel (max_rows={max_rows}); "
            "use write_table for bulk data"
        )
    write_xlsx_rows(
        path, df.columns, [tuple(r) for r in rows], sheet=sheet, styles=styles
    )


def write_excel_view(
    df: DataFrame,
    spec,
    path: str,
    *,
    params=None,
    sheet: str = "Sheet1",
    max_rows: int = 100_000,
    style_params: dict[str, "CellStyle | int"] | None = None,
) -> None:
    """The JsonView→xlsx export (reference S5 end-to-end): render the
    QuerySpec's VISIBLE columns to a sheet, honoring each ColumnSpec's
    declared ``cell_style`` — with ``style_params`` as the RUNTIME
    override the reference motivates (doc-01.md problem #5: "the
    decimal places of an exported column decided by a request
    parameter").  An int override means "this many decimals on top of
    the declared style" (width kept); a CellStyle replaces the
    declaration outright; unknown names are silently ignored (the
    params-layer convention).

    Identical effective styles — declared or overridden — still merge
    into one shared xf, so a 200-column sheet with one money format
    costs one style object (backup/README.md:199-203).

    ``df`` is the BASE frame (source columns); pass ``params`` (a
    QueryParams) to export a filtered/ordered/paged report — the same
    request object that served the JSON view drives the Excel view,
    which is the reference's whole multi-view pitch."""
    from dataclasses import replace as _replace

    visible = spec.visible_columns()
    if params is not None:
        from ubw_spark.params import apply_params

        out = apply_params(df, spec, params)
    else:
        out = spec.frame(df)
    styles: dict[str, CellStyle] = {}
    overrides = style_params or {}
    for s in visible:
        st = s.cell_style if isinstance(s.cell_style, CellStyle) else None
        ov = overrides.get(s.name)
        if isinstance(ov, CellStyle):
            st = ov
        elif isinstance(ov, int):
            st = _replace(st or CellStyle(), decimals=ov, num_fmt=None)
        if st is not None:
            styles[s.name] = st
    write_excel(out, path, sheet=sheet, max_rows=max_rows, styles=styles)


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
