"""Tabular utility: the Table structure used by table/CSV/Excel
(de)serialization (reference ``/root/reference/dlx/util.py:68-183``).
"""

from __future__ import annotations

import csv
import io


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _xlsx_rows_stdlib(path: str) -> list[list[str]]:
    """Minimal XLSX reader (zip + XML, no third-party libs): shared and
    inline strings, numbers (int-valued floats collapse to int strings,
    mirroring the reference's xlrd handling, dlx/util.py:47-57).
    Date-styled numeric cells are returned as raw serial numbers —
    install openpyxl for date rendering."""
    import re
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t"))
                      for si in root.findall(f"{_XLSX_NS}si")]
        # numeric sort: sheet2 before sheet10 (lexicographic would not be)
        sheets = [n for n in z.namelist()
                  if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)]
        if sheets:
            sheet = sorted(sheets, key=lambda n: int(re.search(r"(\d+)", n).group(1)))[0]
        else:
            sheet = sorted(n for n in z.namelist()
                           if re.fullmatch(r"xl/worksheets/[^/]+\.xml", n))[0]
        root = ElementTree.fromstring(z.read(sheet))

    rows: list[list[str]] = []
    next_row = 1
    for row in root.iter(f"{_XLSX_NS}row"):
        # honor the row 'r' attribute: rows omitted from the XML
        # (entirely blank) still occupy a slot, as openpyxl reports them
        r_attr = row.get("r")
        if r_attr and r_attr.isdigit():
            while next_row < int(r_attr):
                rows.append([])
                next_row += 1
        next_row += 1
        cells: dict[int, str] = {}
        for j, c in enumerate(row.findall(f"{_XLSX_NS}c")):
            ref = c.get("r") or ""
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            col = col - 1 if col else j
            t = c.get("t")
            v = c.find(f"{_XLSX_NS}v")
            if t == "s" and v is not None and v.text is not None:
                val = shared[int(v.text)]
            elif t == "inlineStr":
                val = "".join(tt.text or "" for tt in c.iter(f"{_XLSX_NS}t"))
            elif v is not None and v.text is not None:
                val = v.text
                try:
                    f = float(val)
                    if f.is_integer():
                        val = str(int(f))
                except ValueError:
                    pass
            else:
                val = ""
            cells[col] = str(val).strip()
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i, "") for i in range(width)])

    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def _col_ref(idx: int) -> str:
    """0-based column index → spreadsheet letters (0→A, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _xlsx_escape(value: str) -> str:
    """XML-escape a cell value, encoding XML-illegal control characters
    the OOXML way (_xHHHH_) so the sheet stays well-formed even when a
    subfield value carries a stray MARC separator byte."""
    import re
    from xml.sax.saxutils import escape

    value = re.sub(
        "[\x00-\x08\x0b\x0c\x0e-\x1f]",
        lambda m: "_x%04X_" % ord(m.group()), value)
    return escape(value)


def _xlsx_write_stdlib(path: str, rows: list[list[str]]) -> None:
    """Minimal XLSX writer (zip + XML, no third-party libs): one sheet,
    every cell an inline string.  Counterpart of _xlsx_rows_stdlib."""
    import zipfile

    body = ["<sheetData>"]
    for i, row in enumerate(rows, start=1):
        cells = "".join(
            f'<c r="{_col_ref(j)}{i}" t="inlineStr"><is><t xml:space="preserve">'
            f"{_xlsx_escape(str(v))}</t></is></c>"
            for j, v in enumerate(row))
        body.append(f'<row r="{i}">{cells}</row>')
    body.append("</sheetData>")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<worksheet xmlns="{ns}">' + "".join(body) + "</worksheet>")
    rels_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
          "</Types>")
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 f'<Relationships xmlns="{rels_ns}">'
                 f'<Relationship Id="rId1" Type="{doc_rel}/officeDocument" Target="xl/workbook.xml"/>'
                 "</Relationships>")
    workbook = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<workbook xmlns="{ns}" xmlns:r="{doc_rel}">'
                '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
                "</workbook>")
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               f'<Relationships xmlns="{rels_ns}">'
               f'<Relationship Id="rId1" Type="{doc_rel}/worksheet" Target="worksheets/sheet1.xml"/>'
               "</Relationships>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


class Table:
    """Header + row-index table.  ``index`` maps row id → {column: value};
    repeated values joined with '||' on set (reference util.py:104-117)."""

    def __init__(self, list_of_lists: list[list] | None = None):
        self.header: list[str] = []
        self.index: dict[int, dict[str, str]] = {}
        if list_of_lists:
            self.header = [str(c) for c in list_of_lists[0]]
            for i, row in enumerate(list_of_lists[1:]):
                self.index[i] = {}
                for j, cell in enumerate(row):
                    self.index[i][self.header[j]] = cell

    @classmethod
    def from_excel(cls, path: str, date_format: str = "%Y%m%d") -> "Table":
        try:
            from openpyxl import load_workbook
        except ImportError:
            return cls(_xlsx_rows_stdlib(path))
        wb = load_workbook(path, read_only=True)
        ws = wb.active
        rows = []
        for row in ws.iter_rows(values_only=True):
            cells = []
            for cell in row:
                if hasattr(cell, "strftime"):
                    cells.append(cell.strftime(date_format))
                elif cell is None:
                    cells.append("")
                else:
                    cells.append(str(cell).strip())
            rows.append(cells)
        return cls(rows)

    def set(self, rowid: int, field_name: str, value: str) -> "Table":
        if field_name not in self.header:
            self.header.append(field_name)
        row = self.index.setdefault(rowid, {})
        if row.get(field_name):
            row[field_name] += "||" + str(value)  # repeated values
        else:
            row[field_name] = str(value)
        return self

    def get(self, rowid: int, field_name: str) -> str:
        return self.index.get(rowid, {}).get(field_name, "")

    def to_list(self) -> list[list]:
        out = [list(self.header)]
        for rowid in sorted(self.index):
            out.append([self.index[rowid].get(col, "") for col in self.header])
        return out

    def to_csv(self) -> str:
        buf = io.StringIO()
        writer = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
        for row in self.to_list():
            writer.writerow(row)
        return buf.getvalue().rstrip("\n")

    def to_tsv(self) -> str:
        buf = io.StringIO()
        writer = csv.writer(buf, delimiter="\t", quoting=csv.QUOTE_MINIMAL,
                            lineterminator="\n")
        for row in self.to_list():
            writer.writerow(row)
        return buf.getvalue().rstrip("\n")

    def to_html(self) -> str:
        rows = self.to_list()
        html = "<table>"
        for row in rows:
            html += "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
        return html + "</table>"

    def to_excel(self, path: str) -> None:
        """Write the table as a single-sheet XLSX.  Uses openpyxl when
        available, else a minimal stdlib zip+XML writer (inline-string
        cells) — the reference's MarcSet.to_excel is an unfinished stub
        (dlx/marc/__init__.py:390-391); this one round-trips through
        Table.from_excel.  Round-trip caveat: BOTH readers strip
        leading/trailing whitespace from cells, mirroring the
        reference's xlrd cell cleanup (dlx/util.py:47-57), so padded
        values come back trimmed."""
        rows = self.to_list()
        try:
            from openpyxl import Workbook
        except ImportError:
            _xlsx_write_stdlib(path, rows)
            return
        wb = Workbook(write_only=True)
        ws = wb.create_sheet()
        for row in rows:
            ws.append([str(c) for c in row])
        wb.save(path)
