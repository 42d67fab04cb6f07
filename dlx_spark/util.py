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
