"""Serialization golden tests against the reference fixture shapes
(tests/marc.mrk and tests/marc.xml formats, re-created per FIXTURES §7)."""

import json

import pytest

from dlx_spark.marc import Bib, BibSet

GOLDEN_MRK_BIB1 = """=000  leader
=001  1
=008  controlfield
=245  \\\\$aThis$bis the$ctitle
=520  \\\\$aDescription
=520  \\\\$aAnother description$aRepeated subfield
=650  \\\\$aHeader$01
=710  \\\\$aAnother header$02
"""

GOLDEN_XML_BIB1 = (
    '<record><controlfield tag="000">leader</controlfield>'
    '<controlfield tag="001">1</controlfield>'
    '<controlfield tag="008">controlfield</controlfield>'
    '<datafield tag="245" ind1=" " ind2=" ">'
    '<subfield code="a">This</subfield><subfield code="b">is the</subfield>'
    '<subfield code="c">title</subfield></datafield>'
    '<datafield tag="520" ind1=" " ind2=" ">'
    '<subfield code="a">Description</subfield></datafield>'
    '<datafield tag="520" ind1=" " ind2=" ">'
    '<subfield code="a">Another description</subfield>'
    '<subfield code="a">Repeated subfield</subfield></datafield>'
    '<datafield tag="650" ind1=" " ind2=" ">'
    '<subfield code="a">Header</subfield><subfield code="0">1</subfield></datafield>'
    '<datafield tag="710" ind1=" " ind2=" ">'
    '<subfield code="a">Another header</subfield><subfield code="0">2</subfield>'
    "</datafield></record>"
)


@pytest.fixture
def bib1(bib_docs, auth_index):
    return Bib(bib_docs[0], auth_index=auth_index)


def test_to_mrk_golden(bib1):
    assert bib1.to_mrk() == GOLDEN_MRK_BIB1


def test_to_mrk_no_id(bib1):
    assert "=001" not in bib1.to_mrk(write_id=False)


def test_from_mrk_roundtrip(bib1, auth_index):
    mrk = bib1.to_mrk()
    back = Bib.from_mrk(mrk, auth_index=auth_index)
    assert back.id == 1
    assert back.get_value("245", "a") == "This"
    assert back.get_xref("650", "a") == 1          # $0 captured as xref
    assert back.get_value("650", "a") == "Header"
    assert back.get_values("520", "a") == [
        "Description", "Another description", "Repeated subfield"]
    assert back.to_mrk() == mrk                     # full round trip


def test_from_mrk_tag_order_check(auth_index):
    from dlx_spark.marc.serialization import InvalidRecordString
    with pytest.raises(InvalidRecordString):
        Bib.from_mrk("=245  \\\\$aX\n=100  \\\\$aY\n", auth_index=auth_index,
                     auth_control=False)


def test_to_xml_golden(bib1):
    assert bib1.to_xml() == GOLDEN_XML_BIB1


def test_xml_roundtrip(bib1, auth_index):
    xml = bib1.to_xml()
    back = Bib.from_xml(xml, auth_index=auth_index)
    assert back.id == 1
    assert back.get_xref("650", "a") == 1
    assert back.get_value("710", "a") == "Another header"
    assert back.to_xml() == xml


def test_set_xml_collection(bibs):
    xml = bibs.to_xml()
    assert xml.startswith("<collection><record>")
    back = BibSet.from_xml(xml, auth_control=False)
    recs = list(back)
    assert len(recs) == 2
    assert recs[1].get_value("245", "a") == "Another"


def test_set_mrk_blank_line_split(bibs, auth_index):
    mrk = bibs.to_mrk()
    assert "\n\n" in mrk
    back = BibSet.from_mrk(mrk, auth_index=auth_index)
    assert back.count == 2


def test_to_mrc(bib1):
    mrc = bib1.to_mrc()
    # leader arithmetic: total length prefix is 5 zero-padded digits
    assert int(mrc[:5]) == len(mrc.encode("utf-8"))
    assert mrc[12:17].isdigit()
    assert "\u001e" in mrc and mrc.endswith("\u001d")
    # directory entries are 12 bytes per field
    base = int(mrc[12:17])
    directory = mrc[24:base - 1]
    assert len(directory) % 12 == 0
    tags = [directory[i:i + 3] for i in range(0, len(directory), 12)]
    assert tags == ["001", "008", "245", "520", "520", "650", "710"]


def test_from_mrc_roundtrip(bib1, auth_index):
    mrc = bib1.to_mrc()
    back = Bib.from_mrc(mrc, auth_index=auth_index)
    assert back.id == 1
    assert back.get_value("245", "a") == "This"
    assert back.get_value("245", "c") == "title"
    assert back.get_values("520", "a") == [
        "Description", "Another description", "Repeated subfield"]
    # $0 injected by to_mrc round-trips into a validated xref
    assert back.get_xref("650", "a") == 1
    assert back.get_value("650", "a") == "Header"
    # second serialization is byte-identical (leader is regenerated the
    # same way both times)
    assert back.to_mrc() == mrc


def test_from_mrc_multibyte(auth_index):
    rec = Bib({"_id": 9, "245": [{"indicators": [" ", " "],
               "subfields": [{"code": "a", "value": "Naïve Œuvre — 日本"}]}]},
              auth_index=auth_index)
    mrc = rec.to_mrc()
    # directory lengths count UTF-8 bytes, not characters
    assert int(mrc[:5]) == len(mrc.encode("utf-8"))
    back = Bib.from_mrc(mrc, auth_index=auth_index)
    assert back.get_value("245", "a") == "Naïve Œuvre — 日本"
    assert back.to_mrc() == mrc


def test_set_from_mrc(bibs, auth_index):
    mrc = bibs.to_mrc()
    back = BibSet.from_mrc(mrc, auth_index=auth_index)
    recs = list(back)
    assert len(recs) == 2
    assert recs[1].get_value("245", "a") == "Another"


def test_from_mrc_malformed():
    from dlx_spark.marc.serialization import InvalidRecordString
    with pytest.raises(InvalidRecordString):
        Bib.from_mrc("too short")
    with pytest.raises(InvalidRecordString):
        Bib.from_mrc("x" * 30)  # no directory terminator


def test_to_mij(bib1):
    mij = json.loads(bib1.to_mij())
    assert mij["leader"] == "leader"
    f245 = next(f["245"] for f in mij["fields"] if "245" in f)
    assert f245["subfields"][0] == {"a": "This"}


def test_to_jmarcnx(bib1):
    nx = json.loads(bib1.to_jmarcnx())
    assert nx["650"][0]["subfields"][0] == {"code": "a", "value": "Header"}


def test_json_roundtrip(bib1, auth_index):
    back = Bib.from_json(bib1.to_json(), auth_index=auth_index)
    assert back.get_value("245", "b") == "is the"
    assert back.get_xref("650", "a") == 1


def test_to_str(bib1):
    s = bib1.to_str()
    assert "245\n" in s
    assert "   a: This\n" in s


def test_to_table_and_csv(bibs):
    table = bibs.to_table()
    assert table.get(1, "1.001") == "1"
    assert table.get(1, "1.245$a") == "This"
    assert table.get(1, "2.520$a") == "Another description||Repeated subfield"
    assert table.get(1, "1.650$0") == "1"
    assert table.get(2, "1.245$a") == "Another"
    csv_text = bibs.to_csv()
    assert csv_text.splitlines()[0].startswith("1.001")


def test_from_table_ingest(auth_index):
    from dlx_spark.util import Table
    table = Table([
        ["1.001", "1.245$a", "1.245$b", "1.650$a", "2.650$a"],
        ["99", "Title here", "subtitle", "Header", ""],
    ])
    ms = BibSet.from_table(table, auth_control=True, auth_index=auth_index)
    recs = list(ms)
    assert recs[0].id == 99
    assert recs[0].get_value("245", "a") == "Title here"
    assert recs[0].get_xref("650", "a") == 1       # value resolved to xref
    assert len(recs[0].get_fields("650")) == 1     # empty 2.650 dropped


def _write_minimal_xlsx(path, rows):
    """Build a spec-minimal xlsx: shared strings for text, bare <v> for
    numbers — enough to exercise the stdlib zip+XML reader."""
    import zipfile

    shared, sheet_rows = [], []
    for i, row in enumerate(rows, start=1):
        cells = []
        for j, cell in enumerate(row):
            col = chr(ord("A") + j)
            if isinstance(cell, (int, float)):
                cells.append(f'<c r="{col}{i}"><v>{cell}</v></c>')
            else:
                shared.append(str(cell))
                cells.append(f'<c r="{col}{i}" t="s"><v>{len(shared) - 1}</v></c>')
        sheet_rows.append(f'<row r="{i}">{"".join(cells)}</row>')

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/sharedStrings.xml",
                   f'<?xml version="1.0"?><sst {ns}>' +
                   "".join(f"<si><t>{s}</t></si>" for s in shared) + "</sst>")
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<?xml version="1.0"?><worksheet {ns}><sheetData>' +
                   "".join(sheet_rows) + "</sheetData></worksheet>")


def test_from_excel_stdlib(tmp_path, auth_index, monkeypatch):
    # force the stdlib fallback even when openpyxl is installed (the
    # minimal zip here lacks workbook.xml, which openpyxl requires)
    import sys
    monkeypatch.setitem(sys.modules, "openpyxl", None)
    path = str(tmp_path / "records.xlsx")
    _write_minimal_xlsx(path, [
        ["1.001", "1.245$a", "1.650$a"],
        [99, "Excel Title", "Header"],
    ])
    from dlx_spark.util import Table
    t = Table.from_excel(path)
    assert t.header == ["1.001", "1.245$a", "1.650$a"]
    assert t.get(0, "1.001") == "99"          # int-valued float → int string

    ms = BibSet.from_excel(path, auth_control=True, auth_index=auth_index)
    recs = list(ms)
    assert recs[0].id == 99
    assert recs[0].get_value("245", "a") == "Excel Title"
    assert recs[0].get_xref("650", "a") == 1


def _assert_excel_roundtrip(tmp_path, tag):
    bibs = BibSet.from_mrk(
        "=001  7\n=245  10$aWritten Title$bsub\n\n=001  8\n=245  00$aSecond\n")
    path = str(tmp_path / f"out_{tag}.xlsx")
    bibs.to_excel(path)
    back = BibSet.from_excel(path, auth_control=False)
    recs = sorted(back, key=lambda r: r.id)
    assert [r.id for r in recs] == [7, 8]
    assert recs[0].get_value("245", "a") == "Written Title"
    assert recs[0].get_value("245", "b") == "sub"
    assert recs[1].get_value("245", "a") == "Second"


def test_to_excel_roundtrip_stdlib(tmp_path, monkeypatch):
    # reference to_excel is a stub (dlx/marc/__init__.py:390-391); ours
    # must round-trip through from_excel
    import sys
    monkeypatch.setitem(sys.modules, "openpyxl", None)
    _assert_excel_roundtrip(tmp_path, "stdlib")


def test_to_excel_roundtrip_openpyxl(tmp_path):
    # visible skip (not a silent stdlib re-run) when openpyxl is absent
    pytest.importorskip("openpyxl")
    _assert_excel_roundtrip(tmp_path, "openpyxl")


def test_to_excel_control_chars_stay_well_formed(tmp_path, monkeypatch):
    # a stray MARC separator byte must not corrupt the sheet XML; it is
    # encoded the OOXML way (_xHHHH_) and the file stays readable
    import sys
    monkeypatch.setitem(sys.modules, "openpyxl", None)
    from dlx_spark.util import Table
    t = Table([["col"], ["bad\x1dvalue"]])
    path = str(tmp_path / "ctrl.xlsx")
    t.to_excel(path)
    back = Table.from_excel(path)
    assert back.get(0, "col") == "bad_x001D_value"


def test_xlsx_stdlib_row_gaps(tmp_path, monkeypatch):
    # a row omitted from sheetData (entirely blank) still occupies a
    # slot, matching openpyxl's iter_rows behavior
    import sys
    monkeypatch.setitem(sys.modules, "openpyxl", None)
    import zipfile
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    path = str(tmp_path / "gaps.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<worksheet {ns}><sheetData>'
                   '<row r="1"><c r="A1"><v>1</v></c></row>'
                   '<row r="3"><c r="A3"><v>3</v></c></row>'
                   '</sheetData></worksheet>')
    from dlx_spark.util import _xlsx_rows_stdlib
    rows = _xlsx_rows_stdlib(path)
    assert len(rows) == 3
    # gap row padded to uniform width, like openpyxl's (None,) row
    assert rows[0] == ["1"] and rows[1] == [""] and rows[2] == ["3"]


def test_from_table_errors(auth_index):
    from dlx_spark.util import Table
    table = Table([
        ["1.245$a", "1.650$a"],
        ["T", "No such heading"],
    ])
    with pytest.raises(Exception, match="invalid authority-controlled value"):
        BibSet.from_table(table, auth_control=True, auth_index=auth_index)
    # two distinct headers addressing the same (instance, tag, code) slot
    # ('1.245$a' and '1.245a' both parse to instance 0, tag 245, code a)
    table2 = Table([["1.245$a", "1.245a"], ["a", "b"]])
    with pytest.raises(Exception, match="repeated"):
        BibSet.from_table(table2, auth_control=False, auth_index=auth_index)


def test_from_csv_single_record(auth_index):
    rec = Bib.from_csv('1.245$a,1.269$a\n"Some, quoted title",1999-12-31',
                       auth_index=auth_index)
    assert rec.get_value("245", "a") == "Some, quoted title"
    assert rec.get_value("269", "a") == "1999-12-31"


def test_indicator_columns(auth_index):
    from dlx_spark.util import Table
    table = Table([
        ["1.245__", "1.245$a"],
        ["12", "X"],
    ])
    recs = list(BibSet.from_table(table, auth_control=False, auth_index=auth_index))
    f = recs[0].get_field("245")
    assert f.ind1 == "1" and f.ind2 == "2"


# --- translated serializations (reference dlx/marc/__init__.py:1560-1608,
# Config.auth_language_tag dlx/config.py:99-102) --------------------------

TRANS_AUTH = {
    "_id": 9,
    "150": [{"indicators": [" ", " "],
             "subfields": [{"code": "a", "value": "Climate change"}]}],
    # translations live in the language tags mapped by auth_language_tag
    "993": [{"indicators": [" ", " "],
             "subfields": [{"code": "a", "value": "Changement climatique"}]}],
    "994": [{"indicators": [" ", " "],
             "subfields": [{"code": "a", "value": "Cambio climatico"}]}],
}

TRANS_BIB = {
    "_id": 7,
    "245": [{"indicators": [" ", " "],
             "subfields": [{"code": "a", "value": "A title"}]}],
    "650": [{"indicators": [" ", " "], "subfields": [{"code": "a", "xref": 9}]}],
}


@pytest.fixture
def trans_bib():
    from dlx_spark.marc import AuthSet
    idx = AuthSet.from_dicts([TRANS_AUTH]).build_index()
    return Bib(TRANS_BIB, auth_index=idx)


def test_to_xml_translated(trans_bib):
    xml_fr = trans_bib.to_xml(language="fr")
    assert '<subfield code="a">Changement climatique</subfield>' in xml_fr
    assert '<subfield code="0">9</subfield>' in xml_fr     # xref still emitted
    assert "A title" in xml_fr                             # unlinked untouched
    xml_es = trans_bib.to_xml(language="es")
    assert "Cambio climatico" in xml_es
    # no language -> base heading
    assert '<subfield code="a">Climate change</subfield>' in trans_bib.to_xml()


def test_to_mrk_translated(trans_bib):
    assert "$aChangement climatique$09" in trans_bib.to_mrk(language="fr")
    assert "$aClimate change$09" in trans_bib.to_mrk()


def test_heading_value_by_language(trans_bib):
    auth = trans_bib.get_field("650").subfields[0]._auth_index.get(9)
    assert auth.heading_value("a") == "Climate change"
    assert auth.heading_value("a", "fr") == "Changement climatique"
    assert auth.heading_value("a", "es") == "Cambio climatico"
    # unmapped language falls back to None (reference returns None)
    assert auth.heading_value("a", "zz") is None


def test_excel_marc_script(tmp_path, capsys):
    """Reference dlx/scripts/excel_marc.py parity: excel in, defaults
    merged, 008 language splice, mrk out."""
    from dlx_spark.scripts import excel_marc

    src = BibSet.from_mrk(
        "=001  1\n=041  \\\\$afre\n=049  \\\\$aENG\n=245  10$aExcel record\n")
    path = str(tmp_path / "in.xlsx")
    src.to_excel(path)

    dset = BibSet.from_mrk("=500  \\\\$aDefault note\n")
    dpath = str(tmp_path / "defaults.xlsx")
    dset.to_excel(dpath, write_id=False)

    out = str(tmp_path / "out.mrk")
    assert excel_marc.run(["--file", path, "--type", "bib", "--format", "mrk",
                           "--defaults", dpath, "--out", out]) == 0
    text = open(out).read()
    assert "$aExcel record" in text
    assert "$aDefault note" in text          # defaults filled in
    m = [l for l in text.splitlines() if l.startswith("=008")]
    assert m and "ENG" in m[0] and "fre" in m[0]   # 008 splice applied


def test_json_roundtrip_preserves_timestamps():
    """to_json stringifies audit datetimes (default=str); parsing the
    JSON back must coerce them to datetime so to_row() fits the
    TimestampType columns — the jsonl export/ingest round trip."""
    import json as _json
    from datetime import datetime

    b = Bib({"_id": 5, "245": [{"indicators": [" ", " "],
                                "subfields": [{"code": "a", "value": "T"}]}]})
    b.created = b.updated = datetime(2026, 3, 4, 5, 6, 7, 123456)
    back = Bib(_json.loads(b.to_json()))
    assert back.created == b.created and isinstance(back.created, datetime)
    assert back.to_row()["created"] == b.created
