"""Record and set (de)serializations: MRK, MARCXML, MIJ, JMARC JSON,
jmarcnx, ISO 2709 (mrc), table/CSV/TSV/Excel.

Formats and addressing mirror the reference
(``/root/reference/dlx/marc/__init__.py:145-431, 1450-1789, 2645-2666``)
and are golden-tested against the shapes of its ``tests/marc.mrk`` /
``tests/marc.xml`` fixtures.  Methods are attached to the record/set
classes at import (``dlx_spark.marc`` imports this module).

Set-scale distributed IO lives in ``dlx_spark.sources``.
"""

from __future__ import annotations

import copy
import csv as _csv
import json
import re
from xml.etree import ElementTree

from dlx_spark import config
from dlx_spark.marc.record import (
    AmbiguousAuthValue,
    AuthIndex,
    Controlfield,
    Datafield,
    InvalidAuthValue,
    InvalidAuthXref,
    Linked,
    Literal,
    Marc,
)
from dlx_spark.marc.set import AuthSet, BibSet, MarcSet
from dlx_spark.util import Table


class InvalidRecordString(Exception):
    def __init__(self, string, reason):
        super().__init__(f"{reason}: {string[:80]}")


# ---------------------------------------------------------------------------
# Field-level
# ---------------------------------------------------------------------------

def _field_to_mrk(field: Datafield, record_type: str, language: str | None = None) -> str:
    inds = (field.ind1 + field.ind2).replace(" ", "\\").replace("_", "\\")
    subfields = list(field.subfields)
    # inject first xref as $0 unless $0 already present
    linked = next((s for s in subfields if isinstance(s, Linked)), None)
    if linked is not None and not any(s.code == "0" for s in subfields):
        subfields.append(Literal("0", str(linked.xref)))

    out = f"={field.tag}  {inds}"
    for sub in subfields:
        value = sub.value
        if language and config.linked_language_source_tag(record_type, field.tag, sub.code, language):
            value = sub.translated(language)
        out += f"${sub.code}{value if value is not None else ''}"
    return out


def _field_to_mrc(field, record_type: str, language: str | None = None,
                  term: str = "\u001e") -> str:
    if isinstance(field, Controlfield):
        return field.value + term
    # inject first xref as $0 unless $0 already present (same rule as
    # _field_to_mrk) so mrc round-trips preserve authority links
    subfields = list(field.subfields)
    linked = next((s for s in subfields if isinstance(s, Linked)), None)
    if linked is not None and not any(s.code == "0" for s in subfields):
        subfields.append(Literal("0", str(linked.xref)))
    text = field.ind1 + field.ind2
    for sub in subfields:
        value = sub.value
        if language and config.linked_language_source_tag(record_type, field.tag, sub.code, language):
            value = sub.translated(language)
        text += "\u001f" + sub.code + (value or "")
    return text + term


def _field_to_mij(field) -> dict:
    if isinstance(field, Controlfield):
        return {field.tag: field.value}
    return {field.tag: {
        "ind1": field.ind1, "ind2": field.ind2,
        "subfields": [{s.code: s.value} for s in field.subfields],
    }}


# ---------------------------------------------------------------------------
# Record-level serializations
# ---------------------------------------------------------------------------

def to_mrk(self: Marc, *tags, language: str | None = None, write_id: bool = True) -> str:
    record = copy.deepcopy(self)
    if write_id and record.id is not None:
        record.set("001", None, str(record.id))
    if not record.get_value("000"):
        record.set("000", None, "****")
    lines = []
    for field in record.get_fields(*tags):
        if isinstance(field, Controlfield):
            lines.append(f"={field.tag}  {field.value}")
        else:
            lines.append(_field_to_mrk(field, record.record_type, language))
    return "\n".join(lines) + "\n"


def to_mrc(self: Marc, *tags, language: str | None = None, write_id: bool = True) -> str:
    """ISO 2709 with byte-length directory arithmetic (reference
    dlx/marc/__init__.py:1487-1527)."""
    record = copy.deepcopy(self)
    if write_id and record.id is not None:
        record.set("001", None, str(record.id))

    directory, data, next_start = "", "", 0
    for f in (x for x in record.get_fields(*tags) if x.tag != "000"):
        text = _field_to_mrc(f, record.record_type, language)
        data += text
        field_length = len(text.encode("utf-8"))
        directory += f.tag + str(field_length).zfill(4) + str(next_start).zfill(5)
        next_start += field_length

    directory += "\u001e"  # field terminator
    data += "\u001d"  # record terminator
    leader_dir_len = len(directory.encode("utf-8")) + 24
    base_address = str(leader_dir_len).zfill(5)
    total_len = str(leader_dir_len + len(data.encode("utf-8"))).zfill(5)

    leader = record.get_value("000") or ""
    if not leader:
        leader = "|" * 24
    elif len(leader) < 24:
        leader = leader.ljust(24, "|")

    new_leader = total_len + leader[5:9] + "a" + "22" + base_address + leader[17:20] + "4500"
    return new_leader + directory + data


def to_xml_raw(self: Marc, *tags, language: str | None = None, xref_prefix: str = "",
               write_id: bool = True) -> ElementTree.Element:
    record = copy.deepcopy(self)
    if write_id and record.id is not None:
        record.set("001", None, str(record.id))

    root = ElementTree.Element("record")
    for field in record.get_fields(*tags):
        if isinstance(field, Controlfield):
            node = ElementTree.SubElement(root, "controlfield")
            node.set("tag", field.tag)
            node.text = field.value
        else:
            node = ElementTree.SubElement(root, "datafield")
            node.set("tag", field.tag)
            node.set("ind1", field.ind1)
            node.set("ind2", field.ind2)
            xref = None
            for sub in field.subfields:
                val = sub.value
                if not val:
                    continue
                if isinstance(sub, Linked):
                    xref = sub.xref
                subnode = ElementTree.SubElement(node, "subfield")
                subnode.set("code", sub.code)
                if language and config.linked_language_source_tag(
                        record.record_type, field.tag, sub.code, language):
                    subnode.text = sub.translated(language)
                    continue
                subnode.text = val
            if xref:
                subnode = ElementTree.SubElement(node, "subfield")
                subnode.set("code", "0")
                subnode.text = xref_prefix + str(xref)
    return root


def to_xml(self: Marc, *tags, language: str | None = None, xref_prefix: str = "",
           write_id: bool = True) -> str:
    return ElementTree.tostring(
        self.to_xml_raw(*tags, language=language, xref_prefix=xref_prefix,
                        write_id=write_id),
        encoding="utf-8").decode("utf-8")


def to_mij(self: Marc) -> str:
    return json.dumps({
        "leader": self.get_value("000"),
        "fields": [_field_to_mij(f) for f in self.get_fields()],
    })


def to_json(self: Marc, to_indent=None) -> str:
    return json.dumps(self.to_dict(), indent=to_indent, default=str)


def to_jmarcnx(self: Marc) -> str:
    """JMARC with all xrefs resolved to literals (reference
    dlx/marc/__init__.py:1610-1626)."""
    xrec = type(self)(auth_index=self._auth_index)
    xrec.id = self.id
    for field in self.get_fields():
        if isinstance(field, Controlfield):
            xrec.fields.append(Controlfield(field.tag, field.value))
        else:
            subs = [Literal(s.code, s.value) for s in field.subfields]
            xrec.fields.append(Datafield(field.tag, field.ind1, field.ind2, subs,
                                         self.record_type))
    return xrec.to_json()


def to_str(self: Marc, *tags, language: str | None = None) -> str:
    out = ""
    for field in self.get_fields(*tags):
        out += field.tag + "\n"
        if isinstance(field, Controlfield):
            out += "   " + (field.value or "") + "\n"
        else:
            for sub in field.subfields:
                val = sub.value
                if language and config.linked_language_source_tag(
                        self.record_type, field.tag, sub.code, language):
                    val = sub.translated(language)
                out += "   " + sub.code + ": " + (val or "") + "\n"
    return out


# ---------------------------------------------------------------------------
# Record-level deserializations
# ---------------------------------------------------------------------------

def from_mrk(cls, string: str, auth_control: bool = True,
             delete_subfield_zero: bool = True,
             auth_index: AuthIndex | None = None):
    self = cls(auth_index=auth_index)
    idx = auth_index
    last_tag = 0

    for line in filter(None, string.split("\n")):
        match = re.match(r"=(\w{3})  (.*)", line)
        if not match:
            raise InvalidRecordString(string, f"Unparseable line {line!r}")
        tag, rest = match.group(1), match.group(2)
        if tag == "LDR":
            tag = "000"

        if tag.isdigit():
            if int(tag) < int(last_tag):
                raise InvalidRecordString(string, "Tag order does not look valid")
            last_tag = tag

        if tag[:2] == "00":
            field = Controlfield(tag, rest)
            if tag == "001":
                self.id = int(field.value)
        else:
            ind1, ind2 = (c.replace("\\", " ") for c in rest[:2])
            field = Datafield(tag=tag, ind1=ind1, ind2=ind2,
                              record_type=cls.record_type, auth_index=idx)
            xref_m = re.search(r"\$0(\d+)", rest[2:])
            xref = int(xref_m.group(1)) if xref_m else None

            ambiguous = []
            code = None
            for chunk in filter(None, rest[2:].split("$")):
                code, value = chunk[0], chunk[1:]
                if config.is_authority_controlled(self.record_type, tag, code):
                    value = xref if xref else value
                try:
                    field.set(code, value, place="+", auth_control=auth_control)
                except AmbiguousAuthValue:
                    ambiguous.append(Literal(code, value))

            if ambiguous:
                resolved = idx.resolve_ambiguous(self.record_type, tag, ambiguous) if idx else None
                if resolved:
                    field.set(code, resolved, place="+", auth_control=auth_control)
                else:
                    raise AmbiguousAuthValue(self.record_type, field.tag, "*",
                                             str([x.value for x in ambiguous]))

            if delete_subfield_zero:
                field.subfields = [s for s in field.subfields if s.code != "0"]

        self.fields.append(field)
    return self


def from_mrc(cls, string: str, auth_control: bool = True,
             delete_subfield_zero: bool = True,
             auth_index: AuthIndex | None = None):
    """ISO 2709 parse — the inverse of ``to_mrc``.

    The reference's Marc.from_mrc (dlx/marc/__init__.py:1633-1649) is an
    unfinished stub that raises; this is a complete reader.  Field
    boundaries come from the \\x1e terminators (cross-checked against the
    directory's tag sequence), so byte-offset arithmetic in a decoded
    string cannot drift on multi-byte UTF-8.  ``$0`` / auth handling
    matches ``from_mrk``: xrefs are captured, ambiguity resolves via the
    index, ``delete_subfield_zero=False`` preserves ``$0`` for
    join-based downstream resolution.
    """
    if len(string) < 24:
        raise InvalidRecordString(string, "Record shorter than a leader")
    leader = string[:24]
    body = string[24:]
    dir_end = body.find("\u001e")
    if dir_end < 0 or dir_end % 12 != 0:
        raise InvalidRecordString(string, "Malformed directory")
    entries = [body[i:i + 12] for i in range(0, dir_end, 12)]
    tags = [e[:3] for e in entries]

    data = body[dir_end + 1:]
    if data.endswith("\u001d"):
        data = data[:-1]
    segments = data.split("\u001e")
    if segments and segments[-1] == "":
        segments.pop()
    if len(segments) != len(tags):
        raise InvalidRecordString(
            string, f"Directory lists {len(tags)} fields, data has {len(segments)}")

    self = cls(auth_index=auth_index)
    self.set("000", None, leader)
    for tag, seg in zip(tags, segments):
        if tag[:2] == "00":
            field = Controlfield(tag, seg)
            if tag == "001" and seg.strip().isdigit():
                self.id = int(seg.strip())
        else:
            ind1, ind2 = (seg[:2] + "  ")[0], (seg[:2] + "  ")[1]
            field = Datafield(tag=tag, ind1=ind1, ind2=ind2,
                              record_type=cls.record_type, auth_index=auth_index)
            xref_m = re.search("\u001f0(\\d+)", seg)
            xref = int(xref_m.group(1)) if xref_m else None
            ambiguous = []
            code = None
            for chunk in filter(None, seg[2:].split("\u001f")):
                code, value = chunk[0], chunk[1:]
                if config.is_authority_controlled(self.record_type, tag, code):
                    value = xref if xref else value
                try:
                    field.set(code, value, place="+", auth_control=auth_control)
                except AmbiguousAuthValue:
                    ambiguous.append(Literal(code, value))
            if ambiguous:
                resolved = (auth_index.resolve_ambiguous(self.record_type, tag, ambiguous)
                            if auth_index else None)
                if resolved:
                    field.set(code, resolved, place="+", auth_control=auth_control)
                else:
                    raise AmbiguousAuthValue(self.record_type, field.tag, "*",
                                             str([x.value for x in ambiguous]))
            if delete_subfield_zero:
                field.subfields = [s for s in field.subfields if s.code != "0"]
        self.fields.append(field)
    return self


def set_from_mrc(cls, string: str, *, auth_control: bool = True,
                 auth_index: AuthIndex | None = None):
    records = []
    pos = 0
    while pos < len(string):
        end = string.find("\u001d", pos)
        if end < 0:
            break
        records.append(cls.record_class.from_mrc(
            string[pos:end + 1], auth_control=auth_control, auth_index=auth_index))
        pos = end + 1
    return cls(records=records, auth_index=auth_index)


def from_xml_raw(cls, root: ElementTree.Element, *, auth_control: bool = True,
                 delete_subfield_zero: bool = True,
                 auth_index: AuthIndex | None = None):
    self = cls(auth_index=auth_index)
    idx = auth_index

    for node in (x for x in root if re.search("controlfield$", x.tag)):
        tag, value = node.attrib["tag"], node.text
        if tag == "001":
            self.id = int(value)
        self.fields.append(Controlfield(tag, value))

    for field_node in (x for x in root if re.search("datafield$", x.tag)):
        tag = field_node.attrib["tag"]
        field = Datafield(tag=tag, ind1=field_node.attrib["ind1"],
                          ind2=field_node.attrib["ind2"],
                          record_type=cls.record_type, auth_index=idx)
        sub_nodes = [x for x in field_node if re.search("subfield$", x.tag)]

        xref = None
        for sn in sub_nodes:
            if sn.attrib["code"] == "0":
                digits = "".join(c for c in (sn.text or "") if c.isdigit())
                # non-numeric $0 is not an xref (the reference crashes
                # here with int('') — guarded deliberately)
                if digits:
                    xref = int(digits)

        ambiguous = []
        for sn in sub_nodes:
            code = sn.attrib["code"]
            if auth_control and config.is_authority_controlled(self.record_type, tag, code):
                value = xref if xref else sn.text
            else:
                value = str(sn.text)
            try:
                field.set(code, value, auth_control=auth_control, place="+")
            except AmbiguousAuthValue:
                ambiguous.append(Literal(code, value))

            if ambiguous:
                resolved = idx.resolve_ambiguous(self.record_type, tag, ambiguous) if idx else None
                if resolved:
                    field.set(code, resolved, auth_control=auth_control, place="+")
                else:
                    raise AmbiguousAuthValue(self.record_type, tag, "*",
                                             str([x.value for x in ambiguous]))

        if delete_subfield_zero:
            field.subfields = [s for s in field.subfields if s.code != "0"]
        self.fields.append(field)
    return self


def from_xml(cls, string: str, auth_control: bool = True,
             delete_subfield_zero: bool = True, auth_index: AuthIndex | None = None):
    return cls.from_xml_raw(ElementTree.fromstring(string), auth_control=auth_control,
                            delete_subfield_zero=delete_subfield_zero,
                            auth_index=auth_index)


def from_mij(cls, string: str, auth_index: AuthIndex | None = None):
    data = json.loads(string)
    self = cls(auth_index=auth_index)
    if data.get("leader"):
        self.fields.append(Controlfield("000", data["leader"]))
    for fd in data.get("fields", []):
        for tag, body in fd.items():
            if isinstance(body, str):
                self.fields.append(Controlfield(tag, body))
            else:
                subs = []
                for sd in body.get("subfields", []):
                    for code, value in sd.items():
                        subs.append(Literal(code, value))
                self.fields.append(Datafield(tag, body.get("ind1", " "),
                                             body.get("ind2", " "), subs,
                                             cls.record_type, auth_index))
    return self


def from_json(cls, string: str, auth_index: AuthIndex | None = None):
    return cls(json.loads(string), auth_index=auth_index)


# ---------------------------------------------------------------------------
# Set-level
# ---------------------------------------------------------------------------

def set_to_mrk(self: MarcSet, *, write_id: bool = True) -> str:
    return "\n".join(r.to_mrk(write_id=write_id) for r in self.records())


def set_to_mrc(self: MarcSet, *, write_id: bool = True) -> str:
    return "".join(r.to_mrc(write_id=write_id) for r in self.records())


def set_to_xml(self: MarcSet, *, xref_prefix: str = "", write_id: bool = True) -> str:
    root = ElementTree.Element("collection")
    for record in self.records():
        root.append(record.to_xml_raw(xref_prefix=xref_prefix, write_id=write_id))
    return ElementTree.tostring(root, encoding="utf-8").decode("utf-8")


def set_to_str(self: MarcSet) -> str:
    return "\n".join(r.to_str() for r in self.records())


def sort_table_header(header: list[str]) -> list[str]:
    try:
        return sorted(header, key=lambda x: (
            re.match(r"\d+\.(\w{3})", x).group(1),
            int(re.match(r"(\d+)\.", x).group(1)),
            (re.match(r"\d+\.\d{3}\$?(\w)?", x).group(1) or ""),
        ))
    except AttributeError:
        raise Exception("Table header could not be parsed: " + str(header))


def set_to_table(self: MarcSet, *, write_id: bool = True) -> Table:
    table = Table()
    for i, record in enumerate(self.records()):
        i += 1
        if write_id and record.id is not None:
            table.set(i, "1.001", str(record.id))
        elif field := record.get_field("001"):
            table.set(i, "1.001", field.value)

        for tag in (t for t in record.get_tags() if not re.match("00", t)):
            for place, field in enumerate(record.get_fields(tag)):
                place += 1
                table.set(i, f"{place}.{field.tag}__",
                          "".join(c if c != " " else "_" for c in field.indicators))
                xref = None
                for subfield in field.subfields:
                    table.set(i, f"{place}.{field.tag}${subfield.code}",
                              subfield.value or "")
                    if isinstance(subfield, Linked):
                        xref = subfield.xref
                if xref:
                    table.set(i, f"{place}.{field.tag}$0", str(xref))

    table.header = sort_table_header(table.header)
    return table


def set_to_csv(self: MarcSet, *, write_id: bool = True) -> str:
    return self.to_table(write_id=write_id).to_csv()


def set_to_tsv(self: MarcSet, *, write_id: bool = True) -> str:
    return self.to_table(write_id=write_id).to_tsv()


def set_from_mrk(cls, string: str, *, auth_control: bool = True,
                 auth_index: AuthIndex | None = None):
    records = []
    for chunk in string.split("\n\n"):
        if not chunk.strip():
            continue
        rec = cls.record_class.from_mrk(chunk, auth_control=auth_control,
                                        auth_index=auth_index)
        if rec.fields:
            records.append(rec)
    return cls(records=records, auth_index=auth_index)


def set_from_xml(cls, string: str, auth_control: bool = False,
                 delete_subfield_zero: bool = True,
                 auth_index: AuthIndex | None = None):
    root = ElementTree.fromstring(string)
    records = []
    # handle namespaced and plain 'record' elements
    for r in (x for x in root.iter() if re.search("record$", x.tag)):
        records.append(cls.record_class.from_xml_raw(
            r, auth_control=auth_control,
            delete_subfield_zero=delete_subfield_zero, auth_index=auth_index))
    return cls(records=records, auth_index=auth_index)


def set_from_table(cls, table: Table, auth_control: bool = True,
                   field_check: str | None = None, delete_subfield_zero: bool = True,
                   auth_index: AuthIndex | None = None,
                   existing_check=None):
    """Tabular ingest (reference dlx/marc/__init__.py:162-284): headers
    ``{place}.{tag}${code}`` / ``{place}.{tag}__`` (indicators); first
    pass sets placeholder values without auth control, second pass
    validates auth-controlled values ($0 xref, then value xlookup, then
    multi-subfield disambiguation) and aggregates ALL exceptions.
    ``existing_check(tag, code, value) -> bool`` supplies the
    ``field_check`` uniqueness probe (a store lookup at set scale)."""
    self = cls(records=[], auth_index=auth_index)
    idx = auth_index
    exceptions: list[Exception] = []

    for temp_id in table.index.keys():
        record = cls.record_class(auth_index=auth_index)
        header_fields = sort_table_header(list(table.index[temp_id].keys()))

        for field_name in header_fields:
            instance = 0
            value = table.index[temp_id][field_name]
            tag, code, is_indicator_col = "", "", False

            if match := re.match(r"^(([1-9]\d*)\.)?(\d{3})(\$|__)?([a-z0-9])?", str(field_name)):
                if match.group(1):
                    instance = int(match.group(2)) - 1
                if match.group(4) == "__":
                    tag, is_indicator_col = match.group(3), True
                else:
                    tag, code = match.group(3), match.group(5)
            else:
                exceptions.append(Exception(f'Invalid column header "{field_name}"'))
                continue

            if not is_indicator_col and record.get_value(tag, code, address=[instance, 0]):
                exceptions.append(Exception(f"Column header {instance}.{tag}{code} is repeated"))
                continue

            if tag == "001" and value:
                record.id = int(value)

            field = record.get_field(tag, place=instance)
            address = [instance] if field else ["+"]

            if is_indicator_col:
                if not value:
                    pass
                elif len(value) == 2:
                    record.set(tag, None, None, ind1=value[0], ind2=value[1])
                else:
                    exceptions.append(Exception(f"Invalid indicators: {value}"))
            else:
                record.set(tag, code, value or "__null__", address=address,
                           auth_control=False)

        # second pass: auth validation / checks
        for field in [f for f in record.fields if isinstance(f, Datafield)]:
            if all(s.value == "__null__" for s in field.subfields):
                record.delete_field(field)
                continue

            for i, subfield in enumerate(field.subfields):
                if subfield.value == "__null__":
                    subfield.value = ""
                    continue
                rtype, tag, code, value = (record.record_type, field.tag,
                                           subfield.code, subfield.value)

                if field_check and field_check == tag + (code or ""):
                    if existing_check and existing_check(tag, code, value):
                        exceptions.append(Exception(
                            f'{tag}${code}: "{value}" is already in the system'))
                        continue

                if auth_control and config.is_authority_controlled(rtype, tag, code):
                    if xref := field.get_value("0"):
                        try:
                            xref = int(xref)
                        except ValueError:
                            exceptions.append(InvalidAuthXref(rtype, tag, code, xref))
                            continue
                        if idx and idx.lookup(xref, code):
                            field.subfields[i] = Linked(code, xref, auth_index=idx)
                        else:
                            exceptions.append(InvalidAuthXref(rtype, tag, code, xref))
                            continue
                    elif subfield.value:
                        src = config.authority_source_tag(rtype, tag, code)
                        xrefs = idx.xlookup(src, code, value) if idx else []
                        if len(xrefs) == 1:
                            field.subfields[i] = Linked(code, xrefs[0], auth_index=idx)
                        elif len(xrefs) > 1:
                            auth_ctrled = [s for s in field.subfields
                                           if config.is_authority_controlled(rtype, tag, s.code)]
                            if resolved := idx.resolve_ambiguous(rtype, tag, auth_ctrled):
                                field.subfields[i] = Linked(code, resolved, auth_index=idx)
                            else:
                                exceptions.append(AmbiguousAuthValue(rtype, tag, code, value))
                                continue
                        else:
                            exceptions.append(InvalidAuthValue(rtype, tag, code, value))
                            continue

            if auth_control and delete_subfield_zero:
                field.subfields = [s for s in field.subfields if s.code != "0"]

        self._records.append(record)

    if exceptions:
        raise Exception("\n".join(str(x) for x in exceptions))
    return self


def set_to_excel(self: MarcSet, path: str, *, write_id: bool = True) -> None:
    """Write the set as a single-sheet XLSX (place.tag$code columns,
    same pivot as to_table).  The reference's to_excel is an unfinished
    stub (dlx/marc/__init__.py:390-391); this one round-trips through
    from_excel."""
    set_to_table(self, write_id=write_id).to_excel(path)


def set_from_csv(cls, string: str, auth_control: bool = False,
                 auth_index: AuthIndex | None = None, **kwargs):
    rows = [row for row in _csv.reader(string.split("\n")) if row]
    return cls.from_table(Table(rows), auth_control=auth_control,
                          auth_index=auth_index, **kwargs)


def set_from_excel(cls, path: str, auth_control: bool = True,
                   field_check: str | None = None, date_format: str = "%Y%m%d",
                   auth_index: AuthIndex | None = None):
    table = Table.from_excel(path, date_format=date_format)
    return cls.from_table(table, auth_control=auth_control,
                          field_check=field_check, auth_index=auth_index)


def record_from_table(cls, list_of_lists: list[list], auth_control: bool = False,
                      auth_index: AuthIndex | None = None):
    if len(list_of_lists) != 2:
        raise Exception("Table must contain exactly one header line and one data line: "
                        + str(list_of_lists))
    return cls.set_class.from_table(Table(list_of_lists), auth_control=auth_control,
                                    auth_index=auth_index)._records[0]


def record_from_csv(cls, string: str, auth_control: bool = False,
                    auth_index: AuthIndex | None = None):
    rows = [row for row in _csv.reader(string.split("\n")) if row]
    return cls.set_class.from_table(Table(rows), auth_control=auth_control,
                                    auth_index=auth_index)._records[0]


# ---------------------------------------------------------------------------
# attach to classes (API parity with the reference's method surface)
# ---------------------------------------------------------------------------

Marc.to_mrk = to_mrk
Marc.to_mrc = to_mrc
Marc.to_xml_raw = to_xml_raw
Marc.to_xml = to_xml
Marc.to_mij = to_mij
Marc.to_json = to_json
Marc.to_jmarcnx = to_jmarcnx
Marc.to_str = to_str
Marc.from_mrk = classmethod(from_mrk)
Marc.from_mrc = classmethod(from_mrc)
Marc.from_xml_raw = classmethod(from_xml_raw)
Marc.from_xml = classmethod(from_xml)
Marc.from_mij = classmethod(from_mij)
Marc.from_json = classmethod(from_json)
# reference parity: from_jmarcnx is an alias of from_json (jmarcnx is
# JMARC with xrefs resolved to literals; parsing is identical —
# reference dlx/marc/__init__.py:2488-2490)
Marc.from_jmarcnx = classmethod(from_json)
Marc.from_table = classmethod(record_from_table)
Marc.from_csv = classmethod(record_from_csv)

MarcSet.to_mrk = set_to_mrk
MarcSet.to_mrc = set_to_mrc
MarcSet.to_xml = set_to_xml
MarcSet.to_str = set_to_str
MarcSet.to_table = set_to_table
MarcSet.to_excel = set_to_excel
MarcSet.to_csv = set_to_csv
MarcSet.to_tsv = set_to_tsv
MarcSet.from_mrk = classmethod(set_from_mrk)
MarcSet.from_mrc = classmethod(set_from_mrc)
MarcSet.from_xml = classmethod(set_from_xml)
MarcSet.from_table = classmethod(set_from_table)
MarcSet.from_csv = classmethod(set_from_csv)
MarcSet.from_excel = classmethod(set_from_excel)

from dlx_spark.marc.record import Bib as _Bib, Auth as _Auth  # noqa: E402

_Bib.set_class = BibSet
_Auth.set_class = AuthSet
