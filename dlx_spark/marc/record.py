"""Record-at-a-time JMARC API.

API-compatible with the reference record model
(``/root/reference/dlx/marc/__init__.py:500-2282``): tag/code/place
addressing, auth-controlled subfields, logical-field derivation, diff and
merge.  Records here are plain Python objects; set-scale operations go
through the DataFrame layer (``dlx_spark.marc.dataframe``), which treats
a record as one row of the canonical nested schema.

Unlike the reference, authority lookups resolve against an in-process
``AuthIndex`` built from the auths table (one broadcast-sized dict),
not a per-lookup database round-trip.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

from dlx_spark import config
from dlx_spark.functions.tokenizer import scrub, tokenize

TAG_RE = re.compile(r"^(\d{3}|[A-Z]{3})$")
CODE_RE = re.compile(r"^[a-z0-9]$")


class InvalidAuthXref(Exception):
    def __init__(self, rtype, tag, code, xref):
        super().__init__(f"xref (auth#) is invalid: {tag}, {code}, {xref}")


class InvalidAuthValue(Exception):
    def __init__(self, rtype, tag, code, value):
        super().__init__(f"invalid authority-controlled value: {tag}, {code}, {value}")


class AmbiguousAuthValue(Exception):
    def __init__(self, rtype, tag, code, value):
        super().__init__(f"authority-controlled value maps to multiple xrefs: {tag}, {code}, {value}")


class AuthInUse(Exception):
    def __init__(self):
        super().__init__("auth record in use")


class AuthIndex:
    """In-memory authority dimension: the lookup side of the
    authority-control join (reference ``Auth.lookup``/``Auth.xlookup``,
    dlx/marc/__init__.py:1876-1993).  Built once from the auths table
    (records or DataFrame rows) and shared; at set scale the same data
    becomes the broadcast ``auth_headings`` DataFrame."""

    def __init__(self):
        self._by_id: dict[int, "Auth"] = {}
        self._by_value: dict[tuple[str, str, str], list[int]] = {}

    def add(self, auth: "Auth") -> None:
        self._by_id[auth.id] = auth
        hf = auth.heading_field
        if hf is not None:
            for sub in hf.subfields:
                key = (hf.tag, sub.code, scrub(sub.value or ""))
                self._by_value.setdefault(key, [])
                if auth.id not in self._by_value[key]:
                    self._by_value[key].append(auth.id)

    def remove(self, auth_id: int) -> None:
        auth = self._by_id.pop(auth_id, None)
        if auth is not None:
            for key, ids in list(self._by_value.items()):
                if auth_id in ids:
                    ids.remove(auth_id)
                    if not ids:
                        del self._by_value[key]

    def lookup(self, xref: int, code: str, language: str | None = None) -> Optional[str]:
        """Resolved value of a linked subfield: the heading-field subfield
        of the same code on auth ``xref``."""
        auth = self._by_id.get(xref)
        if auth is None:
            return None
        if language:
            return auth.heading_value(code, language)
        hf = auth.heading_field
        if hf is None:
            return None
        return hf.get_value(code)

    def xlookup(self, heading_tag: str, code: str, value: str) -> list[int]:
        """Reverse join: heading (tag, code, value) → auth ids, compared
        under the strength-1 collation (scrubbed)."""
        return list(self._by_value.get((heading_tag, code, scrub(value or "")), []))

    def xlookup_regex(self, heading_tag: str, code: str, pattern: str,
                      flags: int = 0) -> list[int]:
        """Auth ids whose heading (tag, code) VALUE matches a regex —
        the reference applies the regex against auth headings for
        regex-valued conditions on controlled codes (query.py:666-668).
        Dimension-sized scan."""
        import re as _re
        rx = _re.compile(pattern, flags)
        out = []
        for auth_id, auth in self._by_id.items():
            hf = auth.heading_field
            if hf is None or hf.tag != heading_tag:
                continue
            for s in hf.subfields:
                if s.code == code and s.value and rx.search(s.value):
                    out.append(auth_id)
                    break
        return sorted(out)

    def xlookup_any_code(self, heading_tag: str, value: str) -> list[int]:
        """Auth ids whose heading of ``heading_tag`` has ANY subfield
        matching ``value`` (TagOnly expansion, reference query.py:790-797)."""
        norm = scrub(value or "")
        out = []
        for (tag, _code, v), ids in self._by_value.items():
            if tag == heading_tag and v == norm:
                out += [i for i in ids if i not in out]
        return out

    def xlookup_multi(self, heading_tag: str, pairs: list[tuple[str, str]]) -> list[int]:
        """Auth ids whose heading matches ALL (code, value) pairs
        (reference Auth.xlookup_multi, dlx/marc/__init__.py:1941-1964)."""
        candidates: Optional[set[int]] = None
        for code, value in pairs:
            ids = set(self.xlookup(heading_tag, code, value))
            candidates = ids if candidates is None else candidates & ids
        return sorted(candidates or [])

    def resolve_ambiguous(self, record_type: str, tag: str,
                          subfields: list) -> Optional[int]:
        """Multi-subfield disambiguation (reference resolve_ambiguous,
        dlx/marc/__init__.py:1966-1993): if exactly one auth matches all
        pairs, return it; with several, require exact ordered equality of
        the full heading subfield sequence."""
        from dlx_spark import config as _config
        pairs = [(s.code, s.value or "") for s in subfields]
        heading_tag = _config.authority_source_tag(record_type, tag, pairs[0][0])
        if heading_tag is None:
            return None
        matches = self.xlookup_multi(heading_tag, pairs)
        if len(matches) == 1:
            return matches[0]
        if len(matches) > 1:
            candidates = []
            for auth_id in matches:
                hf = self._by_id[auth_id].heading_field
                if pairs == [(s.code, s.value) for s in hf.subfields]:
                    candidates.append(auth_id)
            if len(candidates) == 1:
                return candidates[0]
        return None

    def exists(self, xref: int) -> bool:
        return xref in self._by_id

    def ids(self) -> Iterable[int]:
        return self._by_id.keys()

    def get(self, xref: int) -> Optional["Auth"]:
        return self._by_id.get(xref)


# A process-wide default index so the record API works standalone; the
# store layer swaps in its own per-warehouse index.
DEFAULT_AUTH_INDEX = AuthIndex()


class Subfield:
    code: str

    @staticmethod
    def from_dict(d: dict, auth_index: AuthIndex | None = None) -> "Subfield":
        if "xref" in d and d["xref"] is not None:
            return Linked(d["code"], int(d["xref"]), auth_index=auth_index, cached=d.get("value"))
        return Literal(d["code"], d.get("value"))

    def to_dict(self) -> dict:
        raise NotImplementedError

    @classmethod
    def is_linked(cls) -> bool:
        """Reference parity (dlx/marc/__init__.py:2678-2683)."""
        return cls.__name__ == "Linked"


class Literal(Subfield):
    def __init__(self, code: str, value: str | None = None):
        self.code = code
        self.value = value
        self.xref = None

    def to_dict(self) -> dict:
        return {"code": self.code, "value": self.value}

    def __repr__(self):
        return f"Literal(${self.code} {self.value!r})"


class Linked(Subfield):
    """Auth-controlled subfield: ``value`` is resolved lazily via the
    authority join (reference Linked.value → Auth.lookup,
    dlx/marc/__init__.py:2698-2717)."""

    def __init__(self, code: str, xref: int, auth_index: AuthIndex | None = None, cached: str | None = None):
        self.code = code
        self.xref = int(xref)
        self._auth_index = auth_index
        self._cached = cached

    @property
    def value(self) -> Optional[str]:
        idx = self._auth_index or DEFAULT_AUTH_INDEX
        resolved = idx.lookup(self.xref, self.code)
        if resolved is not None:
            self._cached = resolved
        return resolved if resolved is not None else self._cached

    def translated(self, language: str) -> Optional[str]:
        idx = self._auth_index or DEFAULT_AUTH_INDEX
        return idx.lookup(self.xref, self.code, language=language)

    def to_dict(self) -> dict:
        return {"code": self.code, "xref": self.xref}

    def __repr__(self):
        return f"Linked(${self.code} xref={self.xref})"


class Controlfield:
    def __init__(self, tag: str, value: str):
        self.tag = tag
        self.value = value

    def to_dict(self):
        return self.value

    def __eq__(self, other):
        return (isinstance(other, Controlfield) and self.tag == other.tag
                and self.value == other.value)

    def __hash__(self):
        return hash((self.tag, self.value))

    def __repr__(self):
        return f"Controlfield({self.tag} {self.value!r})"


class Datafield:
    def __init__(self, tag: str, ind1: str = " ", ind2: str = " ",
                 subfields: list[Subfield] | None = None,
                 record_type: str = "bib",
                 auth_index: AuthIndex | None = None):
        self.tag = tag
        self.ind1 = ind1
        self.ind2 = ind2
        self.subfields: list[Subfield] = subfields or []
        self.record_type = record_type
        self._auth_index = auth_index

    @property
    def indicators(self) -> list[str]:
        return [self.ind1, self.ind2]

    @classmethod
    def from_dict(cls, tag: str, d: dict, record_type: str = "bib",
                  auth_index: AuthIndex | None = None) -> "Datafield":
        inds = d.get("indicators", [" ", " "])
        subs = [Subfield.from_dict(s, auth_index) for s in d.get("subfields", [])]
        return cls(tag, inds[0], inds[1], subs, record_type, auth_index)

    def to_dict(self) -> dict:
        return {
            "indicators": [self.ind1, self.ind2],
            "subfields": [s.to_dict() for s in self.subfields],
        }

    def get_subfield(self, code: str, place: int | None = None) -> Optional[Subfield]:
        matches = [s for s in self.subfields if s.code == code]
        i = place or 0
        return matches[i] if i < len(matches) else None

    def get_value(self, code: str, place: int | None = None) -> str:
        sub = self.get_subfield(code, place)
        return (sub.value or "") if sub else ""

    def get_values(self, *codes: str) -> list[str]:
        codes_ = codes or [s.code for s in self.subfields]
        return [s.value for s in self.subfields if s.code in codes_ and s.value]

    def get_xrefs(self) -> list[int]:
        return [s.xref for s in self.subfields if isinstance(s, Linked)]

    def get_xref(self, code: str) -> Optional[int]:
        sub = next((s for s in self.subfields if s.code == code and isinstance(s, Linked)), None)
        return sub.xref if sub else None

    def set(self, code: str, new_val, ind1: str | None = None, ind2: str | None = None,
            place: int | str = 0, auth_control: bool = True) -> "Datafield":
        """Set a subfield value (reference Datafield.set,
        dlx/marc/__init__.py:2544-2598): int xrefs are validated as auth
        links; auth-controlled string values resolve to an xref via the
        authority join; '+' appends a new subfield."""
        if ind1 is not None:
            self.ind1 = ind1
        if ind2 is not None:
            self.ind2 = ind2
        if new_val is None or new_val == "":
            return self

        idx = self._auth_index or DEFAULT_AUTH_INDEX
        controlled = auth_control and config.is_authority_controlled(
            self.record_type, self.tag, code)

        def make_subfield() -> Subfield:
            if controlled:
                if isinstance(new_val, int):
                    if idx.lookup(new_val, code) is None:
                        raise InvalidAuthXref(self.record_type, self.tag, code, new_val)
                    return Linked(code, new_val, auth_index=idx)
                src = config.authority_source_tag(self.record_type, self.tag, code)
                xrefs = idx.xlookup(src, code, str(new_val))
                if len(xrefs) == 0:
                    raise InvalidAuthValue(self.record_type, self.tag, code, new_val)
                if len(xrefs) > 1:
                    raise AmbiguousAuthValue(self.record_type, self.tag, code, new_val)
                return Linked(code, xrefs[0], auth_index=idx)
            return Literal(code, str(new_val))

        matches = [i for i, s in enumerate(self.subfields) if s.code == code]

        if isinstance(place, int) and place < len(matches):
            self.subfields[matches[place]] = make_subfield()
        elif place == "+" or (place == 0 and not matches):
            self.subfields.append(make_subfield())
        elif not isinstance(place, int) or place > len(matches):
            raise Exception(f"Invalid subfield place {place}")
        # place == len(matches) > 0: reference semantics — silent no-op
        return self

    def delete_subfield(self, code: str, place: int = 0) -> "Datafield":
        matches = [i for i, s in enumerate(self.subfields) if s.code == code]
        if place < len(matches):
            del self.subfields[matches[place]]
        return self

    def signature(self, resolve: bool = True) -> tuple:
        """Hashable identity used by Diff / merge dedup: tag, indicators
        and the (code, value-or-xref) sequence."""
        subs = tuple(
            (s.code, s.xref if isinstance(s, Linked) else s.value)
            for s in self.subfields
        )
        return (self.tag, self.ind1, self.ind2, subs)

    def __eq__(self, other):
        return (isinstance(other, Datafield) and self.tag == other.tag
                and self.signature() == other.signature())

    def __hash__(self):
        return hash(self.signature())

    def __repr__(self):
        return f"Datafield({self.tag} {self.subfields})"


class Marc:
    record_type = "bib"

    def __init__(self, doc: dict | None = None, auth_index: AuthIndex | None = None):
        self.id: Optional[int] = None
        self.fields: list = []
        self.created = None
        self.created_user = None
        self.updated = None
        self.user = None
        self.basket = None
        self.text = None
        self.words = None
        self._auth_index = auth_index
        if doc:
            self.parse(doc)

    # --- construction ------------------------------------------------------

    def parse(self, doc: dict) -> "Marc":
        """Parse a JMARC dict (tag-keyed, reference
        dlx/marc/__init__.py:604-639)."""
        for key, value in doc.items():
            if key == "_id":
                self.id = int(value) if value is not None else None
            elif key in ("created", "updated"):
                # to_json stringifies datetimes (default=str); a JSON
                # round-trip must coerce them back or to_row() hands a
                # str to the TimestampType column
                if isinstance(value, str):
                    from datetime import datetime as _dt
                    value = _dt.fromisoformat(value)
                setattr(self, key, value)
            elif key in ("created_user", "user", "basket"):
                setattr(self, key, value)
            elif key == "text":
                self.text = value
            elif key == "words":
                self.words = list(value) if value is not None else None
            elif TAG_RE.match(key):
                if key[:2] == "00" and key != "000":
                    for v in value:
                        self.fields.append(Controlfield(key, v))
                elif key == "000":
                    for v in value:
                        self.fields.append(Controlfield("000", v))
                else:
                    for fd in value:
                        self.fields.append(
                            Datafield.from_dict(key, fd, self.record_type, self._auth_index)
                        )
        return self

    @classmethod
    def from_dict(cls, doc: dict, auth_index: AuthIndex | None = None) -> "Marc":
        return cls(doc, auth_index=auth_index)

    @property
    def controlfields(self) -> list:
        return [f for f in self.get_fields() if isinstance(f, Controlfield)]

    @property
    def datafields(self) -> list:
        return [f for f in self.get_fields() if isinstance(f, Datafield)]

    # --- reads ---------------------------------------------------------------

    def get_fields(self, *tags: str) -> list:
        fields = sorted(self.fields, key=lambda f: f.tag)
        if not tags:
            return fields
        return [f for f in fields if f.tag in tags]

    def get_field(self, tag: str, place: int = 0):
        fields = self.get_fields(tag)
        return fields[place] if place < len(fields) else None

    def get_values(self, tag: str, *codes: str, place: int | None = None) -> list[str]:
        if tag[:2] == "00":
            return [f.value for f in self.get_fields(tag)]
        subs = self.get_subfields(tag, *codes, place=place) or []
        return [s.value for s in subs if s.value]

    def get_value(self, tag: str, code: str | None = None, *, address: list | None = None,
                  language: str | None = None) -> str:
        if tag[:2] == "00":
            field = self.get_field(tag, place=0 if address is None else address[0])
            return field.value if field else ""
        if address is not None:
            if len(address) != 2:
                raise Exception('Keyword argument "address" must be an iterable containing two ints')
            field = self.get_field(tag, place=address[0])
            sub = field.get_subfield(code, place=address[1]) if field else None
        else:
            sub = None
            for field in self.get_fields(tag):
                sub = field.get_subfield(code)
                if sub:
                    break
        if not sub:
            return ""
        if language and isinstance(sub, Linked):
            return sub.translated(language) or ""
        return sub.value or ""

    def get_tags(self) -> list[str]:
        return sorted({f.tag for f in self.fields})

    def get_xrefs(self, *tags: str) -> list[int]:
        out = []
        for f in self.get_fields(*tags):
            if isinstance(f, Datafield):
                out += f.get_xrefs()
        return out

    def get_xref(self, tag: str, code: str, address: list | None = None) -> Optional[int]:
        sub = self.get_subfield(tag, code, address=address)
        return sub.xref if sub else None

    def get_subfield(self, tag: str, code: str, address: list | None = None) -> Optional[Subfield]:
        if address:
            field = self.get_field(tag, place=address[0])
            return field.get_subfield(code, place=address[1]) if field else None
        field = self.get_field(tag)
        return field.get_subfield(code) if field else None

    def get_subfields(self, tag: str, *codes: str, place: int | None = None) -> list[Subfield]:
        if isinstance(place, int):
            fields = [self.get_field(tag, place=place)]
        elif place is None:
            fields = self.get_fields(tag)
        else:
            raise Exception("Invalid place")
        subs: list[Subfield] = []
        for field in fields:
            if field is None or isinstance(field, Controlfield):
                continue
            codes_ = codes or [s.code for s in field.subfields]
            subs += [s for s in field.subfields if s.code in codes_]
        return subs

    # --- writes ---------------------------------------------------------------

    def set(self, tag: str, code: str | None, new_val, *, ind1: str | None = None,
            ind2: str | None = None, auth_control: bool = True, address: list = []) -> "Marc":
        if not new_val and not ind1 and not ind2:
            return self

        field_place, subfield_place = 0, 0
        if len(address) > 0:
            field_place = address[0]
            if not isinstance(field_place, int) and field_place != "+":
                raise Exception("Invalid address")
            if len(address) > 1:
                subfield_place = address[1]
                if not isinstance(subfield_place, int) and subfield_place != "+":
                    raise Exception("Invalid address")

        fields = self.get_fields(tag)

        if len(fields) == 0 or field_place == "+":
            if tag[:2] == "00":
                self.fields.append(Controlfield(tag, new_val))
            else:
                field = Datafield(tag=tag, record_type=self.record_type, auth_index=self._auth_index)
                field.set(code, new_val, ind1=ind1, ind2=ind2, auth_control=auth_control)
                self.fields.append(field)
            return self

        if len(fields) < field_place:
            raise Exception(f"There is no field at {tag}/{field_place}")
        if field_place == len(fields):
            # address just past the last instance: create a new field there
            if tag[:2] == "00":
                self.fields.append(Controlfield(tag, new_val))
            else:
                field = Datafield(tag=tag, record_type=self.record_type, auth_index=self._auth_index)
                field.set(code, new_val, ind1=ind1, ind2=ind2, auth_control=auth_control)
                self.fields.append(field)
            return self

        field = fields[field_place]
        if isinstance(field, Controlfield):
            field.value = new_val
        else:
            field.set(code, new_val, ind1=ind1 or None, ind2=ind2 or None,
                      place=subfield_place, auth_control=auth_control)
        return self

    def set_values(self, *tuples) -> "Marc":
        for t in tuples:
            tag, code, val = t[0], t[1], t[2]
            kwargs = t[3] if len(t) > 3 else {}
            self.set(tag, code, val, **kwargs)
        return self

    def set_008(self, today: str) -> "Marc":
        """Derive control field 008 slices from the date field
        (reference dlx/marc/__init__.py:809-817); ``today`` is passed in
        (YYMMDD) to keep the engine deterministic."""
        text = self.get_value("008").ljust(40, "|")
        date_tag, date_code = config.DATE_FIELD
        pub_year = self.get_value(date_tag, date_code)[0:4].ljust(4, "|")
        self.set("008", None, today + text[6] + pub_year + text[11:])
        return self

    def delete_field(self, tag_or_field, place: int = 0) -> "Marc":
        if isinstance(tag_or_field, (Controlfield, Datafield)):
            self.fields = [f for f in self.fields if f is not tag_or_field]
            return self
        if not isinstance(place, int):
            raise Exception("Invalid place")
        tag, seen = tag_or_field, 0
        for i, field in enumerate(self.fields):
            if field.tag == tag:
                if seen == place:
                    del self.fields[i]
                    return self
                seen += 1
        return self

    def delete_fields(self, *tags: str) -> "Marc":
        self.fields = [f for f in self.fields if f.tag not in tags]
        return self

    def delete_subfield(self, tag: str, code: str, address: list | None = None) -> "Marc":
        place = address[0] if address else 0
        sub_place = address[1] if address and len(address) > 1 else 0
        field = self.get_field(tag, place=place)
        if field is not None and isinstance(field, Datafield):
            field.delete_subfield(code, sub_place)
        return self

    # --- validation ------------------------------------------------------------

    def validate(self) -> None:
        """Structural checks equivalent to the reference's jsonschema
        validation (jmarc.schema.json): id int, tag shapes, indicator
        lengths, subfield code pattern, at least one subfield."""
        if self.id is not None and not isinstance(self.id, int):
            raise ValueError("_id must be an int")
        for f in self.fields:
            if not TAG_RE.match(f.tag):
                raise ValueError(f"invalid tag {f.tag!r}")
            if isinstance(f, Datafield):
                for ind in (f.ind1, f.ind2):
                    if not isinstance(ind, str) or len(ind) != 1:
                        raise ValueError(f"invalid indicator {ind!r} in {f.tag}")
                if len(f.subfields) == 0:
                    raise ValueError(f"field {f.tag} has no subfields")
                for s in f.subfields:
                    if not CODE_RE.match(s.code or ""):
                        raise ValueError(f"invalid subfield code {s.code!r} in {f.tag}")

    # --- derived state ------------------------------------------------------------

    def text_and_words(self) -> tuple[str, list[str]]:
        """The record-level search columns (reference
        dlx/marc/__init__.py:913-956): text = ' scrubbed concat of all
        datafield text ', words = distinct stemmed tokens."""
        parts = []
        for f in self.get_fields():
            if isinstance(f, Datafield):
                vals = [s.value for s in f.subfields if s.value]
                if vals:
                    parts.append(" ".join(vals))
        raw = " ".join(parts)
        text = " " + scrub(raw) + " " if raw else " "
        seen, words = set(), []
        for tok in tokenize(raw):
            if tok not in seen:
                seen.add(tok)
                words.append(tok)
        return text, words

    def logical_fields(self, *names: str) -> dict[str, list[str]]:
        """Derived logical-field values (reference
        dlx/marc/__init__.py:1321-1347): per configured tag and code
        group, the space-joined subfield values of one physical field;
        plus the _record_type tags from the type map."""
        table = config.LOGICAL_FIELDS[self.record_type]
        out: dict[str, list[str]] = {}
        for field_name, tag_map in table.items():
            if names and field_name not in names:
                continue
            values: list[str] = []
            for f in self.get_fields():
                if isinstance(f, Controlfield) or f.tag not in tag_map:
                    continue
                for group in tag_map[f.tag]:
                    vals = [s.value for s in f.subfields if s.code in set(group) and s.value]
                    if vals:
                        values.append(" ".join(vals))
            if values:
                out[field_name] = values

        type_map = config.BIB_TYPE_MAP if self.record_type == "bib" else config.AUTH_TYPE_MAP
        rtypes = ["default", self.record_type]
        for type_name, (tag, code, value) in type_map.items():
            if value in self.get_values(tag, code):
                rtypes.append(type_name)
        out["_record_type"] = rtypes
        return out

    # --- serialization ------------------------------------------------------------

    def to_dict(self) -> dict:
        doc: dict = {"_id": self.id}
        for tag in self.get_tags():
            fields = self.get_fields(tag)
            if isinstance(fields[0], Controlfield):
                doc[tag] = [f.value for f in fields]
            else:
                doc[tag] = [f.to_dict() for f in fields]
        for attr in ("created", "created_user", "updated", "user", "basket"):
            if getattr(self, attr) is not None:
                doc[attr] = getattr(self, attr)
        return doc

    def to_row(self) -> dict:
        """Row of the canonical nested Spark schema (schemas.MARC)."""
        leader = None
        controlfields, datafields = [], []
        for f in self.get_fields():
            if isinstance(f, Controlfield):
                if f.tag == "000":
                    leader = f.value
                else:
                    controlfields.append({"tag": f.tag, "value": f.value})
            else:
                # Linked subfields carry their resolved value as a cache
                # (the reference's jmarc schema does the same,
                # jmarc.schema.json:60-78) so executor-side serialization
                # needs no auth lookup; resolve_values() refreshes it.
                datafields.append({
                    "tag": f.tag, "ind1": f.ind1, "ind2": f.ind2,
                    "subfields": [
                        {"code": s.code, "value": s.value, "xref": s.xref}
                        for s in f.subfields
                    ],
                })
        return {
            "_id": self.id, "leader": leader,
            "controlfields": controlfields, "datafields": datafields,
            "created": self.created, "created_user": self.created_user,
            "updated": self.updated, "user": self.user, "basket": self.basket,
            "text": self.text, "words": self.words,
        }

    @classmethod
    def from_row(cls, row, auth_index: AuthIndex | None = None) -> "Marc":
        if hasattr(row, "asDict"):
            row = row.asDict(recursive=True)
        rec = cls(auth_index=auth_index)
        rec.id = row["_id"]
        if row.get("leader") is not None:
            rec.fields.append(Controlfield("000", row["leader"]))
        for cf in row.get("controlfields") or []:
            rec.fields.append(Controlfield(cf["tag"], cf["value"]))
        for df_ in row.get("datafields") or []:
            subs = [Subfield.from_dict(s, auth_index) for s in df_["subfields"]]
            rec.fields.append(Datafield(df_["tag"], df_.get("ind1") or " ", df_.get("ind2") or " ",
                                        subs, cls.record_type, auth_index))
        for attr in ("created", "created_user", "updated", "user", "basket", "text"):
            setattr(rec, attr, row.get(attr))
        rec.words = list(row["words"]) if row.get("words") is not None else None
        return rec

    # --- merge -----------------------------------------------------------------

    def zmerge(self, other: "Marc") -> "Marc":
        """Fill-if-absent merge (reference dlx/marc/__init__.py:1370-1391):
        sets a value from ``other`` only when this record has no value at
        that (tag, code); controlfields fill positionally on ' '/'|'."""
        for field in other.fields:
            if isinstance(field, Controlfield):
                val = self.get_value(field.tag)
                if val:
                    filled = list(val)
                    for pos in range(len(filled)):
                        if filled[pos] in (" ", "|") and pos < len(field.value):
                            filled[pos] = field.value[pos]
                    self.set(field.tag, None, "".join(filled))
                else:
                    self.set(field.tag, None, field.value)
            else:
                for sub in field.subfields:
                    if not self.get_value(field.tag, sub.code):
                        self.set(field.tag, sub.code, sub.value)
        return self

    def xmerge(self, other: "Marc", overwrite: bool = False) -> "Marc":
        """Merge the fields unique to ``other`` (diff-driven, reference
        dlx/marc/__init__.py:1393-1438): with overwrite=True existing
        subfield values are replaced; otherwise only absent values fill."""
        diff = Diff(self, other)
        unique = type(self)(auth_index=self._auth_index)
        unique.fields = diff.b

        for tag in unique.get_tags():
            for i, field in enumerate(unique.get_fields(tag)):
                if isinstance(field, Controlfield):
                    if overwrite:
                        val = field.value
                        self.set(field.tag, None, val, address=[i])
                    elif not self.get_value(field.tag):
                        self.fields.append(field)
                else:
                    for j, sub in enumerate(field.subfields):
                        if overwrite or not self.get_value(field.tag, sub.code, address=[i, j]):
                            self.set(field.tag, sub.code,
                                     (sub.xref if isinstance(sub, Linked) else None) or sub.value,
                                     address=[i, j])
        return self

    def diff(self, other: "Marc") -> "Diff":
        return Diff(self, other)

    def is_diff(self, other: "Marc") -> bool:
        return Diff(self, other).different

    def get_text(self, tag):
        """Reference parity: Marc.get_text is an unimplemented stub in
        the reference too (dlx/marc/__init__.py:749-750)."""
        return None

    # --- deprecated matcher shims (reference dlx/marc/__init__.py:491-568) —
    # kept for API parity; data source is an explicit DataFrame instead of
    # the reference's global DB handle

    @classmethod
    def set_class(cls):
        """The companion set class (reference Bib.set_class/Auth.set_class);
        resolved lazily to avoid the record<->set import cycle."""
        from dlx_spark.marc import set as mset
        return mset.BibSet if cls.record_type == "bib" else mset.AuthSet

    @classmethod
    def match_id(cls, df, idx, auth_index: AuthIndex | None = None):
        import warnings
        warnings.warn("match_id() is deprecated. Use MarcStore.get() / "
                      "MarcSet.from_ids()", DeprecationWarning, stacklevel=2)
        recs = list(cls.set_class().from_ids(df, [idx], auth_index=auth_index))
        return recs[0] if recs else None

    @classmethod
    def match_ids(cls, df, *ids, auth_index: AuthIndex | None = None):
        import warnings
        warnings.warn("match_ids() is deprecated. Use MarcSet.from_ids()",
                      DeprecationWarning, stacklevel=2)
        yield from cls.set_class().from_ids(df, list(ids), auth_index=auth_index)

    @classmethod
    def match(cls, df, *matchers, auth_index: AuthIndex | None = None):
        import warnings
        warnings.warn("match() is deprecated. Use MarcSet.from_query()",
                      DeprecationWarning, stacklevel=2)
        for m in matchers:
            yield from cls.set_class().from_query(df, m, auth_index=auth_index)

    @classmethod
    def find(cls, df, predicate, auth_index: AuthIndex | None = None):
        import warnings
        warnings.warn("find() is deprecated. Use MarcSet.from_query()",
                      DeprecationWarning, stacklevel=2)
        yield from cls.set_class().from_query(df, predicate, auth_index=auth_index)

    @classmethod
    def find_one(cls, df, predicate, auth_index: AuthIndex | None = None):
        import warnings
        warnings.warn("find_one() is deprecated. Use Marc.from_query()",
                      DeprecationWarning, stacklevel=2)
        for rec in cls.set_class().from_query(df, predicate, auth_index=auth_index):
            return rec
        return None


class Bib(Marc):
    record_type = "bib"

    def symbol(self) -> str:
        return self.get_value("191", "a")

    def symbols(self) -> list[str]:
        return self.get_values("191", "a")

    def title(self) -> str:
        return " ".join(self.get_values("245", "a", "b", "c"))

    def date(self) -> str:
        return self.get_value("269", "a")

    def files(self, file_store, *langs) -> list[str]:
        """URIs of the latest file per language for this bib's symbol
        (reference Bib.files, dlx/marc/__init__.py:1815-1825).  The data
        source is an explicit FileStore instead of the global DB."""
        from dlx_spark.files import Identifier
        langs = list(langs) or ["AR", "ZH", "EN", "FR", "ES", "RU", "DE"]
        symbol = self.symbol()
        out = []
        for lang in langs:
            f = file_store.latest_by_identifier_language(
                Identifier("symbol", symbol), lang)
            if f is not None:
                out.append(f["uri"])
        return out

    def file(self, file_store, lang: str) -> str | None:
        """URI of the latest file in ``lang`` (reference Bib.file)."""
        from dlx_spark.files import Identifier
        f = file_store.latest_by_identifier_language(
            Identifier("symbol", self.symbol()), lang)
        return f["uri"] if f is not None else None


class Auth(Marc):
    record_type = "auth"

    HEADING_TAGS = tuple(config.auth_heading_tags())

    @property
    def heading_field(self) -> Optional[Datafield]:
        """First field with tag 1xx (reference dlx/marc/__init__.py:2048-2058)."""
        return next((f for f in self.get_fields() if f.tag.startswith("1")
                     and isinstance(f, Datafield)), None)

    def heading_value(self, code: str, language: str | None = None) -> Optional[str]:
        hf = self.heading_field
        if hf is None:
            return None
        if language:
            ttag = config.language_source_tag(hf.tag, language)
            if ttag is None:
                return None
            tf = self.get_field(ttag)
            return tf.get_value(code) if tf else None
        return hf.get_value(code) or None

    @classmethod
    def build_cache(cls, store) -> AuthIndex:
        """Reference Auth.build_cache (dlx/marc/__init__.py:1842-1874):
        prime the lookup cache for long batch operations.  Here that IS
        the store's memoized AuthIndex."""
        return store.auth_index()

    @classmethod
    def partial_lookup(cls, headings, tag: str, code: str, string: str, *,
                       record_type: str, limit: int = 25) -> list[tuple[str, int]]:
        """Typeahead lookup (reference Auth.partial_lookup,
        dlx/marc/__init__.py:1996-2041): (value, xref) pairs whose
        heading matches ``string``, resolved through the bib/auth field's
        authority source tag.  ``headings`` is the auth-headings
        DataFrame (store.headings())."""
        auth_tag = config.authority_source_tag(record_type, tag, code)
        if auth_tag is None:
            return []
        from dlx_spark.marc import dataframe as mdf
        rows = mdf.partial_lookup(headings, string, code=code, tag=auth_tag,
                                  limit=limit).collect()
        return [(r["value"], r["auth_id"]) for r in rows]

    def in_use(self, store, *, usage_type: str | None = None) -> Optional[int]:
        """Count of records referencing this auth (reference
        dlx/marc/__init__.py:2091-2125)."""
        if not self.id:
            return None
        from dlx_spark.marc import dataframe as mdf
        def count(table):
            return mdf.in_use(table, self.id).count()
        if usage_type is None:
            return count(store.bibs()) + count(store.auths())
        if usage_type == "bib":
            return count(store.bibs())
        if usage_type == "auth":
            return count(store.auths())
        raise Exception("Invalid usage_type")

    def list_attached(self, store, usage_type: str | None = None) -> list["Marc"]:
        """Records attached to this auth (reference
        dlx/marc/__init__.py:2127-2141)."""
        from dlx_spark.marc import dataframe as mdf
        idx = store.auth_index()
        def records(table, cls_):
            return [cls_.from_row(r, auth_index=idx)
                    for r in mdf.in_use(table, self.id).collect()]
        if usage_type == "bib":
            return records(store.bibs(), Bib)
        if usage_type == "auth":
            return records(store.auths(), Auth)
        if usage_type is None:
            return records(store.bibs(), Bib) + records(store.auths(), Auth)
        raise Exception('Invalid "usage_type"')


class Diff:
    """Field multiset comparison (reference dlx/marc/__init__.py:2235-2282).

    Attributes: ``a``/``b`` fields unique to each record, ``c`` common
    fields, ``d`` common fields at different per-tag positions, ``e``
    common fields duplicated a different number of times, plus
    ``different``/``same`` booleans."""

    def __init__(self, a: Marc, b: Marc):
        self.records = (a, b)
        a_sigs = [self._sig(f) for f in a.fields]
        b_sigs = [self._sig(f) for f in b.fields]
        a_set, b_set = set(a_sigs), set(b_sigs)

        self.a = [f for f in a.fields if self._sig(f) not in b_set]
        self.b = [f for f in b.fields if self._sig(f) not in a_set]
        self.c = [f for f in a.fields if self._sig(f) in b_set]
        self.d = [f for f in self.c
                  if a.get_fields(f.tag).index(f) != b.get_fields(f.tag).index(f)]
        from collections import Counter
        ca, cb = Counter(a_sigs), Counter(b_sigs)
        self.e = [f for f in self.c if ca[self._sig(f)] != cb[self._sig(f)]]
        self.different = bool(self.a or self.b or self.d or self.e)
        self.same = not self.different

    # backwards-friendly aliases
    @property
    def a_only(self):
        return self.a

    @property
    def b_only(self):
        return self.b

    @staticmethod
    def _sig(f):
        return f.signature() if isinstance(f, Datafield) else (f.tag, f.value)
