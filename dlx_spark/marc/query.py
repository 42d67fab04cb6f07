"""Query DSL: condition objects and the search-string grammar, compiled
to Spark Column predicates over the canonical nested schema.

The reference compiles conditions to MongoDB filter documents
(``/root/reference/dlx/marc/query.py:526-686``) and lets mongod evaluate
them; here each condition compiles to a ``pyspark.sql.Column`` that
Catalyst pushes into the distributed scan.  Semantics preserved:

- ``Condition(tag, {code: value})`` — for EACH (code, value) pair there
  must exist a field of ``tag`` containing a matching subfield (pairs may
  match different field instances — Mongo's ``$all``+``$elemMatch`` path
  semantics).  Auth-controlled codes resolve value → xref list via the
  authority dimension and match on ``xref``.
- equality is collation-emulating (strength-1): both sides normalized by
  ``scrub`` (case + diacritic + punctuation-fold).
- ``Text`` — stemmed-word containment on the ``words`` column, ``-word``
  negation, ``"phrase"`` and ``wild*`` regexes on the padded ``text``
  column, with the reference's stopword list.

The eager client-side xref expansion the reference performs at parse time
(query.py:208-229) is kept *logically* — the expansion happens against
the in-process/broadcast ``AuthIndex`` dimension, which is exactly the
lookup table mongod would have consulted, without the 1 MB result-size
failure mode.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Optional

from pyspark.sql import Column, functions as F

from dlx_spark import config
from dlx_spark.functions.tokenizer import scrub, tokenize
from dlx_spark.marc.record import AuthIndex

# stopwords excluded from free-text search (reference query.py:718)
TEXT_EXCLUDE = ("the", "of", "to", "at", "and", "in", "on", "by", "at", "it", "its")


class Regex:
    """A regex-valued condition operand (reference uses bson.Regex)."""

    def __init__(self, pattern: str, flags: str = ""):
        self.pattern = pattern
        self.flags = flags

    def java_pattern(self) -> str:
        return f"(?{self.flags})" + self.pattern if self.flags else self.pattern


def _not(col: Column) -> Column:
    """Null-safe negation: exists() over arrays with NULL members yields
    NULL under Spark's three-valued logic and ~NULL stays NULL, which
    silently drops records from NOT queries.  Mongo's $not keeps them —
    so coalesce to False before negating."""
    return ~F.coalesce(col, F.lit(False))


def _norm_eq(col: Column, value: str) -> Column:
    """Collation-emulating equality (strength-1, dlx/config.py:340)."""
    from dlx_spark.functions.tokenizer import scrub_col
    return scrub_col(col) == F.lit(scrub(value))


def _value_match(col: Column, value) -> Column:
    if isinstance(value, Regex):
        return col.rlike(value.java_pattern())
    return _norm_eq(col, str(value))


class Condition:
    valid_modifiers = ["not", "exists", "not_exists"]

    def __init__(self, tag: str | None = None, *subs, record_type: str | None = None, **kwargs):
        if record_type not in (None, "bib", "auth"):
            raise Exception("Invalid record type")
        self.record_type = record_type
        self.tag = tag or kwargs.get("tag")

        if subs and isinstance(subs[0], dict):
            self.subfields = list(subs[0].items())
        elif subs:
            self.subfields = list(subs)
        else:
            self.subfields = []
        if "subfields" in kwargs:
            s = kwargs["subfields"]
            self.subfields = list(s.items()) if isinstance(s, dict) else list(s)

        self.modifier = ""
        if kwargs.get("modifier"):
            mod = kwargs["modifier"].lower()
            if mod not in Condition.valid_modifiers:
                raise Exception(f'Invalid modifier: "{mod}"')
            self.modifier = mod

    def compile(self, auth_index: AuthIndex | None = None) -> Column:
        rtype = self.record_type or "bib"
        tag = self.tag

        def field_has(pair_pred) -> Column:
            return F.exists("datafields",
                            lambda f: (f["tag"] == F.lit(tag)) & pair_pred(f))

        def literal_pred(code, val):
            def pred(f):
                return F.exists(
                    f["subfields"],
                    lambda s: (s["code"] == F.lit(code)) & _value_match(s["value"], val))
            return pred

        def xref_pred(code, xrefs):
            def pred(f):
                if not xrefs:
                    return F.lit(False)
                return F.exists(
                    f["subfields"],
                    lambda s: (s["code"] == F.lit(code)) & s["xref"].isin(list(xrefs)))
            return pred

        pair_preds = []
        for code, val in self.subfields:
            if not config.is_authority_controlled(rtype, tag, code):
                pair_preds.append(literal_pred(code, val))
            else:
                if isinstance(val, int):
                    xrefs = [val]
                elif auth_index is None:
                    xrefs = []
                else:
                    src = config.authority_source_tag(rtype, tag, code)
                    if isinstance(val, Regex):
                        import re as _re
                        flags = _re.I if "i" in val.flags else 0
                        xrefs = auth_index.xlookup_regex(src, code, val.pattern, flags)
                    else:
                        xrefs = auth_index.xlookup(src, code, str(val))
                pair_preds.append(xref_pred(code, xrefs))

        if pair_preds:
            submatch = reduce(lambda a, b: a & b,
                              [field_has(p) for p in pair_preds])
        else:
            submatch = field_has(lambda f: F.lit(True))

        tag_exists = F.exists("datafields", lambda f: f["tag"] == F.lit(tag))
        if tag.startswith("00"):
            tag_exists = tag_exists | F.exists(
                "controlfields", lambda f: f["tag"] == F.lit(tag))

        if not self.modifier:
            return submatch
        if self.modifier == "not":
            return _not(submatch) | _not(tag_exists)
        if self.modifier == "exists":
            return tag_exists
        if self.modifier == "not_exists":
            return _not(tag_exists)
        raise Exception("Invalid modifier")


class BibCondition(Condition):
    def __init__(self, *args, **kwargs):
        kwargs["record_type"] = "bib"
        super().__init__(*args, **kwargs)


class AuthCondition(Condition):
    def __init__(self, *args, **kwargs):
        kwargs["record_type"] = "auth"
        super().__init__(*args, **kwargs)


class Or:
    def __init__(self, *conditions):
        self.conditions = conditions
        self.record_type = None

    def compile(self, auth_index: AuthIndex | None = None) -> Column:
        return reduce(lambda a, b: a | b,
                      [_compile(c, self.record_type, auth_index) for c in self.conditions])


class Raw:
    """Raw passthrough predicate: a Column or SQL string."""

    def __init__(self, predicate, *, record_type: str | None = None):
        self.predicate = predicate
        self.record_type = record_type

    def compile(self, auth_index: AuthIndex | None = None) -> Column:
        if isinstance(self.predicate, str):
            return F.expr(self.predicate)
        return self.predicate


class IdSearch(Raw):
    """Point-id predicate (parser terms ``id:n`` / ``001:n``): compiles
    to the same ``_id == n`` Column as a plain Raw, but CARRIES the id
    so store-level search (``MarcStore.search``) can prune the scan to
    the one ``pt`` bucket holding it (pt = _id % N_BUCKETS) — the plan
    analog of the reference's ``_id`` index lookup: 1/N of the store's
    files listed and read instead of a full-table scan."""

    def __init__(self, n: int, *, record_type: str | None = None):
        super().__init__(F.col("_id") == int(n), record_type=record_type)
        self.id = int(n)


class XrefSearch(Raw):
    """Linked-record containment (parser term ``xref:n``): compiles to
    the same exists-over-datafields Column as a plain Raw, but CARRIES
    the xref, the authority-controlled tag list, and the modifier so
    execution over a store WITH a persisted token index
    (``MarcStore.build_search_index``) can answer it as an index
    lookup — a semi-join against the slim token table's ``xref`` column
    instead of a full scan of every record's nested arrays.  The two
    are equivalent because token rows keep a row for every
    xref-carrying subfield even when its value is null, and the index
    path re-applies the same controlled-tag restriction."""

    def __init__(self, xref: int, tags: list[str], *,
                 modifier: str | None = None,
                 record_type: str | None = None):
        def make_linked(tag_list, x):
            def linked(f):
                return f["tag"].isin(tag_list) & F.exists(
                    f["subfields"], lambda s: s["xref"] == x)
            return linked
        pred = F.exists("datafields", make_linked(list(tags), int(xref)))
        super().__init__(_not(pred) if modifier == "not" else pred,
                         record_type=record_type)
        self.xref = int(xref)
        self.tags = list(tags)
        self.modifier = modifier


class TagOnly:
    """Match value in ANY subfield of ``tag`` (reference query.py:779-825);
    auth-controlled tags also match by xref expansion."""

    def __init__(self, tag: str, value, *, record_type: str | None = None,
                 modifier: str | None = None, auth_index: AuthIndex | None = None):
        self.tag = tag
        self.value = value
        self.record_type = record_type or "bib"
        self.modifier = modifier
        self._auth_index = auth_index

    def compile(self, auth_index: AuthIndex | None = None) -> Column:
        idx = auth_index or self._auth_index
        tag, value = self.tag, self.value
        auth_ctrl = config.AUTHORITY_CONTROLLED[self.record_type]

        def sub_value_match(f) -> Column:
            return F.exists(f["subfields"], lambda s: _value_match(s["value"], value))

        value_pred = F.exists("datafields",
                              lambda f: (f["tag"] == F.lit(tag)) & sub_value_match(f))

        xrefs: list[int] = []
        if tag in auth_ctrl and idx is not None and not isinstance(value, Regex):
            src = list(auth_ctrl[tag].values())[0]
            xrefs = idx.xlookup_any_code(src, str(value))

        xref_pred = (
            F.exists("datafields",
                     lambda f: (f["tag"] == F.lit(tag)) & F.exists(
                         f["subfields"], lambda s: s["xref"].isin(xrefs)))
            if xrefs else None
        )

        if self.modifier is None:
            return value_pred | xref_pred if xref_pred is not None else value_pred
        if self.modifier == "not":
            out = _not(value_pred)
            if xref_pred is not None:
                out = out & _not(xref_pred)
            return out
        raise Exception("Invalid modifier")


class Text:
    """Free-text search over the whole record (reference query.py:698-751):
    stemmed ``words`` containment, ``-word`` negation, ``"phrase"`` and
    ``wild*`` regexes against the padded ``text`` column."""

    def __init__(self, string: str = "", *, record_type: str | None = None,
                 modifier: str | None = None):
        self.string = string
        self.record_type = record_type

    def compile(self, auth_index: AuthIndex | None = None) -> Column:
        quoted = re.findall(r'(".+?")', self.string)
        negated = [m[1] for m in re.findall(r"(^|\s)(\-\w+)", self.string)]
        starred = [w for w in re.split(r"\s+", self.string) if "*" in w]

        remainder = self.string
        for tok in negated + starred:
            remainder = remainder.replace(tok, "")

        words = [w for w in tokenize(remainder) if w not in TEXT_EXCLUDE]

        preds: list[Column] = []
        if negated:
            neg_words = tokenize(" ".join(negated))
            if not words:
                raise Exception("Search term can't contain only negations")
            preds.append(reduce(lambda a, b: a & b,
                                [F.array_contains("words", w) for w in words]))
            preds.append(reduce(lambda a, b: a & b,
                                [~F.coalesce(F.array_contains("words", w), F.lit(False))
                                 for w in neg_words]))
        elif words:
            preds.append(reduce(lambda a, b: a & b,
                                [F.array_contains("words", w) for w in words]))

        for q in quoted:
            preds.append(F.col("text").rlike(rf"\s{scrub(q)}\s"))
        for s in starred:
            preds.append(F.col("text").rlike(" " + s.replace("*", ".*")))

        if not preds:
            return F.lit(True)
        return reduce(lambda a, b: a & b, preds)


class Query:
    record_type: Optional[str] = None

    def __init__(self, *conditions):
        self.conditions = list(conditions)

    def add_condition(self, *conditions):
        self.conditions += conditions

    def compile(self, auth_index: AuthIndex | None = None) -> Column:
        if not self.conditions:
            return F.lit(True)
        preds = [_compile(c, self.record_type, auth_index) for c in self.conditions]
        return reduce(lambda a, b: a & b, preds)

    @classmethod
    def from_string(cls, string: str, *, record_type: str | None = None,
                    auth_index: AuthIndex | None = None) -> "Query":
        from dlx_spark.marc.parser import parse_query_string
        q = parse_query_string(string, record_type=record_type or cls.record_type or "bib",
                               auth_index=auth_index)
        return q


class BibQuery(Query):
    record_type = "bib"


class AuthQuery(Query):
    record_type = "auth"


class QueryDocument(Query):
    """Deprecated alias of Query (reference dlx/marc/query.py:570-575)."""

    def __init__(self, *args, **kwargs):
        import warnings
        warnings.warn("QueryDocument is deprecated. Use Query instead",
                      DeprecationWarning, stacklevel=2)
        super().__init__(*args, **kwargs)


class Any(TagOnly):
    """Deprecated alias of TagOnly (reference dlx/marc/query.py:827-830)."""

    def __init__(self, *args, **kwargs):
        import warnings
        warnings.warn("Any is deprecated. Use TagOnly instead",
                      DeprecationWarning, stacklevel=2)
        super().__init__(*args, **kwargs)


class AtlasQuery(Query):
    """Reference AtlasQuery (query.py:832-865) splits Text conditions
    into Atlas $search stages.  In Spark there is no separate search
    service: Text conditions compile to the same tokenized predicates as
    everything else, so this subclass exists for API parity and exposes
    the split for callers that want to route text terms elsewhere."""

    @classmethod
    def from_string(cls, string: str, *, record_type: str | None = None,
                    auth_index=None) -> "AtlasQuery":
        base = Query.from_string(string, record_type=record_type,
                                 auth_index=auth_index)
        self = cls()
        self.record_type = base.record_type
        self.conditions = base.conditions
        return self

    @property
    def text_conditions(self) -> list:
        return [c for c in self.conditions if isinstance(c, Text)]

    @property
    def match(self) -> "Query":
        rest = [c for c in self.conditions if not isinstance(c, Text)]
        q = Query(*rest)
        q.record_type = self.record_type
        return q


def _compile(cond, record_type: str | None, auth_index: AuthIndex | None) -> Column:
    if getattr(cond, "record_type", None) is None and record_type:
        cond.record_type = record_type
    return cond.compile(auth_index)


def compile_predicate(obj, record_type: str | None = None,
                      auth_index: AuthIndex | None = None) -> Column:
    """Compile any Query/Condition-family object (or list of them) to one
    Spark Column predicate."""
    if isinstance(obj, list):
        obj = Query(*obj)
    return _compile(obj, record_type, auth_index)
