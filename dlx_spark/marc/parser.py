"""The search-string grammar: ``Query.from_string``.

Grammar preserved from the reference (``/root/reference/dlx/marc/
query.py:20-524``):

- tokenizer honoring ``'…'`` exact quotes, ``"…"`` phrases and ``/…/``
  regexes while splitting on AND/OR/NOT;
- term shapes, tried in order: fully-qualified ``245__a:val``, tag-only
  ``245:val``, ``id:n``, audit dates ``created>2020-01-01`` (``:`` means
  same-day range), audit users, ``xref:n``, logical fields
  (``title:...``, with aliases s/heading/meeting date/meeting record),
  and bare free text;
- value forms: ``'exact'``, ``/regex/`` (+``i``), ``wild*card`` →
  anchored regex, ``*`` existence, ``"phrase"``, ``-negated``, plain
  stemmed-AND words;
- boolean assembly: NOT folds into the next term (only after AND/OR,
  not at end, not on free text), consecutive ORs collapse into one
  ``Or``, everything else ANDs (no precedence grammar — reference
  parity).

The CRUCIAL redesign (SURVEY §3.1): the reference's parser eagerly runs
semi-joins against ``_index_{tag}`` side collections and embeds the
matched value lists in the filter.  Here every term compiles to a PURE
program — a Column predicate or a lazy semi-join against the engine's
tokenized exploded view (``QueryContext``) — and Spark executes the
joins inside the plan.  Same match semantics, no 1 MB value-list cliff.

Error cases preserved: unresolved quotes / unclosed regex, NOT placement
rules, only-negation text, unknown field names, non-numeric id/xref.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from dlx_spark import config
from dlx_spark.functions.tokenizer import scrub, tokenize
from dlx_spark.marc import query as q
from dlx_spark.marc.record import AuthIndex


class InvalidQueryString(Exception):
    pass


class WildcardRegex(q.Regex):
    """Wildcard-derived regex — ALWAYS case-insensitive, like the
    reference's WildcardRegex (query.py:15-18)."""

    def __init__(self, pattern: str):
        super().__init__(pattern, "i")


LOGICAL_FIELD_ALIASES = {
    "s": "symbol",
    "heading": "subject",
    "meeting date": "date",
    "meeting record": "symbol",
}


# ---------------------------------------------------------------------------
# Execution context: the views join-based terms execute against
# ---------------------------------------------------------------------------

class QueryContext:
    """Holds the DataFrames a compiled query may join against:

    - ``df``: the canonical nested record DataFrame (with derived
      ``words``/``text`` and logical-field columns when available)
    - ``subfield_tokens()``: (record_id, tag, code, value, toks) — the
      engine's replacement for the reference's ``_index_{tag}``
      side collections, derived lazily and cached per context
    - ``auth_index``: the in-process authority dimension
    """

    def __init__(self, df: DataFrame, record_type: str = "bib",
                 auth_index: AuthIndex | None = None,
                 headings: DataFrame | None = None,
                 tokens: DataFrame | None = None,
                 headings_hint: bool = True):
        self.df = df
        self.record_type = record_type
        self.auth_index = auth_index
        self.headings = headings
        #: heading-dimension broadcast gate (MarcStore.headings_hint):
        #: False past HEADINGS_BROADCAST_MAX_AUTHS — the forced
        #: broadcast is dropped from the token derive and the
        #: auth-expansion join, and AQE picks the strategy
        self.headings_hint = headings_hint
        self._provided_tokens = tokens
        self._subfield_tokens: DataFrame | None = None
        self._cached = False

    def subfield_tokens(self) -> DataFrame:
        if self._subfield_tokens is None:
            if self._provided_tokens is not None:
                # a PERSISTED index (MarcStore.build_search_index): the
                # tokens are already materialized parquet — no derive,
                # no UDF in the query plan, no session cache needed
                self._subfield_tokens = self._provided_tokens
            else:
                from dlx_spark.marc import dataframe as mdf
                self._subfield_tokens = mdf.subfield_token_rows(
                    self.df, self.record_type, headings=self.headings,
                    hint=self.headings_hint,
                ).cache()
                self._cached = True
        return self._subfield_tokens

    def headings_df(self) -> DataFrame | None:
        """The heading dimension: as given, or derived from the
        in-process auth index (dimension-sized)."""
        if self.headings is not None:
            return self.headings
        if self.auth_index is None:
            return None
        from dlx_spark.functions.tokenizer import scrub
        rows = []
        for aid in self.auth_index.ids():
            auth = self.auth_index.get(aid)
            hf = auth.heading_field if auth else None
            if hf is None:
                continue
            for s in hf.subfields:
                rows.append((aid, hf.tag, s.code, s.value, None, scrub(s.value or "")))
        if not rows:
            return None
        self.headings = self.df.sparkSession.createDataFrame(
            rows, "auth_id long, tag string, code string, value string, lang string, norm string")
        return self.headings

    def close(self) -> None:
        """Release the cached tokenized view (one cached copy lives per
        context otherwise — long-lived services should close contexts).
        A persisted-index context holds no cache — nothing to release."""
        if self._subfield_tokens is not None:
            if self._cached:
                self._subfield_tokens.unpersist()
            self._subfield_tokens = None
            self._cached = False


# ---------------------------------------------------------------------------
# Join-based condition: matches records via a semi-join on ids
# ---------------------------------------------------------------------------

class SubfieldTextSearch:
    """Fielded text/regex search (``245__a:words`` / ``245:/rx/``): the
    per-subfield-value stemmed-containment semantics of the reference's
    index-collection expansion (query.py:112-348), expressed as a lazy
    semi-join.  ``code=None`` means any subfield of the tag."""

    def __init__(self, tag: str, code: str | None, value, *, modifier: str | None = None,
                 record_type: str | None = None):
        self.tag, self.code, self.value = tag, code, value
        self.modifier = modifier
        self.record_type = record_type or "bib"

    def matching_value_rows(self, ctx: QueryContext) -> DataFrame:
        rows = ctx.subfield_tokens().filter(F.col("tag") == self.tag)
        if self.code is not None:
            rows = rows.filter(F.col("code") == self.code)

        value = self.value
        if isinstance(value, q.Regex):
            flags = f"(?{value.flags})" if value.flags else ""
            return rows.filter(F.col("value").rlike(flags + value.pattern))

        # text mode: quoted phrases + negations + stemmed containment
        raw = value
        quoted = [scrub(x) for x in re.findall(r'"(.+?)"', raw)]
        negated = [m[1] for m in re.findall(r"(^|\s)(\-\w+)", raw)]
        for tok in negated:
            raw = raw.replace(tok, "")
            if not raw.strip():
                raise InvalidQueryString("Search term can't contain only negations")
        terms = tokenize(raw)
        neg_terms = tokenize(" ".join(scrub(x) for x in negated))

        cond = F.lit(True)
        for t in terms:
            cond = cond & F.array_contains("toks", t)
        for t in neg_terms:
            cond = cond & ~F.array_contains("toks", t)
        for ph in quoted:
            # phrase compares scrubbed-to-scrubbed (the reference matches
            # the scrubbed phrase against scrubbed index text)
            cond = cond & F.col("value_norm").rlike(rf"\b{re.escape(ph)}\b")
        return rows.filter(cond)

    def matching_ids(self, ctx: QueryContext) -> DataFrame:
        matched = self.matching_value_rows(ctx)
        ids = matched.select("record_id").distinct()

        # auth-controlled expansion: records linking (by xref) to auths
        # whose heading matches the same values.  For fully-qualified
        # terms the CODE must be controlled (reference query.py:208-212);
        # tag-only terms expand whenever the tag is controlled.
        # Executed as LAZY joins (matched norms ⋈ headings → auth ids ⋈
        # linked subfields) — no driver-side value collection, so there
        # is no 1 MB value-list cliff at any corpus size.
        auth_ctrl = config.AUTHORITY_CONTROLLED[self.record_type]
        code_ok = self.code is None or self.code in auth_ctrl.get(self.tag, {})
        headings = ctx.headings_df() if (self.tag in auth_ctrl and code_ok) else None
        if headings is not None:
            src = list(auth_ctrl[self.tag].values())[0]
            head = (headings
                    .filter(F.col("lang").isNull() & (F.col("tag") == src))
                    .select("auth_id", "norm"))
            matched_norms = matched.select(F.col("value_norm").alias("norm")).distinct()
            if ctx.headings_hint:
                head = F.broadcast(head)
            auth_ids = (head.join(matched_norms, "norm")
                        .select("auth_id").distinct())
            if ctx.headings_hint:
                # a broad term's matched-auth set is bounded by the
                # dimension — force the semi-join broadcast only while
                # the dimension itself is provably broadcast-sized
                auth_ids = F.broadcast(auth_ids)
            linked = (ctx.subfield_tokens()
                      .filter(F.col("tag") == self.tag)
                      .join(auth_ids,
                            F.col("xref") == F.col("auth_id"), "leftsemi")
                      .select("record_id").distinct())
            ids = ids.union(linked).distinct()
        return ids

    def apply(self, df: DataFrame, ctx: QueryContext) -> DataFrame:
        ids = self.matching_ids(ctx)
        how = "leftanti" if self.modifier == "not" else "leftsemi"
        return df.join(ids, df["_id"] == ids["record_id"], how)

    def compile(self, auth_index=None):
        raise NotImplementedError(
            "fielded text search compiles to a semi-join, not a Column; "
            "run it through dlx_spark.marc.parser.execute_query(query, ctx)")


class LogicalFieldSearch:
    """Logical-field term (``title:...``): predicate over the derived
    array<string> column (query.py:402-466)."""

    def __init__(self, field: str, value, *, modifier: str | None = None):
        self.field, self.value, self.modifier = field, value, modifier

    def element_pred(self, value):
        if isinstance(value, q.Regex):
            flags = f"(?{value.flags})" if value.flags else ""
            return lambda v: v.rlike(flags + value.pattern)
        if isinstance(value, str) and value.startswith("'") and value.endswith("'") and len(value) > 1:
            exact = scrub(value[1:-1])
            from dlx_spark.functions.tokenizer import scrub_col
            return lambda v: scrub_col(v) == F.lit(exact)
        # text: stemmed containment per value
        raw = value
        quoted = [scrub(x) for x in re.findall(r'"(.+?)"', raw)]
        negated = [m[1] for m in re.findall(r"(^|\s)(\-\w+)", raw)]
        for tok in negated:
            raw = raw.replace(tok, "")
            if not raw.strip():
                raise InvalidQueryString("Search term can't contain only negations")
        terms = tokenize(raw)
        neg_terms = tokenize(" ".join(scrub(x) for x in negated))

        def pred(v):
            from dlx_spark.functions.tokenizer import scrub_col
            norm = scrub_col(v)
            c = F.lit(True)
            for t in terms:
                c = c & norm.rlike(rf"(^|\s){re.escape(t)}")
            for t in neg_terms:
                c = c & ~norm.rlike(rf"(^|\s){re.escape(t)}(\s|$)")
            for ph in quoted:
                c = c & norm.rlike(rf"\b{re.escape(ph)}\b")
            return c
        return pred

    def compile(self, auth_index=None) -> Column:
        col = F.col(self.field)
        if self.value == "*":
            present = col.isNotNull() & (F.size(col) > 0)
            return ~present if self.modifier == "not" else present
        pred = F.exists(col, self.element_pred(self.value))
        pred = F.coalesce(pred, F.lit(False))
        return ~pred if self.modifier == "not" else pred


# stemmed-prefix note: logical-field text mode matches stems as PREFIXES
# of the scrubbed value words (stem 'report' matches 'reports'), which is
# how Porter stems relate to their source words in the common case.  The
# subfield-level search (SubfieldTextSearch) uses true stemmed equality.


# ---------------------------------------------------------------------------
# Tokenizer (state machine preserved from the reference)
# ---------------------------------------------------------------------------

def tokenize_query(string: str) -> list[str]:
    tokens: list[str] = []
    buffer = ""
    in_single = in_double = in_regex = False

    for i, char in enumerate(string):
        buffer += char
        if len(buffer) > 1 and buffer[-2:] == "':" and not in_single:
            in_single = True
        elif char == "'":
            in_single = False
        elif char == "/" and i > 0 and string[i - 1] == ":":
            in_regex = True
        elif char == "/" and (i == 0 or string[i - 1] != "\\"):
            in_regex = False
        elif char == '"':
            if not in_single and not in_regex:
                in_double = not in_double

        if not in_single and not in_double and not in_regex:
            match = re.match(r"^(.*)(^|\s)(AND|OR|NOT)\s$", buffer)
            if match:
                term, operator = match.group(1, 3)
                term = term.strip()
                if term and (not tokens or tokens[-1] != term):
                    tokens.append(term)
                tokens.append(operator)
                buffer = ""

    tokens.append(buffer.strip())
    tokens = [t for t in tokens if t]

    if in_single or in_double:
        raise InvalidQueryString("Unresolved quotes")
    if in_regex:
        raise InvalidQueryString("Unclosed regex")
    return tokens


def _is_regex(token: str) -> bool:
    for left, right in [("/", "/"), ("\\", "\\"), ("`", "`")]:
        if token[0] == left and (token[-1] == right
                                 or (len(token) > 1 and token[-2] == right and token[-1] == "i")):
            return True
        if token[0] == left:
            raise InvalidQueryString(f'Invalid regex: "{token}"')
    return False


def process_string(value: str):
    """Convert a term value to Regex / WildcardRegex / plain string."""
    if value and _is_regex(value):
        if value[-1] == "i":
            return q.Regex(value[1:-2], "i")
        return q.Regex(value[1:-1])
    if "*" in value:
        if value == "*":
            return "*"
        parts = [re.escape(p) for p in value.split("*")]
        pattern = ".*".join(parts)
        if not pattern.startswith(".*"):
            pattern = "^" + pattern
        if not pattern.endswith(".*"):
            pattern = pattern + "$"
        return WildcardRegex(pattern)
    return value


# ---------------------------------------------------------------------------
# Term parser
# ---------------------------------------------------------------------------

def parse_term(token: str, record_type: str, auth_index: AuthIndex | None,
               modifier: str | None = None):
    # fully qualified: TAG + 2 indicator chars + code
    if match := re.match(r"(\d{3})(.)(.)([a-z0-9]):(.*)", token):
        tag, _ind1, _ind2, code, value = match.group(1, 2, 3, 4, 5)
        if not value:
            raise InvalidQueryString(f'Empty search value in "{token}"')
        value = process_string(value)

        if value == "*":
            def code_exists(f):
                return (f["tag"] == tag) & F.exists(f["subfields"], lambda s: s["code"] == code)
            pred = F.exists("datafields", code_exists)
            return q.Raw(q._not(pred) if modifier == "not" else pred)

        if not isinstance(value, q.Regex):
            if value[0] == "'" and value[-1] == "'" and len(value) > 1:
                return q.Condition(tag, {code: value[1:-1]}, modifier=modifier,
                                   record_type=record_type)
            if value[0] == "'":
                raise InvalidQueryString(f'Invalid exact match using single quote: "{token}"')

        return SubfieldTextSearch(tag, code, value, modifier=modifier,
                                  record_type=record_type)

    # tag-only
    if match := re.match(r"(\d{3}):(.*)", token):
        tag, value = match.group(1, 2)
        if not value:
            raise InvalidQueryString(f'Empty search value in "{token}"')

        if tag == "001":
            try:
                n = int(value)
            except ValueError:
                raise InvalidQueryString("ID must be a number")
            return q.IdSearch(n)
        if tag[:2] == "00":
            val = process_string(value)
            if tag == "000":
                pred = (F.col("leader").rlike(val.java_pattern())
                        if isinstance(val, q.Regex) else (F.col("leader") == val))
            else:
                def make_cf_match(t, v):
                    def cf_match(f):
                        m = (f["value"].rlike(v.java_pattern())
                             if isinstance(v, q.Regex) else (f["value"] == v))
                        return (f["tag"] == t) & m
                    return cf_match
                pred = F.exists("controlfields", make_cf_match(tag, val))
            return q.Raw(pred)

        value = process_string(value)
        if value == "*":
            tag_exists = F.exists("datafields", lambda f: f["tag"] == tag)
            return q.Raw(q._not(tag_exists) if modifier == "not" else tag_exists)

        if not isinstance(value, q.Regex):
            if value[0] == "'" and value[-1] == "'" and len(value) > 1:
                return q.TagOnly(tag, value[1:-1], modifier=modifier,
                                 record_type=record_type, auth_index=auth_index)
            if value[0] == "'":
                raise InvalidQueryString(f'Invalid exact match using single quote: "{token}"')

        return SubfieldTextSearch(tag, None, value, modifier=modifier,
                                  record_type=record_type)

    # id
    if match := re.match(r"id:(.*)", token):
        if modifier:
            raise InvalidQueryString(f'modifier "{modifier}" not valid for ID search')
        try:
            n = int(match.group(1))
        except ValueError:
            raise InvalidQueryString("ID must be a number")
        return q.IdSearch(n)

    # audit dates
    if match := re.match(r"(created|updated)([:<>])(.*)", token):
        field, op, value = match.group(1, 2, 3)
        try:
            date = datetime.strptime(value, "%Y-%m-%d")
        except ValueError:
            raise InvalidQueryString(f'Invalid date "{value}" (expected YYYY-MM-DD)')
        col = F.col(field)
        if op == "<":
            return q.Raw(col <= F.lit(date))
        if op == ">":
            return q.Raw(col >= F.lit(date))
        return q.Raw((col >= F.lit(date)) & (col <= F.lit(date + timedelta(days=1))))

    # audit users
    if match := re.match(r"(created_user|user):(.*)", token):
        field, value = match.group(1, 2)
        val = process_string(value)
        if isinstance(val, q.Regex):
            return q.Raw(F.col(field).rlike(val.java_pattern()))
        return q.Raw(F.col(field) == val)

    # xref
    if match := re.match(r"xref:(.*)", token):
        try:
            xref = int(match.group(1))
        except ValueError:
            raise InvalidQueryString("xref must be a number")
        tags = sorted(config.AUTHORITY_CONTROLLED[record_type].keys())
        return q.XrefSearch(xref, tags, modifier=modifier)

    # logical field
    if match := re.match(r"(\w+):(.*)", token):
        field, value = match.group(1, 2)
        field = LOGICAL_FIELD_ALIASES.get(field, field)
        known = set(config.BIB_LOGICAL_FIELDS) | set(config.AUTH_LOGICAL_FIELDS) | {"_record_type"}
        if field not in known:
            raise InvalidQueryString(f'Unrecognized query field "{field}"')
        rt_fields = set(config.LOGICAL_FIELDS[record_type]) | {"_record_type"}
        if field not in rt_fields:
            # valid for the OTHER record type: the reference queries an
            # empty index collection and returns nothing — match-nothing
            # rather than compiling a nonexistent column
            return q.Raw(F.lit(False))
        if value == "*":
            return LogicalFieldSearch(field, "*", modifier=modifier)
        if not value.startswith("'"):
            value = process_string(value)
        elif value[-1] != "'":
            raise InvalidQueryString(f'Invalid exact match using single quote: "{token}"')
        return LogicalFieldSearch(field, value, modifier=modifier)

    # free text
    return q.Text(token, record_type=record_type)


# ---------------------------------------------------------------------------
# Boolean assembly (reference query.py:477-524)
# ---------------------------------------------------------------------------

def parse_query_string(string: str, record_type: str = "bib",
                       auth_index: AuthIndex | None = None) -> "q.Query":
    string = string.strip()
    tokens: list = tokenize_query(string)

    for i, token in enumerate(tokens):
        if token == "NOT":
            if i > 0 and tokens[i - 1] not in ("AND", "OR"):
                raise InvalidQueryString('"NOT" must be preceeded by "AND", "OR"')
            if not len(tokens) > i + 1:
                raise InvalidQueryString('"NOT" can\'t be at end of search string')
            if not re.match(r'^[^"\']+:', tokens[i + 1]):
                raise InvalidQueryString('"NOT" not valid for all fields text search')
            tokens[i] = None
        elif i > 0 and tokens[i - 1] is None:
            tokens[i] = parse_term(token, record_type, auth_index, modifier="not")
        elif token not in ("AND", "OR"):
            tokens[i] = parse_term(token, record_type, auth_index)

    tokens = [t for t in tokens if t is not None]

    # adjacent operators ("x OR AND y") crash the reference with an
    # AttributeError deep in compile; fail fast with a parse error instead
    for i, token in enumerate(tokens):
        if token in ("AND", "OR"):
            if i == 0 or i == len(tokens) - 1 or tokens[i + 1] in ("AND", "OR"):
                raise InvalidQueryString("Invalid operator sequence")

    query = q.Query()
    query.record_type = record_type

    # extract OR groups first (no precedence grammar — reference parity)
    for i, token in enumerate(tokens):
        if token == "OR":
            start, inc, ors = i, 0, []
            ors.append(tokens[start - 1])
            tokens[i - 1] = None
            while len(tokens) > start + inc and tokens[start + inc] == "OR":
                ors.append(tokens[start + inc + 1])
                tokens[start + inc], tokens[start + inc + 1] = None, None
                inc += 2
            query.conditions.append(q.Or(*ors))

    # remaining terms AND together
    for i, token in enumerate(tokens):
        if token == "AND":
            if tokens[i - 1] is not None and tokens[i - 1] not in query.conditions:
                query.conditions.append(tokens[i - 1])
            if i + 1 < len(tokens) and tokens[i + 1] is not None:
                query.conditions.append(tokens[i + 1])

    if not query.conditions:
        remaining = [t for t in tokens if t is not None]
        if not remaining:
            raise InvalidQueryString("Empty query")
        query.conditions = [remaining[0]]

    return query


# ---------------------------------------------------------------------------
# Execution: apply a parsed query to a DataFrame
# ---------------------------------------------------------------------------


# Bare free-text terms deliberately do NOT route through the persisted
# token index.  Measured at 1M records (marc_bench --query): the
# ``words``-column predicate runs 0.21 s warm / 0.4 s cold — the scan
# reads exactly ONE pruned column and the containment stays in
# whole-stage codegen — while an index formulation (per-word
# containment semi-joins on the token table, then a join back to the
# base) measured 1.19 s warm: the result join must scan the base
# anyway, so the index adds work without removing any.  This holds at
# every scale: a whole-record term has no tag to prune on, making the
# index scan the same order as the words column it would replace.  The
# reference walks its index collections for these terms
# (dlx/marc/query.py:698-751) because its documents have no words
# column to scan; the engine's derived column IS that index, stored
# row-aligned.

def execute_query(query: "q.Query", ctx: QueryContext,
                  df: DataFrame | None = None) -> DataFrame:
    """Run a parsed query: pure-Column conditions become one filter;
    join-based conditions (fielded text) become semi/anti-joins.  ``Or``
    groups containing join-based members union their id sets.

    ``df`` (default ``ctx.df``) is the BASE the result filters — passing
    a narrower frame (e.g. a bucket-pruned scan for point-id terms, as
    ``MarcStore.search`` does) lets one long-lived context with its
    cached tokenized view serve every query while each query scans only
    what its predicates require."""
    if df is None:
        df = ctx.df
    column_preds: list[Column] = []

    for cond in query.conditions:
        if isinstance(cond, SubfieldTextSearch):
            df = cond.apply(df, ctx)
        elif isinstance(cond, q.XrefSearch) and \
                ctx._provided_tokens is not None:
            # a PERSISTED token index answers xref containment as an
            # index lookup: semi-join against the slim token table's
            # xref column (same controlled-tag restriction) instead of
            # scanning every record's nested arrays — the scale path
            # for a 100 TB store.  Derived (per-session) token views
            # are NOT used here: building one to answer a single xref
            # term would cost more than the column scan it replaces
            ids = (ctx.subfield_tokens()
                   .filter((F.col("xref") == cond.xref)
                           & F.col("tag").isin(cond.tags))
                   .select("record_id").distinct())
            how = "leftanti" if cond.modifier == "not" else "leftsemi"
            df = df.join(ids, df["_id"] == ids["record_id"], how)
        elif isinstance(cond, q.Or) and any(isinstance(c, SubfieldTextSearch)
                                            for c in cond.conditions):
            ids = None
            for c in cond.conditions:
                if isinstance(c, SubfieldTextSearch):
                    part = c.matching_ids(ctx)
                    if c.modifier == "not":
                        # complement within the OR group: all ids minus
                        # the matching ones
                        all_ids = ctx.df.select(F.col("_id").alias("record_id"))
                        part = all_ids.join(part, "record_id", "leftanti")
                else:
                    col = q._compile(c, query.record_type, ctx.auth_index)
                    part = ctx.df.filter(col).select(F.col("_id").alias("record_id"))
                ids = part if ids is None else ids.union(part)
            ids = ids.distinct()
            df = df.join(ids, df["_id"] == ids["record_id"], "leftsemi")
        else:
            column_preds.append(q._compile(cond, query.record_type, ctx.auth_index))

    if column_preds:
        df = df.filter(reduce(lambda a, b: a & b, column_preds))
    return df
