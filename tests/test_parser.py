"""Query-string grammar tests (reference tests/test_marc.py query
section + SURVEY §2.2 error cases)."""

import pytest
from pyspark.sql import functions as F

from dlx_spark.marc import dataframe as mdf
from dlx_spark.marc import query as q
from dlx_spark.marc.parser import (
    InvalidQueryString,
    QueryContext,
    execute_query,
    parse_query_string,
    tokenize_query,
)


@pytest.fixture(scope="module")
def ctx(spark):
    from dlx_spark.marc import AuthSet, BibSet

    auth_docs = [
        {"_id": 1, "150": [{"indicators": [" ", " "],
                            "subfields": [{"code": "a", "value": "Header"}]}]},
        {"_id": 2, "110": [{"indicators": [" ", " "],
                            "subfields": [{"code": "a", "value": "Another header"}]}]},
    ]
    bib_docs = [
        {"_id": 1,
         "000": ["leader"],
         "008": ["controlfield"],
         "245": [{"indicators": [" ", " "],
                  "subfields": [{"code": "a", "value": "This"},
                                {"code": "b", "value": "is the"},
                                {"code": "c", "value": "title"}]}],
         "520": [{"indicators": [" ", " "],
                  "subfields": [{"code": "a", "value": "Description"}]},
                 {"indicators": [" ", " "],
                  "subfields": [{"code": "a", "value": "Another description"},
                                {"code": "a", "value": "Repeated subfield"}]}],
         "650": [{"indicators": [" ", " "], "subfields": [{"code": "a", "xref": 1}]}],
         "710": [{"indicators": [" ", " "], "subfields": [{"code": "a", "xref": 2}]}]},
        {"_id": 2,
         "000": ["leader"],
         "245": [{"indicators": [" ", " "],
                  "subfields": [{"code": "a", "value": "Another"},
                                {"code": "b", "value": "is the"},
                                {"code": "c", "value": "title"}]}],
         "650": [{"indicators": [" ", " "], "subfields": [{"code": "a", "xref": 1}]}]},
    ]
    auths = AuthSet.from_dicts(auth_docs)
    idx = auths.build_index()
    bibs_df = BibSet.from_dicts(bib_docs, auth_index=idx).to_df(spark)
    auths_df = auths.to_df(spark)
    headings = mdf.auth_headings(auths_df)
    derived = mdf.derive_text_words(bibs_df, headings)
    derived = mdf.derive_logical_fields(derived, "bib", headings=headings)
    return QueryContext(derived.cache(), "bib", auth_index=idx, headings=headings)


def run(ctx, string):
    query = parse_query_string(string, record_type="bib", auth_index=ctx.auth_index)
    return sorted(r._id for r in execute_query(query, ctx).select("_id").collect())


def test_tokenize_query():
    assert tokenize_query("a AND b OR c") == ["a", "AND", "b", "OR", "c"]
    # reference parity: the single-quote guard in the reference tokenizer
    # never fires for the `:'...'` syntax, so quoted AND splits there too
    assert tokenize_query("245__a:'This AND that'") == ["245__a:'This", "AND", "that'"]
    assert tokenize_query('245__a:"quoted AND phrase"') == ['245__a:"quoted AND phrase"']
    assert tokenize_query("245__a:/rx AND rx/") == ["245__a:/rx AND rx/"]


@pytest.mark.slow
def test_fielded_text(ctx):
    assert run(ctx, "245__a:This") == [1]
    assert run(ctx, "245__a:this") == [1]          # stemmed/case-insensitive
    assert run(ctx, "245__b:is") == [1, 2]
    assert run(ctx, "520__a:description") == [1]
    assert run(ctx, "245__a:nomatch") == []


def test_fielded_exact(ctx):
    assert run(ctx, "245__a:'This'") == [1]
    assert run(ctx, "245__a:'Thi'") == []          # exact, not containment


def test_fielded_regex(ctx):
    assert run(ctx, "245__a:/^Th/") == [1]
    assert run(ctx, "245__a:/^th/i") == [1]
    assert run(ctx, "245__a:/other/") == [2]


def test_fielded_wildcard(ctx):
    assert run(ctx, "245__a:Th*") == [1]
    assert run(ctx, "245__a:*other") == [2]


def test_fielded_exists(ctx):
    assert run(ctx, "710__a:*") == [1]
    assert run(ctx, "245__a:*") == [1, 2]


@pytest.mark.slow
def test_tag_only(ctx):
    assert run(ctx, "245:title") == [1, 2]
    assert run(ctx, "245:'This'") == [1]
    assert run(ctx, "520:*") == [1]
    # auth-controlled tag-only search matches via linked auth heading
    assert run(ctx, "650:header") == [1, 2]
    assert run(ctx, "710:'Another header'") == [1]


def test_audit_date_range(spark, ctx):
    # audit semantics (reference query.py:363-372): '<' → <=, '>' → >=,
    # ':' → same-day [d, d+1] window
    audited = ctx.df.withColumn(
        "created",
        F.when(F.col("_id") == 1, F.lit("2026-01-15 10:00:00")).otherwise(
            F.lit("2026-03-01 00:00:00")).cast("timestamp"))
    actx = QueryContext(audited, record_type="bib", auth_index=ctx.auth_index)

    def runq(s):
        query = parse_query_string(s, record_type="bib", auth_index=ctx.auth_index)
        return sorted(r._id for r in execute_query(query, actx).select("_id").collect())

    assert runq("created:2026-01-15") == [1]       # same-day window
    assert runq("created>2026-02-01") == [2]
    assert runq("created<2026-02-01") == [1]
    assert runq("created>2026-01-01") == [1, 2]
    with pytest.raises(InvalidQueryString, match="Invalid date"):
        runq("created:15-01-2026")


def test_controlfield_and_id(ctx):
    assert run(ctx, "001:1") == [1]
    assert run(ctx, "id:2") == [2]
    assert run(ctx, "008:controlfield") == [1]
    assert run(ctx, "000:leader") == [1, 2]


def test_xref(ctx):
    assert run(ctx, "xref:1") == [1, 2]
    assert run(ctx, "xref:2") == [1]


def test_logical_field(ctx):
    assert run(ctx, "main_title:this") == [1]
    assert run(ctx, "title:another") == [2]
    assert run(ctx, "subject:header") == [1, 2]
    assert run(ctx, "s:*") == []                    # no symbol fields
    assert run(ctx, "notes:*") == [1]


def test_free_text(ctx):
    assert run(ctx, "description") == [1]
    assert run(ctx, "title") == [1, 2]
    assert run(ctx, "titles") == [1, 2]             # stemming
    assert run(ctx, '"is the title"') == [1, 2]
    assert run(ctx, "title -description") == [2]


def test_boolean(ctx):
    assert run(ctx, "245__a:This AND 710__a:*") == [1]
    assert run(ctx, "245__a:This OR 245__a:Another") == [1, 2]
    assert run(ctx, "245__b:is AND NOT 245__a:Another") == [1]
    assert run(ctx, "245__a:This OR 245__a:Another AND 520__a:description") == [1]


def test_error_cases(ctx):
    # reference parity: unclosed single quotes do NOT raise (the single-
    # quote state in the reference tokenizer is unreachable); double do
    tokenize_query("245__a:'unclosed")
    with pytest.raises(InvalidQueryString):
        tokenize_query('245__a:"unclosed AND x')
    with pytest.raises(InvalidQueryString):
        parse_query_string("id:abc")
    with pytest.raises(InvalidQueryString):
        parse_query_string("xref:abc")
    with pytest.raises(InvalidQueryString):
        parse_query_string("bogusfield:value")
    # leading NOT is allowed (reference guard is `i > 0`); mid-string NOT
    # must follow AND/OR
    parse_query_string("NOT 245__a:This")
    with pytest.raises(InvalidQueryString):
        parse_query_string("245__a:x NOT 245__a:y")
    with pytest.raises(InvalidQueryString):
        parse_query_string("245__a:x AND NOT")      # NOT at end
    with pytest.raises(InvalidQueryString):
        parse_query_string("245__a:x AND NOT freetext")  # NOT on free text
    with pytest.raises(InvalidQueryString):
        parse_query_string("001:notanumber")


def test_query_from_string_api(ctx):
    query = q.Query.from_string("245__a:'This'", record_type="bib",
                                auth_index=ctx.auth_index)
    assert len(query.conditions) == 1
    assert isinstance(query.conditions[0], q.Condition)


def test_atlas_query_split(ctx):
    from dlx_spark.marc.query import AtlasQuery, Text
    aq = AtlasQuery.from_string("245__a:This AND description",
                                record_type="bib", auth_index=ctx.auth_index)
    assert len(aq.text_conditions) == 1
    assert isinstance(aq.text_conditions[0], Text)
    assert len(aq.match.conditions) == 1
    # whole AtlasQuery still compiles/executes like a normal query
    from dlx_spark.marc.parser import execute_query
    ids = sorted(r._id for r in execute_query(aq, ctx).select("_id").collect())
    assert ids == [1]


def test_empty_value_error(ctx):
    with pytest.raises(InvalidQueryString, match="Empty search value"):
        parse_query_string("245__a:")
    with pytest.raises(InvalidQueryString, match="Empty search value"):
        parse_query_string("245:")


@pytest.mark.slow
def test_parser_fuzz_grammar_combinations(ctx):
    """Randomized grammar fuzz: 80 seeded samples of term shapes glued
    with AND/OR/AND NOT must either parse+execute or raise
    InvalidQueryString — never any other exception.  Single terms are
    parse-only (execution is covered by the targeted tests above);
    multi-term samples execute so boolean assembly runs for real."""
    import random

    rng = random.Random(20260813)
    terms = [
        "245__a:This", "245__a:'This'", "245:title", "245__a:*",
        "245__a:wild*", "245:/T.*s/", "520__a:description",
        "id:1", "xref:1", "title:'This is the title'", "title:This",
        "created<2030-01-01", "created>1990-01-01", "updated:2024-05-05",
        "free text", '"quoted phrase"', "-negated spark", "650__a:'Header'",
        "bogusfield:x", "id:notanum", "245__a:",
    ]
    glue = ["AND", "OR", "AND NOT"]
    for n_terms, samples, execute in ((1, 30, False), (2, 25, True), (3, 25, True)):
        for _ in range(samples):
            parts = [rng.choice(terms)]
            for _ in range(n_terms - 1):
                parts += [rng.choice(glue), rng.choice(terms)]
            s = " ".join(parts)
            try:
                query = parse_query_string(s, record_type="bib",
                                           auth_index=ctx.auth_index)
                # lazy semi-join terms only materialize via execute_query,
                # so parse success IS the single-term check
                if execute:
                    execute_query(query, ctx).select("_id").collect()
            except InvalidQueryString:
                pass
