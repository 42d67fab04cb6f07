"""DataFrame transforms over the canonical nested JMARC schema.

Every reference query/maintenance operation reduces to one of the
transforms here (SURVEY §1.3, §2):

- ``explode_subfields``  — the query-workhorse exploded view; positions
  are computed **inside the array domain** (no window shuffle)
- ``auth_headings``      — the broadcast join dimension for authority
  control, with normalized (collation-emulating) match columns
- ``resolve_values``     — the lazy bib→auth foreign-key join realized as
  a broadcast left join + re-nest
- ``derive_text_words``  — the record-level search columns
- ``derive_logical_fields`` — config-driven derived columns
- ``auth_use_counts``    — xref usage aggregation

All of these are shuffle-lean by construction: per-record recomputation
is map-side except the final re-nest/aggregate keyed by record id, and
the auth dimension is broadcast while it is provably broadcast-sized
(``MarcStore.HEADINGS_BROADCAST_MAX_AUTHS`` gates the forced hint;
above it, AQE picks — shuffling once is correct, OOMing the driver is
not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dlx_spark import config
from dlx_spark.functions.tokenizer import scrub_col, tokenize_udf


def explode_subfields(df: DataFrame, record_type: str = "bib") -> DataFrame:
    """One row per subfield: (record_id, record_type, tag, field_pos,
    ind1, ind2, code, sub_pos, value, xref, gpos).

    ``field_pos`` is the 0-based position among fields of the SAME tag
    and ``sub_pos`` the 0-based position among subfields of the same code
    within a field — the reference's addressing scheme
    (dlx/marc/__init__.py:649-656).  Both are computed with array-domain
    expressions (slice+filter over what are small per-record arrays), so
    the transform is a pure map — no shuffle, survives any scale-up.
    ``gpos`` is a global (field_idx, sub_idx) ordinal for stable
    re-assembly ordering.
    """
    fields = F.expr("""
        transform(datafields, (f, i) -> struct(
            f.tag as tag, f.ind1 as ind1, f.ind2 as ind2, f.subfields as subfields,
            size(filter(slice(datafields, 1, i), p -> p.tag = f.tag)) as field_pos,
            i as field_idx))
    """)
    out = (
        df.select(
            F.col("_id").alias("record_id"),
            F.explode(fields).alias("f"),
        )
        .select(
            "record_id",
            F.col("f.tag").alias("tag"),
            F.col("f.field_pos").alias("field_pos"),
            F.col("f.field_idx").alias("field_idx"),
            F.col("f.ind1").alias("ind1"),
            F.col("f.ind2").alias("ind2"),
            F.posexplode(F.expr("""
                transform(f.subfields, (s, j) -> struct(
                    s.code as code, s.value as value, s.xref as xref,
                    size(filter(slice(f.subfields, 1, j), p -> p.code = s.code)) as sub_pos))
            """)).alias("sub_idx", "s"),
        )
        .select(
            "record_id",
            F.lit(record_type).alias("record_type"),
            "tag", "field_pos", "ind1", "ind2",
            F.col("s.code").alias("code"),
            F.col("s.sub_pos").alias("sub_pos"),
            F.col("s.value").alias("value"),
            F.col("s.xref").alias("xref"),
            # ordinal for stable re-assembly; 1e6 multiplier keeps it
            # correct up to a million subfields per field
            (F.col("field_idx").cast("long") * F.lit(1_000_000) + F.col("sub_idx")).alias("gpos"),
        )
    )
    return out


def subfield_token_rows(df: DataFrame, record_type: str = "bib",
                        headings: DataFrame | None = None,
                        hint: bool = True) -> DataFrame:
    """The tokenized subfield view backing fielded text search —
    (record_id, tag, code, value, xref, toks, value_norm), one row per
    non-empty subfield, linked values overlaid from ``headings`` (so
    text matches against the CURRENT heading, the reference's index
    semantics).  This is the single derivation shared by the on-demand
    per-session view (parser.QueryContext) and the PERSISTED search
    index (``MarcStore.build_search_index``); keeping it in one place
    is what makes the two provably interchangeable.

    ``hint=False`` drops the FORCED broadcast of the heading dimension
    and lets Catalyst/AQE pick the join strategy — callers pass it when
    the auths table exceeds ``MarcStore.HEADINGS_BROADCAST_MAX_AUTHS``
    (translations multiply the dimension's rows per heading subfield ×
    language; force-broadcasting a multi-GB dimension OOMs the driver —
    the same failure mode ``MergeOnReadTable.BROADCAST_MAX_DELTA_ROWS``
    gates on the delta side)."""
    from dlx_spark.functions.tokenizer import scrub_col, tokenize_udf
    ex = explode_subfields(df, record_type)
    if headings is not None:
        base = headings.filter(F.col("lang").isNull()).select(
            "auth_id", F.col("code").alias("h_code"),
            F.col("value").alias("h_value"))
        if hint:
            base = F.broadcast(base)
        ex = (ex.join(base,
                      on=[ex["xref"] == base["auth_id"],
                          ex["code"] == base["h_code"]],
                      how="left")
              .withColumn("value", F.coalesce("h_value", "value"))
              .drop("auth_id", "h_code", "h_value"))
    return (ex.filter(F.col("value").isNotNull() | F.col("xref").isNotNull())
            .select("record_id", "tag", "code", "value", "xref",
                    tokenize_udf(F.col("value")).alias("toks"),
                    scrub_col(F.col("value")).alias("value_norm")))


def auth_headings(auths: DataFrame) -> DataFrame:
    """Extract the authority join dimension: one row per heading subfield
    (+ language-variant rows per the translation-tag map).  Heading field
    = FIRST field with tag 1xx (dlx/marc/__init__.py:2048-2058).

    The result is dimension-sized and broadcast at join sites while
    the auths table stays under
    ``MarcStore.HEADINGS_BROADCAST_MAX_AUTHS`` (the per-site ``hint``
    flag); past it the joins run unhinted and AQE picks the strategy.
    """
    heading = F.expr("filter(datafields, f -> f.tag like '1%')[0]")
    base = (
        auths.select(F.col("_id").alias("auth_id"), heading.alias("h"))
        .filter(F.col("h").isNotNull())
        .select("auth_id", F.col("h.tag").alias("tag"),
                F.explode("h.subfields").alias("s"))
        .select("auth_id", "tag", F.col("s.code").alias("code"),
                F.col("s.value").alias("value"), F.lit(None).cast("string").alias("lang"))
    )

    # language variants: heading tag -> translation tag (e.g. 150 -> 993 fr)
    lang_rows = config.language_tag_rows()
    if lang_rows:
        spark = auths.sparkSession
        lang_dim = spark.createDataFrame(lang_rows, "heading_tag string, lang string, ttag string")
        heading_tag = F.expr("filter(datafields, f -> f.tag like '1%')[0].tag")
        translations = (
            auths.select(F.col("_id").alias("auth_id"), heading_tag.alias("h_tag"),
                         F.explode("datafields").alias("f"))
            .join(F.broadcast(lang_dim),
                  on=[F.col("f.tag") == F.col("ttag"),
                      F.col("h_tag") == F.col("heading_tag")],
                  how="inner")
            .select("auth_id", F.col("h_tag").alias("tag"),
                    F.explode("f.subfields").alias("s"), "lang")
            .select("auth_id", "tag", F.col("s.code").alias("code"),
                    F.col("s.value").alias("value"), "lang")
        )
        base = base.unionByName(translations)

    return base.withColumn("norm", scrub_col(F.col("value")))


def resolve_values(df: DataFrame, headings: DataFrame,
                   hint: bool = True) -> DataFrame:
    """Materialize linked-subfield values: broadcast-left-join the
    exploded subfields against the heading dimension and re-nest.  This
    is the reference's read-time ``Linked.value`` join
    (dlx/marc/__init__.py:2698-2717) done once, set-wide.

    ``hint=False`` drops the forced broadcast for dimension sizes past
    ``MarcStore.HEADINGS_BROADCAST_MAX_AUTHS`` — see
    ``subfield_token_rows``."""
    base_headings = headings.filter(F.col("lang").isNull()).select(
        F.col("auth_id"), F.col("code").alias("h_code"), F.col("value").alias("h_value"))
    if hint:
        base_headings = F.broadcast(base_headings)

    exploded = explode_subfields(df)
    resolved = (
        exploded.join(
            base_headings,
            on=[exploded["xref"] == base_headings["auth_id"],
                exploded["code"] == base_headings["h_code"]],
            how="left",
        )
        .select(
            "record_id", "tag", "field_pos", "ind1", "ind2", "code", "sub_pos",
            F.coalesce("h_value", "value").alias("value"), "xref", "gpos",
        )
    )
    return nest_subfields(resolved, df)


def nest_subfields(exploded: DataFrame, original: DataFrame) -> DataFrame:
    """Re-assemble the canonical nested shape from an exploded view,
    preserving field and subfield order via ``gpos``.  One shuffle keyed
    by record id — the minimum possible for a re-nest."""
    nested = (
        exploded
        .groupBy("record_id", "tag", "field_pos", "ind1", "ind2")
        .agg(
            F.array_sort(F.collect_list(F.struct("gpos", "code", "value", "xref"))).alias("subs"),
            F.min("gpos").alias("field_gpos"),
        )
        .select(
            "record_id",
            F.struct(
                "tag", "ind1", "ind2",
                F.expr("transform(subs, s -> struct(s.code as code, s.value as value, s.xref as xref))").alias("subfields"),
            ).alias("field"),
            "field_gpos",
        )
        .groupBy("record_id")
        .agg(F.expr("transform(array_sort(collect_list(struct(field_gpos, field))), p -> p.field)").alias("datafields"))
    )
    # records whose datafields are empty have no exploded rows: the left
    # join would leave NULL, which poisons downstream exists() predicates
    # and breaks []-vs-NULL round trips — coalesce back to an empty array
    empty = f"cast(array() as {nested.schema['datafields'].dataType.simpleString()})"
    return (
        original.drop("datafields")
        .join(nested, original["_id"] == nested["record_id"], "left")
        .drop("record_id")
        .withColumn("datafields", F.coalesce(F.col("datafields"), F.expr(empty)))
    )


def derive_text_words(df: DataFrame, headings: DataFrame | None = None,
                      hint: bool = True) -> DataFrame:
    """Recompute the ``text``/``words`` search columns (reference commit
    step, dlx/marc/__init__.py:913-956): text is the padded scrub of all
    datafield values in field order; words the distinct stemmed tokens.

    Stemming is the one genuinely-Python step → a single Arrow-batched
    pandas UDF over one concatenated string per record.  ``hint`` is
    the heading-dimension broadcast gate, passed to ``resolve_values``.
    """
    src = df
    if headings is not None:
        src = resolve_values(df, headings, hint=hint)

    raw = F.concat_ws(
        " ",
        F.expr("""
            flatten(transform(datafields, f ->
                filter(transform(f.subfields, s -> s.value), v -> v is not null)))
        """),
    )
    out = src.withColumn("_raw_text", raw)
    # scrub stays JVM-side (pure column expression); only stemming needs
    # the Arrow-batched Python hop
    out = out.withColumn(
        "text",
        F.when(F.col("_raw_text") == "", F.lit(" "))
         .otherwise(F.concat(F.lit(" "), scrub_col(F.col("_raw_text")), F.lit(" "))),
    )
    out = out.withColumn("words", F.array_distinct(tokenize_udf(F.col("_raw_text"))))
    return out.drop("_raw_text")


def logical_field_config_df(spark, record_type: str) -> DataFrame:
    """The logical-field definition table as a broadcast dimension:
    (logical_field, tag, group_idx, code) — one row per code."""
    rows = []
    for field, tag, gi, codes in config.logical_field_rows(record_type):
        for code in codes:
            rows.append((field, tag, gi, code))
    return spark.createDataFrame(rows, "logical_field string, tag string, group_idx int, code string")


def _logical_field_expr(record_type: str, field_name: str):
    """One logical-field column as a pure array-domain expression: for
    each configured tag (sorted, matching the reference's field
    iteration order) and each code group, the space-joined subfield
    values of every matching physical field.  No shuffle, no join —
    whole derivation is map-side."""
    tag_map = config.LOGICAL_FIELDS[record_type][field_name]
    per_tag = []
    for tag in sorted(tag_map):
        group_exprs = []
        for group in tag_map[tag]:
            codes = ",".join(f"'{c}'" for c in group)
            group_exprs.append(
                f"array_join(transform(filter(f.subfields, s -> s.code in ({codes})"
                f" and s.value is not null), s -> s.value), ' ')")
        inner = ",".join(group_exprs)
        per_tag.append(
            f"flatten(transform(filter(datafields, f -> f.tag = '{tag}'),"
            f" f -> array({inner})))")
    concatenated = per_tag[0] if len(per_tag) == 1 else f"concat({','.join(per_tag)})"
    return F.expr(f"""
        nullif(filter({concatenated}, v -> v != ''), array())
    """)


def derive_logical_fields(df: DataFrame, record_type: str = "bib",
                          headings: DataFrame | None = None) -> DataFrame:
    """Compute derived logical-field columns (reference
    ``Marc.logical_fields``, dlx/marc/__init__.py:1321-1347 and the
    build_logical_fields script): per (record, physical field, logical
    field, code group), the space-joined subfield values in subfield
    order; each becomes one array entry on the record.

    Plan shape: pure array-domain projection — ZERO shuffles when the
    rows already carry resolved linked values (the commit path).  When
    ``headings`` is given, linked values are refreshed first via one
    broadcast-join + re-nest (``resolve_values``).
    """
    if headings is not None:
        df = resolve_values(df, headings)

    out = df
    for field_name in config.LOGICAL_FIELDS[record_type]:
        out = out.withColumn(field_name, _logical_field_expr(record_type, field_name))

    # _record_type tagging (dlx/config.py:117-120): default + record_type
    # + any matching type-map value
    type_map = config.BIB_TYPE_MAP if record_type == "bib" else config.AUTH_TYPE_MAP
    rtype = F.array(F.lit("default"), F.lit(record_type))

    def has_tag_code_value(tag: str, code: str, value: str):
        def field_pred(f):
            return (f["tag"] == tag) & F.exists(
                f["subfields"], lambda s: (s["code"] == code) & (s["value"] == value))
        return F.exists("datafields", field_pred)

    for type_name, (tag, code, value) in type_map.items():
        has = has_tag_code_value(tag, code, value)
        rtype = F.when(has, F.concat(rtype, F.array(F.lit(type_name)))).otherwise(rtype)
    return out.withColumn("_record_type", rtype)


def auth_use_counts(bibs: DataFrame) -> DataFrame:
    """Usage count per auth xref (reference calculate_auth_use,
    build_logical_fields.py:218-252): explode → groupBy(xref).count().
    Partial aggregation makes this one light shuffle at any scale."""
    return (
        bibs.select(F.explode("datafields").alias("f"))
        .select(F.explode("f.subfields").alias("s"))
        .filter(F.col("s.xref").isNotNull())
        .groupBy(F.col("s.xref").alias("xref"))
        .agg(F.count(F.lit(1)).alias("bib_use_count"))
    )


def partial_lookup(headings: DataFrame, string: str, code: str | None = None,
                   tag: str | None = None, limit: int = 25) -> DataFrame:
    """Typeahead heading lookup (reference Auth.partial_lookup,
    dlx/marc/__init__.py:1995-2041): case/diacritic-insensitive substring
    match against heading values, capped at ``limit``."""
    from dlx_spark.functions.tokenizer import scrub
    out = headings.filter(F.col("lang").isNull())
    if tag:
        out = out.filter(F.col("tag") == tag)
    if code:
        out = out.filter(F.col("code") == code)
    needle = scrub(string)
    return (out.filter(F.col("norm").contains(needle))
            .orderBy("norm", "auth_id")
            .select("auth_id", "tag", "code", "value")
            .limit(limit))


def in_use(bibs: DataFrame, auth_id: int) -> DataFrame:
    """Records referencing auth ``auth_id`` in any subfield (reference
    Auth.in_use / list_attached, dlx/marc/__init__.py:2091-2141).
    Expressed as an array-exists predicate → full benefit of predicate
    pushdown-adjacent pruning, no explode needed."""
    return bibs.filter(
        F.exists("datafields",
                 lambda f: F.exists(f["subfields"], lambda s: s["xref"] == F.lit(auth_id)))
    )
