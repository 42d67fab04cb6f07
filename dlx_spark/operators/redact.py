"""PII redaction: replace emails, SSNs, IPv4 addresses, and phone-like
number runs with typed placeholder tags, counting each category.

The patterns use only the regex subset shared by Java (Spark) and RE2
(DuckDB/Go) — character classes, bounded repetition, \\b anchors; no
lookaround — so the exact same sequential rewrite is expressible in
both engines and oracle-checkable.

Order matters and is part of the contract: email → SSN → IPv4 → phone.
The phone pattern (a loose digit-run matcher) would otherwise swallow
SSNs and dotted IPs; each stage counts on the text as left by the
previous stage.  Redaction is a pure per-row projection — no shuffle,
whole-stage codegen, linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dlx_spark.operators import common
from dlx_spark.operators.common import spread_for_compute

# (name, pattern, replacement) — applied strictly in this order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ip", r"\b(([0-9]{1,3})\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9(). -]{6,}[0-9]", "<PHONE>"),
]


#: composed-projection memo: (text_col, id_col) -> tuple of output
#: Columns.  Building the 4-stage cascade costs ~12 py4j Column calls
#: (regexp_count/regexp_replace per category) per construction; the
#: Columns are immutable unresolved expression trees over fixed
#: module-level patterns, so reuse across frames is safe — exactly the
#: ``common.cached_expr`` justification.  Size-capped: callers pass
#: arbitrary column names.
_PROJ_CACHE: dict[tuple[str, str], tuple] = common.register_py4j_cache({})
_PROJ_CACHE_MAX = 256


def _redact_projection(text_col: str, id_col: str) -> tuple:
    # the cached Columns hold py4j handles: clear on a gateway restart
    # (same guard as common's expression memo)
    common.check_gateway()
    key = (text_col, id_col)
    cols = _PROJ_CACHE.get(key)
    if cols is None:
        text = F.col(text_col)
        counts = []
        for name, pat, rep in PII_PATTERNS:
            counts.append(F.regexp_count(text, F.lit(pat))
                          .cast("long").alias(f"n_{name}"))
            text = F.regexp_replace(text, pat, rep)
        cols = (F.col(id_col).alias("id"), text.alias("clean_text"),
                *counts)
        if len(_PROJ_CACHE) < _PROJ_CACHE_MAX:
            _PROJ_CACHE[key] = cols
    return cols


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, clean_text, n_email, n_ssn, n_ip, n_phone).

    ``n_<cat>`` counts matches of each category on the text as seen by
    that stage (after earlier categories were already replaced), and
    ``clean_text`` is the fully redacted text.
    """
    # the 8 regex passes are the whole cost: spread a narrow scan first
    # so they parallelize (no-op on any already-wide input)
    return spread_for_compute(df).select(*_redact_projection(text_col,
                                                             id_col))
