"""Engine configuration tables.

Semantics mirror the reference configuration
(``/root/reference/dlx/config.py:21-343``): authority-control maps,
language-tag maps, logical-field definitions, record-type maps and the
default collation.  The reference keeps these as nested dicts consumed by
per-record Python loops; here each table is ALSO exposed as flat rows so
it can become a small broadcast DataFrame joined against the exploded
subfields view — the idiomatic Spark shape for config-driven derivation.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# Authority control: (record_type, tag, code) -> source auth heading tag.
# A bib field like 650$a stores an ``xref`` pointing at an auth whose
# heading lives in the mapped tag (150 for 650$a).
# Reference: dlx/config.py:21-97.
# ---------------------------------------------------------------------------

# the bib/speech/vote maps in the reference are identical except that the
# plain bib map also allows 991$9; keep one map + the extra code.
_BIB_AUTH_MAP: dict[str, dict[str, str]] = {
    "100": {"a": "100"},
    "110": {"a": "110"},
    "111": {"a": "111"},
    "130": {"a": "130"},
    "191": {"b": "190", "c": "190"},
    "440": {"a": "140"},
    "600": {"a": "100", "g": "100"},
    "610": {"a": "110", "g": "110"},
    "611": {"a": "111", "g": "111"},
    "630": {"a": "130", "g": "130"},
    "650": {"a": "150"},
    "651": {"a": "151"},
    "700": {"a": "100", "g": "100"},
    "710": {"a": "110"},
    "711": {"a": "111"},
    "730": {"a": "130"},
    "791": {"b": "190", "c": "190"},
    "830": {"a": "130"},
    "991": {"a": "191", "b": "191", "c": "191", "d": "191", "9": "191"},
}

_AUTH_AUTH_MAP: dict[str, dict[str, str]] = {
    "370": {"a": "110"},
    "500": {"a": "100"},
    "510": {"a": "110"},
    "511": {"a": "111"},
    "530": {"a": "130"},
    "550": {"a": "150"},
    "551": {"a": "151"},
    "591": {"a": "191", "b": "191", "c": "191", "d": "191"},
}

AUTHORITY_CONTROLLED: dict[str, dict[str, dict[str, str]]] = {
    "bib": _BIB_AUTH_MAP,
    "auth": _AUTH_AUTH_MAP,
}

# Language variants of auth headings: heading tag -> {lang: translation tag}.
# Reference: dlx/config.py:99-102.
AUTH_LANGUAGE_TAG: dict[str, dict[str, str]] = {
    "150": {"fr": "993", "es": "994", "ar": "995", "zh": "996", "ru": "997"},
    "151": {"fr": "993", "es": "994", "ar": "995", "zh": "996", "ru": "997"},
}

# The MARC date field (dlx/config.py:18).
DATE_FIELD = ("269", "a")

# Tags with per-tag text indexes (dlx/config.py:104-115); auth-controlled
# tags are always indexed in addition.
BIB_INDEX_TAGS = [
    "089", "191", "245", "246", "249", "269", "500", "520", "546",
    "930", "991", "989", "998", "999",
]
AUTH_INDEX_TAGS = [
    "100", "110", "111", "130", "140", "150", "190", "400", "410",
    "411", "430", "440", "450", "998", "999",
]

# _record_type tagging: type -> (tag, code, value). Reference
# dlx/config.py:117-120 — 089$b B22 => speech, B23 => vote.
BIB_TYPE_MAP: dict[str, tuple[str, str, str]] = {
    "speech": ("089", "b", "B22"),
    "vote": ("089", "b", "B23"),
}
AUTH_TYPE_MAP: dict[str, tuple[str, str, str]] = {}

# ---------------------------------------------------------------------------
# Logical fields: derived columns computed per physical field as the
# space-joined values of the listed subfield codes.  ``codes`` is a string
# of codes forming one group (dlx/config.py:124-337).
# ---------------------------------------------------------------------------

BIB_LOGICAL_FIELDS: dict[str, dict[str, list[str]]] = {
    "symbol": {"079": ["a"], "767": ["o"], "191": ["a", "z"], "791": ["a"]},
    "body": {"191": ["bc"], "791": ["bc"]},
    "subject": {
        "600": ["abcdq"], "610": ["abcdfgkn"], "611": ["acdegknq"],
        "630": ["adfgklnp"], "650": ["a"], "991": ["abcd"],
    },
    "title": {
        "130": ["adfgklnp"], "490": ["a"], "495": ["a"],
        "765": ["t"], "767": ["t"], "770": ["t"], "772": ["t"], "773": ["t"],
        "775": ["t"], "776": ["t"], "777": ["t"], "780": ["t"], "785": ["t"],
        "787": ["t"],
        "210": ["ab"], "222": ["ab"], "239": ["ab"], "740": ["anp"],
        "242": ["abnp"], "245": ["abhnp"], "243": ["adfgnp"],
        "246": ["abfgnp"], "247": ["abfgnp"], "240": ["adfgklnp"],
    },
    "main_title": {"245": ["a"]},
    "notes": {
        "490": ["a"], "495": ["a"], "500": ["a"], "598": ["a"], "501": ["a"],
        "502": ["a"], "504": ["a"], "506": ["a"], "510": ["a"], "515": ["a"],
        "516": ["a"], "518": ["a"], "520": ["a"], "521": ["a"], "522": ["a"],
        "523": ["a"], "524": ["a"], "525": ["a"], "530": ["a"], "533": ["a"],
        "534": ["a"], "535": ["a"], "536": ["a"], "538": ["a"], "540": ["a"],
        "541": ["a"], "544": ["a"], "545": ["a"], "546": ["a"], "547": ["a"],
        "550": ["a"], "556": ["a"], "561": ["a"], "580": ["a"], "591": ["a"],
        "592": ["a"], "593": ["a"], "513": ["ab"], "555": ["ad"],
        "505": ["argt"],
    },
    "author": {
        "111": ["acdgtxyz"], "711": ["acdgtxyz"],
        "110": ["abcdgtxyz"], "710": ["abcdgtxyz"],
        "100": ["abcdgqtxyz"], "700": ["abcdgqtxyz"],
        "130": ["adfgklnp"], "730": ["adfgklnp"],
    },
    "related_docs": {"993": ["a"]},
    "prodinf": {"930": ["a"]},
    "bib_creator": {"999": ["abc"]},
    "type": {"089": ["b"]},
    "date": {"269": ["a"], "992": ["a"]},
    "agenda": {"991": ["abcd"]},
    "series": {"440": ["a"], "490": ["a"], "830": ["a"]},
    # the reference has a bare string here ('700': 'a'); iteration over it
    # yields the single code group 'a', so normalize to the list form.
    "speaker": {"700": ["a"]},
    "country_org": {"710": ["a"], "711": ["a"]},
    "call_number": {"099": ["c"]},
}

AUTH_LOGICAL_FIELDS: dict[str, dict[str, list[str]]] = {
    "heading": {
        "100": ["abcdq"], "110": ["abcdfgkn"], "111": ["acdegknq"],
        "150": ["a"], "130": ["adfgklnp"], "190": ["bc"], "191": ["abcd"],
    },
    "subject": {
        "100": ["abcdq"], "400": ["a"], "500": ["a"],
        "110": ["abcdfgkn"], "410": ["a"], "510": ["a"],
        "111": ["acdegknq"], "411": ["a"], "511": ["a"],
        "130": ["adfgklnp"], "430": ["a"], "530": ["a"],
        "150": ["a"], "191": ["abcd"], "190": ["bc"],
        "491": ["d"], "591": ["abcd"],
    },
    "agenda": {"191": ["abcd"], "491": ["d"], "591": ["abcd"]},
    "agenda_title": {"191": ["c"], "591": ["c"]},
    "agenda_subject": {"191": ["d"], "491": ["d"], "591": ["d"]},
    "series": {"130": ["adfgklnp"], "430": ["a"], "530": ["a"]},
    "author": {
        "100": ["abcdgq"], "400": ["a"], "500": ["a"],
        "110": ["abcdfgkn"], "410": ["a"], "510": ["a"],
        "111": ["acdegknq"], "411": ["a"], "511": ["a"],
        "130": ["adfgklnp"], "430": ["a"], "530": ["a"],
    },
    "thesaurus": {"150": ["a"], "450": ["a"], "550": ["a"]},
    "body": {"190": ["bc"]},
}

LOGICAL_FIELDS: dict[str, dict[str, dict[str, list[str]]]] = {
    "bib": BIB_LOGICAL_FIELDS,
    "auth": AUTH_LOGICAL_FIELDS,
}

# Default collation on all reference reads (dlx/config.py:340):
# strength 1 = case- AND diacritic-insensitive, numericOrdering=True.
# Spark comparisons are binary, so the engine materializes normalized
# ``*_norm`` columns (see functions.tokenizer.scrub) and compares those.
DEFAULT_COLLATION = {"locale": "en", "strength": 1, "numericOrdering": True}


# ---------------------------------------------------------------------------
# Lookup helpers (reference dlx/config.py:346-459)
# ---------------------------------------------------------------------------

def is_authority_controlled(record_type: str, tag: str, code: str) -> bool:
    return code in AUTHORITY_CONTROLLED.get(record_type, {}).get(tag, {})


def authority_source_tag(record_type: str, tag: str, code: str) -> str | None:
    return AUTHORITY_CONTROLLED.get(record_type, {}).get(tag, {}).get(code)


@lru_cache(maxsize=1)
def auth_heading_tags() -> list[str]:
    tags = set()
    for m in AUTHORITY_CONTROLLED.values():
        for codes in m.values():
            tags.update(codes.values())
    return sorted(tags)


def auth_linked_codes(heading_tag: str) -> list[str]:
    codes = []
    for m in AUTHORITY_CONTROLLED.values():
        for subdict in m.values():
            for code, src in subdict.items():
                if src == heading_tag:
                    codes.append(code)
    return codes


def language_source_tag(tag: str, language: str) -> str | None:
    return AUTH_LANGUAGE_TAG.get(tag, {}).get(language)


def linked_language_source_tag(record_type: str, tag: str, code: str, language: str) -> str | None:
    src = authority_source_tag(record_type, tag, code)
    return language_source_tag(src, language) if src else None


@lru_cache(maxsize=1)
def auth_language_tags() -> list[str]:
    tags = set()
    for langs in AUTH_LANGUAGE_TAG.values():
        tags.update(langs.values())
    return sorted(tags)


def auth_controlled_logical_fields(record_type: str) -> list[str]:
    found = set()
    for field, tag_map in LOGICAL_FIELDS[record_type].items():
        for tag, groups in tag_map.items():
            for group in groups:
                if any(is_authority_controlled(record_type, tag, c) for c in group):
                    found.add(field)
    return sorted(found)


# ---------------------------------------------------------------------------
# Flat-row views (for broadcast DataFrames)
# ---------------------------------------------------------------------------

def authority_controlled_rows() -> list[tuple[str, str, str, str]]:
    """(record_type, tag, code, source_heading_tag) rows."""
    rows = []
    for rtype, m in AUTHORITY_CONTROLLED.items():
        for tag, codes in m.items():
            for code, src in codes.items():
                rows.append((rtype, tag, code, src))
    return rows


def logical_field_rows(record_type: str) -> list[tuple[str, str, int, str]]:
    """(logical_field, tag, group_index, codes) rows; ``codes`` is the
    concatenated code group whose subfield values are space-joined per
    physical field occurrence."""
    rows = []
    for field, tag_map in LOGICAL_FIELDS[record_type].items():
        for tag, groups in tag_map.items():
            for i, group in enumerate(groups):
                rows.append((field, tag, i, group))
    return rows


def language_tag_rows() -> list[tuple[str, str, str]]:
    """(heading_tag, lang, translation_tag) rows."""
    return [
        (tag, lang, ttag)
        for tag, langs in AUTH_LANGUAGE_TAG.items()
        for lang, ttag in langs.items()
    ]
