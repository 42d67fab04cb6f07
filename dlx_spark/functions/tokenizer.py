"""Text normalization: word splitting, diacritic folding, Porter stemming.

Semantics follow the reference tokenizer (``/root/reference/dlx/util.py:
1061-1118``): ``split_words`` splits on explicit punctuation unicode
blocks, ``asciify`` folds diacritics to ASCII, ``scrub`` produces the
collation-normalized form used everywhere the reference relies on its
strength-1 (case/diacritic-insensitive) MongoDB collation, and
``tokenize`` produces the stemmed word arrays behind the ``words`` search
column and free-text queries.

Design notes for Spark:

- ``scrub_col`` / ``split_words_col`` / ``tokenize_simple_col`` are pure
  Column expressions (JVM-side, codegen-friendly).  Diacritic folding is
  expressed as ``F.translate`` over a mapping string generated from
  Unicode NFKD decompositions at import time — no Python in the hot path.
- Porter stemming has no JVM built-in, so ``tokenize_udf`` is an
  Arrow-batched pandas UDF.  It is used only where stemmed-parity matters
  (the ``words`` derivation and free-text search), never in relational
  queries.
- The stemmer is a from-scratch implementation of the published Porter
  algorithm (Porter, 1980, "An algorithm for suffix stripping") including
  the extensions NLTK layers on top, because the reference uses NLTK's
  ``PorterStemmer`` and golden tests assert its outputs (e.g.
  ``testing→test``, ``icing→ice``, ``another→anoth``).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# Word splitting — same unicode punctuation blocks as the reference
# (dlx/util.py:1069-1081): ASCII punctuation, Latin-1 supplement
# punctuation, general punctuation, currency symbols.
# ---------------------------------------------------------------------------

_PUNCT_RANGES = (
    "\u0020-\u002f\u003a-\u0040\u005b-\u0060\u007b-\u007e"  # ASCII
    "\u00a0-\u00bf"  # Latin-1 supplement punctuation
    "\u2000-\u206f"  # general punctuation
    "\u20a0-\u20cf"  # currency symbols
)
_WORD_RE = re.compile(f"[^{_PUNCT_RANGES}]+")
# same class, escaped for Spark's Java regex engine
PUNCT_CLASS_JAVA = "[\\u0020-\\u002f\\u003a-\\u0040\\u005b-\\u0060\\u007b-\\u007e\\u00a0-\\u00bf\\u2000-\\u206f\\u20a0-\\u20cf]"


def split_words(string: str) -> list[str]:
    """Split into word tokens on the explicit punctuation classes."""
    return _WORD_RE.findall(string)


# ---------------------------------------------------------------------------
# Diacritic folding.  The reference carries an explicit ~660-entry
# character map; equivalent behavior is derived here from Unicode NFKD
# decomposition (strip combining marks) plus a supplement for letters
# that do not decompose.
# ---------------------------------------------------------------------------

_FOLD_SUPPLEMENT = {
    "Æ": "AE", "æ": "ae", "Œ": "OE", "œ": "oe",
    "ß": "ss", "ẞ": "SS",
    "Ø": "O", "ø": "o",
    "Đ": "D", "đ": "d", "Ð": "D", "ð": "d",
    "Þ": "TH", "þ": "th",
    "Ł": "L", "ł": "l",
    "Ħ": "H", "ħ": "h",
    "Ŋ": "N", "ŋ": "n",
    "Ŧ": "T", "ŧ": "t",
    "ı": "i", "ĸ": "k",
    "Ɖ": "D", "Ɔ": "O", "ɔ": "o", "Ɛ": "E", "ɛ": "e",
    "ƒ": "f", "Ƒ": "F",
    "ʻ": "", "ʼ": "", "ʽ": "", "ʾ": "", "ʿ": "",  # modifier letters (hamza etc.)
    "—": " ", "–": " ",
}


@lru_cache(maxsize=None)
def _fold_char(ch: str) -> str:
    if ord(ch) < 128:
        return ch
    if ch in _FOLD_SUPPLEMENT:
        return _FOLD_SUPPLEMENT[ch]
    decomposed = unicodedata.normalize("NFKD", ch)
    out = "".join(c for c in decomposed if not unicodedata.combining(c))
    if out and all(ord(c) < 128 for c in out):
        return out
    return ch  # unmapped script (CJK, Cyrillic, Arabic, ...): keep


def asciify(string: str) -> str:
    """Fold diacritics to ASCII.  Mirrors the reference behavior
    (dlx/util.py:1083-1100): pure-ASCII strings pass through unchanged;
    strings where folding applies are lowercased as a whole; strings of
    unmapped non-ASCII (e.g. pure CJK) pass through unchanged."""
    if all(ord(c) < 128 for c in string):
        return string
    folded = "".join(_fold_char(c) for c in string)
    if folded == string:
        return string
    return folded.lower()


def scrub(string: str) -> str:
    """Collation-normalized form: punctuation → space, diacritics folded,
    lowercased, stripped (dlx/util.py:1106-1112).  Two values are equal
    under the reference's strength-1 collation iff their scrubs match.

    Iterated to a fixed point: NFKD folding can EXPAND an enclosed
    alphanumeric into punctuation ('🄀' → '0.') that the word-split
    pass would then strip — a canonical form must be idempotent
    (property-pinned, tests/test_property.py), so re-normalize until
    stable (one extra pass in practice, none for ordinary text)."""
    out = asciify(" ".join(split_words(string)).upper()).lower().strip()
    while True:
        again = asciify(" ".join(split_words(out)).upper()).lower().strip()
        if again == out:
            return out
        out = again


# ---------------------------------------------------------------------------
# Porter stemmer (with the NLTK extensions the reference depends on).
# ---------------------------------------------------------------------------

class PorterStemmer:
    """Porter (1980) suffix-stripping algorithm, including the NLTK
    extensions: the irregular-forms pool, 4-letter 'ies'/'ied' handling,
    the two-letter vowel-consonant CVC allowance (icing→ice), y→i only
    after a consonant with stem length > 1, 'alli'→'al' re-entry,
    'fulli'→'ful' and 'logi'→'log' rules."""

    VOWELS = frozenset("aeiou")

    IRREGULAR = {
        "skies": "sky", "sky": "sky",
        "dying": "die", "lying": "lie", "tying": "tie",
        "news": "news",
        "innings": "inning", "inning": "inning",
        "outings": "outing", "outing": "outing",
        "cannings": "canning", "canning": "canning",
        "howe": "howe",
        "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    }

    # --- character classification -----------------------------------------

    def _cons(self, word: str, i: int) -> bool:
        ch = word[i]
        if ch in self.VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(word, i - 1)
        return True

    def _measure(self, stem: str) -> int:
        seq = "".join("c" if self._cons(stem, i) else "v" for i in range(len(stem)))
        return seq.count("vc")

    def _m_gt0(self, stem: str) -> bool:
        return self._measure(stem) > 0

    def _m_gt1(self, stem: str) -> bool:
        return self._measure(stem) > 1

    def _has_vowel(self, stem: str) -> bool:
        return any(not self._cons(stem, i) for i in range(len(stem)))

    def _double_cons(self, word: str) -> bool:
        return len(word) >= 2 and word[-1] == word[-2] and self._cons(word, len(word) - 1)

    def _cvc(self, word: str) -> bool:
        if (
            len(word) >= 3
            and self._cons(word, len(word) - 3)
            and not self._cons(word, len(word) - 2)
            and self._cons(word, len(word) - 1)
            and word[-1] not in "wxy"
        ):
            return True
        # NLTK extension: two-letter vowel+consonant counts (ic → ice)
        return len(word) == 2 and not self._cons(word, 0) and self._cons(word, 1)

    # --- rule application ---------------------------------------------------

    def _rules(self, word: str, rules) -> str:
        for suffix, repl, cond in rules:
            if suffix == "*d":
                if self._double_cons(word):
                    stem = word[:-2]
                    return stem + repl(word) if cond is None or cond(stem) else word
                continue
            if word.endswith(suffix):
                stem = word[: len(word) - len(suffix)] if suffix else word
                if cond is None or cond(stem):
                    return stem + repl
                return word
        return word

    # --- steps ---------------------------------------------------------------

    def _step1a(self, word: str) -> str:
        if word.endswith("ies") and len(word) == 4:
            return word[:-3] + "ie"
        return self._rules(word, [("sses", "ss", None), ("ies", "i", None),
                                  ("ss", "ss", None), ("s", "", None)])

    def _step1b(self, word: str) -> str:
        if word.endswith("ied"):
            return word[:-3] + ("ie" if len(word) == 4 else "i")
        if word.endswith("eed"):
            stem = word[:-3]
            return stem + "ee" if self._measure(stem) > 0 else word

        intermediate = None
        for suffix in ("ed", "ing"):
            if word.endswith(suffix):
                cand = word[: -len(suffix)]
                if self._has_vowel(cand):
                    intermediate = cand
                break
        if intermediate is None:
            return word

        last = intermediate[-1]
        return self._rules(intermediate, [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", lambda w: w[-2], (lambda stem: last not in "lsz")),
            ("", "e", lambda stem: self._measure(stem) == 1 and self._cvc(stem)),
        ])

    def _step1c(self, word: str) -> str:
        if word.endswith("y"):
            stem = word[:-1]
            if len(stem) > 1 and self._cons(stem, len(stem) - 1):
                return stem + "i"
        return word

    def _step2(self, word: str) -> str:
        # NLTK extension: apply alli→al first and re-enter
        if word.endswith("alli") and self._m_gt0(word[:-4]):
            return self._step2(word[:-4] + "al")
        whole = word
        return self._rules(word, [
            ("ational", "ate", self._m_gt0),
            ("tional", "tion", self._m_gt0),
            ("enci", "ence", self._m_gt0),
            ("anci", "ance", self._m_gt0),
            ("izer", "ize", self._m_gt0),
            ("bli", "ble", self._m_gt0),       # Porter's later revision of abli→able
            ("alli", "al", self._m_gt0),
            ("entli", "ent", self._m_gt0),
            ("eli", "e", self._m_gt0),
            ("ousli", "ous", self._m_gt0),
            ("ization", "ize", self._m_gt0),
            ("ation", "ate", self._m_gt0),
            ("ator", "ate", self._m_gt0),
            ("alism", "al", self._m_gt0),
            ("iveness", "ive", self._m_gt0),
            ("fulness", "ful", self._m_gt0),
            ("ousness", "ous", self._m_gt0),
            ("aliti", "al", self._m_gt0),
            ("iviti", "ive", self._m_gt0),
            ("biliti", "ble", self._m_gt0),
            ("fulli", "ful", self._m_gt0),
            # keep the leading 'l' with the stem so geo/theo work
            ("logi", "log", lambda stem: self._m_gt0(whole[:-3])),
        ])

    def _step3(self, word: str) -> str:
        return self._rules(word, [
            ("icate", "ic", self._m_gt0),
            ("ative", "", self._m_gt0),
            ("alize", "al", self._m_gt0),
            ("iciti", "ic", self._m_gt0),
            ("ical", "ic", self._m_gt0),
            ("ful", "", self._m_gt0),
            ("ness", "", self._m_gt0),
        ])

    def _step4(self, word: str) -> str:
        return self._rules(word, [
            ("al", "", self._m_gt1),
            ("ance", "", self._m_gt1),
            ("ence", "", self._m_gt1),
            ("er", "", self._m_gt1),
            ("ic", "", self._m_gt1),
            ("able", "", self._m_gt1),
            ("ible", "", self._m_gt1),
            ("ant", "", self._m_gt1),
            ("ement", "", self._m_gt1),
            ("ment", "", self._m_gt1),
            ("ent", "", self._m_gt1),
            ("ion", "", lambda stem: self._m_gt1(stem) and stem[-1:] in ("s", "t")),
            ("ou", "", self._m_gt1),
            ("ism", "", self._m_gt1),
            ("ate", "", self._m_gt1),
            ("iti", "", self._m_gt1),
            ("ous", "", self._m_gt1),
            ("ive", "", self._m_gt1),
            ("ize", "", self._m_gt1),
        ])

    def _step5a(self, word: str) -> str:
        if word.endswith("e"):
            stem = word[:-1]
            m = self._measure(stem)
            if m > 1 or (m == 1 and not self._cvc(stem)):
                return stem
        return word

    def _step5b(self, word: str) -> str:
        if word.endswith("ll") and self._measure(word[:-1]) > 1:
            return word[:-1]
        return word

    def stem(self, word: str) -> str:
        w = word.lower()
        if w in self.IRREGULAR:
            return self.IRREGULAR[w]
        if len(w) <= 2:
            return w
        for step in (self._step1a, self._step1b, self._step1c, self._step2,
                     self._step3, self._step4, self._step5a, self._step5b):
            w = step(w)
        return w


_STEMMER = PorterStemmer()
_STEM_CACHE: dict[str, str] = {}


def stem(word: str) -> str:
    """Memoized Porter stem — natural-language vocabularies are small
    relative to corpus size, so the cache hit rate at scale is ~100%."""
    out = _STEM_CACHE.get(word)
    if out is None:
        out = _STEMMER.stem(word)
        if len(_STEM_CACHE) < 2_000_000:
            _STEM_CACHE[word] = out
    return out


def tokenize(string: str) -> list[str]:
    """asciify → split → stem each word (dlx/util.py:1114-1118)."""
    return [stem(w) for w in split_words(asciify(string))]


# ---------------------------------------------------------------------------
# Spark Column expressions (JVM-side; preferred in query plans)
# ---------------------------------------------------------------------------

def _translate_tables() -> tuple[str, str, list[tuple[str, str]]]:
    """Build (src, dst) strings for F.translate plus multi-char
    replacement pairs, derived from the same fold logic as asciify."""
    src, dst, multi = [], [], []
    # Latin-1 supplement, Latin Extended-A/B, IPA-adjacent, combining-
    # precomposed Latin Extended Additional (covers Vietnamese), plus
    # common punctuation — everything the Python-side fold handles that
    # can appear precomposed in bibliographic data
    cps = (list(range(0xC0, 0x250)) + list(range(0x1E00, 0x1F00))
           + [0x1E9E, 0x2018, 0x2019, 0x201C, 0x201D])
    for cp in cps:
        ch = chr(cp)
        folded = _fold_char(ch)
        if folded == ch:
            continue
        if len(folded) == 1:
            src.append(ch)
            dst.append(folded)
        elif len(folded) == 0:
            # F.translate drops chars with no counterpart when dst shorter;
            # handle explicit deletions via regexp pairs instead
            multi.append((ch, ""))
        else:
            multi.append((ch, folded))
    return "".join(src), "".join(dst), multi


_TR_SRC, _TR_DST, _TR_MULTI = _translate_tables()


def asciify_col(col: Column) -> Column:
    """Diacritic folding as a Column expression (subset of full asciify:
    covers Latin scripts; unmapped scripts pass through like the
    reference)."""
    out = col
    for ch, rep in _TR_MULTI:
        out = F.regexp_replace(out, re.escape(ch), rep)
    return F.translate(out, _TR_SRC, _TR_DST)


def scrub_col(col: Column) -> Column:
    """Column form of ``scrub`` — the engine's collation-normalization.
    Used to materialize ``*_norm`` match columns so equality under the
    reference's strength-1 collation becomes plain binary equality."""
    spaced = F.regexp_replace(col, PUNCT_CLASS_JAVA + "+", " ")
    return F.trim(F.lower(asciify_col(spaced)))


def split_words_col(col: Column) -> Column:
    """Word-split as a Column expression; drops empty tokens."""
    return F.filter(F.split(col, PUNCT_CLASS_JAVA + "+"), lambda t: t != "")


def tokenize_simple_col(col: Column) -> Column:
    """SQL-expressible tokenization (no stemming): scrub then split.
    Used for oracle-checkable text operators; stemmed parity paths use
    ``tokenize_udf``."""
    return split_words_col(scrub_col(col))


def natural_sort_key(col_name: str, width: int = 12) -> Column:
    """Sort-key expression emulating the reference collation's
    ``numericOrdering: True`` (dlx/config.py:340): digit runs compare
    numerically ('A/RES/2' < 'A/RES/10'), the rest as lowercased text.
    Takes a column NAME; digit runs are isolated with sentinel markers
    and left-padded to ``width`` — a pure JVM expression."""
    return F.expr(f"""
        array_join(
            transform(
                filter(split(regexp_replace(lower({col_name}), '(\\\\d+)', '\\u0001$1\\u0001'), '\\u0001'),
                       p -> p != ''),
                p -> CASE WHEN p rlike '^\\\\d+$' THEN lpad(p, {width}, '0') ELSE p END),
            '')
    """)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: tokenize(x) if x is not None else None)


@F.pandas_udf(StringType())
def scrub_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: scrub(x) if x is not None else None)
