"""Tokenizer golden tests — exact expected outputs per the reference test
suite's asserts (tests/test_util.py:35-43, tests/test_marc.py:412-413)."""

from dlx_spark.functions.tokenizer import asciify, scrub, split_words, stem, tokenize


def test_scrub_golden():
    assert scrub("!first//second third testing İcing Øscar") == \
        "first second third testing icing oscar"


def test_tokenize_golden():
    assert tokenize("!first//second third testing İcing Øscar") == \
        ["first", "second", "third", "test", "ice", "oscar"]


def test_tokenize_heading():
    assert tokenize("Another header") == ["anoth", "header"]


def test_tokenize_description():
    assert tokenize("Description") == ["descript"]
    assert tokenize("Repeated subfield") == ["repeat", "subfield"]


def test_split_words():
    assert split_words("a-b c,d") == ["a", "b", "c", "d"]
    assert split_words("  hello   world!  ") == ["hello", "world"]


def test_asciify_passthrough():
    assert asciify("plain ascii") == "plain ascii"
    # unmapped scripts pass through
    assert asciify("中文") == "中文"


def test_asciify_folds_and_lowers():
    assert asciify("Éclair") == "eclair"
    assert asciify("Øscar") == "oscar"


def test_porter_stemmer_basics():
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "tie",
        "caress": "caress", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file",
        "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc",
        "digitizer": "digit", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    for word, expected in cases.items():
        assert stem(word) == expected, f"{word}: got {stem(word)}, want {expected}"
