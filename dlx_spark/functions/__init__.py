"""Scalar-function surface of the engine.

The hot path stays JVM-side: every function here that is used inside a
query plan has a Column-expression form built from
``pyspark.sql.functions`` (whole-stage codegen friendly).  The pure-
Python forms exist for record-at-a-time API parity and for the
pandas-UDF fallbacks used where Spark has no built-in equivalent
(Porter stemming).
"""

from dlx_spark.functions.tokenizer import (  # noqa: F401
    PorterStemmer,
    asciify,
    scrub,
    split_words,
    stem,
    tokenize,
    scrub_col,
    split_words_col,
    tokenize_simple_col,
    tokenize_udf,
    scrub_udf,
)
