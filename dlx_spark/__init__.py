"""dlx_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``dag-hammarskjold-library/dlx``.

The reference (``/root/reference``) is a MongoDB document-per-record
engine for MARC 21 bibliographic/authority data.  This package
re-expresses its data model, query DSL, authority-control joins,
derived-field materializations, serializations and write pipeline as
idiomatic Spark DataFrame programs, and adds the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) that the reference lacks.

Layout:

- ``session``     — SparkSession builder tuned for the target workload
- ``config``      — authority-control / logical-field configuration tables
                    (semantics of ``/root/reference/dlx/config.py``)
- ``functions``   — scalar function surface (tokenizer, language id, ...)
- ``marc``        — JMARC record model, query DSL, exploded view, joins
- ``operators``   — relational + pipeline operators (dedup, similarity, ...)
- ``sources``     — readers/writers (mrk, marcxml, table/csv, json, mrc)
- ``plans``       — plan helpers (explain auditing, broadcast hints)
- ``streaming``   — incremental/streaming maintenance of derived state
- ``files``       — file-metadata store (md5 identity, latest-by-key)
"""

__version__ = "0.1.0"

from dlx_spark.session import get_spark  # noqa: F401
