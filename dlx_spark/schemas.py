"""Spark schemas for the engine's tables.

The reference stores records as tag-keyed JSON documents validated by
``/root/reference/dlx/schemas/jmarc.schema.json``.  Tags repeat and can
be any 3-digit (or in-memory, 3-uppercase-letter) key, so a MapType
cannot represent them; the canonical Spark shape is an array of tagged
structs with positions preserved by array order (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SUBFIELD = StructType([
    StructField("code", StringType(), False),
    StructField("value", StringType(), True),   # NULL for unresolved Linked
    StructField("xref", LongType(), True),      # NULL ⇔ Literal subfield
])

DATAFIELD = StructType([
    StructField("tag", StringType(), False),
    StructField("ind1", StringType(), True),
    StructField("ind2", StringType(), True),
    StructField("subfields", ArrayType(SUBFIELD), False),
])

CONTROLFIELD = StructType([
    StructField("tag", StringType(), False),
    StructField("value", StringType(), True),
])

MARC = StructType([
    StructField("_id", LongType(), False),
    StructField("leader", StringType(), True),              # tag 000
    StructField("controlfields", ArrayType(CONTROLFIELD), True),
    StructField("datafields", ArrayType(DATAFIELD), True),
    StructField("created", TimestampType(), True),
    StructField("created_user", StringType(), True),
    StructField("updated", TimestampType(), True),
    StructField("user", StringType(), True),
    StructField("basket", StringType(), True),
    # derived search columns (recomputed by the derive job)
    StructField("text", StringType(), True),
    StructField("words", ArrayType(StringType()), True),
])

# Ingest variant: identical to MARC but _id nullable — freshly parsed
# records (mrk/xml/jsonl imports) have no id until commit_frame assigns
# max_id + seq.
MARC_INGEST = StructType(
    [StructField("_id", LongType(), True)] + MARC.fields[1:])

# Exploded subfields view — the query workhorse (SURVEY §1.3 repr 2)
SUBFIELDS_EXPLODED = StructType([
    StructField("record_id", LongType(), False),
    StructField("record_type", StringType(), False),
    StructField("tag", StringType(), False),
    StructField("field_pos", IntegerType(), False),
    StructField("ind1", StringType(), True),
    StructField("ind2", StringType(), True),
    StructField("code", StringType(), False),
    StructField("sub_pos", IntegerType(), False),
    StructField("value", StringType(), True),
    StructField("xref", LongType(), True),
])

# Auth heading join dimension (FIXTURES §3)
AUTH_HEADINGS = StructType([
    StructField("auth_id", LongType(), False),
    StructField("tag", StringType(), False),
    StructField("code", StringType(), False),
    StructField("value", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("norm", StringType(), True),
])

# History table (reference dlx/marc/__init__.py:1066-1104, 1288-1308)
_ACTION = StructType([
    StructField("type", StringType(), True),
    StructField("user", StringType(), True),
    StructField("time", TimestampType(), True),
])

HISTORY = StructType([
    StructField("record_id", LongType(), False),
    StructField("version", IntegerType(), False),
    StructField("doc", MARC, True),
    StructField("created_user", StringType(), True),
    StructField("created_time", TimestampType(), True),
    StructField("deleted_user", StringType(), True),
    StructField("deleted_time", TimestampType(), True),
    StructField("restored_user", StringType(), True),
    StructField("restored_time", TimestampType(), True),
    StructField("actions", ArrayType(_ACTION), True),
    StructField("merged_into", LongType(), True),
    StructField("merged_time", TimestampType(), True),
])

# Files metadata (reference dlx/schemas/jfile.schema.json:6-57)
FILE = StructType([
    StructField("_id", StringType(), False),  # md5 hex of content
    StructField("filename", StringType(), True),
    StructField("identifiers", ArrayType(StructType([
        StructField("type", StringType(), False),
        StructField("value", StringType(), False),
    ])), True),
    StructField("languages", ArrayType(StringType()), True),
    StructField("mimetype", StringType(), True),
    StructField("size", LongType(), True),
    StructField("source", StringType(), True),
    StructField("timestamp", TimestampType(), True),
    StructField("updated", TimestampType(), True),
    StructField("uri", StringType(), True),
    StructField("user", StringType(), True),
])

# Multimodal document column conventions (LLM-pipeline surface):
# media payloads ride as opaque binary plus typed metadata.
MEDIA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("kind", StringType(), False),      # 'image'|'audio'|'video'
    StructField("payload", BinaryType(), True),
    StructField("mimetype", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])
