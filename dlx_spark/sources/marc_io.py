"""Distributed (de)serialization of record files.

Scale design:

- **MRK** files are split on blank lines using Hadoop's
  ``textinputformat.record.delimiter`` — the file is read in parallel
  splits, each record parsed executor-side with the same parser as the
  record API (``Marc.from_mrk``), emitted as canonical nested rows.  A
  100 TB dump parallelizes by input split; no driver-side reading.
- **MARCXML**: record elements are extracted per ``<record>…</record>``
  span with the same streaming delimiter trick (``</record>`` as the
  record delimiter), parsed executor-side with ElementTree per record —
  no whole-document DOM.
- **JMARC JSONL** (one JSON doc per line) round-trips through
  ``spark.read.text`` + executor-side parse so the dynamic tag->fields
  layout converts to the fixed nested schema without a schema-inference
  scan.
- Writers serialize record-at-a-time executor-side and emit strings to
  ``write.text`` — pure map, no shuffle.

Auth control during distributed ingest: resolution happens as a
DataFrame join AFTER parse (see ``dlx_spark.marc.dataframe.
resolve_values``), not per-record in the parser — xrefs are preserved
from ``$0``, never validated row-at-a-time against a remote service.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from dlx_spark import schemas


def _records_from_delimited(spark: SparkSession, path: str, delimiter: str):
    conf = {"textinputformat.record.delimiter": delimiter}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    ).map(lambda kv: kv[1])
    return rdd


def _restore_xrefs_from_zero(rec, record_type: str):
    """Convert a preserved ``$0`` into Linked xrefs on the field's
    auth-controlled codes, then drop ``$0`` — the join-based alternative
    to per-record auth validation during distributed ingest."""
    from dlx_spark import config
    from dlx_spark.marc.record import Datafield, Linked

    for field in rec.fields:
        if not isinstance(field, Datafield):
            continue
        zero = next((s.value for s in field.subfields if s.code == "0"), None)
        if zero and str(zero).isdigit():
            for i, s in enumerate(field.subfields):
                if config.is_authority_controlled(record_type, field.tag, s.code):
                    field.subfields[i] = Linked(s.code, int(zero))
        field.subfields = [s for s in field.subfields if s.code != "0"]
    return rec


def mrk_chunk_parser(record_type: str = "bib"):
    """Chunk → canonical rows for MRK (one record per blank-line-
    separated chunk).  Shared by the batch reader (``read_mrk``) and
    the streaming commit sink (``streaming.incremental_commit_stream``
    with ``fmt='mrk'``) so both parse identically."""
    from dlx_spark.marc import Auth, Bib  # serialization methods attached

    cls = Bib if record_type == "bib" else Auth

    def parse(chunk: str):
        chunk = (chunk or "").strip()
        if not chunk:
            return []
        rec = cls.from_mrk(chunk, auth_control=False, delete_subfield_zero=False)
        return [_restore_xrefs_from_zero(rec, record_type).to_row()]

    return parse


def read_mrk(spark: SparkSession, path: str, record_type: str = "bib") -> DataFrame:
    """Parse an MRK file (records separated by blank lines) into the
    canonical nested DataFrame.  ``$0`` xrefs are preserved as Linked
    subfields; auth validation is a downstream join."""
    rdd = _records_from_delimited(spark, path, "\n\n").flatMap(
        mrk_chunk_parser(record_type))
    return spark.createDataFrame(rdd, schema=schemas.MARC_INGEST)


def read_mrc(spark: SparkSession, path: str, record_type: str = "bib") -> DataFrame:
    """Parse an ISO 2709 file (records terminated by \\u001d) into the
    canonical nested DataFrame.  Splits on the record terminator via the
    Hadoop text delimiter, so a multi-GB file fans out across executors
    without a driver-side pass."""
    from dlx_spark.marc import Auth, Bib  # serialization methods attached

    cls = Bib if record_type == "bib" else Auth

    def parse(chunk: str):
        chunk = chunk.strip("\n\r\x00")
        if not chunk:
            return []
        rec = cls.from_mrc(chunk, auth_control=False, delete_subfield_zero=False)
        return [_restore_xrefs_from_zero(rec, record_type).to_row()]

    rdd = _records_from_delimited(spark, path, "\u001d").flatMap(parse)
    return spark.createDataFrame(rdd, schema=schemas.MARC_INGEST)


def marcxml_chunk_parser(record_type: str = "bib"):
    """Chunk → canonical rows for MARCXML split on ``</record>``.
    Shared by the batch reader (``read_marcxml``) and the streaming
    commit sink (``fmt='xml'``)."""
    from dlx_spark.marc import Auth, Bib

    cls = Bib if record_type == "bib" else Auth

    def parse_one(xml: str):
        import re
        from xml.etree import ElementTree
        # strip namespace declarations and prefixes for uniform matching
        xml = re.sub(r"xmlns(:\w+)?=\"[^\"]*\"", "", xml)
        xml = re.sub(r"<(/?)\w+:", r"<\1", xml)
        try:
            root = ElementTree.fromstring(xml)
        except ElementTree.ParseError:
            return []
        rec = cls.from_xml_raw(root, auth_control=False, delete_subfield_zero=False)
        return [_restore_xrefs_from_zero(rec, record_type).to_row()]

    def parse(chunk: str):
        import re
        # plain documents split on '</record>' (parallel fast path); a
        # namespace-prefixed document ('</marc:record>') never contains
        # the delimiter, so the chunk may hold MANY records — split them
        # here (single-task fallback, still correct)
        out = []
        for m in re.finditer(r"<(\w+:)?record[\s>].*?</(\w+:)?record>|<(\w+:)?record[\s>].*$",
                             chunk or "", re.S):
            xml = m.group(0)
            if not re.search(r"</(\w+:)?record>\s*$", xml):
                xml += "</record>"
            out += parse_one(xml)
        return out

    return parse


def read_marcxml(spark: SparkSession, path: str, record_type: str = "bib") -> DataFrame:
    """Parse MARCXML into the canonical nested DataFrame.  The file is
    split on ``</record>`` so each task parses complete record elements
    without loading the document."""
    rdd = _records_from_delimited(spark, path, "</record>").flatMap(
        marcxml_chunk_parser(record_type))
    return spark.createDataFrame(rdd, schema=schemas.MARC_INGEST)


def read_jmarc_jsonl(spark: SparkSession, path: str, record_type: str = "bib") -> DataFrame:
    """One JMARC JSON document per line → canonical nested DataFrame."""
    from dlx_spark.marc import Auth, Bib

    cls = Bib if record_type == "bib" else Auth

    def parse(line: str):
        line = line.strip()
        if not line:
            return []
        return [cls(json.loads(line)).to_row()]

    rdd = spark.read.text(path).rdd.flatMap(lambda r: parse(r[0]))
    return spark.createDataFrame(rdd, schema=schemas.MARC_INGEST)


def _rows_to_strings(df: DataFrame, record_type: str, fmt: str):
    from dlx_spark.marc import Auth, Bib

    cls = Bib if record_type == "bib" else Auth

    def serialize(rows):
        for row in rows:
            rec = cls.from_row(row)
            if fmt == "mrk":
                yield (rec.to_mrk() ,)
            elif fmt == "xml":
                yield (rec.to_xml(),)
            elif fmt == "mrc":
                yield (rec.to_mrc(),)
            else:
                yield (rec.to_json(),)

    return df.rdd.mapPartitions(serialize).toDF(["value"])


def write_mrk(df: DataFrame, path: str, record_type: str = "bib") -> None:
    """Serialize a nested-record DataFrame to MRK text files (one record
    per line-block; readers split on the blank line)."""
    _rows_to_strings(df, record_type, "mrk").write.mode("overwrite").text(path)


def write_mrc(df: DataFrame, path: str, record_type: str = "bib") -> None:
    """Serialize to ISO 2709 text files — one record per line; the
    in-record \\u001d terminator (not the newline) delimits records for
    ``read_mrc``."""
    _rows_to_strings(df, record_type, "mrc").write.mode("overwrite").text(path)


def write_marcxml(df: DataFrame, path: str, record_type: str = "bib") -> None:
    _rows_to_strings(df, record_type, "xml").write.mode("overwrite").text(path)


def write_jmarc_jsonl(df: DataFrame, path: str, record_type: str = "bib") -> None:
    _rows_to_strings(df, record_type, "json").write.mode("overwrite").text(path)
