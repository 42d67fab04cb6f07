"""S3 content store (reference parity: /root/reference/dlx/file/s3.py:8-44).

Two surfaces:

- ``S3`` — the reference's classmethod wrapper around a boto3 client
  (connect once, upload file-like handles), kept API-compatible so
  reference call sites port directly.
- ``upload_frame`` — the set-scale path the reference lacks: upload a
  DataFrame of (key, payload, mimetype) rows from the EXECUTORS via
  ``foreachPartition``.  Each partition builds its own client (boto3
  clients don't serialize) and streams its rows; a 100 TB media corpus
  uploads with cluster parallelism and zero driver involvement.

boto3 is imported lazily so environments without it can still use every
other files feature; tests inject a fake client factory.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame


def _default_client_factory(access_key_id=None, access_key=None,
                            region="us-east-1"):
    import boto3

    return boto3.client(
        "s3",
        region_name=region,
        aws_access_key_id=access_key_id,
        aws_secret_access_key=access_key,
    )


class S3:
    """Reference-parity wrapper (dlx/file/s3.py:8-44): a process-global
    client bound to one bucket."""

    connected = False
    client = None
    bucket = None

    @classmethod
    def connect(cls, *, access_key_id=None, access_key=None,
                region="us-east-1", bucket, client=None):
        """Start a global "connection" to a specific s3 bucket.
        ``client`` injects a premade (or fake) client for tests."""
        cls.client = client if client is not None else _default_client_factory(
            access_key_id, access_key, region)
        cls.bucket = bucket
        cls.connected = True

    @classmethod
    def upload(cls, handle, file_key, mimetype) -> bool:
        """Upload a file-like object (reference semantics, including the
        not-connected error and inline content disposition)."""
        if not cls.connected:
            raise Exception("Not connected to s3. `Use dlx.file.S3.connect`")
        cls.client.upload_fileobj(
            handle, cls.bucket, file_key,
            ExtraArgs={"ContentType": mimetype, "ContentDisposition": "inline"},
        )
        return True


def s3_uploader(bucket: str, *, access_key_id=None, access_key=None,
                region: str = "us-east-1", client=None):
    """A ``FileStore(uploader=...)`` adapter: uploads each imported
    payload under its md5 checksum key (the files table's ``_id`` —
    content-addressed, so re-imports of identical bytes are no-ops
    upstream and idempotent here)."""
    c = client if client is not None else _default_client_factory(
        access_key_id, access_key, region)

    def upload(payload: bytes, checksum: str, mimetype: str) -> bool:
        c.upload_fileobj(
            io.BytesIO(payload), bucket, checksum,
            ExtraArgs={"ContentType": mimetype, "ContentDisposition": "inline"},
        )
        return True

    return upload


def upload_frame(df: DataFrame, bucket: str, *, key_col: str = "_id",
                 payload_col: str = "payload", mimetype_col: str = "mimetype",
                 client_factory=None, region: str = "us-east-1") -> None:
    """Executor-side bulk upload: every partition opens one client and
    streams its rows to s3://bucket/<key>.  ``client_factory`` must be a
    picklable zero-arg callable (defaults to an anonymous boto3 client);
    inject a fake for tests.

    This is the scale path for media/file sinks: no ``collect()``, no
    driver bottleneck — throughput is executors x per-client upload
    bandwidth, and a failed task retries only its partition."""
    factory = client_factory or (lambda: _default_client_factory(region=region))
    cols = df.select(key_col, payload_col, mimetype_col)

    def upload_partition(rows):
        client = factory()
        for row in rows:
            payload = row[payload_col]
            if payload is None:
                continue
            client.upload_fileobj(
                io.BytesIO(bytes(payload)), bucket, str(row[key_col]),
                ExtraArgs={"ContentType": row[mimetype_col] or "application/octet-stream",
                           "ContentDisposition": "inline"},
            )

    cols.foreachPartition(upload_partition)
