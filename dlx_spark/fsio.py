"""Marker/ledger I/O through the Hadoop FileSystem API.

The engine's crash-safety protocols — the store's write-ahead bucket-swap
markers (marc/store.py), the streaming commit ledger and intent markers,
and the near-dedup sink's attempt/committed markers (streaming/) — need
a handful of tiny filesystem operations: touch a marker, atomically
publish a small JSON file, list/glob/remove.  Routing them through
``org.apache.hadoop.fs.FileSystem`` (resolved per-path from the active
session's Hadoop configuration) makes every protocol work on whatever
filesystem the warehouse actually lives on — local POSIX, ``file://``
URIs, HDFS, or an object store — instead of silently operating on the
driver's local disk while the data lives elsewhere (the failure mode of
``os.path``/``shutil`` calls at cluster scale).

Atomicity assumptions, per scheme:

- ``file://`` / bare local paths (RawLocalFileSystem) and ``hdfs://``:
  ``rename`` of a file is atomic, so ``write_text_atomic`` (write to a
  ``.tmp`` sibling, rename into place) publishes all-or-nothing.
  Hadoop's rename does NOT overwrite an existing destination; when a
  destination exists it is deleted first, opening a marker-absent window
  of one round-trip — all marker protocols here treat a missing marker
  as "no pending work", which is safe on both sides of that window
  (the old marker's work was already complete or the new marker's write
  will re-run).
- ``s3a://``: rename is copy+delete (non-atomic, duration proportional
  to size).  Markers here are zero-to-few-hundred-byte files, so the
  window is milliseconds, and a torn marker is unparseable JSON — the
  recovery paths treat that as "marker absent" rather than acting on
  garbage.  For hard transactional guarantees on object stores, put the
  warehouse behind a table format with a real commit protocol
  (Delta/Iceberg), which these protocols are the plain-parquet stand-in
  for.

All functions take the SparkSession first: the FileSystem instance comes
from ``Path.getFileSystem(hadoopConfiguration)`` (cached by Hadoop per
scheme+authority, so per-call resolution is cheap).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    return _jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())


def join(*parts: str) -> str:
    """Join path segments with forward slashes (URI-safe: ``file:///a``
    + ``b`` must never become ``file:///a\\b`` on any platform)."""
    return posixpath.join(*parts)


def basename(path: str) -> str:
    return _strip_trailing(path).rsplit("/", 1)[-1]


def parent(path: str) -> str:
    return _strip_trailing(path).rsplit("/", 1)[0]


def _strip_trailing(path: str) -> str:
    return path[:-1] if path.endswith("/") and not path.endswith("://") else path


def exists(spark: SparkSession, path: str) -> bool:
    return _fs(spark, path).exists(_jpath(spark, path))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path), _jpath(spark, path)
    return fs.exists(p) and fs.getFileStatus(p).isDirectory()


def mkdirs(spark: SparkSession, path: str) -> None:
    _fs(spark, path).mkdirs(_jpath(spark, path))


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty file (parents included), overwriting any
    existing one — the marker primitive."""
    _fs(spark, path).create(_jpath(spark, path), True).close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    out = _fs(spark, path).create(_jpath(spark, path), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Publish a small file all-or-nothing: write a ``.tmp`` sibling,
    rename into place (atomic where the scheme's rename is — see module
    docstring).  An existing destination is deleted first (Hadoop rename
    never overwrites)."""
    tmp = path + ".tmp"
    write_text(spark, tmp, text)
    fs = _fs(spark, path)
    dst = _jpath(spark, path)
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(_jpath(spark, tmp), dst):
        raise OSError(f"rename {tmp} -> {path} failed")


def read_text(spark: SparkSession, path: str) -> str:
    ins = _fs(spark, path).open(_jpath(spark, path))
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(ins, "UTF-8")
    finally:
        ins.close()


def remove(spark: SparkSession, path: str, missing_ok: bool = True) -> bool:
    """Delete a file (non-recursive).  Returns whether anything was
    deleted; raises FileNotFoundError when missing and not
    ``missing_ok``.  A delete that FAILS while the path still exists
    (permission / lease errors surface as ``delete() == false`` on some
    filesystems rather than an exception) always raises — mirroring
    ``rename``'s failure handling — so no caller can mistake a failed
    delete for success."""
    deleted = _fs(spark, path).delete(_jpath(spark, path), False)
    if not deleted:
        if exists(spark, path):
            raise OSError(f"delete {path} failed (path still exists)")
        if not missing_ok:
            raise FileNotFoundError(path)
    return bool(deleted)


def rmtree(spark: SparkSession, path: str) -> None:
    """Recursive delete; missing path is a no-op (shutil.rmtree
    ignore_errors analog)."""
    _fs(spark, path).delete(_jpath(spark, path), True)


def rename(spark: SparkSession, src: str, dst: str,
           overwrite: bool = False) -> None:
    fs = _fs(spark, src)
    if overwrite:
        d = _jpath(spark, dst)
        if fs.exists(d):
            fs.delete(d, False)
    if not fs.rename(_jpath(spark, src), _jpath(spark, dst)):
        raise OSError(f"rename {src} -> {dst} failed")


def listdir(spark: SparkSession, path: str) -> list[str]:
    """Child NAMES of a directory; [] when the path doesn't exist."""
    fs, p = _fs(spark, path), _jpath(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def glob(spark: SparkSession, pattern: str) -> list[str]:
    """Full (scheme-qualified) path strings matching a Hadoop glob
    pattern; [] when nothing matches.  NOTE: returned paths are
    canonicalized by the filesystem (``file:///x`` comes back as
    ``file:/x``), so compare them by ``basename``/``parent`` segments,
    never by string prefix against the caller's spelling."""
    sts = _fs(spark, pattern).globStatus(_jpath(spark, pattern))
    if sts is None:
        return []
    return [st.getPath().toString() for st in sts]


def qualified(spark: SparkSession, path: str) -> str:
    """The canonical scheme-qualified absolute form of a path — the
    stable spelling to derive persisted keys from (``/x``, ``file:/x``
    and ``file:///x`` all qualify to the same string)."""
    fs = _fs(spark, path)
    return fs.makeQualified(_jpath(spark, path)).toString()
