"""Cross-PROCESS commit contention on the versioned backend.

`SingleDriverCASScheme` only serializes threads within one driver; the
default `HadoopRenameScheme`'s put-if-absent is a FileContext
no-overwrite rename — a hard atomic CAS on HDFS, and on local FS a
dest-exists check + POSIX rename whose residual cross-process window
is microseconds (fsio.rename_no_overwrite documents the distinction).
This test exercises it the only way that counts: a SECOND driver
process (its own JVM, its own SparkSession) appends to the same
versioned table concurrently with this one, and every commit from both
writers must survive — the lost-update hazard is two processes
publishing the same version number and one silently winning.  (It
cannot DISPROVE the microsecond local-FS window — a hard multi-driver
guarantee on non-HDFS stores is ExternalCASScheme's job, proven in
test_two_driver_processes_external_cas below.)

The versioned backend is path-based (no catalog), so the two sessions
share nothing but the root directory — no metastore to collide on.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

from dlx_spark import fsio
from dlx_spark.tableio_versioned import VersionedTableBackend

N_EACH = 4          # appends per writer
TABLE = "contended"

_WORKER = r"""
import sys
root, n = sys.argv[1], int(sys.argv[2])
from dlx_spark.session import get_spark
from dlx_spark import fsio
from dlx_spark.tableio_versioned import VersionedTableBackend

spark = get_spark("mp_commit_worker", cpus=2)
spark.conf.set("spark.sql.shuffle.partitions", "2")
be = VersionedTableBackend(root=root)

# barrier: announce readiness, then wait for the main process's go
fsio.touch(spark, root + "/_worker_ready")
for _ in range(1200):
    if fsio.exists(spark, root + "/_go"):
        break
    import time; time.sleep(0.1)
else:
    raise SystemExit("main process never said go")

from pyspark.sql import functions as F
for i in range(n):
    df = spark.range(1).select(
        F.lit("worker").alias("writer"), F.lit(i).alias("seq"))
    be.append(df, "%s", "writer", 2)
print("WORKER_DONE races_lost=%%d" %% be.races_lost, flush=True)
""" % TABLE


def test_two_driver_processes_no_lost_update(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "vroot_mp")
    be = VersionedTableBackend(root=root)
    seed = spark.range(1).select(F.lit("main").alias("writer"),
                                 F.lit(-1).alias("seq"))
    be.write(seed, TABLE, "writer", 2)          # version 1

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PYSPARK_GATEWAY_PORT", None)       # fresh JVM, not ours
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.Popen(
        [sys.executable, str(script), root, str(N_EACH)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=repo)
    try:
        deadline = time.time() + 180
        while not fsio.exists(spark, root + "/_worker_ready"):
            if proc.poll() is not None or time.time() > deadline:
                out = proc.communicate()[0]
                pytest.fail(f"worker never came up:\n{out[-3000:]}")
            time.sleep(0.2)
        fsio.touch(spark, root + "/_go")
        # both processes now append concurrently
        for i in range(N_EACH):
            df = spark.range(1).select(F.lit("main").alias("writer"),
                                       F.lit(i).alias("seq"))
            be.append(df, TABLE, "writer", 2)
        out, _ = proc.communicate(timeout=240)
        assert proc.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert "WORKER_DONE" in out
    finally:
        if proc.poll() is None:
            proc.kill()

    # no lost update: every commit from both writers is in the head
    rows = be.read(spark, TABLE).groupBy("writer").count().collect()
    counts = {r["writer"]: r["count"] for r in rows}
    assert counts == {"main": N_EACH + 1, "worker": N_EACH}
    # and every commit allocated its own version: 1 create + 2n appends
    assert len(be.versions(spark, TABLE)) == 1 + 2 * N_EACH


_WORKER_ECAS = r"""
import sys
root, casdir, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
from dlx_spark.session import get_spark
from dlx_spark import fsio
from dlx_spark.tableio_versioned import VersionedTableBackend

spark = get_spark("mp_ecas_worker", cpus=2)
spark.conf.set("spark.sql.shuffle.partitions", "2")
fsio.set_commit_scheme(fsio.ExternalCASScheme(fsio.FileExternalCAS(casdir)))
be = VersionedTableBackend(root=root)

fsio.touch(spark, root + "/_worker_ready")
for _ in range(1200):
    if fsio.exists(spark, root + "/_go"):
        break
    import time; time.sleep(0.1)
else:
    raise SystemExit("main process never said go")

from pyspark.sql import functions as F
for i in range(n):
    df = spark.range(1).select(
        F.lit("worker").alias("writer"), F.lit(i).alias("seq"))
    be.append(df, "%s", "writer", 2)
print("WORKER_DONE races_lost=%%d" %% be.races_lost, flush=True)
""" % TABLE


def test_two_driver_processes_external_cas_no_lost_update(spark, tmp_path):
    """The multi-driver guarantee for stores with NO atomic rename:
    both drivers publish through ExternalCASScheme — every store-side
    publish is a tearable copy+delete, and the only atomic primitive
    anywhere is the shared external CAS (FileExternalCAS, the
    DynamoDB/conditional-PUT stand-in).  Every commit from both
    processes must survive with a gapless version chain."""
    from pyspark.sql import functions as F

    from dlx_spark.fsio import ExternalCASScheme, FileExternalCAS

    root = str(tmp_path / "vroot_ecas_mp")
    casdir = str(tmp_path / "cas_mp")
    fsio.set_commit_scheme(ExternalCASScheme(FileExternalCAS(casdir)))
    try:
        be = VersionedTableBackend(root=root)
        seed = spark.range(1).select(F.lit("main").alias("writer"),
                                     F.lit(-1).alias("seq"))
        be.write(seed, TABLE, "writer", 2)      # version 1

        script = tmp_path / "worker_ecas.py"
        script.write_text(_WORKER_ECAS)
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("PYSPARK_GATEWAY_PORT", None)
        env.pop("PYSPARK_GATEWAY_SECRET", None)
        proc = subprocess.Popen(
            [sys.executable, str(script), root, casdir, str(N_EACH)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=repo)
        try:
            deadline = time.time() + 180
            while not fsio.exists(spark, root + "/_worker_ready"):
                if proc.poll() is not None or time.time() > deadline:
                    out = proc.communicate()[0]
                    pytest.fail(f"worker never came up:\n{out[-3000:]}")
                time.sleep(0.2)
            fsio.touch(spark, root + "/_go")
            for i in range(N_EACH):
                df = spark.range(1).select(F.lit("main").alias("writer"),
                                           F.lit(i).alias("seq"))
                be.append(df, TABLE, "writer", 2)
            out, _ = proc.communicate(timeout=240)
            assert proc.returncode == 0, f"worker failed:\n{out[-3000:]}"
            assert "WORKER_DONE" in out
        finally:
            if proc.poll() is None:
                proc.kill()

        rows = be.read(spark, TABLE).groupBy("writer").count().collect()
        counts = {r["writer"]: r["count"] for r in rows}
        assert counts == {"main": N_EACH + 1, "worker": N_EACH}
        assert len(be.versions(spark, TABLE)) == 1 + 2 * N_EACH
        # every claim settled: nothing pending anywhere under the root
        cas = FileExternalCAS(casdir)
        assert cas.pending("") == []
    finally:
        fsio.set_commit_scheme(fsio.HadoopRenameScheme())
