"""SparkSession factory tuned for this engine.

Local-mode defaults stand in for a multi-executor cluster: the same confs
(AQE, Arrow, shuffle-partition sizing) are what we would ship via
``spark-submit --conf`` on a 1000-executor cluster; only ``master`` and the
memory sizing change. Shuffle-partition count tracks core count locally; on a
real cluster AQE coalesces the initial (larger) number at runtime.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Confs we consider part of the engine contract (applied identically in
# tests, bench.py, and a cluster spark-submit).
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Larger Arrow batches amortize Python-worker round trips in the
    # scoring UDFs (texts are small; 10k rows ≈ a few MB per batch).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    # Reuse Python workers across tasks so broadcast models are
    # deserialized once per executor process, not once per task.
    "spark.python.worker.reuse": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "language_identification_spark",
    cores: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` pins ``local[N]`` and sizes ``spark.sql.shuffle.partitions``
    to match — on a cluster the same code path would read executor counts
    from the scheduler instead.
    """
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 4)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def package_zip() -> str:
    """Zip this package for ``spark-submit --py-files`` / ``addPyFile``.

    This is the cluster-deploy artifact: executors' Python workers import
    the package from this zip, so UDF closures referencing package modules
    resolve everywhere, not just when the driver's CWD is the repo root.

    The filename embeds a content hash: a source change yields a NEW path
    (stale same-named zips from concurrent sessions can't be served), and
    an unchanged source reuses the existing artifact. Writes go through a
    pid-suffixed temp file + atomic rename so concurrent builders race
    safely.
    """
    import hashlib

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    sources: list[tuple[str, str]] = []
    for dirpath, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                sources.append((os.path.relpath(full, root), full))
    sources.sort()
    h = hashlib.sha256()
    for rel, full in sources:
        h.update(rel.encode())
        with open(full, "rb") as fh:
            h.update(fh.read())
    out = os.path.join(
        tempfile.gettempdir(),
        f"language_identification_spark-{h.hexdigest()[:12]}.zip",
    )
    if os.path.exists(out):
        return out
    tmp = f"{out}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
        for rel, full in sources:
            z.write(full, rel)
    os.replace(tmp, out)
    return out


# (applicationId, zip path) pairs already registered — skips repeat
# addPyFile calls (which only WARN-spam and are no-ops in local mode).
_shipped: set[tuple[str, str]] = set()


def ship_package(spark: SparkSession) -> None:
    """Make the package importable on executors (idempotent per context).

    Genuine packaging failures (unwritable tmpdir, zip errors) propagate;
    only Spark's same-path-already-added complaint is tolerated.
    """
    path = package_zip()
    key = (spark.sparkContext.applicationId, path)
    if key in _shipped:
        return
    try:
        spark.sparkContext.addPyFile(path)
    except Exception as e:  # noqa: BLE001 — filtered by message below
        msg = str(e)
        if "added already" not in msg and "already been added" not in msg:
            raise
    _shipped.add(key)
