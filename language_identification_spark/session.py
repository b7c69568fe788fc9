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
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(tempfile.gettempdir(), "language_identification_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_STORED) as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


def ship_package(spark: SparkSession) -> None:
    """Make the package importable on executors (idempotent)."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        # addPyFile raises if the same filename was already registered in
        # this context — fine, the workers already have it.
        pass
