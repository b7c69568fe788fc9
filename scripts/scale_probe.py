"""One scaling measurement in an isolated process: scale_probe.py CORES
[MULT]. Prints one JSON line. Used by bench.py --scaling via subprocess so
JVM/python-worker state can't leak between parallelism levels."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from language_identification_spark.pipeline.quality import (  # noqa: E402
    run_quality_pipeline,
    train_quality_models,
)
from language_identification_spark.session import get_spark  # noqa: E402


def stat_snapshot() -> tuple[list[int], float]:
    """(/proc/stat cpu jiffies, monotonic now) — for steal measurement."""
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return v, time.monotonic()


def steal_fraction(before: tuple, after: tuple, ncpu: int | None = None) -> float:
    """Fraction of the window's total CPU capacity stolen by the
    hypervisor (field 8 of /proc/stat). Steal accrues only when THIS VM
    demands CPU and doesn't get it, so it is a direct, outcome-independent
    contamination signal for timed runs on this shared host — unlike
    loadavg, which cannot see other tenants outside the VM at all."""
    (v0, t0), (v1, t1) = before, after
    ncpu = ncpu or os.cpu_count() or 32
    cap = max((t1 - t0) * 100.0 * ncpu, 1.0)  # CLK_TCK=100
    return (v1[7] - v0[7]) / cap


STEAL_OK = 0.05  # ≤5% of machine capacity stolen during a timed window


def _burn(secs: float) -> int:
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < secs:
        x += 1
    return x


def cpu_ceiling(cores: int, secs: float = 2.0) -> float:
    """Per-core relative throughput with `cores` busy CPUs (pure-Python
    busy loop, cache-resident). On this virtualized Xeon, 32 busy cores
    run each core at ~68% of its 8-busy-core speed — a hypervisor power
    cap that bounds ANY workload's raw 8→32 scaling efficiency."""
    import multiprocessing as mp

    with mp.Pool(cores) as p:
        res = p.map(_burn, [secs] * cores)
    return sum(res) / len(res) / secs


def main() -> None:
    cores = int(sys.argv[1])
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus = os.path.join(tempfile.gettempdir(), f"scale_corpus_{mult}")

    spark = get_spark(
        f"scale_{cores}",
        cores=cores,
        extra_confs={
            # Target ~128 scan partitions (≥4 waves at 32 cores): default
            # bin-packing coalesces the 128 small files into ~43 tasks =
            # 1.3 waves at 32 cores, wasting ~30% of the job in tail idle
            # while the last wave drains.
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        paths = [os.path.join(sf_dir, "documents.parquet")] * mult
        docs = spark.read.parquet(*paths).select(
            F.concat(F.lit("doc://"), F.monotonically_increasing_id().cast("string")).alias("url"),
            "text",
            "lang",
        )
        docs.repartition(128).write.mode("overwrite").parquet(corpus)

    models = train_quality_models(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("text", "lang")
    )
    pages = spark.read.parquet(corpus)
    n = pages.count()

    heuristics = "fused" if os.environ.get("SPARK_GRAFT_FUSED") else "native"

    def run() -> float:
        t0 = time.monotonic()
        run_quality_pipeline(spark, pages, models, heuristics=heuristics).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.monotonic() - t0

    run()  # warm-up (JIT, python workers, page cache)
    runs: list[tuple[float, float]] = []  # (wall, steal_frac)
    attempts = 0
    while sum(1 for _, st in runs if st <= STEAL_OK) < n_runs and attempts < 2 * n_runs + 2:
        attempts += 1
        s0 = stat_snapshot()
        w = run()
        runs.append((w, steal_fraction(s0, stat_snapshot())))
    valid = [r for r in runs if r[1] <= STEAL_OK] or runs
    wall, steal = min(valid)
    print(json.dumps({"cores": cores, "docs": n, "wall_s": round(wall, 3),
                      "docs_per_sec": round(n / wall, 1),
                      "steal_frac": round(steal, 4),
                      "run_steals": [round(st, 4) for _, st in runs]}))


if __name__ == "__main__":
    main()
