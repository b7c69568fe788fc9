#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py is FROZEN for the
driver; this file carries the extra per-query isolation runs per the
optimization guide §1.4).

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--plans SUBDIR] q1 q2 ...
  python bench_extra.py --all           # every BENCH_QUERIES entry

Times each query through the noop sink (builder inside the timed window,
same methodology as bench.py), prints per-query best/all walls as one
JSON line, and with --plans writes plans/<SUBDIR>/<query>.txt containing
explain("formatted")."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from language_identification_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    repeats = 2
    plans_dir = None
    suffix = ""
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--repeats":
            repeats = int(next(it))
        elif a == "--plans":
            plans_dir = os.path.join(REPO, "plans", next(it))
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--all":
            from bench import BENCH_QUERIES

            names.extend(BENCH_QUERIES)
        else:
            names.append(a)

    from language_identification_spark.operators.dedup import pair_cache_scope

    spark = get_spark("bench_extra", cores=CPUS)
    qs = E.queries()
    # warm-up: JVM JIT + python workers
    qs["dataset_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls = []
        with pair_cache_scope():
            for _ in range(repeats):
                t0 = time.monotonic()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls.append(round(time.monotonic() - t0, 3))
        out[name] = {"best": min(walls), "runs": walls}
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": CPUS,
                      "total_best": round(sum(v["best"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
