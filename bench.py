#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries + the full quality pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: additionally run the pipeline at local[8] and local[32] on the
same amplified input and report docs/sec at both + scaling efficiency
(the sandbox stand-in for N → 4N executors, per BASELINE.md), writing
BENCH.md.

All query executions force full materialization through the noop sink
(count() alone can skip column evaluation).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from language_identification_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "ngram_lm_predict",
    "char_freq_profile",
    "markov_model",
    "top_ngrams_per_lang",
    "vocab_topk",
    "token_counts",
    "fingerprints",
    "quality_scores",
    "dedup_exact",
    "minhash_near_dups",
    "embedding_topk",
    "events_daily",
    "tpch_q1",
    "revenue_join",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_headline_queries(spark, sf_dir: str) -> dict[str, float]:
    qs = E.queries()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        _materialize(qs[name](spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def _pages(spark, sf_dir: str, mult: int):
    paths = [os.path.join(sf_dir, "documents.parquet")] * mult
    docs = spark.read.parquet(*paths)
    return docs.select(
        F.concat(F.lit("doc://"), F.monotonically_increasing_id().cast("string")).alias("url"),
        "text",
        "lang",
    )


def pipeline_run(spark, sf_dir: str, mult: int = 4) -> tuple[float, int, float]:
    """Train + serve the full quality pipeline; returns (wall_s, docs, docs/s).
    Serving wall time only (training measured separately at scale)."""
    from language_identification_spark.pipeline.quality import (
        run_quality_pipeline,
        train_quality_models,
    )

    single = _pages(spark, sf_dir, 1)
    models = train_quality_models(single)
    pages = _pages(spark, sf_dir, mult)
    n = pages.count()
    t0 = time.monotonic()
    _materialize(run_quality_pipeline(spark, pages, models))
    wall = time.monotonic() - t0
    return wall, n, n / wall


def scaling_report(sf_dir: str, mult: int = 8) -> dict:
    """Same job at local[8] vs local[32]: throughput + efficiency.
    Warm-up run at each size to exclude JVM/python-worker cold start."""
    from pyspark.sql import SparkSession

    results = {}
    for cores in (8, 32):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = get_spark(f"bench_scale_{cores}", cores=cores)
        pipeline_run(spark, sf_dir, mult=1)  # warm-up
        wall, n, dps = pipeline_run(spark, sf_dir, mult=mult)
        results[cores] = {"wall_s": round(wall, 3), "docs": n, "docs_per_sec": round(dps, 1)}
    eff = results[32]["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
    return {
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(results[32]["docs_per_sec"] / results[8]["docs_per_sec"], 3),
        "efficiency_n_to_4n": round(eff, 3),
    }


def main() -> None:
    scaling = "--scaling" in sys.argv
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"

    spark = get_spark("bench", cores=CPUS)
    # Warm-up: JVM JIT + python workers (excluded from timings).
    _materialize(E.queries()["dataset_stats"](spark, SF_DIR))

    queries = run_headline_queries(spark, SF_DIR)
    pipe_wall, pipe_docs, pipe_dps = pipeline_run(spark, SF_DIR, mult=4)
    queries["quality_pipeline"] = round(pipe_wall, 3)

    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "pipeline_docs_per_sec": round(pipe_dps, 1),
        "pipeline_docs": pipe_docs,
    }

    if scaling:
        result["scaling"] = scaling_report(SF_DIR)
        _write_bench_md(result)

    print(json.dumps(result))


def _write_bench_md(result: dict) -> None:
    s = result["scaling"]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — measured throughput & scaling

Input: `{SF_DIR}` documents table (amplified ×8 for the scaling runs).
Pipeline = full quality filter (langid NB + perplexity + heuristics +
scrub + keep), serving wall time after models are trained.

## Two-parallelism scaling (sandbox stand-in for N → 4N executors)

| parallelism | docs | wall (s) | docs/sec |
|---|---|---|---|
| local[8]  | {s['local8']['docs']} | {s['local8']['wall_s']} | {s['local8']['docs_per_sec']} |
| local[32] | {s['local32']['docs']} | {s['local32']['wall_s']} | {s['local32']['docs_per_sec']} |

Speedup 8→32 cores: **{s['speedup_8_to_32']}×** →
scaling efficiency (target ≥ 0.8): **{s['efficiency_n_to_4n']}**

## Headline per-query wall times ({result['cpus']} cores, sf={result['sf']})

| query | sec |
|---|---|
"""
            + "\n".join(f"| {k} | {v} |" for k, v in result["queries"].items())
            + f"""

Reference single-core baseline (BASELINE.md): char_freq ≈ 110 docs/s
train+predict. This pipeline serves **{result['pipeline_docs_per_sec']}
docs/s** at {result['cpus']} cores including langid + perplexity +
scrub + heuristics.
"""
        )


if __name__ == "__main__":
    main()
