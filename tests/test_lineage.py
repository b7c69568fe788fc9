"""Resume semantics (SURVEY.md §5.2 item 5): kill/restart processes each
bucket exactly once and the final output equals a single-shot run."""

from __future__ import annotations

from pyspark.sql import functions as F

from language_identification_spark.pipeline.lineage import (
    completed_buckets,
    run_resumable,
)
from language_identification_spark.pipeline.quality import (
    run_quality_pipeline,
    train_quality_models,
)

N_BUCKETS = 8


def test_resume_exactly_once(spark, pages_df, tmp_path):
    models = train_quality_models(pages_df.filter("split = 'train'"))
    out_dir = str(tmp_path / "out")
    lin_dir = str(tmp_path / "lineage")

    # "Killed" first run: only half the buckets complete.
    first = run_resumable(
        spark, pages_df, models, out_dir, lin_dir, N_BUCKETS,
        only_buckets={0, 1, 2, 3},
    )
    assert first == [0, 1, 2, 3]
    assert completed_buckets(spark, lin_dir) == {0, 1, 2, 3}

    # Restart: processes only the remaining buckets.
    second = run_resumable(spark, pages_df, models, out_dir, lin_dir, N_BUCKETS)
    assert second == [4, 5, 6, 7]

    # Third run: nothing pending.
    assert run_resumable(spark, pages_df, models, out_dir, lin_dir, N_BUCKETS) == []

    # No bucket processed twice.
    lineage = spark.read.parquet(lin_dir)
    per_bucket = lineage.groupBy("bucket").count().collect()
    assert all(r["count"] == 1 for r in per_bucket)
    assert {r["bucket"] for r in per_bucket} == set(range(N_BUCKETS))

    # Output identical to a single-shot run (modulo the bucket column).
    resumed = spark.read.parquet(out_dir)
    single = run_quality_pipeline(spark, pages_df, models)
    cols = ["url", "keep", "lang_pred", "lang_conf", "perplexity", "scrubbed_text"]
    assert sorted(map(tuple, resumed.select(cols).collect())) == sorted(
        map(tuple, single.select(cols).collect())
    )
    assert resumed.count() == pages_df.count()

    # Lineage attrition numbers line up with the output.
    total_kept = lineage.agg(F.sum("n_kept")).first()[0]
    assert total_kept == resumed.filter("keep").count()
