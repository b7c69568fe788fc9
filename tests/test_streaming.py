from __future__ import annotations

from language_identification_spark.pipeline.quality import (
    run_quality_pipeline,
    train_quality_models,
)
from language_identification_spark.streaming.quality_stream import (
    run_stream_to_memory,
)


def test_streaming_matches_batch(spark, pages_df, pages_pdf, tmp_path):
    # Write the corpus as multiple files so maxFilesPerTrigger yields
    # several micro-batches.
    src = str(tmp_path / "stream_src")
    pages_df.repartition(8).write.parquet(src)

    models = train_quality_models(pages_df.filter("split = 'train'"))
    streamed = run_stream_to_memory(spark, src, models, name="q_stream_test")
    batch = run_quality_pipeline(spark, spark.read.parquet(src), models)

    cols = ["url", "keep", "lang_pred", "lang_conf", "perplexity", "scrubbed_text"]
    got = sorted(map(tuple, streamed.select(cols).collect()))
    want = sorted(map(tuple, batch.select(cols).collect()))
    assert got == want
    assert len(got) == len(pages_pdf)
