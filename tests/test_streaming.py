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


def test_stateful_dedup_stream(spark, tmp_path):
    """applyInPandasWithState carries seen-hash state ACROSS micro-batches:
    a duplicate arriving in a later batch must not be re-emitted."""
    import pandas as pd
    from pyspark.sql import functions as F

    from language_identification_spark.streaming.stateful_dedup import dedup_stream
    from language_identification_spark.streaming.quality_stream import PAGES_SCHEMA

    src = str(tmp_path / "dedup_src")
    ts = pd.Timestamp("2024-01-01", tz="UTC")

    def pdf(rows):
        return pd.DataFrame(
            {
                "url": [u for u, _ in rows],
                "warc_ts": [ts] * len(rows),
                "html": [b""] * len(rows),
                "text": [t for _, t in rows],
                "lang": ["en"] * len(rows),
                "split": ["train"] * len(rows),
            }
        )

    # batch 1: A, B (A duplicated within the batch); batch 2: A again + C
    b1 = pdf([("u1", "alpha doc"), ("u2", "alpha doc"), ("u3", "beta doc")])
    b2 = pdf([("u4", "alpha doc"), ("u5", "gamma doc")])
    import os

    os.makedirs(src)
    b1.to_parquet(f"{src}/part-0.parquet", index=False)
    b2.to_parquet(f"{src}/part-1.parquet", index=False)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
    )
    out = dedup_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM dedup_stream_test").collect()
    by_text = {r["text"]: r for r in rows}
    assert set(by_text) == {"alpha doc", "beta doc", "gamma doc"}
    assert len(rows) == 3  # duplicates suppressed within AND across batches
    assert all(r["n_prior"] == 0 for r in rows)
