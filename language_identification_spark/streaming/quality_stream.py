"""Structured Streaming variant of the quality pipeline.

The reference is batch-only (SURVEY.md §2.9); this is the net-new streaming
surface: the SAME narrow transform chain (score UDF + heuristic columns +
keep predicate) applied to a ``readStream`` source, so batch and streaming
share one code path (``run_quality_pipeline`` works on both because every
stage is a stateless projection — no watermark needed for the filter
itself).

Also provides a windowed quality-metrics stream (counts/keep-rate per
event-time window with a watermark) as the stateful-aggregation example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline.quality import QualityModels, run_quality_pipeline

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("split", T.StringType()),
    ]
)


def read_pages_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(dir_path)
    )


def quality_stream(spark: SparkSession, pages_stream: DataFrame, models: QualityModels) -> DataFrame:
    """Streaming scored pages — identical transform chain as batch."""
    return run_quality_pipeline(spark, pages_stream, models)


def windowed_quality_metrics(scored_stream: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Per event-time window: docs, keep-rate, mean perplexity. Late data
    beyond the watermark is dropped (exactly the Iceberg-metrics analogue)."""
    return (
        scored_stream.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", window), F.col("lang_pred"))
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(F.col("keep").cast("double")).alias("keep_rate"),
            F.avg("perplexity").alias("avg_ppl"),
        )
    )


def run_stream_to_memory(
    spark: SparkSession, dir_path: str, models: QualityModels, name: str = "quality_out"
):
    """Drive the stream synchronously over the files already in dir_path
    (smoke/test harness; production would use a real source + parquet sink)."""
    stream = quality_stream(spark, read_pages_stream(spark, dir_path), models)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
