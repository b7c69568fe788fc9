"""The flagship quality-filter pipeline (north_rule):

    pages(url, warc_ts, html, text, lang)
      → normalize → langid (hashed-ngram NB, broadcast, Arrow UDF)
      → perplexity (bigram LM, broadcast, Arrow UDF)
      → Gopher/C4 heuristics (native Spark SQL columns)
      → PII/toxicity scrub (compiled regex, Arrow UDF)
      → keep/drop

Execution shape at scale: training is two groupBy shuffles over the train
split (exact integer counts); serving is a SINGLE narrow map stage — one
pandas UDF computes (norm_text, lang_pred, lang_conf, perplexity,
scrubbed_text) per Arrow batch (one Python round trip per batch), then the
heuristic columns and the keep predicate stay JVM-side. No shuffle touches
the 100 TB side after the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scrub import scrub_series
from ..functions.text import with_quality_columns
from ..models.hashed_ngram import DIM, HashedNgramNB, featurize_counts_pdf
from ..models.perplexity import BigramLM, bigram_counts_pdf
from ..session import ship_package
from .rules import keep_expr

OUTPUT_STRUCT = T.StructType(
    [
        T.StructField("norm_text", T.StringType()),
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
        T.StructField("perplexity", T.DoubleType()),
        T.StructField("scrubbed_text", T.StringType()),
    ]
)

from ..functions.text import DUP_NGRAM_NS, TOP_NGRAM_NS

FUSED_STRUCT = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
        T.StructField("perplexity", T.DoubleType()),
        T.StructField("scrubbed_text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("mean_word_len", T.DoubleType()),
        T.StructField("symbol_ratio", T.DoubleType()),
        T.StructField("distinct_word_ratio", T.DoubleType()),
        T.StructField("stopword_ratio", T.DoubleType()),
        T.StructField("bullet_line_ratio", T.DoubleType()),
        T.StructField("ellipsis_line_ratio", T.DoubleType()),
        T.StructField("dup_line_ratio", T.DoubleType()),
        T.StructField("n_cjk", T.IntegerType()),
        T.StructField("n_script_letters", T.IntegerType()),
        T.StructField("is_cjk", T.BooleanType()),
        T.StructField("distinct_char_4gram_ratio", T.DoubleType()),
    ]
    + [
        T.StructField(f"top_{n}gram_char_frac", T.DoubleType()) for n in TOP_NGRAM_NS
    ]
    + [
        T.StructField(f"dup_{n}gram_char_frac", T.DoubleType()) for n in DUP_NGRAM_NS
    ]
)


@dataclass
class QualityModels:
    """Everything the serving UDF needs, broadcast once per executor —
    including the stop-word lexicon: at production scale that list is
    10k+ words per language, and riding the model broadcast (instead of
    being inlined into the plan as a literal) is the correct transport.
    The native heuristic path receives the same tuple so both serving
    shapes stay bit-identical."""

    langid: HashedNgramNB
    lm: BigramLM
    stopwords: tuple[str, ...] | None = None  # None → rules.DEFAULT_STOPWORDS


def train_quality_models(
    train_df: DataFrame,
    dim: int = DIM,
    stopwords: tuple[str, ...] | None = None,
) -> QualityModels:
    """Train both models with two distributed aggregations.

    ``train_df`` must have (text, lang); text is normalized inside the
    featurizers (they lowercase; padding conventions are theirs).
    Counts are exact integers ⇒ the resulting float model is identical
    regardless of partitioning (SURVEY.md §7.3 float-determinism rule).
    """
    # Caller may supply any SparkSession (the driver does): the UDF/
    # mapInPandas closures below reference package modules, so the package
    # zip must be on the executors' python path.
    ship_package(train_df.sparkSession)
    src = train_df.select("text", "lang")

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        # Python-semantics strip (same as the oracle / serving UDF); Spark's
        # trim() only strips ' ' so normalization stays Python-side.
        return pdf.assign(text=pdf["text"].fillna("").str.strip())

    bucket_counts = (
        src.mapInPandas(
            lambda it: (featurize_counts_pdf(_norm(pdf), dim) for pdf in it),
            schema="lang string, bucket long, cnt long",
        )
        .groupBy("lang", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
    )
    doc_counts = {
        r["lang"]: r["n"] for r in src.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    langid = HashedNgramNB.from_counts(bucket_counts, doc_counts, dim=dim)

    bg_counts = (
        src.select("text")
        .mapInPandas(lambda it: (bigram_counts_pdf(_norm(pdf)) for pdf in it),
                     schema="cur string, nxt string, cnt long")
        .groupBy("cur", "nxt")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
    )
    lm = BigramLM.from_counts(bg_counts)
    return QualityModels(langid=langid, lm=lm, stopwords=stopwords)


def make_score_udf(spark: SparkSession, models: QualityModels):
    """One Arrow UDF computing every Python-side column in a single pass.

    The broadcast is deserialized once per Python worker process (module
    cache + spark.python.worker.reuse), never per batch.
    """
    ship_package(spark)
    bc = spark.sparkContext.broadcast(models)
    state: dict = {}

    @F.pandas_udf(OUTPUT_STRUCT)
    def score(texts: pd.Series) -> pd.DataFrame:
        if "m" not in state:
            state["m"] = bc.value
        m: QualityModels = state["m"]
        norm = texts.fillna("").str.strip()
        labels, confs = m.langid.predict_labels(norm.tolist())
        ppl = m.lm.perplexity_batch(norm.tolist())
        scrubbed = scrub_series(norm)
        return pd.DataFrame(
            {
                "norm_text": norm,
                "lang_pred": labels,
                "lang_conf": confs,
                "perplexity": ppl,
                "scrubbed_text": scrubbed,
            }
        )

    return score


def make_fused_udf(spark: SparkSession, models: QualityModels):
    """Fused serving UDF: scoring + scrub + heuristic features in ONE Arrow
    pass, returning numbers instead of a second full-text column.

    vs the default path: drops ``norm_text`` from the Arrow return (one
    full copy of every document saved on the Python→JVM hop) and computes
    the heuristic features with the byte-identical Python twin instead of
    a second JVM scan over the text. Used by ``heuristics='fused'``.
    """
    from ..functions.text import py_quality_features_batch

    ship_package(spark)
    bc = spark.sparkContext.broadcast(models)
    state: dict = {}

    @F.pandas_udf(FUSED_STRUCT)
    def score(texts: pd.Series) -> pd.DataFrame:
        if "m" not in state:
            state["m"] = bc.value
        m: QualityModels = state["m"]
        norm = texts.fillna("").str.strip()
        labels, confs = m.langid.predict_labels(norm.tolist())
        ppl = m.lm.perplexity_batch(norm.tolist())
        feats = py_quality_features_batch(norm, m.stopwords)
        return pd.DataFrame(
            {
                "lang_pred": labels,
                "lang_conf": confs,
                "perplexity": ppl,
                "scrubbed_text": scrub_series(norm),
                **feats,
            }
        )

    return score


def run_quality_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    models: QualityModels,
    heuristics: str = "native",
) -> DataFrame:
    """pages → scored/filtered output. Narrow (no shuffle) after the scan.

    ``heuristics='native'`` (default): heuristic columns as Spark SQL
    expressions over the UDF's ``norm_text`` — fully Catalyst-visible.
    ``heuristics='fused'``: features computed inside the scoring UDF (same
    numbers, bit-identical) — one Arrow pass, no norm_text round trip;
    the faster serving shape when nothing downstream needs norm_text.
    """
    if heuristics == "fused":
        score = make_fused_udf(spark, models)
        out = pages.withColumn("_s", score(F.col("text"))).select(
            *[c for c in pages.columns if c not in ("html",)], "_s.*"
        )
        return out.withColumn("keep", keep_expr())
    score = make_score_udf(spark, models)
    out = pages.withColumn("_s", score(F.col("text"))).select(
        *[c for c in pages.columns if c not in ("html",)], "_s.*"
    )
    out = with_quality_columns(out, "norm_text", stopwords=models.stopwords)
    return out.withColumn("keep", keep_expr())
