"""DL-family serving pattern (predict_batch_udf) — the distilled ReLU MLP
must reproduce the NB model's predictions through the full Spark path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from language_identification_spark.models.dl_inference import (
    MLPCheckpoint,
    mlp_langid_udf,
    mlp_predict_batch,
)
from language_identification_spark.pipeline.quality import train_quality_models


def test_mlp_distillation_matches_nb(spark, pages_df):
    nb = train_quality_models(pages_df.filter("split = 'train'")).langid
    ckpt = MLPCheckpoint.distill_from_nb(nb)
    texts = [r["text"] for r in pages_df.filter("split = 'test'").limit(200).collect()]
    mlp_preds, mlp_conf = mlp_predict_batch(ckpt, texts)
    nb_preds, nb_conf = nb.score_batch(texts)
    # relu(a) - relu(-a) = a → identical scores up to float association
    assert (mlp_preds == nb_preds).mean() >= 0.995
    np.testing.assert_allclose(mlp_conf, nb_conf, rtol=1e-9)


def test_predict_batch_udf_serving(spark, pages_df):
    nb = train_quality_models(pages_df.filter("split = 'train'")).langid
    ckpt = MLPCheckpoint.distill_from_nb(nb)
    udf = mlp_langid_udf(spark, ckpt, batch_size=256)
    test = pages_df.filter("split = 'test'")
    out = test.select("lang", udf(F.col("text")).alias("lang_pred"))
    acc = out.select(
        F.avg((F.col("lang") == F.col("lang_pred")).cast("double")).alias("a")
    ).first()["a"]
    assert acc >= 0.95, acc
    # degenerate inputs must not crash the batch path
    probe = spark.createDataFrame([("",), ("   ",), ("ᚠᚢᚦᚨᚱᚲ",)], ["text"])
    assert probe.select(udf(F.col("text"))).count() == 3
