from __future__ import annotations

from pyspark.sql import functions as F

from language_identification_spark.fixtures.pages import gen_pages
from language_identification_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    # 90%-English skewed corpus (SURVEY §7.3 risk 4)
    pdf = gen_pages(n_rows=1000, seed=9, skew_lang="en", skew_frac=0.9)
    df = spark.createDataFrame(pdf[["url", "text", "lang"]])

    direct = {
        (r["lang"]): (r["n"], r["max_len"])
        for r in df.groupBy("lang")
        .agg(F.count("*").alias("n"), F.max(F.length("text")).alias("max_len"))
        .collect()
    }
    salted = {
        (r["lang"]): (r["n"], r["max_len"])
        for r in salted_agg(
            df.withColumn("len", F.length("text")),
            "lang",
            {"n": "count", "max_len": "max:len"},
            n_salts=8,
        ).collect()
    }
    assert salted == direct
    assert direct["en"][0] > 800  # the skew is real


def test_salt_spreads_hot_key(spark):
    pdf = gen_pages(n_rows=1000, seed=9, skew_lang="en", skew_frac=0.9)
    df = spark.createDataFrame(pdf[["url", "lang"]])
    from language_identification_spark.operators.skew import salt_col

    spread = (
        df.filter("lang = 'en'")
        .withColumn("s", salt_col(8))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(spread) == 8  # hot key occupies all salt partitions
    counts = [r["count"] for r in spread]
    assert max(counts) < 2 * min(counts)  # roughly even
