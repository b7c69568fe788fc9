"""Skew handling for lang-skewed web corpora (north_star: "salted
repartitioning for lang-skewed shards, AQE-tuned shuffles").

Real web data is Zipf-skewed (≈half of Common Crawl is English): a plain
``groupBy(lang)`` sends half the corpus to one reducer. Two mitigations,
composable:

- **Salted two-stage aggregation**: partial-aggregate on (key, salt) — S
  reducers share the hot key — then final-aggregate on key over S partial
  rows. Works for any algebraic agg (count/sum/min/max); the n-gram count
  shuffles in models/train.py don't need it because their key is
  (lang, ngram), already high-cardinality.
- **AQE skew-join splitting** is enabled session-wide
  (session.ENGINE_CONFS: spark.sql.adaptive.skewJoin.enabled) for the join
  side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salts: int = 16, deterministic_from: str | None = "url") -> Column:
    """Salt in [0, n_salts). Deterministic (hash of a unique column) so
    reruns produce identical partials; falls back to random otherwise."""
    if deterministic_from is not None:
        return F.pmod(F.xxhash64(F.col(deterministic_from)), F.lit(n_salts)).cast("int")
    return (F.rand(seed=42) * n_salts).cast("int")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    n_salts: int = 16,
    salt_from: str | None = "url",
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → 'count' | 'sum:col' | 'min:col' | 'max:col'.
    Stage 1 groups by (key, salt): the hot key's rows spread over n_salts
    reducers. Stage 2 merges the ≤ n_salts partial rows per key — trivially
    small. Results are identical to a direct groupBy (algebraic aggs only).
    """
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count("*").alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            partial_exprs.append(getattr(F, op)(col).alias(f"_p_{out}"))
            merge = "sum" if op == "sum" else op
            final_exprs.append(getattr(F, merge)(f"_p_{out}").alias(out))
    partial = (
        df.withColumn("_salt", salt_col(n_salts, salt_from))
        .groupBy(key, "_salt")
        .agg(*partial_exprs)
    )
    return partial.groupBy(key).agg(*final_exprs)
