"""Sketch-based aggregation — the bounded-memory metric family for
100 TB inputs, complementing the exact twins used as correctness gates.

Two sketches cover the metrics a quality pipeline monitors per shard:
- distinct counts (users, hosts, fingerprints): HyperLogLog++ via
  ``approx_count_distinct`` — a fixed ~``(1.04/rsd)^2``-register sketch
  per group, MERGEABLE across partitions/shards (map-side partial merge,
  no row set ever materializes), vs exact ``count(distinct)`` which
  shuffles every distinct value;
- quantiles: Greenwald-Khanna via ``approx_percentile`` (see
  ``events_quantiles_approx`` in ``__spark_entry__``), vs exact
  ``percentile()`` which buffers whole groups.

Sketch internals differ per engine, so there is no bit-exact DuckDB
twin; the driver gate checks rows/schema and pytest asserts the
published error bound against the exact result
(tests/test_misc_ops.py::test_approx_distinct_error_bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """(group_cols..., n_approx, n_rows): HLL++ distinct count of
    ``value_col`` per group. ``rsd`` is the target relative standard
    deviation (Spark's HLL++ parameter); expected relative error is
    ~``rsd`` (the bound test asserts 5·rsd to keep the assertion
    deterministic-ish at gate scale). At 100 TB this is the ONLY shape
    that answers "how many distinct users/hosts per shard" without
    shuffling every distinct value: the ~1.5 KB (rsd=0.05) register
    array merges associatively, so partial aggregation happens map-side
    and re-aggregating shard sketches into a corpus total is another
    merge, not a recount."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("n_approx"),
        F.count("*").alias("n_rows"),
    )


def exact_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Exact twin of :func:`approx_distinct_by` (correctness/oracle
    path; buffers the distinct value set — gate-scale only)."""
    return df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("n_exact"),
        F.count("*").alias("n_rows"),
    )
