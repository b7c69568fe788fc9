"""Host/domain-level filtering — the two-stage web-pipeline step that
per-document rules cannot express: aggregate document statistics per
canonical host, then keep or drop DOCUMENTS by their HOST's aggregate
(RefinedWeb/CCNet drop whole domains — link farms, SEO spam, parked
domains — whose pages individually look plausible).

Net-new operator (task brief's training-data-pipeline family; no
reference counterpart). Consumes :func:`..functions.urls.url_host`
canonical hosts.

Scale shape: stage 1 is a plain map-side-combined hash aggregation to a
host table (hosts ≪ documents — tens of millions vs 10^12); stage 2
joins the verdict back. The join deliberately carries NO broadcast hint:
a host table can exceed the broadcast threshold at corpus scale, and
AQE broadcasts it when it measures small — the same regime logic as the
boilerplate blocklist. Web corpora are host-skewed (one host can be 1%
of the corpus), which is exactly the aggregation skew `salted_agg`
(operators/skew.py) exists for; the default here is the plain
aggregation because host cardinality is high and AQE's skew handling
covers the join side.

Exactness: counts are exact integers; the single mean is one division
rounded at a pinned precision ⇒ FULL DuckDB gate (``domain_filter`` in
``__spark_entry__``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEAN_PRECISION = 6  # round(mean, 6): pinned so keep/drop can't flap on ulps


def host_stats(
    docs: DataFrame, host_col: str = "host", value_col: str = "n_chars"
) -> DataFrame:
    """(host, n_docs, sum_value, mean_value): per-host rollup of one
    document statistic. ``mean_value`` is rounded to
    :data:`MEAN_PRECISION` so downstream threshold predicates are
    deterministic across engines and partitionings (integer sums first,
    one division after the final agg — the float-determinism discipline
    from SURVEY §7.3)."""
    return docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("n_docs"),
        F.sum(value_col).cast("long").alias("sum_value"),
        F.round(F.sum(value_col) / F.count("*"), MEAN_PRECISION).alias("mean_value"),
    )


def filter_by_host(
    docs: DataFrame,
    stats: DataFrame,
    keep: Column,
    host_col: str = "host",
) -> DataFrame:
    """Keep exactly the documents whose host's aggregate row satisfies
    ``keep`` (a predicate over the ``stats`` columns). Implemented as a
    semi-join on the surviving host set — documents never widen with
    stat columns, and the shuffle carries host keys only."""
    good = stats.filter(keep).select("host")
    return docs.join(
        good, docs[host_col] == good["host"], "left_semi"
    )
