"""Interval-point (range) join — match every point event to the
intervals containing it, per key: "which session window was this click
inside", "which deploy window covers this error". Spark turns the naive
``ON p.ts >= i.start AND p.ts < i.end`` into a
BroadcastNestedLoopJoin (or a full cartesian per key) — O(|I|·|P|)
comparisons, the classic scale cliff; engines with IEJoin (DuckDB) do
it natively, which again makes the FULL gate (``interval_join`` in
``__spark_entry__``) a genuine two-implementation check.

Net-new operator (task brief's custom-operator family; no reference
counterpart).

Implementation — time-bin bucketing, all built-ins:
1. pick a bin width W (microseconds); an interval [s, e) replicates to
   every bin it overlaps (``explode(sequence(s div W, (e-1) div W))``);
   a point maps to its single bin ``ts div W``;
2. equi-join on (key, bin) — a plain shuffled/broadcast hash join
   Catalyst can plan and AQE can size;
3. filter exact containment ``s <= ts < e``.

No post-dedup is needed: a point lives in exactly ONE bin, so each
(interval, point) pair can only meet once — the bin explosion is on the
interval side only.

Pinned semantics: half-open ``[start, end)`` containment; inner join
(points outside every interval drop; use a left variant downstream if
attrition must be observable); empty intervals (``end <= start``) match
nothing.

Choosing W is the scale lever, not a correctness knob: replication
factor per interval is ``ceil(len/W)+1``, join fan-in per bin is the
number of concurrent intervals — W ≈ the typical interval length keeps
both O(1). A pathological key×bin hotspot (one user, one minute,
millions of events) is ordinary join skew — AQE skew-join splits it,
the same regime as every other equi-join here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start: str,
    end: str,
    ts: str,
    bin_width_us: int = 600_000_000,
) -> DataFrame:
    """Inner-join ``points`` to every containing ``[start, end)``
    interval with the same ``key``. ``start``/``end``/``ts`` are epoch
    microseconds (BIGINT) — callers with timestamps convert first
    (``unix_micros``), keeping the bin arithmetic exact integer work.
    Output: all interval columns + all point columns (caller guarantees
    disjoint names apart from ``key``, which appears once)."""
    w = int(bin_width_us)
    # `div` = exact BIGINT division: float `floor(a/w)` can flip at bin
    # boundaries once `a` is epoch-micro-sized
    i2 = intervals.filter(F.col(end) > F.col(start)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"`{start}` div {w}L"),
                F.expr(f"(`{end}` - 1L) div {w}L"),
            )
        ),
    )
    p2 = points.withColumn("_bin", F.expr(f"`{ts}` div {w}L"))
    joined = i2.join(p2, [key, "_bin"]).filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_bin")
