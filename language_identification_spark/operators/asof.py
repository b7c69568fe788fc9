"""As-of (temporal) join — attach to each left row the most recent
right row at or before its timestamp, per key: "what was the user's
last error when this click happened", "which model snapshot served this
request". Spark has no ASOF JOIN; the naive encodings are a range join
(quadratic blowup per key) or a per-key ``applyInPandas`` merge (Python
in the hot path, whole key in memory).

Net-new operator (task brief's custom-operator family; no reference
counterpart). DuckDB HAS native ``ASOF JOIN``, which makes the FULL
cross-engine gate (``asof_join`` in ``__spark_entry__``) a real
two-implementation check rather than a twin of our own SQL.

Implementation — the scalable union trick, all built-ins:
1. tag right rows ``side=0`` carrying their payload as one struct
   column, left rows ``side=1`` with a null payload;
2. union, ONE shuffle keyed on the join key;
3. running ``last(payload, ignorenulls=True)`` over
   ``Window.partitionBy(key).orderBy(ts, side, tiebreak)`` with an
   unbounded-preceding→current frame — a streaming accumulator, O(rows)
   per partition, NOT a per-row rescan;
4. keep ``side=1`` rows and unpack the struct.

Pinned semantics:
- backward direction, ``allow_exact=True`` (≤): a right row AT the left
  row's timestamp is visible — ``side`` orders right (0) before left (1)
  at equal ``ts``. ``allow_exact=False`` gives strict ``<`` by flipping
  the side order;
- ties among right rows at the same (key, ts) resolve to the greatest
  ``tiebreak`` value (the window's ordering makes ``last`` pick it) —
  engines without a defined tie rule (DuckDB ASOF) must be fed a
  (key, ts)-unique right side to compare, which is what the gate does;
- left rows with no visible right row keep NULL payload columns
  (left-outer semantics, like DuckDB's ``ASOF LEFT JOIN``).

Scale notes: one shuffle of |L|+|R| rows keyed on the join key — the
minimum any per-key temporal operator pays; no row widening until after
the window (payload rides as one struct). A key whose history exceeds a
single task's comfortable range (a bot user with billions of events) is
the window-skew case: the mitigation is time-bucketing the input and
carrying each bucket's closing state into the next (the streaming
formulation), not salting — order-dependent windows cannot salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    allow_exact: bool = True,
    prefix: str = "asof_",
    time_bucket: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload_cols`` from
    the latest ``right`` row with the same ``key`` and ``right.ts <=
    left.ts`` (``<`` when ``allow_exact=False``); NULLs when none.
    Payload columns come back prefixed (``asof_<col>``).

    ``time_bucket`` (r6): width in ``ts`` units for the hot-key skew
    mitigation — windows partition by (key, ts div width) instead of
    key alone, with closing state carried across buckets (see
    :func:`_bucketed_pick`). Same output for any width."""
    right_side, left_side = (0, 1) if allow_exact else (1, 0)
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    r = right.select(
        F.col(key).alias(key),
        F.col(ts).alias(ts),
        F.lit(right_side).alias("_side"),
        F.lit(None).cast("long").alias("_tb") if tiebreak is None
        else F.col(tiebreak).cast("long").alias("_tb"),
        payload,
    )
    l = left.select(
        "*",
        F.lit(left_side).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    if time_bucket is None:
        w = (
            Window.partitionBy(key)
            .orderBy(
                F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = u.withColumn(
            "_picked", F.last("_asof_payload", ignorenulls=True).over(w)
        )
    else:
        picked = _bucketed_pick(u, key, ts, int(time_bucket), left_side)
    out = picked.filter(F.col("_side") == left_side).select(
        *[c for c in left.columns],
        *[F.col(f"_picked.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out


def _bucketed_pick(u, key: str, ts: str, width: int, left_side: int):
    """The hot-key skew mitigation the per-key window can't give (an
    order-dependent window cannot salt): bucket time into ``width``-unit
    spans so no single window partition exceeds one (key, bucket)'s
    rows, then carry each bucket's CLOSING right-row state forward
    through a second window that runs over per-(key,bucket) summary rows
    — |buckets| per key, not |rows| per key.

    Stage 1 (local): the same running ``last(ignorenulls)`` but
    partitioned by (key, bucket) — resolves every left row whose latest
    visible right row lives in its own bucket.
    Stage 2 (carry): per (key, bucket), the closing right payload =
    payload of the bucket's max-(ts, side, tiebreak) right row; a
    running ``last(ignorenulls)`` over the DISTINCT bucket grid
    (unbounded-preceding → previous bucket) gives each bucket its
    carry-in state.
    Result: ``coalesce(local, carry_in)`` — exactly the single-window
    answer (pinned by the asof property test running both modes)."""
    b = u.withColumn("_bkt", F.expr(f"`{ts}` div {width}L"))
    w_local = (
        Window.partitionBy(key, "_bkt")
        .orderBy(
            F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn(
        "_local", F.last("_asof_payload", ignorenulls=True).over(w_local)
    )
    # closing right state per (key, bucket): the local running value at
    # the bucket's last RIGHT row (its own payload by construction)
    w_close = Window.partitionBy(key, "_bkt").orderBy(
        F.col(ts).desc(), F.col("_side").desc(), F.col("_tb").desc_nulls_last()
    )
    closing = (
        b.filter(F.col("_side") != left_side)
        .withColumn("_rn", F.row_number().over(w_close))
        .filter(F.col("_rn") == 1)
        .select(key, "_bkt", F.col("_asof_payload").alias("_close"))
    )
    # carry-in per (key, bucket) over the DISTINCT bucket grid
    grid = b.select(key, "_bkt").distinct()
    w_carry = (
        Window.partitionBy(key)
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        grid.join(closing, [key, "_bkt"], "left")
        .withColumn("_carry", F.last("_close", ignorenulls=True).over(w_carry))
        .select(key, "_bkt", "_carry")
    )
    return local.join(carry, [key, "_bkt"], "left").withColumn(
        "_picked", F.coalesce(F.col("_local"), F.col("_carry"))
    )
