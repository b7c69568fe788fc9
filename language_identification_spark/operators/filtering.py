"""Per-group score-percentile filtering — "drop the bottom X% by quality
score per language" without a corpus-wide sort.

The naive expression of this policy is a global window
(``percent_rank() OVER (PARTITION BY lang ORDER BY score)``), which at
100 TB sorts every partition's full score column. This operator computes
the SAME keep set in two narrow passes instead:

1. one per-group aggregation producing a |groups|-row threshold table
   (shuffles only (group, score) pairs into a hash agg, no sort of the
   corpus);
2. a broadcast join of the thresholds + a pushed-down filter.

``exact=True`` uses ``percentile()`` (exact linear interpolation,
matching DuckDB's ``quantile_cont`` — the FULL-gateable shape; its known
cost is buffering each group's values inside the agg, fine for bounded
group counts at gate scale). The default ``exact=False`` swaps in
``approx_percentile`` (Greenwald-Khanna, bounded memory) — the 100 TB
serving path, identical plan shape, same two passes. Scores and
thresholds are rounded to ``round_digits`` before the comparison in BOTH
engines so boundary docs cannot flip on cross-engine ULP noise.

Net-new for the quality-filter surface (no reference counterpart; the
reference filters on fixed thresholds only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def percentile_filter(
    df: DataFrame,
    score_col: str,
    frac: float = 0.1,
    group_col: str | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
    round_digits: int = 6,
) -> DataFrame:
    """Rows whose ``score_col`` is >= the per-``group_col`` ``frac``
    quantile (ungrouped when ``group_col`` is None). Output columns =
    input columns; the threshold never widens the corpus rows."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    if exact:
        agg = F.expr(f"percentile({score_col}, {frac!r})")
    else:
        agg = F.expr(f"approx_percentile({score_col}, {frac!r}, {accuracy})")
    thr_col = F.round(agg, round_digits).alias("_thr")
    keep = F.round(F.col(score_col), round_digits) >= F.col("_thr")
    if group_col is None:
        thr = df.agg(thr_col)
        return df.crossJoin(F.broadcast(thr)).filter(keep).drop("_thr")
    thr = df.groupBy(group_col).agg(thr_col)
    return df.join(F.broadcast(thr), group_col).filter(keep).drop("_thr")
