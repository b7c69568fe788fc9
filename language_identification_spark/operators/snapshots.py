"""Crawl-snapshot diffing — what changed between two corpus versions.

The refresh cycle of a web corpus (Common-Crawl-style monthly snapshots)
needs added / removed / changed / unchanged per url before any
incremental work can be scoped: only `added` + `changed` docs enter the
quality pipeline and the incremental dedup legs
(operators/dedup.exact_incremental_dedup / incremental_near_duplicates);
`removed` drives retention bookkeeping. Net-new for the quality-filter
surface (the reference has no corpus-versioning story).

Scale shape: ONE full-outer equi-join on the key. Content equality is
compared on sha256 digests computed map-side, so the shuffle carries
(key, 64-hex digest) — never document text. When both snapshots are
stored bucketed by the key (sources/catalog.write_join_bucketed — the
repo's standing discipline for corpus tables), the join plans with NO
Exchange on either side; otherwise it is a single well-partitioned
hash join. Output is one row per url in either snapshot, so consumers
filter by status BEFORE touching text (`added` rows join back to the
new snapshot by key — again Exchange-free on bucketed tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """One row per key in either snapshot:
    (key, status ∈ {added, removed, changed, unchanged},
    old_digest, new_digest).

    ``added``: key only in ``new_df``; ``removed``: only in ``old_df``;
    ``changed`` / ``unchanged``: in both, by sha256(text) equality.
    Each side is digest-deduplicated per key with min() so a key that
    appears twice in one snapshot (crawler re-fetch) yields one
    deterministic row, not a join fan-out.
    """
    o = old_df.groupBy(F.col(key_col).alias("k")).agg(
        F.min(F.sha2(F.col(text_col), 256)).alias("old_digest")
    )
    n = new_df.groupBy(F.col(key_col).alias("k")).agg(
        F.min(F.sha2(F.col(text_col), 256)).alias("new_digest")
    )
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key_col),
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_digest",
        "new_digest",
    )


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    key_col: str = "url",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`snapshot_diff` over two relations given as
    SQL subqueries (same digest, same dedup-by-min, same status rules)."""
    return f"""
      WITH o AS (
        SELECT {key_col} AS k, min(sha256({text_col})) AS old_digest
        FROM ({old_sql}) GROUP BY 1
      ),
      n AS (
        SELECT {key_col} AS k, min(sha256({text_col})) AS new_digest
        FROM ({new_sql}) GROUP BY 1
      )
      SELECT coalesce(o.k, n.k) AS {key_col},
             CASE WHEN o.old_digest IS NULL THEN 'added'
                  WHEN n.new_digest IS NULL THEN 'removed'
                  WHEN o.old_digest = n.new_digest THEN 'unchanged'
                  ELSE 'changed' END AS status,
             o.old_digest, n.new_digest
      FROM o FULL OUTER JOIN n ON o.k = n.k
    """
