"""Benchmark decontamination — flag training documents that overlap an
evaluation set's word n-grams (the GPT-3/PaLM-style 13-gram check;
every LLM training-data pipeline runs one before a corpus ships).

Net-new operator (task brief's training-data-pipeline family; no
reference counterpart).

Scale shape: the EVAL side is small by definition (benchmarks are
thousands of docs, the corpus is billions), so its distinct n-gram hash
set is broadcast and the corpus side is read ONCE: explode → per-doc
distinct → one broadcast left join marking eval hits → one groupBy(doc)
computing total and contaminated counts together. Two shuffles total
(the (id, gh) distinct and the per-doc re-aggregation, both map-side
combined), and the expensive explode subtree has exactly one consumer —
an earlier draft aggregated hits and totals as separate consumers of the
same subtree, running the explode+distinct twice. N-grams travel as
64-bit ``xxhash64`` keys, never strings (2^-64 per-pair collision risk,
the exact-dedup digest discipline).

Exactness: distinct counts are exact integers, one division at the end
⇒ FULL DuckDB gate (``ngram_contamination`` in ``__spark_entry__``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.wordhash import word_gram_hashes_udf


def _doc_gram_hashes(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, gh): DISTINCT word-n-gram hashes per document (overlap is a
    set property; a doc repeating an eval n-gram counts it once).

    r7: hashes from the vectorized Arrow pass (functions/wordhash) and
    the per-doc dedup is a DOC-LOCAL ``array_distinct`` — the old
    ``.distinct()`` shuffled every (id, gh) pair of the corpus to
    deduplicate rows that are already doc-local. ``explode_outer`` keeps
    zero-gram docs as one NULL-hash row, so the consumer needs no
    corpus re-join to restore them."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.array_distinct(word_gram_hashes_udf(n)(F.col(text_col)))
        ).alias("gh"),
    )


def ngram_contamination(
    corpus: DataFrame,
    evalset: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_grams, n_contaminated, contamination_frac) per corpus
    document: how many of the doc's distinct word n-grams also occur
    anywhere in ``evalset``, as a count and a fraction of the doc's
    distinct n-grams. Docs shorter than ``n`` words have ``n_grams=0``
    and ``contamination_frac=0.0`` (nothing to leak).

    The caller picks the policy (drop above a threshold, or route to
    review); this operator only measures — same candidates-not-verdicts
    discipline as the LSH family."""
    ev = (
        evalset.select(
            F.explode(word_gram_hashes_udf(n)(F.col(text_col))).alias("gh")
        )
        .distinct()
        .withColumn("_hit", F.lit(1).cast("long"))
    )
    dg = _doc_gram_hashes(corpus, n, id_col, text_col)
    # broadcast hint on the eval side: benchmarks are small by
    # definition, and without the hint a cold-stats corpus join would
    # shuffle every corpus n-gram hash. A LEFT join (not semi) marks
    # hits so totals and contaminated counts come out of ONE aggregation
    # over ONE pass of the explode subtree; ev.gh is distinct, so the
    # join cannot fan rows out. count(gh) ignores the NULL row that
    # explode_outer emits for zero-gram docs, so those come out as
    # (0, 0, 0.0) directly — no corpus re-join (r7: the old final
    # left-join pass re-scanned the corpus only to restore them).
    return (
        dg.join(F.broadcast(ev), "gh", "left")
        .groupBy("id")
        .agg(
            F.count("gh").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_contaminated",
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.col("n_contaminated").cast("double") / F.col("n_grams"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination_frac"),
        )
    )
