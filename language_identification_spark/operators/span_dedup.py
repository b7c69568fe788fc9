"""Span-level exact-substring dedup — remove duplicated k-word SPANS
across documents while keeping the rest of each document (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better": much
of web duplication is long shared passages — licenses, quotes, templated
paragraphs — inside otherwise-unique pages; document-level dedup keeps
or drops whole pages and misses it entirely).

Net-new operator (task brief's training-data-pipeline family; no
reference counterpart). Complements the existing families: exact dedup
(whole doc), MinHash/SimHash (near-whole-doc), boilerplate removal
(single repeated lines) — this one removes repeated multi-word passages.

The suffix-array construction of the paper is a single-machine shape; the
distributed equivalent used here is k-gram window marking: every k-word
window that occurs in ≥2 distinct documents is a duplicated span, and
every word covered by such a window is removed from every NON-CANONICAL
document (canonical = min doc id per window — "keep the first
occurrence"). Contiguous duplicated passages longer than k are handled
for free: their overlapping k-windows tile the passage, so interval
merging is just the distinct union of covered positions.

Pinned semantics (each a choice; both engines and all shards apply the
same one):
- words = whitespace tokens (the ``words()`` discipline shared with
  decontamination/Gopher); rebuilt text joins surviving words with a
  single space, i.e. output whitespace is CANONICALIZED for all docs,
  changed or not — uniform output beats mixed raw/rebuilt text;
- duplication is CROSS-document (n_docs ≥ 2): a doc repeating its own
  phrase is repetition (Gopher dup-n-gram rules' job), not span dup;
- the canonical doc keeps ALL its occurrences of the window; every
  other doc drops every covered word;
- docs with < k words have no windows and pass through (canonicalized).

Scale shape: one explode of k-gram hashes (the shuffle carries 8-byte
``xxhash64`` keys + positions, never gram text — the boilerplate/
decontamination discipline), one hash-agg for (n_docs, canonical), one
join back pruned by ``n_docs >= 2`` (duplicated windows are a small
fraction of all windows in a real corpus, and AQE broadcasts the
survivor set when it measures small), a k-row-per-window position
explode on FLAGGED windows only, then one doc-keyed rebuild shuffle.

Exactness: pure string/hash/int SQL ⇒ FULL DuckDB gate (``span_dedup``
in ``__spark_entry__``; the oracle recomputes windows on gram STRINGS —
hashing is an engine-side transport choice, not part of the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams, words


def duplicated_spans(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, s, gh, canonical_id): every k-word window (0-based start
    ``s``) whose gram occurs in ≥2 distinct docs, with the min-doc-id
    canonical owner. The building block; :func:`remove_duplicate_spans`
    consumes it."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_ngrams(words(F.col(text_col)), k)).alias("s", "g"),
    ).select("id", "s", F.xxhash64("g").alias("gh"))
    freq = grams.groupBy("gh").agg(
        F.count_distinct("id").alias("n_docs"),
        F.min("id").alias("canonical_id"),
    )
    return grams.join(
        freq.filter(F.col("n_docs") >= 2).select("gh", "canonical_id"), "gh"
    ).select("id", "s", "gh", "canonical_id")


def remove_duplicate_spans(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, text_col rebuilt, n_words, n_words_dropped): drop every
    word covered by a cross-doc duplicated k-window from every
    non-canonical doc; rebuild from surviving words in order."""
    wp = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "w"),
    )
    flagged = duplicated_spans(docs, k, id_col, text_col).filter(
        F.col("id") != F.col("canonical_id")
    )
    covered = flagged.select(
        "id", F.explode(F.sequence(F.col("s"), F.col("s") + (k - 1))).alias("pos")
    ).distinct()
    kept = wp.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))), lambda x: x["w"]
            ),
            " ",
        ).alias("_clean"),
        F.count("*").alias("_n_kept"),
    )
    totals = docs.select(
        F.col(id_col).alias("id"), F.size(words(F.col(text_col))).alias("n_words")
    )
    return totals.join(rebuilt, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("_clean"), F.lit("")).alias(text_col),
        "n_words",
        (F.col("n_words") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
            "n_words_dropped"
        ),
    )
