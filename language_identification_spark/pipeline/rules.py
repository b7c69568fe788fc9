"""Keep/drop decision — ONE set of constants shared by the Spark pipeline
and the pure-Python oracle, so both sides evaluate the identical predicate
over identical inputs (features are integer-ratio floats; lang_conf and
perplexity come from shared scoring code ⇒ bit-identical).

Gopher/C4-style bounds (net-new per north_star; no reference counterpart):
length/word bounds, symbol ratio, repetition, stop-word fraction,
bullet/ellipsis line ratios, duplicate-line fraction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_CHARS = 50
MAX_CHARS = 20000
MIN_WORDS = 5
MIN_MEAN_WORD_LEN = 1.0
MAX_MEAN_WORD_LEN = 15.0
MAX_SYMBOL_RATIO = 0.3
MIN_DISTINCT_WORD_RATIO = 0.2
MIN_LANG_CONF = 0.5
MAX_PERPLEXITY = 60.0
# Gopher-style additions (r4): a real web doc in a covered language should
# contain SOME function words (Gopher requires ≥2 stop words; expressed
# here as a ratio so doc length doesn't change the rule's meaning), should
# not be mostly bullet lines (Gopher: ≤90%), mostly "..."-truncated lines
# (Gopher: ≤30%), or mostly repeated lines (Gopher dedups by line fraction).
MIN_STOPWORD_RATIO = 0.01
MAX_BULLET_LINE_RATIO = 0.9
MAX_ELLIPSIS_LINE_RATIO = 0.3
MAX_DUP_LINE_RATIO = 0.3


def _fixture_stopwords() -> tuple[str, ...]:
    """Tiny per-fixture-language stop-word lexicon: the 20 most frequent
    (= first-generated, the fixture draws uniformly) vocabulary words of
    each synthetic language. Deterministic — both engines and the DuckDB
    oracle embed the identical literal list. A production deployment would
    swap in real per-language function-word lists; everything downstream
    (broadcast, ratio, rule) is shape-identical.
    """
    from ..fixtures.pages import LANGS, _lang_vocab

    stops: set[str] = set()
    for lang in LANGS:
        stops.update(_lang_vocab(lang)[:20])
    return tuple(sorted(stops))


DEFAULT_STOPWORDS: tuple[str, ...] = _fixture_stopwords()


def keep_expr() -> Column:
    """Native Spark SQL keep predicate over the pipeline's columns."""
    return (
        (F.col("n_chars") >= MIN_CHARS)
        & (F.col("n_chars") <= MAX_CHARS)
        & (F.col("n_words") >= MIN_WORDS)
        & (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("distinct_word_ratio") >= MIN_DISTINCT_WORD_RATIO)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        & (F.col("bullet_line_ratio") <= MAX_BULLET_LINE_RATIO)
        & (F.col("ellipsis_line_ratio") <= MAX_ELLIPSIS_LINE_RATIO)
        & (F.col("dup_line_ratio") <= MAX_DUP_LINE_RATIO)
        & (F.col("lang_conf") >= MIN_LANG_CONF)
        & (F.col("perplexity") <= MAX_PERPLEXITY)
    )


def py_keep(feats: dict, lang_conf: float, perplexity: float) -> bool:
    """Oracle-side twin of :func:`keep_expr`."""
    return (
        MIN_CHARS <= feats["n_chars"] <= MAX_CHARS
        and feats["n_words"] >= MIN_WORDS
        and MIN_MEAN_WORD_LEN <= feats["mean_word_len"] <= MAX_MEAN_WORD_LEN
        and feats["symbol_ratio"] <= MAX_SYMBOL_RATIO
        and feats["distinct_word_ratio"] >= MIN_DISTINCT_WORD_RATIO
        and feats["stopword_ratio"] >= MIN_STOPWORD_RATIO
        and feats["bullet_line_ratio"] <= MAX_BULLET_LINE_RATIO
        and feats["ellipsis_line_ratio"] <= MAX_ELLIPSIS_LINE_RATIO
        and feats["dup_line_ratio"] <= MAX_DUP_LINE_RATIO
        and lang_conf >= MIN_LANG_CONF
        and perplexity <= MAX_PERPLEXITY
    )
