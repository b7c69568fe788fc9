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
# Gopher §A1.1 repetition bounds (r5): chars covered by the most frequent
# word n-gram (n=2,3,4; counted only when it occurs ≥2 times — see
# text._top_gram_chars) and chars inside duplicated word n-grams
# (n=5..10), as fractions of the doc's chars. Thresholds are the Gopher
# paper's published values.
MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
MAX_DUP_NGRAM_CHAR_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


_DEFAULT_STOPWORDS_CACHE: tuple[str, ...] | None = None


def default_stopwords() -> tuple[str, ...]:
    """The default stop-word lexicon, resolved LAZILY from the fixture
    module (fixtures own the generation; this production module must not
    run fixture RNG loops at import time on every executor). A production
    deployment injects real per-language function-word lists via
    ``QualityModels.stopwords`` / the ``stopwords`` parameters instead —
    everything downstream (broadcast, ratio, rule) is shape-identical."""
    global _DEFAULT_STOPWORDS_CACHE
    if _DEFAULT_STOPWORDS_CACHE is None:
        from ..fixtures.pages import fixture_stopwords

        _DEFAULT_STOPWORDS_CACHE = fixture_stopwords()
    return _DEFAULT_STOPWORDS_CACHE


def __getattr__(name: str):
    # PEP 562: keep the DEFAULT_STOPWORDS constant-style name working for
    # existing importers without paying the fixture import at module load.
    if name == "DEFAULT_STOPWORDS":
        return default_stopwords()
    raise AttributeError(name)


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
        & _rep_expr()
        & (F.col("lang_conf") >= MIN_LANG_CONF)
        & (F.col("perplexity") <= MAX_PERPLEXITY)
    )


def _rep_expr() -> Column:
    cond = F.lit(True)
    for n, t in MAX_TOP_NGRAM_CHAR_FRAC.items():
        cond = cond & (F.col(f"top_{n}gram_char_frac") <= t)
    for n, t in MAX_DUP_NGRAM_CHAR_FRAC.items():
        cond = cond & (F.col(f"dup_{n}gram_char_frac") <= t)
    return cond


"""Per-rule reason codes — the observability face of the keep decision.

RefinedWeb/Dolma-style pipelines report PER-RULE removal rates and store
the first failing rule with each dropped doc (debugging a corpus cut of
unknown provenance is the 100 TB failure mode this exists for). The
table below lists every keep rule in ``keep_expr``'s contract order with
its failing comparison; :func:`drop_reason_expr` compiles it to ONE
native CASE chain (first failing rule wins, NULL = kept) and
:func:`drop_reason_sql` emits the DuckDB twin from the SAME rows, so the
two engines cannot drift. Equivalence with ``keep_expr`` (kept ⇔ reason
IS NULL) is pinned by test_misc_ops::test_drop_reason_matches_keep."""

RULE_SPECS: list[tuple[str, str, str, float]] = (
    [
        ("too_few_chars", "n_chars", "<", MIN_CHARS),
        ("too_many_chars", "n_chars", ">", MAX_CHARS),
        ("too_few_words", "n_words", "<", MIN_WORDS),
        ("mean_word_len_low", "mean_word_len", "<", MIN_MEAN_WORD_LEN),
        ("mean_word_len_high", "mean_word_len", ">", MAX_MEAN_WORD_LEN),
        ("symbol_ratio_high", "symbol_ratio", ">", MAX_SYMBOL_RATIO),
        ("distinct_word_ratio_low", "distinct_word_ratio", "<", MIN_DISTINCT_WORD_RATIO),
        ("stopword_ratio_low", "stopword_ratio", "<", MIN_STOPWORD_RATIO),
        ("bullet_line_ratio_high", "bullet_line_ratio", ">", MAX_BULLET_LINE_RATIO),
        ("ellipsis_line_ratio_high", "ellipsis_line_ratio", ">", MAX_ELLIPSIS_LINE_RATIO),
        ("dup_line_ratio_high", "dup_line_ratio", ">", MAX_DUP_LINE_RATIO),
    ]
    + [
        (f"top_{n}gram_char_frac_high", f"top_{n}gram_char_frac", ">", t)
        for n, t in MAX_TOP_NGRAM_CHAR_FRAC.items()
    ]
    + [
        (f"dup_{n}gram_char_frac_high", f"dup_{n}gram_char_frac", ">", t)
        for n, t in MAX_DUP_NGRAM_CHAR_FRAC.items()
    ]
    + [
        ("lang_conf_low", "lang_conf", "<", MIN_LANG_CONF),
        ("perplexity_high", "perplexity", ">", MAX_PERPLEXITY),
    ]
)


def _specs(include_model_rules: bool) -> list[tuple[str, str, str, float]]:
    if include_model_rules:
        return RULE_SPECS
    return [r for r in RULE_SPECS if r[1] not in ("lang_conf", "perplexity")]


def drop_reason_expr(include_model_rules: bool = True) -> Column:
    """First failing rule's name (contract order), NULL when kept.
    ``include_model_rules=False`` restricts to the heuristic columns
    (the shape usable before langid/perplexity have run)."""
    expr = None
    for reason, col, op, t in _specs(include_model_rules):
        cond = (F.col(col) < F.lit(t)) if op == "<" else (F.col(col) > F.lit(t))
        expr = F.when(cond, F.lit(reason)) if expr is None else expr.when(cond, F.lit(reason))
    return expr.otherwise(F.lit(None).cast("string"))


def drop_reason_sql(include_model_rules: bool = True) -> str:
    """DuckDB twin of :func:`drop_reason_expr`, generated from RULE_SPECS."""
    whens = "\n".join(
        f"WHEN {col} {op} {t} THEN '{reason}'"
        for reason, col, op, t in _specs(include_model_rules)
    )
    return f"CASE {whens} ELSE NULL END"


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
        and all(
            feats[f"top_{n}gram_char_frac"] <= t
            for n, t in MAX_TOP_NGRAM_CHAR_FRAC.items()
        )
        and all(
            feats[f"dup_{n}gram_char_frac"] <= t
            for n, t in MAX_DUP_NGRAM_CHAR_FRAC.items()
        )
        and lang_conf >= MIN_LANG_CONF
        and perplexity <= MAX_PERPLEXITY
    )
