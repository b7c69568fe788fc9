"""Text primitives, in two matched flavors:

1. **Spark Column expressions** (JVM-side, whole-stage-codegen'd) — the hot
   path at scale: n-gram generation, tokenization, heuristic quality columns.
2. **Plain-Python equivalents** — used by the pure-Python oracle AND inside
   pandas UDFs, guaranteeing that anything the pipeline computes in Python
   matches the oracle bit-for-bit (same module, same code).

Semantics notes (pinned so Spark SQL, DuckDB oracle SQL, and Python agree):
- Whitespace class is the Java-default ``\\s`` = ``[ \\t\\n\\x0B\\f\\r]``
  (ASCII). The Python helpers use the same explicit class, NOT Python's
  Unicode-aware ``\\s``.
- ``strip`` follows the reference's pandas ``.str.strip()`` (Python
  ``str.strip()``: Unicode whitespace). Spark's ``trim`` only strips
  ``' '``, so normalization uses ``regexp_replace`` on the Java class above
  (fixtures only contain ASCII whitespace; documented limitation).
- Char n-grams replicate the reference padding ``'_'*(n-1) + text + '_'``
  (/root/reference/src/models/statistical_models.py:23,38).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JAVA_WS = "[ \\t\\n\\x0B\\f\\r]"
PY_WS_CLASS = "[ \t\n\x0b\f\r]"
_PY_WS_RE = re.compile(PY_WS_CLASS + "+")
# every ws-class char → ' ': translate + split(' ') + drop-empties is
# token-identical to re.split(ws+) and ~3× faster (all C string ops)
_WS_TO_SPACE = str.maketrans({c: " " for c in " \t\n\x0b\f\r"})
SYMBOL_CLASS = "[#!$%&*+=@^~|<>]"
_PY_SYMBOL_RE = re.compile(SYMBOL_CLASS)


# ---------------------------------------------------------------------------
# Spark Column expressions (JVM side)
# ---------------------------------------------------------------------------
def norm_text(col: Column) -> Column:
    """Strip leading/trailing whitespace — reference src/utils.py:89-90."""
    return F.regexp_replace(F.regexp_replace(col, f"^{JAVA_WS}+", ""), f"{JAVA_WS}+$", "")


def char_ngrams(col: Column, n: int, reference_pad: bool = True) -> Column:
    """Array of character n-grams with the reference's sentinel padding.

    Pure SQL expression so Catalyst keeps it inside codegen — no Python
    worker involved.

    One ``split(text, '')`` pass materializes the char array; n≥2 builds
    grams by zip_with-concat of n shifted slices of it — every step is
    O(len·n) per doc. The previous form (sequence + transform + substring)
    re-seeked the string from index 0 per gram (UTF8String.substring is
    O(i) on multi-byte data), i.e. O(len²) per doc — measured 3-5× slower
    at web-page lengths for every n.
    """
    if reference_pad:
        padded = F.concat(F.lit("_" * (n - 1)), col, F.lit("_"))
    else:
        padded = col
    # split('', '') yields [''] — guard the unpadded-empty/short case. The
    # padded variant always carries ≥ n sentinel chars, never empty.
    chars = F.split(padded, "")
    if n == 1:
        grams = chars
    else:
        size = F.size(chars)
        grams = F.slice(chars, 1, size - (n - 1))
        for k in range(1, n):
            grams = F.zip_with(
                grams,
                F.slice(chars, k + 1, size - (n - 1)),
                lambda a, b: F.concat(a, b),
            )
    if reference_pad:
        return grams
    return F.when(F.length(padded) < n, F.array().cast("array<string>")).otherwise(grams)


def char_ngrams_sql(text_sql: str, n: int, reference_pad: bool = True) -> str:
    """Same as :func:`char_ngrams` but as a SQL snippet (composable in
    spark.sql; the DuckDB oracles use their own equivalent expansion).
    Same zip_with-over-shifted-slices form as the Column version."""
    p = f"concat('{'_' * (n - 1)}', {text_sql}, '_')" if reference_pad else text_sql
    ch = f"split({p}, '')"
    if n == 1:
        return ch
    g = f"slice({ch}, 1, size({ch}) - {n - 1})"
    for k in range(1, n):
        g = f"zip_with({g}, slice({ch}, {k + 1}, size({ch}) - {n - 1}), (a, b) -> concat(a, b))"
    return g


def words(col: Column) -> Column:
    """Array of whitespace-delimited tokens; empty array for empty text."""
    return F.when(F.length(col) == 0, F.array().cast("array<string>")).otherwise(
        F.split(col, f"{JAVA_WS}+")
    )


WS_CHARS = " \t\n\x0b\f\r"
SYMBOL_CHARS = "#!$%&*+=@^~|<>"

# Gopher repetition rules (r5): which word-n-gram orders feed the
# top-n-gram coverage rule vs the duplicate-n-gram rule (Gopher §A1.1).
TOP_NGRAM_NS = (2, 3, 4)
DUP_NGRAM_NS = (5, 6, 7, 8, 9, 10)


def word_ngrams(w: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a token array column;
    ``[]`` when the doc has fewer than n tokens. Same zip_with-over-
    shifted-slices machinery as :func:`char_ngrams`, token-wise."""
    if n == 1:
        return w
    size = F.size(w)
    grams = F.slice(w, 1, size - (n - 1))
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(w, k + 1, size - (n - 1)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    # the when() guard keeps slice() from seeing a negative length on
    # short docs (CaseWhen evaluates only the matched branch per row)
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def _L0() -> Column:
    # lazy: F.lit at module import would require an active SparkContext
    return F.lit(0).cast("long")


def _dup_gram_chars(grams: Column) -> Column:
    """Σ cnt·len(gram) over grams occurring ≥ 2 times — one fold over the
    SORTED gram array (equal grams become runs; run length = count), so
    the whole computation is a per-row codegen-free HOF with no explode/
    shuffle. Pure integer arithmetic ⇒ bit-identical to the Python twin."""

    def close(acc):
        return F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"]).cast("long")
        ).otherwise(_L0())

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["dup"]).otherwise(acc["dup"] + close(acc)).alias("dup"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        _L0().alias("run"),
        _L0().alias("dup"),
    )
    return F.aggregate(
        F.array_sort(grams), init, merge, lambda acc: acc["dup"] + close(acc)
    )


def _top_gram_chars(grams: Column) -> Column:
    """cnt·len(gram) of the most frequent gram (ties: the LONGEST gram —
    the conservative choice, and cnt·len is what the rule consumes so
    equal (cnt, len) ties are value-irrelevant); 0 when the top count is
    < 2 (a gram seen once is not repetition — pinned deviation from
    verbatim Gopher so short docs aren't dropped for having ANY 2-gram).
    Same sorted-run fold as :func:`_dup_gram_chars`."""

    def prev_len(acc):
        return F.coalesce(F.length(acc["prev"]).cast("long"), _L0())

    def closes_better(acc):
        return (acc["run"] > acc["best_cnt"]) | (
            (acc["run"] == acc["best_cnt"]) & (prev_len(acc) > acc["best_len"])
        )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        better = (~same) & closes_better(acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(better, acc["run"]).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, prev_len(acc)).otherwise(acc["best_len"]).alias("best_len"),
        )

    def finish(acc):
        cnt = F.when(closes_better(acc), acc["run"]).otherwise(acc["best_cnt"])
        ln = F.when(closes_better(acc), prev_len(acc)).otherwise(acc["best_len"])
        return F.when(cnt >= 2, cnt * ln).otherwise(_L0())

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        _L0().alias("run"),
        _L0().alias("best_cnt"),
        _L0().alias("best_len"),
    )
    return F.aggregate(F.array_sort(grams), init, merge, finish)


# The 9 Gopher word-n-gram repetition fractions plus the char-level
# diversity ratio (the CJK-route repetition substitute — see
# pipeline/rules.py MIN_CJK_DISTINCT_CHAR_4GRAM_RATIO): all computed in
# the same Arrow pass / the same HOF column set.
CHAR_DIVERSITY_N = 4
REPETITION_KEYS = (
    tuple(f"top_{n}gram_char_frac" for n in TOP_NGRAM_NS)
    + tuple(f"dup_{n}gram_char_frac" for n in DUP_NGRAM_NS)
    + ("distinct_char_4gram_ratio",)
)


def repetition_features_udf():
    """Arrow-vectorized twin of the HOF repetition fold: one pandas UDF
    returning the 9-field repetition struct, computed per batch by
    :func:`py_repetition_features` (Counter over word windows, with the
    monotonicity early-exit). Bit-identical to both the HOF path and the
    oracle by construction — it IS the oracle function.

    Why a UDF in an otherwise-native column set: the 9 sorted-run
    ``aggregate`` folds are interpreted HOFs (never codegen'd) and
    measured 10× slower end-to-end than this Arrow pass
    (pipeline_docs_per_sec_native 66.6k → 6.5k in BENCH_r05) — the same
    lesson the winnowing vectorization quantified at ~1200×
    (functions/analysis.py). The HOF form survives as ``mode='hof'``
    for plan pins and as a genuinely independent second implementation."""
    schema = ", ".join(f"{k} double" for k in REPETITION_KEYS)

    @F.pandas_udf(schema)
    def rep(texts: pd.Series) -> pd.DataFrame:
        s = texts.fillna("")
        # char diversity is the CJK-substitute rule's input — computed
        # only where that rule can consult it (is_cjk docs; 1.0 = not
        # applicable otherwise). The mask re-derives is_cjk from the
        # same script classes the native columns use, so the guard
        # branches identically in every implementation. Measured: the
        # unconditional per-doc set build cost the fused pipeline ~1.5×
        # (121k → 80k docs/s) on a mostly-latin corpus.
        sc = batch_script_symbol_counts(s.tolist())
        n_cjk = sc["n_cjk"]
        is_cjk = n_cjk * 2 > (
            n_cjk + sc["n_latin"] + sc["n_cyr"] + sc["n_greek"]
        )
        toks_list = [py_words(x) for x in s]
        feats = batch_repetition_features(
            toks_list, s.str.len().to_numpy(dtype="int64")
        )
        feats["distinct_char_4gram_ratio"] = [
            py_distinct_char_ngram_ratio(x) if is_cjk[i] else 1.0
            for i, x in enumerate(s)
        ]
        return pd.DataFrame(
            {k: feats[k] for k in REPETITION_KEYS}, columns=list(REPETITION_KEYS)
        )

    return rep


def with_repetition_columns(
    df: DataFrame, text_col: str = "norm_text", mode: str = "arrow"
) -> DataFrame:
    """Gopher §A1.1 repetition features:
    ``top_{2,3,4}gram_char_frac`` (chars covered by the most frequent
    word n-gram / total chars; 0 unless it occurs ≥ 2 times) and
    ``dup_{5..10}gram_char_frac`` (chars in word n-grams occurring ≥ 2
    times / total chars), each capped at 1.0 (overlapping occurrences
    can cover more than n_chars). All counts are exact integers divided
    once ⇒ bit-identical across the two modes and the Python twin
    (py_repetition_features).

    ``mode='arrow'`` (default, the serving shape): one vectorized Arrow
    UDF pass — narrow, no shuffle, ~10× the interpreted-HOF throughput.
    ``mode='hof'``: per-row SQL sorted-run ``aggregate`` folds — no
    Python at all, kept as the independent second implementation and for
    plan pins; NOT a serving path (HOFs bypass codegen)."""
    if mode == "arrow":
        rep = repetition_features_udf()
        df = df.withColumn("_rep", rep(F.col(text_col)))
        for k in REPETITION_KEYS:
            df = df.withColumn(k, F.col("_rep")[k])
        return df.drop("_rep")
    if mode != "hof":
        raise ValueError(f"unknown repetition mode: {mode!r}")
    c = F.col(text_col)
    n_chars = F.length(c)
    w = words(c)
    for nn in TOP_NGRAM_NS:
        frac = F.when(
            n_chars > 0,
            F.least(
                _top_gram_chars(word_ngrams(w, nn)).cast("double") / n_chars,
                F.lit(1.0),
            ),
        ).otherwise(F.lit(0.0))
        df = df.withColumn(f"top_{nn}gram_char_frac", frac)
    for nn in DUP_NGRAM_NS:
        frac = F.when(
            n_chars > 0,
            F.least(
                _dup_gram_chars(word_ngrams(w, nn)).cast("double") / n_chars,
                F.lit(1.0),
            ),
        ).otherwise(F.lit(0.0))
        df = df.withColumn(f"dup_{nn}gram_char_frac", frac)
    from .analysis import script_counts

    sc = script_counts(c)
    total = sc["n_latin"] + sc["n_cjk"] + sc["n_cyrillic"] + sc["n_greek"]
    return df.withColumn(
        "distinct_char_4gram_ratio",
        F.when(sc["n_cjk"] * 2 > total, char_diversity_expr(c)).otherwise(
            F.lit(1.0)
        ),
    )


def char_diversity_udf(n: int = CHAR_DIVERSITY_N):
    """Arrow twin of :func:`char_diversity_expr` (and of the field the
    repetition UDF emits) — the serving-speed form for callers that want
    ONLY the diversity ratio: the SQL form's char-array zip_with chain is
    interpreted (the HOF lesson) and pays per char."""

    @F.pandas_udf("double")
    def div(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [py_distinct_char_ngram_ratio(x, n) for x in texts.fillna("")]
        )

    return div


def char_diversity_expr(c: Column, n: int = CHAR_DIVERSITY_N) -> Column:
    """distinct char n-gram windows / total windows; 1.0 for docs shorter
    than n. SQL form (char array + zip_with grams + array_distinct) —
    interpreted HOFs, so gate/debug only; serving computes it inside the
    repetition Arrow UDF."""
    g = char_ngrams(c, n, reference_pad=False)
    return F.when(
        F.length(c) >= n,
        F.size(F.array_distinct(g)).cast("double") / F.size(g),
    ).otherwise(F.lit(1.0))

# Gopher-style line heuristics — pinned, no trimming, so Spark SQL, the
# Python twin, and the DuckDB oracle evaluate byte-identical predicates.
BULLET_PREFIXES = ("- ", "* ", "•")  # '•' matches with or without space
ELLIPSIS_SUFFIXES = ("...", "…")


# Above this size the stop-word lexicon no longer enters the plan as a
# literal array (a 10k-element literal bloats every serialized plan/task
# and the codegen source) — it ships as DATA in a broadcast one-row
# relation instead (see with_quality_columns).
LEXICON_LITERAL_MAX = 1024


def with_quality_columns(
    df: DataFrame,
    text_col: str = "norm_text",
    stopwords: tuple[str, ...] | None = None,
    repetition_mode: str = "arrow",
) -> DataFrame:
    """Gopher/C4-style heuristic quality features: doc length, word
    stats, symbol ratio, repetition ratio, stop-word fraction,
    bullet/ellipsis line ratios, duplicate-line fraction. Most columns
    are native Spark SQL expressions; the repetition/diversity columns
    go through the vectorized Arrow UDF under the default
    ``repetition_mode='arrow'`` (ADVICE r6 doc fix) — ``mode='hof'`` is
    the all-SQL form.

    Assumes ``text_col`` is already normalized (no leading/trailing ws).
    ``stopwords`` defaults to :data:`..pipeline.rules.DEFAULT_STOPWORDS`
    (the per-fixture-language lexicon). Lexicon transport depends on
    size: up to :data:`LEXICON_LITERAL_MAX` words it enters the plan as
    a literal array (constant-folded, zero join machinery); a
    production-size lexicon (10k+ words) instead rides a ONE-ROW
    broadcast relation cross-joined onto the input — the plan stays free
    of the giant literal and the lexicon ships once per executor via the
    broadcast exchange, exactly like the fused UDF's model broadcast.
    Both transports evaluate the identical ``array_contains`` predicate
    per token ⇒ identical ratios and keep decisions (pinned by
    tests/test_pipeline.py::test_large_lexicon_broadcast_path). The
    per-token membership scan is O(|lexicon|), fine for debugging; at
    serving scale the fused UDF's hash-set lookup is the hot path.

    Perf note: character counting uses ``translate`` (codegen'd, allocation
    light) instead of ``regexp_replace``, and mean word length is derived
    as (non-ws chars)/n_words instead of an interpreted higher-order
    ``aggregate`` over the word array — HOFs are not codegen'd and measured
    as the pipeline's JVM bottleneck at 32 cores. The line/stop-word
    columns do use ``filter`` HOFs: they are keep-rule inputs with tiny
    operand arrays (lines per doc, ≤200 stopwords), and the serving hot
    path computes them in the fused Arrow UDF anyway. Semantics are
    identical to the Python twin ``py_quality_features``.
    """
    if stopwords is None:
        from ..pipeline.rules import DEFAULT_STOPWORDS as stopwords  # lazy: no cycle
    if len(stopwords) <= LEXICON_LITERAL_MAX:
        stop_arr = F.array(*[F.lit(s) for s in stopwords])
    else:
        lex = df.sparkSession.createDataFrame(
            [(list(stopwords),)], "__stop_lex: array<string>"
        )
        # one-row broadcast relation: stream-static-join safe, and the
        # lexicon ships as broadcast data instead of a plan literal
        df = df.crossJoin(F.broadcast(lex))
        stop_arr = F.col("__stop_lex")
    c = F.col(text_col)
    w = words(c)
    n_words = F.size(w)
    non_ws = F.length(F.translate(c, WS_CHARS, ""))
    non_symbol = F.length(F.translate(c, SYMBOL_CHARS, ""))
    lines = F.split(c, "\n")
    n_lines = F.size(lines)  # ≥ 1 always: split('', ...) yields ['']
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t)))
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith(BULLET_PREFIXES[0])
            | l.startswith(BULLET_PREFIXES[1])
            | l.startswith(BULLET_PREFIXES[2]),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda l: l.endswith(ELLIPSIS_SUFFIXES[0])
            | l.endswith(ELLIPSIS_SUFFIXES[1]),
        )
    )
    return (
        df.withColumn("n_chars", F.length(c))
        .withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.when(n_words > 0, non_ws.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "symbol_ratio",
            F.when(
                n_words > 0, (F.length(c) - non_symbol).cast("double") / n_words
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "distinct_word_ratio",
            F.when(n_words > 0, F.size(F.array_distinct(w)).cast("double") / n_words)
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn("bullet_line_ratio", n_bullet.cast("double") / n_lines)
        .withColumn("ellipsis_line_ratio", n_ellipsis.cast("double") / n_lines)
        .withColumn(
            "dup_line_ratio",
            (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
        )
        .transform(lambda d: with_script_columns(d, text_col))
        .transform(lambda d: with_repetition_columns(d, text_col, repetition_mode))
        .drop("__stop_lex")
    )


def with_script_columns(df: DataFrame, text_col: str = "norm_text") -> DataFrame:
    """Script-routing columns (r6): per-script letter counts collapse to
    ``n_cjk`` / ``n_script_letters`` and the ``is_cjk`` majority flag that
    gates the word-based keep rules (pipeline/rules.RULE_GUARDS). Native
    ``regexp_count`` — codegen, fuses into the scan."""
    from .analysis import script_counts

    sc = script_counts(F.col(text_col))
    total = sc["n_latin"] + sc["n_cjk"] + sc["n_cyrillic"] + sc["n_greek"]
    return (
        df.withColumn("n_cjk", sc["n_cjk"])
        .withColumn("n_script_letters", total)
        .withColumn("is_cjk", F.col("n_cjk") * 2 > F.col("n_script_letters"))
    )


# ---------------------------------------------------------------------------
# Python equivalents (oracle + inside pandas UDFs)
# ---------------------------------------------------------------------------
def py_norm(s: str) -> str:
    return s.strip()


def py_words(s: str) -> list[str]:
    if not s:
        return []
    return [t for t in _PY_WS_RE.split(s) if t]


def _default_stopwords() -> tuple[str, ...]:
    from ..pipeline.rules import DEFAULT_STOPWORDS

    return DEFAULT_STOPWORDS


def _py_line_feats(norm: str) -> tuple[int, int, int, int]:
    """(n_lines, n_bullet, n_ellipsis, n_dup) with the pinned no-trim
    predicates (:data:`BULLET_PREFIXES` / :data:`ELLIPSIS_SUFFIXES`)."""
    lines = norm.split("\n")
    n_bullet = sum(1 for l in lines if l.startswith(BULLET_PREFIXES))
    n_ellipsis = sum(1 for l in lines if l.endswith(ELLIPSIS_SUFFIXES))
    return len(lines), n_bullet, n_ellipsis, len(lines) - len(set(lines))


def py_quality_features_batch(norm_series, stopwords: tuple[str, ...] | None = None) -> dict[str, list]:
    """Vectorized batch twin of :func:`py_quality_features` — same integer
    counts, same divisions, so every float is bit-identical to the
    per-doc oracle path. Used by the fused serving UDF.

    Batch form, measured against alternatives at web-doc lengths: char and
    symbol counts are vectorized pandas str ops; tokenization keeps a
    per-row loop — word identity (the ``set()``) is irreducibly per-doc —
    but via ``str.translate`` + ``str.split(' ')`` (all C calls; maximal
    non-ws runs are identical to the ``\\s+`` regex split after mapping
    every ws-class char to ``' '`` and dropping empties), which measured
    ~1.7× faster than both the triple-regex per-doc form it replaces AND a
    fully-pandas ``str.split(regex)`` + explode + groupby-nunique form.
    Integer counts divided identically ⇒ bit-equal floats.
    """
    import numpy as np
    import pandas as pd

    from .analysis import CJK_PY, CYR_PY, GREEK_PY, LATIN_PY

    stopset = frozenset(stopwords if stopwords is not None else _default_stopwords())
    rep_keys = tuple(f"top_{nn}gram_char_frac" for nn in TOP_NGRAM_NS) + tuple(
        f"dup_{nn}gram_char_frac" for nn in DUP_NGRAM_NS
    )
    keys = (
        "n_chars", "n_words", "mean_word_len", "symbol_ratio",
        "distinct_word_ratio", "stopword_ratio", "bullet_line_ratio",
        "ellipsis_line_ratio", "dup_line_ratio",
        "n_cjk", "n_script_letters", "is_cjk", "distinct_char_4gram_ratio",
    ) + rep_keys
    s = pd.Series(norm_series).reset_index(drop=True)
    n = len(s)
    if n == 0:
        return {k: [] for k in keys}
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    sc = batch_script_symbol_counts(s.tolist())
    sym_cnt = sc["n_symbol"]
    n_cjk = sc["n_cjk"]
    n_scripts = n_cjk + sc["n_latin"] + sc["n_cyr"] + sc["n_greek"]
    char_div = np.empty(n, dtype=np.float64)
    n_words = np.empty(n, dtype=np.int64)
    distinct = np.empty(n, dtype=np.int64)
    toklen = np.empty(n, dtype=np.int64)
    stop_cnt = np.empty(n, dtype=np.int64)
    n_lines = np.empty(n, dtype=np.int64)
    bullet = np.empty(n, dtype=np.int64)
    ellipsis = np.empty(n, dtype=np.int64)
    dup = np.empty(n, dtype=np.int64)
    toks_list = []
    for i, x in enumerate(s):
        toks = [w for w in x.translate(_WS_TO_SPACE).split(" ") if w]
        toks_list.append(toks)
        n_words[i] = len(toks)
        distinct[i] = len(set(toks))
        toklen[i] = sum(map(len, toks))
        stop_cnt[i] = sum(1 for t in toks if t in stopset)
        n_lines[i], bullet[i], ellipsis[i], dup[i] = _py_line_feats(x)
        # cjk-guarded like every other implementation (1.0 = the rule
        # that consumes this can never consult it for this doc)
        char_div[i] = (
            py_distinct_char_ngram_ratio(x)
            if n_cjk[i] * 2 > n_scripts[i]
            else 1.0
        )
    # r7: one vectorized pass for the 9 repetition fractions (was a
    # Counter loop per doc per order — 73% of this function's measured
    # cost); value-identical by the batch_repetition_features pin.
    rep = batch_repetition_features(toks_list, n_chars)
    safe = np.maximum(n_words, 1).astype(np.float64)
    has = n_words > 0
    mean_wl = np.where(has, toklen / safe, 0.0)
    sym_ratio = np.where(has, sym_cnt / safe, 0.0)
    dw_ratio = np.where(has, distinct / safe, 0.0)
    stop_ratio = np.where(has, stop_cnt / safe, 0.0)
    nl = n_lines.astype(np.float64)  # ≥ 1 always
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio,
        "distinct_word_ratio": dw_ratio,
        "stopword_ratio": stop_ratio,
        "bullet_line_ratio": bullet / nl,
        "ellipsis_line_ratio": ellipsis / nl,
        "dup_line_ratio": dup / nl,
        "n_cjk": n_cjk,
        "n_script_letters": n_scripts,
        "is_cjk": n_cjk * 2 > n_scripts,
        "distinct_char_4gram_ratio": char_div,
        **rep,
    }


def py_distinct_char_ngram_ratio(s: str, n: int = CHAR_DIVERSITY_N) -> float:
    """distinct char n-gram windows / total windows; 1.0 below n chars.
    Twin of :func:`char_diversity_expr` (exact ints, one division).

    Implementation measured, not assumed: a numpy stride-tricks +
    np.unique-over-record-views variant (the winnowing pattern) ran
    5.7× SLOWER than this plain slice-into-set at 1000-char docs —
    np.unique's structured-dtype sort is generic-comparison, not
    vectorized — so the set stays; exact distinct counting has no
    hash shortcut (collisions would change the count)."""
    total = len(s) - n + 1
    if total <= 0:
        return 1.0
    return len({s[i : i + n] for i in range(total)}) / total


def py_script_features(norm: str) -> dict:
    """Twin of :func:`with_script_columns`."""
    from .analysis import CJK_PY, CYR_PY, GREEK_PY, LATIN_PY

    n_cjk = len(CJK_PY.findall(norm))
    total = (
        n_cjk
        + len(LATIN_PY.findall(norm))
        + len(CYR_PY.findall(norm))
        + len(GREEK_PY.findall(norm))
    )
    return {
        "n_cjk": n_cjk,
        "n_script_letters": total,
        "is_cjk": n_cjk * 2 > total,
    }


def py_quality_features(norm: str, stopwords: tuple[str, ...] | None = None) -> dict[str, float]:
    stopset = frozenset(stopwords if stopwords is not None else _default_stopwords())
    ws = py_words(norm)
    n_words = len(ws)
    n_chars = len(norm)
    mean_wl = (sum(len(t) for t in ws) / n_words) if n_words else 0.0
    sym = len(_PY_SYMBOL_RE.findall(norm))
    n_stop = sum(1 for t in ws if t in stopset)
    n_lines, n_bullet, n_ellipsis, n_dup = _py_line_feats(norm)
    sf = py_script_features(norm)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": (sym / n_words) if n_words else 0.0,
        "distinct_word_ratio": (len(set(ws)) / n_words) if n_words else 0.0,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "bullet_line_ratio": n_bullet / n_lines,
        "ellipsis_line_ratio": n_ellipsis / n_lines,
        "dup_line_ratio": n_dup / n_lines,
        **sf,
        "distinct_char_4gram_ratio": (
            py_distinct_char_ngram_ratio(norm) if sf["is_cjk"] else 1.0
        ),
        **py_repetition_features(ws, n_chars),
    }


def py_repetition_features(toks: list[str], n_chars: int) -> dict[str, float]:
    """Python twin of :func:`with_repetition_columns` over an already-
    tokenized doc: same integer counts, same single division, same 1.0
    cap and same cnt≥2 pin ⇒ bit-identical floats.

    Monotonicity early-exit (r5 serving-cost fix, measured 1.8× on the
    fixture corpus, bit-identical by construction): two equal n-gram
    windows start at two distinct positions, so their (n-1)-prefixes are
    equal windows at those same positions — max window count is
    non-increasing in n. Orders run ascending (2..10) and once NO window
    repeats at some order, every higher order's feature is exactly 0.0
    without building its grams (typical prose dies at order ~3; fully
    repetitive spam still pays all 9 passes, the unavoidable case)."""
    from collections import Counter

    out: dict[str, float] = {}
    if not toks or not n_chars:
        for nn in TOP_NGRAM_NS:
            out[f"top_{nn}gram_char_frac"] = 0.0
        for nn in DUP_NGRAM_NS:
            out[f"dup_{nn}gram_char_frac"] = 0.0
        return out
    join = " ".join
    dead = False  # no window repeated at the previous order
    for nn in sorted(TOP_NGRAM_NS + DUP_NGRAM_NS):
        key = (
            f"top_{nn}gram_char_frac"
            if nn in TOP_NGRAM_NS
            else f"dup_{nn}gram_char_frac"
        )
        if dead or len(toks) < nn:
            out[key] = 0.0
            continue
        counts = Counter(
            join(toks[i : i + nn]) for i in range(len(toks) - nn + 1)
        )
        if nn in TOP_NGRAM_NS:
            cnt, glen = max(
                ((v, len(g)) for g, v in counts.items()), key=lambda t: (t[0], t[1])
            )
            out[key] = min(cnt * glen / n_chars, 1.0) if cnt >= 2 else 0.0
            if cnt < 2:
                dead = True
        else:
            dup = sum(v * len(g) for g, v in counts.items() if v >= 2)
            out[key] = min(dup / n_chars, 1.0)
            if dup == 0:
                dead = True
    return out


def batch_script_symbol_counts(texts) -> dict[str, "np.ndarray"]:
    """Per-doc counts of the four script classes + the symbol class —
    codepoint-range compares over one tiled utf-32 buffer (r7), replacing
    five regex ``str.count`` sweeps. Ranges are EXACTLY the regex
    classes' (CJK U+4E00-9FFF, Latin A-Za-z, Cyrillic U+0400-04FF, Greek
    U+0370-03FF, the 14-char symbol set); pinned equal to the regex form
    by tests/test_misc_ops.py::test_batch_script_counts_match_regex."""
    import numpy as np

    n = len(texts)
    out_keys = ("n_cjk", "n_latin", "n_cyr", "n_greek", "n_symbol")
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    if int(lens.sum()) == 0:
        return {k: np.zeros(n, dtype=np.int64) for k in out_keys}
    big = "".join(texts)
    cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
    # bincount of matching chars' doc index: O(matches) per class after
    # one O(chars) doc-index expansion (a full-buffer cumsum per class
    # measured 5× slower)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

    def seg_counts(mask):
        return np.bincount(doc_idx[mask], minlength=n).astype(np.int64)

    sym_table = np.zeros(129, dtype=bool)
    for c in "#!$%&*+=@^~|<>":
        sym_table[ord(c)] = True
    return {
        "n_cjk": seg_counts((cp >= 0x4E00) & (cp <= 0x9FFF)),
        "n_latin": seg_counts(
            ((cp >= 0x41) & (cp <= 0x5A)) | ((cp >= 0x61) & (cp <= 0x7A))
        ),
        "n_cyr": seg_counts((cp >= 0x0400) & (cp <= 0x04FF)),
        "n_greek": seg_counts((cp >= 0x0370) & (cp <= 0x03FF)),
        "n_symbol": seg_counts(sym_table[np.minimum(cp, 128)]),
    }


def batch_repetition_features(
    toks_list: list[list[str]], n_chars
) -> dict[str, "np.ndarray"]:
    """Whole-batch vectorized twin of :func:`py_repetition_features`
    (r7 serving path): per-word FNV hashes + per-order run-length
    counting over one lexsorted (doc, window-hash) array, instead of a
    Python ``Counter`` per (doc, order).

    Value-identical to the per-doc form (pinned by
    tests/test_misc_ops.py::test_batch_repetition_matches_per_doc): all
    counts and char lengths are exact integers (< 2^53, so the float64
    segment sums are exact regardless of order), the single division and
    the 1.0 cap are the same ops, the top-gram tie-break (max count,
    then max char length) is encoded in one integer score, and the
    ascending-order early-exit ("no window repeats at order k ⇒ all
    higher orders are exactly 0") is applied per doc via an alive mask.
    Window identity is the 64-bit word-hash polynomial — a within-doc
    collision (~10³ windows vs 2^64) is the dedup family's accepted
    transport risk."""
    import numpy as np

    from .wordhash import fnv_token_hashes

    n_docs = len(toks_list)
    keys = list(REPETITION_KEYS[:-1])  # the 9 word-n-gram fractions
    out = {k: np.zeros(n_docs, dtype=np.float64) for k in keys}
    nc = np.asarray(n_chars, dtype=np.int64)
    ntoks = np.fromiter((len(t) for t in toks_list), dtype=np.int64, count=n_docs)
    all_toks: list[str] = []
    for t in toks_list:
        all_toks.extend(t)
    if not all_toks:
        return out
    wlen = np.fromiter((len(w) for w in all_toks), dtype=np.int64, count=len(all_toks))
    wh = fnv_token_hashes(all_toks, lens=wlen)
    doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), ntoks)
    tok_start = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(ntoks[:-1], out=tok_start[1:])
    # cumlen[i] = chars of tokens before global index i (per doc resets
    # handled by subtracting window-start cumlen)
    cumlen = np.concatenate([[0], np.cumsum(wlen)])
    alive = (ntoks > 0) & (nc > 0)
    POLY = np.uint64(1000003)
    for nn in sorted(TOP_NGRAM_NS + DUP_NGRAM_NS):
        key = (
            f"top_{nn}gram_char_frac" if nn in TOP_NGRAM_NS else f"dup_{nn}gram_char_frac"
        )
        has_win = alive & (ntoks >= nn)
        if not has_win.any():
            continue
        counts = np.where(has_win, ntoks - (nn - 1), 0)
        total = int(counts.sum())
        bounds = np.concatenate([[0], np.cumsum(counts)])
        # base = global token index of each window's first word
        base = (
            np.arange(total, dtype=np.int64)
            + np.repeat(tok_start - bounds[:-1], counts)
        )
        with np.errstate(over="ignore"):
            g = wh[base].copy()
            for j in range(1, nn):
                g = g * POLY + wh[base + j]
        wdoc = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        glen = (cumlen[base + nn] - cumlen[base]) + (nn - 1)
        order = np.lexsort((g, wdoc))
        gs, ds, ls = g[order], wdoc[order], glen[order]
        new = np.empty(total, dtype=bool)
        new[0] = True
        np.not_equal(gs[1:], gs[:-1], out=new[1:])
        new[1:] |= ds[1:] != ds[:-1]
        run_cnt = np.diff(np.concatenate([np.flatnonzero(new), [total]]))
        run_doc = ds[new]
        run_len = ls[new]
        if nn in TOP_NGRAM_NS:
            # per-doc max of (cnt, len) as one int score; len < 2^31
            score = run_cnt.astype(np.int64) * (1 << 31) + run_len
            best = np.zeros(n_docs, dtype=np.int64)
            np.maximum.at(best, run_doc, score)
            cnt = best >> 31
            glen_b = best & ((1 << 31) - 1)
            ok = has_win & (cnt >= 2)
            val = np.minimum(
                (cnt * glen_b).astype(np.float64) / np.maximum(nc, 1), 1.0
            )
            out[key][ok] = val[ok]
            alive &= cnt >= 2
        else:
            m = run_cnt >= 2
            dup = np.bincount(
                run_doc[m],
                weights=(run_cnt[m] * run_len[m]).astype(np.float64),
                minlength=n_docs,
            )
            ok = has_win & (dup > 0)
            val = np.minimum(dup / np.maximum(nc, 1), 1.0)
            out[key][ok] = val[ok]
            alive &= dup > 0
    return out


def py_char_ngrams(text: str, n: int, reference_pad: bool = True) -> list[str]:
    t = ("_" * (n - 1) + text + "_") if reference_pad else text
    return [t[i : i + n] for i in range(len(t) - n + 1)]


# Sentence boundary in the Java ∩ RE2 dialect (no lookbehind, which RE2
# lacks): a sentence is a maximal run of non-terminators plus its
# trailing terminator run. Both engines extract the SAME spans with
# regexp_extract_all, so the gate is byte-exact.
SENTENCE_RE = "[^.!?]+[.!?]*"


def sentences(col: Column) -> Column:
    """ARRAY<STRING> of sentences: regexp-extracted terminator-delimited
    spans, space-trimmed, empties dropped. A pinned lightweight splitter
    (the pre-chunking step for RAG/packing pipelines that want sentence
    alignment rather than fixed token strides) — NOT a linguistic
    segmenter: abbreviations ("e.g.") split, by design, identically in
    both engines. Pure codegen (one regexp pass + array HOFs), fuses
    into the scan."""
    return F.filter(
        F.transform(
            F.regexp_extract_all(col, F.lit(SENTENCE_RE), F.lit(0)),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
