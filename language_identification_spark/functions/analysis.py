"""Text-analysis columns for training-data pipelines (net-new, task brief):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All native Spark SQL (whole-stage codegen; zero Python). Each has an exact
DuckDB twin in ``__spark_entry__.oracle_sql`` — the cross-engine semantics
below were probed empirically:
- ``split(text,'')``  == DuckDB ``string_split(text,'')`` (per-char, no
  trailing empty)
- ``ascii(c)``        == codepoint in both engines
- ``regexp_count``    == ``length(regexp_extract_all(...))``
- integer arithmetic identical ⇒ the rolling-hash fingerprint matches
  bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs | digit runs | single non-alnum non-space.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"
FINGERPRINT_MOD = 1_000_000_007

# Unicode script ranges, written as literal char ranges so the same class
# string works in both Java regex (Spark) and RE2 (DuckDB, via \x{...}).
CJK_SPARK, CJK_DUCK = "[一-鿿]", "[\\x{4e00}-\\x{9fff}]"
CYR_SPARK, CYR_DUCK = "[Ѐ-ӿ]", "[\\x{0400}-\\x{04ff}]"
GREEK_SPARK, GREEK_DUCK = "[Ͱ-Ͽ]", "[\\x{0370}-\\x{03ff}]"

# Python twins of the same ranges (shared by the oracle and the fused UDF
# so counts are identical by construction).
import re as _re

CJK_PY = _re.compile("[一-鿿]")
CYR_PY = _re.compile("[Ѐ-ӿ]")
GREEK_PY = _re.compile("[Ͱ-Ͽ]")
LATIN_PY = _re.compile("[A-Za-z]")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(col) == 0, F.lit(0)).otherwise(
        F.size(F.split(col, "[ \\t\\n]+"))
    )


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count (letter runs / digit runs / single symbols)."""
    return F.regexp_count(col, F.lit(BPE_REGEX))


def doc_fingerprint_sql(col: Column) -> Column:
    """All-SQL rolling-hash fold — the oracle-twin reference form (the
    DuckDB twin is the same list_reduce); interpreted per char, so the
    serving path is :func:`doc_fingerprint` (value-identical, pinned by
    tests/test_misc_ops.py::test_doc_fingerprint_udf_matches_sql)."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def doc_fingerprint(col: Column) -> Column:
    """Deterministic rolling-hash fingerprint: fold (acc*31 + codepoint)
    mod 1e9+7 over the characters. Same value in DuckDB via list_reduce.

    r7: computed in ``max_doc_len`` masked numpy rounds per Arrow batch —
    the SQL ``aggregate`` HOF evaluated an interpreted lambda per
    character. Exact: acc < 1e9+7 ⇒ acc*31 + cp < 2^63. NULL text stays
    NULL (the SQL form's propagation). Non-deterministic mark per guide
    §4.4 (pure function; prevents filter-pushdown double evaluation)."""
    @F.pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        n = len(texts)
        isnull = np.fromiter(
            (not isinstance(t, str) for t in texts), dtype=bool, count=n
        )
        lens = np.fromiter(
            (len(t) if isinstance(t, str) else 0 for t in texts),
            dtype=np.int64, count=n,
        )
        out = np.zeros(n, dtype=np.int64)
        if int(lens.sum()) > 0:
            big = "".join(t if isinstance(t, str) else "" for t in texts)
            cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            # length-descending order: the docs still active at char
            # position p are a contiguous PREFIX — per-position work is
            # two slice ops, not an O(n) boolean mask
            order = np.argsort(-lens, kind="stable")
            ls = lens[order]
            ss = starts[order]
            acc = np.zeros(n, dtype=np.int64)
            neg = -ls
            for p in range(int(ls[0]) if n else 0):
                k = int(np.searchsorted(neg, -(p + 1), side="right"))
                if k == 0:
                    break
                acc[:k] = (acc[:k] * 31 + cp[ss[:k] + p]) % FINGERPRINT_MOD
            out[order] = acc
        res = pd.Series(out)
        res[isnull] = None
        return res

    return fp.asNondeterministic()(col)


def script_counts(col: Column) -> dict[str, Column]:
    return {
        "n_cjk": F.regexp_count(col, F.lit(CJK_SPARK)),
        "n_cyrillic": F.regexp_count(col, F.lit(CYR_SPARK)),
        "n_greek": F.regexp_count(col, F.lit(GREEK_SPARK)),
        "n_latin": F.regexp_count(col, F.lit("[A-Za-z]")),
    }


def lang_guess_script(col: Column) -> Column:
    """Cheap script-based language bucket — the SQL-only langid heuristic
    (the statistical models are the real classifiers; this is the
    pre-filter you'd run before them at 100 TB)."""
    sc = script_counts(col)
    n = F.greatest(F.length(col), F.lit(1))
    return (
        F.when(sc["n_cjk"] * 100 / n > 10, F.lit("cjk"))
        .when(sc["n_cyrillic"] * 100 / n > 30, F.lit("cyrillic"))
        .when(sc["n_greek"] * 100 / n > 30, F.lit("greek"))
        .when(sc["n_latin"] * 100 / n > 30, F.lit("latin"))
        .otherwise(F.lit("other"))
    )


def _quality_counts_udf():
    """(n_alpha, n_space, n_symbol) counts per doc — codepoint-range
    compares over one tiled utf-32 buffer per Arrow batch (r7): the
    regexp_count form paid three Java-regex sweeps per evaluation, and
    the percentile gates evaluate the score twice (threshold agg + the
    broadcast-join CASE). Ranges are EXACTLY the regex classes'
    (A-Za-z, U+00C0-00FF, U+0410-044F, U+0391-03C9, U+4E00-9FFF; the
    14-char symbol set; the single space) — pinned equal by
    tests/test_misc_ops.py::test_quality_score_udf_matches_regex.
    Non-deterministic mark: pushed-down filters must not duplicate the
    evaluation (guide §4.4); the function is pure."""
    state: dict = {}

    @F.pandas_udf("n_alpha int, n_space int, n_symbol int")
    def counts(texts: pd.Series) -> pd.DataFrame:
        n = len(texts)
        lens = np.fromiter(
            (len(t) if isinstance(t, str) else 0 for t in texts), dtype=np.int64, count=n
        )
        if int(lens.sum()) == 0:
            z = np.zeros(n, dtype=np.int32)
            return pd.DataFrame({"n_alpha": z, "n_space": z, "n_symbol": z})
        big = "".join(t if isinstance(t, str) else "" for t in texts)
        cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        alpha = (
            ((cp >= 0x41) & (cp <= 0x5A))
            | ((cp >= 0x61) & (cp <= 0x7A))
            | ((cp >= 0xC0) & (cp <= 0xFF))
            | ((cp >= 0x410) & (cp <= 0x44F))
            | ((cp >= 0x391) & (cp <= 0x3C9))
            | ((cp >= 0x4E00) & (cp <= 0x9FFF))
        )
        if "sym" not in state:
            t = np.zeros(129, dtype=bool)
            for c in "#!$%&*+=@^~|<>":
                t[ord(c)] = True
            state["sym"] = t
        sym = state["sym"][np.minimum(cp, 128)]

        def seg(mask):
            return np.bincount(doc_idx[mask], minlength=n).astype(np.int32)

        return pd.DataFrame(
            {
                "n_alpha": seg(alpha),
                "n_space": seg(cp == 0x20),
                "n_symbol": seg(sym),
            }
        )

    return counts.asNondeterministic()


def quality_score(col: Column) -> Column:
    """[0,1] heuristic quality score: alpha-char ratio, word-shape, and
    punctuation balance. Counts come from one vectorized Arrow pass
    (r7 — see :func:`_quality_counts_udf`); the ratio arithmetic and the
    HALF_UP round stay JVM expressions, so every emitted double equals
    the previous all-regexp form's."""
    c = _quality_counts_udf()(col)
    n = F.greatest(F.length(col), F.lit(1)).cast("double")
    alpha_ratio = c["n_alpha"] / n
    space_ratio = c["n_space"] / n
    symbol_ratio = c["n_symbol"] / n
    score = alpha_ratio * 0.6 + F.least(space_ratio * 4, F.lit(1.0)) * 0.3 + (1 - F.least(symbol_ratio * 10, F.lit(1.0))) * 0.1
    out = F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 6)
    # NULL text: the regexp_count form's null ratios fall through the
    # null-IGNORING least/greatest pair to exactly 1.0 — replicated
    return F.when(col.isNotNull(), out).otherwise(F.lit(1.0))


def script_mixing(col: Column) -> dict[str, Column]:
    """Per-doc script-mixing profile — the mixed-script spam signal
    (keyword-stuffed / homoglyph-obfuscated pages mix scripts; genuine
    prose is script-dominant). Columns: the four script letter counts,
    their total, the dominant script (ties broken in the fixed order
    latin > cjk > cyrillic > greek — the SAME CASE order as the DuckDB
    twin so the argmax cannot drift), its fraction (round 6; 0.0 for
    scriptless docs, dominant 'none'), and ``is_mixed`` = letters exist
    but the dominant script holds < 90 %.

    All native ``regexp_count`` — one codegen pass, no shuffle, fuses
    into the scan like the other quality columns."""
    sc = script_counts(col)
    n_latin, n_cjk = sc["n_latin"], sc["n_cjk"]
    n_cyr, n_greek = sc["n_cyrillic"], sc["n_greek"]
    mx = F.greatest(n_latin, n_cjk, n_cyr, n_greek)
    dominant = (
        F.when(mx == 0, F.lit("none"))
        .when(n_latin == mx, F.lit("latin"))
        .when(n_cjk == mx, F.lit("cjk"))
        .when(n_cyr == mx, F.lit("cyrillic"))
        .otherwise(F.lit("greek"))
    )
    frac = F.when(mx == 0, F.lit(0.0)).otherwise(
        F.round(mx.cast("double") / (n_latin + n_cjk + n_cyr + n_greek), 6)
    )
    return {
        "n_latin": n_latin,
        "n_cjk": n_cjk,
        "n_cyrillic": n_cyr,
        "n_greek": n_greek,
        "n_script_total": n_latin + n_cjk + n_cyr + n_greek,
        "dominant_script": dominant,
        "dominant_frac": frac,
        "is_mixed": (mx > 0) & (mx * 10 < (n_latin + n_cjk + n_cyr + n_greek) * 9),
    }


# Winnowing (Schleimer et al. 2003, the MOSS fingerprinting scheme):
# positions are packed under the hash so one BIGINT min per window picks
# (min hash, then RIGHTMOST position — the paper's density rule) with
# pure integer arithmetic both engines share. h < 1e9+7 and pos < 2^31,
# so h*2^31 + offset stays far inside BIGINT.
WINNOW_POS_SHIFT = 1 << 31


def winnow_fingerprints(col: Column, k: int = 5, w: int = 4) -> Column:
    """ARRAY<STRUCT<pos, fp>> — winnowing document fingerprints: the
    rolling k-gram hash minimum of every w-window, deduplicated. The
    local-fingerprint guarantee: any shared substring of length
    >= w+k-1 between two documents yields at least one IDENTICAL
    (pos-relative fp) selection in both, so matching fingerprints
    localize copied spans (doc_fingerprint's whole-doc hash can only
    say "same doc").

    Vectorized Arrow-batched numpy (the simhash/minhash-signature
    pattern): codepoints via utf-32 reinterpret, the k-gram rolling
    hash as k whole-array Horner rounds over shifted views, window
    minima via a stride-tricks sliding view — O(n·(k+1)) C-speed ops
    per doc, no per-char Python. The first cut was "zero-Python"
    Catalyst HOFs (nested transform/aggregate/slice); being
    INTERPRETED expression trees they measured ~1200x slower at bench
    scale (3656 s for the sf0.1 gate slice vs ~3 s for this form) —
    HOFs do not reach whole-stage codegen, so "native" is not "fast"
    for per-character work. Still zero shuffle; fuses into any scan.

    Hash/tie semantics are unchanged and cross-engine: (acc*31+cp) mod
    1e9+7 (as in doc_fingerprint), per-window min with the paper's
    rightmost tie-break via pos-packed encodes (h*2^31 + (2^31-1-pos);
    int64-exact). The FULL ``winnowing`` gate's DuckDB twin recomputes
    the identical integer pipeline in list ops. Docs shorter than k
    fingerprint to []; docs with fewer than w k-grams yield the single
    global minimum (one window)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    mod = np.int64(FINGERPRINT_MOD)
    shift = np.int64(WINNOW_POS_SHIFT)

    @F.pandas_udf("array<struct<pos:bigint,fp:bigint>>")
    def wf(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        out = []
        for t in texts:
            if t is None or len(t) < k:
                out.append([])
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            m = len(cp) - k + 1
            h = np.zeros(m, dtype=np.int64)
            for j in range(k):
                h = (h * 31 + cp[j : j + m]) % mod
            enc = h * shift + (shift - 1 - np.arange(m, dtype=np.int64))
            if m <= w:
                sel = enc.min(keepdims=True)
            else:
                sel = np.unique(sliding_window_view(enc, w).min(axis=1))
            pos = (shift - 1 - (sel % shift)).tolist()
            fp = (sel >> np.int64(31)).tolist()
            out.append(
                [{"pos": int(p_), "fp": int(f_)} for p_, f_ in zip(pos, fp)]
            )
        return pd.Series(out)

    return wf(col)
