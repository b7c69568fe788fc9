"""PII / toxicity scrubber — compiled-regex, byte-identical by construction.

The SAME module (same compiled patterns, same application order) runs in:
- the pure-Python oracle (``oracle/pipeline.py``), and
- the Spark pandas UDF (``pipeline/quality.py``) via :func:`scrub_series`.

so ``scrubbed_text`` is byte-identical per url between the two, satisfying
the north_rule's byte-identity check. Patterns are compiled once at module
import — executors pay compilation once per Python worker process, never
per batch or per row.

No reference counterpart (net-new per BASELINE.json north_star: "compiled
regex PII/toxicity scrubber (emails, phones, IPs, slur lexicon)").
"""

from __future__ import annotations

import re

import pandas as pd

# Fake slur lexicon: synthetic placeholder tokens (see fixtures/pages.py).
# A real deployment swaps this tuple for a curated lexicon; the machinery
# (word-boundary alternation, pinned order) is identical.
SLUR_LEXICON = ("grobnak", "zilftwerp", "quvvorn")

# Application order is part of the contract: email → phone → ip → slur.
SCRUB_RULES: list[tuple[re.Pattern, str]] = [
    (
        re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
        "<EMAIL>",
    ),
    (
        re.compile(r"\+?\d{1,3}[-.]\d{3}[-.]\d{3,4}(?:[-.]\d{4})?"),
        "<PHONE>",
    ),
    (
        re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
        "<IP>",
    ),
    (
        re.compile(r"\b(?:" + "|".join(map(re.escape, SLUR_LEXICON)) + r")\b", re.IGNORECASE),
        "<TOX>",
    ),
]


def scrub_text(s: str) -> str:
    """Scrub one string (oracle path)."""
    for pat, repl in SCRUB_RULES:
        s = pat.sub(repl, s)
    return s


def scrub_series(s: pd.Series) -> pd.Series:
    """Vectorized scrub over an Arrow batch (Spark pandas-UDF path).

    pandas ``str.replace`` dispatches to the same ``re`` engine as
    :func:`scrub_text`, so outputs are byte-identical.
    """
    for pat, repl in SCRUB_RULES:
        s = s.str.replace(pat, repl, regex=True)
    return s


def pii_hit_count(s: str) -> int:
    """Number of PII/toxicity matches in a string (metrics column)."""
    return sum(len(pat.findall(s)) for pat, _ in SCRUB_RULES)


# --- native (JVM codegen) twin -------------------------------------------
#
# The pandas-UDF path above exists for the north rule's byte-identity
# contract with the pure-Python oracle. At 100 TB the scrub should not
# leave the JVM at all: every SCRUB_RULES pattern happens to sit in the
# common subset of Python re, Java regex (Spark), and RE2 (DuckDB) —
# ASCII \d/\b, no lookaround, no backrefs — so the same chain compiles
# to whole-stage-codegen `regexp_replace` and fuses into the page scan.
# Cross-engine identity is pinned three ways: native-vs-pandas-UDF on the
# fixture (test_misc_ops), and the FULL `pii_scrub` driver gate whose
# DuckDB oracle is generated from the SAME pattern constants below.

def _native_rules() -> list[tuple[str, str]]:
    """(pattern, replacement) pairs as plain strings, in contract order —
    the single source the Spark chain AND the DuckDB oracle build from.
    The slur rule carries its IGNORECASE as an inline (?i) flag."""
    out = []
    for pat, repl in SCRUB_RULES:
        p = pat.pattern
        if pat.flags & re.IGNORECASE:
            p = "(?i)" + p
        out.append((p, repl))
    return out


def scrub_native(col):
    """Native `regexp_replace` chain identical to :func:`scrub_text` /
    :func:`scrub_series` — the JVM fast path (zero Python in the plan).
    Null text passes through as null, matching SQL semantics."""
    from pyspark.sql import functions as F

    for p, repl in _native_rules():
        col = F.regexp_replace(col, p, repl)
    return col


def pii_hits_native(col):
    """Native match count twin of :func:`pii_hit_count`: sum of
    per-rule `regexp_count` over the ORIGINAL text (each rule counts the
    raw input, same as pii_hit_count's findall-per-rule — replacements
    do not cascade into later rules' counts for these disjoint
    patterns)."""
    from pyspark.sql import functions as F

    total = F.lit(0)
    for p, _ in _native_rules():
        total = total + F.regexp_count(col, F.lit(p))
    return total


def oracle_sql_exprs(text_expr: str) -> tuple[str, str]:
    """DuckDB twins of :func:`scrub_native` / :func:`pii_hits_native`
    over ``text_expr``, generated from the same pattern constants."""
    s = text_expr
    hits = []
    for p, repl in _native_rules():
        pq = p.replace("'", "''")
        rq = repl.replace("'", "''")
        hits.append(
            f"length(regexp_split_to_array({text_expr}, '{pq}')) - 1"
        )
        s = f"regexp_replace({s}, '{pq}', '{rq}', 'g')"
    return s, " + ".join(hits)
