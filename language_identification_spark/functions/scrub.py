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
