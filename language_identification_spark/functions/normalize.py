"""Unicode normalization + entropy-style quality signals — the text
canonicalization pass every web pipeline runs BEFORE tokenization,
hashing, or model featurization (CCNet and the fastText langid tooling
both NFC-normalize; skipping it makes byte-keyed dedup and char-n-gram
models treat ``é`` (U+00E9) and ``e``+U+0301 as different documents).

Net-new operators (task brief's training-data-pipeline family; the
reference's fixture corpus is ASCII-clean and needs neither).

Three functions, each in its fastest honest tier:
- :func:`strip_control_chars` — native ``regexp_replace`` (whole-stage
  codegen, zero Python);
- :func:`nfc_text` — Unicode NFC via an Arrow-batched pandas UDF
  (``unicodedata.normalize`` has no Spark SQL builtin; the UDF is
  per-batch Python over Arrow transfer, not per-row pickling). Verified
  byte-identical to DuckDB's ``nfc_normalize`` (FULL ``unicode_normalize``
  gate) — both implement UAX #15 canonical composition;
- :func:`compression_ratio` — zlib bytes-out/bytes-in per document
  (the Dolma/RedPajama repetitive-spam signal: highly compressible docs
  are boilerplate/spam; incompressible ones are often binary junk).
  No SQL engine exposes zlib, so the gate is rows/schema and the value
  is pinned in pytest against the same zlib from driver Python
  (tests/test_misc_ops.py::test_compression_ratio_values).

Scale notes: all three are per-row map work — no shuffle, safely fused
into any scan. The pandas UDFs keep Spark's default Arrow batching
(~10k rows); memory per batch is bounded by batch_size × doc length,
the same envelope as the serving scorers.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

# C0 controls minus \t \n \r, plus DEL. Keeping the three whitespace
# controls preserves the line structure the boilerplate/Gopher line
# rules key on.
_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def strip_control_chars(col: Column) -> Column:
    """Remove C0 control characters (except tab/newline/CR) and DEL —
    native codegen regexp, byte-identical to the DuckDB twin's
    ``regexp_replace(..., 'g')``."""
    return F.regexp_replace(col, _CONTROL_CLASS, "")


@F.pandas_udf(StringType())
def nfc_text(s: pd.Series) -> pd.Series:
    """Unicode NFC (canonical composition) per document."""
    import unicodedata

    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


@F.pandas_udf(DoubleType())
def compression_ratio(s: pd.Series) -> pd.Series:
    """``len(zlib.compress(utf8))/len(utf8)`` per document, level 6,
    rounded to 6 places; empty/null docs -> 0.0. Low ratio = repetitive
    boilerplate, ratio near/above 1 = high-entropy junk; typical prose
    sits ~0.3-0.6 (the caller picks keep bounds, same
    candidates-not-verdicts discipline as the other quality signals)."""

    def ratio(t):
        if not t:
            return 0.0
        b = t.encode("utf-8")
        return round(len(zlib.compress(b, 6)) / len(b), 6)

    return s.map(ratio)


def normalize_text(col: Column) -> Column:
    """The composed canonicalization pass: control-strip, then NFC.
    Order matters and is pinned: control chars are ASCII and NFC-inert,
    stripping first keeps the UDF's input smaller."""
    return nfc_text(strip_control_chars(col))


# The two-codepoint signature of UTF-8 bytes mis-decoded as Latin-1: a
# lead-byte codepoint (U+00C2-U+00F4, the valid UTF-8 lead bytes for
# 2..4-byte sequences) immediately followed by a continuation-byte
# codepoint (U+0080-U+00BF). Genuine prose essentially never pairs these
# (the continuation range is Latin-1 Supplement controls/signs), and
# every mis-decoded multi-byte character produces exactly one such pair
# at its head. Built from \\u escapes so the source stays ASCII; the
# materialized pattern contains literal codepoints, a class syntax
# shared by Java regex and RE2 — the SAME constant is interpolated into
# the DuckDB oracle (mojibake_detect gate), so the two engines cannot
# drift.
MOJIBAKE_CLASS = "[\u00c2-\u00f4][\u0080-\u00bf]"


def mojibake_count(col: Column) -> Column:
    """Native (whole-stage-codegen) count of mojibake lead/continuation
    pairs — one per mis-decoded character, 0 on clean text. The
    detection signal; pair with :func:`fix_mojibake` to repair."""
    return F.regexp_count(col, F.lit(MOJIBAKE_CLASS))


@F.pandas_udf(StringType())
def fix_mojibake(s: pd.Series) -> pd.Series:
    """Repair UTF-8-mis-decoded-as-Latin-1 text (ftfy's core trick):
    while the text shows the mojibake signature AND maps back to bytes
    via Latin-1 AND those bytes are valid UTF-8, re-decode. At most 3
    rounds (double-encoded mojibake needs 2; deeper nesting is
    vanishingly rare and the bound keeps the UDF O(1) per doc). Anything
    failing any of the three conditions is returned unchanged — the
    function never corrupts clean text: genuine non-Latin-1 text can't
    encode, genuine Latin-1 prose is almost never valid UTF-8, and
    ASCII is a fixed point of the round trip.

    Arrow-batched pandas UDF (no SQL engine can do the encode/decode
    round trip); the FULL ``mojibake_fix`` gate checks it INVERTS the
    independent planting function utf8-encode -> latin1-decode."""
    import re

    pat = re.compile(MOJIBAKE_CLASS)

    def fix(t):
        if t is None:
            return None
        for _ in range(3):
            if not pat.search(t):
                break
            try:
                b = t.encode("latin-1")
            except UnicodeEncodeError:
                break
            try:
                t2 = b.decode("utf-8")
            except UnicodeDecodeError:
                break
            if t2 == t:
                break
            t = t2
        return t

    return s.map(fix)
