"""HTML → text extraction — the WARC step of the target schema.

The ``input_hint`` pins the input table as Common-Crawl-style pages with
``html BINARY`` alongside ``text STRING``, and the north rule's per-row
invariant is "byte-identical extracted text per url": at 100 TB the
``text`` column does not arrive by magic — something must derive it from
the fetched bytes deterministically, or no two runs (and no
reference-vs-target comparison) can agree byte-for-byte. This module is
that something, kept deliberately minimal and PINNED (a full html5
parser is neither deterministic across library versions nor expressible
in SQL; a pinned regexp chain is both).

Net-new operator (the reference ingests a pre-extracted CSV and never
sees markup; the task brief's web-pipeline framing requires the step).

Everything here is native ``regexp_replace``/``regexp_extract`` over the
UTF-8-decoded bytes — whole-stage codegen, zero Python, safely fused
into any scan (same tier as functions/normalize.strip_control_chars).
Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB) — inline ``(?is)`` flags, lazy quantifiers, no backrefs —
so the ``html_extract`` gate is a FULL byte-identical DuckDB twin.

Extraction spec (pinned, in order):

1. decode bytes as UTF-8;
2. drop ``<head>``/``<script>``/``<style>`` ELEMENTS (tag + content —
   head metadata, code and CSS are not text; ``html_title`` reads the
   raw bytes separately) and ``<!-- comments -->``, non-greedy,
   case-insensitive, dot-matches-all;
3. structural separators become newlines: ``<br>``/``<hr>`` (any
   self-closing form) and the CLOSE of p/div/li/tr/h1-6/ul/ol/table/
   blockquote — so block boundaries survive tag stripping as line
   boundaries (the Gopher line rules and boilerplate line dedup key on
   them);
4. every remaining tag is dropped;
5. the five ubiquitous named entities decode (``&lt; &gt; &quot;
   &#39; &nbsp;``), then ``&amp;`` LAST — decoding it earlier would
   double-decode ``&amp;lt;`` into ``<``;
6. strip LEADING/TRAILING whitespace (explicit ``[ \\t\\r\\n]`` class:
   SQL ``trim`` strips only spaces, and Java's ``\\s`` and RE2's ``\\s``
   disagree on vertical tab — the explicit class is identical in both
   engines). No interior whitespace collapsing: text content passes
   through byte-identical (round-trip pinned by
   tests/test_misc_ops.py::test_html_roundtrip_fixture).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Element subtrees that must vanish entirely (content is code, not
# text). One pattern per element, NOT a captured alternation with a
# ``</\1>`` backreference: RE2 (the DuckDB side) has no backreferences.
_DROP_HEAD = r"(?is)<head\b[^>]*>.*?</head\s*>"
_DROP_SCRIPT = r"(?is)<script\b[^>]*>.*?</script\s*>"
_DROP_STYLE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENTS = r"(?s)<!--.*?-->"
# Tags whose presence means "line break here" once markup is gone.
_STRUCTURAL = r"(?i)<(?:br|hr)\s*/?\s*>|</(?:p|div|li|tr|h[1-6]|ul|ol|table|blockquote)\s*>"
_ANY_TAG = r"(?s)<[^>]*>"
_EDGE_WS = r"^[ \t\r\n]+|[ \t\r\n]+$"

# (pattern, replacement) pairs, applied in order; &amp; is LAST.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(html_bin: Column) -> Column:
    """Extracted text from an ``html BINARY`` column per the module spec —
    native codegen end to end. Deterministic: same bytes, same text,
    every run, both engines."""
    s = F.decode(html_bin, "UTF-8")
    s = F.regexp_replace(s, _DROP_HEAD, "")
    s = F.regexp_replace(s, _DROP_SCRIPT, "")
    s = F.regexp_replace(s, _DROP_STYLE, "")
    s = F.regexp_replace(s, _COMMENTS, "")
    s = F.regexp_replace(s, _STRUCTURAL, "\n")
    s = F.regexp_replace(s, _ANY_TAG, "")
    for pat, repl in _ENTITIES:
        s = F.regexp_replace(s, pat, repl)
    return F.regexp_replace(s, _EDGE_WS, "")


def html_title(html_bin: Column) -> Column:
    """The first ``<title>`` element's text, entity-decoded and trimmed;
    ``''`` when absent (regexp_extract's no-match value, kept as-is so
    the column stays non-null for grouping)."""
    s = F.regexp_extract(
        F.decode(html_bin, "UTF-8"), r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1
    )
    for pat, repl in _ENTITIES:
        s = F.regexp_replace(s, pat, repl)
    return F.regexp_replace(s, _EDGE_WS, "")


def oracle_sql_exprs(html_expr: str) -> tuple[str, str]:
    """The DuckDB twins of :func:`html_to_text` / :func:`html_title` over
    ``html_expr`` (a SQL expression of type BLOB), built from the SAME
    pattern constants so the two engines cannot drift: the gate's oracle
    calls this instead of repeating the chain by hand."""
    s = f"decode({html_expr})"
    for pat, repl in [
        (_DROP_HEAD, ""),
        (_DROP_SCRIPT, ""),
        (_DROP_STYLE, ""),
        (_COMMENTS, ""),
        (_STRUCTURAL, "\n"),
        (_ANY_TAG, ""),
    ] + _ENTITIES:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''").replace("\n", "' || chr(10) || '")
        s = f"regexp_replace({s}, '{p}', '{r}', 'g')"
    text = f"regexp_replace({s}, '{_EDGE_WS}', '', 'g')"
    t = f"regexp_extract(decode({html_expr}), '(?is)<title\\b[^>]*>(.*?)</title\\s*>', 1)"
    for pat, repl in _ENTITIES:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        t = f"regexp_replace({t}, '{p}', '{r}', 'g')"
    title = f"regexp_replace({t}, '{_EDGE_WS}', '', 'g')"
    return text, title
