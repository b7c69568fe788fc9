"""Distributed model training as DataFrame groupBy-aggregate pipelines.

Each trainer turns a reference model's dict-building loop into ONE shuffle
(explode → hash-aggregate → window-normalize), replacing the reference's
O(L·N) per-language scans (/root/reference/src/models/statistical_models.py:19
"for label in unique_labels: [t for t,l in zip(...) if l==label]").

Model tables are small (≤ a few hundred thousand rows) and are collected +
broadcast for serving; at 100 TB the *training* input is the big side and
these plans keep it to a single pass.

Smoothing quirk replicated exactly (SURVEY.md §2.3 A3): the reference's
``defaultdict(lambda: smoothing)`` means every *seen* key carries
``count + smoothing`` and the normalization total gains one ``smoothing``
per distinct key ⇒ prob = (cnt + s) / (Σcnt + s·|keys|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.ngramcount import char_ngram_counts
from ..oracle.reference import ct_profile

NGRAM_SMOOTHING = 1e-8   # statistical_models.py:8
CHARFREQ_SMOOTHING = 1e-10  # statistical_models.py:52
MARKOV_SMOOTHING = 1e-10    # statistical_models.py:102
DUNNING_SMOOTHING = 0.5     # lieterature.py:61


def train_ngram_lm(
    df: DataFrame, n: int = 1, smoothing: float = NGRAM_SMOOTHING,
    text_col: str = "text", lang_col: str = "lang",
) -> DataFrame:
    """(lang, ngram, prob) — char n-gram LM (statistical_models.py:14-32).

    Counts via the vectorized partial-count pass (functions/ngramcount,
    r7): exact integer totals identical to the explode → groupBy form,
    so the normalized probabilities are bit-identical."""
    counts = char_ngram_counts(
        df.select(F.col(lang_col).alias("lang"), F.col(text_col).alias("text")),
        n, key_col="lang", lower=False, pad=True,
    )
    w = Window.partitionBy("lang")
    total = F.sum("cnt").over(w) + F.lit(smoothing) * F.count("*").over(w)
    return counts.select(
        "lang", "ngram", ((F.col("cnt") + F.lit(smoothing)) / total).alias("prob")
    )


def train_char_freq(
    df: DataFrame, smoothing: float = CHARFREQ_SMOOTHING,
    text_col: str = "text", lang_col: str = "lang",
) -> DataFrame:
    """(lang, char, prob) — lowercased char profile (statistical_models.py:57-74)."""
    counts = char_ngram_counts(
        df.select(F.col(lang_col).alias("lang"), F.col(text_col).alias("text")),
        1, key_col="lang", lower=True, pad=False, gram_col="char",
    )
    w = Window.partitionBy("lang")
    total = F.sum("cnt").over(w) + F.lit(smoothing) * F.count("*").over(w)
    return counts.select(
        "lang", "char", ((F.col("cnt") + F.lit(smoothing)) / total).alias("prob")
    )


def train_markov(
    df: DataFrame, smoothing: float = MARKOV_SMOOTHING,
    text_col: str = "text", lang_col: str = "lang",
) -> DataFrame:
    """(lang, cur, nxt, prob) — transition LM, normalized per (lang, cur)
    (statistical_models.py:107-129). Padding is '_text_' (n=2 grams of the
    single-underscore-padded text)."""
    padded = F.concat(F.lit("_"), F.col(text_col), F.lit("_"))
    # a bigram string IS its (cur, nxt) pair, so per-(lang, bigram)
    # counts are per-(lang, cur, nxt) counts — split on the SMALL count
    # table, not per occurrence
    counts = char_ngram_counts(
        df.select(F.col(lang_col).alias("lang"), padded.alias("text")),
        2, key_col="lang", lower=False, pad=False, gram_col="bg",
    ).select(
        "lang",
        F.substring("bg", 1, 1).alias("cur"),
        F.substring("bg", 2, 1).alias("nxt"),
        "cnt",
    )
    w = Window.partitionBy("lang", "cur")
    total = F.sum("cnt").over(w) + F.lit(smoothing) * F.count("*").over(w)
    return counts.select(
        "lang", "cur", "nxt",
        ((F.col("cnt") + F.lit(smoothing)) / total).alias("prob"),
    )


def train_cavnar_trenkle(
    df: DataFrame, max_profile_size: int = 400,
    text_col: str = "text", lang_col: str = "lang", order_col: str = "doc_idx",
    max_chars_per_lang: int | None = None,
) -> DataFrame:
    """(lang, ngram, cnt, rank) — top-400 1..5-gram rank profile.

    The reference trains on the ' '-joined concatenation of a language's
    texts *in dataset order* (lieterature.py:28), so cross-document n-grams
    exist and order matters — inherently sequential per language. We
    distribute per-language with ``applyInPandas`` (one group per lang;
    profiles are tiny) and reuse the oracle's ``ct_profile`` for exactness.

    ``max_chars_per_lang`` is the SCALE mode: exact concatenation puts a
    whole language's corpus in one executor's Python string (at web scale
    "English" is half the corpus — OOM by design), so the bounded mode
    keeps only the deterministic dataset-order PREFIX of each language up
    to the char budget before concatenating (a cumulative-length window;
    the first document always survives). Rank profiles saturate quickly —
    top-400 n-grams of a few MB of text match the full-corpus profile in
    practice — and ``None`` keeps the exact reference semantics.
    """
    if max_chars_per_lang is not None:
        w = (
            Window.partitionBy(lang_col)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prior = F.coalesce(F.sum(F.length(text_col)).over(w), F.lit(0))
        df = (
            df.withColumn("_prior_chars", prior)
            .filter(F.col("_prior_chars") < max_chars_per_lang)
            .drop("_prior_chars")
        )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col)
        combined = " ".join(pdf[text_col].tolist())
        prof = ct_profile(combined, max_profile_size)
        return pd.DataFrame(
            {
                "lang": pdf[lang_col].iloc[0],
                "ngram": [g for g, _ in prof],
                "cnt": [c for _, c in prof],
                "rank": range(len(prof)),
            }
        )

    return (
        df.select(lang_col, order_col, text_col)
        .groupBy(lang_col)
        .applyInPandas(build, schema="lang string, ngram string, cnt long, rank long")
    )


def train_dunning(
    df: DataFrame, smoothing: float = DUNNING_SMOOTHING,
    text_col: str = "text", lang_col: str = "lang",
) -> DataFrame:
    """(lang, feat, prob) — char unigram ('c_x') + bigram ('bg_xy') features,
    globally-unioned vocabulary, additive smoothing over |V|
    (lieterature.py:83-113). Pure relational: two explodes, a union, a
    cross join of langs × vocab, left join of counts.

    Scale note: the reference semantics REQUIRE a dense langs × vocab grid
    (every lang carries a smoothed prob for every global feature), so the
    model table is L·|V| rows — fine for alphabetic corpora, and for a
    CJK-heavy web corpus (|V| ~ 10⁷ observed bigrams) still only a model
    BUILD cost: the corpus itself is touched once, the grid never joins
    back to documents (serving broadcasts per-lang dicts)."""
    low = F.lower(F.col(text_col))
    # two vectorized count passes; prefixes applied on the SMALL count
    # tables ('c_'/'bg_' namespaces never collide, so the union of the
    # two per-(lang, gram) counts equals the old count over the unioned
    # explode)
    uni = char_ngram_counts(
        df.select(F.col(lang_col).alias("lang"), low.alias("text")),
        1, key_col="lang", lower=False, pad=False, gram_col="raw",
    ).select("lang", F.concat(F.lit("c_"), F.col("raw")).alias("feat"), "cnt")
    pad = F.concat(F.lit("_"), low, F.lit("_"))
    bg = char_ngram_counts(
        df.select(F.col(lang_col).alias("lang"), pad.alias("text")),
        2, key_col="lang", lower=False, pad=False, gram_col="raw",
    ).select("lang", F.concat(F.lit("bg_"), F.col("raw")).alias("feat"), "cnt")
    counts = uni.unionAll(bg)
    vocab = counts.select("feat").distinct()
    vocab_size = vocab.count()
    lang_totals = counts.groupBy("lang").agg(F.sum("cnt").alias("total"))
    full = lang_totals.crossJoin(F.broadcast(vocab))
    joined = full.join(counts, ["lang", "feat"], "left").na.fill({"cnt": 0})
    return joined.select(
        "lang", "feat",
        (
            (F.col("cnt") + F.lit(smoothing))
            / (F.col("total") + F.lit(smoothing) * F.lit(float(vocab_size)))
        ).alias("prob"),
    )


def model_table_to_dict(model_df: DataFrame, kind: str) -> dict:
    """Collect a model table into the oracle's dict shape (for broadcast)."""
    rows = model_df.collect()
    if kind in ("ngram", "char_freq", "dunning"):
        key = {"ngram": "ngram", "char_freq": "char", "dunning": "feat"}[kind]
        out: dict = {}
        for r in rows:
            out.setdefault(r["lang"], {})[r[key]] = r["prob"]
        return out
    if kind == "markov":
        out = {}
        for r in rows:
            out.setdefault(r["lang"], {}).setdefault(r["cur"], {})[r["nxt"]] = r["prob"]
        return out
    if kind == "cavnar_trenkle":
        out = {}
        for r in rows:
            out.setdefault(r["lang"], []).append((r["rank"], r["ngram"], r["cnt"]))
        return {
            lang: [(g, c) for _, g, c in sorted(items)] for lang, items in out.items()
        }
    raise ValueError(kind)
