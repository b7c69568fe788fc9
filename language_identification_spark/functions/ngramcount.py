"""Vectorized char-n-gram counting (r7 optimization).

The model trainers and n-gram gates all share one shape: explode char
n-grams → groupBy(key, ngram) → count. The explode side built gram
arrays with the ``char_ngrams`` zip_with chain — a CodegenFallback
expression that re-evaluates its ``split`` child per slice and runs
interpreted per element — and then hash-aggregated one row per gram
occurrence (~15M rows at sf1.0 for bigrams).

This module computes PARTIAL counts per Arrow batch instead (guide
§2.3 "aggregate before you shuffle" + §4.2 "vectorized native work"):
codepoints of the whole batch tile one buffer, each n-gram window packs
into one uint64 key (21 bits per codepoint, n ≤ 3), ``np.unique``
counts a batch-group in one C pass, and only (key, gram, cnt) partial
rows reach the JVM — thousands per batch instead of millions. The
final ``groupBy(...).sum("cnt")`` makes totals EXACTLY equal to the
explode form (integer counts, any grouping), so trained probabilities
are bit-identical.

Gram strings are decoded from the packed keys (codepoints → utf-32) —
lossless for any Unicode codepoint (< 2^21), so output grams equal the
oracle's ``string_split``-by-codepoint semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHIFT = 21  # bits per codepoint; max codepoint 0x10FFFF < 2^21
_MASK = np.uint64((1 << _SHIFT) - 1)


def _pack_window_keys(texts: list[str], n: int, pad: bool) -> np.ndarray:
    """uint64 keys of every n-gram window of every text (duplicates
    preserved), windows never crossing text boundaries. ``pad=True``
    applies the reference sentinel convention ``'_'*(n-1) + t + '_'``;
    with ``pad=False`` texts shorter than n contribute nothing."""
    if pad:
        head = "_" * (n - 1)
        parts = [head + t + "_" for t in texts]
    else:
        parts = texts
    m = len(parts)
    lens = np.fromiter((len(t) for t in parts), dtype=np.int64, count=m)
    total_chars = int(lens.sum())
    if total_chars == 0:
        return np.empty(0, dtype=np.uint64)
    big = "".join(parts)
    cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    L = len(cp)
    if L < n:
        return np.empty(0, dtype=np.uint64)
    W = L - n + 1
    key = cp[:W].copy()
    for j in range(1, n):
        key = (key << np.uint64(_SHIFT)) | cp[j : j + W]
    counts = np.maximum(lens - (n - 1), 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    offs = np.zeros(m, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    bounds = np.zeros(m, dtype=np.int64)
    np.cumsum(counts[:-1], out=bounds[1:])
    base = np.arange(total, dtype=np.int64) + np.repeat(offs - bounds, counts)
    return key[base]


def _decode_keys(keys: np.ndarray, n: int) -> list[str]:
    """Packed uint64 keys → n-char gram strings, one utf-32 decode for
    the whole (distinct) key set."""
    u = len(keys)
    if u == 0:
        return []
    mat = np.empty((u, n), dtype="<u4")
    for j in range(n):
        mat[:, n - 1 - j] = ((keys >> np.uint64(j * _SHIFT)) & _MASK).astype(np.uint32)
    text = mat.tobytes().decode("utf-32-le")
    return [text[i * n : (i + 1) * n] for i in range(u)]


def grouped_gram_counts(texts: list[str], n: int, pad: bool) -> tuple[list[str], np.ndarray]:
    """(grams, counts) of one group of texts — np.unique over the packed
    window keys."""
    keys = _pack_window_keys(texts, n, pad)
    if len(keys) == 0:
        return [], np.empty(0, dtype=np.int64)
    vals, cnts = np.unique(keys, return_counts=True)
    return _decode_keys(vals, n), cnts.astype(np.int64)


def char_ngram_counts(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    key_col: str | None = None,
    lower: bool = False,
    pad: bool = True,
    gram_col: str = "ngram",
) -> DataFrame:
    """(key_col?, gram_col, cnt) exact char-n-gram occurrence counts —
    the drop-in replacement for ``explode(char_ngrams(...)) → groupBy →
    count()``. Partial counts per (batch, key) via numpy, one map-side-
    combinable ``sum`` shuffle. n ≤ 3 (the packed-key domain)."""
    if n > 3:
        raise ValueError("char_ngram_counts packs codepoints 21 bits each; n must be <= 3")
    # lowercasing stays JVM-side (F.lower) so case-folding semantics are
    # EXACTLY the ones the oracle was validated against — only the gram
    # windowing/counting moves to numpy.
    text_expr = F.lower(F.col(text_col)) if lower else F.col(text_col)
    cols = ([F.col(key_col)] if key_col else []) + [text_expr.alias(text_col)]
    src = df.select(*cols)
    out_schema = (
        (f"`{key_col}` string, " if key_col else "") + f"`{gram_col}` string, cnt long"
    )

    def partial(pdfs):
        for pdf in pdfs:
            # NULL text contributes nothing (explode(char_ngrams(NULL))
            # dropped the row); empty text keeps its sentinel grams.
            texts = pdf[text_col]
            mask = texts.notna()
            texts = texts[mask]
            if key_col is None:
                grams, cnts = grouped_gram_counts(texts.tolist(), n, pad)
                if grams:
                    yield pd.DataFrame({gram_col: grams, "cnt": cnts})
                continue
            for key, grp in texts.groupby(pdf[key_col].to_numpy()[mask.to_numpy()]):
                grams, cnts = grouped_gram_counts(grp.tolist(), n, pad)
                if grams:
                    yield pd.DataFrame(
                        {key_col: key, gram_col: grams, "cnt": cnts}
                    )

    partials = src.mapInPandas(partial, schema=out_schema)
    keys = ([key_col] if key_col else []) + [gram_col]
    return partials.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def per_doc_char_ngram_counts(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = False,
    pad: bool = True,
    gram_col: str = "ngram",
    cnt_col: str = "tf",
) -> DataFrame:
    """(id_col, gram_col, cnt_col) — EXACT per-document n-gram counts,
    shuffle-free: each document lives wholly inside one Arrow batch, so
    the emitted rows are already final (the old
    ``explode → groupBy(doc, gram)`` paid a corpus-wide shuffle of one
    row per gram occurrence to compute the same thing). One ``np.unique``
    over (doc-index, packed-gram) combined keys per batch."""
    if n > 2:
        raise ValueError("per-doc combined keys hold 20 bits of doc index + 21n gram bits; n must be <= 2")
    text_expr = F.lower(F.col(text_col)) if lower else F.col(text_col)
    src = df.select(F.col(id_col), text_expr.alias(text_col))
    out_schema = f"`{id_col}` long, `{gram_col}` string, `{cnt_col}` long"
    gram_bits = np.uint64(_SHIFT * n)

    def partial(pdfs):
        for pdf in pdfs:
            texts = pdf[text_col]
            mask = texts.notna().to_numpy()
            ids = pdf[id_col].to_numpy()[mask]
            tlist = texts[texts.notna()].tolist()
            m = len(tlist)
            if m == 0:
                continue
            if pad:
                head = "_" * (n - 1)
                parts = [head + t + "_" for t in tlist]
            else:
                parts = tlist
            lens = np.fromiter((len(t) for t in parts), dtype=np.int64, count=m)
            counts = np.maximum(lens - (n - 1), 0)
            total = int(counts.sum())
            if total == 0:
                continue
            keys = _pack_window_keys(tlist, n, pad)
            doc_idx = np.repeat(np.arange(m, dtype=np.uint64), counts)
            combined = (doc_idx << gram_bits) | keys
            vals, cnts = np.unique(combined, return_counts=True)
            gkeys = vals & np.uint64((1 << int(gram_bits)) - 1)
            didx = (vals >> gram_bits).astype(np.int64)
            yield pd.DataFrame(
                {
                    id_col: ids[didx],
                    gram_col: _decode_keys(gkeys, n),
                    cnt_col: cnts.astype(np.int64),
                }
            )

    return src.mapInPandas(partial, schema=out_schema)
