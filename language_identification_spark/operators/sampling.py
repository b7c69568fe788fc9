"""Deterministic hash-based sampling — the corpus-mixing primitive
(Dolma's mixer, The Pile's per-source weights): downsample each stratum
(language, source, quality bucket) at its own rate when assembling a
training mix.

Net-new operator (task brief's training-data-pipeline family; no
reference counterpart).

Why NOT ``F.rand()``: at cluster scale random sampling is a correctness
bug, not a style choice. ``rand()`` is re-evaluated when a task retries
or is speculatively re-executed, so the same input partition can emit a
DIFFERENT sample on each attempt — downstream exactly-once sinks see
phantom/vanishing rows, reruns are irreproducible, and lineage row
counts stop reconciling. Hashing the row's stable key instead gives:

- retry/speculation-stable decisions (pure function of key + salt);
- reproducible corpora (same salt => same mix, bit-for-bit);
- coordinated sampling across tables (same key hashes identically
  everywhere, so sampled fact/dim tables still join consistently);
- per-key salts that decorrelate successive mixes (change the salt,
  get an independent sample).

The bucket is the first 8 hex chars of ``sha256(salt || key)`` modulo
``m`` — sha256 so the DuckDB twin is bit-identical (the FULL
``stratified_sample`` gate recomputes buckets in SQL; same discipline
as the ``media_features`` twin). Per-row codegen work, no shuffle; the
filter pushes through scans like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_DEFAULT = 1_000_000


def sample_bucket(key: Column, salt: str, m: int = M_DEFAULT) -> Column:
    """Uniform bucket in [0, m): ``sha256(salt || key)`` first 32 bits
    mod ``m``. Keys are cast to string so any key dtype hashes to the
    same bucket as its textual form in the oracle."""
    h = F.sha2(F.concat(F.lit(salt), key.cast("string")), 256)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "mix",
    m: int = M_DEFAULT,
) -> DataFrame:
    """Keep each row iff its bucket < round(rate*m) — a deterministic
    ~``rate`` sample, stable under retries and reruns."""
    return df.filter(sample_bucket(F.col(key_col), salt, m) < int(round(rate * m)))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix",
    m: int = M_DEFAULT,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rates (corpus mixing): a row in stratum ``s`` is kept
    iff bucket < round(rates[s]*m); strata absent from ``rates`` use
    ``default_rate`` (0.0 = explicit-allowlist mixing, the pinned
    default — an unlisted source does not leak into the mix).

    The rate table rides the plan as a literal CASE chain — corpus
    mixes have tens of strata, not millions, and a literal keeps the
    whole filter inside codegen (same regime call as the stop-word
    lexicon's 1024-entry literal bound; above that, join a broadcast
    rates table instead)."""
    if len(rates) > 1024:
        raise ValueError(
            "rates has >1024 strata — join a broadcast rates table instead "
            "of a plan literal (stop-word lexicon discipline)"
        )
    thr: Column = F.lit(int(round(default_rate * m)))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(int(round(r * m)))).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col), salt, m) < thr)
