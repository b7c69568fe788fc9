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
    """Uniform bucket in [0, m): the 32-bit :func:`shuffle_rank` hash
    mod ``m`` — ONE copy of the cross-engine sha256-prefix contract
    serves both sampling and shuffling (and their oracles)."""
    return shuffle_rank(key, salt) % m


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


def shuffle_rank(key: Column, salt: str) -> Column:
    """Full 32-bit uniform hash: ``sha256(salt || key)`` first 8 hex
    chars as BIGINT (keys cast to string so any dtype hashes like its
    textual form in the oracle). The single implementation behind both
    :func:`deterministic_shuffle` (needs resolution) and
    :func:`sample_bucket` (mods it into buckets)."""
    h = F.sha2(F.concat(F.lit(salt), key.cast("string")), 256)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "shuffle",
    n_shards: int = 32,
) -> DataFrame:
    """(df columns..., shard, pos): a reproducible global random order
    over the corpus — the shuffle a training run consumes (read shards
    in shard order, rows by pos within each). Epoch re-shuffles are a
    salt change; same salt is bit-stable across reruns AND task
    retries (``F.rand()``/``orderBy(rand())`` is not — see the module
    docstring's retry-stability argument, which applies doubly to a
    global sort whose sampled range boundaries also move per run).

    The order is one global hash order, executed WITHOUT a global
    sort: ``shard`` is the rank's top bits (``rank*n >> 32``), so
    shard-major (shard, pos) order EQUALS rank order, but the physical
    plan is one hash Exchange on ``shard`` + per-shard local sorts —
    |shards| independent tasks, no rangepartitioning sampling pass, no
    driver-coordinated boundaries. Ties (32-bit rank collisions) break
    on the key, so the permutation is total and engine-independent.
    At 100 TB pick n_shards so a shard's rows fit one task's sort
    buffer (thousands of shards, not 32)."""
    if n_shards <= 0 or n_shards > (1 << 31):
        raise ValueError(f"n_shards must be in [1, 2^31], got {n_shards}")
    from pyspark.sql import Window

    rank = shuffle_rank(F.col(key_col), salt)
    out = df.withColumn("_rank", rank).withColumn(
        "shard", F.shiftright(F.col("_rank") * n_shards, 32)
    )
    w = Window.partitionBy("shard").orderBy("_rank", key_col)
    return out.withColumn("pos", F.row_number().over(w)).drop("_rank")
