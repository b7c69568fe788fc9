"""Sequence packing and overlap chunking — the tokenizer-adjacent ops a
training-data pipeline runs AFTER curation to turn kept documents into
fixed-length training examples.

Both are net-new for the quality-filter surface (no reference
counterpart; the reference stops at per-document labels).

``pack_sequences``: GPT-style packing — the kept corpus is treated as
one token stream per shard and sliced into ``seq_len``-token windows;
each document is assigned the window its FIRST token falls into, with
its offset inside that window and whether it straddles a boundary.
This is the "concatenate and slice" contract used by Megatron/GPT-NeoX
offline packers (documents may span windows; no padding waste), chosen
over first-fit bin packing because it is a pure window expression —
one `sum() OVER (PARTITION BY shard ORDER BY id)` — while first-fit is
an inherently sequential recurrence (the bin a doc lands in depends on
every previous bin's remaining space) that cannot run as a distributed
window and would gate only through a recursive CTE.

Scale shape: the window partitions by SHARD (crawl file / bucket), so
each shard's running sum is an independent task — no global sort, no
single-partition window. A 10^12-doc corpus packs as |shards| parallel
streams, which is exactly how offline packers shard their output. The
shuffle carries (shard, id, n_tokens) — never text.

``chunk_documents``: sliding-window splitting of long documents into
``chunk``-token pieces every ``stride`` tokens (overlap = chunk -
stride), the BERT-style long-doc treatment and the RAG indexing shape.
Pure per-row explode — `split` → `sequence` → `posexplode` → `slice` —
zero shuffle, fuses into the scan; output size is n/stride rows per
doc, bounded and predictable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WS_SPARK = "[ \\t\\n]+"

# r6 (VERDICT r5 ask #5): training-data packing counts BPE tokens, not
# whitespace words. Both operators take a tokenizer: pack_sequences is
# already length-agnostic (pass token_count_bpe as n_tokens_col);
# chunk_documents gains tokenizer='bpe' so the chunk grid is laid over
# the same token stream the packer counts. BPE chunk_text re-joins the
# tokens with ' ' (a token sequence, not a substring of the original —
# the training-example shape, where tokens are the unit anyway).


def _tokenize(text_col: str, tokenizer: str) -> Column:
    from ..functions.analysis import BPE_REGEX

    t = F.trim(F.col(text_col))
    if tokenizer == "ws":
        return F.when(t == "", F.array().cast("array<string>")).otherwise(
            F.split(t, WS_SPARK)
        )
    if tokenizer == "bpe":
        return F.regexp_extract_all(t, F.lit(BPE_REGEX), F.lit(0))
    raise ValueError(f"unknown tokenizer: {tokenizer!r}")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document a training-window id under concatenate-and-
    slice packing of the per-shard token stream (doc order = ``id_col``).

    Adds to the input columns:
      - ``pack_id``: window index (within the shard) of the doc's first
        token — floor(cum_start / seq_len);
      - ``pack_offset``: the first token's offset inside that window;
      - ``spans_packs``: true when the doc crosses a window boundary
        (its tokens land in more than one training example).

    Zero-token docs get the window their position points at and never
    span. ``shard_col=None`` packs the whole input as one stream — fine
    for a bounded table, NOT the corpus-scale call (single-partition
    window); pass the shard/bucket column at scale.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    w = Window.orderBy(id_col) if shard_col is None else (
        Window.partitionBy(shard_col).orderBy(id_col)
    )
    cum_start = F.coalesce(
        F.sum(n_tokens_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    out = df.withColumn("_cum_start", cum_start)
    n = F.col(n_tokens_col)
    pack_id = F.floor(F.col("_cum_start") / seq_len)
    last_tok = F.col("_cum_start") + F.greatest(n - 1, F.lit(0))
    return (
        out.withColumn("pack_id", pack_id)
        .withColumn(
            "pack_offset", (F.col("_cum_start") % seq_len).cast("long")
        )
        .withColumn(
            "spans_packs",
            (n > 0) & (F.floor(last_tok / seq_len) > F.col("pack_id")),
        )
        .drop("_cum_start")
    )


def pack_sequences_sql(
    seq_len: int,
    table: str,
    cols: str,
    n_tokens_expr: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`pack_sequences`, generated from the same
    window recurrence so the two engines cannot drift. ``cols`` = the
    passthrough projection (e.g. ``"doc_id, n_tokens"``)."""
    part = f"PARTITION BY {shard_col} " if shard_col else ""
    return f"""
      WITH s AS (
        SELECT {cols}, {n_tokens_expr} AS _n,
               coalesce(sum({n_tokens_expr}) OVER (
                 {part}ORDER BY {id_col}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS _cum_start
        FROM {table}
      )
      SELECT {cols},
             (_cum_start // {seq_len})::BIGINT AS pack_id,
             (_cum_start % {seq_len})::BIGINT AS pack_offset,
             (_n > 0 AND
              ((_cum_start + greatest(_n - 1, 0)) // {seq_len})
                > (_cum_start // {seq_len})) AS spans_packs
      FROM s
    """


def chunk_documents(
    df: DataFrame,
    chunk: int = 128,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "ws",
) -> DataFrame:
    """Explode each document into sliding ``chunk``-token windows every
    ``stride`` tokens (default stride = chunk, i.e. disjoint chunks).

    Output: (``id_col``, chunk_idx, start_token, n_chunk_tokens,
    chunk_text). Empty/whitespace-only docs produce zero rows. The last
    chunk may be short; a doc shorter than ``chunk`` yields exactly one
    chunk. ``tokenizer='ws'``: whitespace-delimited (the same
    ``[ \\t\\n]+`` contract as token_count_ws, proven cross-engine by the
    token gate); ``tokenizer='bpe'``: the BPE_REGEX token stream (the
    same count token_count_bpe reports, so chunk lengths agree with the
    packer's ``n_tokens``).
    """
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    stride = chunk if stride is None else stride
    if not 0 < stride <= chunk:
        raise ValueError(f"need 0 < stride <= chunk, got stride={stride}")
    df = df.withColumn("_toks", _tokenize(text_col, tokenizer)).withColumn(
        "_n", F.size("_toks")
    )
    # starts: 0, stride, 2*stride, ... strictly below n, EXCEPT that a
    # start whose window would sit entirely inside the previous window
    # (start >= n already excluded; start > 0 and start >= n is the only
    # such case with stride <= chunk) never appears.
    starts = F.when(F.col("_n") == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    )
    out = df.withColumn("_starts", starts).select(
        id_col,
        "_toks",
        "_n",
        F.posexplode("_starts").alias("chunk_idx", "start_token"),
    )
    piece = F.slice(F.col("_toks"), F.col("start_token") + 1, chunk)
    return out.select(
        id_col,
        "chunk_idx",
        F.col("start_token").cast("long").alias("start_token"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    chunk: int,
    stride: int,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "ws",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same start grid, same
    1-based inclusive slice arithmetic via list_slice)."""
    if tokenizer == "ws":
        tok_sql = f"""CASE WHEN trim({text_col}) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim({text_col}), '[ \\t\\n]+')
               END"""
    elif tokenizer == "bpe":
        from ..functions.analysis import BPE_REGEX

        tok_sql = f"regexp_extract_all(trim({text_col}), '{BPE_REGEX}')"
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer!r}")
    return f"""
      WITH toks AS (
        SELECT {id_col},
               {tok_sql} AS t
        FROM {table}
      ),
      st AS (
        SELECT {id_col}, t, len(t) AS n,
               unnest(range(0, greatest(len(t), 1), {stride})) AS start_token,
               unnest(range(0, greatest(cast(ceil(len(t)::DOUBLE / {stride}) AS BIGINT), 1))) AS chunk_idx
        FROM toks
        WHERE len(t) > 0
      )
      SELECT {id_col}, chunk_idx::INT AS chunk_idx,
             start_token::BIGINT AS start_token,
             len(list_slice(t, start_token + 1,
                            least(start_token + {chunk}, n)))::BIGINT
               AS n_chunk_tokens,
             array_to_string(
               list_slice(t, start_token + 1,
                          least(start_token + {chunk}, n)), ' ')
               AS chunk_text
      FROM st
    """
