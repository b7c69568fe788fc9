"""Custom stateful streaming operator: cross-micro-batch exact dedup.

The north_star's custom-stateful slot (``applyInPandasWithState``): a
web-crawl stream re-sees the same page bytes across fetches and micro
batches, and the batch ``dedup_exact`` operator can't help a stream — it
only sees one micro-batch at a time. Here the stream is grouped by
content hash (sha256 of the text, the same key the batch operator
shuffles on) and a tiny per-key state ("how many occurrences have been
emitted") survives across micro-batches, so only the FIRST occurrence of
each distinct text ever reaches the sink.

Scale shape: state is one small row per distinct hash, partitioned by the
group key across executors exactly like the batch groupBy; the state
store checkpoints with the query, so dedup is resumable. ``ttl_ms``
bounds state for unbounded crawls via a processing-time timeout: a hash
idle for longer than the TTL is evicted (its next occurrence re-emits —
the standard bounded-state tradeoff; ``None`` keeps exact forever-dedup).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "h string, url string, text string, n_prior long"
STATE_SCHEMA = "seen long"


def _make_first_occurrence(ttl_ms: int | None):
    def _first_occurrence(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # idle past the TTL: evict so unbounded crawls keep bounded
            # state (Spark invokes this with no data for the key)
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        # Materialize the whole group's micro-batch before choosing the
        # representative: Spark hands the group as an ITERATOR of Arrow
        # chunks in no guaranteed order, so "first row of the first
        # chunk" would vary across task retries / micro-batch replays.
        # min(url) over the full group is replay-deterministic. Memory is
        # bounded by one key's rows within one micro-batch.
        batch = [pdf for pdf in pdfs if len(pdf)]
        if batch:
            allrows = pd.concat(batch, ignore_index=True) if len(batch) > 1 else batch[0]
            if seen == 0:
                first = allrows.sort_values("url", kind="mergesort").iloc[:1].copy()
                first["n_prior"] = 0
                yield first[["h", "url", "text", "n_prior"]]
            seen += len(allrows)
        state.update((seen,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _first_occurrence


def dedup_stream(
    pages_stream: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: emits one row per distinct ``text_col`` seen
    by the query (first micro-batch wins across batches; within the
    winning micro-batch the min-``url_col`` row represents the group —
    rows inside one batch have no order, so min is the deterministic
    choice).

    ``ttl_ms=None`` dedups against everything ever seen (state grows with
    distinct hashes); a finite TTL evicts hashes idle that long, bounding
    state for unbounded crawls at the cost of re-admitting a duplicate
    whose original fell out of the window."""
    keyed = pages_stream.select(
        F.sha2(F.col(text_col), 256).alias("h"),
        F.col(url_col).alias("url"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("h").applyInPandasWithState(
        _make_first_occurrence(ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


NEAR_OUT_SCHEMA = "bk string, url string, canonical_url string, n_prior long"
NEAR_STATE_SCHEMA = "canonical string, seen long"


def _make_band_bucket(ttl_ms: int | None):
    def _bucket(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        canonical, seen = state.get if state.exists else (None, 0)
        # Concat ALL the group's Arrow chunks before electing a canonical:
        # chunk arrival order is not guaranteed, so a per-chunk election
        # (the pre-r5-review shape) made the canonical — and therefore the
        # emitted rows — depend on shuffle arrival order, breaking the
        # replay-idempotence the module pins elsewhere. min(url) over the
        # whole micro-batch group is replay-deterministic; memory is one
        # key's rows within one micro-batch.
        batch = [pdf for pdf in pdfs if len(pdf)]
        if batch:
            allrows = pd.concat(batch, ignore_index=True) if len(batch) > 1 else batch[0]
            if canonical is None:
                canonical = allrows["url"].min()
            hits = allrows[allrows["url"] != canonical]
            if len(hits):
                out = hits[["bk", "url"]].copy()
                out["canonical_url"] = canonical
                out["n_prior"] = seen
                yield out
            seen += len(allrows)
        state.update((canonical, seen))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _bucket


def near_dedup_stream(
    pages_stream: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    n: int = 5,
    n_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-dedup: the batch LSH index
    (operators.dedup.minhash_band_index) re-expressed as cross-micro-batch
    state, so a page NEAR-duplicating (not just byte-equal to) something
    seen in ANY earlier micro-batch is flagged.

    Per incoming page: the same JVM-side shingle hashing + numpy minhash
    signature as the batch family (stateless transforms, streaming-safe),
    exploded to its ``bands`` band keys. State lives per band-bucket key
    (band index + band hash): the bucket's first-seen url becomes its
    canonical. Every later arrival in that bucket with a different url is
    emitted as ``(bk, url, canonical_url, n_prior)`` — one row per
    colliding band, so consumers take ``distinct(url)`` (or group by url
    to count colliding bands as collision strength).

    CONTRACT — candidates, not verdicts: LSH collisions are the same
    evidence the batch ``minhash_lsh_candidates`` stage produces; the
    batch path verifies with exact Jaccard, which a stream cannot (the
    canonical's text is gone). Production re-verifies flagged pairs
    offline against the corpus, or treats b-band collision counts as
    confidence. False-positive rate per band pair is the standard
    (s^r)-collision curve for r = n_hashes // bands.

    State size: ``bands`` small rows per distinct page (canonical url +
    counter, partitioned by bucket key like any groupBy) — bounded for
    unbounded crawls via ``ttl_ms`` processing-time eviction exactly as
    in :func:`dedup_stream`; an evicted bucket's next page re-registers
    as canonical.
    """
    from ..operators.dedup import _band_table, minhash_signatures

    sigs = minhash_signatures(
        pages_stream, id_col=url_col, text_col=text_col, n=n,
        n_hashes=n_hashes, seed=seed,
    )
    banded = _band_table(sigs, bands, n_hashes)
    keyed = banded.select(
        F.concat_ws(
            ":", F.col("band").cast("string"), F.col("bh").cast("string")
        ).alias("bk"),
        F.col("id").alias("url"),
    )
    return keyed.groupBy("bk").applyInPandasWithState(
        _make_band_bucket(ttl_ms),
        outputStructType=NEAR_OUT_SCHEMA,
        stateStructType=NEAR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
