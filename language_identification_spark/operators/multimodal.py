"""Multimodal column plumbing (net-new, task brief).

Images/audio/video ride as opaque ``binary`` columns with typed metadata.
The Spark-side machinery — schema, batch iteration, partition sizing, UDF
signatures — is real and tested; the actual media decode is STUBBED
(``decode_stub=True`` produces a deterministic fake; ``False`` raises
``NotImplementedError``) because no image/audio libraries ship in this
container. Swapping the stub for PIL/torchaudio changes one function, not
the plan.

Pattern: ``mapInPandas`` so each task streams Arrow batches of (id, bytes,
meta) and yields fixed-width feature rows — the correct shape for
GPU-adjacent decode at scale (batch-level amortization, no row-at-a-time
Python, executor-local model/codec init in the closure).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_s double"
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "html", id_col: str | None = None
) -> DataFrame:
    """Treat an existing binary column as media payload + typed metadata.
    (In production the metadata comes from the WARC/Iceberg table.)

    ``id_col`` carries an existing id through as ``media_id``; without one,
    a content hash is derived (fine operationally, but content-addressed
    ids collide for byte-identical payloads and xxhash64 has no DuckDB
    twin — the correctness gate passes ``doc_id`` through).
    """
    media_id = (
        F.col(id_col).cast("long") if id_col is not None else F.xxhash64(payload_col)
    )
    return df.select(
        media_id.alias("media_id"),
        F.lit("image").alias("kind"),
        F.col(payload_col).alias("payload"),
        (F.length(payload_col) % 1024 + 1).cast("int").alias("width"),
        (F.length(payload_col) % 768 + 1).cast("int").alias("height"),
        F.lit(0.0).alias("duration_s"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded features."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_media_features(
    media: DataFrame, dim: int = FEATURE_DIM, decode_stub: bool = True
) -> DataFrame:
    """(media_id, kind, feature ARRAY<FLOAT>, n_bytes) via mapInPandas.

    ``decode_stub=False`` marks where PIL/ffmpeg decode goes; it raises
    until a codec is available in the image.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Executor-local init happens HERE (one per task, amortized over
        # all batches) — the slot where a real codec/model would load.
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg — "
                    "not present in this container"
                )
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, kind string, feature array<float>, n_bytes long"
    )


def frame_sample_plan(
    media: DataFrame, every_s: float = 1.0, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (explode), decode stubbed. Demonstrates the row-expansion
    shape (posexplode over a generated timestamp sequence)."""
    n_frames = F.greatest(
        (F.col("duration_s") / F.lit(every_s)).cast("int"), F.lit(1)
    )
    frames = media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    )
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * F.lit(every_s)).alias("frame_ts"),
    )
