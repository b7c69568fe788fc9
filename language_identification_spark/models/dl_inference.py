"""DL-family batch-inference pattern (reference S5/W7 mapping).

The reference's deep-learning path loads a torch checkpoint and argmaxes
per row (/root/reference/src/models/, torch/transformer families — out of
scope per the north_star, which replaces DL langid with the hashed model).
What IS in scope is the SERVING pattern a GPU model needs on Spark, shown
here end-to-end with ``pyspark.ml.functions.predict_batch_udf``:

- checkpoint-style weights (a plain dataclass of numpy arrays — the same
  shape a ``torch.load`` state_dict would have) broadcast ONCE per
  executor, materialized once per python worker via ``make_predict_fn``;
- Arrow-batched inference: featurize → matmul → ReLU → matmul → softmax →
  argmax over the whole batch, zero per-row Python;
- a fixed ``batch_size`` knob (the GPU-memory lever).

The demo checkpoint is distilled from ``HashedNgramNB`` by exact ReLU
decomposition (relu(a) − relu(−a) = a, so hidden = [W·x, −W·x] recombines
to the NB scores): a GENUINE 2-layer ReLU MLP whose predictions provably
match the NB model — the tests assert agreement, so the serving plumbing
is verified without shipping a real torch dependency.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .hashed_ngram import DIM, HashedNgramNB, doc_bucket_ids


@dataclass
class MLPCheckpoint:
    """State-dict analogue: langs + two dense layers (float32, like a
    checkpoint off a GPU)."""

    langs: list[str]
    W1: np.ndarray  # (D, H)
    b1: np.ndarray  # (H,)
    W2: np.ndarray  # (H, L)
    b2: np.ndarray  # (L,)
    dim: int = DIM

    @classmethod
    def distill_from_nb(cls, nb: HashedNgramNB) -> "MLPCheckpoint":
        L = len(nb.langs)
        W = nb.W.astype(np.float64)  # (L, D)
        W1 = np.concatenate([W.T, -W.T], axis=1)  # (D, 2L)
        b1 = np.zeros(2 * L)
        W2 = np.concatenate([np.eye(L), -np.eye(L)], axis=0)  # (2L, L)
        return cls(langs=list(nb.langs), W1=W1, b1=b1, W2=W2, b2=nb.log_prior.copy())


def mlp_predict_batch(ckpt: MLPCheckpoint, texts) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch forward pass: (pred_idx, softmax confidence)."""
    n = len(texts)
    # Featurize the batch into a dense count matrix (N, D) — at GPU scale
    # this is the host-side collate step before the device transfer.
    X = np.zeros((n, ckpt.dim), dtype=np.float64)
    for r, t in enumerate(texts):
        ids = doc_bucket_ids(t if isinstance(t, str) else "", ckpt.dim)
        if len(ids):
            np.add.at(X[r], ids, 1.0)
    h = np.maximum(X @ ckpt.W1 + ckpt.b1, 0.0)
    scores = h @ ckpt.W2 + ckpt.b2
    m = scores.max(axis=1, keepdims=True)
    e = np.exp(scores - m)
    probs = e / e.sum(axis=1, keepdims=True)
    preds = scores.argmax(axis=1)
    return preds, probs[np.arange(n), preds]


def mlp_langid_udf(spark, ckpt: MLPCheckpoint, batch_size: int = 1024):
    """``predict_batch_udf`` serving: text column → predicted lang.

    The checkpoint broadcasts once per executor; ``make_predict_fn`` runs
    once per python worker (the slot where ``torch.load(...).to(device)``
    goes); every call gets a numpy batch of ``batch_size`` rows.
    """
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(ckpt)

    def make_predict_fn():
        model = bc.value  # worker-local materialization, once per process
        langs = np.array(model.langs)

        def predict(texts: np.ndarray) -> np.ndarray:
            preds, _ = mlp_predict_batch(model, texts.tolist())
            return langs[preds]

        return predict

    return predict_batch_udf(
        make_predict_fn, return_type=T.StringType(), batch_size=batch_size
    )
