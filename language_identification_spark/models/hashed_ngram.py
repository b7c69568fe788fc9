"""fastText-style hashed char-n-gram language-ID model.

North_star serving model: "fastText-style langid model served inside
vectorized pandas/Arrow UDFs (model broadcast once per executor, batched
char-n-gram hashing + softmax inference, never per-row Python)".

Design (Spark-first, no SGD needed):
- Features: char {1,2,3}-grams of the lowercased text, FNV-1a-hashed into
  ``DIM`` buckets (hashing trick — no vocabulary fit, so training is a single
  distributed groupBy over (lang, bucket), exactly like fastText's hashed
  bigram bag but trained as multinomial NB with add-alpha smoothing).
- Training: ``mapInPandas`` feature extraction (batch-local pre-aggregation
  to shrink the shuffle) → ``groupBy(lang, bucket).sum`` → small (L×D upper
  bound) count table collected to the driver → dense log-prob matrix
  ``W[L, D]`` + log priors.
- Serving: ``W`` broadcast once per executor; per Arrow batch we build a
  sparse count vector per doc and take ``W[:, idx] @ counts`` (numpy,
  float64) + prior, then a softmax for ``lang_conf``.

The same featurizer/scorer functions run in the pure-Python oracle, so
predictions and confidences are bit-identical between oracle and Spark.

Reference analogue: the statistical n-gram models
(/root/reference/src/models/statistical_models.py:7-49) — same bag-of-char-
n-gram evidence, modernized to the hashed/softmax form the north_star asks
for.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

DIM = 65536  # hash buckets (2^16): dense W is L×65536 float64 → ~0.5 MB/lang
N_RANGE = (1, 2, 3)
ALPHA = 0.1  # add-alpha smoothing for NB bucket probabilities

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = 0xFFFFFFFFFFFFFFFF


def bucket_of(gram: str, dim: int = DIM) -> int:
    """FNV-1a 64-bit over UTF-8 bytes, mod dim. Pure Python → identical on
    driver, executors, and oracle."""
    h = _FNV_OFFSET
    for b in gram.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    return h % dim


def doc_bucket_counts(text: str, dim: int = DIM, cache: dict | None = None) -> dict[int, int]:
    """Hashed char-1..3-gram counts for one document (lowercased)."""
    low = text.lower()
    out: dict[int, int] = {}
    cache = cache if cache is not None else {}
    for n in N_RANGE:
        t = "_" * (n - 1) + low + "_"
        for i in range(len(t) - n + 1):
            g = t[i : i + n]
            b = cache.get(g)
            if b is None:
                b = bucket_of(g, dim)
                cache[g] = b
            out[b] = out.get(b, 0) + 1
    return out


def featurize_counts_pdf(pdf: pd.DataFrame, dim: int = DIM) -> pd.DataFrame:
    """(lang, text) batch → (lang, bucket, cnt) partial aggregate.

    Used inside ``mapInPandas`` during training: pre-aggregating within the
    Arrow batch means the shuffle moves at most L×DIM rows per task instead
    of one row per (doc, gram).
    """
    acc: dict[tuple[str, int], int] = {}
    cache: dict[str, int] = {}
    for lang, text in zip(pdf["lang"], pdf["text"]):
        for b, c in doc_bucket_counts(text, dim, cache).items():
            key = (lang, b)
            acc[key] = acc.get(key, 0) + c
    if not acc:
        return pd.DataFrame({"lang": pd.Series(dtype="object"),
                             "bucket": pd.Series(dtype="int64"),
                             "cnt": pd.Series(dtype="int64")})
    langs, buckets = zip(*acc.keys())
    return pd.DataFrame({"lang": langs, "bucket": buckets, "cnt": list(acc.values())})


@dataclass
class HashedNgramNB:
    """Dense NB-in-hashed-space model: W[L, D] log-probs + log priors."""

    langs: list[str]
    W: np.ndarray          # (L, D) float64 log P(bucket | lang)
    log_prior: np.ndarray  # (L,)   float64 log P(lang)
    dim: int = DIM

    @classmethod
    def from_counts(
        cls,
        bucket_counts: pd.DataFrame,  # columns lang, bucket, cnt (exact ints)
        doc_counts: dict[str, int],
        dim: int = DIM,
        alpha: float = ALPHA,
    ) -> "HashedNgramNB":
        langs = sorted(doc_counts)
        idx = {lg: i for i, lg in enumerate(langs)}
        counts = np.zeros((len(langs), dim), dtype=np.float64)
        li = bucket_counts["lang"].map(idx).to_numpy()
        counts[li, bucket_counts["bucket"].to_numpy()] = bucket_counts["cnt"].to_numpy()
        totals = counts.sum(axis=1, keepdims=True)
        W = np.log(counts + alpha) - np.log(totals + alpha * dim)
        n_docs = np.array([doc_counts[lg] for lg in langs], dtype=np.float64)
        log_prior = np.log(n_docs) - np.log(n_docs.sum())
        return cls(langs=langs, W=W, log_prior=log_prior, dim=dim)

    def score_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """→ (pred_idx int64[N], conf float64[N]); softmax confidence of the
        argmax language. Deterministic: fixed lang order, fixed op order."""
        n = len(texts)
        preds = np.zeros(n, dtype=np.int64)
        confs = np.zeros(n, dtype=np.float64)
        cache: dict[str, int] = {}
        for r, text in enumerate(texts):
            bc = doc_bucket_counts(text if isinstance(text, str) else "", self.dim, cache)
            if bc:
                idx = np.fromiter(bc.keys(), dtype=np.int64, count=len(bc))
                cnt = np.fromiter(bc.values(), dtype=np.float64, count=len(bc))
                scores = self.W[:, idx] @ cnt + self.log_prior
            else:
                scores = self.log_prior.copy()
            m = scores.max()
            e = np.exp(scores - m)
            p = int(np.argmax(scores))
            preds[r] = p
            confs[r] = e[p] / e.sum()
        return preds, confs

    def predict_labels(self, texts) -> tuple[list[str], np.ndarray]:
        preds, confs = self.score_batch(texts)
        return [self.langs[i] for i in preds], confs

    # --- serialization as a plain table (model registry / Iceberg-able) ---
    def to_table(self) -> pd.DataFrame:
        rows = []
        for i, lg in enumerate(self.langs):
            nz = np.nonzero(~np.isclose(self.W[i], self.W[i].min()))[0]
            rows.append(
                pd.DataFrame(
                    {"lang": lg, "bucket": nz, "logprob": self.W[i, nz],
                     "log_prior": self.log_prior[i], "floor": self.W[i].min()}
                )
            )
        return pd.concat(rows, ignore_index=True)

    @classmethod
    def from_table(cls, pdf: pd.DataFrame, dim: int = DIM) -> "HashedNgramNB":
        langs = sorted(pdf["lang"].unique())
        W = np.zeros((len(langs), dim), dtype=np.float64)
        log_prior = np.zeros(len(langs), dtype=np.float64)
        for i, lg in enumerate(langs):
            sub = pdf[pdf["lang"] == lg]
            W[i, :] = sub["floor"].iloc[0]
            W[i, sub["bucket"].to_numpy()] = sub["logprob"].to_numpy()
            log_prior[i] = sub["log_prior"].iloc[0]
        return cls(langs=langs, W=W, log_prior=log_prior, dim=dim)
