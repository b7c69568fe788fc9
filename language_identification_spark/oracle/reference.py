"""Pure-Python/numpy oracle: the reference's model math, replicated exactly.

Each class mirrors one reference model, constant-for-constant and
quirk-for-quirk (we replicate, never fix):

- ``NgramLM``        ← /root/reference/src/models/statistical_models.py:7-49
- ``CharFrequency``  ← /root/reference/src/models/statistical_models.py:51-99
- ``MarkovChain``    ← /root/reference/src/models/statistical_models.py:101-147
- ``CavnarTrenkle``  ← /root/reference/src/models/lieterature.py:6-58
- ``Dunning``        ← /root/reference/src/models/lieterature.py:60-164

Quirks preserved:
- defaultdict smoothing inflates normalization totals: total =
  Σcounts + smoothing·|per-lang vocab| (statistical_models.py:20,28).
- n-gram scoring silently skips n-grams unseen for a language
  (statistical_models.py:44-45) — the cause of ngram_3's degenerate
  accuracy; kept as-is.
- Dunning's miss fallback is the raw constant ``smoothing`` (0.5), not a
  smoothed probability (lieterature.py:147).
- Cavnar–Trenkle trains on the ' '-joined concatenation of a language's
  texts in dataset order (lieterature.py:28), so cross-document n-grams
  exist and ordering matters.
- Tie-break on argmax: the reference iterates a ``set(labels)`` (runtime
  hash order); we pin languages to sorted order for determinism. Float
  ties are practically impossible, so parity is unaffected.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def _sorted_langs(labels) -> list[str]:
    return sorted(set(labels))


class NgramLM:
    """Char n-gram language model (statistical_models.py:7-49)."""

    def __init__(self, n: int = 1, smoothing: float = 1e-8):
        self.n = n
        self.smoothing = smoothing
        self.language_models: dict[str, dict[str, float]] = {}

    def train(self, texts, labels) -> None:
        for label in _sorted_langs(labels):
            counts: Counter = Counter()
            for text, l in zip(texts, labels):
                if l != label:
                    continue
                t = "_" * (self.n - 1) + text + "_"
                for i in range(len(t) - self.n + 1):
                    counts[t[i : i + self.n]] += 1
            # defaultdict(lambda: smoothing) then += 1 ⇒ each seen ngram is
            # count + smoothing; total includes one smoothing per distinct.
            total = sum(counts.values()) + self.smoothing * len(counts)
            self.language_models[label] = {
                k: (v + self.smoothing) / total for k, v in counts.items()
            }

    def score(self, text: str) -> dict[str, float]:
        t = "_" * (self.n - 1) + text + "_"
        grams = Counter(t[i : i + self.n] for i in range(len(t) - self.n + 1))
        scores = {}
        for lang, model in self.language_models.items():
            s = 0.0
            for g, c in grams.items():
                if g in model:  # unseen grams contribute 0 (quirk kept)
                    s += c * math.log(model[g] + self.smoothing)
            scores[lang] = s
        return scores

    def predict(self, texts) -> list[str]:
        return [max(self.score(t).items(), key=lambda x: x[1])[0] for t in texts]


class CharFrequency:
    """Char-frequency cosine profile (statistical_models.py:51-99)."""

    def __init__(self, smoothing: float = 1e-10):
        self.smoothing = smoothing
        self.language_profiles: dict[str, dict[str, float]] = {}

    def train(self, texts, labels) -> None:
        for label in _sorted_langs(labels):
            counts: Counter = Counter()
            for text, l in zip(texts, labels):
                if l == label:
                    counts.update(text.lower())
            total = sum(counts.values()) + self.smoothing * len(counts)
            self.language_profiles[label] = {
                ch: (v + self.smoothing) / total for ch, v in counts.items()
            }

    def score(self, text: str) -> dict[str, float]:
        counts = Counter(text.lower())
        total = sum(counts.values()) + self.smoothing * len(counts)
        prof = {ch: (v + self.smoothing) / total for ch, v in counts.items()}
        d1 = math.sqrt(sum(v * v for v in prof.values()))
        scores = {}
        for lang, lp in self.language_profiles.items():
            common = set(prof) & set(lp)
            num = sum(prof[c] * lp[c] for c in common)
            d2 = math.sqrt(sum(v * v for v in lp.values()))
            scores[lang] = num / (d1 * d2 + self.smoothing)
        return scores

    def predict(self, texts) -> list[str]:
        return [max(self.score(t).items(), key=lambda x: x[1])[0] for t in texts]


class MarkovChain:
    """Char transition LM (statistical_models.py:101-147)."""

    def __init__(self, smoothing: float = 1e-10):
        self.smoothing = smoothing
        self.language_models: dict[str, dict[str, dict[str, float]]] = {}

    def train(self, texts, labels) -> None:
        for label in _sorted_langs(labels):
            trans: dict[str, Counter] = defaultdict(Counter)
            for text, l in zip(texts, labels):
                if l != label:
                    continue
                t = "_" + text + "_"
                for i in range(len(t) - 1):
                    trans[t[i]][t[i + 1]] += 1
            lm: dict[str, dict[str, float]] = {}
            for cur, nxt in trans.items():
                total = sum(nxt.values()) + self.smoothing * len(nxt)
                lm[cur] = {k: (v + self.smoothing) / total for k, v in nxt.items()}
            self.language_models[label] = lm

    def score(self, text: str) -> dict[str, float]:
        t = "_" + text + "_"
        bigrams = Counter((t[i], t[i + 1]) for i in range(len(t) - 1))
        scores = {}
        for lang, model in self.language_models.items():
            s = 0.0
            for (cur, nxt), c in bigrams.items():
                if cur in model and nxt in model[cur]:
                    s += c * math.log(model[cur][nxt] + self.smoothing)
            scores[lang] = s
        return scores

    def predict(self, texts) -> list[str]:
        return [max(self.score(t).items(), key=lambda x: x[1])[0] for t in texts]


def ct_profile(text: str, max_size: int = 400) -> list[tuple[str, int]]:
    """Ordered 1..5-gram profile (lieterature.py:12-21)."""
    grams: Counter = Counter()
    low = text.lower()
    for n in range(1, 6):
        padded = "_" * (n - 1) + low + "_" * (n - 1)
        for i in range(len(padded) - n + 1):
            grams[padded[i : i + n]] += 1
    return sorted(grams.items(), key=lambda x: (-x[1], x[0]))[:max_size]


class CavnarTrenkle:
    """Rank-profile out-of-place distance (lieterature.py:6-58)."""

    def __init__(self, max_profile_size: int = 400):
        self.max_profile_size = max_profile_size
        self.language_profiles: dict[str, list[tuple[str, int]]] = {}

    def train(self, texts, labels) -> None:
        for label in _sorted_langs(labels):
            combined = " ".join(t for t, l in zip(texts, labels) if l == label)
            self.language_profiles[label] = ct_profile(combined, self.max_profile_size)

    def distances(self, text: str) -> dict[str, int]:
        text_ngrams = [g for g, _ in ct_profile(text, self.max_profile_size)]
        dists = {}
        for lang, prof in self.language_profiles.items():
            rank = {g: j for j, (g, _) in enumerate(prof)}
            d = 0
            for i, g in enumerate(text_ngrams):
                d += abs(i - rank[g]) if g in rank else self.max_profile_size
            dists[lang] = d
        return dists

    def predict(self, texts) -> list[str]:
        return [min(self.distances(t).items(), key=lambda x: x[1])[0] for t in texts]


def dunning_features(text: str) -> Counter:
    """Char unigram + bigram features (lieterature.py:67-81)."""
    feats: Counter = Counter()
    low = text.lower()
    for ch in low:
        feats[f"c_{ch}"] += 1
    pad = "_" + low + "_"
    for i in range(len(pad) - 1):
        feats[f"bg_{pad[i : i + 2]}"] += 1
    return feats


class Dunning:
    """Smoothed log-likelihood classifier (lieterature.py:60-164)."""

    def __init__(self, smoothing: float = 0.5):
        self.smoothing = smoothing
        self.language_models: dict[str, dict[str, float]] = {}
        self.vocabulary: set[str] = set()

    def train(self, texts, labels) -> None:
        lang_feats: dict[str, Counter] = defaultdict(Counter)
        lang_totals: dict[str, float] = defaultdict(float)
        all_features: set[str] = set()
        for text, label in zip(texts, labels):
            f = dunning_features(text)
            all_features.update(f)
            lang_feats[label].update(f)
            lang_totals[label] += sum(f.values())
        self.vocabulary = all_features
        for label in _sorted_langs(labels):
            total = lang_totals[label]
            smoothed_total = total + self.smoothing * len(all_features)
            self.language_models[label] = {
                feat: (lang_feats[label].get(feat, 0) + self.smoothing) / smoothed_total
                for feat in all_features
            }

    def score(self, text: str) -> dict[str, float]:
        feats = dunning_features(text)
        scores = {}
        for lang, model in self.language_models.items():
            s, nf = 0.0, 0
            for feat, c in feats.items():
                if c > 0:
                    prob = model.get(feat, self.smoothing)  # raw 0.5 fallback
                    s += c * math.log(prob)
                    nf += c
            scores[lang] = s / nf if nf > 0 else float("-inf")
        return scores

    def predict(self, texts) -> list[str]:
        return [max(self.score(t).items(), key=lambda x: x[1])[0] for t in texts]
