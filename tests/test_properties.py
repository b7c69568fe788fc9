"""Property-based tests (hypothesis) for the shared text primitives —
invariants the parity suites assume but never stress with adversarial
inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from language_identification_spark.functions.scrub import scrub_text
from language_identification_spark.functions.text import (
    py_char_ngrams,
    py_norm,
    py_quality_features,
    py_words,
)
from language_identification_spark.models.hashed_ngram import DIM, doc_bucket_ids
from language_identification_spark.models.perplexity import doc_bigram_keys

TEXT = st.text(min_size=0, max_size=400)
ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=300
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent(s):
    once = scrub_text(s)
    assert scrub_text(once) == once


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_bucket_ids_deterministic_and_bounded(s):
    a = doc_bucket_ids(s)
    b = doc_bucket_ids(s)
    assert (a == b).all()
    assert len(a) == (len(s) + 1) * 3  # one id per position per n in {1,2,3}
    if len(a):
        assert a.min() >= 0 and a.max() < DIM


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_bigram_keys_length(s):
    # '_' + text + '_' has len+1 transitions
    assert len(doc_bigram_keys(s)) == len(s) + 1


@given(TEXT, st.integers(min_value=1, max_value=5))
@settings(max_examples=200, deadline=None)
def test_char_ngrams_reference_padding(s, n):
    grams = py_char_ngrams(s, n)
    assert len(grams) == len(s) + 1  # padded length (len + n) - n + 1
    assert all(len(g) == n for g in grams)


@given(ASCII_TEXT)
@settings(max_examples=200, deadline=None)
def test_quality_features_invariants(s):
    f = py_quality_features(py_norm(s))
    assert f["n_chars"] >= 0 and f["n_words"] >= 0
    assert 0 <= f["distinct_word_ratio"] <= 1.0
    assert f["symbol_ratio"] >= 0
    if f["n_words"]:
        # mean word length over ws-split words never exceeds doc length
        assert 0 < f["mean_word_len"] <= max(f["n_chars"], 1)
    else:
        assert f["mean_word_len"] == 0.0
    assert 0 <= f["stopword_ratio"] <= 1.0
    assert 0 <= f["bullet_line_ratio"] <= 1.0
    assert 0 <= f["ellipsis_line_ratio"] <= 1.0
    assert 0 <= f["dup_line_ratio"] < 1.0  # n_lines ≥ 1 ⇒ at least 1 distinct


@given(ASCII_TEXT)
@settings(max_examples=200, deadline=None)
def test_words_reconstruct(s):
    norm = py_norm(s)
    ws = py_words(norm)
    assert sum(len(w) for w in ws) <= len(norm)
    for w in ws:
        assert w and not any(c in " \t\n\x0b\f\r" for c in w)
