from __future__ import annotations

from language_identification_spark.fixtures.pages import LANGS, gen_pages


def test_fixture_deterministic():
    a = gen_pages(n_rows=200, seed=42)
    b = gen_pages(n_rows=200, seed=42)
    assert a.equals(b)


def test_fixture_shape(pages_pdf):
    assert list(pages_pdf.columns) == ["url", "warc_ts", "html", "text", "lang", "split"]
    assert pages_pdf["url"].is_unique
    assert set(pages_pdf["lang"]) == set(LANGS)
    # pinned stratified split ≈ 80/20 per language
    frac = (pages_pdf["split"] == "test").mean()
    assert 0.15 < frac < 0.25
    # anomaly rows present (PII injection mode)
    assert pages_pdf["text"].str.contains("@example", regex=False).any()
    assert pages_pdf["text"].str.contains("!!!###", regex=False).any()


def test_fixture_spark_roundtrip(pages_df, pages_pdf):
    assert pages_df.count() == len(pages_pdf)
    row = pages_df.orderBy("url").first()
    assert row["html"].startswith(b"<html><body>")
