"""Golden-replay test (FIXTURES.md §2, reference src/evaluate.py analogue):
the committed golden_output.parquet pins the oracle's full-pipeline output
at authoring time. Both the live oracle AND the Spark pipeline must still
reproduce it — this catches oracle+Spark drifting together (shared-code
parity alone cannot)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from language_identification_spark.oracle.pipeline import (
    run_oracle_pipeline,
    train_oracle_models,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_output.parquet")
F64MAX = np.finfo("float64").max


def _canon_ppl(v: float) -> float:
    return F64MAX if np.isinf(v) else v


def test_oracle_matches_golden(pages_pdf):
    golden = pd.read_parquet(GOLDEN).set_index("url")
    nb, lm = train_oracle_models(pages_pdf[pages_pdf["split"] == "train"][["text", "lang"]])
    live = run_oracle_pipeline(pages_pdf, nb, lm).set_index("url")
    assert len(live) == len(golden)
    for url, g in golden.iterrows():
        l = live.loc[url]
        assert bool(l["keep"]) == bool(g["keep"]), url
        assert l["lang_pred"] == g["lang_pred"], url
        assert l["scrubbed_text"] == g["scrubbed_text"], url
        assert l["lang_conf"] == g["lang_conf"], url
        assert _canon_ppl(l["perplexity"]) == g["perplexity"], url


def test_spark_matches_golden(spark, pages_df):
    from language_identification_spark.pipeline.quality import (
        run_quality_pipeline,
        train_quality_models,
    )

    golden = pd.read_parquet(GOLDEN).set_index("url")
    models = train_quality_models(pages_df.filter("split = 'train'"))
    out = run_quality_pipeline(spark, pages_df, models)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == len(golden)
    for url, g in golden.iterrows():
        r = rows[url]
        assert r["keep"] == bool(g["keep"]), url
        assert r["lang_pred"] == g["lang_pred"], url
        assert r["scrubbed_text"] == g["scrubbed_text"], url
        assert r["lang_conf"] == g["lang_conf"], url
        assert _canon_ppl(r["perplexity"]) == g["perplexity"], url
