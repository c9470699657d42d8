"""Declarative CorpusPipeline: config validation, funnel attrition,
and equivalence with hand-composed operator calls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the bank", "en", "web"),
        (2, "the quick brown fox jumps over the lazy dog near the bank", "en", "web"),  # exact dup of 1
        (3, "short", "en", "web"),  # fails min_tokens
        (4, "une phrase en francais avec beaucoup de mots pour le test", "fr", "web"),
        (5, "contact me at a.b@example.com for the secret data offer", "en", "spam"),
        (6, "totally unique english sentence that is long enough to pass the gate", "en", "web"),
        (7, "zz qq vv xx kk jj ww pp mm nn bb cc dd ff gg hh", "en", "web"),  # no stopwords
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")


def test_pipeline_validation_errors():
    from model_presto_spark.pipeline import CorpusPipeline

    with pytest.raises(ValueError, match="unknown op"):
        CorpusPipeline([{"op": "frobnicate"}])
    with pytest.raises(ValueError, match="unknown params"):
        CorpusPipeline([{"op": "quality_gate", "min_tokens": 1, "typo": 2}])
    with pytest.raises(ValueError, match="at least one stage"):
        CorpusPipeline([])


def test_pipeline_funnel_and_composition(corpus):
    from model_presto_spark.pipeline import CorpusPipeline

    pipe = CorpusPipeline([
        {"op": "scrub_pii"},
        {"op": "lang_filter", "keep": ["en"]},
        {"op": "quality_gate", "min_tokens": 8, "min_stopword": 0.05},
        {"op": "exact_dedup"},
    ])
    assert pipe.stage_names == [
        "scrub_pii", "lang_filter", "quality_gate", "exact_dedup",
    ]
    funnel = pipe.report(corpus)
    assert funnel[0] == ("input", 7)
    assert funnel[1] == ("scrub_pii", 7)       # transform, no drop
    assert funnel[2] == ("lang_filter", 6)     # doc 4 (fr) out
    assert funnel[3] == ("quality_gate", 4)    # docs 3 (short), 7 (no stop) out
    assert funnel[4] == ("exact_dedup", 3)     # dup pair collapses

    out = pipe.run(corpus)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept == {1, 5, 6}
    # PII was scrubbed in place before anything else
    doc5 = out.where(F.col("doc_id") == 5).first().text
    assert "@" not in doc5 and "<EMAIL>" in doc5


def test_pipeline_span_and_mix_stages(spark):
    from model_presto_spark.pipeline import CorpusPipeline

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [(i, f"prefix {i} words {shared}", "en", "a") for i in range(4)]
    rows += [(10 + i, f"doc {i} unique body with enough words here", "en", "b")
             for i in range(4)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    pipe = CorpusPipeline([
        {"op": "span_dedup_filter", "k": 8, "max_dup_fraction": 0.4},
    ])
    kept = {r.doc_id for r in pipe.run(docs).collect()}
    # the 4 shared-run docs are mostly duplicated windows -> dropped;
    # unique docs stay
    assert kept == {10, 11, 12, 13}


def test_pipeline_from_json_with_dataframe_ref(spark, corpus):
    from model_presto_spark.pipeline import CorpusPipeline

    bench = spark.createDataFrame(
        [(100, "totally unique english sentence that is long enough")],
        "doc_id bigint, text string",
    )
    cfg = """
    [
      {"op": "lang_filter", "keep": ["en"]},
      {"op": "contamination_filter", "benchmark": "$bench", "n": 5},
      {"op": "exact_dedup"}
    ]
    """
    pipe = CorpusPipeline.from_json(cfg, bench=bench)
    kept = {r.doc_id for r in pipe.run(corpus).collect()}
    # doc 6 overlaps the benchmark 5-grams -> decontaminated away;
    # fr doc 4 filtered; dup pair 1/2 collapsed to 1
    assert 6 not in kept and 4 not in kept
    assert 1 in kept and 2 not in kept

    with pytest.raises(ValueError, match="no bench"):
        CorpusPipeline.from_json(cfg)
    with pytest.raises(ValueError, match="must be a list"):
        CorpusPipeline.from_json('{"op": "exact_dedup"}')


def test_pipeline_span_remove_and_token_budget(spark):
    from model_presto_spark.pipeline import CorpusPipeline

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"unique opening words here {shared}", "a"),
        (2, f"different start tokens now {shared}", "a"),
        (3, "ten little words make up this third document body x", "b"),
        (4, "another ten word doc for the second source here y", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    pipe = CorpusPipeline([
        {"op": "span_remove", "k": 8},
        {"op": "token_budget", "budget_tokens": 10},
    ])
    out = {r.doc_id: r.text for r in pipe.run(docs).collect()}
    # span_remove cut the shared run from docs 1/2 (leaving 4-5
    # tokens), so both now fit source a's 10-token budget; source b
    # keeps only its first doc (10 tokens exactly), doc 4 overflows
    assert set(out) == {1, 2, 3}
    assert "charlie" not in out[1] and "charlie" not in out[2]
    assert out[1].startswith("unique opening")
    # non-text columns survived both stages
    cols = set(pipe.run(docs).columns)
    assert {"doc_id", "text", "source"} <= cols
