"""Relational extraction fast path == Python greedy scan, exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nilinker_spark.operators.extract import (
    extract_mentions_df,
    extract_mentions_relational,
)
from nilinker_spark.plans import has_python_stage
from nilinker_spark.sources.webtext import gazetteer_from_documents, load_table, webtext_from_documents


@pytest.fixture(scope="module")
def derived(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    webtext = webtext_from_documents(docs).cache()
    gazetteer = gazetteer_from_documents(docs)
    return webtext, gazetteer


def test_fastpath_identical_to_python_path(spark, derived):
    webtext, gazetteer = derived
    py = extract_mentions_df(spark, webtext, gazetteer)
    rel = extract_mentions_relational(spark, webtext, gazetteer)
    assert py.exceptAll(rel).isEmpty() and rel.exceptAll(py).isEmpty()
    assert py.count() == rel.count() > 0


def test_fastpath_plan_is_python_free(spark, derived):
    webtext, gazetteer = derived
    rel = extract_mentions_relational(spark, webtext, gazetteer)
    assert not has_python_stage(rel)


def test_fastpath_greedy_overlap_runs(spark):
    """Hand-built overlap chain: tokens a b a b a — gazetteer {'a b','b a'}.
    Greedy takes pos 0 ('a b'), skips pos 1, takes pos 2 ('a b'); pos 3
    ('b a') is consumed."""
    wt = spark.createDataFrame(
        [("u", b"a b a b a", "a b a b a", "en")],
        "url string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.current_timestamp())
    out = extract_mentions_relational(spark, wt, {"a b", "b a"}).orderBy("pos").collect()
    assert [(r["pos"], r["surface"]) for r in out] == [(0, "a b"), (2, "a b")]
    # and the python path agrees
    py = extract_mentions_df(spark, wt, {"a b", "b a"}).orderBy("pos").collect()
    assert [(r["pos"], r["surface"]) for r in py] == [(0, "a b"), (2, "a b")]


def test_fastpath_rejects_non_bigram_gazetteer(spark, derived):
    webtext, _ = derived
    with pytest.raises(AssertionError):
        extract_mentions_relational(spark, webtext, {"single"})


def test_relational_guard_fires_on_multiword_normalization(spark):
    """A raw token that normalizes to two words ('foo.bar' -> 'foo bar')
    breaks the bigram-join equivalence; the relational path must raise
    loudly (in-plan assert), never silently diverge.  Also guards against
    Catalyst simplifying the equal-branch when() that carries the
    assert."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from nilinker_spark.operators.extract import extract_mentions_relational

    rows = [("u1", None, b"foo.bar baz", "foo.bar baz", "en")]
    webtext = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    gaz = {"foo bar"}
    df = extract_mentions_relational(spark, webtext, gaz)
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "extract_mentions_relational" in str(exc.value)


def test_norm_cache_eviction_keeps_zipf_head():
    """Overflow eviction drops the newest (tail) half and keeps the
    oldest (head) half — insertion order is the Zipf-frequency proxy."""
    from nilinker_spark.operators import extract as E

    saved = dict(E._NORM_CACHE)
    try:
        E._NORM_CACHE.clear()
        for i in range(100):
            E._NORM_CACHE[f"tok{i:03d}"] = (f"tok{i:03d}", 1)
        E._evict_norm_cache()
        assert len(E._NORM_CACHE) == 50
        assert "tok000" in E._NORM_CACHE and "tok049" in E._NORM_CACHE
        assert "tok050" not in E._NORM_CACHE and "tok099" not in E._NORM_CACHE
    finally:
        E._NORM_CACHE.clear()
        E._NORM_CACHE.update(saved)
