"""Candidates IR, training examples, filter_top_pred, OBO reader,
PubTator sink round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nilinker_spark.operators.candidates import candidates_ir, filter_top_pred, training_examples
from nilinker_spark.sources.corpora import (
    read_obo_kb,
    read_pubtator_corpus,
    write_obo_fixture,
    write_pubtator,
)


def test_training_examples(spark, kb):
    labeled = spark.createDataFrame(
        [(s if " " in s else s, g) for s, g, _ in kb.surface_forms[:20]],
        "entity string, label_kb_id string",
    )
    from nilinker_spark.functions.normalize import norm_form

    labeled = labeled.select(
        F.lower(F.col("entity")).alias("entity"), "label_kb_id"
    )
    ex = training_examples(spark, labeled, kb).collect()
    assert len(ex) == 20
    vocab_size = len(kb.word2id)
    for r in ex:
        assert 0 <= r["wc_l"] < vocab_size and 0 <= r["wc_r"] < vocab_size
        assert r["emb_l"] == r["wc_l"] and r["emb_r"] == r["wc_r"]
        assert r["label"] >= 0
    # single-token entities resolve both slots to the same word ([t,t] rule)
    singles = [r for r in ex if " " not in r["entity"]]
    assert all(r["wc_l"] == r["wc_r"] for r in singles)


def test_candidates_ir(spark):
    mentions = spark.createDataFrame(
        [("d1", "m1", "A"), ("d1", "m2", "B"), ("d1", "m3", "C"), ("d2", "m4", "A")],
        "doc_id string, mention string, kb_id string",
    )
    edges = spark.createDataFrame([("A", "B"), ("C", "D")], "child_id string, parent_id string")
    out = {(r["doc_id"], r["mention"]): r for r in candidates_ir(mentions, edges).collect()}
    # m1(A) and m2(B) are related within d1 via the A->B edge, both directions
    assert out[("d1", "m1")]["links"] == ["B"]
    assert out[("d1", "m2")]["links"] == ["A"]
    assert out[("d1", "m3")]["links"] == []  # C-D edge, but no D mention in d1
    assert out[("d2", "m4")]["links"] == []  # alone in its doc
    # degrees: A has out 1 (A->B), in 0; B in 1
    assert (out[("d1", "m1")]["out_count"], out[("d1", "m1")]["in_count"]) == (1, 0)
    assert out[("d1", "m2")]["in_count"] == 1


def test_filter_top_pred(spark):
    preds = spark.createDataFrame(
        [
            ("q1", ["X", "Y", "Z"], "X", "Y"),  # X held out -> Y -> correct
            ("q2", ["X", "Y"], "Z", "Y"),       # Z not in list -> X -> wrong
            ("q3", ["X"], "X", "Y"),            # all removed -> null answer
        ],
        "query_id string, ranked array<string>, true_id string, gold_id string",
    )
    out = {r["query_id"]: r for r in filter_top_pred(preds).collect()}
    assert out["q1"]["answer"] == "Y" and out["q1"]["is_correct"]
    assert out["q2"]["answer"] == "X" and not out["q2"]["is_correct"]
    assert out["q3"]["answer"] is None


@pytest.fixture(scope="module")
def obo_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("obo") / "kb.obo")
    info = write_obo_fixture(p)
    return p, info


def test_read_obo_kb(spark, obo_path):
    path, info = obo_path
    concepts, aliases, edges = read_obo_kb(spark, path)
    ids = {r["kb_id"] for r in concepts.collect()}
    # obsolete terms and OMIM ids excluded
    assert "OMIM:123" not in ids
    assert len(ids) == info["n_terms"] - info["n_obsolete"]
    # exactly one root (term 0)
    assert [r["kb_id"] for r in concepts.filter("is_root").collect()] == ["KB:0000"]
    # synonym overrides name on alias collision ('term 4')
    collided = aliases.filter(F.col("alias") == "term 4").collect()
    assert len(collided) == 1 and collided[0]["is_synonym"] and collided[0]["kb_id"] == "KB:0005"
    # multi-parent nodes exist in edges
    assert edges.groupBy("child_id").count().filter("count > 1").count() >= 1


def test_obo_namespace_filter(spark, obo_path):
    path, _ = obo_path
    concepts, _, _ = read_obo_kb(spark, path, namespace="biological_process")
    assert concepts.filter(~F.col("kb_id").startswith("KB:")).count() == 0
    assert concepts.count() > 0
    # only even-numbered fixture terms carry that namespace
    assert all(int(r["kb_id"][3:]) % 2 == 0 for r in concepts.collect())


def test_pubtator_sink_roundtrip(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pubt") / "sink")
    docs = spark.createDataFrame(
        [("d1", "Title One", "abstract text"), ("d2", "Title Two", "more text")],
        "doc_id string, title string, text string",
    )
    ann = spark.createDataFrame(
        [("d1", "mention a", "MESH:D1", None), ("d2", "mention b", "MESH:D2", None)],
        "doc_id string, mention string, kb_id string, ancestor_id string",
    )
    write_pubtator(ann, docs, out)
    back = read_pubtator_corpus(spark, out)
    got = {(r["doc_id"], r["mention"], r["kb_id"]) for r in back.collect()}
    assert got == {("d1", "mention a", "MESH:D1"), ("d2", "mention b", "MESH:D2")}
