"""Source readers (SURVEY.md §2.1): JSON-lines, PubTator, XML, CTD TSV."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nilinker_spark.sources.corpora import (
    read_ctd_tsv_kb,
    read_jsonl_corpus,
    read_pubtator_corpus,
    read_xml_corpus,
    single_parent_dim,
    write_corpus_fixtures,
)


@pytest.fixture(scope="module")
def fixtures(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("corpora"))
    return write_corpus_fixtures(spark, base)


def test_ctd_tsv_kb(spark, fixtures):
    concepts, aliases, edges = read_ctd_tsv_kb(spark, fixtures["tsv"])
    assert concepts.count() == 20
    # every concept's canonical name is an alias; synonyms are extras
    assert aliases.filter(~F.col("is_synonym")).count() == 20
    assert aliases.filter(F.col("is_synonym")).count() >= 1
    # root has no parent edge
    assert edges.filter(F.col("child_id") == "MESH:D000").count() == 0
    # multi-valued parent cells exploded to one row per edge
    multi = edges.groupBy("child_id").count().filter(F.col("count") > 1)
    assert multi.count() >= 1


def test_single_parent_dim(spark, fixtures):
    _, _, edges = read_ctd_tsv_kb(spark, fixtures["tsv"])
    sp = single_parent_dim(edges)
    # children with >1 parent are excluded
    multi_children = {r["child_id"] for r in edges.groupBy("child_id").count().filter(F.col("count") > 1).collect()}
    got = {r["child_id"] for r in sp.collect()}
    assert got.isdisjoint(multi_children)
    assert len(got) > 0


def test_jsonl_corpus(spark, fixtures):
    _, _, edges = read_ctd_tsv_kb(spark, fixtures["tsv"])
    parents = single_parent_dim(edges)
    ann = read_jsonl_corpus(spark, fixtures["jsonl"], parents)
    rows = ann.collect()
    assert len(rows) > 0
    # every surviving annotation has an ancestor (inner parent join)
    assert all(r["ancestor_id"] is not None for r in rows)
    assert all(r["kb_id"].startswith("MESH:") for r in rows)
    # mention dedup per doc
    assert ann.groupBy("doc_id", "mention").count().filter(F.col("count") > 1).count() == 0


def test_pubtator_corpus(spark, fixtures):
    ann = read_pubtator_corpus(spark, fixtures["pubtator"])
    rows = ann.collect()
    assert len(rows) > 0
    assert {r["doc_id"] for r in rows} == {f"pd{d}" for d in range(fixtures["n_docs"])}
    # composite ids 'a|b' reduced to the first id
    assert all("|" not in r["kb_id"] and r["kb_id"].startswith("MESH:") for r in rows)


def test_xml_corpus(spark, fixtures):
    ann = read_xml_corpus(spark, fixtures["xml"])
    rows = ann.collect()
    assert len(rows) > 0
    assert all(r["doc_id"].startswith("xd") for r in rows)
    assert all(r["kb_id"].startswith("MESH:") for r in rows)
