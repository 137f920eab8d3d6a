"""Corpus / KB source readers (SURVEY.md §2.1), Spark-relational.

Each reader mirrors one of the reference's file parsers but produces the
unified annotations DataFrame ``(doc_id, mention, kb_id, ancestor_id)``
— the Spark shape of the reference's ``{doc: {mention: [id, anc]}}``
dicts (/root/reference/src/utils/utils.py:190-193) — or a KB dimension.

Readers declare explicit schemas (never infer) and keep the parse
relational: ``from_json`` for JSON-lines, split/regexp projections for
PubTator and TSV, and mapInPandas only for the XML corpus where a real
parser is genuinely needed.  Fixture writers are seeded pure functions so
round-trips are testable without external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANNOTATIONS_SCHEMA = "doc_id string, mention string, kb_id string, ancestor_id string"


# ---------------------------------------------------------------------------
# JSON-lines corpus (≙ parse_PBDMS, /root/reference/src/evanil/annotations.py:56-149)
# ---------------------------------------------------------------------------

_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "mentions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("mesh_id", T.StringType()),
                        T.StructField("mention", T.StringType()),
                        T.StructField("start_offset", T.LongType()),
                        T.StructField("end_offset", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


def read_jsonl_corpus(spark: SparkSession, path: str, parents: DataFrame) -> DataFrame:
    """JSON-lines docs -> annotations: explode the mentions array, prefix
    ids (≙ 'MESH:' + mesh_id, annotations.py:107), inner-join the parent
    dim (mentions whose concept lacks a single parent are dropped,
    ≙ annotations.py:112-119), first-mention-wins dedup per doc."""
    docs = spark.read.schema(_JSONL_SCHEMA).json(path)
    ann = (
        docs.select(F.col("_id").alias("doc_id"), F.explode("mentions").alias("m"))
        .select(
            "doc_id",
            F.col("m.mention").alias("mention"),
            F.concat(F.lit("MESH:"), F.col("m.mesh_id")).alias("kb_id"),
        )
        .dropDuplicates(["doc_id", "mention"])
    )
    return ann.join(F.broadcast(parents), ann.kb_id == parents.child_id, "inner").select(
        "doc_id", "mention", "kb_id", F.col("parent_id").alias("ancestor_id")
    )


# ---------------------------------------------------------------------------
# PubTator text corpus (≙ parse_MedMentions / parse_Pubtator,
# /root/reference/src/evanil/annotations.py:254-307, src/REEL/annotations.py:14-115)
# ---------------------------------------------------------------------------


def read_pubtator_corpus(spark: SparkSession, path: str) -> DataFrame:
    """PubTator blocks: ``id|t|title`` / ``id|a|abstract`` lines plus
    annotation rows ``id<TAB>start<TAB>end<TAB>mention<TAB>type<TAB>kb``.

    Pure projections: filter out title/abstract rows, split the TSV rows
    by position (the reference hard-codes [3] and [5] the same way,
    annotations.py:279-283), normalize composite ids (take the first of
    'a|b' / 'a+b', ≙ REEL/annotations.py id fix-ups)."""
    lines = spark.read.text(path)
    ann = lines.filter(
        ~F.col("value").contains("|t|") & ~F.col("value").contains("|a|") & (F.length("value") > 0)
    )
    parts = F.split(F.col("value"), "\t")
    kb_raw = F.try_element_at(parts, F.lit(6))
    kb_first = F.split(kb_raw, "[|+]")[0]
    return (
        ann.select(
            F.try_element_at(parts, F.lit(1)).alias("doc_id"),
            F.try_element_at(parts, F.lit(4)).alias("mention"),
            F.when(kb_first.startswith("MESH:") | kb_first.startswith("OMIM:"), kb_first)
            .otherwise(F.concat(F.lit("MESH:"), kb_first))
            .alias("kb_id"),
        )
        .filter(F.col("mention").isNotNull() & F.col("kb_id").isNotNull())
        .dropDuplicates(["doc_id", "mention"])
        .withColumn("ancestor_id", F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# knowtator-style XML corpus (≙ parse_CRAFT, annotations.py:152-251)
# ---------------------------------------------------------------------------


def read_xml_corpus(spark: SparkSession, path: str) -> DataFrame:
    """One XML file per doc: <annotation><span .../><class id= text=/></annotation>.

    Whole-file read + stdlib XML parse inside mapInPandas (the one §2.1
    source where a real parser beats regexes)."""
    files = spark.read.format("binaryFile").load(path + "/*.xml").select("path", "content")

    def parse(batches):
        import os
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in batches:
            doc_ids, mentions, kb_ids = [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                doc_id = os.path.basename(p).rsplit(".", 1)[0]
                root = ET.fromstring(bytes(content).decode("utf-8"))
                for a in root.iter("annotation"):
                    cls = a.find("class")
                    if cls is None:
                        continue
                    doc_ids.append(doc_id)
                    mentions.append(cls.get("text") or "")
                    kb_ids.append(cls.get("id") or "")
            yield pd.DataFrame({"doc_id": doc_ids, "mention": mentions, "kb_id": kb_ids})

    return (
        files.mapInPandas(parse, "doc_id string, mention string, kb_id string")
        .dropDuplicates(["doc_id", "mention"])
        .withColumn("ancestor_id", F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# CTD-style TSV KB (≙ KnowledgeBase.load_tsv, /root/reference/src/utils/kbs.py:144-199)
# ---------------------------------------------------------------------------


def read_ctd_tsv_kb(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Tab TSV with '#' comment header, |-separated multi-valued parent and
    synonym cells -> (concepts, aliases, edges) dimension frames.

    comment='#' replaces the reference's skip-29-rows; split+explode
    replaces its per-cell Python loops (kbs.py:168-178)."""
    raw = spark.read.csv(path, sep="\t", comment="#").toDF(
        "name", "kb_id", "alt", "parents", "tree", "x0", "x1", "synonyms"
    )
    concepts = raw.select("kb_id", "name").withColumn("is_root", F.lit(False))
    names = raw.select(F.col("name").alias("alias"), "kb_id", F.lit(False).alias("is_synonym"))
    syns = (
        raw.filter(F.col("synonyms").isNotNull())
        .select(F.explode(F.split("synonyms", "\\|")).alias("alias"), "kb_id")
        .filter(F.length("alias") > 0)
        .withColumn("is_synonym", F.lit(True))
    )
    aliases = names.unionByName(syns).dropDuplicates(["alias", "kb_id"])
    edges = (
        raw.filter(F.col("parents").isNotNull())
        .select(F.col("kb_id").alias("child_id"), F.explode(F.split("parents", "\\|")).alias("parent_id"))
        .filter(F.length("parent_id") > 0)
    )
    return concepts, aliases, edges


def single_parent_dim(edges: DataFrame) -> DataFrame:
    """child->parent for children with exactly one parent (broadcastable
    dim used by read_jsonl_corpus; ≙ kbs.py:84-90)."""
    counts = edges.groupBy("child_id").agg(F.count("*").alias("n"))
    return (
        edges.join(counts.filter(F.col("n") == 1).select("child_id"), "child_id")
        .select("child_id", "parent_id")
    )


# ---------------------------------------------------------------------------
# seeded fixture writers (no external data; SURVEY.md §5)
# ---------------------------------------------------------------------------


def write_corpus_fixtures(spark: SparkSession, base: str, seed: int = 42, n_docs: int = 40) -> dict:
    """Write one fixture file/dir per format; returns paths + expected counts."""
    import json
    import os

    import numpy as np

    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "kappa"]
    concepts = [f"D{i:03d}" for i in range(20)]

    os.makedirs(base, exist_ok=True)
    # KB TSV: name, id, alt, parents(|), tree, x0, x1, synonyms(|)
    tsv_path = os.path.join(base, "kb.tsv")
    with open(tsv_path, "w") as f:
        f.write("# CTD-style header\n# more header\n")
        for i, c in enumerate(concepts):
            parents = "" if i == 0 else f"MESH:{concepts[int(rng.integers(0, i))]}"
            if i > 10 and rng.random() < 0.3:
                parents += f"|MESH:{concepts[int(rng.integers(0, i))]}"
            syns = "|".join(f"{words[int(rng.integers(0,8))]} {c.lower()}" for _ in range(int(rng.integers(0, 3))))
            f.write(f"{words[i % 8]} {c.lower()}\tMESH:{c}\t\t{parents}\t\t\t\t{syns}\n")

    # JSON-lines corpus
    jsonl_path = os.path.join(base, "corpus.jsonl")
    n_jsonl_mentions = 0
    with open(jsonl_path, "w") as f:
        for d in range(n_docs):
            ms = []
            for _ in range(int(rng.integers(1, 5))):
                c = concepts[int(rng.integers(0, 20))]
                ms.append(
                    {"mesh_id": c, "mention": f"{words[int(rng.integers(0,8))]} {c.lower()}", "start_offset": 0, "end_offset": 5}
                )
            n_jsonl_mentions += len(ms)
            f.write(json.dumps({"_id": f"jd{d}", "title": "t", "text": "x", "mentions": ms}) + "\n")

    # PubTator corpus
    pub_path = os.path.join(base, "corpus.pubtator")
    with open(pub_path, "w") as f:
        for d in range(n_docs):
            f.write(f"pd{d}|t|some title\npd{d}|a|some abstract\n")
            for _ in range(int(rng.integers(1, 4))):
                c = concepts[int(rng.integers(0, 20))]
                comp = f"MESH:{c}" if rng.random() < 0.7 else f"MESH:{c}|MESH:{concepts[0]}"
                f.write(f"pd{d}\t0\t5\t{words[int(rng.integers(0,8))]} {c.lower()}\tChemical\t{comp}\n")
            f.write("\n")

    # knowtator-style XML dir
    xml_dir = os.path.join(base, "xml")
    os.makedirs(xml_dir, exist_ok=True)
    for d in range(min(n_docs, 10)):
        anns = "".join(
            f'<annotation><span start="0" end="5"/><class id="MESH:{concepts[int(rng.integers(0,20))]}" text="{words[int(rng.integers(0,8))]}"/></annotation>'
            for _ in range(int(rng.integers(1, 4)))
        )
        with open(os.path.join(xml_dir, f"xd{d}.xml"), "w") as f:
            f.write(f"<document>{anns}</document>")

    return {
        "tsv": tsv_path,
        "jsonl": jsonl_path,
        "pubtator": pub_path,
        "xml": xml_dir,
        "n_docs": n_docs,
        "n_jsonl_mentions": n_jsonl_mentions,
    }
