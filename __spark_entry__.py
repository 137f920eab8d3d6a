"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ER pipeline on sf0.001.
``queries()`` exposes one entry per implemented operator (SURVEY.md §2 +
the training-data corpus ops); ``oracle_sql()`` gives the DuckDB twin for
every SQL-expressible one (non-SQL-expressible ops — the attention UDF
and the iterative connected-components pipeline — are rows-only checks).

All hashes cross the engines via md5 (``h60``: conv(substr(md5,1,15),16,10)
== DuckDB ('0x'||substr(md5,1,15))::bigint), so value-hash comparison is
exact, not approximate.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nilinker_spark.fixtures.kb import make_kb
from nilinker_spark.operators import corpus as C
from nilinker_spark.pipeline import resolve
from nilinker_spark.sources.webtext import (
    gazetteer_from_documents,
    load_table,
    webtext_from_documents,
)

# DuckDB twin of corpus.h60
_H60 = "cast(('0x' || substr(md5({x}), 1, 15)) as bigint)"

# Hot-shingle document-frequency cap for the shingle-based dedup queries
# (operators.corpus.cap_shingle_df): shingles in > this many docs are
# boilerplate — at 100 TB one navbar shingle across 10^6 docs would make
# the shared-shingle equi-join quadratic in that bucket.  5 fires on the
# sf0.01 contract data (29 shingles dropped), so the DuckDB twin proves
# the capped semantics hash-exactly.
DEDUP_MAX_SHINGLE_DF = 5


def _docs(spark: SparkSession, sf_dir: str, split: bool = True) -> DataFrame:
    # split=False callers: queries whose map-side per-row work is light
    # (one pass, no gram-explosion fan-out), where the load_table re-split
    # exchange was measured as pure overhead (see load_table docstring)
    return load_table(spark, sf_dir, "documents", split=split)


# Contract queries that produce their result inside a TEMPORARY directory
# (stream sinks, throwaway checkpoint dirs) must materialize before
# cleanup.  The guard keeps that collect honest: it is for contract-scale
# data only (10^3-10^4 rows at the driver's sf0.01), and a future caller
# pointing these at a big sf fails loudly instead of OOM-ing the driver.
_MATERIALIZE_MAX_ROWS = 200_000


def _materialize(spark: SparkSession, df: DataFrame) -> DataFrame:
    rows = df.limit(_MATERIALIZE_MAX_ROWS + 1).collect()
    if len(rows) > _MATERIALIZE_MAX_ROWS:
        raise RuntimeError(
            f"contract materialization exceeds {_MATERIALIZE_MAX_ROWS} rows — "
            "this collect is sized for contract-scale data only"
        )
    return spark.createDataFrame(rows, df.schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline (extract -> block -> score -> cluster)
    over webtext derived from sf0.001 documents."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir)
    webtext = webtext_from_documents(docs)
    gazetteer = gazetteer_from_documents(docs)
    kb = make_kb(seed=42)
    return resolve(spark, webtext, kb, gazetteer=gazetteer)


# ---------------------------------------------------------------------------
# queries — each maps to an operator row in SURVEY.md §2
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- §2.2 projections / filters ---------------------------------------
    def mention_dedup(spark, sf):
        # ≙ add_or_ignore_annot dedup + >=3-char token filter
        return C.doc_tokens(_docs(spark, sf), min_len=3)

    q["mention_dedup"] = mention_dedup

    # --- §2.4 aggregations --------------------------------------------------
    def term_frequency(spark, sf):
        # ≙ information_content.py:17-27 term counts
        return (
            C.doc_tokens(_docs(spark, sf), 3)
            .groupBy("token")
            .agg(F.count("*").alias("freq"))
        )

    q["term_frequency"] = term_frequency

    def information_content(spark, sf):
        # ≙ ic = -log((f+1)/(max+1)) + 2  (information_content.py:31-39)
        tf = term_frequency(spark, sf)
        mx = tf.agg(F.max("freq").alias("max_freq"))
        return tf.crossJoin(F.broadcast(mx)).select(
            "token",
            F.round(-F.log((F.col("freq") + 1) / (F.col("max_freq") + 1)) + 2, 6).alias("ic"),
        )

    q["information_content"] = information_content

    def dataset_statistics(spark, sf):
        # ≙ get_dataset_statistics bucketing (utils.py:562-637)
        return (
            C.doc_tokens(_docs(spark, sf), 1)
            .select(F.least(F.length("token"), F.lit(8)).alias("len_bucket"))
            .groupBy("len_bucket")
            .agg(F.count("*").alias("n_mentions"))
        )

    q["dataset_statistics"] = dataset_statistics

    def entity_repetition(spark, sf):
        # ≙ entityCount (ppr_for_ned_all.java:833-837): same token seen n>1 times in a doc
        docs = _docs(spark, sf)
        toks = docs.select("doc_id", F.explode(C.tokens_col("text", 3)).alias("token"))
        return (
            toks.groupBy("doc_id", "token")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )

    q["entity_repetition"] = entity_repetition

    # --- §2.3 joins -----------------------------------------------------------
    def block_candidate_join(spark, sf):
        # ≙ WC candidate lookup: mentions x broadcast top-50-token dim
        tf = term_frequency(spark, sf)
        dim = tf.orderBy(F.desc("freq"), F.asc("token")).limit(50).select("token")
        return C.doc_tokens(_docs(spark, sf), 3).join(F.broadcast(dim), "token").select(
            "doc_id", "token"
        )

    q["block_candidate_join"] = block_candidate_join

    def refine_test_anti_join(spark, sf):
        # ≙ refine_test_set (dataset.py:13-106): test-split mention surfaces
        # (word bigrams) minus those seen in the train split
        docs = _docs(spark, sf)
        toks = C.tokens_col("text")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
        bg = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
        mentions = docs.select(
            "doc_id", F.explode(bg).alias("mention")
        ).filter(F.size(F.split("mention", " ")) == 2)
        train = mentions.filter(F.col("doc_id") % 20 < 14).select("mention").distinct()
        test = mentions.filter(F.col("doc_id") % 20 >= 17).select("mention").distinct()
        return test.join(train, "mention", "left_anti")

    q["refine_test_anti_join"] = refine_test_anti_join

    def pair_generation(spark, sf):
        # ≙ within-block candidate pair self-join, capped 8/block (skew guard)
        tf = term_frequency(spark, sf)
        dim = tf.orderBy(F.desc("freq"), F.asc("token")).limit(50).select("token")
        members = C.doc_tokens(_docs(spark, sf), 3).join(F.broadcast(dim), "token")
        w = Window.partitionBy("token").orderBy("doc_id")
        capped = members.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 8)
        a = capped.select(F.col("token"), F.col("doc_id").alias("doc_a"))
        b = capped.select(F.col("token"), F.col("doc_id").alias("doc_b"))
        return (
            a.join(b, "token")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )

    q["pair_generation"] = pair_generation

    def fuzzy_topk(spark, sf):
        # ≙ rapidfuzz top-1 fallback join (utils.py:321-327) as a blocked
        # theta-join: 50 OOV probes x 100-word vocab, argmin levenshtein
        tf = term_frequency(spark, sf)
        vocab = tf.orderBy(F.desc("freq"), F.asc("token")).limit(100).select(
            F.col("token").alias("word")
        )
        docs = _docs(spark, sf)
        toks = C.tokens_col("text")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
        bg = F.transform(idx, lambda i: F.concat_ws("_", F.slice(toks, i + 1, 2)))
        probes = (
            docs.select(F.explode(bg).alias("probe"))
            .filter(F.size(F.split("probe", "_")) == 2)
            .distinct()
            .orderBy("probe")
            .limit(50)
        )
        scored = probes.crossJoin(F.broadcast(vocab)).withColumn(
            "lev", F.levenshtein("probe", "word")
        )
        w = Window.partitionBy("probe").orderBy(F.asc("lev"), F.asc("word"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("probe", "word", "lev")
        )

    q["fuzzy_topk"] = fuzzy_topk

    # --- §2.5 window / top-k ---------------------------------------------------
    def window_topk(spark, sf):
        # top-3 tokens per lang by frequency (deterministic tie-break)
        docs = _docs(spark, sf)
        toks = docs.select("lang", F.explode(C.tokens_col("text", 3)).alias("token"))
        counts = toks.groupBy("lang", "token").agg(F.count("*").alias("freq"))
        w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("token"))
        return (
            counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("lang", "token", "freq", "rank")
        )

    q["window_topk"] = window_topk

    # --- §2.6 set ops ------------------------------------------------------------
    def split_assign(spark, sf):
        # ≙ 70/15/15 split (dataset.py:243-329), deterministic bucketing
        return (
            _docs(spark, sf)
            .select(
                F.when(F.col("doc_id") % 20 < 14, "train")
                .when(F.col("doc_id") % 20 < 17, "dev")
                .otherwise("test")
                .alias("split")
            )
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"))
        )

    q["split_assign"] = split_assign

    # --- §2.7 scalar functions ------------------------------------------------
    def scalar_normalize(spark, sf):
        # ≙ plural strip + case/char normalization (candidates.py:39-41,421-422)
        toks = C.doc_tokens(_docs(spark, sf), 3).select("token").distinct()
        singular = F.when(
            (F.length("token") > 3)
            & F.col("token").endswith("s")
            & ~F.col("token").endswith("ss"),
            F.expr("substring(token, 1, length(token) - 1)"),
        ).otherwise(F.col("token"))
        return toks.select(
            "token",
            singular.alias("singular"),
            (singular != F.col("token")).alias("is_plural"),
        )

    q["scalar_normalize"] = scalar_normalize

    # --- corpus ops: dedup family ---------------------------------------------
    q["dedup_exact"] = lambda spark, sf: C.dedup_exact(_docs(spark, sf))
    q["dedup_ngram_jaccard"] = lambda spark, sf: C.ngram_jaccard_pairs(
        _docs(spark, sf), max_shingle_df=DEDUP_MAX_SHINGLE_DF
    )
    q["dedup_minhash_lsh"] = lambda spark, sf: C.minhash_lsh_pairs(
        _docs(spark, sf), max_shingle_df=DEDUP_MAX_SHINGLE_DF
    )
    q["dedup_clusters"] = lambda spark, sf: C.dedup_clusters(
        _docs(spark, sf), max_shingle_df=DEDUP_MAX_SHINGLE_DF
    )
    q["dedup_simhash"] = lambda spark, sf: C.simhash(_docs(spark, sf, split=False))

    def embedding_neardup(spark, sf):
        return C.embedding_neardup_pairs(load_table(spark, sf, "embeddings"), threshold=0.5, dim=64)

    q["embedding_neardup"] = embedding_neardup

    # --- corpus ops: similarity search -----------------------------------------
    def _queries_df(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
        )

    def ann_topk(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return C.ann_topk_bruteforce(emb, _queries_df(spark, sf), k=5, dim=64)

    q["ann_topk"] = ann_topk

    def ann_topk_lsh(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return C.ann_topk_lsh(emb, _queries_df(spark, sf), k=5, dim=64)

    # hash-exact oracle: the hyperplanes are literal constants shared with
    # the SQL twin (recall vs brute force is tested separately in
    # tests/test_corpus.py — the oracle checks the LSH output itself)
    q["ann_topk_lsh"] = ann_topk_lsh

    def ann_topk_ivf(spark, sf):
        emb = load_table(spark, sf, "embeddings")
        return C.ann_topk_ivf(emb, _queries_df(spark, sf), k=5, n_centroids=16, n_probe=4, dim=64)

    # the second ANN scale path (brief: "IVF or LSH-bucketed"): md5-stride
    # centroids are deterministic and engine-reproducible, so the whole
    # route-then-search is hash-exact against the SQL twin
    q["ann_topk_ivf"] = ann_topk_ivf

    def ann_topk_ivf_trained(spark, sf):
        """The recall-lifting trained quantizer as its own contract row
        (VERDICT r4 #6): one deterministic Lloyd refinement round — per-
        cell means rounded to 4 dp, relational — before the same
        route-then-search.  The DuckDB twin re-derives the Lloyd round
        (unnest → avg by (cell, dim) → reassemble → re-assign), so the
        trained path is oracle-checked, not just recall-tested."""
        emb = load_table(spark, sf, "embeddings")
        return C.ann_topk_ivf(
            emb,
            _queries_df(spark, sf),
            k=5,
            n_centroids=16,
            n_probe=4,
            lloyd_iters=1,
            dim=64,
        )

    q["ann_topk_ivf_trained"] = ann_topk_ivf_trained

    def embedding_neardup_lsh(spark, sf):
        # threshold 0.2: the synthetic embeddings have no true near-dups,
        # so 0.5 returns zero rows — 0.2 keeps the oracle comparison
        # non-vacuous (~60 bucket-verified pairs at sf0.01)
        return C.embedding_neardup_lsh(
            load_table(spark, sf, "embeddings"), threshold=0.2, dim=64
        )

    q["embedding_neardup_lsh"] = embedding_neardup_lsh

    def embedding_neardup_clusters(spark, sf):
        return C.embedding_neardup_clusters(
            load_table(spark, sf, "embeddings"), threshold=0.2, dim=64
        )

    q["embedding_neardup_clusters"] = embedding_neardup_clusters

    def clean_corpus(spark, sf):
        return C.clean_corpus(_docs(spark, sf), max_shingle_df=DEDUP_MAX_SHINGLE_DF)

    q["clean_corpus"] = clean_corpus

    # --- corpus ops: text analysis ----------------------------------------------
    q["repetition_metrics"] = lambda spark, sf: C.repetition_metrics(_docs(spark, sf))
    q["remove_stopwords"] = lambda spark, sf: C.remove_stopwords(_docs(spark, sf))
    q["text_quality"] = lambda spark, sf: C.text_quality(_docs(spark, sf, split=False))
    q["token_counts"] = lambda spark, sf: C.token_counts(_docs(spark, sf))
    q["lang_id"] = lambda spark, sf: C.lang_id(_docs(spark, sf))
    q["fingerprint"] = lambda spark, sf: C.fingerprint(_docs(spark, sf, split=False))
    q["lm_bigram_score"] = lambda spark, sf: C.lm_bigram_score(_docs(spark, sf))

    # --- corpus ops: training-set preparation (new r5) ---------------------------
    def decontaminate(spark, sf):
        # benchmark/eval split is deterministic (doc_id % 97): training
        # docs sharing any word trigram with the benchmark are dropped
        docs = _docs(spark, sf)
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        train = docs.filter(F.col("doc_id") % 97 != 0)
        return C.decontaminate(train, bench, k=3)

    q["decontaminate"] = decontaminate

    q["importance_resample"] = lambda spark, sf: C.importance_resample(_docs(spark, sf))

    # bucket_width=64 so the sf0.01 corpus (500 docs) spans ~8 prefix
    # buckets — the distributed prefix sum's cross-bucket offsets are
    # actually exercised, not degenerate
    q["pack_sequences"] = lambda spark, sf: C.pack_sequences(
        _docs(spark, sf, split=False), budget=2048, bucket_width=64
    )

    # threshold 0.70 sits inside the sf0.01 per-source mean range
    # (0.66-0.75), so both keep outcomes are populated
    q["source_stats"] = lambda spark, sf: C.source_stats(
        _docs(spark, sf), min_mean_quality=0.70
    )

    # --- events: windowed agg + sessionization ----------------------------------
    def windowed_agg(spark, sf):
        # split=False: the map side is a trivial projection feeding the
        # keyed aggregation exchange — re-splitting the input would be a
        # second, pure-overhead shuffle (guide §2.4)
        ev = load_table(spark, sf, "events", split=False)
        return (
            ev.groupBy(
                F.date_trunc("hour", "ts").cast("string").alias("hour"),
                "event_type",
            )
            # value is exact 2-dp money: average in EXACT integer cents,
            # then fix to 4 dp by INTEGER division — no float round at
            # all.  round(avg(double),4) diverged two ways at sf0.1:
            # partial-agg order ulps on the float sum, and (after making
            # the sum exact) the .xxxx5 quotients themselves — Spark
            # rounds the shortest-decimal repr (HALF_UP -> up) while
            # DuckDB rounds the binary value (just below .5 -> down).
            # cents*100 div n floors identically in both engines
            # (values are non-negative; floor == trunc).
            .agg(
                F.count("*").alias("n"),
                (
                    F.expr(
                        "(sum(cast(round(value * 100) as bigint)) * 100) div count(*)"
                    )
                    / 10000.0
                ).alias("avg_value"),
            )
        )

    q["windowed_agg"] = windowed_agg

    def sessionization(spark, sf):
        # split=False: first operation is the user_id window exchange
        ev = load_table(spark, sf, "events", split=False)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                    - F.unix_micros(F.col("prev_ts").cast("timestamp_ltz"))
                    > 1800 * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        return gaps.groupBy("user_id").agg(F.sum("new_sess").alias("n_sessions"))

    q["sessionization"] = sessionization

    # --- evaluation metrics (≙ evaluation_evanil.py:95-135, REEL stats) -----
    def eval_lang_micro(spark, sf):
        from nilinker_spark.operators.evaluate import micro_prf

        docs = _docs(spark, sf)
        j = C.lang_id(docs).join(docs.select("doc_id", "lang"), "doc_id").select(
            F.col("pred_lang").alias("pred"), F.col("lang").alias("gold")
        )
        return micro_prf(j)

    q["eval_lang_micro"] = eval_lang_micro

    def eval_lang_per_class(spark, sf):
        from nilinker_spark.operators.evaluate import per_class_prf

        docs = _docs(spark, sf)
        j = C.lang_id(docs).join(docs.select("doc_id", "lang"), "doc_id").select(
            F.col("pred_lang").alias("pred"), F.col("lang").alias("gold")
        )
        return per_class_prf(j)

    q["eval_lang_per_class"] = eval_lang_per_class

    def class_weights(spark, sf):
        # ≙ inverse-frequency class weights (train.py:123-129)
        docs = _docs(spark, sf)
        counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
        total = docs.count()
        n_classes = counts.count()
        return counts.select(
            "lang", F.round(F.lit(total) / (F.lit(n_classes) * F.col("n")), 6).alias("weight")
        )

    q["class_weights"] = class_weights

    def sample_head(spark, sf):
        # ≙ 10% deterministic sample head (utils.py:496-521) — order-stable
        docs = _docs(spark, sf)
        n = docs.count() // 10
        return docs.orderBy("doc_id").limit(n).select("doc_id")

    q["sample_head"] = sample_head

    def scalar_id_coercion(spark, sf):
        # ≙ candidate-id numeric coercion (REEL/candidates.py:202-226)
        return (
            _docs(spark, sf)
            .select("source")
            .distinct()
            .select(
                "source",
                F.regexp_extract("source", "([0-9]+)$", 1).cast("int").alias("source_num"),
            )
        )

    q["scalar_id_coercion"] = scalar_id_coercion

    # --- graph ops over driver tables (≙ SURVEY §2.9) ------------------------
    def degree_lookup(spark, sf):
        from nilinker_spark.operators.graph import degrees

        edges = load_table(spark, sf, "orders").select(
            F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst")
        )
        return degrees(edges)

    q["degree_lookup"] = degree_lookup

    def graph_bfs_depths(spark, sf):
        """Shortest-path depth from a root (≙ nx.shortest_path_length to
        the ontology root, analysis/ancestors.py:65-72): BFS with
        iterative frontier joins over the customer→nation→region
        hierarchy, rooted at region 0 — each node at its minimum depth."""
        from nilinker_spark.operators.graph import bfs_depths

        nat = load_table(spark, sf, "nation")
        cust = load_table(spark, sf, "customer")
        e1 = nat.select(
            F.concat(F.lit("n"), "n_nationkey").alias("src"),
            F.concat(F.lit("r"), "n_regionkey").alias("dst"),
        )
        e2 = cust.select(
            F.concat(F.lit("c"), "c_custkey").alias("src"),
            F.concat(F.lit("n"), "c_nationkey").alias("dst"),
        )
        return bfs_depths(e1.unionByName(e2), root="r0")

    q["graph_bfs_depths"] = graph_bfs_depths

    def single_parent_predicate(spark, sf):
        from nilinker_spark.operators.graph import single_parent

        edges = load_table(spark, sf, "orders").select(
            F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst")
        )
        return single_parent(edges)

    q["single_parent_predicate"] = single_parent_predicate

    def relation_coassociation(spark, sf):
        # ≙ CID co-association relations (REEL/relations.py:151-254): two
        # parts are related iff they appear in the same order
        li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
        a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
        b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
        return (
            a.join(b, "l_orderkey")
            .filter(F.col("part_a") < F.col("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= 2)
        )

    q["relation_coassociation"] = relation_coassociation

    # --- generic OLAP shape (agg / join / top-k over the star schema) --------
    def tpch_q1(spark, sf):
        li = load_table(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                # integer-valued quantities: 4-dp fixed-point average by
                # integer division (round(avg(double),4) is never
                # hash-safe cross-engine — CLAUDE.md, found at sf0.1)
                (
                    F.expr(
                        "(sum(cast(round(l_quantity) as bigint)) * 10000) div count(*)"
                    )
                    / 10000.0
                ).alias("avg_qty"),
                F.count("*").alias("count_order"),
            )
        )

    q["tpch_q1"] = tpch_q1

    def tpch_q3(spark, sf):
        """Q3 shipping-priority shape over the synthetic tables: selective
        dim filter broadcast into a fact join, date predicates pushed to
        both scans, rank on the ROUNDED revenue (ties broken by orderkey
        — the cross-engine float rule)."""
        c = (
            load_table(spark, sf, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
        li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
        rev = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                    "revenue"
                )
            )
        )
        w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        return (
            rev.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select(
                "l_orderkey",
                "revenue",
                F.col("o_orderdate").cast("string").alias("o_orderdate"),
                "o_orderpriority",
                "rank",
            )
        )

    q["tpch_q3"] = tpch_q3

    def top_revenue_nations(spark, sf):
        cust = load_table(spark, sf, "customer")
        orders = load_table(spark, sf, "orders")
        nation = load_table(spark, sf, "nation")
        joined = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        )
        w = Window.orderBy(F.desc("revenue"), F.asc("n_name"))
        return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)

    q["top_revenue_nations"] = top_revenue_nations

    def best_candidate_gap(spark, sf):
        # ≙ findBestCandidate tie-break (ppr_for_ned_all.java:460-546): take
        # the top-scored candidate, but when the gap to the runner-up is
        # small, fall back to a secondary criterion (here: min vec_id)
        emb = load_table(spark, sf, "embeddings")
        qdf = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
        )
        top = C.ann_topk_bruteforce(emb, qdf, k=2, dim=64)
        w = Window.partitionBy("query_id").orderBy("rank")
        gapped = (
            top.withColumn("next_cos", F.lead("cos").over(w))
            .filter(F.col("rank") == 1)
            .withColumn("gap", F.round(F.col("cos") - F.coalesce("next_cos", F.lit(0.0)), 4))
        )
        runner = top.filter(F.col("rank") == 2).select(
            F.col("query_id"), F.col("vec_id").alias("runner_id")
        )
        return (
            gapped.join(runner, "query_id", "left")
            .select(
                "query_id",
                F.when(
                    (F.col("gap") >= 0.1) | F.col("runner_id").isNull(), F.col("vec_id")
                )
                .otherwise(F.least("vec_id", "runner_id"))
                .alias("best_id"),
                "gap",
            )
        )

    q["best_candidate_gap"] = best_candidate_gap

    def endpoint_max_contribution(spark, sf):
        # ≙ secondConstraint (ppr_for_ned_all.java:258-311): per endpoint
        # keep only the max contribution from each source, then sum
        li = load_table(spark, sf, "lineitem")
        cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        per_src = li.groupBy("l_partkey", "l_suppkey").agg(F.max(cents).alias("max_contrib_cents"))
        return per_src.groupBy("l_partkey").agg(
            F.sum("max_contrib_cents").alias("total_cents"), F.count("*").alias("n_sources")
        )

    q["endpoint_max_contribution"] = endpoint_max_contribution

    def gold_candidate_reorder(spark, sf):
        # ≙ update_entity_list (REEL/candidates.py:103-137): move the gold
        # candidate to the head of each candidate list
        toks = C.doc_tokens(_docs(spark, sf), 3)
        lists = toks.groupBy("doc_id").agg(F.sort_array(F.collect_set("token")).alias("cands"))
        gold = F.array_min("cands")
        return lists.select(
            "doc_id",
            # string-joined (not array-typed): value-hash comparison across
            # engines must not depend on array stringification
            F.concat_ws(
                " ", F.concat(F.array(gold), F.array_remove("cands", gold))
            ).alias("reordered"),
        )

    q["gold_candidate_reorder"] = gold_candidate_reorder

    def eval_filter_top_pred(spark, sf):
        # ≙ filter_top_pred protocol (evaluation_evanil.py:19-36): remove
        # the held-out true concept from the ranking, first remaining is
        # the answer, judged against the gold (= runner-up here)
        from nilinker_spark.operators.candidates import filter_top_pred

        emb = load_table(spark, sf, "embeddings")
        qdf = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
        )
        top = C.ann_topk_bruteforce(emb, qdf, k=5, dim=64)
        preds = top.groupBy("query_id").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"].cast("string"),
            ).alias("ranked")
        ).select(
            "query_id",
            "ranked",
            F.try_element_at("ranked", F.lit(1)).alias("true_id"),
            F.try_element_at("ranked", F.lit(2)).alias("gold_id"),
        )
        return filter_top_pred(preds)

    q["eval_filter_top_pred"] = eval_filter_top_pred

    # --- ER pipeline stages over driver data (non-SQL-expressible: rows-only) ---
    def er_resolve(spark, sf):
        docs = _docs(spark, sf)
        webtext = webtext_from_documents(docs)
        gazetteer = gazetteer_from_documents(docs)
        return resolve(spark, webtext, make_kb(seed=42), gazetteer=gazetteer)

    q["er_resolve"] = er_resolve

    def er_extract_mentions(spark, sf):
        from nilinker_spark.operators.extract import extract_mentions_df

        docs = _docs(spark, sf)
        webtext = webtext_from_documents(docs)
        gazetteer = gazetteer_from_documents(docs)
        return extract_mentions_df(spark, webtext, gazetteer)

    q["er_extract_mentions"] = er_extract_mentions

    def er_resolve_incremental(spark, sf):
        """Cross-run incremental resume as a driver-gated property
        (VERDICT r3 #5): run the checkpointed Pipeline on the even-doc_id
        half, parquet-APPEND the odd half via run_incremental, and return
        the resolved table.  By the tested clusters==scratch invariant the
        result is IDENTICAL to a from-scratch run over the full corpus, so
        the DuckDB twin is er_resolve's — resume correctness becomes a
        hash-exact contract row, not just a pytest."""
        import shutil
        import tempfile

        from nilinker_spark.pipeline import Pipeline

        docs = _docs(spark, sf)
        gazetteer = gazetteer_from_documents(docs)  # full-corpus gazetteer
        base_w = webtext_from_documents(docs.filter(F.col("doc_id") % 2 == 0))
        inc_w = webtext_from_documents(docs.filter(F.col("doc_id") % 2 == 1))
        tmp = tempfile.mkdtemp(prefix="er_inc_")
        try:
            pipe = Pipeline(spark, make_kb(seed=42), tmp, gazetteer=gazetteer)
            pipe.run(base_w).count()
            res = pipe.run_incremental(inc_w)
            # the checkpoint dir is temporary: materialize before cleanup
            return _materialize(spark, res)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["er_resolve_incremental"] = er_resolve_incremental

    def er_pairwise_f1(spark, sf):
        """The north-rule acceptance gate as a contract row (VERDICT r4
        #5): judge er_resolve's clusters against the REFERENCE clusters
        (oracle.cluster_forms — the shared-function reference
        implementation, the same "reference clusters" the e2e pytest gate
        uses) on labeled same-block pairs, EvaNIL-style refined split
        (deterministic md5 bucket >= 70 = test forms).  The one-row
        (tp, fp, fn, precision, recall, f1) output IS the BASELINE.json
        gate (pairwise F1 >= 0.99 vs reference clusters on labeled
        same-blocking-key pairs); the DuckDB twin runs the same judgment
        SQL with its pred clusters derived by its OWN recursive CTE, so
        the gate value is hash-checked cross-engine, not just pytest'd
        (≙ the link-to-ancestor evaluation, evaluation_evanil.py:95-135)."""
        from nilinker_spark.operators.blocking import block_keys_df
        from nilinker_spark.operators.evaluate import pairwise_f1
        from nilinker_spark.oracle import cluster_forms

        clusters = er_resolve(spark, sf).select("norm", "cluster_id").distinct()
        # reference clusters over the same distinct forms (vocabulary-
        # bounded collect, same guard discipline as _materialize)
        forms_rows = clusters.select("norm").limit(_MATERIALIZE_MAX_ROWS + 1).collect()
        if len(forms_rows) > _MATERIALIZE_MAX_ROWS:
            raise RuntimeError("er_pairwise_f1: form vocabulary exceeds contract scale")
        gold_map = cluster_forms(sorted(r["norm"] for r in forms_rows), make_kb(seed=42))
        gold = spark.createDataFrame(sorted(gold_map.items()), "norm string, gold string")
        # deterministic 70/30 split on the form key (cross-engine md5
        # bucket — same idiom as the salting/h60 hashes)
        bucket = F.pmod(
            F.conv(F.substring(F.md5("norm"), 1, 15), 16, 10).cast("long"), F.lit(100)
        )
        test_forms = clusters.filter(bucket >= 70).select("norm")
        blocked = block_keys_df(test_forms)
        pa = blocked.select("block_key", F.col("norm").alias("a"))
        pb = blocked.select("block_key", F.col("norm").alias("b"))
        pairs = (
            pa.join(pb, "block_key")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        ga = gold.select(F.col("norm").alias("a"), F.col("gold").alias("gold_a"))
        gb = gold.select(F.col("norm").alias("b"), F.col("gold").alias("gold_b"))
        labeled = (
            pairs.join(F.broadcast(ga), "a", "left")
            .join(F.broadcast(gb), "b", "left")
            .select(
                "a",
                "b",
                F.when(
                    F.col("gold_a").isNotNull()
                    & F.col("gold_b").isNotNull()
                    & (F.col("gold_a") == F.col("gold_b")),
                    F.lit(True),
                )
                .otherwise(F.lit(False))
                .alias("is_match"),
            )
        )
        preds = clusters.select(F.col("norm").alias("item"), "cluster_id")
        return pairwise_f1(preds, labeled)

    q["er_pairwise_f1"] = er_pairwise_f1

    # --- multimodal: feature extraction over binary media ---------------------
    def media_features(spark, sf):
        """Media feature plumbing as a first-class contract row: documents'
        bytes as the payload, md5-lattice features (multimodal._fake_features
        — pure md5+affine math, so the DuckDB twin recomputes it exactly),
        one row per (media, dim) to keep array columns out of the oracle."""
        from nilinker_spark.operators import multimodal as M

        docs = _docs(spark, sf)
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.try_element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
        )
        feats = M.extract_media_features(media)
        return feats.select(
            "media_id",
            "kind",
            "n_bytes",
            F.posexplode("features").alias("dim", "v"),
        ).select(
            "media_id",
            "kind",
            "n_bytes",
            "dim",
            # sign-preserving round: Spark's ROUND (BigDecimal HALF_UP)
            # normalizes -0.0 to 0.0, DuckDB's keeps the IEEE sign — a
            # tiny negative component that rounds to zero at 4 dp hashed
            # differently (3 rows at sf0.1; sf0.01 has none, which is why
            # every earlier gate passed).  -round(-v) is bit-identical to
            # round(v) for every nonzero result (HALF_UP is symmetric)
            # and yields -0.0 exactly where DuckDB does.
            F.when(
                F.col("v") < 0, -F.round(-F.col("v").cast("double"), 4)
            )
            .otherwise(F.round(F.col("v").cast("double"), 4))
            .alias("val"),
        )

    q["media_features"] = media_features

    # --- streaming serving path, drained as one micro-batch -------------------
    def stream_resolve_batch(spark, sf):
        """stream_resolve (streaming extraction ⋈ static batch cluster
        table) drained with an availableNow trigger into parquet and
        re-read — proves through the driver gate that the streaming path
        reproduces the batch er_resolve output (same oracle twin)."""
        import shutil
        import tempfile

        from nilinker_spark.streaming.extract_stream import (
            read_webtext_stream,
            stream_resolve,
        )

        docs = _docs(spark, sf)
        webtext = webtext_from_documents(docs)
        gazetteer = gazetteer_from_documents(docs)
        handle: list = []
        resolved = resolve(
            spark, webtext, make_kb(seed=42), gazetteer=gazetteer, cache_out=handle
        )
        clusters = (
            resolved.select("norm", "cluster_id").distinct().localCheckpoint(eager=True)
        )
        for df in handle:
            df.unpersist(blocking=True)

        base = tempfile.mkdtemp(prefix="stream_resolve_")
        try:
            in_dir, out_dir, ck_dir = f"{base}/in", f"{base}/out", f"{base}/ck"
            webtext.write.mode("overwrite").parquet(in_dir)
            stream = read_webtext_stream(spark, in_dir)
            out = stream_resolve(spark, stream, gazetteer, clusters)
            (
                out.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ck_dir)
                .trigger(availableNow=True)
                .outputMode("append")
                .start()
                .awaitTermination()
            )
            result = spark.read.parquet(out_dir).select(
                "url", "mention_id", "surface", "pos", "norm", "cluster_id"
            )
            # the stream sink dir is temporary: materialize before cleanup
            return _materialize(spark, result)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    q["stream_resolve"] = stream_resolve_batch

    def stream_sessionize_counts(spark, sf):
        """Streaming session windows as a contract row (VERDICT r3 #6):
        drain the events table through stream_sessionize (session_window +
        watermark, availableNow), flush the held-open tail sessions with a
        far-future sentinel event on a checkpoint-resumed second drain
        (append mode only emits a session once the watermark passes its
        end), then aggregate closed sessions to (user_id, n_sessions).
        The DuckDB twin recomputes the same >= gap split batch-side."""
        import datetime as dt
        import shutil
        import tempfile

        from nilinker_spark.streaming.extract_stream import stream_sessionize

        ev = (
            load_table(spark, sf, "events")
            .select("event_id", "user_id", F.col("ts").cast("timestamp_ltz").alias("ts"))
        )
        base = tempfile.mkdtemp(prefix="stream_sess_")
        try:
            in_dir, out_dir, ck_dir = f"{base}/in", f"{base}/out", f"{base}/ck"
            ev.write.mode("overwrite").parquet(in_dir)

            def drain():
                stream = spark.readStream.schema(ev.schema).parquet(in_dir)
                (
                    stream_sessionize(stream)
                    .writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", ck_dir)
                    .trigger(availableNow=True)
                    .outputMode("append")
                    .start()
                    .awaitTermination()
                )

            drain()
            mx = ev.agg(F.max("ts").alias("m")).first()["m"]
            # sentinel user_id -1: the events table's ids are non-negative
            sentinel = spark.createDataFrame(
                [(-1, -1, mx + dt.timedelta(days=2))], ev.schema
            )
            sentinel.write.mode("append").parquet(in_dir)
            drain()  # checkpoint resume: watermark passes every real session
            out = (
                spark.read.parquet(out_dir)
                .filter(F.col("user_id") != -1)
                .groupBy("user_id")
                .agg(F.count("*").alias("n_sessions"))
            )
            # the stream sink dir is temporary: materialize before cleanup
            return _materialize(spark, out)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    q["stream_sessionize"] = stream_sessionize_counts

    def media_neardup_clusters(spark, sf):
        """Multimodal composition (VERDICT r3 #7): media feature extraction
        (Arrow batches over binary payloads, md5-lattice fake encoder) ->
        embedding-space LSH near-dup pairs -> connected components ->
        canonical survivors — the image-dedup analog of clean_corpus.  Both
        halves already have exact DuckDB twins; the composed twin recomputes
        features natively and re-derives the closure with a recursive CTE."""
        from nilinker_spark.operators import multimodal as M

        docs = _docs(spark, sf)
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.try_element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
        )
        feats = M.extract_media_features(media)
        emb = feats.select(
            F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
        )
        return C.embedding_neardup_clusters(
            emb, threshold=0.3, n_planes=6, dim=M.FEATURE_DIM
        )

    q["media_neardup_clusters"] = media_neardup_clusters

    def media_frame_sample(spark, sf):
        """Video frame-sampling plumbing as a contract row: fixed-size
        byte 'frames', every 4th kept (multimodal.frame_sample).  Frames
        surface as md5 + length (binary columns don't hash stably across
        engines); the corpus text is ASCII so byte slices == char slices
        and the DuckDB twin recomputes them with substr/md5 natively."""
        from nilinker_spark.operators import multimodal as M

        docs = _docs(spark, sf)
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.try_element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
        )
        fr = M.frame_sample(media, frame_bytes=64, every_n=4)
        return fr.select(
            "media_id",
            "frame_idx",
            F.md5(F.decode("frame", "utf-8")).alias("frame_md5"),
            F.length("frame").alias("frame_len"),
        )

    q["media_frame_sample"] = media_frame_sample

    def media_resize(spark, sf):
        """Resize plumbing as a contract row (multimodal.resize_media):
        deterministic stride downsample from the meta dims to 4x4, the
        resized payload surfaced as md5 + length (ASCII corpus text, so
        the DuckDB twin re-derives the exact bytes via substr over a
        stepped range)."""
        from nilinker_spark.operators import multimodal as M

        docs = _docs(spark, sf)
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.try_element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
            F.struct(
                F.lit("text/plain").alias("mime"),
                (F.col("doc_id") % 13 + 4).cast("int").alias("width"),
                (F.col("doc_id") % 7 + 4).cast("int").alias("height"),
                F.lit(0).cast("int").alias("duration_ms"),
            ).alias("meta"),
        )
        rz = M.resize_media(media, target_w=4, target_h=4)
        return rz.select(
            "media_id",
            F.col("meta.width").alias("new_width"),
            F.col("meta.height").alias("new_height"),
            F.length("payload").alias("out_len"),
            F.md5(F.decode("payload", "utf-8")).alias("out_md5"),
        )

    q["media_resize"] = media_resize

    def stream_windowed_counts(spark, sf):
        """Watermarked event-time windowed aggregation as a contract row:
        the streaming mention extraction feeds windowed_mention_counts
        (1-hour windows on warc_ts, 2-hour watermark), drained availableNow;
        a far-future sentinel page on a checkpoint-resumed second drain
        flushes the held-open windows (append mode emits a window only
        once the watermark passes its end).  The DuckDB twin recomputes
        the same counts batch-side from the er_extract_mentions twin —
        the streaming maintenance of the term-frequency/IC aggregation."""
        import datetime as dt
        import shutil
        import tempfile

        from nilinker_spark.streaming.extract_stream import (
            read_webtext_stream,
            stream_mentions,
            windowed_mention_counts,
        )

        docs = _docs(spark, sf)
        webtext = webtext_from_documents(docs)
        gazetteer = gazetteer_from_documents(docs)
        base = tempfile.mkdtemp(prefix="stream_wc_")
        try:
            in_dir, out_dir, ck_dir = f"{base}/in", f"{base}/out", f"{base}/ck"
            webtext.write.mode("overwrite").parquet(in_dir)

            def drain():
                stream = read_webtext_stream(spark, in_dir)
                counts = windowed_mention_counts(
                    stream_mentions(spark, stream, gazetteer)
                )
                (
                    counts.writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", ck_dir)
                    .trigger(availableNow=True)
                    .outputMode("append")
                    .start()
                    .awaitTermination()
                )

            drain()
            mx = webtext.agg(F.max("warc_ts").alias("m")).first()["m"]
            # the watermark tracks event time of the MENTION stream, so
            # the sentinel page must extract >= 1 mention: its text is a
            # gazetteer surface.  Its own far-future window never closes
            # (and is filtered defensively below).
            probe = min(gazetteer)
            sentinel = spark.createDataFrame(
                [
                    (
                        "doc://sentinel/0",
                        mx + dt.timedelta(days=2),
                        probe.encode("utf-8"),
                        probe,
                        "en",
                    )
                ],
                webtext.schema,
            )
            sentinel.write.mode("append").parquet(in_dir)
            drain()  # checkpoint resume: watermark passes every real window
            out = (
                spark.read.parquet(out_dir)
                .filter(F.col("window_start") <= F.lit(mx))
                .select(
                    F.col("window_start").cast("string").alias("window_start"),
                    "norm",
                    "n",
                )
            )
            # the stream sink dir is temporary: materialize before cleanup
            return _materialize(spark, out)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    q["stream_windowed_counts"] = stream_windowed_counts

    def snapshot_prune(spark, sf):
        """The snapshot log's metadata scan planning as a contract row
        (round-5 table-format layer, snapshots.py): commit the even
        doc_id half of ``documents`` as v0, parquet-APPEND the odd half
        (v1), then ``prune(doc_id, 100, 349)`` over the latest version —
        a read planned from the manifests' per-file min/max bounds that
        never opens files outside the range.  Pruning is an optimization
        by construction (residual predicate always applied), so the
        result is exactly ``SELECT … WHERE doc_id BETWEEN 100 AND 349``
        — the DuckDB twin — and the row raises loudly if the plan did
        NOT skip at least one file (the property being evidenced)."""
        import shutil
        import tempfile

        from nilinker_spark.snapshots import SnapshotLog

        docs = _docs(spark, sf).select("doc_id", "lang", "n_chars")
        tmp = tempfile.mkdtemp(prefix="snap_prune_")
        try:
            d = os.path.join(tmp, "docs")
            log = SnapshotLog(d)
            # ranged part files (the sorted-write layout a real ingest
            # produces) make the footer bounds selective
            docs.filter(F.col("doc_id") % 2 == 0).repartitionByRange(
                4, "doc_id"
            ).write.mode("overwrite").parquet(d)
            log.commit("overwrite")
            docs.filter(F.col("doc_id") % 2 == 1).repartitionByRange(
                4, "doc_id"
            ).write.mode("append").parquet(d)
            log.commit("append")
            pruned = log.prune(spark, "doc_id", lo=100, hi=349)
            n_total = len(log.snapshot()["files"])
            n_scanned = len(pruned.inputFiles())
            if n_scanned >= n_total:
                raise RuntimeError(
                    f"snapshot_prune: no file skipped ({n_scanned}/{n_total})"
                )
            # the table dir is temporary: materialize before cleanup
            return _materialize(spark, pruned)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["snapshot_prune"] = snapshot_prune

    def snapshot_evolve(spark, sf):
        """Name-mapped schema evolution as a contract row (round-5
        table-format layer, snapshots.py): commit the even doc_id half
        of ``documents`` as v0 under the ORIGINAL column names with
        ``n_chars`` deliberately narrowed to int32, evolve ``rename
        n_chars->len_chars + promote int->long, drop lang`` (ONE
        metadata-only commit — zero data files touched, asserted),
        parquet-append the odd half already carrying the NEW name at
        the NEW width, and read the latest version — ONE scan that
        resolves the pre-evolution vintage through the name mapping and
        upcasts its int32 footers under the explicit long schema, and
        reads the post-evolution vintage natively.  The result is
        exactly ``SELECT doc_id, n_chars AS len_chars`` over all
        documents — the DuckDB twin — so the hash gate proves the
        mapped+promoted read loses, duplicates, and mislabels nothing
        across vintages, and time travel to v0 still sees the old
        schema."""
        import shutil
        import tempfile

        from nilinker_spark.snapshots import SnapshotLog

        docs = _docs(spark, sf).select(
            "doc_id", "lang", F.col("n_chars").cast("int").alias("n_chars")
        )
        tmp = tempfile.mkdtemp(prefix="snap_evolve_")
        try:
            d = os.path.join(tmp, "docs")
            log = SnapshotLog(d)
            docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(d)
            v0 = log.commit("overwrite")
            files_v0 = log.snapshot(v0)["files"]
            v1 = log.evolve(
                renames={"n_chars": "len_chars"},
                drops=["lang"],
                promotes={"n_chars": "long"},
            )
            if log.snapshot(v1)["files"] != files_v0:
                raise RuntimeError("snapshot_evolve: evolve touched data files")
            docs.filter(F.col("doc_id") % 2 == 1).select(
                "doc_id", F.col("n_chars").cast("long").alias("len_chars")
            ).write.mode("append").parquet(d)
            log.commit("append")
            if log.read(spark, v0).columns != ["doc_id", "lang", "n_chars"]:
                raise RuntimeError("snapshot_evolve: time travel lost the v0 schema")
            if dict(log.read(spark).dtypes)["len_chars"] != "bigint":
                raise RuntimeError("snapshot_evolve: promotion lost the long type")
            # the table dir is temporary: materialize before cleanup
            return _materialize(spark, log.read(spark))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["snapshot_evolve"] = snapshot_evolve

    def snapshot_partition_prune(spark, sf):
        """Hidden partitioning + PARTITION EVOLUTION as a contract row
        (round-5 table-format layer, snapshots.py): declare
        ``identity(lang)``, write the even doc_id half clustered by the
        derived tuple (the layout column lives only in file PATHS —
        readers never see it), evolve the spec to ``identity(lang) +
        bucket8(doc_id)`` (metadata-only, asserted), append the odd half
        under the new spec, then ``prune_partition({"lang": "en"})`` —
        files of BOTH spec vintages are skipped purely from their
        path-encoded partition tuples, no footer is opened for the
        decision.  Pruning is an optimization by construction (residual
        predicate always applied), so the result is exactly
        ``SELECT … WHERE lang = 'en'`` — the DuckDB twin — and the row
        raises loudly if no file was skipped, if the bucket-equality
        probe opened more than one new-vintage bucket, or if the layout
        columns leaked into the schema."""
        import shutil
        import tempfile

        from nilinker_spark.snapshots import SnapshotLog

        docs = _docs(spark, sf).select("doc_id", "lang", "n_chars")
        tmp = tempfile.mkdtemp(prefix="snap_part_")
        try:
            d = os.path.join(tmp, "docs")
            log = SnapshotLog(d)
            log.set_partition_spec([{"column": "lang", "transform": "identity"}])
            log.write_partitioned(docs.filter(F.col("doc_id") % 2 == 0), mode="overwrite")
            log.commit("overwrite")
            v_files = log.snapshot()["files"]
            v2 = log.set_partition_spec(
                [
                    {"column": "lang", "transform": "identity"},
                    {"column": "doc_id", "transform": "bucket", "n": 8},
                ]
            )
            if log.snapshot(v2)["files"] != v_files:
                raise RuntimeError("snapshot_partition_prune: spec evolution touched data")
            log.write_partitioned(docs.filter(F.col("doc_id") % 2 == 1), mode="append")
            log.commit("append")
            pruned = log.prune_partition(spark, {"lang": "en"})
            if sorted(pruned.columns) != ["doc_id", "lang", "n_chars"]:
                raise RuntimeError("snapshot_partition_prune: layout columns leaked")
            n_total = len(log.snapshot()["files"])
            n_scanned = len(pruned.inputFiles())
            if not 0 < n_scanned < n_total:
                raise RuntimeError(
                    f"snapshot_partition_prune: no file skipped ({n_scanned}/{n_total})"
                )
            # bucket-equality probe: one doc of the odd (bucketed) half
            # must open exactly ONE new-vintage bucket's files
            probe = log.prune_partition(spark, {"doc_id": 101})
            buckets = {
                f.split("_p_bucket8__doc_id=")[1].split("/")[0]
                for f in probe.inputFiles()
                if "_p_bucket8__doc_id=" in f
            }
            if len(buckets) != 1:
                raise RuntimeError(
                    f"snapshot_partition_prune: bucket probe opened {sorted(buckets)}"
                )
            # the table dir is temporary: materialize before cleanup
            return _materialize(spark, pruned)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["snapshot_partition_prune"] = snapshot_partition_prune

    def snapshot_wap(spark, sf):
        """Write-audit-publish via branch refs as a contract row
        (round-5 table-format layer, snapshots.py): commit the even
        doc_id half of ``documents`` as the trunk, STAGE the odd half
        on an ``audit`` branch (commit_append(branch=...)), assert the
        trunk still reads exactly the even half (staged commits are
        invisible — the write-audit isolation property), then
        ``publish`` fast-forwards the trunk in one metadata commit.
        The returned trunk read is all documents — the DuckDB twin —
        so the hash gate proves publish loses, duplicates, and reorders
        nothing, and the row raises loudly if trunk isolation broke or
        the publish did not record its audit lineage."""
        import shutil
        import tempfile

        from nilinker_spark.snapshots import SnapshotLog, list_data_files

        docs = _docs(spark, sf).select("doc_id", "lang", "n_chars")
        tmp = tempfile.mkdtemp(prefix="snap_wap_")
        try:
            d = os.path.join(tmp, "docs")
            log = SnapshotLog(d)
            docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(d)
            log.commit("overwrite")
            n_even = log.read(spark).count()
            base = set(list_data_files(d))
            docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(d)
            staged = [f for f in list_data_files(d) if f not in base]
            v_stage = log.commit_append(staged, branch="audit")
            if log.read(spark).count() != n_even:
                raise RuntimeError("snapshot_wap: staged commit leaked into the trunk")
            v_pub = log.publish("audit")
            m = log.snapshot(v_pub)
            if m.get("published_from") != {"branch": "audit", "version": v_stage}:
                raise RuntimeError("snapshot_wap: publish lost its audit lineage")
            # the table dir is temporary: materialize before cleanup
            return _materialize(spark, log.read(spark))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["snapshot_wap"] = snapshot_wap

    def snapshot_merge(spark, sf):
        """Copy-on-write MERGE (upsert) as a contract row (round-5
        table-format layer, snapshots.py): commit ``documents`` in a
        ranged layout, merge a source that UPDATES the ``doc_id < 50``
        rows (doubled n_chars) and INSERTS shifted ``doc_id + 10^9``
        rows for every ``doc_id % 10 == 7`` — the merge plans its
        rewrite from manifest key stats, so only the file(s) whose
        bounds contain a source key are rewritten (asserted: some files
        kept, fewer touched than total) and prior versions keep time
        travelling (asserted: the pre-merge version still reads the
        pre-merge row count).  The result is exactly the UPDATE+INSERT
        in SQL — the DuckDB twin — so the hash gate proves the merge
        loses, duplicates, and corrupts nothing."""
        import shutil
        import tempfile

        from nilinker_spark.snapshots import SnapshotLog

        docs = _docs(spark, sf).select("doc_id", "lang", "n_chars")
        tmp = tempfile.mkdtemp(prefix="snap_merge_")
        try:
            d = os.path.join(tmp, "docs")
            log = SnapshotLog(d)
            docs.repartitionByRange(8, "doc_id").write.mode("overwrite").parquet(d)
            v0 = log.commit("overwrite")
            files_v0 = set(log.snapshot(v0)["files"])
            n0 = log.read(spark).count()
            updates = docs.filter(F.col("doc_id") < 50).withColumn(
                "n_chars", F.col("n_chars") * 2
            )
            inserts = docs.filter(F.col("doc_id") % 10 == 7).withColumn(
                "doc_id", F.col("doc_id") + F.lit(10**9)
            )
            v1 = log.merge(spark, updates.unionByName(inserts), on="doc_id")
            m1 = log.snapshot(v1)
            kept = files_v0 & set(m1["files"])
            if not kept or kept == files_v0:
                raise RuntimeError(
                    f"snapshot_merge: rewrite not file-selective "
                    f"({len(kept)}/{len(files_v0)} kept)"
                )
            if log.read(spark, v0).count() != n0:
                raise RuntimeError("snapshot_merge: merge broke time travel")
            # the table dir is temporary: materialize before cleanup
            return _materialize(spark, log.read(spark))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["snapshot_merge"] = snapshot_merge

    def stream_snapshot_sink(spark, sf):
        """Exactly-once streaming ingestion into the snapshot log as a
        contract row (round-5 table-format layer, snapshots.py): a
        parquet-source stream drains availableNow through
        ``log.streaming_sink()`` (foreachBatch + idempotent batch-id
        commits — the Delta transactional-sink pattern), in two drains:
        even doc_ids, then odd doc_ids appended to the source.  The row
        asserts each drain commits with its monotonically increasing
        ``stream_batch_id``, that a checkpoint-resumed drain with no new
        data commits NOTHING (exactly-once under replay), and that
        ``read_changes`` across the second drain exposes exactly the
        odd half to incremental consumers.  The final table read is all
        documents — the DuckDB twin — so the hash gate proves the sink
        neither lost nor duplicated a row across drains and restarts."""
        import shutil
        import tempfile

        from nilinker_spark.snapshots import SnapshotLog

        docs = _docs(spark, sf).select("doc_id", "lang", "n_chars")
        base = tempfile.mkdtemp(prefix="snap_sink_")
        try:
            src, tbl, ck = f"{base}/src", f"{base}/tbl", f"{base}/ck"
            log = SnapshotLog(tbl)

            def drain():
                (
                    spark.readStream.schema("doc_id long, lang string, n_chars long")
                    .parquet(src)
                    .writeStream.foreachBatch(log.streaming_sink())
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                    .awaitTermination(300)
                )

            docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(src)
            drain()
            v1 = log.latest_version()
            drain()  # no new data: exactly-once means no new commit
            if log.latest_version() != v1:
                raise RuntimeError("stream_snapshot_sink: empty re-drain committed")
            docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
            drain()
            v2 = log.latest_version()
            if not (
                log.snapshot(v2).get("stream_batch_id", -1)
                > log.snapshot(v1).get("stream_batch_id", -1)
            ):
                raise RuntimeError("stream_snapshot_sink: batch ids not monotone")
            n_odd = log.read_changes(spark, v1).count()
            n_all = log.read(spark).count()
            if n_odd == 0 or n_odd >= n_all:
                raise RuntimeError(
                    f"stream_snapshot_sink: bad incremental split {n_odd}/{n_all}"
                )
            # the table dir is temporary: materialize before cleanup
            return _materialize(spark, log.read(spark))
        finally:
            shutil.rmtree(base, ignore_errors=True)

    q["stream_snapshot_sink"] = stream_snapshot_sink

    # Driver-coverage rotation (VERDICT r4 #2): the driver checks the
    # FIRST ~50 dict entries per round (CORRECTNESS_r04 carried exactly
    # positions 0-49), so rows the driver has not yet evidenced LEAD and
    # the longest-green r1-era rows TRAIL — any entry past the cap this
    # round was driver-green last round, so two consecutive rounds jointly
    # cover the full surface.
    lead = [
        "media_features",
        "stream_resolve",
        "stream_sessionize",
        "media_neardup_clusters",
        "media_frame_sample",
        "stream_windowed_counts",
        "er_pairwise_f1",
        "ann_topk_ivf_trained",
        "snapshot_prune",
        "snapshot_evolve",
        "snapshot_partition_prune",
        "snapshot_wap",
        "snapshot_merge",
        "stream_snapshot_sink",
        "lm_bigram_score",
        "decontaminate",
        "importance_resample",
        "pack_sequences",
        "source_stats",
        "media_resize",
        "tpch_q3",
    ]
    trail = [
        "mention_dedup",
        "term_frequency",
        "information_content",
        "dataset_statistics",
        "entity_repetition",
        "block_candidate_join",
        "refine_test_anti_join",
        "pair_generation",
        "fuzzy_topk",
        "window_topk",
        "split_assign",
        "scalar_normalize",
        "sample_head",
        "scalar_id_coercion",
        "eval_lang_micro",
    ]
    lead = [n for n in lead if n in q]
    mid = [n for n in q if n not in lead and n not in trail]
    return {n: q[n] for n in lead + mid + trail}


# ---------------------------------------------------------------------------
# DuckDB oracles (ANSI-ish SQL over the pre-registered views)
# ---------------------------------------------------------------------------


_ER_CV_CACHE: dict[str, str | None] = {}
# gold VALUES for er_pairwise_f1: the reference clusters
# (oracle.cluster_forms) over the same SQL-derivable form set — computed
# alongside the edges so the docs/forms derivation runs once
_ER_GOLD_CACHE: dict[str, str | None] = {}


def _er_edge_values_sql(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    """Literal thresholded similarity-edge table for the er_resolve oracle.

    The r2 hybrid check embedded the finished (norm, cluster_id) dim from
    oracle.cluster_forms — the transitive closure was the one
    semi-trusted link.  Now only the EDGES come from the shared-scoring
    Python oracle (SQL cannot express the attention phrase vectors), and
    DuckDB independently derives the cluster ids: a recursive CTE
    computes each form's reachable set over these edges and labels it
    with the minimum — the same component-min rule as both UnionFind and
    the distributed alternating-star loop, re-derived by a third engine.
    Forms/mentions are fully SQL-derived (er_extract_mentions twin).
    Pinned to the driver's correctness scale (sf0.01); returns None if
    that data is absent.
    """
    if sf_dir in _ER_CV_CACHE:
        return _ER_CV_CACHE[sf_dir]
    try:
        import duckdb

        from nilinker_spark.functions.normalize import extract_text, norm_form
        from nilinker_spark.oracle import extract_mentions, similarity_edge_list

        docs = duckdb.sql(
            f"select doc_id, text, lang from '{sf_dir}/documents.parquet'"
        ).fetchall()
        gaz_rows = duckdb.sql(
            "with base as (select string_split(text,' ') as toks from "
            f"'{sf_dir}/documents.parquet'), "
            "bg as (select array_to_string(toks[i:i+1], ' ') as s from base, "
            "unnest(range(1, greatest(len(toks)-1,0)+1)) as r(i) where len(toks[i:i+1]) = 2) "
            "select s from bg group by s order by count(*) desc, s asc limit 100"
        ).fetchall()
    except Exception:
        _ER_CV_CACHE[sf_dir] = None
        _ER_GOLD_CACHE[sf_dir] = None
        return None
    gazetteer = {r[0] for r in gaz_rows}
    forms: set[str] = set()
    for doc_id, text, lang in docs:
        if lang != "en":
            continue
        extracted = extract_text(text.encode("utf-8"))
        for _mid, surface, _pos in extract_mentions(f"doc://0/{doc_id}", extracted, gazetteer):
            forms.add(norm_form(surface))
    if not forms:
        _ER_CV_CACHE[sf_dir] = None
        _ER_GOLD_CACHE[sf_dir] = None
        return None
    edges = similarity_edge_list(sorted(forms), make_kb(seed=42))

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    # reference clusters over the same forms: the gold dim of the
    # er_pairwise_f1 judgment (the north-rule gate's "reference clusters")
    from nilinker_spark.oracle import cluster_forms

    gold = cluster_forms(sorted(forms), make_kb(seed=42))
    _ER_GOLD_CACHE[sf_dir] = ", ".join(f"({q(n)}, {q(c)})" for n, c in sorted(gold.items()))

    if edges:
        rows = ", ".join(f"({q(a)}, {q(b)})" for a, b in edges)
        out = f"(values {rows}) as e(src, dst)"
    else:
        out = "(select '' as src, '' as dst where false) as e(src, dst)"
    _ER_CV_CACHE[sf_dir] = out
    return out


def _lsh_sig_sql(vec_expr: str, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB twin of corpus.lsh_signature: the hyperplane weights are the
    SAME literal floats (repr round-trips a double exactly on both sides),
    and the dot is forced to double so the sign test matches Spark's
    sequential float64 fold bit-for-bit."""
    from nilinker_spark.operators.corpus import hyperplane_weights

    bits = []
    for row in hyperplane_weights(n_planes, dim):
        arr = "[" + ", ".join(repr(v) for v in row) + "]"
        bits.append(
            "(case when list_dot_product(list_transform("
            + vec_expr
            + ", x -> cast(x as double)), "
            + arr
            + ") > 0 then '1' else '0' end)"
        )
    return "(" + " || ".join(bits) + ")"


def oracle_sql() -> dict[str, str]:
    toks3 = (
        "select distinct doc_id, t.token from documents, "
        "unnest(string_split(text, ' ')) as t(token) where length(t.token) >= 3"
    )
    tf = f"select token, count(*) as freq from ({toks3}) group by token"
    top50 = f"select token from ({tf}) order by freq desc, token asc limit 50"
    sh = (
        "select distinct doc_id, "
        + _H60.format(x="array_to_string(toks[i:i+2], ' ')")
        + " as sh from (select doc_id, string_split(text,' ') as toks from documents), "
        "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) as r(i) "
        "where len(toks[i:i+2]) = 3"
    )

    o: dict[str, str] = {}

    o["mention_dedup"] = toks3
    o["term_frequency"] = tf
    o["information_content"] = (
        f"select token, round(-ln((freq + 1) / ((select max(freq) from ({tf})) + 1.0)) + 2, 6) as ic "
        f"from ({tf})"
    )
    o["dataset_statistics"] = (
        "with m as (select distinct doc_id, t.token as token from documents, "
        "unnest(string_split(text,' ')) as t(token)) "
        "select least(length(token), 8) as len_bucket, count(*) as n_mentions from m group by 1"
    )
    o["entity_repetition"] = (
        "with tk as (select doc_id, t.token as token from documents, "
        "unnest(string_split(text,' ')) as t(token) where length(t.token) >= 3) "
        "select doc_id, token, count(*) as n from tk group by 1, 2 having count(*) > 1"
    )
    o["block_candidate_join"] = (
        f"select m.doc_id, m.token from ({toks3}) m join ({top50}) d using (token)"
    )
    o["refine_test_anti_join"] = (
        "with base as (select doc_id, string_split(text,' ') as toks from documents), "
        "m as (select doc_id, array_to_string(toks[i:i+1], ' ') as mention from base, "
        "unnest(range(1, greatest(len(toks) - 1, 0) + 1)) as r(i) "
        "where len(toks[i:i+1]) = 2) "
        "select distinct mention from m where doc_id % 20 >= 17 "
        "and mention not in (select mention from m where doc_id % 20 < 14)"
    )
    o["pair_generation"] = (
        f"with tk as ({toks3}), "
        f"mem as (select tk.token, tk.doc_id, row_number() over (partition by tk.token order by tk.doc_id) rn "
        f"from tk join ({top50}) d using (token)), "
        "capped as (select token, doc_id from mem where rn <= 8) "
        "select distinct a.doc_id as doc_a, b.doc_id as doc_b "
        "from capped a join capped b using (token) where a.doc_id < b.doc_id"
    )
    o["fuzzy_topk"] = (
        f"with tf as ({tf}), "
        "vocab as (select token as word from tf order by freq desc, token asc limit 100), "
        "base as (select string_split(text,' ') as toks from documents), "
        "probes as (select distinct array_to_string(toks[i:i+1], '_') as probe from base, "
        "unnest(range(1, greatest(len(toks) - 1, 0) + 1)) as r(i) "
        "where len(toks[i:i+1]) = 2 order by probe limit 50), "
        "scored as (select p.probe, v.word, levenshtein(p.probe, v.word) as lev, "
        "row_number() over (partition by p.probe order by levenshtein(p.probe, v.word) asc, v.word asc) rn "
        "from probes p cross join vocab v) "
        "select probe, word, lev from scored where rn = 1"
    )
    o["window_topk"] = (
        "with tk as (select lang, t.token as token from documents, "
        "unnest(string_split(text,' ')) as t(token) where length(t.token) >= 3), "
        "c as (select lang, token, count(*) as freq from tk group by 1, 2), "
        "r as (select lang, token, freq, row_number() over "
        "(partition by lang order by freq desc, token asc) as rank from c) "
        "select lang, token, freq, rank from r where rank <= 3"
    )
    o["split_assign"] = (
        "select case when doc_id % 20 < 14 then 'train' "
        "when doc_id % 20 < 17 then 'dev' else 'test' end as split, "
        "count(*) as n_docs from documents group by 1"
    )
    o["scalar_normalize"] = (
        f"with tk as (select distinct token from ({toks3})) "
        "select token, "
        "case when length(token) > 3 and token like '%s' and token not like '%ss' "
        "then substring(token, 1, length(token) - 1) else token end as singular, "
        "(case when length(token) > 3 and token like '%s' and token not like '%ss' "
        "then substring(token, 1, length(token) - 1) else token end) != token as is_plural "
        "from tk"
    )
    o["dedup_exact"] = (
        "select " + _H60.format(x="text") + " as text_hash, count(*) as n_docs, "
        "min(doc_id) as canonical_doc_id from documents group by 1"
    )
    # hot-shingle cap twin (cap_shingle_df): keep shingles whose document
    # frequency is <= DEDUP_MAX_SHINGLE_DF — both set sizes and
    # intersections see the capped set, exactly like the Spark operator
    shc = (
        "select s.doc_id, s.sh from sh s join (select sh from sh group by sh "
        f"having count(*) <= {DEDUP_MAX_SHINGLE_DF}) keep using (sh)"
    )
    o["dedup_ngram_jaccard"] = (
        f"with sh as ({sh}), shc as ({shc}), "
        "sizes as (select doc_id, count(*) as n_sh from shc group by 1), "
        "inter as (select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as inter "
        "from shc a join shc b using (sh) where a.doc_id < b.doc_id group by 1, 2) "
        "select doc_a, doc_b, round(inter / (sa.n_sh + sb.n_sh - inter), 4) as jaccard "
        "from inter join sizes sa on sa.doc_id = doc_a join sizes sb on sb.doc_id = doc_b "
        "where round(inter / (sa.n_sh + sb.n_sh - inter), 4) >= 0.05"
    )
    o["dedup_minhash_lsh"] = (
        f"with sh as ({sh}), shc as ({shc}), "
        "sig as (select doc_id, h.hash_id, min("
        + _H60.format(x="concat(h.hash_id, '#', sh)")
        + ") as minhash from shc, unnest(range(0, 6)) as h(hash_id) group by 1, 2), "
        "banded as (select doc_id, cast(hash_id // 2 as int) as band, "
        "string_agg(minhash, '|' order by hash_id) as band_key from sig group by 1, 2) "
        "select distinct a.doc_id as doc_a, b.doc_id as doc_b "
        "from banded a join banded b using (band, band_key) where a.doc_id < b.doc_id"
    )
    # end-to-end near-dup clustering twin: the LSH pair chain above feeds a
    # recursive reachability CTE (same derivation as the er_resolve cluster
    # twin); node keys are zero-padded so the component-min rule orders
    # numerically on both engines
    o["dedup_clusters"] = (
        f"with recursive sh as ({sh}), shc as ({shc}), "
        "sig as (select doc_id, h.hash_id, min("
        + _H60.format(x="concat(h.hash_id, '#', sh)")
        + ") as minhash from shc, unnest(range(0, 6)) as h(hash_id) group by 1, 2), "
        "banded as (select doc_id, cast(hash_id // 2 as int) as band, "
        "string_agg(minhash, '|' order by hash_id) as band_key from sig group by 1, 2), "
        "prs as (select distinct a.doc_id as doc_a, b.doc_id as doc_b "
        "from banded a join banded b using (band, band_key) where a.doc_id < b.doc_id), "
        "nodes as (select lpad(cast(doc_id as varchar), 20, '0') as node, doc_id from documents), "
        "ed as (select lpad(cast(doc_a as varchar), 20, '0') as src, "
        "lpad(cast(doc_b as varchar), 20, '0') as dst from prs), "
        "sym as (select src, dst from ed union select dst, src from ed), "
        "reach(node, r) as (select node, node from nodes "
        "union select reach.node, sym.dst from reach join sym on reach.r = sym.src), "
        "cl as (select node, min(r) as rep from reach group by 1) "
        "select n.doc_id, cast(cl.rep as bigint) as cluster_id, "
        "n.doc_id = cast(cl.rep as bigint) as is_canonical "
        "from nodes n join cl on n.node = cl.node"
    )
    # embedding-space clustering twin: LSH signature pairs -> recursive
    # closure, identical derivation to dedup_clusters over vec_ids
    o["embedding_neardup_clusters"] = (
        "with recursive s as (select vec_id, embedding, "
        + _lsh_sig_sql("embedding")
        + " as sig from embeddings), "
        "prs as (select a.vec_id as id_a, b.vec_id as id_b "
        "from s a join s b on a.sig = b.sig and a.vec_id < b.vec_id "
        "where round(list_dot_product(a.embedding, b.embedding) / "
        "(sqrt(list_dot_product(a.embedding, a.embedding)) * "
        "sqrt(list_dot_product(b.embedding, b.embedding))), 4) >= 0.2), "
        "nodes as (select lpad(cast(vec_id as varchar), 20, '0') as node, vec_id from embeddings), "
        "ed as (select lpad(cast(id_a as varchar), 20, '0') as src, "
        "lpad(cast(id_b as varchar), 20, '0') as dst from prs), "
        "sym as (select src, dst from ed union select dst, src from ed), "
        "reach(node, r) as (select node, node from nodes "
        "union select reach.node, sym.dst from reach join sym on reach.r = sym.src), "
        "cl as (select node, min(r) as rep from reach group by 1) "
        "select n.vec_id, cast(cl.rep as bigint) as cluster_id, "
        "n.vec_id = cast(cl.rep as bigint) as is_canonical "
        "from nodes n join cl on n.node = cl.node"
    )
    o["dedup_simhash"] = (
        "with tk as (select distinct doc_id, t.token as token from documents, "
        "unnest(string_split(text,' ')) as t(token)), "
        "th as (select doc_id, " + _H60.format(x="token") + " as h from tk), "
        "votes as (select doc_id, b.bit, sum(case when (h >> b.bit) & 1 = 1 then 1 else -1 end) as v "
        "from th, unnest(range(0, 32)) as b(bit) group by 1, 2) "
        "select doc_id, cast(sum(case when v > 0 then (cast(1 as bigint) << bit) else 0 end) as bigint) as simhash "
        "from votes group by 1"
    )
    o["embedding_neardup"] = (
        "select a.vec_id as id_a, b.vec_id as id_b, "
        "round(list_dot_product(a.embedding, b.embedding) / "
        "(sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 4) as cos "
        "from embeddings a join embeddings b on a.vec_id < b.vec_id "
        "where round(list_dot_product(a.embedding, b.embedding) / "
        "(sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 4) >= 0.5"
    )
    o["ann_topk_lsh"] = (
        "with e as (select vec_id, embedding, "
        + _lsh_sig_sql("embedding")
        + " as sig from embeddings), "
        "q as (select vec_id as query_id, embedding as qe, sig from e where vec_id < 10), "
        "cands as (select q.query_id, e.vec_id, e.embedding, q.qe from e join q using (sig) "
        "where e.vec_id != q.query_id), "
        "scored as (select query_id, vec_id, "
        "round(list_dot_product(embedding, qe) / "
        "(sqrt(list_dot_product(embedding, embedding)) * sqrt(list_dot_product(qe, qe))), 4) as cos "
        "from cands), "
        "r as (select query_id, vec_id, cos, row_number() over "
        "(partition by query_id order by cos desc, vec_id asc) as rank from scored) "
        "select query_id, vec_id, cos, rank from r where rank <= 5"
    )
    o["embedding_neardup_lsh"] = (
        "with s as (select vec_id, embedding, "
        + _lsh_sig_sql("embedding")
        + " as sig from embeddings) "
        "select a.vec_id as id_a, b.vec_id as id_b, "
        "round(list_dot_product(a.embedding, b.embedding) / "
        "(sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 4) as cos "
        "from s a join s b on a.sig = b.sig and a.vec_id < b.vec_id "
        "where round(list_dot_product(a.embedding, b.embedding) / "
        "(sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 4) >= 0.2"
    )
    o["ann_topk"] = (
        "with q as (select vec_id as query_id, embedding as qe from embeddings where vec_id < 10), "
        "scored as (select q.query_id, e.vec_id, "
        "round(list_dot_product(e.embedding, q.qe) / "
        "(sqrt(list_dot_product(e.embedding, e.embedding)) * sqrt(list_dot_product(q.qe, q.qe))), 4) as cos "
        "from embeddings e cross join q where e.vec_id != q.query_id), "
        "r as (select query_id, vec_id, cos, row_number() over "
        "(partition by query_id order by cos desc, vec_id asc) as rank from scored) "
        "select query_id, vec_id, cos, rank from r where rank <= 5"
    )
    # IVF-flat twin: identical md5-stride centroid selection, rounded
    # argmax cell routing (ulp-safe, see corpus.ivf_cells), n_probe=4,
    # k=5 — the full route-then-search recomputed natively
    _c = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 4)"
    )
    o["ann_topk_ivf"] = (
        "with e as (select vec_id, embedding from embeddings), "
        "st as (select cast(ceil(count(*) / 16.0) as bigint) as stride from e), "
        "cn as (select vec_id as cv, embedding as ce from e, st where "
        + _H60.format(x="cast(vec_id as varchar)")
        + " % st.stride = 0), "
        "cents as (select row_number() over (order by cv) - 1 as cell, ce from cn), "
        "asg0 as (select e.vec_id, c.cell, "
        + _c.format(a="e.embedding", b="c.ce")
        + " as cc from e cross join cents c), "
        "asg as (select vec_id, cell from (select asg0.*, row_number() over "
        "(partition by vec_id order by cc desc, cell asc) as r from asg0) where r = 1), "
        "q as (select vec_id as query_id, embedding as qe from e where vec_id < 10), "
        "qs as (select q.query_id, q.qe, c.cell, "
        + _c.format(a="q.qe", b="c.ce")
        + " as cc from q cross join cents c), "
        "probes as (select query_id, qe, cell from (select qs.*, row_number() over "
        "(partition by query_id order by cc desc, cell asc) as r from qs) where r <= 4), "
        "cand as (select p.query_id, e.vec_id, "
        + _c.format(a="e.embedding", b="p.qe")
        + " as cos from e join asg using (vec_id) join probes p using (cell) "
        "where e.vec_id != p.query_id), "
        "rk as (select query_id, vec_id, cos, row_number() over "
        "(partition by query_id order by cos desc, vec_id asc) as rank from cand) "
        "select query_id, vec_id, cos, rank from rk where rank <= 5"
    )
    # trained-quantizer twin (VERDICT r4 #6): same seed cells, then ONE
    # relational Lloyd round — unnest components, avg per (cell, dim)
    # rounded to 4 dp (the determinism rule), reassemble ordered by dim,
    # re-assign — and the identical route-then-search over the refined
    # centroids.  Every step is the exact SQL re-derivation of
    # corpus.ivf_cells(lloyd_iters=1).
    _ivf_seed = (
        "with e as (select vec_id, embedding from embeddings), "
        "st as (select cast(ceil(count(*) / 16.0) as bigint) as stride from e), "
        "cn as (select vec_id as cv, embedding as ce from e, st where "
        + _H60.format(x="cast(vec_id as varchar)")
        + " % st.stride = 0), "
        "cents as (select row_number() over (order by cv) - 1 as cell, ce from cn), "
        "asg0 as (select e.vec_id, c.cell, "
        + _c.format(a="e.embedding", b="c.ce")
        + " as cc from e cross join cents c), "
        "asg as (select vec_id, cell from (select asg0.*, row_number() over "
        "(partition by vec_id order by cc desc, cell asc) as r from asg0) where r = 1)"
    )
    o["ann_topk_ivf_trained"] = (
        _ivf_seed + ", "
        "comp as (select asg.cell, i.i as dim, cast(e.embedding[i.i + 1] as double) as v "
        "from e join asg using (vec_id), unnest(range(0, 64)) as i(i)), "
        "mn as (select cell, dim, round(avg(v), 4) as m from comp group by 1, 2), "
        "cents2 as (select cell, list(m order by dim) as ce from mn group by cell), "
        "asg20 as (select e.vec_id, c.cell, "
        + _c.format(a="e.embedding", b="c.ce")
        + " as cc from e cross join cents2 c), "
        "asg2 as (select vec_id, cell from (select asg20.*, row_number() over "
        "(partition by vec_id order by cc desc, cell asc) as r from asg20) where r = 1), "
        "q as (select vec_id as query_id, embedding as qe from e where vec_id < 10), "
        "qs as (select q.query_id, q.qe, c.cell, "
        + _c.format(a="q.qe", b="c.ce")
        + " as cc from q cross join cents2 c), "
        "probes as (select query_id, qe, cell from (select qs.*, row_number() over "
        "(partition by query_id order by cc desc, cell asc) as r from qs) where r <= 4), "
        "cand as (select p.query_id, e.vec_id, "
        + _c.format(a="e.embedding", b="p.qe")
        + " as cos from e join asg2 using (vec_id) join probes p using (cell) "
        "where e.vec_id != p.query_id), "
        "rk as (select query_id, vec_id, cos, row_number() over "
        "(partition by query_id order by cos desc, vec_id asc) as rank from cand) "
        "select query_id, vec_id, cos, rank from rk where rank <= 5"
    )
    o["lm_bigram_score"] = (
        "with base as (select doc_id, string_split(text,' ') as toks from documents), "
        "b as (select doc_id, array_to_string(toks[i:i+1], ' ') as g from base, "
        "unnest(range(1, greatest(len(toks) - 1, 0) + 1)) as r(i) where len(toks[i:i+1]) = 2), "
        "lm as (select g, count(*) as freq from b group by 1), "
        "d as (select doc_id, count(*) as n_bigrams, sum(freq) as s from b join lm using (g) group by 1) "
        "select doc_id, cast(n_bigrams as bigint) as n_bigrams, "
        "(s * 10000) // n_bigrams / 10000.0 as mean_bigram_freq from d"
    )
    o["repetition_metrics"] = (
        "with base as (select doc_id, string_split(text,' ') as toks from documents), "
        "b as (select doc_id, array_to_string(toks[i:i+1], ' ') as g from base, "
        "unnest(range(1, greatest(len(toks) - 1, 0) + 1)) as r(i) where len(toks[i:i+1]) = 2), "
        "bc as (select doc_id, g, count(*) as c from b group by 1, 2), "
        "bm as (select doc_id, round(max(c) / sum(c), 4) as top_bigram_frac from bc group by 1), "
        "t as (select doc_id, array_to_string(toks[i:i+2], ' ') as g from base, "
        "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) as r(i) where len(toks[i:i+2]) = 3), "
        "tc as (select doc_id, g, count(*) as c from t group by 1, 2), "
        "tm as (select doc_id, round(1.0 - count(*) / sum(c), 4) as dup_trigram_frac from tc group by 1) "
        "select doc_id, top_bigram_frac, dup_trigram_frac from bm join tm using (doc_id)"
    )
    o["remove_stopwords"] = (
        "with base as (select doc_id, string_split(text,' ') as toks from documents), "
        "k as (select doc_id, toks, list_filter(toks, t -> not list_contains("
        "['the','a','an','of','and','to','in','is','was','for','on','that','with','as'], t)) as kept "
        "from base) "
        "select doc_id, array_to_string(kept, ' ') as clean_text, "
        "cast(len(toks) - len(kept) as int) as n_removed from k"
    )
    # the pruned snapshot read is an optimization, never a semantics
    # change: the twin is the plain ranged SELECT the pruned plan answers
    o["snapshot_prune"] = (
        "select doc_id, lang, n_chars from documents "
        "where doc_id between 100 and 349"
    )
    o["snapshot_evolve"] = "select doc_id, n_chars as len_chars from documents"
    o["snapshot_partition_prune"] = (
        "select doc_id, lang, n_chars from documents where lang = 'en'"
    )
    o["snapshot_wap"] = "select doc_id, lang, n_chars from documents"
    o["stream_snapshot_sink"] = "select doc_id, lang, n_chars from documents"
    o["snapshot_merge"] = (
        "select doc_id, lang, case when doc_id < 50 then n_chars * 2 "
        "else n_chars end as n_chars from documents "
        "union all "
        "select doc_id + 1000000000 as doc_id, lang, n_chars from documents "
        "where doc_id % 10 = 7"
    )
    o["text_quality"] = (
        "with base as (select doc_id, text, string_split(text, ' ') as toks from documents), "
        "m as (select doc_id, text, len(toks) as n, "
        "len(list_filter(toks, t -> list_contains(['the','a','an','of','and','to','in','is','was','for','on','that','with','as'], t))) as n_stop, "
        "length(regexp_replace(text, '[^a-z]', '', 'g')) as alpha from base) "
        "select doc_id, n as n_tokens, round((length(text) - n + 1) / n, 4) as avg_token_len, "
        "round(n_stop / n, 4) as stopword_ratio, round(alpha / length(text), 4) as alpha_ratio, "
        "round(least(n / 100.0, 1.0) * 0.5 + (1 - n_stop / n) * 0.2 + (alpha / length(text)) * 0.3, 4) as quality "
        "from m"
    )
    # the training-corpus composition: quality gates AND canonical-only
    # dedup survivors — quality CTE nested from the text_quality twin,
    # cluster rep from the same recursive closure as dedup_clusters
    o["clean_corpus"] = (
        f"with recursive sh as ({sh}), shc as ({shc}), "
        "sig as (select doc_id, h.hash_id, min("
        + _H60.format(x="concat(h.hash_id, '#', sh)")
        + ") as minhash from shc, unnest(range(0, 6)) as h(hash_id) group by 1, 2), "
        "banded as (select doc_id, cast(hash_id // 2 as int) as band, "
        "string_agg(minhash, '|' order by hash_id) as band_key from sig group by 1, 2), "
        "prs as (select distinct a.doc_id as doc_a, b.doc_id as doc_b "
        "from banded a join banded b using (band, band_key) where a.doc_id < b.doc_id), "
        "nodes as (select lpad(cast(doc_id as varchar), 20, '0') as node, doc_id from documents), "
        "ed as (select lpad(cast(doc_a as varchar), 20, '0') as src, "
        "lpad(cast(doc_b as varchar), 20, '0') as dst from prs), "
        "sym as (select src, dst from ed union select dst, src from ed), "
        "reach(node, r) as (select node, node from nodes "
        "union select reach.node, sym.dst from reach join sym on reach.r = sym.src), "
        "cl as (select node, min(r) as rep from reach group by 1), "
        f"tq as ({o['text_quality']}) "
        "select d.doc_id, d.lang, tq.quality, cast(cl.rep as bigint) as cluster_id "
        "from documents d join tq using (doc_id) "
        "join nodes n on n.doc_id = d.doc_id join cl on cl.node = n.node "
        "where tq.n_tokens >= 5 and tq.alpha_ratio >= 0.5 "
        "and tq.stopword_ratio <= 0.9 and d.doc_id = cast(cl.rep as bigint)"
    )
    o["token_counts"] = (
        "select doc_id, len(string_split(text, ' ')) as ws_tokens, "
        "len(regexp_extract_all(text, '[a-z]+|[0-9]+')) as re_tokens, "
        "len(list_distinct(string_split(text, ' '))) as distinct_tokens from documents"
    )
    o["lang_id"] = (
        "with m as (select doc_id, string_split(text,' ') as toks from documents), "
        "r as (select doc_id, round(len(list_filter(toks, t -> list_contains(['the','a','an','of','and','to','in','is','was','for','on','that','with','as'], t))) / len(toks), 4) as en_ratio from m) "
        "select doc_id, case when en_ratio >= 0.05 then 'en' else 'other' end as pred_lang, en_ratio from r"
    )
    o["fingerprint"] = (
        "with base as (select doc_id, string_split(text,' ') as toks from documents), "
        "tk as (select doc_id, i - 1 as pos, toks[i] as token from base, "
        "unnest(range(1, len(toks) + 1)) as r(i)), "
        "ph as (select doc_id, "
        + _H60.format(x="concat(token, '|', pos)")
        + " as ph from tk) "
        "select doc_id, bit_xor(ph) as fingerprint from ph group by 1"
    )
    # benchmark decontamination twin: same trigram derivation as the sh
    # CTE, benchmark = doc_id % 97 == 0, survivors = training docs with
    # no shared trigram hash
    o["decontaminate"] = (
        "with g as (select doc_id, "
        + _H60.format(x="array_to_string(toks[i:i+2], ' ')")
        + " as sh from (select doc_id, string_split(text,' ') as toks from documents), "
        "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) as r(i) "
        "where len(toks[i:i+2]) = 3), "
        "bench as (select distinct sh from g where doc_id % 97 = 0), "
        "cont as (select distinct g.doc_id from g join bench using (sh) "
        "where g.doc_id % 97 <> 0) "
        "select d.doc_id, d.lang, d.n_chars from documents d "
        "left join cont on d.doc_id = cont.doc_id "
        "where d.doc_id % 97 <> 0 and cont.doc_id is null"
    )
    # CCNet-style resampling twin: quality CTE from the text_quality
    # twin; all-integer basis-point draw so no float boundary can differ
    o["importance_resample"] = (
        "with base as (select doc_id, text, string_split(text, ' ') as toks from documents), "
        "m as (select doc_id, text, len(toks) as n, "
        "len(list_filter(toks, t -> list_contains(['the','a','an','of','and','to','in','is','was','for','on','that','with','as'], t))) as n_stop, "
        "length(regexp_replace(text, '[^a-z]', '', 'g')) as alpha from base), "
        "q as (select doc_id, round(least(n / 100.0, 1.0) * 0.5 + (1 - n_stop / n) * 0.2 + (alpha / length(text)) * 0.3, 4) as quality from m), "
        "r as (select doc_id, "
        "case when quality >= 0.78 then 'head' when quality >= 0.63 then 'middle' else 'tail' end as bucket, "
        "case when quality >= 0.78 then 10000 when quality >= 0.63 then 5000 else 1000 end as rate_bp, "
        + _H60.format(x="'resample-v1#' || cast(doc_id as varchar)")
        + " % 10000 as draw_bp from q) "
        "select doc_id, bucket, draw_bp from r where draw_bp < rate_bp"
    )
    # per-domain curation twin: quality CTE from the text_quality twin
    # with source carried through; mean over the per-doc 4 dp values,
    # itself rounded to 4 dp (the cross-engine float rule)
    o["source_stats"] = (
        "with base as (select doc_id, source, text, string_split(text, ' ') as toks from documents), "
        "m as (select doc_id, source, text, len(toks) as n, "
        "len(list_filter(toks, t -> list_contains(['the','a','an','of','and','to','in','is','was','for','on','that','with','as'], t))) as n_stop, "
        "length(regexp_replace(text, '[^a-z]', '', 'g')) as alpha from base), "
        "q as (select source, n as n_tokens, round(least(n / 100.0, 1.0) * 0.5 + (1 - n_stop / n) * 0.2 + (alpha / length(text)) * 0.3, 4) as quality from m) "
        "select source, count(*) as n_docs, cast(sum(n_tokens) as bigint) as total_tokens, "
        "(cast(sum(cast(round(quality * 10000) as bigint)) as bigint) // count(*)) / 10000.0 as mean_quality, "
        "(cast(sum(cast(round(quality * 10000) as bigint)) as bigint) // count(*)) / 10000.0 >= 0.70 as keep "
        "from q group by source"
    )
    # distributed-prefix-sum packing twin: DuckDB computes the same
    # bucketed exclusive cumsum in one pass (sum casts: DuckDB sum(int)
    # is HUGEINT — pin to bigint like the Spark longs)
    o["pack_sequences"] = (
        "with t as (select doc_id, len(string_split(text, ' ')) as n_tokens, "
        "doc_id // 64 as bucket from documents), "
        "b as (select bucket, cast(sum(n_tokens) as bigint) as bucket_tokens from t group by 1), "
        "ofs as (select bucket, cast(coalesce(sum(bucket_tokens) over "
        "(order by bucket rows between unbounded preceding and 1 preceding), 0) as bigint) as bucket_offset from b), "
        "w as (select t.doc_id, t.n_tokens, ofs.bucket_offset + "
        "cast(coalesce(sum(t.n_tokens) over (partition by t.bucket order by t.doc_id "
        "rows between unbounded preceding and 1 preceding), 0) as bigint) as tokens_before "
        "from t join ofs using (bucket)) "
        "select doc_id, n_tokens, tokens_before // 2048 as shard_id, "
        "tokens_before % 2048 as shard_offset from w"
    )
    o["windowed_agg"] = (
        "select cast(date_trunc('hour', ts) as varchar) as hour, event_type, "
        "count(*) as n, "
        "((cast(sum(cast(round(value * 100) as bigint)) as bigint) * 100) // count(*)) / 10000.0 as avg_value "
        "from events group by 1, 2"
    )
    o["sessionization"] = (
        "with g as (select user_id, ts, lag(ts) over (partition by user_id order by ts, event_id) as prev_ts from events) "
        "select user_id, cast(sum(case when prev_ts is null or epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 "
        "then 1 else 0 end) as bigint) as n_sessions from g group by 1"
    )
    lang_j = (
        "with m as (select doc_id, string_split(text,' ') as toks from documents), "
        "r as (select doc_id, round(len(list_filter(toks, t -> list_contains(['the','a','an','of','and','to','in','is','was','for','on','that','with','as'], t))) / len(toks), 4) as en_ratio from m), "
        "p as (select doc_id, case when en_ratio >= 0.05 then 'en' else 'other' end as pred from r) "
        "select p.pred, d.lang as gold from p join documents d using (doc_id)"
    )
    o["eval_lang_micro"] = (
        f"with j as ({lang_j}), "
        "a as (select cast(sum(case when pred = gold then 1 else 0 end) as bigint) as tp, "
        "cast(sum(case when pred != gold then 1 else 0 end) as bigint) as fp, "
        "cast(sum(case when pred != gold then 1 else 0 end) as bigint) as fn from j) "
        "select tp, fp, fn, round(tp / (tp + fp), 6) as precision, round(tp / (tp + fn), 6) as recall, "
        "round(2.0 * tp / (2 * tp + fp + fn), 6) as f1 from a"
    )
    o["eval_lang_per_class"] = (
        f"with j as ({lang_j}), "
        "tp as (select gold as label, cast(count(*) as bigint) as tp from j where pred = gold group by 1), "
        "fp as (select pred as label, cast(count(*) as bigint) as fp from j where pred != gold group by 1), "
        "fn as (select gold as label, cast(count(*) as bigint) as fn from j where pred != gold group by 1), "
        "base as (select coalesce(tp.label, fp.label, fn.label) as label, "
        "coalesce(tp, 0) as tp, coalesce(fp, 0) as fp, coalesce(fn, 0) as fn "
        "from tp full join fp using (label) full join fn using (label)), "
        "m as (select label, tp, fp, fn, "
        "case when tp + fp > 0 then tp / (tp + fp) else 0.0 end as p, "
        "case when tp + fn > 0 then tp / (tp + fn) else 0.0 end as r from base) "
        "select label, tp, fp, fn, round(p, 6) as precision, round(r, 6) as recall, "
        "round(case when p + r > 0 then 2 * p * r / (p + r) else 0.0 end, 6) as f1 from m"
    )
    o["class_weights"] = (
        "with c as (select lang, count(*) as n from documents group by 1) "
        "select lang, round((select count(*) from documents) / ((select count(*) from c) * n), 6) as weight from c"
    )
    o["sample_head"] = (
        "select doc_id from documents order by doc_id "
        "limit (select cast(count(*) // 10 as bigint) from documents)"
    )
    o["scalar_id_coercion"] = (
        "select distinct source, cast(regexp_extract(source, '([0-9]+)$', 1) as int) as source_num from documents"
    )
    o["degree_lookup"] = (
        "with e as (select o_custkey as src, o_orderkey as dst from orders), "
        "od as (select src as node, count(*) as out_degree from e group by 1), "
        "id as (select dst as node, count(*) as in_degree from e group by 1) "
        "select coalesce(od.node, id.node) as node, cast(coalesce(out_degree, 0) as bigint) as out_degree, "
        "cast(coalesce(in_degree, 0) as bigint) as in_degree from od full join id using (node)"
    )
    # BFS-depth twin: recursive walk down from the root, min depth per
    # node (the DAG is the 2-level customer->nation->region hierarchy;
    # the depth guard mirrors bfs_depths' max_depth)
    o["graph_bfs_depths"] = (
        "with recursive e as (select 'n' || n_nationkey as src, 'r' || n_regionkey as dst from nation "
        "union all select 'c' || c_custkey, 'n' || c_nationkey from customer), "
        "walk(node, depth) as (select 'r0', 0 "
        "union all select e.src, walk.depth + 1 from walk join e on e.dst = walk.node "
        "where walk.depth < 20) "
        "select node, cast(min(depth) as int) as depth from walk group by node"
    )
    o["single_parent_predicate"] = (
        "with e as (select o_custkey as src, o_orderkey as dst from orders), "
        "c as (select src from e group by src having count(*) = 1) "
        "select e.src as child, e.dst as parent from e join c using (src)"
    )
    o["relation_coassociation"] = (
        "with li as (select distinct l_orderkey, l_partkey from lineitem) "
        "select a.l_partkey as part_a, b.l_partkey as part_b, count(*) as n_shared "
        "from li a join li b using (l_orderkey) where a.l_partkey < b.l_partkey "
        "group by 1, 2 having count(*) >= 2"
    )
    o["tpch_q1"] = (
        "select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty, "
        "round(sum(l_extendedprice), 2) as sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price, "
        "((cast(sum(cast(round(l_quantity) as bigint)) as bigint) * 10000) // count(*)) / 10000.0 as avg_qty, "
        "count(*) as count_order "
        "from lineitem where l_shipdate <= '1998-09-02' group by 1, 2"
    )
    o["tpch_q3"] = (
        "with rev as (select l_orderkey, o_orderdate, o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue "
        "from lineitem join orders on l_orderkey = o_orderkey "
        "join customer on o_custkey = c_custkey "
        "where c_mktsegment = 'BUILDING' and o_orderdate < '1998-01-01' "
        "and l_shipdate > '1998-01-01' group by 1, 2, 3), "
        "k as (select l_orderkey, revenue, cast(o_orderdate as varchar) as o_orderdate, "
        "o_orderpriority, row_number() over (order by revenue desc, l_orderkey asc) as rank from rev) "
        "select l_orderkey, revenue, o_orderdate, o_orderpriority, rank from k where rank <= 10"
    )
    o["top_revenue_nations"] = (
        "with r as (select n_name, round(sum(o_totalprice), 2) as revenue "
        "from orders join customer on o_custkey = c_custkey "
        "join nation on c_nationkey = n_nationkey group by 1), "
        "k as (select n_name, revenue, row_number() over (order by revenue desc, n_name asc) as rank from r) "
        "select n_name, revenue, rank from k where rank <= 5"
    )
    o["best_candidate_gap"] = (
        "with q as (select vec_id as query_id, embedding as qe from embeddings where vec_id < 10), "
        "scored as (select q.query_id, e.vec_id, "
        "round(list_dot_product(e.embedding, q.qe) / (sqrt(list_dot_product(e.embedding, e.embedding)) * sqrt(list_dot_product(q.qe, q.qe))), 4) as cos "
        "from embeddings e cross join q where e.vec_id != q.query_id), "
        "r as (select query_id, vec_id, cos, row_number() over (partition by query_id order by cos desc, vec_id asc) as rank from scored), "
        "t as (select query_id, vec_id, cos, lead(cos) over (partition by query_id order by rank) as next_cos, rank from r where rank <= 2), "
        "g as (select query_id, vec_id, round(cos - coalesce(next_cos, 0.0), 4) as gap from t where rank = 1), "
        "rn as (select query_id, vec_id as runner_id from r where rank = 2) "
        "select g.query_id, case when g.gap >= 0.1 or rn.runner_id is null then g.vec_id "
        "else least(g.vec_id, rn.runner_id) end as best_id, g.gap from g left join rn using (query_id)"
    )
    o["endpoint_max_contribution"] = (
        "with per_src as (select l_partkey, l_suppkey, "
        "max(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) as max_contrib_cents "
        "from lineitem group by 1, 2) "
        "select l_partkey, cast(sum(max_contrib_cents) as bigint) as total_cents, count(*) as n_sources from per_src group by 1"
    )
    o["gold_candidate_reorder"] = (
        "with tk as (select distinct doc_id, t.token as token from documents, "
        "unnest(string_split(text,' ')) as t(token) where length(t.token) >= 3), "
        "l as (select doc_id, list_sort(list(token)) as cands from tk group by 1) "
        "select doc_id, array_to_string(list_prepend(list_min(cands), list_filter(cands, x -> x != list_min(cands))), ' ') as reordered from l"
    )
    # DuckDB twin of the flagship S1 extraction (operators/extract.py:33 +
    # oracle.extract_mentions).  Valid because (a) every gazetteer entry
    # here is exactly two words — only length-2 probes can match (word-
    # count gate) — and (b) the corpus tokens are normalization-invariant,
    # so greedy longest-match consumption reduces to "even offset within
    # each maximal run of consecutive matching positions" (the same
    # reduction extract_mentions_relational uses, parity-tested in
    # tests/test_extract_fastpath.py).
    _norm_sql = (
        "trim(regexp_replace(regexp_replace("
        "replace(replace(replace(lower({t}), ':', '_'), ',', ''), '''', ''),"
        " '[^a-z0-9\\- ]+', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    o["er_extract_mentions"] = (
        "with gaz as (select array_to_string(toks0[i:i+1], ' ') as s "
        "from (select string_split(text, ' ') as toks0 from documents), "
        "unnest(range(1, greatest(len(toks0) - 1, 0) + 1)) as r(i) "
        "where len(toks0[i:i+1]) = 2 "
        "group by s order by count(*) desc, s asc limit 100), "
        "dt as (select 'doc://0/' || doc_id as url, "
        "trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) as text "
        "from documents where lang = 'en'), "
        "base as (select url, string_split(text, ' ') as toks from dt), "
        "p as (select url, i - 1 as pos, toks[i] || ' ' || toks[i+1] as surface, "
        + _norm_sql.format(t="toks[i]")
        + " || ' ' || "
        + _norm_sql.format(t="toks[i+1]")
        + " as nbigram from base, unnest(range(1, len(toks))) as r(i)), "
        "m as (select p.* from p join gaz on p.nbigram = gaz.s), "
        "runs as (select *, pos - row_number() over (partition by url order by pos) as rk from m), "
        "res as (select *, min(pos) over (partition by url, rk) as run_start from runs) "
        "select url, substr(md5(url || '|' || pos || '|' || surface), 1, 16) as mention_id, "
        "surface, cast(pos as int) as pos, nbigram as norm "
        "from res where (pos - run_start) % 2 = 0"
    )
    # flagship end-to-end gate: SQL-derived mentions + DuckDB-derived
    # transitive closure.  Only the thresholded similarity EDGES come from
    # the shared-scoring Python oracle (see _er_edge_values_sql); the
    # cluster ids are recomputed here by a recursive reachability CTE
    # (component label = min reachable form, the engine's component-min
    # rule re-derived by a third engine).
    _ev = _er_edge_values_sql(
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    )
    if _ev is not None:
        o["er_resolve"] = (
            f"with recursive em as ({o['er_extract_mentions']}), "
            "forms as (select distinct norm from em), "
            f"ed as (select src, dst from {_ev}), "
            "sym as (select src, dst from ed union select dst, src from ed), "
            "reach(node, r) as (select norm, norm from forms "
            "union select reach.node, sym.dst from reach join sym on reach.r = sym.src), "
            "clusters as (select node as norm, min(r) as cluster_id from reach group by 1) "
            "select em.url, em.mention_id, em.surface, em.pos, em.norm, c.cluster_id "
            "from em join clusters c using (norm)"
        )
    if _ev is not None:
        # the streaming serving path equals the batch output by
        # construction (stream-static join against the batch cluster
        # table) — gated against the SAME independent twin
        o["stream_resolve"] = o["er_resolve"]
        # incremental resume must equal a from-scratch run over the full
        # corpus (the tested clusters==scratch invariant) — so the twin is
        # er_resolve's, making resume a driver-gated hash-exact property
        o["er_resolve_incremental"] = o["er_resolve"]
        # north-rule gate twin (VERDICT r4 #5): the SAME judgment SQL with
        # pred clusters from DuckDB's OWN recursive-CTE derivation; gold =
        # the REFERENCE clusters (oracle.cluster_forms over the same
        # forms) as a VALUES literal — exactly the "pairwise F1 vs
        # reference clusters on labeled same-blocking-key pairs" gate
        _gold_vals = _ER_GOLD_CACHE[
            os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
        ]
        o["er_pairwise_f1"] = (
            f"with recursive em as ({o['er_extract_mentions']}), "
            "forms as (select distinct norm from em), "
            f"ed as (select src, dst from {_ev}), "
            "sym as (select src, dst from ed union select dst, src from ed), "
            "reach(node, r) as (select norm, norm from forms "
            "union select reach.node, sym.dst from reach join sym on reach.r = sym.src), "
            "clusters as (select node as norm, min(r) as cluster_id from reach group by 1), "
            # EvaNIL-style refined split: md5 bucket >= 70 = test forms
            "tf as (select norm from clusters where "
            "(('0x' || substr(md5(norm), 1, 15))::bigint % 100) >= 70), "
            "tok as (select norm, t.tok as tok from tf, "
            "unnest(string_split(norm, ' ')) as t(tok) where length(t.tok) >= 3), "
            "bk as (select norm, tok as block_key from tok "
            "union select norm, case when length(tok) > 3 and tok like '%s' "
            "and tok not like '%ss' then substr(tok, 1, length(tok) - 1) "
            "else tok end from tok), "
            "prs as (select distinct x.norm as a, y.norm as b from bk x "
            "join bk y on x.block_key = y.block_key and x.norm < y.norm), "
            f"g as (select * from (values {_gold_vals}) as t(norm, gold)), "
            "lab as (select a, b, case when ga.gold is not null and "
            "gb.gold is not null and ga.gold = gb.gold then true else false end "
            "as is_match from prs left join g ga on prs.a = ga.norm "
            "left join g gb on prs.b = gb.norm), "
            "j as (select (ca.cluster_id = cb.cluster_id) as pm, lab.is_match as gm "
            "from lab join clusters ca on lab.a = ca.norm "
            "join clusters cb on lab.b = cb.norm), "
            "agg as (select cast(sum(case when pm and gm then 1 else 0 end) as bigint) as tp, "
            "cast(sum(case when pm and not gm then 1 else 0 end) as bigint) as fp, "
            "cast(sum(case when (not pm) and gm then 1 else 0 end) as bigint) as fn from j), "
            "pr as (select tp, fp, fn, "
            "case when tp + fp > 0 then tp / (tp + fp) else 1.0 end as p, "
            "case when tp + fn > 0 then tp / (tp + fn) else 1.0 end as r from agg) "
            "select tp, fp, fn, round(p, 6) as precision, round(r, 6) as recall, "
            "round(case when p + r > 0 then 2 * p * r / (p + r) else 0.0 end, 6) as f1 from pr"
        )
    # streaming session-window twin: session_window starts a NEW session
    # when the gap is >= 30 min (ranges [ts, ts+gap) merge only on strict
    # overlap), vs the batch lag-gap query's strict >.  The twin mirrors
    # the session-window semantics exactly so an exact-1800s gap in the
    # data cannot diverge the engines.
    o["stream_sessionize"] = (
        "with g as (select user_id, ts, lag(ts) over "
        "(partition by user_id order by ts, event_id) as prev_ts from events) "
        "select user_id, cast(sum(case when prev_ts is null "
        "or epoch_us(ts) - epoch_us(prev_ts) >= 1800 * 1000000 "
        "then 1 else 0 end) as bigint) as n_sessions from g group by 1"
    )
    # media near-dup clustering twin: md5-lattice features recomputed
    # natively (same construction the media_features twin proved), then
    # the embedding_neardup_clusters derivation — literal-hyperplane LSH
    # signature equi-join, cosine verify, recursive reachability closure.
    _mf = (
        "m as (select doc_id as media_id, text as txt from documents), "
        "f as (select media_id, i.i as dim, "
        "2.0 * (" + _H60.format(x="md5(txt) || '#' || i.i")
        + " / 1152921504606846976.0) - 1.0 as x "
        "from m, unnest(range(0, 16)) as i(i)), "
        "nn as (select media_id, sqrt(sum(x * x)) as nrm from f group by 1), "
        "v as (select f.media_id as vec_id, "
        "list(cast(cast(f.x / nn.nrm as float) as double) order by f.dim) as emb "
        "from f join nn using (media_id) group by f.media_id)"
    )
    o["media_neardup_clusters"] = (
        "with recursive " + _mf + ", "
        "s as (select vec_id, emb, "
        + _lsh_sig_sql("emb", n_planes=6, dim=16)
        + " as sig from v), "
        "prs as (select a.vec_id as id_a, b.vec_id as id_b "
        "from s a join s b on a.sig = b.sig and a.vec_id < b.vec_id "
        "where round(list_dot_product(a.emb, b.emb) / "
        "(sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 4) >= 0.3), "
        "nodes as (select lpad(cast(vec_id as varchar), 20, '0') as node, vec_id from v), "
        "ed as (select lpad(cast(id_a as varchar), 20, '0') as src, "
        "lpad(cast(id_b as varchar), 20, '0') as dst from prs), "
        "sym as (select src, dst from ed union select dst, src from ed), "
        "reach(node, r) as (select node, node from nodes "
        "union select reach.node, sym.dst from reach join sym on reach.r = sym.src), "
        "cl as (select node, min(r) as rep from reach group by 1) "
        "select n.vec_id, cast(cl.rep as bigint) as cluster_id, "
        "n.vec_id = cast(cl.rep as bigint) as is_canonical "
        "from nodes n join cl on n.node = cl.node"
    )
    # streaming windowed-count twin: the batch recomputation of the
    # watermarked 1-hour windowed mention counts.  warc_ts is derived as
    # 2024-01-01 00:00:00 UTC + doc_id seconds (sources/webtext.py), so
    # the window start is hour-truncated epoch arithmetic on the doc_id
    # parsed back out of the mention url; counts come from the same
    # er_extract_mentions twin the flagship uses.
    o["stream_windowed_counts"] = (
        f"with em as ({o['er_extract_mentions']}), "
        "w as (select cast(cast(to_timestamp((1704067200 + "
        "cast(regexp_extract(url, '([0-9]+)$', 1) as bigint)) // 3600 * 3600) "
        "as timestamp) as varchar) as window_start, norm from em) "
        "select window_start, norm, cast(count(*) as bigint) as n "
        "from w group by 1, 2"
    )
    # multimodal feature twin: md5-lattice features recomputed natively —
    # component x_i = 2*(md5_60bit(md5(payload) || '#' || i)/2^60) - 1,
    # L2-normalized, float32-cast, rounded (float rounding absorbs
    # aggregate-order ulps, like the LSH twins)
    o["media_features"] = (
        "with m as (select doc_id as media_id, "
        "['image','audio','video'][cast(doc_id % 3 as int) + 1] as kind, "
        # md5(VARCHAR) hashes the utf-8 bytes == md5 of the payload blob
        "encode(text) as payload, text as txt from documents), "
        "f as (select media_id, kind, octet_length(payload) as n_bytes, i.i as dim, "
        "2.0 * (" + _H60.format(x="md5(txt) || '#' || i.i")
        + " / 1152921504606846976.0) - 1.0 as x "
        "from m, unnest(range(0, 16)) as i(i)), "
        "n as (select media_id, sqrt(sum(x * x)) as nrm from f group by 1) "
        "select f.media_id, f.kind, cast(f.n_bytes as bigint) as n_bytes, "
        "cast(f.dim as int) as dim, "
        "round(cast(cast(f.x / n.nrm as float) as double), 4) as val "
        "from f join n using (media_id)"
    )
    # video frame sampling twin: kind 'video' == doc_id % 3 == 2 (see the
    # media_features kind mapping); frames are 64-byte slices, every 4th
    # kept (multimodal.frame_sample: range(0, max(1, len//64), 4)); the
    # documents text is ASCII so substr-by-char == slice-by-byte and md5
    # over the VARCHAR frame matches Spark's md5(decode(frame)).
    o["media_frame_sample"] = (
        "with m as (select doc_id as media_id, text as txt from documents "
        "where doc_id % 3 = 2), "
        "f as (select media_id, cast(k.k as int) as frame_idx, "
        "substr(txt, cast(k.k as int) * 64 + 1, 64) as fr "
        "from m, unnest(range(0, greatest(length(txt) // 64, 1), 4)) as k(k)) "
        "select media_id, frame_idx, md5(fr) as frame_md5, "
        "cast(length(fr) as int) as frame_len from f"
    )
    # resize twin: same stride arithmetic from the synthetic meta dims;
    # the resized bytes re-derived one char at a time over a stepped
    # range (ASCII corpus text: byte slices == char slices)
    o["media_resize"] = (
        "with m as (select doc_id as media_id, text as txt, "
        "greatest(1, ((doc_id % 13 + 4) * (doc_id % 7 + 4)) // 16) as stride from documents), "
        "p as (select media_id, string_agg(substr(txt, cast(i.i as int), 1), '' order by i.i) as rz, "
        "count(*) as out_len from m, unnest(range(1, length(txt) + 1, stride)) as i(i) "
        "group by media_id) "
        # left join: an empty-text doc has zero gather positions, but the
        # Spark side still emits its (0-byte, md5('')) row
        "select m.media_id, cast(4 as int) as new_width, cast(4 as int) as new_height, "
        "cast(coalesce(p.out_len, 0) as int) as out_len, md5(coalesce(p.rz, '')) as out_md5 "
        "from m left join p using (media_id)"
    )
    o["eval_filter_top_pred"] = (
        "with q as (select vec_id as query_id, embedding as qe from embeddings where vec_id < 10), "
        "scored as (select q.query_id, e.vec_id, "
        "round(list_dot_product(e.embedding, q.qe) / (sqrt(list_dot_product(e.embedding, e.embedding)) * sqrt(list_dot_product(q.qe, q.qe))), 4) as cos "
        "from embeddings e cross join q where e.vec_id != q.query_id), "
        "r as (select query_id, vec_id, row_number() over (partition by query_id order by cos desc, vec_id asc) as rank from scored), "
        "l as (select query_id, list(cast(vec_id as varchar) order by rank) as ranked from r where rank <= 5 group by 1), "
        "p as (select query_id, ranked, ranked[1] as true_id, ranked[2] as gold_id from l), "
        "f as (select query_id, list_filter(ranked, x -> x != true_id) as remaining, gold_id from p) "
        "select query_id, remaining[1] as answer, remaining[1] = gold_id as is_correct from f"
    )
    return o
