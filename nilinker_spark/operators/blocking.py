"""S2 — normalize, resolve word ids, compute phrase vectors, emit block keys.

All work happens over **distinct normalized surface forms**, not mention
instances — the relational version of the reference's candidate cache
(/root/reference/src/REEL/pre_process.py:250-307): a form seen a million
times is scored once.  At 10^12 documents the distinct-form table is
vocabulary-bounded (millions), so every join against it broadcasts.

Word-id resolution is the two-phase exact/fuzzy plan of the reference
(/root/reference/src/REEL/candidates.py:35-75 and
/root/reference/src/utils/utils.py:321-327), done relationally:

1. exact: broadcast equi-join token -> vocab id  (hits short-circuit out)
2. fuzzy: only the *distinct OOV tokens* (anti-join survivors) go through
   the Arrow UDF that scans the broadcast vocab with a deterministic
   (score desc, word asc) tie-break.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nilinker_spark.fixtures.kb import KBFixture
from nilinker_spark.functions.model import phrase_vectors
from nilinker_spark.functions.similarity import fuzzy_best_match
from nilinker_spark.oracle import PAD_CANDS


def _tokens_lr(df: DataFrame) -> DataFrame:
    """tl/tr columns per the [t, t] duplication rule (utils.py:362-377)."""
    toks = F.split(F.col("norm"), " ")
    return df.withColumn("tl", F.try_element_at(toks, F.lit(1))).withColumn(
        "tr", F.coalesce(F.try_element_at(toks, F.lit(2)), F.try_element_at(toks, F.lit(1)))
    )


def resolve_tokens(spark: SparkSession, forms: DataFrame, kb: KBFixture) -> DataFrame:
    """distinct (token) -> (token, word, word_id): exact then fuzzy fallback."""
    vocab_rows = [(w, i) for w, i in kb.word2id.items()]
    vocab_df = spark.createDataFrame(vocab_rows, "word string, word_id int")

    tokens = (
        _tokens_lr(forms)
        .select(F.explode(F.array("tl", "tr")).alias("token"))
        .distinct()
    )
    exact = tokens.join(F.broadcast(vocab_df), tokens.token == vocab_df.word, "inner").select(
        "token", "word", "word_id"
    )
    oov = tokens.join(F.broadcast(vocab_df), tokens.token == vocab_df.word, "left_anti")

    vocab_b = spark.sparkContext.broadcast(sorted(kb.word2id))
    w2i_b = spark.sparkContext.broadcast(dict(kb.word2id))

    @F.pandas_udf("string")
    def fuzzy_word(s: pd.Series) -> pd.Series:
        vocab = vocab_b.value
        return s.map(lambda tok: fuzzy_best_match(tok, vocab))

    @F.pandas_udf("int")
    def word_to_id(s: pd.Series) -> pd.Series:
        w2i = w2i_b.value
        return s.map(w2i).astype("int32")

    fuzzy = oov.withColumn("word", fuzzy_word("token")).withColumn("word_id", word_to_id("word"))
    return exact.unionByName(fuzzy.select("token", "word", "word_id"))


def phrase_vectors_df(spark: SparkSession, forms: DataFrame, kb: KBFixture) -> DataFrame:
    """distinct (norm) -> (norm, pv array<float>) via one Arrow UDF batch pass.

    The WC candidate blocks and the weight matrices ride a single broadcast;
    the UDF does the batched attention forward pass
    (≙ /root/reference/src/NILINKER/nilinker.py:80-153, vectorized instead
    of the reference's batch-size-1 eager loop at :196).
    """
    token_map = resolve_tokens(spark, forms, kb)

    with_ids = (
        _tokens_lr(forms)
        .join(F.broadcast(token_map.select(F.col("token").alias("tl"),
                                           F.col("word").alias("wl_word"),
                                           F.col("word_id").alias("wl_id"))), "tl")
        .join(F.broadcast(token_map.select(F.col("token").alias("tr"),
                                           F.col("word").alias("wr_word"),
                                           F.col("word_id").alias("wr_id"))), "tr")
    )

    weights_b = spark.sparkContext.broadcast(kb.weights.to_npz_dict())
    wc_by_id_b = spark.sparkContext.broadcast(
        {kb.word2id[w]: cands[:PAD_CANDS] for w, cands in kb.wc.items()}
    )

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def phrase_vec(wl: pd.Series, wr: pd.Series) -> pd.Series:
        from nilinker_spark.functions.model import ModelWeights

        z = weights_b.value
        w = ModelWeights(z["W_a"], z["b_a"], z["W_c"], z["b_c"], z["word_embeds"], z["cand_embeds"])
        wc = wc_by_id_b.value
        n = len(wl)
        wl_ids = wl.to_numpy(dtype=np.int64)
        wr_ids = wr.to_numpy(dtype=np.int64)
        cl = np.full((n, PAD_CANDS), -1, dtype=np.int64)
        cr = np.full((n, PAD_CANDS), -1, dtype=np.int64)
        for i in range(n):
            a = wc.get(int(wl_ids[i]), [])
            b = wc.get(int(wr_ids[i]), [])
            cl[i, : len(a)] = a
            cr[i, : len(b)] = b
        pv = phrase_vectors(wl_ids, wr_ids, cl, cr, w)
        return pd.Series(list(pv))

    return with_ids.select("norm", phrase_vec("wl_id", "wr_id").alias("pv"))


def block_keys_df(forms: DataFrame) -> DataFrame:
    """(norm) -> (norm, block_key) exploded: each >=3-char token plus its
    singular form (plural variants block with their singulars,
    ≙ /root/reference/src/REEL/candidates.py:39-41)."""
    toks = F.filter(F.split(F.col("norm"), " "), lambda t: F.length(t) >= 3)
    singular = F.transform(
        toks,
        lambda t: F.when(
            (F.length(t) > 3) & t.endswith("s") & ~t.endswith("ss"),
            t.substr(F.lit(1), F.length(t) - 1),
        ).otherwise(t),
    )
    keys = F.array_distinct(F.concat(toks, singular))
    return forms.select("norm", F.explode(keys).alias("block_key"))
