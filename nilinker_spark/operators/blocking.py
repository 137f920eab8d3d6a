"""S2 — normalize, resolve word ids, compute phrase vectors, emit block keys.

All work happens over **distinct normalized surface forms**, not mention
instances — the relational version of the reference's candidate cache
(/root/reference/src/REEL/pre_process.py:250-307): a form seen a million
times is scored once.  At 10^12 documents the distinct-form table is
vocabulary-bounded (millions), so this stage is tiny next to extraction.

Word-id resolution implements the reference's two-phase exact/fuzzy plan
(/root/reference/src/REEL/candidates.py:35-75 and
/root/reference/src/utils/utils.py:321-327): exact dict hit first, and
only OOV tokens pay the fuzzy scan — with a deterministic
(score desc, word asc) tie-break and a per-worker memo cache.

Design note: the KB (vocab, WC index, weights) rides ONE broadcast into
ONE Arrow UDF.  An earlier revision expressed resolution as broadcast
equi-joins + a fallback UDF; that is semantically identical but costs
~6 extra tiny-stage jobs per run — measurable dead weight at any scale
because this stage's input is always small (see module docstring).  The
join formulation remains in ``resolve_tokens`` for tests/debugging.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nilinker_spark.fixtures.kb import KBFixture
from nilinker_spark.functions.similarity import fuzzy_best_match
from nilinker_spark.oracle import PAD_CANDS

# per-worker-process fuzzy-resolution memo, keyed by KB vocab fingerprint:
# {kb_fingerprint: {token: word_id}}.  fuzzy_best_match is a pure function
# of (token, vocab), so entries are valid for exactly one vocab — scoping
# by fingerprint keeps two pipelines with different KBs in one long-lived
# worker from poisoning each other.
_FUZZY_CACHE: dict[str, dict[str, int]] = {}

# prefuzz_map collects the resolved OOV-token map to the driver for
# broadcast; above this many distinct OOV tokens (~100 MB of (token, id)
# rows) it declines and callers fall back to the per-worker memo — the
# same bounded-collect discipline as BROADCAST_MAX_FORMS.  10^6 tokens
# covers vocabularies far beyond any real gazetteer's OOV surface.
PREFUZZ_MAX_TOKENS = 1_000_000


def _tokens_lr(df: DataFrame) -> DataFrame:
    """tl/tr columns per the [t, t] duplication rule (utils.py:362-377)."""
    toks = F.split(F.col("norm"), " ")
    return df.withColumn("tl", F.try_element_at(toks, F.lit(1))).withColumn(
        "tr", F.coalesce(F.try_element_at(toks, F.lit(2)), F.try_element_at(toks, F.lit(1)))
    )


def resolve_tokens(spark: SparkSession, forms: DataFrame, kb: KBFixture) -> DataFrame:
    """distinct (token) -> (token, word, word_id): exact broadcast join,
    fuzzy Arrow-UDF fallback for the anti-join survivors.

    Kept as the relational reference formulation (oracle-checkable); the
    production path resolves inside :func:`phrase_vectors_df`'s UDF.
    """
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

    @F.pandas_udf("word string, word_id int")
    def fuzzy_resolve(s: pd.Series) -> pd.DataFrame:
        vocab = vocab_b.value
        w2i = w2i_b.value
        words = s.map(lambda tok: fuzzy_best_match(tok, vocab))
        return pd.DataFrame({"word": words, "word_id": words.map(w2i).astype("int32")})

    fuzzy = oov.withColumn("r", fuzzy_resolve("token")).select(
        "token", F.col("r.word").alias("word"), F.col("r.word_id").alias("word_id")
    )
    return exact.unionByName(fuzzy)


def prefuzz_map(spark: SparkSession, forms: DataFrame, kb: KBFixture) -> dict[str, int]:
    """Resolve every distinct OOV token of ``forms`` to its fuzzy word id
    EXACTLY ONCE across the cluster; returns {token: word_id}.

    The per-worker memo in :func:`phrase_vectors_df` de-duplicates fuzzy
    work within one worker but not ACROSS workers: a token appearing in
    many forms is re-resolved by every worker that sees one of them, so
    the fuzzy wall is ~(all distinct tokens × ratio scan) PER WORKER —
    measured flat from 2 to 8 cores at a 10^5-form vocabulary (the
    dominant pvs cost; fuzzy is ~3 ms/token of pure Python).  Here the
    distinct OOV token table (vocabulary-bounded, ≤ 2 tokens/form) is
    resolved by ONE distributed pandas-UDF pass — each token exactly
    once — and the resulting map broadcasts like the KB itself.  Results
    are identical by determinism of fuzzy_best_match (forced-path parity
    tests cover it)."""
    vocab_rows = [(w,) for w in kb.word2id]
    vocab_df = spark.createDataFrame(vocab_rows, "word string")
    oov = (
        _tokens_lr(forms)
        .select(F.explode(F.array("tl", "tr")).alias("token"))
        .distinct()
        .join(F.broadcast(vocab_df), F.col("token") == F.col("word"), "left_anti")
    )
    vocab_b = spark.sparkContext.broadcast(sorted(kb.word2id))
    w2i_b = spark.sparkContext.broadcast(dict(kb.word2id))
    fp = kb.fingerprint

    def run(batches):
        vocab = vocab_b.value
        w2i = w2i_b.value
        memo = _FUZZY_CACHE.setdefault(fp, {})
        for pdf in batches:
            ids = []
            for tok in pdf["token"]:
                hit = memo.get(tok)
                if hit is None:
                    hit = w2i[fuzzy_best_match(tok, vocab)]
                    memo[tok] = hit
                ids.append(hit)
            pdf = pdf.assign(word_id=pd.array(ids, dtype="int64"))
            yield pdf

    resolved = oov.mapInPandas(run, "token string, word_id long")
    # bounded collect: never materialize an unbounded token map on the
    # driver — past the cap return empty and let the per-worker memo
    # carry the fuzzy work (correct either way, parity-tested).  Arrow
    # toPandas, not java-row collect: this sits on the middle's
    # scale-invariant floor (VERDICT r4 #4)
    pdf = resolved.limit(PREFUZZ_MAX_TOKENS + 1).toPandas()
    if len(pdf) > PREFUZZ_MAX_TOKENS:
        return {}
    return dict(zip(pdf["token"].values, (int(w) for w in pdf["word_id"].values)))


def phrase_vectors_df(
    spark: SparkSession,
    forms: DataFrame,
    kb: KBFixture,
    fuzzy_map: dict[str, int] | None = None,
) -> DataFrame:
    """distinct (norm) -> (norm, pv array<float>) in ONE Arrow UDF pass.

    Inside the UDF (per Arrow batch, all vectorized):
    1. tokenize to (tl, tr) with the [t, t] rule (utils.py:362-377),
    2. resolve word ids: exact dict hit, else the pre-resolved
       ``fuzzy_map`` (see :func:`prefuzz_map`) or the deterministic fuzzy
       fallback (memoized per worker) — ≙ get_words_ids_4_entity,
       utils.py:380-463,
    3. gather WC candidate blocks (utils.py:265-331),
    4. batched attention forward pass
       (≙ /root/reference/src/NILINKER/nilinker.py:80-153, vectorized
       instead of the reference's batch-size-1 eager loop at :196).

    The KB dicts + weight matrices ride one sc.broadcast; the UDF touches
    no Spark state, so the same numpy path runs in the oracle.
    """
    fuzzy_b = spark.sparkContext.broadcast(fuzzy_map or {})
    kb_b = spark.sparkContext.broadcast(
        {
            "vocab_sorted": sorted(kb.word2id),
            "word2id": dict(kb.word2id),
            "wc_by_id": {kb.word2id[w]: cands[:PAD_CANDS] for w, cands in kb.wc.items()},
            "weights": kb.weights.to_npz_dict(),
            "fingerprint": kb.fingerprint,
        }
    )

    def run(batches):
        from nilinker_spark.functions.model import ModelWeights, phrase_vectors
        from nilinker_spark.functions.normalize import tokenize_entity

        kbv = kb_b.value
        w2i = kbv["word2id"]
        vocab = kbv["vocab_sorted"]
        wc = kbv["wc_by_id"]
        z = kbv["weights"]
        w = ModelWeights(z["W_a"], z["b_a"], z["W_c"], z["b_c"], z["word_embeds"], z["cand_embeds"])

        memo = _FUZZY_CACHE.setdefault(kbv["fingerprint"], {})
        pre = fuzzy_b.value

        def wid(tok: str) -> int:
            hit = w2i.get(tok)
            if hit is not None:
                return hit
            hit = pre.get(tok)
            if hit is not None:
                return hit
            hit = memo.get(tok)
            if hit is None:
                hit = w2i[fuzzy_best_match(tok, vocab)]
                memo[tok] = hit
            return hit

        for pdf in batches:
            norms = pdf["norm"]
            n = len(norms)
            wl_ids = np.empty(n, dtype=np.int64)
            wr_ids = np.empty(n, dtype=np.int64)
            cl = np.full((n, PAD_CANDS), -1, dtype=np.int64)
            cr = np.full((n, PAD_CANDS), -1, dtype=np.int64)
            for i, nf in enumerate(norms):
                tl, tr = tokenize_entity(nf)
                wl_ids[i] = wid(tl)
                wr_ids[i] = wid(tr)
                a = wc.get(int(wl_ids[i]), [])
                b = wc.get(int(wr_ids[i]), [])
                cl[i, : len(a)] = a
                cr[i, : len(b)] = b
            pv = phrase_vectors(wl_ids, wr_ids, cl, cr, w)
            yield pd.DataFrame({"norm": norms, "pv": list(pv)})

    schema = T.StructType(
        [
            T.StructField("norm", T.StringType()),
            T.StructField("pv", T.ArrayType(T.FloatType())),
        ]
    )
    return forms.select("norm").mapInPandas(run, schema)


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
