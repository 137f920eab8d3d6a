"""Resume semantics: kill after stage k, relaunch, identical output,
no duplicated lineage (SURVEY.md §5 'Resume test'; north-rule gate)."""

from __future__ import annotations

import pytest

from nilinker_spark.pipeline import STAGES, Pipeline


@pytest.mark.parametrize("kill_after", ["mentions", "scored", "clusters"])
def test_resume_after_kill(spark, kb, webtext_df, tmp_path_factory, kill_after):
    ckpt = str(tmp_path_factory.mktemp(f"ckpt_resume_{kill_after}"))

    # reference run (fresh dir, straight through)
    ref_ckpt = str(tmp_path_factory.mktemp(f"ckpt_ref_{kill_after}"))
    ref = Pipeline(spark, kb, ref_ckpt).run(webtext_df).toPandas()

    # killed run + relaunch
    pipe = Pipeline(spark, kb, ckpt)
    assert pipe.run(webtext_df, stop_after=kill_after) is None
    resumed = Pipeline(spark, kb, ckpt).run(webtext_df).toPandas()

    key = ["url", "mention_id"]
    a = ref.sort_values(key).reset_index(drop=True)
    b = resumed.sort_values(key).reset_index(drop=True)
    assert a.equals(b), "resumed output differs from straight-through run"

    # exactly one lineage row per completed stage — nothing recomputed
    lin = Pipeline(spark, kb, ckpt).lineage().toPandas()
    per_stage = lin.groupby("stage").size()
    assert (per_stage == 1).all(), per_stage.to_dict()
    assert set(per_stage.index) >= set(STAGES)


def test_rerun_is_noop(spark, kb, webtext_df, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_noop"))
    pipe = Pipeline(spark, kb, ckpt)
    first = pipe.run(webtext_df).toPandas()
    n_lineage = pipe.lineage().count()
    second = pipe.run(webtext_df).toPandas()
    assert pipe.lineage().count() == n_lineage, "rerun appended lineage rows"
    key = ["url", "mention_id"]
    assert first.sort_values(key).reset_index(drop=True).equals(
        second.sort_values(key).reset_index(drop=True)
    )


def test_incremental_append_scores_only_new_forms(spark, kb, webtext_rows, tmp_path_factory):
    """Cross-run incremental resume (≙ the reference's kb_cache,
    REEL/pre_process.py:250-307): append docs, rerun — phrase_vecs grows
    by exactly the never-seen forms, and the final clusters are identical
    to a from-scratch run over the full corpus."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    rows1, rows2 = webtext_rows[: len(webtext_rows) // 2], webtext_rows[len(webtext_rows) // 2 :]
    df1 = spark.createDataFrame(rows1, schema)
    df2 = spark.createDataFrame(rows2, schema)
    df_full = spark.createDataFrame(webtext_rows, schema)

    ck_inc = str(tmp_path_factory.mktemp("ck_inc"))
    pipe = Pipeline(spark, kb, ck_inc)
    pipe.run(df1).count()
    pv_before = spark.read.parquet(f"{ck_inc}/phrase_vecs")
    forms_before = {r["norm"] for r in pv_before.select("norm").collect()}

    inc = pipe.run_incremental(df2).toPandas()

    pv_after = spark.read.parquet(f"{ck_inc}/phrase_vecs")
    forms_after = {r["norm"] for r in pv_after.select("norm").collect()}
    # appended rows == truly-new forms (recomputing old forms would
    # duplicate them in the appended table)
    assert pv_after.count() == len(forms_after)
    assert forms_before <= forms_after

    ck_scr = str(tmp_path_factory.mktemp("ck_scr"))
    scratch = Pipeline(spark, kb, ck_scr).run(df_full).toPandas()

    assert len(inc) == len(scratch)
    key = ["url", "mention_id", "pos"]
    a = inc.sort_values(key).reset_index(drop=True)
    b = scratch.sort_values(key).reset_index(drop=True)
    assert (a["cluster_id"].values == b["cluster_id"].values).all()
    assert (a["norm"].values == b["norm"].values).all()
    # the incremental run really saw new forms (the test is non-vacuous)
    assert len(forms_after) > len(forms_before)


def test_incremental_retry_after_midcall_crash(spark, kb, webtext_rows, tmp_path_factory):
    """A crash between the mentions append and the phrase_vecs append,
    followed by a re-run of the SAME batch, must not duplicate rows: the
    WAL intent marker rolls the partial append back, and the final output
    equals a from-scratch run (ADVICE r2: run_incremental retry safety)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    half = len(webtext_rows) // 2
    df1 = spark.createDataFrame(webtext_rows[:half], schema)
    df2 = spark.createDataFrame(webtext_rows[half:], schema)
    df_full = spark.createDataFrame(webtext_rows, schema)

    ck = str(tmp_path_factory.mktemp("ck_inc_retry"))
    pipe = Pipeline(spark, kb, ck)
    pipe.run(df1).count()
    mentions_rows_before = spark.read.parquet(f"{ck}/mentions").count()

    # crash exactly after the first append (mentions), before phrase_vecs
    real_append = Pipeline._checkpoint_append
    calls = {"n": 0}

    def crashing(self, stage, df):
        real_append(self, stage, df)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated mid-call crash")

    Pipeline._checkpoint_append = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            pipe.run_incremental(df2)
    finally:
        Pipeline._checkpoint_append = real_append

    # partial append happened (the crash was after a real write)
    assert spark.read.parquet(f"{ck}/mentions").count() > mentions_rows_before

    # retry the same batch: WAL rollback + clean re-apply
    inc = pipe.run_incremental(df2).toPandas()

    ck_scr = str(tmp_path_factory.mktemp("ck_inc_retry_scratch"))
    scratch = Pipeline(spark, kb, ck_scr).run(df_full).toPandas()
    assert len(inc) == len(scratch)
    key = ["url", "mention_id", "pos"]
    a = inc.sort_values(key).reset_index(drop=True)
    b = scratch.sort_values(key).reset_index(drop=True)
    assert (a["cluster_id"].values == b["cluster_id"].values).all()
    # no duplicated mention rows in the appended table
    m = spark.read.parquet(f"{ck}/mentions")
    assert m.count() == m.dropDuplicates(["url", "mention_id"]).count() == len(scratch)

    # re-running a COMMITTED batch is an idempotent no-op
    again = pipe.run_incremental(df2).toPandas()
    assert len(again) == len(inc)
    assert m.count() == spark.read.parquet(f"{ck}/mentions").count()


def test_compact_preserves_content_and_resume(spark, kb, webtext_rows, tmp_path_factory):
    """compact(): many part files -> few, identical rows + checksum, table
    still counts as done (resume no-op) and a lineage audit row lands."""
    import os

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    half = len(webtext_rows) // 2
    df1 = spark.createDataFrame(webtext_rows[:half], schema)
    df2 = spark.createDataFrame(webtext_rows[half:], schema)

    ck = str(tmp_path_factory.mktemp("ck_compact"))
    pipe = Pipeline(spark, kb, ck)
    pipe.run(df1).count()
    pipe.run_incremental(df2).count()  # appends a second part-file set

    src = os.path.join(ck, "mentions")
    files_before = [f for f in os.listdir(src) if f.startswith("part-")]
    before = pipe._load("mentions").toPandas().sort_values(["url", "mention_id"])

    n_after = pipe.compact("mentions")
    files_after = [f for f in os.listdir(src) if f.startswith("part-")]
    assert len(files_after) < len(files_before)
    assert n_after == len(files_after) == 1  # tiny table -> one file

    after = pipe._load("mentions").toPandas().sort_values(["url", "mention_id"])
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))
    assert pipe._done("mentions")
    lin = pipe.lineage().toPandas()
    assert (lin["stage"] == "compact:mentions").sum() == 1
    # no leftover working directories
    assert not os.path.exists(src + "__compacting")
    assert not os.path.exists(src + "__precompact")


def test_compact_recovers_midswap_crash(spark, kb, webtext_df, tmp_path_factory):
    """A crash BETWEEN compact()'s two directory renames leaves the
    original table only in <stage>__precompact; the next compact() must
    roll it back, never delete it (data-destroying failure mode)."""
    import os
    import shutil

    ck = str(tmp_path_factory.mktemp("ck_compact_crash"))
    pipe = Pipeline(spark, kb, ck)
    pipe.run(webtext_df).count()
    src = os.path.join(ck, "mentions")
    before = pipe._load("mentions").toPandas().sort_values(["url", "mention_id"])

    # simulate the mid-swap crash state: src renamed away, tmp half-done
    os.replace(src, src + "__precompact")
    os.makedirs(src + "__compacting")
    with open(os.path.join(src + "__compacting", "junk"), "w") as fh:
        fh.write("partial")

    n_files = pipe.compact("mentions")
    assert n_files >= 1
    after = pipe._load("mentions").toPandas().sort_values(["url", "mention_id"])
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))
    assert not os.path.exists(src + "__precompact")
    assert not os.path.exists(src + "__compacting")
    shutil.rmtree(ck)


def test_incremental_crash_then_different_batch(spark, kb, webtext_rows, tmp_path_factory):
    """ADVICE r3 (medium): batch A crashes mid-call (after the mentions
    append, before phrase_vecs); the NEXT call is a DIFFERENT batch B.
    B's entry scan must roll A's partial append back — otherwise A's
    mention rows are baked in while their forms never reach phrase_vecs,
    and the inner join silently drops those mentions.  Afterwards
    re-applying A converges to the full-corpus scratch run."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    third = len(webtext_rows) // 3
    rows_base = webtext_rows[:third]
    rows_a = webtext_rows[third : 2 * third]
    rows_b = webtext_rows[2 * third :]
    df_base = spark.createDataFrame(rows_base, schema)
    df_a = spark.createDataFrame(rows_a, schema)
    df_b = spark.createDataFrame(rows_b, schema)

    ck = str(tmp_path_factory.mktemp("ck_inc_cross"))
    pipe = Pipeline(spark, kb, ck)
    pipe.run(df_base).count()

    real_append = Pipeline._checkpoint_append
    calls = {"n": 0}

    def crashing(self, stage, df):
        real_append(self, stage, df)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated mid-call crash")

    Pipeline._checkpoint_append = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            pipe.run_incremental(df_a)
    finally:
        Pipeline._checkpoint_append = real_append

    # batch B (different batch id) must first roll A's partial append back
    inc_b = pipe.run_incremental(df_b).toPandas()
    ck_scr = str(tmp_path_factory.mktemp("ck_scr_base_b"))
    scratch_b = (
        Pipeline(spark, kb, ck_scr)
        .run(spark.createDataFrame(rows_base + rows_b, schema))
        .toPandas()
    )
    key = ["url", "mention_id", "pos"]
    a = inc_b.sort_values(key).reset_index(drop=True)
    b = scratch_b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b), "batch A's partial append leaked into batch B"
    assert (a["cluster_id"].values == b["cluster_id"].values).all()
    # A's urls are fully gone from the mentions table
    a_urls = {r[0] for r in rows_a}
    m_urls = {
        r["url"]
        for r in spark.read.parquet(f"{ck}/mentions").select("url").distinct().collect()
    }
    assert not (a_urls & m_urls), "rolled-back batch left mention rows behind"

    # re-applying A afterwards converges to the full-corpus scratch run
    inc_a = pipe.run_incremental(df_a).toPandas()
    ck_all = str(tmp_path_factory.mktemp("ck_scr_all"))
    scratch_all = (
        Pipeline(spark, kb, ck_all)
        .run(spark.createDataFrame(list(webtext_rows), schema))
        .toPandas()
    )
    x = inc_a.sort_values(key).reset_index(drop=True)
    y = scratch_all.sort_values(key).reset_index(drop=True)
    assert len(x) == len(y)
    assert (x["cluster_id"].values == y["cluster_id"].values).all()


def test_wal_tail_stage_recovery(spark, kb, webtext_rows, tmp_path_factory):
    """ADVICE r4 (medium): a crash AFTER the final `resolved` overwrite but
    BEFORE the commit marker leaves the tail tables holding batch content
    while recovery rolls the mention/phrase_vecs appends back.  The intent's
    __tail__ list must invalidate those stages' _SUCCESS markers so a later
    run() RECOMPUTES the tail from the recovered append tables instead of
    serving resolved rows whose mentions no longer exist."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    half = len(webtext_rows) // 2
    rows_base, rows_a = webtext_rows[:half], webtext_rows[half:]
    df_base = spark.createDataFrame(rows_base, schema)
    df_a = spark.createDataFrame(rows_a, schema)

    ck = str(tmp_path_factory.mktemp("ck_wal_tail"))
    pipe = Pipeline(spark, kb, ck)
    base = pipe.run(df_base).toPandas()  # materialize BEFORE the overwrite

    # crash after the resolved overwrite, before the commit marker
    real_ckpt = Pipeline._checkpoint

    def crashing(self, stage, df):
        out = real_ckpt(self, stage, df)
        if stage == "resolved":
            raise RuntimeError("simulated post-tail crash")
        return out

    Pipeline._checkpoint = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            pipe.run_incremental(df_a)
    finally:
        Pipeline._checkpoint = real_ckpt

    # non-vacuous: the stale resolved table really contains batch urls
    a_urls = {r[0] for r in rows_a}
    stale_urls = {
        r["url"]
        for r in spark.read.parquet(f"{ck}/resolved").select("url").distinct().collect()
    }
    assert a_urls & stale_urls, "crash did not land after the tail rewrite"

    # a fresh process calling run() must not serve the stale tail
    pipe2 = Pipeline(spark, kb, ck)
    out = pipe2.run(df_base).toPandas()
    assert not (a_urls & set(out["url"])), "stale resolved served after rollback"
    key = ["url", "mention_id", "pos"]
    x = out.sort_values(key).reset_index(drop=True)
    y = base.sort_values(key).reset_index(drop=True)
    assert len(x) == len(y)
    assert (x["cluster_id"].values == y["cluster_id"].values).all()

    # re-applying the batch afterwards converges to the full-corpus run
    inc = pipe2.run_incremental(df_a).toPandas()
    ck_scr = str(tmp_path_factory.mktemp("ck_wal_tail_scratch"))
    scratch = (
        Pipeline(spark, kb, ck_scr)
        .run(spark.createDataFrame(list(webtext_rows), schema))
        .toPandas()
    )
    a = inc.sort_values(key).reset_index(drop=True)
    b = scratch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["cluster_id"].values == b["cluster_id"].values).all()
