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
