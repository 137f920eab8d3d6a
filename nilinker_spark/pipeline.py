"""End-to-end resolution pipeline with checkpointed stages + lineage.

Stage graph (SURVEY.md §7.1):

    webtext --S1--> mentions --S2--> forms+pv / blocks --S3--> pairs
            --S4--> scored --S5--> edges --S6--> clusters --S7--> resolved

Every stage writes ``<ckpt_dir>/<stage>`` (parquet — the sandbox stand-in
for an Iceberg table) and appends one row to ``<ckpt_dir>/lineage_log``
(stage, rows, checksum, wall_ms).  A relaunch skips any stage whose
checkpoint has a parquet _SUCCESS marker *and* a lineage row — the
scaled-up version of the reference's read-modify-write candidate cache
(/root/reference/src/REEL/pre_process.py:250-307) and the substrate of
the north rule's mid-pipeline resume.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilinker_spark.fixtures.kb import KBFixture
from nilinker_spark.functions.normalize import norm_form
from nilinker_spark.operators.blocking import block_keys_df, phrase_vectors_df
from nilinker_spark.operators.clustering import assign_clusters, connected_components
from nilinker_spark.operators.extract import extract_mentions_df
from nilinker_spark.operators.pairs import candidate_pairs
from nilinker_spark.operators.scoring import score_pairs, similarity_edges
from nilinker_spark.oracle import ALPHA, MAX_BLOCK_FORMS, TAU
from nilinker_spark.snapshots import SnapshotLog

STAGES = ["mentions", "phrase_vecs", "pairs", "scored", "edges", "clusters", "resolved"]

# Adaptive small-vocabulary execution for resolve()'s middle section
# (S2-S6: phrase vectors -> pairs -> scoring -> CC -> clusters).  Those
# stages are vocabulary-bounded; below this form count they are pure
# scheduler latency as distributed jobs (~3.6 s at 2 cores, measured) and
# run instead on the driver through the SAME shared pure functions the
# oracle uses (functions/model + functions/similarity + oracle blocking/
# salting) — results identical by construction and by forced-path parity
# test.  Above the threshold (real corpora: 10^6-10^7 forms at 100 TB)
# the distributed path runs unchanged.  Same decision rule as a
# broadcast-join threshold: execute the provably-tiny side locally.
DRIVER_VOCAB_MAX = int(os.environ.get("NILINKER_DRIVER_VOCAB_MAX", "2000"))


def resolve(
    spark: SparkSession,
    webtext: DataFrame,
    kb: KBFixture,
    gazetteer: set[str] | None = None,
    alpha: float = ALPHA,
    tau: float = TAU,
    max_block: int = MAX_BLOCK_FORMS,
    metrics_out: dict | None = None,
    cache_out: list | None = None,
    stage_walls_out: dict | None = None,
    stage_hook=None,
) -> DataFrame:
    """Checkpoint-free functional composition of S1-S7 (entry/bench path).

    ``stage_walls_out``: pass a dict to receive wall-clock seconds of the
    sections this function ALREADY materializes eagerly — "extract_s"
    (S1 scan + distinct-forms count) and "middle_s" (S2-S6: phrase
    vectors → pairs → scoring → CC → cluster table; both localCheckpoints
    are eager on the distributed path).  Pure timestamps around existing
    actions — the plan and its laziness are unchanged — so the bench can
    report the vocabulary middle's own throughput, plus "n_forms" and
    "middle_path" ("driver" or "distributed").  On the distributed path
    the middle's scale-invariant FLOOR is broken out too: "prefuzz_s"
    (the one-shot OOV resolution job) and "cc_driver_s" /"cc_collect_s"
    (see connected_components.walls_out) — the bench subtracts
    prefuzz_s + cc_driver_s to report the middle's compute-only scaling
    (VERDICT r4 #3).

    ``stage_hook``: optional callable invoked driver-side with
    ``"extract_done"`` after the extraction/forms materialization and
    before the middle timer starts — the bench's paired-concurrent rounds
    use it as a second barrier so both levels' MIDDLE sections overlap
    (host noise then cancels in the middle-wall ratio).  Time spent
    inside the hook is excluded from every stage wall.

    Same operators as :class:`Pipeline`, no materialization between
    stages — Catalyst sees the whole plan and AQE sizes the shuffles.

    ``metrics_out``: pass a dict to receive the no-silent-truncation
    metrics frames ({"mention_metrics", "block_salt_metrics"}, lazy) —
    the functional twin of the checkpointed Pipeline's metrics tables.

    ``cache_out``: the mentions frame stays ``.persist()``-ed when this
    returns (the returned plan still reads it; unpersisting earlier would
    recompute the corpus scan on the caller's first action).  Pass a list
    to receive that frame and own its lifetime — ``.unpersist()`` each
    entry once done with the result (bench does).  Without a handle,
    callers that loop resolve() in one session must
    ``spark.catalog.clearCache()`` between runs or the block manager
    accumulates a cached mentions copy per call.

    CONCURRENCY: the vocabulary-sized middle section temporarily rewrites
    two session confs (``spark.sql.shuffle.partitions``, AQE) and restores
    them before returning.  Any query COMPILED concurrently on the same
    SparkSession during that window would pick the overridden values —
    resolve() is single-flight per session by contract (the serial bench/
    oracle/entry callers all are).  Concurrent callers should compile
    their plans on their own SparkSession.
    """
    if gazetteer is None:
        gazetteer = {norm_form(s) for s, _, _ in kb.surface_forms}
    # corpus-level stages run at full parallelism; mentions materializes
    # once (columnar compressed cache — NOT localCheckpoint, whose
    # deserialized java rows cost ~2x the extraction itself at 10^7 rows)
    # and serves both the distinct and the final join.
    # NOTE: extract_mentions_relational (zero Python stages) exists and is
    # parity-tested, but measured SLOWER here: the per-position explode
    # evaluates 4 regexes + 2 string builds per token JVM-side (~200M
    # regex execs at 1M docs) vs ~60 memoized dict probes per doc in the
    # Arrow scan.  The vectorized Python path is the measured fast path.
    t0 = time.monotonic()
    mentions = extract_mentions_df(spark, webtext, gazetteer).persist()
    if cache_out is not None:
        cache_out.append(mentions)
    # lazy checkpoint + count in ONE job (the count is the materializing
    # action — same trick as connected_components._sig); an eager
    # checkpoint followed by count would schedule two jobs
    forms = mentions.select("norm").distinct().localCheckpoint(eager=False)

    # the distinct-form table is vocabulary-bounded (tiny vs the corpus, even
    # at 10^12 docs it is millions of rows): size the form-level shuffles by
    # the DATA, not the cluster, or per-task overhead dwarfs the work
    n_forms = forms.count()
    if stage_walls_out is not None:
        stage_walls_out["extract_s"] = time.monotonic() - t0
        stage_walls_out["n_forms"] = n_forms
        stage_walls_out["middle_path"] = (
            "driver" if n_forms <= DRIVER_VOCAB_MAX else "distributed"
        )
    if stage_hook is not None:
        stage_hook("extract_done")
    t1 = time.monotonic()

    if n_forms <= DRIVER_VOCAB_MAX:
        # tiny-vocabulary fast path: the whole middle on the driver (see
        # DRIVER_VOCAB_MAX).  cluster_forms is the shared-function twin the
        # e2e parity tests gate the distributed path against.
        from nilinker_spark.oracle import cluster_forms

        forms_list = [r["norm"] for r in forms.collect()]
        m_out: dict = {}
        cmap = cluster_forms(
            forms_list, kb, alpha=alpha, tau=tau, max_block=max_block, metrics_out=m_out
        )
        clusters = spark.createDataFrame(
            sorted(cmap.items()), "norm string, cluster_id string"
        )
        if stage_walls_out is not None:
            stage_walls_out["middle_s"] = time.monotonic() - t1
        if metrics_out is not None:
            from nilinker_spark.operators.skew import salted_count

            metrics_out["mention_metrics"] = salted_count(mentions, "norm")
            metrics_out["block_salt_metrics"] = spark.createDataFrame(
                m_out["block_salt_rows"], "block_key string, members bigint, n_salts int"
            )
        return mentions.join(F.broadcast(clusters), "norm").select(
            "url", "mention_id", "surface", "pos", "norm", "cluster_id"
        )

    # size the form-level shuffles by the DATA with a COMPUTE-aware floor:
    # ~2k forms per partition.  The old 50k-per-partition rule treated the
    # middle as shuffle-bound, but its rows are compute-heavy (attention
    # math, fuzzy resolution, pair scoring) — at 20k forms it serialized
    # the whole S3-S6 into ONE task and the middle stopped scaling
    # entirely (measured 2->8 efficiency 0.27; ~0.9 after this change).
    # At 10^6+ forms the cap is the session's shuffle.partitions, i.e.
    # cluster-sized, exactly as before.
    form_parts = max(1, min(int(spark.conf.get("spark.sql.shuffle.partitions")), n_forms // 2_000 + 1))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # AQE re-plans every shuffle stage; on the vocabulary-sized form stages
    # (often 1 partition) that re-planning is pure per-stage latency with
    # nothing to adapt — turn it off for this section only.  The corpus-level
    # stages (extraction, final join) keep AQE for skew/coalescing.
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(form_parts))
    if n_forms < 1_000_000:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # resolve distinct OOV tokens once across the cluster (the
        # per-worker fuzzy memo cannot de-duplicate ACROSS workers; at
        # 10^5 forms the duplicated fuzzy scans made pvs wall flat from
        # 2 to 8 cores — see blocking.prefuzz_map)
        from nilinker_spark.operators.blocking import prefuzz_map

        t_pf = time.monotonic()
        fmap = prefuzz_map(spark, forms, kb)
        # the middle's scale-invariant FLOOR, broken out for the bench
        # artifact (VERDICT r4 #3/#4): prefuzz job latency + the CC
        # driver-path probe/union-find below — fixed cost at any core
        # count, subtracted to report the middle's compute-only scaling
        if stage_walls_out is not None:
            stage_walls_out["prefuzz_s"] = time.monotonic() - t_pf
        pvs = phrase_vectors_df(spark, forms, kb, fuzzy_map=fmap).localCheckpoint(eager=True)
        blocked = block_keys_df(pvs.select("norm"))
        pairs, salt_metrics = candidate_pairs(blocked, max_block)
        # fused S4+S5 with the exact embedding-score prefilter: only the
        # plausible pair fraction pays string features / the Arrow JW
        # crossing; edges are bit-identical to the unfused path (see
        # fused_similarity_edges).  Lazy checkpoint so connected_
        # components' driver-size probe and the star-contraction loop
        # share ONE materialization of the scoring subtree (the probe's
        # count() is the first computation and every partition lands in
        # the cache).  Without this, an above-threshold edge table pays
        # the pairs->scoring chain twice (VERDICT r3 #1).
        from nilinker_spark.operators.scoring import fused_similarity_edges

        edges = fused_similarity_edges(
            pairs, pvs, alpha, tau, n_forms=n_forms
        ).localCheckpoint(eager=False)
        labels = connected_components(edges, walls_out=stage_walls_out)
        clusters = assign_clusters(pvs.select("norm"), labels, n_forms=n_forms).localCheckpoint(
            eager=True
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    if stage_walls_out is not None:
        stage_walls_out["middle_s"] = time.monotonic() - t1
    if metrics_out is not None:
        from nilinker_spark.operators.skew import salted_count

        metrics_out["mention_metrics"] = salted_count(mentions, "norm")
        metrics_out["block_salt_metrics"] = salt_metrics
    from nilinker_spark.operators.scoring import _maybe_broadcast

    return mentions.join(_maybe_broadcast(clusters, n_forms), "norm").select(
        "url", "mention_id", "surface", "pos", "norm", "cluster_id"
    )


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        kb: KBFixture,
        ckpt_dir: str,
        alpha: float = ALPHA,
        tau: float = TAU,
        max_block: int = MAX_BLOCK_FORMS,
        gazetteer: set[str] | None = None,
    ) -> None:
        self.spark = spark
        self.kb = kb
        self.ckpt_dir = ckpt_dir
        self.alpha = alpha
        self.tau = tau
        self.max_block = max_block
        # explicit extraction gazetteer (same contract as resolve()'s
        # keyword arg); None derives it from the KB surface forms
        self.gazetteer = gazetteer

    def _gazetteer(self) -> set[str]:
        if self.gazetteer is not None:
            return self.gazetteer
        return {norm_form(s) for s, _, _ in self.kb.surface_forms}

    # --- checkpoint + lineage plumbing -------------------------------------
    def _path(self, stage: str) -> str:
        return os.path.join(self.ckpt_dir, stage)

    def _done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS")) and (
            self._lineage_rows(stage) > 0
        )

    def _lineage_rows(self, stage: str) -> int:
        lpath = os.path.join(self.ckpt_dir, "lineage_log")
        if not os.path.exists(lpath):
            return 0
        lin = self.spark.read.parquet(lpath)
        return lin.filter(F.col("stage") == stage).count()

    def _checkpoint(self, stage: str, df: DataFrame) -> DataFrame:
        """Write stage output + one lineage row; return the re-read frame
        (re-reading truncates lineage like an Iceberg snapshot would)."""
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(self._path(stage))
        # overwrite physically replaced the part files, so prior versions
        # of this stage are expired history (snapshots.py module docs)
        SnapshotLog(self._path(stage)).commit("overwrite")
        out = self.spark.read.parquet(self._path(stage))
        stats = out.agg(
            F.count("*").alias("rows"),
            F.coalesce(F.bit_xor(F.xxhash64(*out.columns)), F.lit(0)).alias("checksum"),
        ).collect()[0]
        lineage_row = [
            (stage, int(stats["rows"]), int(stats["checksum"]), int((time.monotonic() - t0) * 1000))
        ]
        self.spark.createDataFrame(
            lineage_row, "stage string, rows long, checksum long, wall_ms long"
        ).write.mode("append").parquet(os.path.join(self.ckpt_dir, "lineage_log"))
        return out

    def _checkpoint_append(self, stage: str, df: DataFrame) -> None:
        """Parquet-APPEND an increment to a stage table + one lineage row
        recording the post-append stats (the lineage log is an append-only
        audit; _done() only needs >= 1 row)."""
        t0 = time.monotonic()
        df.write.mode("append").parquet(self._path(stage))
        # append preserves prior files: every earlier version of this
        # stage stays readable (time travel) until vacuum_stage()
        SnapshotLog(self._path(stage)).commit("append")
        out = self.spark.read.parquet(self._path(stage))
        stats = out.agg(
            F.count("*").alias("rows"),
            F.coalesce(F.bit_xor(F.xxhash64(*out.columns)), F.lit(0)).alias("checksum"),
        ).collect()[0]
        lineage_row = [
            (stage, int(stats["rows"]), int(stats["checksum"]), int((time.monotonic() - t0) * 1000))
        ]
        self.spark.createDataFrame(
            lineage_row, "stage string, rows long, checksum long, wall_ms long"
        ).write.mode("append").parquet(os.path.join(self.ckpt_dir, "lineage_log"))

    def _load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def _recover_wal(self) -> None:
        """Roll back ANY uncommitted incremental batch (ADVICE r3, medium).

        An intent marker without its commit means that batch's appends may
        be partial.  The r2 WAL only recovered when the SAME batch was
        retried; if the next call is a different batch (or run()/compact()),
        the partial append would be silently baked in — e.g. mention rows
        whose forms never reached phrase_vecs, which the resolved join then
        drops.  So every entry point scans the WAL first: for each orphan
        intent, delete every part file not in its pre-append snapshot and
        drop the intent — restoring the exact pre-batch table state.

        Overwrite-mode TAIL stages (pairs…resolved) the crashed batch may
        have rewritten are invalidated too (ADVICE r4, medium): the intent
        carries a ``__tail__`` list and recovery strips those stages'
        ``_SUCCESS`` markers, so a subsequent run() can never serve a
        `resolved` (or any tail table) containing batch content whose
        mention/phrase_vecs appends were just rolled back — _done() turns
        false and the tail recomputes from the recovered append tables.
        (Lineage rows from the crashed attempt remain: append-only audit.)
        """
        import json

        wal_dir = os.path.join(self.ckpt_dir, "incremental_wal")
        if not os.path.isdir(wal_dir):
            return
        for name in sorted(os.listdir(wal_dir)):
            if not name.endswith(".intent.json"):
                continue
            batch_id = name[: -len(".intent.json")]
            if os.path.exists(os.path.join(wal_dir, f"{batch_id}.commit")):
                continue
            with open(os.path.join(wal_dir, name)) as fh:
                snap = json.load(fh)
            for stage, keep_names in snap.items():
                if stage == "__tail__":
                    # overwrite-mode stages the batch may have rewritten:
                    # drop their _SUCCESS so _done() forces a recompute
                    for tail_stage in keep_names:
                        marker = os.path.join(self._path(tail_stage), "_SUCCESS")
                        if os.path.exists(marker):
                            os.remove(marker)
                    continue
                keep = set(keep_names)
                d = self._path(stage)
                if not os.path.isdir(d):
                    continue
                removed = False
                for fn in os.listdir(d):
                    p = os.path.join(d, fn)
                    if fn not in keep and os.path.isfile(p):
                        os.remove(p)
                        removed = True
                # the crashed batch may have PUBLISHED append snapshots
                # whose files were just deleted; publish the recovered
                # listing so the latest version is the pre-batch state
                # again (the batch's versions stay as expired history)
                log = SnapshotLog(d)
                if removed and log.latest_version() is not None:
                    log.commit("rollback")
            os.remove(os.path.join(wal_dir, name))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.ckpt_dir, "lineage_log"))

    # --- snapshot surface (time travel / history / storage reclaim) --------
    def read_stage(self, stage: str, version: int | None = None) -> DataFrame:
        """Snapshot-isolated read of a stage table.

        ``version=None`` reads the LATEST COMMITTED version — unlike
        :meth:`_load`, a concurrent append can never tear the read.  An
        explicit ``version`` time-travels an append table (``mentions``,
        ``phrase_vecs``) to any state before later appends; versions an
        overwrite/compact replaced raise ``SnapshotExpired``
        (snapshots.py module docs)."""
        return SnapshotLog(self._path(stage)).read(self.spark, version)

    def stage_history(self, stage: str) -> list[dict]:
        """Committed versions of a stage table, oldest first."""
        return SnapshotLog(self._path(stage)).history()

    def read_stage_changes(
        self, stage: str, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Incremental consumption of an append stage table: exactly the
        rows ``run_incremental`` batches added after ``from_version`` —
        what a downstream index/serving updater reads per batch instead
        of rescanning the table (raises if the range is not
        append-only; snapshots.read_changes)."""
        return SnapshotLog(self._path(stage)).read_changes(
            self.spark, from_version, to_version
        )

    def vacuum_stage(self, stage: str, retain_last: int = 1) -> list[str]:
        """Reclaim data files only pre-``retain_last`` versions reference."""
        return SnapshotLog(self._path(stage)).vacuum(retain_last)

    # --- stages -------------------------------------------------------------
    def run(self, webtext: DataFrame, stop_after: str | None = None) -> DataFrame | None:
        """Run (or resume) the pipeline; returns the resolved mentions frame.

        ``stop_after`` lets the resume test kill the job mid-pipeline.
        """
        self._recover_wal()  # a crashed incremental batch must not leak in
        gazetteer = self._gazetteer()

        def stage(name: str, build) -> DataFrame:
            if self._done(name):
                return self._load(name)
            return self._checkpoint(name, build())

        mentions = stage(
            "mentions", lambda: extract_mentions_df(self.spark, webtext, gazetteer)
        )
        if stop_after == "mentions":
            return None

        # per-form mention frequencies — the pipeline's metrics table
        # (≙ the IC term counts, information_content.py:17-27), aggregated
        # with deterministic salting so the Zipf-head form never funnels
        # into a single reducer
        from nilinker_spark.operators.skew import salted_count

        stage("mention_metrics", lambda: salted_count(mentions, "norm"))

        forms = mentions.select("norm").distinct()

        def build_pvs() -> DataFrame:
            # distinct OOV tokens fuzzy-resolve once cluster-wide (same
            # rationale as resolve()'s distributed branch: the per-worker
            # memo cannot de-duplicate across workers — blocking.prefuzz_map)
            from nilinker_spark.operators.blocking import prefuzz_map

            fmap = prefuzz_map(self.spark, forms, self.kb)
            return phrase_vectors_df(self.spark, forms, self.kb, fuzzy_map=fmap)

        pvs = stage("phrase_vecs", build_pvs)
        if stop_after == "phrase_vecs":
            return None
        # parquet-metadata count — powers the conditional broadcast hints
        n_forms = pvs.count()

        def build_pairs() -> DataFrame:
            blocked = block_keys_df(pvs.select("norm"))
            pairs, salt_metrics = candidate_pairs(blocked, self.max_block)
            # guard like any stage: a crash between this write and the
            # enclosing pairs commit must not append a second metrics
            # lineage row on resume (one-lineage-row-per-stage invariant)
            if not self._done("block_salt_metrics"):
                self._checkpoint("block_salt_metrics", salt_metrics)
            return pairs

        pairs = stage("pairs", build_pairs)
        if stop_after == "pairs":
            return None

        scored = stage("scored", lambda: score_pairs(pairs, pvs, self.alpha, n_forms=n_forms))
        if stop_after == "scored":
            return None

        edges = stage("edges", lambda: similarity_edges(scored, self.tau))
        if stop_after == "edges":
            return None

        def build_clusters() -> DataFrame:
            labels = connected_components(edges)
            return assign_clusters(pvs.select("norm"), labels, n_forms=n_forms)

        clusters = stage("clusters", build_clusters)
        if stop_after == "clusters":
            return None

        from nilinker_spark.operators.scoring import _maybe_broadcast

        resolved = stage(
            "resolved",
            lambda: mentions.join(_maybe_broadcast(clusters, n_forms), "norm").select(
                "url", "mention_id", "surface", "pos", "norm", "cluster_id"
            ),
        )
        return resolved

    # --- table maintenance ---------------------------------------------------
    def compact(self, stage: str, target_rows_per_file: int = 1_000_000) -> int:
        """Rewrite a stage table's many small part files into few sized ones.

        The maintenance half of the Iceberg stand-in story: incremental
        appends (run_incremental) accrete one part-file set per batch; at
        100 TB that read-amplifies every downstream scan.  Semantics:

        - content-preserving: rows and order-free checksum must match
          before the swap, else the compaction aborts and the original
          table stays (verified, not assumed);
        - atomic-ish: the rewrite lands in ``<stage>__compacting``, then
          one ``os.replace`` of the directory names swaps it in (the
          parquet stand-in for an Iceberg snapshot commit; a crash before
          the swap leaves the original untouched, a crash between the
          two renames is recovered by the leftover-dir check below);
        - audited: one lineage row (stage = ``compact:<stage>``).

        Returns the number of part files after compaction.
        """
        self._recover_wal()  # never compact a partial append into the table
        src = self._path(stage)
        tmp = src + "__compacting"
        old = src + "__precompact"
        # recover a crashed previous compaction:
        # - leftover tmp: the rewrite never committed — drop it;
        # - leftover old WITH src present: both swaps completed, cleanup
        #   didn't — drop old;
        # - leftover old WITHOUT src: crashed BETWEEN the two renames —
        #   the original lives only in old: ROLL BACK (never delete it).
        import shutil

        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(old):
            if os.path.exists(src):
                shutil.rmtree(old)
                # the crashed compaction swapped the files in but died
                # before its snapshot commit: publish the current state
                # so the latest version is readable again (pre-compact
                # versions stay as expired history either way; the log
                # is a SIBLING dir, untouched by the directory swap)
                log = SnapshotLog(src)
                if log.latest_version() is not None:
                    log.commit("compact-recovered")
            else:
                os.replace(old, src)

        cur = self.spark.read.parquet(src)
        stats = cur.agg(
            F.count("*").alias("rows"),
            F.coalesce(F.bit_xor(F.xxhash64(*cur.columns)), F.lit(0)).alias("checksum"),
        ).collect()[0]
        n_files = max(1, int(stats["rows"]) // target_rows_per_file + 1)
        t0 = time.monotonic()
        cur.repartition(n_files).write.mode("overwrite").parquet(tmp)
        new = self.spark.read.parquet(tmp)
        new_stats = new.agg(
            F.count("*").alias("rows"),
            F.coalesce(F.bit_xor(F.xxhash64(*new.columns)), F.lit(0)).alias("checksum"),
        ).collect()[0]
        if (int(new_stats["rows"]), int(new_stats["checksum"])) != (
            int(stats["rows"]),
            int(stats["checksum"]),
        ):
            shutil.rmtree(tmp)
            raise RuntimeError(f"compaction of {stage} changed content; aborted")
        os.replace(src, old)
        os.replace(tmp, src)
        shutil.rmtree(old)
        # the old part files are gone: prior versions expire, the compact
        # commit is the new latest (the log is a sibling directory, so
        # the swap never touches it — snapshots.py module docs)
        SnapshotLog(src).commit("compact")
        lineage_row = [
            (
                f"compact:{stage}",
                int(new_stats["rows"]),
                int(new_stats["checksum"]),
                int((time.monotonic() - t0) * 1000),
            )
        ]
        self.spark.createDataFrame(
            lineage_row, "stage string, rows long, checksum long, wall_ms long"
        ).write.mode("append").parquet(os.path.join(self.ckpt_dir, "lineage_log"))
        return len(
            [f for f in os.listdir(src) if f.endswith(".parquet") or f.startswith("part-")]
        )

    # --- cross-run incremental batch resume ---------------------------------
    def run_incremental(self, new_webtext: DataFrame) -> DataFrame:
        """Append new documents to a COMPLETED run; only never-seen
        normalized forms pay the model math.

        The batch twin of the streaming first-seen dedup
        (streaming/stateful.py) and the reference's read-modify-write
        candidate cache (/root/reference/src/REEL/pre_process.py:250-307):

        - ``mentions`` grows by parquet APPEND — only the new documents
          are scanned;
        - ``phrase_vecs`` grows by APPEND of exactly the forms absent
          from the checkpointed table (left_anti) — only new forms cross
          the Arrow scoring UDF;
        - the vocabulary-sized tail (pairs → … → resolved) is recomputed
          over the full form set — corpus-free work — so the final
          clusters are IDENTICAL to a from-scratch run on the full corpus
          (new edges may legitimately re-cluster old forms; tested).

        Caller contract: ``new_webtext`` urls are disjoint from all prior
        runs (same as any append-only ingest); one incremental writer at a
        time (single-flight, like run()).

        RETRY SAFETY (write-ahead marker): the batch id is an order-free
        checksum of the batch's urls.  Before the first append, the
        pre-append part-file listing of every append-target table is
        written to ``<ckpt>/incremental_wal/<batch_id>.intent.json``; a
        commit marker lands after the final table is written.  On entry
        EVERY orphan intent (any batch's, not just this one's — see
        :meth:`_recover_wal`) is rolled back: part files not in its
        snapshot are removed and the intent dropped, restoring the
        pre-batch state before this batch snapshots the listing.  A
        re-run of a committed batch is an idempotent no-op returning the
        existing result.  (Lineage rows from a crashed attempt remain —
        the lineage log is an append-only audit, not the source of
        truth.)  This is the poor-man's Iceberg snapshot the checkpoint
        layer stands in for.
        """
        import json

        if not self._done("resolved"):
            raise RuntimeError("run() must complete before run_incremental()")
        gazetteer = self._gazetteer()

        sig = new_webtext.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("url")), F.lit(0)).alias("sig"),
        ).first()
        batch_id = f"b{int(sig['n'])}_{int(sig['sig']) & 0xFFFFFFFFFFFFFFFF:016x}"
        wal_dir = os.path.join(self.ckpt_dir, "incremental_wal")
        os.makedirs(wal_dir, exist_ok=True)
        intent_path = os.path.join(wal_dir, f"{batch_id}.intent.json")
        commit_path = os.path.join(wal_dir, f"{batch_id}.commit")
        append_tables = ("mentions", "phrase_vecs")
        if os.path.exists(commit_path):
            return self._load("resolved")
        # roll back ANY crashed batch (this one's retry included), then
        # snapshot the recovered listing as this batch's rollback point
        self._recover_wal()
        snap = {s: sorted(os.listdir(self._path(s))) for s in append_tables}
        # overwrite-mode stages this batch will rewrite (ADVICE r4): if
        # the batch dies uncommitted, recovery strips their _SUCCESS so
        # no later run() serves tail content derived from rolled-back
        # appends (see _recover_wal)
        snap["__tail__"] = [
            "mention_metrics",
            "block_salt_metrics",
            "pairs",
            "scored",
            "edges",
            "clusters",
            "resolved",
        ]
        with open(intent_path + ".tmp", "w") as fh:
            json.dump(snap, fh)
        os.replace(intent_path + ".tmp", intent_path)

        new_m = extract_mentions_df(self.spark, new_webtext, gazetteer).persist()
        self._checkpoint_append("mentions", new_m)

        new_forms = (
            new_m.select("norm")
            .distinct()
            .join(self._load("phrase_vecs").select("norm"), "norm", "left_anti")
            .localCheckpoint(eager=True)  # tiny; breaks the read-append cycle
        )
        from nilinker_spark.operators.blocking import prefuzz_map

        self._checkpoint_append(
            "phrase_vecs",
            phrase_vectors_df(
                self.spark, new_forms, self.kb, fuzzy_map=prefuzz_map(self.spark, new_forms, self.kb)
            ),
        )
        new_m.unpersist()

        from nilinker_spark.operators.skew import salted_count

        mentions = self._load("mentions")
        self._checkpoint("mention_metrics", salted_count(mentions, "norm"))
        pvs = self._load("phrase_vecs")
        n_forms = pvs.count()
        blocked = block_keys_df(pvs.select("norm"))
        pairs, salt_metrics = candidate_pairs(blocked, self.max_block)
        self._checkpoint("block_salt_metrics", salt_metrics)
        pairs = self._checkpoint("pairs", pairs)
        scored = self._checkpoint("scored", score_pairs(pairs, pvs, self.alpha, n_forms=n_forms))
        edges = self._checkpoint("edges", similarity_edges(scored, self.tau))
        labels = connected_components(edges)
        clusters = self._checkpoint(
            "clusters", assign_clusters(pvs.select("norm"), labels, n_forms=n_forms)
        )
        from nilinker_spark.operators.scoring import _maybe_broadcast

        resolved = self._checkpoint(
            "resolved",
            mentions.join(_maybe_broadcast(clusters, n_forms), "norm").select(
                "url", "mention_id", "surface", "pos", "norm", "cluster_id"
            ),
        )
        with open(commit_path + ".tmp", "w") as fh:
            fh.write(batch_id)
        os.replace(commit_path + ".tmp", commit_path)
        return resolved
