"""Versioned snapshot log over a parquet directory table.

The transaction-log half of the Iceberg/Delta stand-in (README's swap
table): every committed state of a stage table is a numbered manifest
under the SIBLING directory ``<table>__snaplog/`` listing the exact
part files (and the schema) that make up that version.  (The log must
live OUTSIDE the table directory: Spark's ``mode("overwrite")`` deletes
the table directory's whole content, and compaction swaps the directory
itself — a sibling survives both untouched.)  Readers resolve a manifest — never
the live directory — so a concurrent append can NEVER tear a read, and
append tables keep their full history readable (time travel) until an
explicit :meth:`SnapshotLog.vacuum`.

Commit protocol (single-filesystem atomic, the local stand-in for an
object-store conditional PUT):

1. the manifest is written to a private temp name in the log dir;
2. ``os.link(tmp, v{N}.json)`` publishes it — ``link`` (unlike
   ``rename``) FAILS with ``FileExistsError`` when ``v{N}`` already
   exists, which is exactly compare-and-swap on the version counter: of
   two concurrent writers that both read latest == N-1, one publishes
   v{N} and the other gets :class:`SnapshotConflict` and must re-read
   and retry on top of the winner.

Semantics by operation (stored in the manifest, enforced by physics):

- ``append``  — prior versions stay readable (their files are still in
  the directory); this is the time-travel path for the pipeline's
  append tables (``mentions``, ``phrase_vecs``).
- ``overwrite`` / ``compact`` — Spark's overwrite (and the compaction
  directory swap, pipeline.py:464) physically replaces the old part
  files, so prior versions EXPIRE: their manifests remain as history
  (audit), but reading one raises :class:`SnapshotExpired` naming the
  missing files.  This is honest Iceberg ``expire_snapshots`` behavior,
  not silent corruption — an expired read never returns wrong rows.

Schema is stored per manifest (``StructType.json()``); reads always
pass it explicitly, so a version committed before a column was added
reads with its own schema, and the LATEST schema over a mixed file set
null-fills the column in pre-evolution files (standard Spark parquet
semantics under an explicit schema).

Relation to the WAL (pipeline.py:322): the WAL makes crashed *writers*
recoverable (orphan part files are deleted on the next entry); this log
makes concurrent *readers* consistent (a manifest is only published
AFTER its files are fully written).  A multi-table batch that crashes
between its per-table appends and its WAL commit marker may have
published per-table snapshots; WAL recovery deletes those orphan files
and publishes a ``rollback`` version with the restored listing, so the
latest version always reads as the last WAL-committed state and the
crashed batch's versions become expired history.

Reference parity: the reference has no table format at all (it rewrites
whole pickle/npy files in place, e.g. ≙ src/REEL/pre_process.py:250-307
read-modify-write candidate cache); this module is part of the graft's
"what a 100 TB deployment needs" surface, with the real-system mapping
documented in README.md's Iceberg swap table.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SNAP_SUFFIX = "__snaplog"
_V_WIDTH = 12  # v000000000001.json — lexicographic == numeric order


class SnapshotConflict(RuntimeError):
    """Another writer published this version first; re-read and retry."""


class SnapshotExpired(RuntimeError):
    """The version's files were replaced by a later overwrite/compact."""


def _is_data_file(name: str) -> bool:
    # the same predicate the WAL rollback and compact() use: parquet
    # part files only — never markers (_SUCCESS) or the snapshot dir
    return (name.startswith("part-") or name.endswith(".parquet")) and not name.startswith(
        "."
    )


def list_data_files(table_dir: str) -> list[str]:
    """Sorted relative part-file names currently in the table directory."""
    if not os.path.isdir(table_dir):
        return []
    return sorted(n for n in os.listdir(table_dir) if _is_data_file(n))


class SnapshotLog:
    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir.rstrip("/")
        self.log_dir = self.table_dir + _SNAP_SUFFIX

    # --- log inspection ----------------------------------------------------
    def _version_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:0{_V_WIDTH}d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for n in os.listdir(self.log_dir):
            if n.startswith("v") and n.endswith(".json") and not n.startswith("."):
                try:
                    out.append(int(n[1 : -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def snapshot(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"no snapshots at {self.log_dir}")
        with open(self._version_path(version)) as fh:
            manifest = json.load(fh)
        return manifest

    def history(self) -> list[dict]:
        """All manifests, oldest first (version/operation/file count/ts)."""
        out = []
        for v in self.versions():
            m = self.snapshot(v)
            out.append(
                {
                    "version": m["version"],
                    "operation": m["operation"],
                    "n_files": len(m["files"]),
                    "ts": m["ts"],
                }
            )
        return out

    # --- commit ------------------------------------------------------------
    def commit(self, operation: str, files: list[str] | None = None) -> int:
        """Publish the given (or current) file set as the next version.

        Returns the committed version.  Raises :class:`SnapshotConflict`
        when a concurrent writer published the same version number first
        — the caller must re-derive its file set and retry (optimistic
        concurrency; the loser's data files are already in the
        directory, so its retry commit is cheap).

        ``files`` defaults to the directory's current part-file listing,
        which is correct for the pipeline's single-flight writers (the
        caller contract of run/run_incremental); an external writer
        doing blind concurrent appends should pass its base listing +
        its own files explicitly.
        """
        if files is None:
            files = list_data_files(self.table_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        latest = self.latest_version()
        version = 0 if latest is None else latest + 1
        schema_json = self._dir_schema_json()
        manifest = {
            "version": version,
            "operation": operation,
            "files": sorted(files),
            "schema": schema_json,
            "parent": latest,
            "ts": time.time(),
        }
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        target = self._version_path(version)
        try:
            os.link(tmp, target)  # CAS: fails iff the version exists
        except FileExistsError:
            raise SnapshotConflict(
                f"version {version} of {self.table_dir} was committed by a "
                "concurrent writer; re-read latest_version() and retry"
            ) from None
        finally:
            os.remove(tmp)
        return version

    def _dir_schema_json(self) -> str | None:
        """Schema of the live directory via the parquet footer of one part
        file — read driver-side with pyarrow (no Spark job per commit)."""
        files = list_data_files(self.table_dir)
        if not files:
            return None
        import pyarrow.parquet as pq

        # arrow schema -> spark StructType via the same mapping spark's
        # own Arrow interchange uses (no Spark job per commit)
        import pyspark.sql.pandas.types as pst

        arrow_schema = pq.read_schema(os.path.join(self.table_dir, files[0]))
        spark_schema = pst.from_arrow_schema(arrow_schema)
        return spark_schema.json()

    # --- read --------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """DataFrame of exactly the version's files, with its schema.

        Missing files (replaced by a later overwrite/compact) raise
        :class:`SnapshotExpired` — an expired version never silently
        reads the wrong rows.
        """
        m = self.snapshot(version)
        missing = [f for f in m["files"] if not os.path.exists(os.path.join(self.table_dir, f))]
        if missing:
            raise SnapshotExpired(
                f"version {m['version']} of {self.table_dir} expired: a later "
                f"overwrite/compact replaced {len(missing)} of its files "
                f"(e.g. {missing[0]}); history remains readable via history()"
            )
        if not m["files"]:
            # an empty committed version: zero-row frame with the schema
            schema = StructType.fromJson(json.loads(m["schema"])) if m["schema"] else StructType([])
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.table_dir, f) for f in m["files"]]
        reader = spark.read
        if m["schema"]:
            reader = reader.schema(StructType.fromJson(json.loads(m["schema"])))
        return reader.parquet(*paths)

    # --- maintenance -------------------------------------------------------
    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Delete data files referenced ONLY by versions older than the
        last ``retain_last`` — the storage-reclaim half of expiry.

        Never touches files the retained versions reference, and never
        touches the manifests (history stays auditable).  Returns the
        deleted file names.
        """
        if retain_last < 1:
            raise ValueError("vacuum must retain at least the latest version")
        vs = self.versions()
        if not vs:
            return []
        retained = set(vs[-retain_last:])
        keep: set[str] = set()
        for v in retained:
            keep.update(self.snapshot(v)["files"])
        # also keep anything in the live dir not referenced by ANY
        # manifest (an in-flight writer's files, pre-commit)
        referenced: set[str] = set()
        for v in vs:
            referenced.update(self.snapshot(v)["files"])
        deleted = []
        for name in list_data_files(self.table_dir):
            if name in referenced and name not in keep:
                os.remove(os.path.join(self.table_dir, name))
                deleted.append(name)
        return deleted
