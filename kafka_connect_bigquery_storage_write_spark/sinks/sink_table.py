"""Manifest-committed parquet sink table (SURVEY.md R9, R13, R14, R17).

The reference appends row batches to a BigQuery write stream whose
visibility depends on the write mode: COMMITTED (visible per append,
at-least-once) vs PENDING (invisible until an atomic finalize+commit at
offset-commit time) — reference: BigqueryStreamWriter.java:60-63,196,
299-345; BigqueryStorageWriteSinkTask.java:148-245.

Spark restatement: a directory table whose visible contents are defined
by manifest marker files, not by which parquet files exist.

    <root>/_schema.json              frozen table schema (first write wins)
    <root>/data/batch=<id>/*.parquet physical rows for one micro-batch
    <root>/data/compacted-<n>/*.parquet merged rows from a compaction —
                                     a SEPARATE namespace from micro-batch
                                     ids, referenced only by its snapshot
    <root>/_staged/<id>.marker       batch written but invisible (pending)
    <root>/_commits/batch-<id>.marker  batch visible (committed mode)
    <root>/_commits/epoch-<n>.json   atomic publish of staged batch ids
    <root>/_commits/snapshot-<n>.json compaction snapshot: the compacted
                                     dir plus the EXPLICIT set of absorbed
                                     micro-batch ids (no watermark — new
                                     micro-batch ids are never shadowed)

- COMMITTED mode: write data dir, then rename a marker into _commits —
  rows visible as soon as the append lands.
- PENDING mode: marker goes to _staged; ``commit()`` publishes ALL staged
  ids in ONE epoch file (tmp + atomic rename) — the whole epoch becomes
  visible at once, mirroring finalize+batchCommitWriteStreams.
  ``reset()`` discards staged markers (finalize-only path,
  BigqueryStreamWriter.java:334-337).
- Idempotence (R14): a batch id that is already staged or committed is
  skipped and reported ALREADY_EXISTS — replays under Structured
  Streaming checkpointing (identical batch ids by construction) are
  therefore exactly-once, like the reference's offset-stamped appends
  (BigqueryStreamWriter.java:281,157-160).

Scale: readers list manifest files (tiny) and read only committed batch
directories; no listing of the data tree, no eventual-consistency window.
Writers never rewrite existing files, so concurrent epochs on a real
cluster contend only on the manifest rename, which the filesystem makes
atomic.

OBJECT-STORE CAVEAT: the atomic switch is ``os.rename`` in
``_atomic_write`` — atomic on POSIX filesystems and HDFS, NOT on S3-class
object stores (S3 "rename" is copy+delete; a reader can observe the
half-state and two concurrent committers can both think they won). On an
object store, substitute the commit primitive with one the store makes
atomic — S3 conditional PUT (If-None-Match) on the marker key, a DynamoDB
/ database conditional insert, or — the production-grade answer — replace
the whole manifest layer with a real table format (Delta/Iceberg/Hudi),
whose commit protocols solve exactly this. Everything above the
``_atomic_write`` seam (idempotence, pending epochs, compaction
snapshots) is unchanged by that substitution; that is why the primitive
is a single method.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class UnretryableSinkError(Exception):
    """Append failed with a non-retriable cause; rows become corrupt offsets."""


# The reference classifies gRPC codes INTERNAL, ABORTED, CANCELLED,
# FAILED_PRECONDITION, DEADLINE_EXCEEDED, UNAVAILABLE as retriable
# (BigqueryStreamWriter.java:120-127). The filesystem analogue: transient
# IO/timeouts are retriable, logical errors (schema mismatch, bad path,
# permission) are not.
_RETRIABLE_EXC = (TimeoutError, ConnectionError, InterruptedError, BlockingIOError)
_RETRIABLE_MARKERS = ("timeout", "temporarily unavailable", "connection reset", "deadline")


def classify_retriable(exc: BaseException) -> bool:
    if isinstance(exc, _RETRIABLE_EXC):
        return True
    msg = str(exc).lower()
    return any(m in msg for m in _RETRIABLE_MARKERS)


@dataclass
class RetryPolicy:
    max_attempts: int = 3
    backoff_s: float = 0.5

    def run(self, fn):
        attempt = 0
        while True:
            attempt += 1
            try:
                return fn()
            except Exception as exc:  # KeyboardInterrupt/SystemExit propagate
                if not classify_retriable(exc) or attempt >= self.max_attempts:
                    raise UnretryableSinkError(str(exc)) from exc
                time.sleep(self.backoff_s * (2 ** (attempt - 1)))


@dataclass
class AppendResult:
    batch_id: int
    rows: int
    already_exists: bool = False
    staged: bool = False


@dataclass
class ManifestSinkTable:
    root: str
    write_mode: str = "committed"  # committed | pending
    # frozen: first batch's schema is the table's schema forever (the
    #   reference's model — BigQuery tables don't evolve on write).
    # additive: later batches may ADD nullable columns; the table schema
    #   grows to the union, old files read the new columns as null. Type
    #   changes and dropping a required column are always rejected.
    schema_evolution: str = "frozen"
    retry: RetryPolicy = field(default_factory=RetryPolicy)

    def __post_init__(self) -> None:
        if self.write_mode not in ("committed", "pending"):
            raise ValueError(f"write.mode must be committed|pending, got {self.write_mode!r}")
        if self.schema_evolution not in ("frozen", "additive"):
            raise ValueError(f"schema_evolution must be frozen|additive, got {self.schema_evolution!r}")
        for d in ("data", "_staged", "_commits"):
            os.makedirs(os.path.join(self.root, d), exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _data_dir(self, batch_id: int) -> str:
        return os.path.join(self.root, "data", f"batch={batch_id}")

    def _staged_marker(self, batch_id: int) -> str:
        return os.path.join(self.root, "_staged", f"{batch_id}.marker")

    def _commit_marker(self, batch_id: int) -> str:
        return os.path.join(self.root, "_commits", f"batch-{batch_id}.marker")

    def _schema_path(self) -> str:
        return os.path.join(self.root, "_schema.json")

    def _atomic_write(self, path: str, payload: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(payload)
        os.rename(tmp, path)

    # -- bookkeeping --------------------------------------------------------
    def staged_ids(self) -> list[int]:
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(os.path.join(self.root, "_staged")) if f.endswith(".marker")
        )

    def _latest_snapshot(self) -> dict | None:
        # numeric sort: 'snapshot-10.json' must beat 'snapshot-9.json'
        # (lexicographic order would pick a stale snapshot from index 10 on)
        idx = [
            int(f[len("snapshot-") : -len(".json")])
            for f in os.listdir(os.path.join(self.root, "_commits"))
            if f.startswith("snapshot-") and f.endswith(".json")
        ]
        if not idx:
            return None
        with open(os.path.join(self.root, "_commits", f"snapshot-{max(idx)}.json")) as fh:
            return json.load(fh)

    def _snapshot_state(self) -> tuple[list[str], set[int]]:
        """(compacted data dirs, absorbed micro-batch ids) of the latest
        snapshot. Absorption is an explicit id set, never a watermark, so
        fresh micro-batch ids can never collide with compaction state."""
        snap = self._latest_snapshot()
        if not snap:
            return [], set()
        return list(snap["compacted_dirs"]), set(snap["absorbed_batch_ids"])

    def _marker_ids(self) -> set[int]:
        """Every micro-batch id ever committed (markers + epoch files).
        Markers survive compaction, so this set keeps absorbed replays
        idempotent without any watermark over the shared id space."""
        ids: set[int] = set()
        for f in os.listdir(os.path.join(self.root, "_commits")):
            if f.startswith("batch-") and f.endswith(".marker"):
                ids.add(int(f[len("batch-") : -len(".marker")]))
            elif f.startswith("epoch-") and f.endswith(".json"):
                with open(os.path.join(self.root, "_commits", f)) as fh:
                    ids.update(json.load(fh)["batch_ids"])
        return ids

    def committed_ids(self) -> list[int]:
        """Micro-batch ids whose batch= directory is currently visible
        (committed and not yet absorbed into a compaction snapshot)."""
        _, absorbed = self._snapshot_state()
        return sorted(self._marker_ids() - absorbed)

    def _is_known(self, batch_id: int) -> bool:
        """A batch id is known if staged, committed, or absorbed by a
        compaction snapshot — replaying any of them is a no-op (R14)."""
        if os.path.exists(self._staged_marker(batch_id)):
            return True
        _, absorbed = self._snapshot_state()
        return batch_id in absorbed or batch_id in self._marker_ids()

    def _freeze_schema(self, df: DataFrame) -> None:
        if not os.path.exists(self._schema_path()):
            self._atomic_write(self._schema_path(), df.schema.json())

    def _evolve_schema(self, df: DataFrame) -> None:
        """Additive evolution: grow the table schema to the union.

        Ordering contract: the schema file is updated BEFORE the batch's
        commit marker, so the moment a batch with new columns becomes
        visible, readers already know about them. The reverse order would
        let a reader see the batch's files under the old schema and
        silently drop the new columns. (A crash between schema update and
        marker leaves a wider schema with no data in the new columns —
        harmless: they read as null, and the replayed batch fills them.)
        """
        current = self.schema()
        if current is None:
            self._atomic_write(self._schema_path(), df.schema.json())
            return
        by_name = {f.name: f for f in current.fields}
        added: list[T.StructField] = []
        for f in df.schema.fields:
            known = by_name.get(f.name)
            if known is None:
                # new columns are forced nullable: rows already in the
                # table have no value for them
                added.append(T.StructField(f.name, f.dataType, nullable=True))
            elif known.dataType != f.dataType:
                raise ValueError(
                    f"schema evolution is additive-only: column {f.name!r} "
                    f"changed type {known.dataType.simpleString()} -> {f.dataType.simpleString()}"
                )
        incoming = set(df.schema.fieldNames())
        for f in current.fields:
            if not f.nullable and f.name not in incoming:
                raise ValueError(f"batch drops required column {f.name!r}; only nullable columns may be omitted")
        if added:
            self._atomic_write(self._schema_path(), T.StructType(list(current.fields) + added).json())

    def schema(self) -> T.StructType | None:
        if not os.path.exists(self._schema_path()):
            return None
        with open(self._schema_path()) as f:
            return T.StructType.fromJson(json.load(f))

    # -- write path ---------------------------------------------------------
    def write_batch(self, df: DataFrame, batch_id: int) -> AppendResult:
        """Append one micro-batch; idempotent per batch_id (R14)."""
        if self._is_known(batch_id):
            return AppendResult(batch_id=batch_id, rows=0, already_exists=True)
        if self.schema_evolution == "additive":
            self._evolve_schema(df)
        else:
            self._freeze_schema(df)
        data_dir = self._data_dir(batch_id)

        def _append() -> None:
            # overwrite handles a half-written dir from a failed attempt:
            # data files are only made visible by the marker written after
            df.write.mode("overwrite").parquet(data_dir)

        self.retry.run(_append)
        rows = -1  # row count not recomputed here; callers count upstream if needed
        if self.write_mode == "pending":
            self._atomic_write(self._staged_marker(batch_id), json.dumps({"batch_id": batch_id}))
            return AppendResult(batch_id=batch_id, rows=rows, staged=True)
        self._atomic_write(self._commit_marker(batch_id), json.dumps({"batch_id": batch_id}))
        return AppendResult(batch_id=batch_id, rows=rows)

    def commit(self) -> list[int]:
        """Pending mode: atomically publish every staged batch (R17).

        No-op in committed mode, exactly like the reference's guarded
        commit (BigqueryStreamWriter.java:339-345).
        """
        if self.write_mode != "pending":
            return []
        staged = self.staged_ids()
        if not staged:
            return []
        epoch = len([f for f in os.listdir(os.path.join(self.root, "_commits")) if f.startswith("epoch-")])
        self._atomic_write(
            os.path.join(self.root, "_commits", f"epoch-{epoch}.json"),
            json.dumps({"batch_ids": staged}),
        )
        for b in staged:
            os.remove(self._staged_marker(b))
        return staged

    def reset(self) -> list[int]:
        """Discard staged-but-uncommitted batches (finalize-only reset)."""
        staged = self.staged_ids()
        for b in staged:
            os.remove(self._staged_marker(b))
        return staged

    # -- maintenance -------------------------------------------------------
    def compact(self, spark: SparkSession, target_files: int = 4) -> int | None:
        """Merge everything visible into one compacted directory (the
        small-files fix). Readers before the snapshot rename see the old
        layout, readers after see the compacted one — never a mix: the
        snapshot file is the atomic switch, exactly like the epoch commit.

        The compacted data lives under ``data/compacted-<n>`` — a separate
        namespace from micro-batch ids, so the next live micro-batch
        (whose id keeps counting up) can never be mistaken for compaction
        output, and a staged pending batch can never be clobbered. The
        snapshot records the explicit absorbed-id set; fresh ids above it
        commit normally. Returns the snapshot index, or None if there was
        nothing to compact.
        """
        batch_ids = self.committed_ids()
        prior_dirs, absorbed = self._snapshot_state()
        if len(batch_ids) + len(prior_dirs) <= 1:
            return None
        snap = self._latest_snapshot()
        n_snap = (snap["index"] + 1) if snap else 0
        new_dir = f"compacted-{n_snap}"
        # Merge exactly the single listing captured above — NOT self.read(),
        # which would re-list committed ids: a batch committed concurrently
        # between the two listings would be merged into the compacted dir yet
        # missing from absorbed_batch_ids, double-counting its rows after the
        # snapshot. One listing drives both the data and the absorbed set.
        paths = [os.path.join(self.root, "data", d) for d in prior_dirs]
        paths += [self._data_dir(i) for i in batch_ids]
        merged = spark.read.schema(self.schema()).parquet(*paths).coalesce(target_files)
        merged.write.mode("overwrite").parquet(os.path.join(self.root, "data", new_dir))
        self._atomic_write(
            os.path.join(self.root, "_commits", f"snapshot-{n_snap}.json"),
            json.dumps(
                {
                    "index": n_snap,
                    "compacted_dirs": [new_dir],
                    "absorbed_batch_ids": sorted(absorbed | set(batch_ids)),
                }
            ),
        )
        return n_snap

    def vacuum(self) -> list[str]:
        """Delete data directories no longer referenced by the manifest:
        batch dirs absorbed by a compaction snapshot and compacted dirs
        superseded by a newer snapshot. Safe to run any time after
        in-flight readers of the pre-compaction layout have finished —
        the snapshot switch means new readers never list these dirs.
        Returns the removed directory names.
        """
        import shutil

        live_batches = set(self.committed_ids()) | set(self.staged_ids())
        live_compacted, _ = self._snapshot_state()
        removed = []
        data_root = os.path.join(self.root, "data")
        for d in os.listdir(data_root):
            if d.startswith("batch="):
                if int(d.split("=", 1)[1]) in live_batches:
                    continue
            elif d.startswith("compacted-"):
                if d in live_compacted:
                    continue
            else:
                continue
            shutil.rmtree(os.path.join(data_root, d))
            removed.append(d)
        return sorted(removed)

    # -- read path ------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """Visible rows = latest compaction snapshot's dirs plus committed
        batch directories not absorbed by it."""
        compacted, _ = self._snapshot_state()
        paths = [os.path.join(self.root, "data", d) for d in compacted]
        paths += [self._data_dir(i) for i in self.committed_ids()]
        schema = self.schema()
        if not paths:
            if schema is None:
                raise ValueError(f"sink table at {self.root} has never been written")
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)
