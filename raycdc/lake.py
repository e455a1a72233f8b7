"""The Parquet lake: partitioned converged state with an exactly-once
epoch/manifest commit protocol and checkpoint-resume.

Reference capabilities re-expressed (SURVEY.md §2.1 S2/S5, §2.7 W4/W5):

* ``ProcessSession.commitAsync()`` atomic publish + the durable Derby
  ``uid_map`` (``DeidentifyDICOM.java:192``,
  ``DeidentificationController.java:93-99``) → **two-phase commit**:
  per-partition epoch parquet files are written first (to temp names,
  then atomically renamed), and a single ``_manifest.json`` swap is the
  only commit point. A crash between epoch write and manifest swap
  leaves the lake at the previous epoch; re-running the apply
  regenerates byte-identical epoch content and commits — replay
  reconverges (north rule exactly-once).
* ``PutDICOM`` retry-by-requeue (``PutDICOM.java:83-86``) → Ray task
  retries are safe because every write is tmp+rename idempotent and the
  merge is deterministic.
* Flyway bootstrap (``V1.0__create.sql``) → :meth:`LakeTable.init`
  (idempotent manifest v0).

State model: each partition's state file holds the converged rows PLUS
their winning ``lsn`` and ``op`` — including **delete tombstones**.
Tombstones are what make at-least-once replay safe: a re-delivered
older insert loses the LWW fold against the tombstone instead of
resurrecting a deleted row. ``read()`` filters tombstones out.
Idempotent segment re-application is exact (manifest tracks applied
segment names); per-partition LSN watermarks are recorded for
lineage/metrics and resume diagnostics, *not* used to drop events
(a per-partition watermark would wrongly drop a late first event for an
untouched key — per-key LWW against state handles disorder correctly).

Scale: ``num_partitions`` bounds per-task state (O(total rows / P));
output is partitioned parquet so a failed run resumes by skipping
committed epochs; the merge shuffle moves only the *reduced* event
stream (see apply.py two-level fold).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from raycdc.apply import _PartialLww, drop_tombstones, last_writer_per_key
from raycdc.schema_evo import conform_to, schema_from_str, schema_to_str, unify
from raycdc.util import bucket_of

MANIFEST = "_manifest.json"
META_COLS = ("lsn", "op")


def _fsync_dir(path: str) -> None:
    fd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(path)


def _atomic_write_parquet(path: str, table: pa.Table) -> None:
    """Durable tmp+fsync+rename: the manifest swap is only a valid commit
    point if the epoch files it references are already on stable storage."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp)
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, path)
    _fsync_dir(path)


class LakeTable:
    """A key-partitioned, epoch-versioned Parquet table with exactly-once
    incremental apply. One instance is a lightweight handle — all real
    work runs as Ray Data pipelines."""

    def __init__(
        self,
        path: str,
        num_partitions: int = 64,
        key: str = "doc_id",
        lsn_col: str = "lsn",
        op_col: str = "op",
    ):
        self.path = path
        self.key = key
        self.lsn_col = lsn_col
        self.op_col = op_col
        self._requested_partitions = num_partitions

    # ------------------------------------------------------------ manifest
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def init(self) -> dict:
        """Idempotent bootstrap (Flyway-migration analog): manifest v0,
        empty lake. Returns the manifest."""
        os.makedirs(self.path, exist_ok=True)
        if self.exists():
            return self.manifest()
        m = {
            "version": 1,
            "epoch": 0,
            "num_partitions": self._requested_partitions,
            "key": self.key,
            "segments_applied": [],
            "partitions": {},  # str(pid) -> {file, rows, live_rows, watermark}
            "history": [],
        }
        _atomic_write_json(self.manifest_path, m)
        return m

    # ------------------------------------------------------------ read
    def read(self, include_tombstones: bool = False) -> ray.data.Dataset:
        """The current converged table as a streaming Dataset."""
        m = self.manifest()
        files = [os.path.join(self.path, p["file"]) for p in m["partitions"].values()]
        if not files:
            return ray.data.from_arrow(pa.table({}))
        ds = ray.data.read_parquet(files)
        if m.get("schema"):
            # partitions written in different epochs may predate a schema
            # evolution — conform every block to the table's current schema
            ds = ds.map_batches(conform_to(schema_from_str(m["schema"])), batch_format="pyarrow")
        if include_tombstones:
            return ds

        def strip(t: pa.Table) -> pa.Table:
            t = drop_tombstones(t, self.op_col)
            return t.drop_columns([c for c in META_COLS if c in t.column_names])

        return ds.map_batches(strip, batch_format="pyarrow")

    def read_partition(self, pid: int, include_tombstones: bool = False) -> pa.Table:
        m = self.manifest()
        ent = m["partitions"].get(str(pid))
        if ent is None:
            return None
        t = pq.read_table(os.path.join(self.path, ent["file"]))
        if not include_tombstones:
            t = drop_tombstones(t, self.op_col)
            t = t.drop_columns([c for c in META_COLS if c in t.column_names])
        return t

    # ------------------------------------------------------------ apply
    def apply(
        self,
        events_ds: ray.data.Dataset,
        segment_names: list[str],
        batch_size: int = 65536,
    ) -> dict:
        """Apply one epoch of change events exactly once.

        ``segment_names`` identifies the input (changelog segment files);
        if every name is already committed this is a no-op (idempotent
        re-call — at-least-once delivery tolerance). Partial overlap
        applies only the new segments' events IF the caller filtered the
        stream accordingly; by contract the tailer passes only
        uncommitted segments.

        Events must be pre-validated (see routing.split_valid); the
        stream must carry (key, lsn, op, payload...) columns.
        """
        m = self.manifest()
        done = set(m["segments_applied"])
        new_names = [s for s in segment_names if s not in done]
        if not new_names:
            return {"epoch": m["epoch"], "applied_segments": [], "noop": True}
        if set(new_names) != set(segment_names):
            raise ValueError(
                "segment batch partially committed — tailer must pass only uncommitted segments"
            )

        epoch = m["epoch"] + 1
        P = m["num_partitions"]
        key, lsn_col, op_col = self.key, self.lsn_col, self.op_col
        lake_path = self.path
        epoch_rel = f"state/e{epoch:06d}"
        os.makedirs(os.path.join(lake_path, epoch_rel), exist_ok=True)
        part_files = {int(k): v["file"] for k, v in m["partitions"].items()}

        t0 = time.time()

        # level-1 reduce + bucket stamp (stateless tasks, zero-copy Arrow)
        reduced = events_ds.map_batches(
            _PartialLww(key, lsn_col), batch_format="pyarrow", batch_size=batch_size
        )

        def stamp(t: pa.Table) -> pa.Table:
            return t.append_column("_bucket", pa.array(bucket_of(t.column(key), P)))

        bucketed = reduced.map_batches(stamp, batch_format="pyarrow", batch_size=batch_size)

        def merge_partition(group: pa.Table) -> pa.Table:
            """Per-partition merge: old state ⊔ events → new epoch file.
            Deterministic content (sorted by key), tmp+rename write —
            safe under Ray task retries."""
            pid = int(group["_bucket"][0].as_py())
            group = group.drop_columns(["_bucket"])
            old_file = part_files.get(pid)
            parts = []
            if old_file is not None:
                parts.append(pq.read_table(os.path.join(lake_path, old_file)))
            parts.append(group)
            allt = pa.concat_tables(parts, promote_options="permissive")
            merged = last_writer_per_key(allt, key=key, lsn_col=lsn_col)
            merged = merged.sort_by(key)
            rel = f"{epoch_rel}/part-{pid:05d}.parquet"
            _atomic_write_parquet(os.path.join(lake_path, rel), merged)
            live = drop_tombstones(merged, op_col).num_rows
            wm = pc.max(merged[lsn_col]).as_py() if merged.num_rows else -1
            return pa.table(
                {
                    "pid": pa.array([pid], type=pa.int64()),
                    "file": pa.array([rel]),
                    "rows": pa.array([merged.num_rows], type=pa.int64()),
                    "live_rows": pa.array([live], type=pa.int64()),
                    "watermark": pa.array([wm], type=pa.int64()),
                    "events_in": pa.array([group.num_rows], type=pa.int64()),
                    "schema": pa.array([schema_to_str(merged.schema)]),
                }
            )

        stats_rows = (
            bucketed.groupby("_bucket")
            .map_groups(merge_partition, batch_format="pyarrow")
            .take_all()
        )

        # ---- commit point: single atomic manifest swap
        partitions = dict(m["partitions"])
        touched = 0
        events_in = 0
        for r in stats_rows:
            partitions[str(r["pid"])] = {
                "file": r["file"],
                "rows": int(r["rows"]),
                "live_rows": int(r["live_rows"]),
                "watermark": int(r["watermark"]),
            }
            touched += 1
            events_in += int(r["events_in"])
        schemas = [schema_from_str(r["schema"]) for r in stats_rows]
        if m.get("schema"):
            schemas.append(schema_from_str(m["schema"]))
        m2 = dict(m)
        if schemas:
            m2["schema"] = schema_to_str(unify(schemas))
        m2["epoch"] = epoch
        m2["segments_applied"] = list(m["segments_applied"]) + list(new_names)
        m2["partitions"] = partitions
        m2["history"] = list(m.get("history", [])) + [
            {
                "epoch": epoch,
                "segments": list(new_names),
                "partitions_touched": touched,
                "events_after_reduce": events_in,
                "wall_sec": round(time.time() - t0, 3),
            }
        ]
        _atomic_write_json(self.manifest_path, m2)
        return m2["history"][-1]

    # ------------------------------------------------------------ maintenance
    def vacuum(self, keep_epochs: int = 1) -> list[str]:
        """Delete state files of epochs older than the newest
        ``keep_epochs`` that are not referenced by the manifest."""
        m = self.manifest()
        referenced = {p["file"] for p in m["partitions"].values()}
        removed = []
        state_dir = os.path.join(self.path, "state")
        if not os.path.isdir(state_dir):
            return removed
        epochs = sorted(os.listdir(state_dir))
        for e in epochs[:-keep_epochs] if keep_epochs else epochs:
            d = os.path.join(state_dir, e)
            for f in os.listdir(d):
                rel = f"state/{e}/{f}"
                if rel not in referenced:
                    os.remove(os.path.join(d, f))
                    removed.append(rel)
            if not os.listdir(d):
                os.rmdir(d)
        return removed

    def compact_tombstones(self) -> int:
        """Drop tombstones from state files (safe once upstream segments
        can no longer be replayed). Writes a new epoch. Returns dropped count."""
        m = self.manifest()
        epoch = m["epoch"] + 1
        epoch_rel = f"state/e{epoch:06d}"
        os.makedirs(os.path.join(self.path, epoch_rel), exist_ok=True)
        dropped = 0
        partitions = {}
        for pid, ent in m["partitions"].items():
            t = pq.read_table(os.path.join(self.path, ent["file"]))
            live = drop_tombstones(t, self.op_col)
            dropped += t.num_rows - live.num_rows
            rel = f"{epoch_rel}/part-{int(pid):05d}.parquet"
            _atomic_write_parquet(os.path.join(self.path, rel), live)
            partitions[pid] = {**ent, "file": rel, "rows": live.num_rows, "live_rows": live.num_rows}
        m2 = {**m, "epoch": epoch, "partitions": partitions}
        m2["history"] = list(m.get("history", [])) + [
            {"epoch": epoch, "compaction": True, "tombstones_dropped": dropped}
        ]
        _atomic_write_json(self.manifest_path, m2)
        return dropped
