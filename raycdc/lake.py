"""The Parquet lake: partitioned converged state with an exactly-once
epoch/manifest commit protocol, **delta-epoch commits with
merge-on-read**, threshold compaction, and checkpoint-resume.

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

**Write-amplification design (the 100-TB property).** An epoch writes
only that epoch's (LWW-reduced) events — bytes written are proportional
to events applied, NOT to state size — in one of two commit modes:

* ``shuffle`` — a hash-bucket all-to-all routes events to their owning
  partition and each touched partition appends one *delta* file;
  auto-compaction when a partition accumulates ``compact_deltas``
  pending deltas. Read fan-in ≤ ``compact_deltas`` + 1 per partition.
* ``l0`` — **no shuffle at all**: each ingest task writes one
  bucket-SORTED run file with ~P row groups; partition reads prune to
  their own row groups via parquet statistics (``filters=``). The apply
  epoch is a map-only pass — on a multi-node cluster every write is
  node-local and zero bytes cross the network, so ingest scales
  linearly with nodes; merge cost moves to read/compaction
  (LSM level-0 / Hudi merge-on-read shape). Auto-compaction bounds
  pending runs at ``l0_compact_files``.

``read()`` is merge-on-read in both modes: each partition's base +
deltas/pruned runs are folded (per-key last-writer-wins) inside one
parallel Ray task per partition.

State model: state files hold the converged rows PLUS their winning
``lsn`` and ``op`` — including **delete tombstones**. Tombstones are
what make at-least-once replay safe: a re-delivered older insert loses
the LWW fold against the tombstone instead of resurrecting a deleted
row. ``read()`` filters tombstones out; ``compact_tombstones`` drops
them permanently once upstream segments can no longer be replayed.

Concurrency: a writer lease lock (O_EXCL file carrying pid+host+lease
deadline) is held for the duration of ``apply``/compaction and the
manifest epoch is re-checked immediately before the swap (CAS) — two
concurrent writers cannot silently discard each other's committed
epochs. Stale locks are broken only on same-host crash evidence or
lease expiry (the shared-filesystem case), via an atomic rename so two
waiters can never double-break (see ``_WriterLock``).

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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from raycdc.apply import _PartialLww, drop_tombstones, last_writer_per_key
from raycdc.schema_evo import conform_to, schema_from_str, schema_to_str, unify
from raycdc.util import bucket_of

MANIFEST = "_manifest.json"
WRITER_LOCK = "_writer.lock"
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


def _atomic_write_parquet(path: str, table: pa.Table,
                          row_group_size: int | None = None) -> None:
    """Durable tmp+fsync+rename: the manifest swap is only a valid commit
    point if the epoch files it references are already on stable storage."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, path)
    _fsync_dir(path)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _host() -> str:
    import socket

    return socket.gethostname()


def _part_files(ent: dict) -> tuple[str | None, list[str]]:
    """(base, deltas) of a manifest partition entry; understands the v1
    single-file layout (``{"file": ...}``) for old manifests."""
    if "file" in ent:
        return ent["file"], []
    return ent.get("base"), list(ent.get("deltas", []))


class ConcurrentWriterError(RuntimeError):
    """Another writer holds the lake lock or committed a competing epoch."""


class _WriterLock:
    """O_EXCL lease lock held across an apply/compact.

    Lock content is ``pid host lease_deadline`` so staleness has two
    independent detectors:

    * **same host + owner pid dead** — crash evidence; break immediately;
    * **lease expired** — the only valid evidence on a *shared
      filesystem*, where a pid probe says nothing about a remote writer
      (a live remote writer's lock must NOT be broken before its lease
      runs out — writers must finish or re-acquire within ``lease_s``).

    The break itself is race-free: the breaker atomically *renames* the
    lock to a private name (only one waiter can win the rename), re-reads
    the renamed file, and — if it captured a FRESHER lock than the one it
    judged stale — restores it with a non-clobbering ``os.link``. Two
    waiters can never double-break, and nobody can unlink a live writer's
    lock (the round-2 remove()-race; the manifest epoch CAS remains the
    corruption backstop either way)."""

    def __init__(self, lake_path: str, lease_s: float = 600.0):
        self.path = os.path.join(lake_path, WRITER_LOCK)
        self.lease_s = lease_s
        self._held = False

    def _read(self) -> tuple[str, int, str, float] | None:
        """(raw, pid, host, deadline) or None if the lock vanished."""
        try:
            raw = open(self.path).read()
        except OSError:
            return None
        parts = raw.split()
        try:
            pid = int(parts[0])
        except (ValueError, IndexError):
            return raw, -1, "?", 0.0  # unreadable → expired lease
        if len(parts) >= 3:  # v3: pid host deadline
            try:
                return raw, pid, parts[1], float(parts[2])
            except ValueError:
                return raw, pid, parts[1], 0.0
        # v2 legacy "pid acquire_ts": deadline = acquire + default lease
        try:
            return raw, pid, _host(), float(parts[1]) + self.lease_s
        except (ValueError, IndexError):
            return raw, pid, _host(), 0.0

    def __enter__(self):
        me = _host()
        for attempt in range(6):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"{os.getpid()} {me} {time.time() + self.lease_s:.3f}".encode())
                os.close(fd)
                self._held = True
                return self
            except FileExistsError:
                info = self._read()
                if info is None:
                    continue  # holder released between create and read — retry
                raw, pid, host, deadline = info
                if host == me and pid > 0:
                    # the local pid probe is authoritative on this host: a
                    # dead owner is stale NOW; a live owner is never broken
                    # (even past its lease — a slow local writer is visible)
                    stale = not _pid_alive(pid)
                else:
                    # remote/unreadable owner: only lease expiry is evidence
                    stale = time.time() > deadline
                if not stale or attempt >= 4:
                    raise ConcurrentWriterError(
                        f"lake is locked by live writer pid={pid}@{host} "
                        f"(lease deadline {deadline:.0f}, {self.path}); "
                        "LakeTable requires a single writer at a time"
                    )
                priv = f"{self.path}.stale.{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(self.path, priv)
                except FileNotFoundError:
                    continue  # another waiter already broke it
                if open(priv).read() != raw:
                    # we renamed a lock fresher than the one judged stale —
                    # restore it without clobbering any newer lock
                    try:
                        os.link(priv, self.path)
                    except FileExistsError:
                        pass
                    os.remove(priv)
                    continue
                os.remove(priv)  # stale lock broken — loop back to acquire

    def __exit__(self, *exc):
        if self._held:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
        return False


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
        compact_deltas: int = 4,
        commit_mode: str = "shuffle",
        l0_compact_files: int = 24,
        lock_lease_s: float = 600.0,
        metrics_name: str | None = None,
    ):
        """``commit_mode`` picks the ingest/merge trade:

        * ``"shuffle"`` — per-partition delta files via a hash-bucket
          all-to-all each epoch. Reads fold ≤ ``compact_deltas`` files
          per partition. Read-optimized.
        * ``"l0"`` — **shuffle-free ingest** (LSM level-0 / merge-on-read
          style): each ingest task writes one bucket-SORTED run file
          with ~``num_partitions`` row groups, so a partition read
          prunes to its own row groups via parquet statistics. No
          all-to-all in the apply path at all — the epoch is map-only
          and scales linearly with cores/nodes. Reads fold base + every
          pending L0 run (pruned); when pending runs exceed
          ``l0_compact_files`` the apply auto-compacts (Ray-parallel,
          one task per partition, storage-pruned reads — still no
          network shuffle). Write-optimized; the 10^10-event ingest
          path.
        """
        if commit_mode not in ("shuffle", "l0"):
            raise ValueError("commit_mode must be 'shuffle' or 'l0'")
        self.path = path
        self.key = key
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.compact_deltas = compact_deltas
        self.commit_mode = commit_mode
        self.l0_compact_files = l0_compact_files
        self.lock_lease_s = lock_lease_s
        # optional LogCacheStatistics-analog counters: epoch stats are
        # published driver-side from the already-collected per-partition
        # stats rows, so the hot path pays nothing (metrics.py)
        self.metrics_name = metrics_name
        self._requested_partitions = num_partitions

    # ------------------------------------------------------------ manifest
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def manifest(self, epoch: int | None = None) -> dict:
        """Current manifest, or — time travel — the immutable snapshot
        committed at ``epoch``. Snapshots are written at every commit
        point and retained until :meth:`vacuum` (``keep_epochs``) reclaims
        them, so any retained epoch's full table state stays readable."""
        if epoch is None:
            with open(self.manifest_path) as f:
                return json.load(f)
        p = self._snapshot_path(epoch)
        try:
            with open(p) as f:
                return json.load(f)
        except FileNotFoundError:
            raise LookupError(
                f"no manifest snapshot for epoch {epoch}: it was never "
                "committed, pre-dates snapshotting, or was vacuumed "
                "(raise vacuum(keep_epochs=...) to retain more history)"
            ) from None

    def _snapshot_path(self, epoch: int) -> str:
        return os.path.join(self.path, "manifests", f"manifest-e{epoch:06d}.json")

    def epochs(self) -> list[int]:
        """Epochs readable via ``read(epoch=...)`` (retained snapshots)."""
        d = os.path.join(self.path, "manifests")
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[len("manifest-e"):-len(".json")])
            for f in os.listdir(d)
            if f.startswith("manifest-e") and f.endswith(".json")
        )

    def _commit_manifest(self, m: dict) -> None:
        """The single commit point: atomic current-manifest swap, then an
        immutable per-epoch snapshot for time travel. (A crash between the
        two leaves that one epoch unsnapshotted — current-state
        correctness is unaffected; the swap alone is the commit.)"""
        _atomic_write_json(self.manifest_path, m)
        os.makedirs(os.path.join(self.path, "manifests"), exist_ok=True)
        _atomic_write_json(self._snapshot_path(int(m["epoch"])), m)

    def init(self) -> dict:
        """Idempotent bootstrap (Flyway-migration analog): manifest v0,
        empty lake. Returns the manifest."""
        os.makedirs(self.path, exist_ok=True)
        if self.exists():
            return self.manifest()
        m = {
            "version": 3,
            "epoch": 0,
            "num_partitions": self._requested_partitions,
            "key": self.key,
            "segments_applied": [],
            # str(pid) -> {base, deltas, rows, live_rows|None, watermark}
            "partitions": {},
            # L0 run files (bucket-sorted, span all partitions): [{file, rows, watermark}]
            "l0": [],
            "history": [],
        }
        _atomic_write_json(self.manifest_path, m)
        return m

    # ------------------------------------------------------------ read
    def _fold_partition_fn(self, schema_str: str | None, include_tombstones: bool):
        key, lsn_col, op_col = self.key, self.lsn_col, self.op_col
        lake_path = self.path
        conform = conform_to(schema_from_str(schema_str)) if schema_str else None

        def fold(batch: pa.Table) -> pa.Table:
            outs = []
            for row in batch.to_pylist():
                pid = int(row["pid"])
                parts = [
                    pq.read_table(os.path.join(lake_path, f))
                    for f in json.loads(row["files"])
                ]
                for f in json.loads(row.get("l0") or "[]"):
                    # bucket-sorted run file: parquet row-group statistics
                    # prune the read to this partition's row groups
                    t0 = pq.read_table(
                        os.path.join(lake_path, f), filters=[("_bucket", "=", pid)]
                    )
                    parts.append(t0.drop_columns(["_bucket"]))
                if conform is not None:
                    parts = [conform(p) for p in parts]
                parts = [p for p in parts if p.num_rows] or parts[:1]
                t = (
                    parts[0]
                    if len(parts) == 1
                    else pa.concat_tables(parts, promote_options="permissive")
                )
                if len(parts) > 1:  # base files are already one-row-per-key
                    t = last_writer_per_key(t, key=key, lsn_col=lsn_col)
                if not include_tombstones:
                    t = drop_tombstones(t, op_col)
                    t = t.drop_columns([c for c in META_COLS if c in t.column_names])
                outs.append(t)
            return pa.concat_tables(outs, promote_options="permissive")

        return fold

    @staticmethod
    def _run_may_contain(ent: dict, pid: int) -> bool:
        """Manifest-level run pruning: False iff the L0 run entry's bucket
        metadata proves partition ``pid`` has no rows in it. Entries
        without metadata (older manifests) are conservatively included."""
        bmin, bmax = ent.get("bmin"), ent.get("bmax")
        if bmin is None or bmax is None:
            return True
        if pid < bmin or pid > bmax:
            return False
        buckets = ent.get("buckets")
        return buckets is None or pid in buckets

    def _descriptors(self, m: dict) -> list[dict]:
        l0_ents = m.get("l0", [])
        descs = []
        # candidate pids: every partition some run may touch + every
        # partition with state files — sparse L0 metadata keeps the task
        # count proportional to touched partitions, not num_partitions
        pids = set(int(p) for p in m["partitions"])
        for e in l0_ents:
            if e.get("buckets") is not None:
                pids.update(int(b) for b in e["buckets"])
            elif e.get("bmin") is not None:
                pids.update(range(int(e["bmin"]), int(e["bmax"]) + 1))
            else:
                pids.update(range(m["num_partitions"]))
        for pid in sorted(pids):
            ent = m["partitions"].get(str(pid), {})
            base, deltas = _part_files(ent) if ent else (None, [])
            files = ([base] if base else []) + deltas
            l0_files = [e["file"] for e in l0_ents if self._run_may_contain(e, pid)]
            if files or l0_files:
                descs.append({"pid": pid, "files": json.dumps(files), "l0": json.dumps(l0_files)})
        return descs

    def read(
        self, include_tombstones: bool = False, epoch: int | None = None
    ) -> ray.data.Dataset:
        """The converged table as a streaming Dataset — merge-on-read:
        one Ray task per partition folds base + deltas. ``epoch`` time-
        travels to any retained snapshot (state files are immutable and
        content-named, so an old manifest replays its exact table; see
        :meth:`epochs` / :meth:`vacuum`)."""
        m = self.manifest(epoch)
        descs = self._descriptors(m)
        if not descs:
            return ray.data.from_arrow(pa.table({}))
        ds = ray.data.from_items(descs, override_num_blocks=len(descs))
        return ds.map_batches(
            self._fold_partition_fn(m.get("schema"), include_tombstones),
            batch_format="pyarrow",
        )

    def read_partition(
        self, pid: int, include_tombstones: bool = False, epoch: int | None = None
    ) -> pa.Table:
        m = self.manifest(epoch)
        descs = {d["pid"]: d for d in self._descriptors(m)}
        if pid not in descs:
            return None
        fold = self._fold_partition_fn(m.get("schema"), include_tombstones)
        return fold(pa.Table.from_pylist([descs[pid]])).sort_by(self.key)

    def live_rows(self) -> int:
        """Exact live-row count. Free when every partition is compacted
        (manifest metadata); otherwise one merge-on-read counting scan."""
        m = self.manifest()
        ents = m["partitions"].values()
        if not m.get("l0") and ents and all(
            ent.get("live_rows") is not None for ent in ents
        ):
            return sum(ent["live_rows"] for ent in ents)
        if not ents and not m.get("l0"):
            return 0
        return self.read().count()

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

        Bytes written per epoch ∝ events applied (delta files), except
        for partitions whose pending delta count reached
        ``compact_deltas`` — those are compacted in the same epoch.
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

        with _WriterLock(self.path, lease_s=self.lock_lease_s):
            return self._apply_locked(m, new_names, events_ds, batch_size)

    def _apply_locked(self, m: dict, new_names: list[str], events_ds, batch_size: int) -> dict:
        epoch = m["epoch"] + 1
        P = m["num_partitions"]
        key, lsn_col, op_col = self.key, self.lsn_col, self.op_col
        lake_path = self.path
        compact_deltas = self.compact_deltas
        epoch_rel = f"state/e{epoch:06d}"
        os.makedirs(os.path.join(lake_path, epoch_rel), exist_ok=True)
        if self.commit_mode == "l0":
            return self._apply_l0(m, new_names, events_ds, epoch, epoch_rel, batch_size)
        part_entries = {
            int(k): _part_files(v) for k, v in m["partitions"].items()
        }  # pid -> (base, deltas)

        t0 = time.time()

        # level-1 reduce + bucket stamp (stateless tasks, zero-copy Arrow)
        reduced = events_ds.map_batches(
            _PartialLww(key, lsn_col), batch_format="pyarrow", batch_size=batch_size
        )

        def stamp(t: pa.Table) -> pa.Table:
            return t.append_column("_bucket", pa.array(bucket_of(t.column(key), P)))

        bucketed = reduced.map_batches(stamp, batch_format="pyarrow", batch_size=batch_size)

        def merge_partition(group: pa.Table) -> pa.Table:
            """Per-partition epoch write: fold THIS epoch's events to one
            row per key, then either append a delta file (cheap, O(epoch
            events)) or — first write / threshold reached — compact into
            a new base. Deterministic content, tmp+rename write — safe
            under Ray task retries."""
            pid = int(group["_bucket"][0].as_py())
            group = group.drop_columns(["_bucket"])
            folded = last_writer_per_key(group, key=key, lsn_col=lsn_col).sort_by(key)
            base, deltas = part_entries.get(pid, (None, []))
            compact = base is None or len(deltas) + 1 >= compact_deltas
            if compact:
                old = [
                    pq.read_table(os.path.join(lake_path, f))
                    for f in (([base] if base else []) + deltas)
                ]
                if old:
                    allt = pa.concat_tables([*old, folded], promote_options="permissive")
                    folded = last_writer_per_key(allt, key=key, lsn_col=lsn_col).sort_by(key)
                rel = f"{epoch_rel}/part-{pid:05d}.parquet"
                live = drop_tombstones(folded, op_col).num_rows
            else:
                rel = f"{epoch_rel}/part-{pid:05d}.delta.parquet"
                live = -1  # unknown without reading base state (by design)
            _atomic_write_parquet(os.path.join(lake_path, rel), folded)
            wm = pc.max(folded[lsn_col]).as_py() if folded.num_rows else -1
            return pa.table(
                {
                    "pid": pa.array([pid], type=pa.int64()),
                    "file": pa.array([rel]),
                    "kind": pa.array(["base" if compact else "delta"]),
                    "rows": pa.array([folded.num_rows], type=pa.int64()),
                    "live_rows": pa.array([live], type=pa.int64()),
                    "watermark": pa.array([wm], type=pa.int64()),
                    "events_in": pa.array([group.num_rows], type=pa.int64()),
                    "schema": pa.array([schema_to_str(folded.schema)]),
                }
            )

        stats_rows = (
            bucketed.groupby("_bucket")
            .map_groups(merge_partition, batch_format="pyarrow")
            .take_all()
        )

        # ---- commit point: single atomic manifest swap (with epoch CAS)
        partitions = {
            k: dict(v) for k, v in m["partitions"].items()
        }
        touched = 0
        events_in = 0
        compactions = 0
        max_part_events = 0
        for r in stats_rows:
            pid = str(r["pid"])
            old = partitions.get(pid, {})
            old_base, old_deltas = _part_files(old) if old else (None, [])
            wm = max(int(r["watermark"]), int(old.get("watermark", -1)))
            if r["kind"] == "base":
                ent = {
                    "base": r["file"],
                    "deltas": [],
                    "rows": int(r["rows"]),
                    "live_rows": int(r["live_rows"]),
                    "watermark": wm,
                }
                compactions += 1 if (old_base or old_deltas) else 0
            else:
                ent = {
                    "base": old_base,
                    "deltas": old_deltas + [r["file"]],
                    "rows": int(old.get("rows", 0)) + int(r["rows"]),
                    "live_rows": None,  # exact only after compaction
                    "watermark": wm,
                }
            partitions[pid] = ent
            touched += 1
            events_in += int(r["events_in"])
            max_part_events = max(max_part_events, int(r["events_in"]))
        schemas = [schema_from_str(r["schema"]) for r in stats_rows]
        if m.get("schema"):
            schemas.append(schema_from_str(m["schema"]))
        # CAS: the manifest must still be at the epoch we read at entry —
        # a competing committed writer would otherwise be silently undone
        cur = self.manifest()
        if cur["epoch"] != m["epoch"]:
            raise ConcurrentWriterError(
                f"manifest advanced from epoch {m['epoch']} to {cur['epoch']} during apply"
            )
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
                "compactions": compactions,
                "events_after_reduce": events_in,
                # skew signal (SURVEY §4): a hot partition shows up as
                # max ≫ mean events per touched partition
                "max_partition_events": max_part_events,
                "skew_ratio": round(max_part_events * touched / max(1, events_in), 3),
                "wall_sec": round(time.time() - t0, 3),
            }
        ]
        self._commit_manifest(m2)
        self._publish_epoch_metrics(
            {
                "lake.epochs_committed": 1,
                "lake.events_after_reduce": events_in,
                "lake.partitions_touched": touched,
                "lake.compactions": compactions,
                "lake.keys_live": sum(
                    int(ent["live_rows"]) for ent in partitions.values()
                    if ent.get("live_rows") not in (None, -1)
                ),
            }
        )
        return m2["history"][-1]

    def _publish_epoch_metrics(self, items: dict) -> None:
        """Driver-side counter publish (LogCacheStatistics analog) from
        stats already in hand — adds no work to the apply tasks."""
        if not self.metrics_name:
            return
        from raycdc.metrics import Metrics

        Metrics(self.metrics_name).actor.incr_many.remote(items)

    def _apply_l0(self, m: dict, new_names: list[str], events_ds, epoch: int,
                  epoch_rel: str, batch_size: int) -> dict:
        """Shuffle-free epoch commit: one map-only pass folds each input
        block per key, stamps + sorts by bucket, and writes ONE run file
        per block with ~P row groups (so partition reads prune via
        parquet statistics). File names are content-derived → a retried
        task rewrites the identical file (exactly-once preserved; the
        manifest swap stays the only commit point)."""
        import hashlib

        P = m["num_partitions"]
        key, lsn_col = self.key, self.lsn_col
        lake_path = self.path
        t0 = time.time()

        def write_run(t: pa.Table) -> pa.Table:
            from raycdc.util import tune_allocators

            tune_allocators()
            empty = pa.table(
                {
                    "file": pa.array([], pa.string()),
                    "rows": pa.array([], pa.int64()),
                    "watermark": pa.array([], pa.int64()),
                    "schema": pa.array([], pa.string()),
                    "bmin": pa.array([], pa.int32()),
                    "bmax": pa.array([], pa.int32()),
                    "buckets": pa.array([], pa.string()),
                }
            )
            if t.num_rows == 0:
                return empty
            t = last_writer_per_key(t, key=key, lsn_col=lsn_col)
            t = t.append_column("_bucket", pa.array(bucket_of(t.column(key), P)))
            idx = pc.sort_indices(t, sort_keys=[("_bucket", "ascending"), (key, "ascending")])
            t = t.take(idx)
            lsns = np.asarray(t.column(lsn_col).combine_chunks().cast(pa.int64()))
            # content-derived name: (lsn stream ⊕ key hashes) — a retried
            # task rewrites the identical file; distinct blocks (even with
            # identical lsn columns, e.g. a lsn=-1 base seed) get distinct
            # names because the key hashes differ
            from raycdc.util import str_hash_u64

            kh = str_hash_u64(t.column(key))
            digest = hashlib.md5(lsns.tobytes() + kh.tobytes()).hexdigest()[:16]
            rel = f"{epoch_rel}/l0-{digest}.parquet"
            rg = max(2048, -(-t.num_rows // P))  # ≈ one row group per partition
            tmp = os.path.join(lake_path, rel) + f".tmp.{uuid.uuid4().hex[:8]}"
            pq.write_table(t, tmp, row_group_size=rg)
            fd = os.open(tmp, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
            os.replace(tmp, os.path.join(lake_path, rel))
            _fsync_dir(os.path.join(lake_path, rel))
            wm = int(lsns.max()) if len(lsns) else -1
            sch = schema_to_str(t.drop_columns(["_bucket"]).schema)
            # run-pruning metadata: which partitions this run can contain —
            # a partition read skips runs outside its bucket (the manifest-
            # level complement of the in-file row-group statistics)
            ub = np.unique(np.asarray(t.column("_bucket").combine_chunks()))
            bjson = json.dumps([int(b) for b in ub]) if len(ub) <= 64 else ""
            return pa.table(
                {
                    "file": pa.array([rel]),
                    "rows": pa.array([t.num_rows], type=pa.int64()),
                    "watermark": pa.array([wm], type=pa.int64()),
                    "schema": pa.array([sch]),
                    "bmin": pa.array([int(ub[0])], type=pa.int32()),
                    "bmax": pa.array([int(ub[-1])], type=pa.int32()),
                    "buckets": pa.array([bjson]),
                }
            )

        stats_rows = events_ds.map_batches(
            write_run, batch_format="pyarrow", batch_size=None
        ).take_all()
        # two distinct blocks with identical content write the SAME
        # (content-named) file — keep one stats row per file so reads
        # don't fold it twice and manifest counters don't double-count
        stats_rows = list({r["file"]: r for r in stats_rows}.values())

        schemas = [schema_from_str(r["schema"]) for r in stats_rows]
        if m.get("schema"):
            schemas.append(schema_from_str(m["schema"]))
        cur = self.manifest()
        if cur["epoch"] != m["epoch"]:
            raise ConcurrentWriterError(
                f"manifest advanced from epoch {m['epoch']} to {cur['epoch']} during apply"
            )
        m2 = dict(m)
        if schemas:
            m2["schema"] = schema_to_str(unify(schemas))
        m2["epoch"] = epoch
        m2["segments_applied"] = list(m["segments_applied"]) + list(new_names)
        m2["l0"] = list(m.get("l0", [])) + [
            {
                "file": r["file"],
                "rows": int(r["rows"]),
                "watermark": int(r["watermark"]),
                "bmin": int(r["bmin"]),
                "bmax": int(r["bmax"]),
                "buckets": json.loads(r["buckets"]) if r["buckets"] else None,
            }
            for r in stats_rows
        ]
        m2["history"] = list(m.get("history", [])) + [
            {
                "epoch": epoch,
                "segments": list(new_names),
                "l0_runs": len(stats_rows),
                "events_after_reduce": sum(int(r["rows"]) for r in stats_rows),
                "wall_sec": round(time.time() - t0, 3),
            }
        ]
        self._commit_manifest(m2)
        self._publish_epoch_metrics(
            {
                "lake.epochs_committed": 1,
                "lake.events_after_reduce": sum(int(r["rows"]) for r in stats_rows),
                "lake.l0_runs_written": len(stats_rows),
            }
        )
        result = m2["history"][-1]
        if len(m2["l0"]) > self.l0_compact_files:
            # bound merge-on-read fan-in: fold pending runs into bases
            # (Ray-parallel, storage-pruned reads — still no shuffle)
            self._compact_locked(self.manifest(), drop_tombs=False)
            result = dict(result, auto_compacted=True)
        return result

    # ------------------------------------------------------------ maintenance
    def vacuum(self, keep_epochs: int = 1) -> list[str]:
        """Delete state files of epochs older than the newest
        ``keep_epochs`` that are not referenced by the current manifest
        OR by any retained time-travel snapshot. Snapshots older than the
        newest ``keep_epochs`` are reclaimed first — ``keep_epochs`` is
        the single retention dial for both state and history."""
        # prune manifest snapshots beyond the retention window (the
        # current manifest is always authoritative regardless)
        snaps = self.epochs()
        cur_epoch = int(self.manifest()["epoch"])
        retained = snaps[-keep_epochs:] if keep_epochs else []
        for e in snaps:
            if e not in retained:
                try:
                    os.remove(self._snapshot_path(e))
                except FileNotFoundError:
                    pass
        manifests = [self.manifest()] + [
            self.manifest(e) for e in retained if e != cur_epoch
        ]
        referenced: set[str] = set()
        for m in manifests:
            referenced.update(e["file"] for e in m.get("l0", []))
            for ent in m["partitions"].values():
                base, deltas = _part_files(ent)
                if base:
                    referenced.add(base)
                referenced.update(deltas)
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

    def compact(self, drop_tombs: bool = False,
                zorder: list[str] | None = None) -> int:
        """Full compaction (Ray-parallel): every partition's base +
        deltas + pending L0 runs fold into a fresh base file; optionally
        drop tombstones (safe once upstream segments can no longer be
        replayed). ``zorder`` clusters each fresh base on a Morton key
        over the named numeric columns (per-partition min-max quantize)
        so row-group statistics prune selective reads on ANY of them —
        the Delta OPTIMIZE ZORDER move at compaction time; key order is
        restored per read by the fold's LWW sort, so query results are
        unchanged. Writes a new epoch. Returns tombstones dropped."""
        with _WriterLock(self.path, lease_s=self.lock_lease_s):
            return self._compact_locked(self.manifest(), drop_tombs, zorder)

    def _compact_locked(self, m: dict, drop_tombs: bool = False,
                        zorder: list[str] | None = None) -> int:
        epoch = m["epoch"] + 1
        epoch_rel = f"state/e{epoch:06d}"
        os.makedirs(os.path.join(self.path, epoch_rel), exist_ok=True)
        descs = self._descriptors(m)
        if not descs:
            return 0
        key, lsn_col, op_col = self.key, self.lsn_col, self.op_col
        lake_path = self.path
        fold = self._fold_partition_fn(m.get("schema"), include_tombstones=True)

        def compact_one(batch: pa.Table) -> pa.Table:
            rows = []
            for i in range(batch.num_rows):
                one = batch.slice(i, 1)
                t = fold(one).sort_by(key)
                if zorder and t.num_rows:
                    from raycdc.ops import zorder_key

                    qcols = dict(zip(t.column_names, t.columns))
                    for zi, zc in enumerate(zorder):
                        x = np.asarray(t.column(zc).cast(pa.float64()))
                        mn, mx = float(np.nanmin(x)), float(np.nanmax(x))
                        span = (mx - mn) or 1.0
                        q = np.clip((x - mn) / span * 65535, 0, 65535)
                        qcols[f"_zq{zi}"] = pa.array(
                            np.nan_to_num(q).astype(np.int64))
                    t2 = zorder_key(pa.table(qcols),
                                    [f"_zq{zi}" for zi in range(len(zorder))])
                    order = pc.sort_indices(t2, sort_keys=[("_z", "ascending")])
                    t = t.take(order)
                live_t = drop_tombstones(t, op_col)
                dropped = t.num_rows - live_t.num_rows
                if drop_tombs:
                    t = live_t
                pid = int(one["pid"][0].as_py())
                rel = f"{epoch_rel}/part-{pid:05d}.parquet"
                # z-ordered bases need bounded row groups for the stats
                # to prune anything (default = one giant group)
                rgs = max(2048, t.num_rows // 16) if zorder else None
                _atomic_write_parquet(os.path.join(lake_path, rel), t,
                                      row_group_size=rgs)
                wm = pc.max(t[lsn_col]).as_py() if t.num_rows and lsn_col in t.column_names else None
                rows.append(
                    {
                        "pid": pid,
                        "file": rel,
                        "rows": t.num_rows,
                        "live_rows": live_t.num_rows,
                        "watermark": -1 if wm is None else int(wm),
                        "dropped": dropped if drop_tombs else 0,
                    }
                )
            return pa.Table.from_pylist(rows)

        stats = (
            ray.data.from_items(descs, override_num_blocks=len(descs))
            .map_batches(compact_one, batch_format="pyarrow")
            .take_all()
        )
        cur = self.manifest()
        if cur["epoch"] != m["epoch"]:
            raise ConcurrentWriterError("manifest advanced during compaction")
        partitions = {k: dict(v) for k, v in m["partitions"].items()}
        dropped_total = 0
        for r in stats:
            old = partitions.get(str(r["pid"]), {})
            partitions[str(r["pid"])] = {
                "base": r["file"],
                "deltas": [],
                "rows": int(r["rows"]),
                "live_rows": int(r["live_rows"]),
                "watermark": max(int(r["watermark"]), int(old.get("watermark", -1))),
            }
            dropped_total += int(r["dropped"])
        # compaction folds every pending L0 run into the bases → clear L0
        m2 = {**m, "epoch": epoch, "partitions": partitions, "l0": []}
        m2["history"] = list(m.get("history", [])) + [
            {"epoch": epoch, "compaction": True, "tombstones_dropped": dropped_total}
        ]
        self._commit_manifest(m2)
        return dropped_total

    def compact_tombstones(self) -> int:
        """Drop tombstones from state files (safe once upstream segments
        can no longer be replayed). Writes a new epoch. Returns dropped count."""
        return self.compact(drop_tombs=True)


def lineage(lake: "LakeTable", pid: int | None = None) -> list[dict]:
    """Per-partition LINEAGE from the retained manifest snapshots: for
    every epoch, which changelog segments fed it and which state files
    each partition gained (plus the partition's LSN watermark after the
    epoch) — the provenance record the north-star names beside metrics.
    Derived entirely from immutable manifests (no data reads); epochs
    already vacuumed have no snapshot and are omitted."""
    rows: list[dict] = []
    prev_segs: set = set()
    prev_files: dict = {}
    for e in lake.epochs():
        m = lake.manifest(e)
        segs = set(m.get("segments_applied", []))
        new_segs = sorted(segs - prev_segs)
        for spid, ent in sorted(m.get("partitions", {}).items(), key=lambda kv: int(kv[0])):
            ipid = int(spid)
            if pid is not None and ipid != pid:
                continue
            base, deltas = _part_files(ent)
            files = set([base] if base else []) | set(deltas)
            added = sorted(files - prev_files.get(ipid, set()))
            if e == 0 or added or new_segs:
                rows.append({
                    "epoch": e,
                    "pid": ipid,
                    "segments": new_segs,
                    "files_added": added,
                    "watermark": ent.get("watermark"),
                    "live_rows": ent.get("live_rows"),
                })
            prev_files[ipid] = files
        seen_l0 = prev_files.get(-1, set())
        for ent in m.get("l0", []):
            if ent["file"] in seen_l0:
                continue
            rows.append({
                "epoch": e,
                "pid": None,  # L0 runs span partitions (bucket-sorted)
                "segments": new_segs,
                "files_added": [ent["file"]],
                "watermark": ent.get("watermark"),
                "live_rows": None,
            })
        prev_files[-1] = seen_l0 | {x["file"] for x in m.get("l0", [])}
        prev_segs = segs
    return rows
