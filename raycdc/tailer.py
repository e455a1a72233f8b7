"""Changelog tailer: the ListenDICOM analog — an incremental source that
discovers append-only parquet WAL segments and feeds uncommitted ones to
the lake, epoch by epoch.

Reference: ``ListenDICOM.java:122-190`` accepts pushed records and
commits them into the flow; provenance ``receive`` events at
``ListenDICOM.java:160-164``. Here the "network push" is an append-only
directory of parquet segments (the shape a Debezium/binlog archiver
produces); discovery is a directory listing diffed against the lake
manifest, so the tailer is stateless and restart-safe — the manifest IS
the consumer offset.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterator

import pyarrow as pa

import ray.data

from raycdc.lake import LakeTable
from raycdc.routing import make_validator


def list_segments(log_dir: str, suffix: str = ".parquet") -> list[str]:
    """Sorted segment names (sort order == append order by naming
    convention seg-NNNNN)."""
    return sorted(f for f in os.listdir(log_dir) if f.endswith(suffix))


def publish_segment(log_dir: str, name: str, table: pa.Table) -> str:
    """The *bring-your-own-WAL-writer* contract, as code (the push-ingest
    analog of ``ListenDICOM.java:165-171``'s create-commit-rollback): a
    concurrent archiver makes a segment visible to the tailer by writing
    the full file under a NON-segment temp name, then committing it with
    one atomic ``os.rename``. The tailer's directory listing therefore
    never sees a torn file, and a crashed writer leaves only an invisible
    ``.*.tmp`` orphan (rollback = delete, never a partial segment).
    Segment ``name``s must sort in append order (seg-NNNNN);
    ``test_tail_forever_concurrent_writer`` gates exactly-once under a
    live writer using this contract."""
    import pyarrow.parquet as pq

    if not name.endswith(".parquet"):
        raise ValueError("segment names must end with .parquet")
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, f".{name}.tmp")
    final = os.path.join(log_dir, name)
    try:
        pq.write_table(table, tmp)
        os.rename(tmp, final)  # atomic commit on POSIX same-fs
    except BaseException:
        try:
            os.unlink(tmp)  # rollback: remove the invisible partial
        except OSError:
            pass
        raise
    return final


def pending_segments(lake: LakeTable, log_dir: str) -> list[str]:
    done = set(lake.manifest()["segments_applied"])
    return [s for s in list_segments(log_dir) if s not in done]


def read_segments(
    log_dir: str, names: list[str], provenance: bool = False, fused: bool = True
) -> ray.data.Dataset:
    """Segment reader. With ``provenance=True`` a ``_segment`` column
    traces every row to its source file (provenance-receive analog) —
    off by default on the hot path.

    ``fused=True`` (default) reads each file INSIDE the map stage
    (``from_items(paths) → map_batches(read)``): Ray 2.49 does not fuse
    ``ReadParquet`` with downstream ``map_batches``, so the library read
    pays a full object-store round trip for every ingested byte before
    the first transform — on a 100-TB tail that is an extra
    corpus-sized pass through plasma. The fused path makes
    read → validate → transform → L0 ``write_run`` ONE task per
    segment with zero payload bytes in the object store (the map-only
    ingest ideal; run-file stats are the only task output). Parallelism
    = pending segment count, and each task materializes one segment, so
    the archiver's segment size bounds task memory (document-ed
    contract; split oversized segments upstream). ``fused=False`` keeps
    the ``read_parquet`` path for row-group-level parallelism over few
    huge files."""
    paths = [os.path.join(log_dir, n) for n in names]
    if fused:
        import pyarrow.parquet as pq

        def read_files(t: pa.Table):
            for p in t.column("path").to_pylist():
                tab = pq.read_table(p)
                if provenance:
                    seg = pa.array([os.path.basename(p)] * tab.num_rows)
                    tab = tab.append_column("_segment", seg)
                yield tab

        ds = ray.data.from_items(
            [{"path": p} for p in paths], override_num_blocks=len(paths)
        )
        # batch_size=1: one TASK per segment — without it the operator
        # bundles the (byte-tiny) path blocks into a handful of tasks and
        # parallelism collapses to the bundle count, not the segment count
        return ds.map_batches(read_files, batch_format="pyarrow", batch_size=1)
    from raycdc.util import read_parquet_clean

    ds = read_parquet_clean(paths, include_paths=provenance)
    if not provenance:
        return ds

    import pyarrow.compute as pc

    def stamp(t: pa.Table) -> pa.Table:
        seg = pc.replace_substring_regex(t.column("path"), pattern=r"^.*/", replacement="")
        return t.drop_columns(["path"]).append_column("_segment", seg)

    return ds.map_batches(stamp, batch_format="pyarrow")


def tail_once(
    lake: LakeTable,
    log_dir: str,
    max_segments_per_epoch: int | None = None,
    transform: Callable[[ray.data.Dataset], ray.data.Dataset] | None = None,
    dead_letter_dir: str | None = None,
    batch_size: int | None = 65536,
) -> dict | None:
    """Apply ONE epoch of pending segments (or None if fully caught up).

    Flow: discover → read (with provenance) → single-pass validate with
    dead-letter diversion → [optional transform, e.g. a RuleSet stage] →
    lake.apply (exactly-once). Dead letters land under
    ``dead_letter_dir/epoch=N`` with full payload for repair
    (failure-loopback analog, ``PutDICOM.java:83-86``); one pass over the
    input total.

    ``batch_size=None`` keeps each segment ONE batch end-to-end through
    the fused read → validate → transform → L0 write chain: maximal
    per-batch LWW reduction and exactly one run file per segment (task
    memory = one segment — bounded by the archiver's segment size).
    """
    todo = pending_segments(lake, log_dir)
    if not todo:
        return None
    if max_segments_per_epoch:
        todo = todo[:max_segments_per_epoch]
    ds = read_segments(log_dir, todo)
    dl = None
    if dead_letter_dir is not None:
        epoch = lake.manifest()["epoch"] + 1
        dl = os.path.join(dead_letter_dir, f"epoch={epoch:06d}")
    # stateless task stage: fuses with the downstream per-batch reduce
    # and uses every core (an actor pool here capped parallelism at its
    # pool size and paid per-actor warmup)
    ok = ds.map_batches(
        make_validator(dl),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if transform is not None:
        ok = transform(ok)
    return lake.apply(ok, todo, batch_size=batch_size)


def tail_until_caught_up(
    lake: LakeTable,
    log_dir: str,
    max_segments_per_epoch: int | None = None,
    transform=None,
    dead_letter_dir: str | None = None,
    batch_size: int = 65536,
) -> list[dict]:
    """Drain the log: repeat tail_once until no pending segments."""
    out = []
    while True:
        r = tail_once(
            lake,
            log_dir,
            max_segments_per_epoch=max_segments_per_epoch,
            transform=transform,
            dead_letter_dir=dead_letter_dir,
            batch_size=batch_size,
        )
        if r is None:
            return out
        out.append(r)


def tail_forever(
    lake: LakeTable,
    log_dir: str,
    poll_s: float = 1.0,
    idle_timeout_s: float | None = None,
    max_epochs: int | None = None,
    **tail_kwargs,
) -> Iterator[dict]:
    """Continuous watch loop — the ListenDICOM *push* analog
    (``ListenDICOM.java:122-190``): a long-running tailer that picks up
    segments appearing mid-run and yields each committed epoch as it
    lands (provenance-receive per epoch, not per restart).

    Generator semantics make it embeddable without threads: the caller
    consumes epochs as they commit and controls shutdown. Exits when
    ``max_epochs`` epochs committed, or after ``idle_timeout_s`` seconds
    fully caught up with nothing new (None = poll forever). Restart-safe
    like everything else: the manifest is the consumer offset, so a
    killed watcher resumes exactly where it stopped.
    """
    n = 0
    idle_since: float | None = None
    while True:
        r = tail_once(lake, log_dir, **tail_kwargs)
        if r is not None:
            idle_since = None
            n += 1
            yield r
            if max_epochs is not None and n >= max_epochs:
                return
            continue
        now = time.monotonic()
        if idle_since is None:
            idle_since = now
        if idle_timeout_s is not None and now - idle_since >= idle_timeout_s:
            return
        time.sleep(poll_s)
