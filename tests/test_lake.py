"""Exactly-once lake: epoch/manifest commit, idempotent re-apply, crash
recovery, tombstone semantics, resume equivalence, tailer drain.

Reference analogs: session commit atomicity (`DeidentifyDICOM.java:192`),
durable uid_map (`DeidentificationController.java:93-99`), retry-by-
requeue (`PutDICOM.java:83-86`), replay/resume equivalence (north rule).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

import raycdc.lake as lake_mod
from raycdc.apply import base_as_inserts
from raycdc.lake import LakeTable
from raycdc.routing import split_valid
from raycdc.synth import (
    EventGenConfig,
    base_table,
    events_table,
    fold_events,
    is_malformed_mask,
    with_replays_and_disorder,
    write_changelog,
)
from raycdc.tailer import pending_segments, tail_once, tail_until_caught_up


def canon(t: pa.Table) -> pa.Table:
    return t.select(sorted(t.column_names)).sort_by("doc_id").combine_chunks()


def assert_eq(a: pa.Table, b: pa.Table):
    a, b = canon(a), canon(b)
    assert a.num_rows == b.num_rows
    for c in a.column_names:
        assert a[c].cast(b[c].type).combine_chunks().equals(b[c].combine_chunks()), c


def collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    return pa.concat_tables(batches, promote_options="permissive") if batches else pa.table({})


@pytest.fixture(params=["shuffle", "l0"])
def lake(tmp_path, request):
    """Every core lake test runs under BOTH commit modes: per-partition
    delta shuffling and shuffle-free L0 runs (merge-on-read)."""
    lk = LakeTable(str(tmp_path / "lake"), num_partitions=8, commit_mode=request.param)
    lk.init()
    return lk


def seeded_lake(lk: LakeTable, base: pa.Table):
    lk.apply(base_as_inserts(rd.from_arrow(base)), ["__base__"], batch_size=256)
    return lk


def make_log(tmp_path, n_events=2000, n_base=150, seed=19, n_segments=5, **kw):
    cfg = EventGenConfig(
        n_events=n_events, n_base=n_base, seed=seed, min_len=4, max_len=12,
        dup_replay_rate=0.05, **kw
    )
    log_dir = str(tmp_path / "log")
    write_changelog(log_dir, cfg, n_segments=n_segments)
    base = base_table(n_base, seed=seed, min_len=4, max_len=12)
    all_events = pa.concat_tables([pq.read_table(os.path.join(log_dir, f)) for f in sorted(os.listdir(log_dir))])
    return base, log_dir, all_events


def test_init_idempotent(tmp_path):
    lk = LakeTable(str(tmp_path / "l"), num_partitions=4)
    m1 = lk.init()
    m2 = lk.init()
    assert m1 == m2 and m1["epoch"] == 0


def test_apply_and_read_matches_oracle(lake, tmp_path):
    base, log_dir, all_events = make_log(tmp_path)
    seeded_lake(lake, base)
    res = tail_until_caught_up(lake, log_dir, batch_size=256)
    assert len(res) == 1  # all segments in one epoch by default
    golden = fold_events(base, all_events)
    assert_eq(collect(lake.read()), golden)
    m = lake.manifest()
    assert m["epoch"] == 2
    assert len(m["segments_applied"]) == 6  # __base__ + 5 segments


def test_epoch_per_segment_resume_equivalence(lake, tmp_path):
    """Full replay (one epoch) ≡ segment-at-a-time replay (many epochs) —
    the checkpoint-resume equivalence gate."""
    base, log_dir, all_events = make_log(tmp_path, seed=23)
    seeded_lake(lake, base)
    res = tail_until_caught_up(lake, log_dir, max_segments_per_epoch=1, batch_size=256)
    assert len(res) == 5
    golden = fold_events(base, all_events)
    assert_eq(collect(lake.read()), golden)
    # watermarks recorded per partition
    m = lake.manifest()
    assert all(p["watermark"] >= -1 for p in m["partitions"].values())


def test_reapply_same_segments_is_noop(lake, tmp_path):
    base, log_dir, _ = make_log(tmp_path, seed=29)
    seeded_lake(lake, base)
    tail_until_caught_up(lake, log_dir, batch_size=256)
    m1 = lake.manifest()
    # tailer finds nothing pending; direct re-apply of same names is a no-op
    assert pending_segments(lake, log_dir) == []
    r = lake.apply(rd.from_arrow(base_table(0, seed=1)), sorted(os.listdir(log_dir)))
    assert r.get("noop") is True
    assert lake.manifest() == m1


def test_partial_overlap_rejected(lake, tmp_path):
    base, log_dir, _ = make_log(tmp_path, seed=31, n_segments=3)
    seeded_lake(lake, base)
    segs = sorted(os.listdir(log_dir))
    ev = rd.read_parquet([os.path.join(log_dir, segs[0])])
    lake.apply(ev, [segs[0]], batch_size=256)
    with pytest.raises(ValueError, match="partially committed"):
        lake.apply(ev, [segs[0], segs[1]], batch_size=256)


def test_crash_between_epoch_write_and_manifest_swap(lake, tmp_path, monkeypatch):
    """Kill the commit after state files are written but before the
    manifest swap → manifest still at old epoch → re-run reconverges."""
    base, log_dir, all_events = make_log(tmp_path, seed=37, n_segments=2)
    seeded_lake(lake, base)
    real_write = lake_mod._atomic_write_json
    calls = {"n": 0}

    def crashing_write(path, obj):
        calls["n"] += 1
        raise OSError("simulated crash before manifest swap")

    monkeypatch.setattr(lake_mod, "_atomic_write_json", crashing_write)
    with pytest.raises(OSError):
        tail_once(lake, log_dir, batch_size=256)
    monkeypatch.setattr(lake_mod, "_atomic_write_json", real_write)
    # lake still at the seeded epoch; orphan epoch files on disk are ignored
    assert lake.manifest()["epoch"] == 1
    tail_until_caught_up(lake, log_dir, batch_size=256)
    assert_eq(collect(lake.read()), fold_events(base, all_events))


def test_tombstone_prevents_resurrection(lake):
    """delete applied in epoch k; replaying the pre-delete insert later
    must NOT resurrect the row (at-least-once tolerance via tombstones)."""
    ins = pa.table(
        {
            "lsn": pa.array([1], type=pa.int64()),
            "op": ["insert"],
            "doc_id": ["k1"],
            "tokens": pa.array([[1, 2]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([2], type=pa.int32()),
            "source": ["web"],
        }
    )
    dele = pa.table(
        {
            "lsn": pa.array([2], type=pa.int64()),
            "op": ["delete"],
            "doc_id": ["k1"],
            "tokens": pa.array([None], type=pa.list_(pa.int32())),
            "n_tok": pa.array([None], type=pa.int32()),
            "source": pa.array([None], type=pa.string()),
        }
    )
    lake.apply(rd.from_arrow(ins), ["s1"])
    lake.apply(rd.from_arrow(dele), ["s2"])
    assert collect(lake.read()).num_rows == 0
    # replay the old insert as a "new" segment (late duplicate delivery)
    lake.apply(rd.from_arrow(ins), ["s3"])
    assert collect(lake.read()).num_rows == 0  # tombstone wins (lsn 2 > 1)
    # compaction drops the tombstone; count is exact
    assert lake.compact_tombstones() == 1
    assert collect(lake.read()).num_rows == 0


def test_late_first_event_for_untouched_key_is_applied(lake):
    """Regression guard for the per-partition-watermark pitfall: key B's
    first event has a lower lsn than an already-applied event for key A
    in the same partition — it must still apply."""
    a = pa.table(
        {
            "lsn": pa.array([100], type=pa.int64()),
            "op": ["insert"],
            "doc_id": ["a"],
            "tokens": pa.array([[1]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1], type=pa.int32()),
            "source": ["web"],
        }
    )
    b = pa.table(
        {
            "lsn": pa.array([5], type=pa.int64()),
            "op": ["insert"],
            "doc_id": ["b"],
            "tokens": pa.array([[7]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1], type=pa.int32()),
            "source": ["web"],
        }
    )
    lake.apply(rd.from_arrow(a), ["sA"])
    lake.apply(rd.from_arrow(b), ["sB"])
    assert collect(lake.read()).num_rows == 2


def test_dead_letter_sink(lake, tmp_path):
    base, log_dir, all_events = make_log(tmp_path, seed=41, pct_malformed=0.1)
    seeded_lake(lake, base)
    dl_dir = str(tmp_path / "dead")
    tail_until_caught_up(lake, log_dir, dead_letter_dir=dl_dir, batch_size=256)
    import numpy as np

    n_bad = int(is_malformed_mask(all_events).sum())
    dead = pq.read_table(dl_dir) if n_bad else None
    assert dead is not None and dead.num_rows == n_bad
    # dead letters keep full payload and the engine result matches oracle
    assert set(dead.column_names) >= {"lsn", "op", "doc_id", "tokens", "n_tok", "source"}
    assert_eq(collect(lake.read()), fold_events(base, all_events))


def test_all_dead_letter_segment_still_commits(lake, tmp_path):
    """A segment whose every event is malformed must still be marked
    applied (its rows live in the dead-letter stream) — otherwise the
    tailer would retry it forever."""
    bad = pa.table(
        {
            "lsn": pa.array([1, 2], type=pa.int64()),
            "op": ["update", "update"],
            "doc_id": ["a", "b"],
            "tokens": pa.array([[1], [2]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([99, 99], type=pa.int32()),  # all inconsistent
            "source": ["w", "w"],
        }
    )
    log_dir = str(tmp_path / "badlog")
    os.makedirs(log_dir)
    pq.write_table(bad, os.path.join(log_dir, "seg-00000.parquet"))
    res = tail_until_caught_up(lake, log_dir, dead_letter_dir=str(tmp_path / "dead"))
    assert len(res) == 1
    m = lake.manifest()
    assert m["segments_applied"] == ["seg-00000.parquet"]
    assert sum(p.get("live_rows", 0) for p in m["partitions"].values()) == 0
    assert pq.read_table(str(tmp_path / "dead")).num_rows == 2
    # nothing pending afterwards
    assert tail_until_caught_up(lake, log_dir) == []


def test_delta_epoch_bytes_proportional_to_events(tmp_path):
    """The 100-TB property: an epoch's bytes written are proportional to
    the events applied, NOT to the size of the converged state."""
    lk = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    lk.init()
    base = base_table(5000, seed=11, min_len=32, max_len=64)
    seeded_lake(lk, base)
    state_root = os.path.join(lk.path, "state")
    seed_bytes = sum(
        os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(state_root) for f in fs
    )
    # a tiny epoch: update 10 of the 5000 keys
    upd = pa.table(
        {
            "lsn": pa.array(range(10_000, 10_010), type=pa.int64()),
            "op": ["update"] * 10,
            "doc_id": [f"doc-{i:08d}" for i in range(10)],
            "tokens": pa.array([[1, 2, 3]] * 10, type=pa.list_(pa.int32())),
            "n_tok": pa.array([3] * 10, type=pa.int32()),
            "source": ["web"] * 10,
        }
    )
    lk.apply(rd.from_arrow(upd), ["tiny-seg"])
    epoch_dir = os.path.join(state_root, "e000002")
    epoch_bytes = sum(
        os.path.getsize(os.path.join(epoch_dir, f)) for f in os.listdir(epoch_dir)
    )
    assert epoch_bytes < seed_bytes * 0.05, (epoch_bytes, seed_bytes)
    m = lk.manifest()
    assert any(ent["deltas"] for ent in m["partitions"].values())
    # merge-on-read returns the updated values
    got = canon(collect(lk.read()))
    assert got.num_rows == 5000
    row = got.filter(pa.array([d == "doc-00000003" for d in got["doc_id"].to_pylist()]))
    assert row["tokens"].to_pylist() == [[1, 2, 3]]


def test_auto_compaction_threshold(tmp_path):
    """Once a partition accumulates compact_deltas pending deltas, the
    next epoch compacts it: deltas reset, read fan-in stays bounded."""
    lk = LakeTable(str(tmp_path / "lake"), num_partitions=2, compact_deltas=2)
    lk.init()
    base = base_table(50, seed=13, min_len=4, max_len=8)
    seeded_lake(lk, base)
    for k in range(4):
        ev = pa.table(
            {
                "lsn": pa.array([1000 + k], type=pa.int64()),
                "op": ["update"],
                "doc_id": ["doc-00000001"],
                "tokens": pa.array([[k]], type=pa.list_(pa.int32())),
                "n_tok": pa.array([1], type=pa.int32()),
                "source": ["web"],
            }
        )
        lk.apply(rd.from_arrow(ev), [f"s{k}"])
    m = lk.manifest()
    for ent in m["partitions"].values():
        assert len(ent["deltas"]) < 2  # threshold enforced
    assert any(h.get("compactions", 0) for h in m["history"])
    got = collect(lk.read())
    row = got.filter(pa.array([d == "doc-00000001" for d in got["doc_id"].to_pylist()]))
    assert row["tokens"].to_pylist() == [[3]]  # last writer (lsn 1003)


def test_concurrent_writer_lock(lake, tmp_path):
    """A live writer's lock blocks a second apply; a dead writer's stale
    lock is broken automatically."""
    from raycdc.lake import WRITER_LOCK, ConcurrentWriterError

    ev = pa.table(
        {
            "lsn": pa.array([1], type=pa.int64()),
            "op": ["insert"],
            "doc_id": ["k"],
            "tokens": pa.array([[1]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1], type=pa.int32()),
            "source": ["web"],
        }
    )
    lock_path = os.path.join(lake.path, WRITER_LOCK)
    with open(lock_path, "w") as f:
        f.write(f"{os.getpid()} 0")  # a live pid (ours)
    with pytest.raises(ConcurrentWriterError, match="locked by live writer"):
        lake.apply(rd.from_arrow(ev), ["s1"])
    # stale lock: nonexistent pid → broken automatically, apply proceeds
    with open(lock_path, "w") as f:
        f.write("999999999 0")
    lake.apply(rd.from_arrow(ev), ["s1"])
    assert collect(lake.read()).num_rows == 1
    assert not os.path.exists(lock_path)


def _one_event(doc_id="k", lsn=1):
    return pa.table(
        {
            "lsn": pa.array([lsn], type=pa.int64()),
            "op": ["insert"],
            "doc_id": [doc_id],
            "tokens": pa.array([[1]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1], type=pa.int32()),
            "source": ["web"],
        }
    )


def test_writer_lease_remote_lock(tmp_path):
    """Shared-filesystem story: a lock owned by a REMOTE host (pid probe
    meaningless) is respected until its lease deadline and broken after."""
    import time as _time

    from raycdc.lake import WRITER_LOCK, ConcurrentWriterError

    lk = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    lk.init()
    lock_path = os.path.join(lk.path, WRITER_LOCK)
    # live remote writer: unexpired lease — must NOT be broken, even though
    # pid 999999999 is dead on THIS host
    with open(lock_path, "w") as f:
        f.write(f"999999999 other-host-f00 {_time.time() + 3600:.3f}")
    with pytest.raises(ConcurrentWriterError, match="other-host-f00"):
        lk.apply(rd.from_arrow(_one_event()), ["s1"])
    # expired remote lease — broken, apply proceeds
    with open(lock_path, "w") as f:
        f.write(f"999999999 other-host-f00 {_time.time() - 1:.3f}")
    lk.apply(rd.from_arrow(_one_event()), ["s1"])
    assert collect(lk.read()).num_rows == 1
    assert not os.path.exists(lock_path)


def test_writer_lock_break_does_not_steal_fresh_lock(tmp_path):
    """The round-2 race: a waiter that judged a lock stale must not break
    the DIFFERENT (fresh) lock that replaced it. Simulated by swapping the
    lock content between the staleness judgment and the break."""
    import time as _time

    import raycdc.lake as lm
    from raycdc.lake import WRITER_LOCK, ConcurrentWriterError, _WriterLock

    lk = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    lk.init()
    lock_path = os.path.join(lk.path, WRITER_LOCK)
    stale = f"999999999 {lm._host()} 0"
    fresh = f"{os.getpid()} {lm._host()} {_time.time() + 3600:.3f}"
    with open(lock_path, "w") as f:
        f.write(stale)

    lock = _WriterLock(lk.path)
    orig_read = lock._read
    calls = {"n": 0}

    def racy_read():
        out = orig_read()
        calls["n"] += 1
        # after the waiter reads the stale owner, the "faster waiter" breaks
        # the lock and installs a fresh one before this waiter acts
        if calls["n"] == 1:
            with open(lock_path, "w") as f:
                f.write(fresh)
        return out

    lock._read = racy_read
    with pytest.raises(ConcurrentWriterError):
        lock.__enter__()
    # the fresh (live) lock survived the attempted break
    assert open(lock_path).read() == fresh
    os.remove(lock_path)


def test_l0_run_pruning_metadata(tmp_path):
    """L0 manifest entries record which buckets each run contains, and a
    partition read opens ONLY runs that can contain its bucket."""
    from raycdc.util import bucket_of

    P = 8
    lk = LakeTable(str(tmp_path / "lake"), num_partitions=P, commit_mode="l0")
    lk.init()
    # craft keys whose buckets are known, split into two disjoint-bucket blocks
    keys = [f"doc-{i:04d}" for i in range(200)]
    b = bucket_of(pa.array(keys), P)
    lo = [k for k, bb in zip(keys, b) if bb < 4][:20]
    hi = [k for k, bb in zip(keys, b) if bb >= 4][:20]
    assert lo and hi

    def events_for(ids, lsn0):
        n = len(ids)
        return pa.table(
            {
                "lsn": pa.array(range(lsn0, lsn0 + n), type=pa.int64()),
                "op": ["insert"] * n,
                "doc_id": ids,
                "tokens": pa.array([[1]] * n, type=pa.list_(pa.int32())),
                "n_tok": pa.array([1] * n, type=pa.int32()),
                "source": ["web"] * n,
            }
        )

    lk.apply(rd.from_arrow(events_for(lo, 1)), ["s-lo"], batch_size=256)
    lk.apply(rd.from_arrow(events_for(hi, 100)), ["s-hi"], batch_size=256)
    m = lk.manifest()
    assert len(m["l0"]) == 2
    for ent in m["l0"]:
        assert ent["bmin"] <= ent["bmax"] and ent["buckets"] is not None
    lo_buckets = set(bucket_of(pa.array(lo), P).tolist())
    hi_buckets = set(bucket_of(pa.array(hi), P).tolist())
    descs = {d["pid"]: d for d in lk._descriptors(m)}
    import json as _json

    lo_file = next(e["file"] for e in m["l0"] if set(e["buckets"]) == lo_buckets)
    hi_file = next(e["file"] for e in m["l0"] if set(e["buckets"]) == hi_buckets)
    for pid in lo_buckets:
        files = _json.loads(descs[pid]["l0"])
        assert lo_file in files and hi_file not in files
    for pid in hi_buckets:
        files = _json.loads(descs[pid]["l0"])
        assert hi_file in files and lo_file not in files
    # untouched partitions get no descriptor at all
    assert set(descs) == lo_buckets | hi_buckets
    assert collect(lk.read()).num_rows == len(lo) + len(hi)


def test_l0_duplicate_block_content_counted_once(tmp_path):
    """Two input blocks with identical content produce ONE run file and
    ONE manifest entry (not a double-fold)."""
    lk = LakeTable(str(tmp_path / "lake"), num_partitions=4, commit_mode="l0")
    lk.init()
    ev = _one_event()
    dup = rd.from_arrow(ev).union(rd.from_arrow(ev))  # 2 identical blocks
    r = lk.apply(dup, ["s1"], batch_size=256)
    m = lk.manifest()
    assert len(m["l0"]) == 1
    assert r["events_after_reduce"] == 1
    got = collect(lk.read())
    assert got.num_rows == 1


def test_vacuum_removes_unreferenced_epochs(lake, tmp_path):
    base, log_dir, _ = make_log(tmp_path, seed=43, n_segments=3)
    seeded_lake(lake, base)
    tail_until_caught_up(lake, log_dir, max_segments_per_epoch=1, batch_size=256)
    # delta epochs keep every file referenced; compaction supersedes them
    lake.compact()
    state_root = os.path.join(lake.path, "state")
    before = sum(len(fs) for _, _, fs in os.walk(state_root))
    removed = lake.vacuum(keep_epochs=1)
    after = sum(len(fs) for _, _, fs in os.walk(state_root))
    assert removed and after == before - len(removed)
    # the referenced (current) files all survive and the table still reads
    assert collect(lake.read()).num_rows > 0


def test_tail_forever_picks_up_segments_mid_run(tmp_path):
    """The continuous watch loop (ListenDICOM push analog): segments
    appended WHILE the tailer runs become incremental epochs without a
    restart; the loop exits once idle for idle_timeout_s."""
    from raycdc.tailer import tail_forever

    lk = LakeTable(str(tmp_path / "lake"), num_partitions=4, commit_mode="l0")
    lk.init()
    cfg = EventGenConfig(n_events=300, n_base=40, seed=11, min_len=4, max_len=8)
    log_dir = str(tmp_path / "log")
    write_changelog(log_dir, cfg, n_segments=2)
    base = base_table(40, seed=11, min_len=4, max_len=8)
    seeded_lake(lk, base)

    watcher = tail_forever(
        lk, log_dir, poll_s=0.05, idle_timeout_s=0.3,
        max_segments_per_epoch=1, batch_size=256,
    )
    epochs = []
    late_written = False
    for r in watcher:
        epochs.append(r)
        if not late_written:
            # a segment arrives mid-run, after the watcher already started
            late = EventGenConfig(n_events=100, n_base=40, seed=11, min_len=4,
                                  max_len=8, lsn_offset=300)
            _write = write_changelog(str(tmp_path / "late"), late, n_segments=1)
            os.rename(_write[0], os.path.join(log_dir, "seg-00099.parquet"))
            late_written = True
    assert len(epochs) == 3  # 2 initial + 1 late segment
    assert len(lk.manifest()["segments_applied"]) == 4  # __base__ + 3
    all_events = pa.concat_tables(
        [pq.read_table(os.path.join(log_dir, f)) for f in sorted(os.listdir(log_dir))]
    )
    assert_eq(collect(lk.read()), fold_events(base, all_events))


def test_l0_auto_compaction_bounds_fan_in(tmp_path):
    """L0 mode: pending run files trigger an auto-compaction that folds
    them into per-partition bases (manifest l0 clears), and the folded
    state still matches the oracle."""
    lk = LakeTable(str(tmp_path / "lake"), num_partitions=4, commit_mode="l0",
                   l0_compact_files=3)
    lk.init()
    base, log_dir, all_events = make_log(tmp_path, seed=47, n_segments=5)
    seeded_lake(lk, base)
    res = tail_until_caught_up(lk, log_dir, max_segments_per_epoch=1, batch_size=256)
    assert len(res) == 5
    assert any(r.get("auto_compacted") for r in res)
    m = lk.manifest()
    assert len(m["l0"]) <= 3 + 5  # bounded fan-in (epochs since last compaction)
    assert any(ent.get("base") for ent in m["partitions"].values())
    assert_eq(collect(lk.read()), fold_events(base, all_events))
    # explicit compaction clears every pending run
    lk.compact()
    assert lk.manifest()["l0"] == []
    assert_eq(collect(lk.read()), fold_events(base, all_events))


def test_time_travel_read_epochs(lake, tmp_path):
    """read(epoch=E) reproduces the exact table state at each committed
    epoch; vacuum(keep_epochs) reclaims old snapshots AND keeps the state
    files retained snapshots still reference."""
    from raycdc.synth import is_malformed_mask

    base, log_dir, all_events = make_log(tmp_path, seed=47, n_segments=3)
    seeded_lake(lake, base)
    tail_until_caught_up(lake, log_dir, max_segments_per_epoch=1, batch_size=256)
    epochs = lake.epochs()
    assert lake.manifest()["epoch"] in epochs and len(epochs) >= 4  # init + base + 3 tails
    # replay the golden fold cut at each epoch's applied segments
    segs = sorted(f for f in os.listdir(log_dir))
    for n_applied in range(len(segs) + 1):
        epoch = 1 + n_applied  # epoch 1 = base seed
        expected = fold_events(
            base,
            pa.concat_tables(
                [pq.read_table(os.path.join(log_dir, f)) for f in segs[:n_applied]]
            ) if n_applied else all_events.slice(0, 0),
        )
        got = collect(lake.read(epoch=epoch))
        assert_eq(got, expected)
    # unknown epoch → LookupError with guidance
    with pytest.raises(LookupError):
        lake.manifest(epoch=9999)
    # retention: keep 2 snapshots; older epochs become unreadable, newest
    # retained old epoch still replays exactly
    lake.vacuum(keep_epochs=2)
    kept = lake.epochs()
    assert len(kept) == 2 and kept[-1] == lake.manifest()["epoch"]
    with pytest.raises(LookupError):
        lake.manifest(epoch=epochs[0])
    again = collect(lake.read(epoch=kept[0]))
    n_applied = kept[0] - 1
    expected = fold_events(
        base,
        pa.concat_tables(
            [pq.read_table(os.path.join(log_dir, f)) for f in segs[:n_applied]]
        ) if n_applied else all_events.slice(0, 0),
    )
    assert_eq(again, expected)


def test_compact_zorder_clusters_rowgroups_and_preserves_state(tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    from raycdc.lake import LakeTable

    rng = np.random.default_rng(3)
    n = 20000
    ev = pa.table({
        "lsn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "op": pa.array(["insert"] * n),
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "a": pa.array(rng.integers(0, 10000, n).astype(np.int64)),
        "b": pa.array(rng.integers(0, 10000, n).astype(np.int64)),
    })
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2, key="doc_id")
    lake.init()
    lake.apply(rd.from_arrow(ev), ["s0"])
    lake.compact(zorder=["a", "b"])
    # state unchanged by the re-clustering
    t = pa.concat_tables(
        list(lake.read().iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="permissive",
    ).sort_by("doc_id")
    assert t.num_rows == n
    assert t["a"].combine_chunks().equals(ev["a"].combine_chunks())
    # clustered base: row-group stats on BOTH columns are selective
    m = lake.manifest()
    frac = []
    for ent in m["partitions"].values():
        f = os.path.join(lake.path, ent["base"])
        md = pq.ParquetFile(f).metadata
        for col in ("a", "b"):
            ci = md.schema.to_arrow_schema().get_field_index(col)
            touched = 0
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is None or (st.min <= 500 and st.max >= 0):
                    touched += 1
            frac.append(touched / md.num_row_groups)
    # without clustering every row group of a random column overlaps a
    # 5% range; z-ordered bases must skip some on BOTH columns
    assert any(f < 1.0 for f in frac), frac


@pytest.mark.parametrize("mode", ["l0", "shuffle"])
def test_midepoch_task_failure_then_rerun_commits_once(tmp_path, mode):
    """Mid-epoch WRITE failure (VERDICT r3 §7): a worker task dies after
    sibling tasks have already written state files for the epoch, before
    the driver's take_all() returns. The manifest must not advance; the
    clean re-run must commit exactly once; in L0 mode the content-derived
    run names make the rewrite overwrite (not duplicate) any orphans, so
    the epoch directory ends with exactly the manifest-referenced files."""
    import glob as _glob
    import time as _time

    base, log_dir, all_events = make_log(tmp_path, seed=41, n_segments=2)
    lk = LakeTable(str(tmp_path / f"lake_{mode}"), num_partitions=8, commit_mode=mode)
    lk.init()
    seeded_lake(lk, base)
    epoch0 = lk.manifest()["epoch"]

    segs = sorted(os.listdir(log_dir))
    ev = rd.read_parquet([os.path.join(log_dir, s) for s in segs])
    valid = ev.map_batches(
        lambda t: t.filter(pa.array(~is_malformed_mask(t))), batch_format="pyarrow"
    )

    poison_key = valid.take(1)[0]["doc_id"]

    def poison(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if pc.any(pc.equal(t["doc_id"], poison_key)).as_py():
            _time.sleep(1.0)  # let sibling tasks write their files first
            raise OSError("simulated mid-epoch worker failure")
        return t

    # small batches => many tasks => siblings complete before the poison
    with pytest.raises(Exception):
        lk.apply(valid.map_batches(poison, batch_format="pyarrow", batch_size=64),
                 segs, batch_size=64)
    assert lk.manifest()["epoch"] == epoch0  # commit point never reached
    orphans = _glob.glob(os.path.join(lk.path, "state", "*", "*.parquet"))
    assert orphans, "precondition: some state files were written mid-epoch"

    # clean re-run commits exactly once and converges
    r = lk.apply(valid, segs, batch_size=64)
    assert r.get("noop") is not True
    assert lk.manifest()["epoch"] == epoch0 + 1
    assert_eq(collect(lk.read()), fold_events(base, all_events))
    # idempotence: the same segments again are a no-op
    assert lk.apply(valid, segs, batch_size=64).get("noop") is True

    if mode == "l0":
        # content-named rewrite: every file in the epoch dirs is referenced
        # by the manifest (orphans were overwritten, never duplicated)
        referenced = {e["file"] for e in lk.manifest().get("l0", [])}
        for ent in lk.manifest()["partitions"].values():
            b = ent.get("base")
            if b:
                referenced.add(b)
            referenced.update(ent.get("deltas") or [])
        on_disk = {
            os.path.relpath(p, lk.path)
            for p in _glob.glob(os.path.join(lk.path, "state", "*", "*.parquet"))
        }
        assert on_disk == referenced, (
            f"orphan/duplicate run files: {sorted(on_disk - referenced)}"
        )


@pytest.mark.parametrize("mode", ["l0", "shuffle"])
def test_tail_forever_concurrent_writer(tmp_path, mode):
    """Concurrent-writer ingest (VERDICT r4 §8 — the ListenDICOM
    create-commit-rollback analog, `ListenDICOM.java:165-171`): a writer
    thread appends segments via the documented WAL-writer contract
    (write to a temp name, then ATOMIC rename into the log dir, names in
    append order) while tail_forever is replaying. Every segment must be
    applied exactly once across epochs — none lost, none double-applied —
    and the converged state must equal the serial fold of all events."""
    import shutil
    import threading
    import time as _time

    from raycdc.tailer import tail_forever

    base, staged_dir, all_events = make_log(tmp_path, seed=47, n_segments=6)
    # stage the full changelog elsewhere; the LIVE log dir starts with
    # only the first two segments (guarantees the tailer starts mid-stream)
    log_dir = str(tmp_path / "live_log")
    os.makedirs(log_dir)
    staged = sorted(os.listdir(staged_dir))
    assert len(staged) == 6

    def publish(name: str):
        tmp = os.path.join(log_dir, "." + name + ".tmp")
        shutil.copyfile(os.path.join(staged_dir, name), tmp)
        os.rename(tmp, os.path.join(log_dir, name))  # atomic commit

    for name in staged[:2]:
        publish(name)

    stop_err = []

    def writer():
        # exercises the library's publish_segment contract helper (the
        # copy+rename above is the same contract hand-rolled)
        from raycdc.tailer import publish_segment

        try:
            for name in staged[2:]:
                _time.sleep(0.25)
                publish_segment(log_dir, name,
                                pq.read_table(os.path.join(staged_dir, name)))
        except Exception as e:  # surfaces in the main thread's assert
            stop_err.append(e)

    lk = LakeTable(str(tmp_path / f"lake_{mode}"), num_partitions=8, commit_mode=mode)
    lk.init()
    seeded_lake(lk, base)

    th = threading.Thread(target=writer)
    th.start()
    try:
        epochs = list(
            tail_forever(lk, log_dir, poll_s=0.05, idle_timeout_s=3.0, batch_size=256)
        )
    finally:
        th.join()
    assert not stop_err, stop_err

    # exactly-once across epochs: the union of per-epoch segment lists is
    # disjoint and covers every published segment
    seen: list[str] = []
    for r in epochs:
        seen.extend(r["segments"])
    assert len(seen) == len(set(seen)), f"double-applied: {seen}"
    assert sorted(seen) == staged
    assert sorted(lk.manifest()["segments_applied"])[-6:] == staged
    # mid-run pickup actually happened (not one big final epoch)
    assert len(epochs) >= 2, [r["segments"] for r in epochs]
    # a dot-prefixed temp name must never be visible to the tailer
    assert not [f for f in os.listdir(log_dir) if f.startswith(".")]
    assert_eq(collect(lk.read()), fold_events(base, all_events))
