"""Incremental materialized-view maintenance (raycdc/mv.py): after every
epoch the incrementally-refreshed view must equal a full recompute from
the converged lake state — across inserts, updates that MOVE a row
between groups, deletes, and duplicate replays of stale lsns. Both
commit modes."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raycdc.lake import LakeTable
from raycdc.mv import MaterializedAggregate


def _ev(rows):
    return pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows]),
        "doc_id": pa.array([r[2] for r in rows]),
        "grp": pa.array([r[3] for r in rows]),
        "cents": pa.array([r[4] for r in rows], pa.int64()),
    })


def _full(lake):
    t = pa.concat_tables(
        list(lake.read().iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="permissive",
    )
    if t.num_rows == 0:
        return {}
    g = t.group_by("grp").aggregate([("cents", "sum"), ("doc_id", "count")])
    return {
        g["grp"][i].as_py(): (g["cents_sum"][i].as_py(), g["doc_id_count"][i].as_py())
        for i in range(g.num_rows)
    }


def _view(mv_table):
    return {
        mv_table["grp"][i].as_py(): (
            mv_table["sum_cents"][i].as_py(), mv_table["n_docs"][i].as_py())
        for i in range(mv_table.num_rows)
    }


@pytest.mark.parametrize("mode", ["shuffle", "l0"])
def test_mv_incremental_equals_full_recompute(tmp_path, mode):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4, key="doc_id",
                     commit_mode=mode)
    lake.init()
    mv = MaterializedAggregate(
        lake, "grp", {"sum_cents": ("cents", "sum"), "n_docs": (None, "count")},
        str(tmp_path / "mv"),
    )

    epochs = [
        # e1: plain inserts across two groups
        [(1, "insert", "d1", "a", 100), (2, "insert", "d2", "a", 250),
         (3, "insert", "d3", "b", 40)],
        # e2: update d2 (value change), update d3 MOVING it b->a,
        #     delete d1, insert d4 in new group c
        [(4, "update", "d2", "a", 300), (5, "update", "d3", "a", 45),
         (6, "delete", "d1", "a", 0), (7, "insert", "d4", "c", 7)],
        # e3: duplicate replay of a STALE lsn for d2 (must lose the LWW
        #     fold and leave the view unchanged for d2), delete d4
        #     (group c disappears entirely), re-insert d1
        [(4, "update", "d2", "a", 999_999), (8, "delete", "d4", "c", 0),
         (9, "insert", "d1", "b", 11)],
    ]
    for i, rows in enumerate(epochs):
        lake.apply(rd.from_arrow(_ev(rows)), [f"seg-{i}"])
        got = _view(mv.refresh())
        want = _full(lake)
        assert got == want, (i, got, want)
    # group c must be gone, not zero-stamped
    assert "c" not in got
    # idempotent re-refresh at the same epoch
    assert _view(mv.refresh()) == want
    assert mv.epoch() == int(lake.manifest()["epoch"])


def test_mv_falls_back_to_full_recompute_after_vacuum(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2, key="doc_id")
    lake.init()
    mv = MaterializedAggregate(
        lake, "grp", {"sum_cents": ("cents", "sum")}, str(tmp_path / "mv"))
    lake.apply(rd.from_arrow(_ev([(1, "insert", "d1", "a", 5)])), ["s0"])
    mv.refresh()
    lake.apply(rd.from_arrow(_ev([(2, "insert", "d2", "b", 6)])), ["s1"])
    lake.apply(rd.from_arrow(_ev([(3, "insert", "d3", "b", 7)])), ["s2"])
    lake.vacuum(keep_epochs=1)  # drops the snapshots the delta path needs
    t = mv.refresh()
    got = {t["grp"][i].as_py(): t["sum_cents"][i].as_py()
           for i in range(t.num_rows)}
    assert got == {g: v[0] for g, v in _full(lake).items()}
    assert mv.epoch() == int(lake.manifest()["epoch"])


def test_lineage_traces_segments_and_files(tmp_path):
    from raycdc.lake import lineage

    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2, key="doc_id")
    lake.init()
    lake.apply(rd.from_arrow(_ev([(1, "insert", "d1", "a", 5),
                                  (2, "insert", "d2", "b", 6)])), ["segA"])
    lake.apply(rd.from_arrow(_ev([(3, "update", "d1", "a", 9)])), ["segB"])
    rows = lineage(lake)
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    # epoch 1 fed by segA, epoch 2 by segB; every epoch-2 row carries
    # the new watermark and at least one added state file
    assert any("segA" in r["segments"] for r in by_epoch[1])
    e2 = [r for r in by_epoch[2] if r["files_added"]]
    assert e2 and all(r["segments"] == ["segB"] for r in e2)
    assert all(r["watermark"] >= 3 for r in e2 if r["watermark"] is not None)
    # pid filter returns only that partition's rows
    touched = next(r["pid"] for r in rows if r["pid"] is not None)
    only = lineage(lake, pid=touched)
    assert only and all(r["pid"] == touched for r in only)
