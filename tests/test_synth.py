"""Synthesizer determinism + oracle fold semantics (FIXTURES.md F1/F2/F5)."""

import numpy as np
import pyarrow as pa
import pytest

from raycdc.synth import (
    BASE_SCHEMA,
    EventGenConfig,
    base_table,
    events_table,
    fold_events,
    is_malformed_mask,
    with_replays_and_disorder,
)


def test_base_deterministic_and_slice_stable():
    full = base_table(100, seed=7)
    again = base_table(100, seed=7)
    assert full.equals(again)
    # slicing by row offset reproduces the same rows (parallelism-independence)
    part = base_table(30, seed=7, row_offset=50)
    assert full.slice(50, 30).equals(part)
    assert full.schema.equals(BASE_SCHEMA)


def test_base_invariants():
    t = base_table(200, seed=42, min_len=8, max_len=32)
    lens = t["tokens"].combine_chunks().value_lengths().to_numpy()
    assert (lens >= 8).all() and (lens <= 32).all()
    assert (t["n_tok"].to_numpy() == lens).all()
    assert set(t["source"].to_pylist()) <= {"web", "books", "code"}
    assert len(set(t["doc_id"].to_pylist())) == 200


def test_events_lsn_slicing_is_parallelism_independent():
    cfg = EventGenConfig(n_events=500, n_base=100, seed=3, min_len=4, max_len=16)
    full = events_table(cfg)
    a = events_table(cfg, lsn_lo=1, lsn_hi=251)
    b = events_table(cfg, lsn_lo=251, lsn_hi=501)
    assert pa.concat_tables([a, b]).equals(full)


def test_events_semantics():
    cfg = EventGenConfig(
        n_events=2000, n_base=100, seed=5, pct_malformed=0.05, min_len=4, max_len=16
    )
    ev = events_table(cfg)
    ops = np.asarray(ev["op"])
    # deletes carry no payload
    del_rows = ev.filter(pa.array(ops == "delete"))
    assert del_rows["tokens"].null_count == del_rows.num_rows
    assert del_rows["n_tok"].null_count == del_rows.num_rows
    # inserts mint fresh ids
    ins = ev.filter(pa.array(ops == "insert"))
    assert all(d.startswith("doc-new-") for d in ins["doc_id"].to_pylist())
    # malformed fraction close to the knob (only non-deletes can be malformed)
    bad = is_malformed_mask(ev)
    frac = bad.sum() / ev.num_rows
    assert 0.01 < frac < 0.08


def test_replays_and_disorder_preserve_multiset_plus_dups():
    cfg = EventGenConfig(n_events=300, n_base=50, seed=9, dup_replay_rate=0.1, min_len=4, max_len=8)
    ev = events_table(cfg)
    out = with_replays_and_disorder(ev, cfg)
    assert out.num_rows == 330
    # the original 300 lsns are all present
    assert set(ev["lsn"].to_pylist()) == set(out["lsn"].to_pylist())
    # not delivered in lsn order (shuffled)
    lsns = out["lsn"].to_numpy()
    assert not (np.diff(lsns) >= 0).all()


def test_fold_basics():
    base = base_table(4, seed=1, min_len=4, max_len=8)
    ids = base["doc_id"].to_pylist()
    ev = pa.table(
        {
            "lsn": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "op": pa.array(["update", "delete", "insert", "update", "delete"]),
            "doc_id": pa.array([ids[0], ids[1], "doc-new-1", "doc-new-1", "doc-missing"]),
            "tokens": pa.array([[9, 9], None, [1], [2, 2], None], type=pa.list_(pa.int32())),
            "n_tok": pa.array([2, None, 1, 2, None], type=pa.int32()),
            "source": pa.array(["code", None, "web", "web", None]),
        }
    )
    out = fold_events(base, ev)
    d = {r["doc_id"]: r for r in out.to_pylist()}
    assert d[ids[0]]["tokens"] == [9, 9]  # updated
    assert ids[1] not in d  # deleted
    assert d["doc-new-1"]["tokens"] == [2, 2]  # insert then update, LWW
    assert ids[2] in d and ids[3] in d  # untouched base rows survive
    assert "doc-missing" not in d  # delete of absent key is a no-op
    # idempotence: folding the same events again over the result is stable
    out2 = fold_events(base, pa.concat_tables([ev, ev]))
    assert out.equals(out2)


def test_fold_skips_malformed():
    base = base_table(2, seed=1, min_len=4, max_len=8)
    ids = base["doc_id"].to_pylist()
    ev = pa.table(
        {
            "lsn": pa.array([1], type=pa.int64()),
            "op": pa.array(["update"]),
            "doc_id": pa.array([ids[0]]),
            "tokens": pa.array([[1, 2]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3], type=pa.int32()),  # inconsistent → dead letter
            "source": pa.array(["web"]),
        }
    )
    out = fold_events(base, ev)
    assert out.equals(base.sort_by("doc_id"))
