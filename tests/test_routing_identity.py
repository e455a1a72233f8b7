"""Routing matrix + identity substitution (reference:
DeidentifyDICOM 3-way routing `DeidentifyDICOM.java:220-234`,
garbage routing `DeidentifyDICOMTest.java:178-195`,
pseudo-identity goldens `DeidentifyDICOMTest.java:128-176`)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raycdc.identity import (
    IdentitySubstitute,
    load_identity_map,
    name_based_uid,
    pseudo_id,
    substitute_identities,
)
from raycdc.routing import (
    ROUTE_COL,
    ROUTE_DEAD_LETTER,
    ROUTE_OK,
    ROUTE_ORPHAN,
    route_counts,
    split_valid,
    take_route,
    validate,
)
from raycdc.synth import EventGenConfig, base_table, events_table, is_malformed_mask


def test_route_matrix_counts():
    cfg = EventGenConfig(n_events=1000, n_base=100, seed=13, pct_malformed=0.1, min_len=4, max_len=8)
    ev = events_table(cfg)
    n_bad = int(is_malformed_mask(ev).sum())
    stamped = validate(rd.from_arrow(ev), batch_size=128)
    counts = route_counts(stamped)
    assert counts.get(ROUTE_DEAD_LETTER, 0) == n_bad
    assert counts.get(ROUTE_OK, 0) == 1000 - n_bad


def test_split_valid_roundtrip():
    cfg = EventGenConfig(n_events=500, n_base=50, seed=17, pct_malformed=0.2, min_len=4, max_len=8)
    ev = events_table(cfg)
    ok, dead = split_valid(rd.from_arrow(ev), batch_size=64)
    n_ok, n_dead = ok.count(), dead.count()
    assert n_ok + n_dead == 500
    # dead letters keep full payload for repair/re-submit
    assert set(dead.schema().names) == set(ev.column_names)


def test_bad_op_and_null_key_dead_lettered():
    t = pa.table(
        {
            "lsn": pa.array([1, 2, 3], type=pa.int64()),
            "op": ["upsert", "insert", "insert"],  # 'upsert' is unknown
            "doc_id": ["a", None, "c"],
            "tokens": pa.array([[1], [1], [1]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 1], type=pa.int32()),
            "source": ["web", "web", "web"],
        }
    )
    counts = route_counts(validate(rd.from_arrow(t)))
    assert counts[ROUTE_DEAD_LETTER] == 2 and counts[ROUTE_OK] == 1


def test_pseudo_id_deterministic_golden():
    a = pseudo_id(pa.array(["doc-00000001"]))[0].as_py()
    b = pseudo_id(pa.array(["doc-00000001"]))[0].as_py()
    assert a == b and a.startswith("anon-") and len(a) == 5 + 16
    assert name_based_uid(pa.array(["x"]))[0].as_py() == name_based_uid(pa.array(["x"]))[0].as_py()
    assert name_based_uid(pa.array(["x"]))[0].as_py() != name_based_uid(pa.array(["y"]))[0].as_py()


def test_identity_substitute_matched_and_generated():
    base = base_table(10, seed=7, min_len=4, max_len=8)
    ids = base["doc_id"].to_pylist()
    imap = {ids[0]: ("mapped-0", "books"), ids[1]: ("mapped-1", None)}
    stage = IdentitySubstitute(imap, generate_unmatched=True)
    out = stage(base)
    got = dict(zip(out["orig_doc_id"].to_pylist(), out["doc_id"].to_pylist()))
    assert got[ids[0]] == "mapped-0" and got[ids[1]] == "mapped-1"
    # unmatched got deterministic pseudo ids
    assert got[ids[2]] == pseudo_id(pa.array([ids[2]]))[0].as_py()
    # mapped source substitution only where provided
    src = dict(zip(out["orig_doc_id"].to_pylist(), out["source"].to_pylist()))
    assert src[ids[0]] == "books"
    assert src[ids[1]] == base["source"].to_pylist()[1]
    assert set(out[ROUTE_COL].to_pylist()) == {ROUTE_OK}


def test_identity_substitute_orphan_route():
    base = base_table(6, seed=7, min_len=4, max_len=8)
    ids = base["doc_id"].to_pylist()
    imap = {ids[0]: ("m0", None)}
    out = IdentitySubstitute(imap, generate_unmatched=False)(base)
    routes = dict(zip(out["orig_doc_id"].to_pylist(), out[ROUTE_COL].to_pylist()))
    assert routes[ids[0]] == ROUTE_OK
    assert all(routes[i] == ROUTE_ORPHAN for i in ids[1:])
    # orphans keep their original key (no substitution)
    got = dict(zip(out["orig_doc_id"].to_pylist(), out["doc_id"].to_pylist()))
    assert all(got[i] == i for i in ids[1:])


def test_identity_substitute_distributed_broadcast():
    base = base_table(100, seed=7, min_len=4, max_len=8)
    ids = base["doc_id"].to_pylist()
    imap = {i: ("m-" + i, None) for i in ids[:50]}
    ds = substitute_identities(rd.from_arrow(base).repartition(4), imap, concurrency=2, batch_size=32)
    out = {r["orig_doc_id"]: r["doc_id"] for r in ds.take_all()}
    assert all(out[i] == "m-" + i for i in ids[:50])
    assert all(out[i].startswith("anon-") for i in ids[50:])


def test_load_identity_map_skips_null_keys(tmp_path):
    t = pa.table({"doc_id": ["a", None], "new_doc_id": ["x", "y"], "new_source": ["s", None]})
    import pyarrow.parquet as pq

    p = str(tmp_path / "m.parquet")
    pq.write_table(t, p)
    m = load_identity_map(p)
    assert m == {"a": ("x", "s")}


def test_validate_schema_tolerant():
    """code-review regression: validation must not assume the tokens
    payload columns (generic CDC streams may lack them)."""
    t = pa.table(
        {
            "lsn": pa.array([1, 2], type=pa.int64()),
            "op": ["insert", "bogus"],
            "doc_id": ["a", "b"],
            "value": [1.0, 2.0],
        }
    )
    counts = route_counts(validate(rd.from_arrow(t)))
    assert counts == {ROUTE_OK: 1, ROUTE_DEAD_LETTER: 1}
