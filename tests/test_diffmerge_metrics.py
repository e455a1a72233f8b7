"""Round-trip diff/merge + envelope + conflict policy + metrics actor.

Reference analogs: round-trip inverse property
(`DeidentifyEncryptDICOMTest.java:97-123`), envelope decryptability
(`:38-95`), conflict policy (`:125-158`), cache-stats JSON
(`LogCacheStatistics.java:49-61`).
"""

import pyarrow as pa
import ray.data as rd

from raycdc.diffmerge import (
    CHANGESET_COL,
    ROUTE_NOT_DECRYPTED,
    DecryptReidentify,
    DeidentifyEncrypt,
    apply_changeset,
    compute_changeset,
    seal,
    unseal,
)
from raycdc.metrics import Metrics, count_rows
from raycdc.rules import RuleSet
from raycdc.routing import ROUTE_OK
from raycdc.synth import base_table


RULES = RuleSet.from_config(
    {
        "rules": [
            {"column": "source", "action": "replace", "value": "redacted"},
            {"column": "tokens", "action": "map", "fn": "drop_first_k", "k": 2},
            {"column": "n_tok", "action": "derive", "fn": "recompute_len", "on": "tokens"},
        ]
    }
)


def test_seal_unseal_roundtrip_and_determinism():
    blob = seal(b"payload", "pw", iterations=10)
    assert unseal(blob, "pw", iterations=10) == b"payload"
    assert unseal(blob, "WRONG", iterations=10) is None  # not-decrypted route
    assert seal(b"payload", "pw", iterations=10) == blob  # replay-stable


def test_changeset_roundtrip_plain():
    base = base_table(20, seed=6, min_len=4, max_len=8)
    enc = compute_changeset(base, RULES(base))
    assert CHANGESET_COL in enc.column_names
    # transformed values actually differ
    assert set(enc["source"].to_pylist()) == {"redacted"}
    dec = apply_changeset(enc)
    assert set(dec["_route"].to_pylist()) == {ROUTE_OK}
    restored = dec.select(base.column_names).cast(base.schema).sort_by("doc_id")
    assert restored.equals(base.sort_by("doc_id"))


def test_changeset_roundtrip_sealed_distributed():
    base = base_table(30, seed=8, min_len=4, max_len=8)
    ds = rd.from_arrow(base).map_batches(
        DeidentifyEncrypt,
        fn_constructor_kwargs={"ruleset": RULES, "password": "pw", "iterations": 10},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    dec = ds.map_batches(
        DecryptReidentify,
        fn_constructor_kwargs={"password": "pw", "iterations": 10},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    out = pa.concat_tables(
        list(dec.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="permissive",
    )
    assert set(out["_route"].to_pylist()) == {ROUTE_OK}
    restored = out.select(base.column_names).cast(base.schema).sort_by("doc_id")
    assert restored.equals(base.sort_by("doc_id"))


def test_wrong_password_routes_not_decrypted():
    base = base_table(5, seed=9, min_len=4, max_len=8)
    enc = compute_changeset(base, RULES(base), password="pw", iterations=10)
    dec = apply_changeset(enc, password="nope", iterations=10)
    assert set(dec["_route"].to_pylist()) == {ROUTE_NOT_DECRYPTED}
    # payload left as-is (still deidentified)
    assert set(dec["source"].to_pylist()) == {"redacted"}


def test_conflict_policy_reject_vs_accept_new():
    base = base_table(4, seed=10, min_len=4, max_len=8)
    enc = compute_changeset(base, RULES(base))
    # mutate the key after sealing (the new-series scenario)
    i = enc.column_names.index("doc_id")
    enc2 = enc.set_column(i, "doc_id", pa.array([f"moved-{k}" for k in range(enc.num_rows)]))
    rej = apply_changeset(enc2, accept_new=False)
    assert set(rej["_route"].to_pylist()) == {ROUTE_NOT_DECRYPTED}
    acc = apply_changeset(enc2, accept_new=True)
    assert set(acc["_route"].to_pylist()) == {ROUTE_OK}
    # accept-as-new preserves the CURRENT keys but restores payload
    assert acc["doc_id"].to_pylist() == [f"moved-{k}" for k in range(enc.num_rows)]
    assert acc.select(["tokens"]).cast(pa.schema([("tokens", pa.list_(pa.int32()))]))[
        "tokens"
    ].to_pylist() == base["tokens"].to_pylist()


def test_metrics_actor_counts_rows():
    m = Metrics("test_metrics")
    m.reset()
    ds = rd.from_arrow(base_table(100, seed=12, min_len=4, max_len=8))
    ds = count_rows(ds, "seen", metrics_name="test_metrics", batch_size=32)
    assert ds.count() == 100
    stats = m.stats()
    assert stats.get("seen") == 100


def test_metrics_dump_json(tmp_path):
    m = Metrics("test_metrics2")
    m.incr("applied", 7)
    import time

    time.sleep(0.2)  # fire-and-forget incr
    p = str(tmp_path / "stats.json")
    s = m.dump_json(p)
    import json

    assert json.load(open(p)) == s and s["applied"] == 7


def test_apply_changeset_empty_batch_keeps_schema():
    # code-review regression: from_pylist([]) collapses the schema
    base = base_table(3, seed=6, min_len=4, max_len=8)
    enc = compute_changeset(base, RULES(base)).slice(0, 0)
    out = apply_changeset(enc)
    assert out.num_rows == 0
    assert set(out.column_names) == set(base.column_names) | {"_route"}


def test_lww_apply_publishes_index_counters():
    """LogCacheStatistics parity (DeidentificationController.java:102,171-174):
    a metered lww_apply publishes partial/fold/keys/superseded/tombstone
    counters whose invariants are checkable exactly on a fixture replay."""
    from raycdc.apply import lww_apply

    keys = [f"k{i}" for i in range(10)]
    rows = {"doc_id": [], "lsn": [], "op": [], "v": []}
    for k in keys:
        for lsn in (1, 2, 3):
            rows["doc_id"].append(k)
            rows["lsn"].append(lsn)
            rows["op"].append("upsert")
            rows["v"].append(f"{k}@{lsn}")
    for k in keys[:2]:  # tombstone is the global last writer for k0, k1
        rows["doc_id"].append(k)
        rows["lsn"].append(4)
        rows["op"].append("delete")
        rows["v"].append("")
    ev = pa.table({"doc_id": rows["doc_id"],
                   "lsn": pa.array(rows["lsn"], type=pa.int64()),
                   "op": rows["op"], "v": rows["v"]})

    m = Metrics("test_apply_metrics")
    m.reset()
    out = lww_apply(rd.from_arrow(ev), key="doc_id", num_buckets=4,
                    metrics_name="test_apply_metrics")
    assert out.count() == 8  # 10 keys - 2 tombstoned
    s = m.stats_stable()
    assert s["apply.partial_rows_in"] == 32
    # level-1 output == level-2 input (the bucket stamp adds no rows)
    assert s["apply.partial_rows_out"] == s["apply.fold_rows_in"]
    assert s["apply.keys_out"] == 8
    assert s["apply.tombstones_dropped"] == 2
    # winners = keys_out + tombstones; everything else was superseded
    winners = s["apply.fold_rows_in"] - s["apply.rows_superseded"]
    assert winners == 10
    assert s["apply.buckets_folded"] >= 1


def test_lake_apply_publishes_epoch_counters(tmp_path):
    """Driver-side lake epoch counters: published from stats already in
    hand at commit, so the apply tasks pay nothing."""
    from raycdc.apply import base_as_inserts
    from raycdc.lake import LakeTable

    m = Metrics("test_lake_metrics")
    m.reset()
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4,
                     metrics_name="test_lake_metrics")
    lake.init()
    base = base_table(50, seed=3, min_len=4, max_len=8)
    lake.apply(base_as_inserts(rd.from_arrow(base)), ["__base__"])
    s = m.stats_stable()
    assert s["lake.epochs_committed"] == 1
    assert s["lake.events_after_reduce"] == 50
    assert s["lake.partitions_touched"] >= 1
    assert s["lake.keys_live"] == 50  # first epoch compacts every partition
