"""Flagship-pipeline end-to-end: cdc_replay vs the single-process oracle
fold, determinism across fresh lakes, and epoch-granularity equivalence
(the replay/resume gate of the north rule)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raycdc.pipelines import cdc_replay, ensure_synth_inputs
from raycdc.synth import base_table, fold_events


def collect(ds) -> pa.Table:
    t = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    return pa.concat_tables(t, promote_options="permissive") if t else pa.table({})


def canon(t: pa.Table) -> pa.Table:
    return t.select(sorted(t.column_names)).sort_by("doc_id").combine_chunks()


PARAMS = dict(n_base=800, n_events=4000, num_partitions=4, n_segments=4, min_len=4, max_len=12)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("cdc_e2e"))
    base_dir, log_dir = ensure_synth_inputs(
        work, PARAMS["n_base"], PARAMS["n_events"], PARAMS["n_segments"],
        min_len=PARAMS["min_len"], max_len=PARAMS["max_len"],
    )
    base = base_table(PARAMS["n_base"], seed=42, min_len=PARAMS["min_len"], max_len=PARAMS["max_len"])
    events = pa.concat_tables(
        [pq.read_table(os.path.join(log_dir, f)) for f in sorted(os.listdir(log_dir))]
    )
    return work, canon(fold_events(base, events))


def test_cdc_replay_matches_oracle(golden):
    work, gold = golden
    out = canon(collect(cdc_replay(None, work_root=work, **PARAMS)))
    assert out.num_rows == gold.num_rows
    for c in gold.column_names:
        assert out[c].cast(gold[c].type).combine_chunks().equals(gold[c].combine_chunks()), c


def test_cdc_replay_deterministic_and_epoch_invariant(golden):
    """Fresh lake, different epoch granularity (1 segment per epoch ==
    checkpoint-resume at every segment) → byte-identical logical table."""
    work, gold = golden
    a = canon(collect(cdc_replay(None, work_root=work, segments_per_epoch=1, **PARAMS)))
    for c in gold.column_names:
        assert a[c].cast(gold[c].type).combine_chunks().equals(gold[c].combine_chunks()), c


def test_curate_sample_write_partitioned_roundtrip(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raycdc.ops import weighted_sample
    from raycdc.pipelines import curate_sample_write, curate_text

    rng = np.random.default_rng(1801)
    en = "the and of to a in is it that for " * 12
    fr = "le la de et un une les des est que " * 12
    texts = [en + f" doc{i}" if i % 3 else fr + f" doc{i}" for i in range(120)]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(120)]),
            "text": pa.array(texts),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    out_dir = str(tmp_path / "curated")
    got = curate_sample_write(
        rd.from_arrow(t).repartition(3), out_dir,
        lang="en", min_quality=0.0, weight_div=50, partition_col="lang_pred",
    ).to_pandas()

    # round-trip equals the in-memory pipeline result
    cur = curate_text(rd.from_arrow(t), lang="en", min_quality=0.0)
    import pyarrow.compute as pc
    cur = cur.map_batches(
        lambda b: b.append_column(
            "w",
            pc.min_element_wise(
                pa.scalar(16, pa.int64()), pc.divide(b["n_chars"].cast(pa.int64()), 50)
            ),
        ),
        batch_format="pyarrow",
    )
    want = weighted_sample(cur, "doc_id", "w").to_pandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    assert len(got) > 0
    # hive layout: one directory per partition value
    import os
    parts = [d for d in os.listdir(out_dir) if d.startswith("lang_pred=")]
    assert parts == ["lang_pred=en"]
    # rerun reproduces the identical row set (content-addressed sample)
    out2 = curate_sample_write(
        rd.from_arrow(t).repartition(5), str(tmp_path / "curated2"),
        lang="en", min_quality=0.0, weight_div=50, partition_col="lang_pred",
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(got["doc_id"])
