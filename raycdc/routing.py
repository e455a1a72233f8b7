"""Validation + multi-way routing — the Relationship model of the
reference re-expressed as a route column plus predicate splits.

Reference: every processor routes each record to exactly one of
success / failure / not_matched / reject / "not decrypted"
(``DeidentifyDICOM.java:56-61``, ``PutDICOM.java:81-88``,
``DecryptReidentifyDICOM.java:48-53``); malformed input is detected by a
parse attempt whose failure diverts the record
(``DeidentifyDICOMTest.java:178-195``: 2 success + 1 reject).

Engine model: a vectorized validation stage stamps a ``_route`` column;
downstream consumers either filter one route (streaming-friendly, no
materialization) or ask for the route-count matrix (small aggregate).
The dead-letter dataset IS a first-class output, mirroring the
failure-relationship loop-back being "usually looped back" for retry
(``PutDICOM.java:83-86``) — dead-lettered events keep full payload so
they can be re-submitted after repair.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from raycdc.synth import is_malformed_mask

ROUTE_COL = "_route"
ROUTE_OK = "ok"
ROUTE_DEAD_LETTER = "dead_letter"
ROUTE_ORPHAN = "not_matched"

_VALID_OPS = ("insert", "update", "delete")


def stamp_route(batch: pa.Table) -> pa.Table:
    """Validation map: ok | dead_letter. Checks (all pyarrow.compute
    vectorized, no Python-object conversion): n_tok/token-length
    consistency, payload presence for non-deletes, known op, non-null
    key, non-null lsn."""
    bad = is_malformed_mask(batch)
    if "op" in batch.column_names:
        known = pc.is_in(batch["op"], value_set=pa.array(_VALID_OPS))
        bad |= pc.invert(pc.fill_null(known, False)).to_numpy(zero_copy_only=False)
    if "doc_id" in batch.column_names:
        bad |= pc.is_null(batch["doc_id"]).to_numpy(zero_copy_only=False)
    if "lsn" in batch.column_names:
        bad |= pc.is_null(batch["lsn"]).to_numpy(zero_copy_only=False)
    route = pc.if_else(
        pa.array(bad), pa.scalar(ROUTE_DEAD_LETTER), pa.scalar(ROUTE_OK)
    )
    if ROUTE_COL in batch.column_names:
        return batch.set_column(batch.column_names.index(ROUTE_COL), ROUTE_COL, route)
    return batch.append_column(ROUTE_COL, route)


def validate(ds: ray.data.Dataset, batch_size: int = 65536) -> ray.data.Dataset:
    return ds.map_batches(stamp_route, batch_format="pyarrow", batch_size=batch_size)


def take_route(ds: ray.data.Dataset, route: str, drop_route_col: bool = True) -> ray.data.Dataset:
    """One route as a streaming Dataset (predicate split; each call
    re-executes upstream — cache upstream with ``materialize()`` only if
    it is small)."""

    def pick(t: pa.Table) -> pa.Table:
        out = t.filter(pc.equal(t[ROUTE_COL], route))
        return out.drop_columns([ROUTE_COL]) if drop_route_col else out

    return ds.map_batches(pick, batch_format="pyarrow")


def route_counts(ds: ray.data.Dataset) -> dict[str, int]:
    """The routing matrix (small aggregate; reference analog: per-
    relationship assertion counts in the tests)."""
    out = ds.groupby(ROUTE_COL).count()
    return {r[ROUTE_COL]: r["count()"] for r in out.take_all()}


def split_valid(ds: ray.data.Dataset, batch_size: int = 65536):
    """Convenience: (ok_dataset, dead_letter_dataset) from a raw stream.
    NOTE: consuming both datasets executes the upstream twice; for the
    hot ingest path use :class:`ValidateAndDivert` (single pass)."""
    stamped = validate(ds, batch_size=batch_size)
    return take_route(stamped, ROUTE_OK), take_route(stamped, ROUTE_DEAD_LETTER)


class ValidateAndDivert:
    """Single-pass validation: dead-lettered rows are diverted to parquet
    side-files as they stream by; only valid rows continue down the
    pipeline. One pass over the input — the hot-path variant of
    :func:`split_valid`.

    The dead-letter stream is at-least-once (a retried task rewrites its
    rows under a new file name) — fine for a repair/diagnostics stream,
    mirroring the reference's failure-relationship loop-back semantics
    (``PutDICOM.java:83-86``).

    Stateless by design: prefer :func:`make_validator` (a plain function
    for ``map_batches``) on the hot path — task stages FUSE with
    adjacent task stages and use every core, while a callable class
    forces an actor pool (bounded concurrency + per-actor warmup and no
    fusion with the neighboring reduce stage).
    """

    def __init__(self, dead_letter_dir: str | None = None):
        self.fn = make_validator(dead_letter_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.fn(batch)


def make_validator(dead_letter_dir: str | None = None):
    """A stateless validate+divert batch fn (see :class:`ValidateAndDivert`)."""
    if dead_letter_dir:
        os.makedirs(dead_letter_dir, exist_ok=True)

    def validate_divert(batch: pa.Table) -> pa.Table:
        from raycdc.util import tune_allocators

        tune_allocators()
        stamped = stamp_route(batch)
        routes = stamped[ROUTE_COL]
        ok_mask = pc.equal(routes, ROUTE_OK)
        n_bad = batch.num_rows - pc.sum(ok_mask.cast(pa.int64())).as_py()
        if n_bad and dead_letter_dir:
            import uuid

            import pyarrow.parquet as pq

            os.makedirs(dead_letter_dir, exist_ok=True)  # remote worker may not have it
            dead = stamped.filter(pc.invert(ok_mask))
            pq.write_table(
                dead, os.path.join(dead_letter_dir, f"dead-{uuid.uuid4().hex[:12]}.parquet")
            )
        return stamped.filter(ok_mask).drop_columns([ROUTE_COL])

    return validate_divert
