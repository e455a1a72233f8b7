"""Scale-conscious relational building blocks used by the query surface.

These encode the shuffle-minimizing patterns the engine standardizes on
(SURVEY.md §4, ray_guide "Aggregation at scale"):

* :func:`partial_groupby_agg` — combiner-style aggregation: a vectorized
  per-batch ``pyarrow.Table.group_by`` partial reduce inside
  ``map_batches`` (one row per key per batch), then a small global
  ``groupby().aggregate`` over the partials. The all-to-all exchange
  moves O(keys × batches), not O(rows).
* :func:`broadcast_lookup` / :func:`broadcast_membership` — the small-
  side join: ``ray.put`` once, ``ray.get`` per actor/task, vectorized
  pandas/numpy lookup per batch. No shuffle (reference analog: identity
  CSV ConcurrentHashMap, J1/J3).
* :func:`grouped_min_broadcast` — the grouped-min-then-map pattern
  (date-shift machinery analog, A3/M10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

# partial kernel → (pyarrow group_by agg, final ray aggregate, merge fn name)
_COMBINERS = {
    "min": ("min", Min),
    "max": ("max", Max),
    "sum": ("sum", Sum),
    "count": ("count", Sum),  # counts combine by summing
}


def partial_groupby_agg(
    ds: ray.data.Dataset,
    key: str | list[str],
    specs: dict[str, tuple[str, str]],
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """``specs``: out_col -> (in_col, kernel) with kernel in
    min|max|sum|count. Example::

        partial_groupby_agg(ev, "user_id",
                            {"first_lsn": ("event_id", "min"),
                             "n_events": ("event_id", "count")})
    """
    keys = [key] if isinstance(key, str) else list(key)
    for out, (col, kern) in specs.items():
        if kern not in _COMBINERS:
            raise ValueError(f"unsupported kernel {kern!r}")

    def partial(t: pa.Table) -> pa.Table:
        aggs = []
        renames = {}
        for out, (col, kern) in specs.items():
            pa_kern = _COMBINERS[kern][0]
            if kern == "count":
                # count(*) semantics: count nulls too (pyarrow defaults to
                # valid-only, which would silently diverge from the SQL
                # oracles on nullable columns)
                aggs.append((col, pa_kern, pc.CountOptions(mode="all")))
            else:
                aggs.append((col, pa_kern))
            renames[f"{col}_{pa_kern}"] = out
        g = t.group_by(keys).aggregate(aggs)
        names = [renames.get(n, n) for n in g.column_names]
        return g.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    finals = [
        _COMBINERS[kern][1](out, alias_name=out) for out, (_, kern) in specs.items()
    ]
    return partials.groupby(keys).aggregate(*finals)


def broadcast_membership(
    ds: ray.data.Dataset,
    key: str,
    members,
    out_col: str = "matched",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Semi/anti-join by broadcast key set: adds a boolean column.
    ``members`` may be a set/array or an ObjectRef of one."""
    ref = members if isinstance(members, ray.ObjectRef) else ray.put(np.asarray(sorted(members)))

    class Member:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = t[key].to_numpy(zero_copy_only=False)
            return t.append_column(out_col, pa.array(np.isin(v, self.keys)))

    return ds.map_batches(Member, batch_format="pyarrow", batch_size=batch_size, concurrency=2)


def broadcast_lookup(
    ds: ray.data.Dataset,
    key: str,
    mapping: dict,
    out_col: str,
    default=None,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Broadcast hash join (small side): map ``key`` through ``mapping``
    into ``out_col`` (vectorized pandas map per batch)."""
    ref = ray.put(pd.Series(mapping))

    class Lookup:
        def __init__(self):
            self.s = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = t[key].to_pandas()
            got = v.map(self.s)
            if default is not None:
                got = got.fillna(default)
            return t.append_column(out_col, pa.Array.from_pandas(got))

    return ds.map_batches(Lookup, batch_format="pyarrow", batch_size=batch_size, concurrency=2)


def grouped_shift_from_min(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    out_col: str,
    num_buckets: int = 64,
    batch_size: int = 65536,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """High-cardinality grouped-min-then-shift (the date-shift pattern,
    M10/A3) WITHOUT a driver-side dict: ONE hash-bucket shuffle
    (bounded fan-out — ``num_buckets`` groups, never one group per key),
    then a vectorized pandas ``groupby(...).transform('min')`` inside
    each bucket. Use this when the key domain exceeds
    :func:`grouped_min_broadcast`'s driver bound."""
    from raycdc.util import bucket_of

    def stamp(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(bucket_of(t.column(key), num_buckets)))

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["_bucket"]).to_pandas()
        df[out_col] = df[col] - df.groupby(key)[col].transform("min")
        if keep_cols:
            df = df[keep_cols]
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(stamp, batch_format="pyarrow", batch_size=batch_size)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def flatten_struct(
    ds: ray.data.Dataset,
    col: str,
    prefix: str = "",
    keep: bool = False,
    stringify: bool = False,
    max_len: int | None = None,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Promote every field of a struct column to a top-level column —
    the ExtractDICOMTags "extract ALL tags" mode (a): the reference's
    visitor stringifies every attribute into the FlowFile map, capped at
    200 chars (``ExtractDICOMTags.java:163-180``). ``stringify=True`` +
    ``max_len=200`` reproduces that contract; by default fields keep
    their native types. Fields of null struct rows surface as nulls."""

    def f(t: pa.Table) -> pa.Table:
        if col not in t.column_names:
            return t  # present-only no-op (schema tolerance)
        sc = t.column(col).combine_chunks()
        if not pa.types.is_struct(sc.type):
            return t
        null_mask = pc.is_null(sc) if sc.null_count else None
        for field in sc.type:
            arr = sc.field(field.name)
            if null_mask is not None:
                arr = pc.if_else(null_mask, pa.nulls(len(sc), type=arr.type), arr)
            if stringify:
                arr = arr.cast(pa.string())
                if max_len is not None:
                    arr = pc.utf8_slice_codeunits(arr, start=0, stop=max_len)
            t = t.append_column(f"{prefix}{field.name}", arr)
        if not keep:
            t = t.drop_columns([col])
        return t

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def grouped_min_broadcast(
    ds: ray.data.Dataset, key: str, col: str, batch_size: int = 65536,
    max_keys: int = 5_000_000,
) -> dict:
    """Per-key minimum as a driver-side dict (small key domain — the
    date-shift epoch pattern). Uses the partial-agg path so the shuffle
    is over per-batch partials only.

    Contract: the key domain must fit on the driver — ``max_keys`` bounds
    it explicitly (raises beyond). For doc_id-cardinality keys use
    ``partial_groupby_agg`` + a broadcast-join dataset path instead."""
    agg = partial_groupby_agg(ds, key, {"_min": (col, "min")}, batch_size=batch_size)
    out = {}
    for r in agg.iter_rows():
        out[r[key]] = r["_min"]
        if len(out) > max_keys:
            raise ValueError(
                f"grouped_min_broadcast: key domain exceeds max_keys={max_keys}; "
                "use a distributed broadcast-join path for high-cardinality keys"
            )
    return out
