"""Local mirror of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side and compare row count, schema,
Arrow column TYPES, and order-insensitive values.

The type check is the part the round-3 mirror missed: DuckDB's integer
``sum()`` returns HUGEINT, which arrives as Arrow ``decimal128(38,0)``
against an engine ``int64`` — values equal, driver hash not. Both sides
are therefore fetched as Arrow and compared type-first; pandas ``.df()``
(which silently coerces HUGEINT) is never used for the oracle.

Type normalization is limited to differences the driver's hash provably
tolerates (string/large_string width, timestamp unit); any numeric-kind
divergence (decimal vs int, int vs float, int32 vs int64) FAILS.

Usage: PYTHONPATH=. python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_arrow(res) -> pa.Table:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        tables = list(res.iter_batches(batch_size=None, batch_format="pyarrow"))
        res = (
            pa.concat_tables(tables, promote_options="permissive")
            if tables
            else pa.table({})
        )
    if isinstance(res, pd.DataFrame):
        res = pa.Table.from_pandas(res, preserve_index=False)
    return res


def norm_type(t: pa.DataType) -> pa.DataType:
    """Collapse only the distinctions the driver's value hash tolerates."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return pa.string()
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return pa.binary()
    if pa.types.is_timestamp(t):
        return pa.timestamp("us", tz=t.tz)
    if pa.types.is_date(t):
        return pa.date32()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(norm_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, norm_type(f.type)) for f in t])
    if pa.types.is_dictionary(t):
        return norm_type(t.value_type)
    return t


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, at: pa.Table, bt: pa.Table) -> list[str]:
    problems = []
    acols = sorted(at.column_names)
    bcols = sorted(bt.column_names)
    if acols != bcols:
        return [f"schema mismatch: ray={acols} oracle={bcols}"]
    # Type-exact gate: decimal128 vs int64, int vs float, int32 vs int64
    # all FAIL here even when the values match.
    for c in acols:
        ta = norm_type(at.schema.field(c).type)
        tb = norm_type(bt.schema.field(c).type)
        if ta != tb:
            problems.append(f"col {c}: TYPE mismatch ray={ta} oracle={tb}")
    if problems:
        return problems
    if at.num_rows != bt.num_rows:
        problems.append(f"row count: ray={at.num_rows} oracle={bt.num_rows}")
    a, b = at.to_pandas(), bt.to_pandas()
    ca, cb = canon(a), canon(b)
    if len(ca) == len(cb):
        for c in ca.columns:
            va, vb = ca[c].to_numpy(), cb[c].to_numpy()
            if va.dtype.kind == "f" or vb.dtype.kind == "f":
                ok = np.allclose(va.astype(float), vb.astype(float), rtol=0, atol=1e-9, equal_nan=True)
                exact = np.array_equal(va.astype(float), vb.astype(float), equal_nan=True)
                if not ok:
                    problems.append(f"col {c}: float mismatch")
                elif not exact:
                    problems.append(f"col {c}: float close-but-not-exact (hash risk)")
            else:
                eq = va == vb
                if va.dtype.kind == "M" and vb.dtype.kind == "M":
                    # NaT != NaT, but a null matching a null is a match
                    eq = eq | (pd.isna(va) & pd.isna(vb))
                if not eq.all():
                    bad = int((~eq).sum())
                    problems.append(f"col {c}: {bad} differing values e.g. ray={va[~eq][:3]} oracle={vb[~eq][:3]}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            rt = to_arrow(fn(sf_dir))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {rt.num_rows} rows, cols={rt.column_names}")
            continue
        ot = con.execute(sql).arrow()
        if isinstance(ot, pa.RecordBatchReader):  # older duckdb API shape
            ot = ot.read_all()
        problems = compare(name, rt, ot)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"[ok] {name}: {rt.num_rows} rows match oracle (types exact)")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
