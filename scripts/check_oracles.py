"""Local mirror of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side and compare row count, schema,
and order-insensitive values (exact — stricter than a value hash, so any
driver hash mismatch shows up here first).

Usage: PYTHONPATH=. python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        tables = list(res.iter_batches(batch_size=None, batch_format="pyarrow"))
        res = (
            pa.concat_tables(tables, promote_options="permissive")
            if tables
            else pa.table({})
        )
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"schema mismatch: ray={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count: ray={len(a)} oracle={len(b)}")
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
            rdf = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(rdf)} rows, cols={list(rdf.columns)}")
            continue
        odf = con.execute(sql).df()
        problems = compare(name, rdf, odf)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"[ok] {name}: {len(rdf)} rows match oracle")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
