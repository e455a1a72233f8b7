"""Low-CPU robustness gate: run EVERY queries() entry at num_cpus=4.

Fixed-size actor pools (concurrency=N) RESERVE N CPUs; stacked pools, or
one pool as wide as the cluster, starve the upstream ReadParquet task
pool and the streaming executor makes zero progress forever (observed
twice: IVF assign+score, and simhash's 4-actor SimHasher on 4 CPUs).
pytest fixtures built on from_arrow never catch this — blocks arrive
pre-materialized — so this sweep reads the real parquet inputs.

Usage: python scripts/lowcpu_sweep.py [sf_dir]   (default sf0.001)
Exit code 1 if any query fails; a HANG (no output progression) is the
deadlock signature — run under `timeout`.
"""

import os
import sys
import time

import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    failed = 0
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if isinstance(res, ray.data.Dataset):
                n = res.count()
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                n = len(res)
            print(f"[ok] {name}: rows={n} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 - gate reports, doesn't mask
            failed += 1
            print(f"[FAIL] {name}: {type(ex).__name__}: {ex}", flush=True)
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
