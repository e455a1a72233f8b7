"""Incremental materialized-view maintenance over a :class:`LakeTable`.

A :class:`MaterializedAggregate` keeps a grouped SUM/COUNT table derived
from the lake's converged state and brings it forward per committed
epoch WITHOUT rescanning unchanged keys:

    delta(E) = contrib(state_E ∩ changed_keys)
             − contrib(state_{E−1} ∩ changed_keys)

``changed_keys`` come from exactly the state files the epoch-E manifest
added over epoch E−1 (manifest snapshots are immutable and content-
named, so the file-set difference IS the epoch's touched-key superset).
Both contributions are computed from time-travel reads restricted to
those keys — this is deliberately NOT "apply the delta rows": a
re-delivered older event appears in the epoch's files but LOSES the
LWW fold, and only the state-vs-state difference accounts for that
correctly (tombstones, duplicate replays, out-of-order lsns all
included). Refresh is idempotent: the view is stamped with its epoch
and re-refreshing at the same epoch is a no-op.

Scale shape: the key-set filter is a broadcast ``np.isin`` inside
``map_batches`` and both scans are merge-on-read Datasets (one task per
partition, parquet row-group pruning in L0 mode); contributions reduce
through the combiner groupby, so only group-cardinality rows reach the
driver — the view itself is group-cardinality by definition. Reference
analog: nifi-dicom's running attribute counters
(``LogCacheStatistics``-style derived state), maintained here as lake
state instead of an in-process cache.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from raycdc.lake import LakeTable, _atomic_write_json, _atomic_write_parquet


def _manifest_files(lake: LakeTable, m: dict) -> set:
    files: set = set()
    for d in lake._descriptors(m):
        files.update(json.loads(d["files"]))
        files.update(json.loads(d.get("l0") or "[]"))
    return files


class MaterializedAggregate:
    """Grouped SUM/COUNT view over the lake's live rows.

    ``specs``: out_col -> (value_col, "sum") | (None, "count"). A hidden
    per-group row count is always maintained so groups whose last row
    disappears are dropped exactly as a full recompute would drop them.
    """

    def __init__(self, lake: LakeTable, group_col: str, specs: dict, mv_path: str):
        for out, (col, kern) in specs.items():
            if kern not in ("sum", "count"):
                raise ValueError(f"{out}: kernel must be sum|count, got {kern!r}")
        self.lake = lake
        self.group_col = group_col
        self.specs = dict(specs)
        self.path = mv_path
        os.makedirs(mv_path, exist_ok=True)

    # ------------------------------------------------------------ state
    @property
    def _stamp_path(self) -> str:
        return os.path.join(self.path, "stamp.json")

    def epoch(self) -> int | None:
        try:
            with open(self._stamp_path) as f:
                return int(json.load(f)["epoch"])
        except FileNotFoundError:
            return None

    def read(self) -> pa.Table:
        e = self.epoch()
        if e is None:
            raise FileNotFoundError("view has never been refreshed")
        t = pq.read_table(os.path.join(self.path, f"mv-{e:08d}.parquet"))
        return t.drop_columns(["_n"])

    # ----------------------------------------------------------- refresh
    def _contrib(self, ds: ray.data.Dataset, keys: pa.Array | None) -> dict:
        """(group -> [aggs..., _n]) over live rows, optionally key-filtered."""
        from raycdc.ops import partial_groupby_agg

        key_col = self.lake.key
        if keys is not None:
            if len(keys) == 0:
                return {}
            ref = ray.put(np.sort(np.asarray(keys)))

            def keep(t: pa.Table) -> pa.Table:
                want = ray.get(ref)
                v = t.column(key_col).to_numpy(zero_copy_only=False)
                return t.filter(pa.array(np.isin(v, want)))

            ds = ds.map_batches(keep, batch_format="pyarrow")
        # one physical count only ("_n"); count specs alias it afterwards
        # (duplicate (col, kernel) pairs collide inside the combiner)
        aggs = {out: (col, "sum") for out, (col, kern) in self.specs.items()
                if kern == "sum"}
        aggs["_n"] = (key_col, "count")
        count_outs = [out for out, (_, kern) in self.specs.items()
                      if kern == "count"]
        folded = partial_groupby_agg(ds, self.group_col, aggs)
        out: dict = {}
        for t in folded.iter_batches(batch_size=None, batch_format="pyarrow"):
            gs = t.column(self.group_col).to_pylist()
            cols = {c: t.column(c).to_pylist() for c in t.column_names
                    if c != self.group_col}
            for i, g in enumerate(gs):
                row = out.setdefault(
                    g, dict.fromkeys([*self.specs, "_n"], 0))
                for c in cols:
                    row[c] += int(cols[c][i] or 0)
                for c in count_outs:
                    row[c] += int(cols["_n"][i] or 0)
        return out

    def _write(self, mv: dict, epoch: int) -> None:
        groups = sorted(mv)
        cols = {self.group_col: pa.array(groups)}
        for c in [*self.specs, "_n"]:
            cols[c] = pa.array([mv[g][c] for g in groups], pa.int64())
        _atomic_write_parquet(
            os.path.join(self.path, f"mv-{epoch:08d}.parquet"), pa.table(cols)
        )
        _atomic_write_json(self._stamp_path, {"epoch": epoch})

    def refresh(self) -> pa.Table:
        """Bring the view to the lake's current epoch; returns it."""
        cur = int(self.lake.manifest()["epoch"])
        have = self.epoch()
        if have is None:
            mv = self._contrib(self.lake.read(), keys=None)
            self._write(mv, cur)
            return self.read()
        if have > cur:
            raise ValueError(f"view stamped at {have} but lake is at {cur}")
        mv = {
            r[self.group_col]: {c: r[c] for c in [*self.specs, "_n"]}
            for r in pq.read_table(
                os.path.join(self.path, f"mv-{have:08d}.parquet")
            ).to_pylist()
        }
        avail = set(self.lake.epochs())
        needed = set(range(have, cur + 1))  # e−1 reads need `have` too
        if have < cur and not needed <= avail:
            # a needed snapshot was vacuumed: fall back to full recompute
            mv = self._contrib(self.lake.read(), keys=None)
            self._write(mv, cur)
            return self.read()
        for e in range(have + 1, cur + 1):
            new_files = _manifest_files(self.lake, self.lake.manifest(e)) - \
                _manifest_files(self.lake, self.lake.manifest(e - 1))
            key_col = self.lake.key
            chunks = []
            for f in sorted(new_files):
                t = pq.read_table(os.path.join(self.lake.path, f),
                                  columns=[key_col])
                chunks.append(t.column(key_col).combine_chunks())
            if not chunks:
                self._write(mv, e)
                continue
            keys = pc.unique(pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in chunks]
            ))
            add = self._contrib(self.lake.read(epoch=e), keys)
            sub = self._contrib(self.lake.read(epoch=e - 1), keys)
            for g, row in add.items():
                cur_row = mv.setdefault(g, dict.fromkeys([*self.specs, "_n"], 0))
                for c in cur_row:
                    cur_row[c] += row[c]
            for g, row in sub.items():
                cur_row = mv.setdefault(g, dict.fromkeys([*self.specs, "_n"], 0))
                for c in cur_row:
                    cur_row[c] -= row[c]
            mv = {g: r for g, r in mv.items() if r["_n"] > 0}
            self._write(mv, e)
        return self.read()
