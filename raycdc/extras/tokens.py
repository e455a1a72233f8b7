"""Token-sequence shaping for training-data pipelines over the
``input_hint`` table ``(doc_id, tokens: list<int32>, n_tok, source)``:

* :func:`chunk_sequences` — split each document into fixed-size context
  chunks (``ceil(n/L)`` rows per doc). Pure per-row → deterministic,
  partitioning-independent, SQL-oracle-checkable on the chunk counts.
* :func:`pack_sequences` — greedy-concatenate documents into fixed-size
  context rows (optionally separated by an EOS token). Packing is
  BLOCK-LOCAL by design (documented partitioning assumption): each
  batch packs independently, so at most one partial row per batch is
  emitted (or dropped) — the price of keeping the op an embarrassingly
  parallel ``map_batches`` with no global order dependency.

All kernels are numpy over the flattened token stream + offsets — no
per-row Python loops. Reference analog for the shaping-over-payload
idea: the pixel-module fixups that normalize payload after edits
(``AttributeList.java:2575``, SURVEY.md §2.2 M9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _flat(tokens_col) -> tuple[np.ndarray, np.ndarray]:
    la = tokens_col.combine_chunks() if isinstance(tokens_col, pa.ChunkedArray) else tokens_col
    lens = np.asarray(pc.list_value_length(la).fill_null(0).to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    vals = np.asarray(la.flatten().to_numpy(zero_copy_only=False))
    return vals, lens


def chunk_sequences(
    ds: ray.data.Dataset,
    context_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Split every document into ``ceil(n_tok / context_len)`` rows of at
    most ``context_len`` tokens: ``(doc_id, chunk_idx, tokens, n_tok)``.
    Zero-token docs emit nothing."""
    L = int(context_len)
    if L <= 0:
        raise ValueError("context_len must be positive")

    def f(t: pa.Table) -> pa.Table:
        vals, lens = _flat(t[tokens_col])
        n_chunks = (lens + L - 1) // L
        total = int(n_chunks.sum())
        doc_of = np.repeat(np.arange(len(lens)), n_chunks)
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_chunks[:-1])]), n_chunks
        )
        chunk_lens = np.minimum(L, lens[doc_of] - chunk_idx * L)
        offsets = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(chunk_lens, out=offsets[1:])
        # flat token stream is already in doc order → chunks reuse it
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(vals, type=pa.int32())
        )
        ids = t[id_col].combine_chunks().take(pa.array(doc_of))
        return pa.table(
            {
                id_col: ids,
                "chunk_idx": pa.array(chunk_idx, type=pa.int32()),
                tokens_col: arr,
                "n_tok": pa.array(chunk_lens.astype(np.int32)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def pack_sequences(
    ds: ray.data.Dataset,
    context_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    eos_token: int | None = None,
    drop_remainder: bool = False,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Greedy block-local sequence packing: concatenate the batch's
    documents (each followed by ``eos_token`` if given) and cut the
    stream into ``context_len`` rows ``(pack_id, tokens, n_tok,
    n_docs)``. The final partial row of each batch is emitted (or
    dropped with ``drop_remainder``) — block-local packing wastes at
    most one partial row per block and keeps the op order-free."""
    L = int(context_len)
    if L <= 0:
        raise ValueError("context_len must be positive")

    def f(t: pa.Table) -> pa.Table:
        vals, lens = _flat(t[tokens_col])
        if eos_token is not None:
            # vectorized interleave: append one EOS after each doc
            new_lens = lens + 1
            new_off = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(new_lens, out=new_off[1:])
            out = np.empty(int(new_off[-1]), dtype=np.int32)
            tail_pos = new_off[1:] - 1
            out[tail_pos] = np.int32(eos_token)
            mask = np.ones(len(out), dtype=bool)
            mask[tail_pos] = False
            out[mask] = vals
            vals, lens = out, new_lens
        total = len(vals)
        n_full = total // L
        rem = total - n_full * L
        n_out = n_full + (1 if rem and not drop_remainder else 0)
        if n_out == 0:
            return pa.table(
                {
                    "pack_id": pa.array([], pa.string()),
                    tokens_col: pa.array([], pa.list_(pa.int32())),
                    "n_tok": pa.array([], pa.int32()),
                    "n_docs": pa.array([], pa.int32()),
                }
            )
        offsets = np.minimum(np.arange(n_out + 1, dtype=np.int64) * L, total)
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(vals[: int(offsets[-1])], type=pa.int32()),
        )
        # deterministic pack ids: first doc id of the batch + row index
        first = t[id_col][0].as_py() if t.num_rows else ""
        pack_ids = pa.array([f"{first}#{k:06d}" for k in range(n_out)])
        # docs whose span ENDS inside each pack row (doc-boundary count);
        # docs ending in a dropped remainder are not counted anywhere
        doc_ends = np.cumsum(lens[lens > 0])
        if len(doc_ends):
            idx = (doc_ends - 1) // L
            idx = idx[idx < n_out]
            ends_in = np.bincount(idx, minlength=n_out)
        else:
            ends_in = np.zeros(n_out, dtype=np.int64)
        return pa.table(
            {
                "pack_id": pack_ids,
                tokens_col: arr,
                "n_tok": pa.array(np.diff(offsets).astype(np.int32)),
                "n_docs": pa.array(ends_in.astype(np.int32)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
