"""Deduplication at scale: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide "Near-dup (MinHash-LSH)"):
* exact      — hash column (vectorized) → combiner groupby (partial min/
               count per batch, tiny shuffle)
* minhash    — per-batch shingle→minhash (numpy-vectorized per row) →
               explode to (band, band_hash, doc) rows → groupby bands →
               candidate pairs in-bucket → Jaccard verify. Only banded
               signatures shuffle, never the text corpus.
* simhash    — 64-bit signature per doc; near-dups via 4-band exact-match
               bucketing (Hamming ≤ 3 guaranteed caught by pigeonhole
               when bands = hamming_budget + 1).
* embedding  — random-hyperplane LSH bucketing, in-bucket cosine verify.
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from raycdc.ops import partial_groupby_agg

_MERSENNE = (1 << 61) - 1


def _md5_col(values) -> list[str]:
    return [hashlib.md5((v or "").encode()).hexdigest() for v in values]


# ------------------------------------------------------------------- exact
def exact_dedup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"):
    """Content-hash groups with first-writer winner + dup count (D1)."""

    def h(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(_md5_col(t[text_col].to_pylist())), id_col: t[id_col]})

    hashed = ds.map_batches(h, batch_format="pyarrow")
    return partial_groupby_agg(hashed, "h", {"keep_id": (id_col, "min"), "dups": (id_col, "count")})


def exact_dedup_rows(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"):
    """The deduplicated dataset itself: one surviving row per content
    hash (min id wins). Hash-group shuffle carries full rows — use when
    the surviving corpus is the product."""

    def h(t: pa.Table) -> pa.Table:
        return t.append_column("_h", pa.array(_md5_col(t[text_col].to_pylist())))

    def first(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])[:1]
        return g.take(idx).drop_columns(["_h"])

    return ds.map_batches(h, batch_format="pyarrow").groupby("_h").map_groups(
        first, batch_format="pyarrow"
    )


# ----------------------------------------------------------------- minhash
class MinHasher:
    """Per-batch shingle→MinHash signatures + banded keys. Stateful actor:
    permutation coefficients generated once (seeded)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        k_shingle: int = 5,
        num_perm: int = 64,
        bands: int = 16,
        seed: int = 42,
        keep_text: bool = True,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.text_col, self.id_col = text_col, id_col
        self.k = k_shingle
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.keep_text = keep_text
        self.ws = re.compile(r"\s+")

    def shingle_hashes(self, text: str) -> np.ndarray:
        norm = self.ws.sub(" ", (text or "").lower().strip())
        words = norm.split(" ")
        if len(words) < self.k:
            grams = [" ".join(words)]
        else:
            grams = [" ".join(words[i : i + self.k]) for i in range(len(words) - self.k + 1)]
        out = np.fromiter(
            (int(hashlib.md5(g.encode()).hexdigest()[:16], 16) for g in set(grams)),
            dtype=np.uint64,
        )
        return out

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) universal-hash then min-reduce; all numpy
        v = (self.a[:, None] * h[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, texts = batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        out_id, out_band, out_key, out_text = [], [], [], []
        for i, text in zip(ids, texts):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                key = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:16]
                out_id.append(i)
                out_band.append(b)
                out_key.append(key)
                if self.keep_text:
                    out_text.append(text)
        cols = {
            self.id_col: pa.array(out_id),
            "band": pa.array(out_band, type=pa.int32()),
            "band_key": pa.array(out_key),
        }
        if self.keep_text:
            cols[self.text_col] = pa.array(out_text)
        return pa.table(cols)


def jaccard(a: str, b: str, k: int = 5) -> float:
    """Word-k-gram Jaccard similarity (the verify step)."""
    def grams(t):
        ws = re.sub(r"\s+", " ", (t or "").lower().strip()).split(" ")
        if len(ws) < k:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(1, len(ga | gb))


def minhash_near_dup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    concurrency: int = 4,
    batch_size: int = 2048,
) -> ray.data.Dataset:
    """Candidate generation by banded MinHash, verification by true
    Jaccard inside each band bucket. Returns (id_a, id_b, jaccard) pairs
    with id_a < id_b, deduplicated across bands.

    Partitioning assumption: a band bucket (docs agreeing on one band)
    is small; the shuffle moves banded signature rows (+ text for
    verification), grouped by (band, band_key)."""
    mh = dict(
        text_col=text_col,
        id_col=id_col,
        k_shingle=k_shingle,
        num_perm=num_perm,
        bands=bands,
    )
    banded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=mh,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def pairs(g: pa.Table) -> pa.Table:
        id_type = g.schema.field(id_col).type
        if g.num_rows < 2:
            return pa.table({"id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
                             "jaccard": pa.array([], pa.float64())})
        ids = g[id_col].to_pylist()
        texts = g[text_col].to_pylist()
        seen = {}
        for i, t in zip(ids, texts):
            seen[i] = t
        out_a, out_b, out_j = [], [], []
        for a, b in itertools.combinations(sorted(seen), 2):
            j = jaccard(seen[a], seen[b], k=k_shingle)
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.table({"id_a": pa.array(out_a, id_type), "id_b": pa.array(out_b, id_type),
                         "jaccard": pa.array(out_j, pa.float64())})

    cand = banded.groupby(["band", "band_key"]).map_groups(pairs, batch_format="pyarrow")
    # dedupe pairs found in multiple bands
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ----------------------------------------------------------------- simhash
class SimHasher:
    """64-bit SimHash over word hashes; also emits 4 16-bit band keys so
    Hamming-≤3 near-dups can be found by exact band-match bucketing."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.word = re.compile(r"\w+")

    def simhash(self, text: str) -> np.uint64:
        words = self.word.findall((text or "").lower())
        if not words:
            return np.uint64(0)
        hs = np.fromiter(
            (int(hashlib.md5(w.encode()).hexdigest()[:16], 16) for w in words),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for j in np.nonzero(v > 0)[0]:
            out |= np.uint64(1) << np.uint64(j)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.simhash(t) for t in batch[self.text_col].to_pylist()]
        arr = np.array(sigs, dtype=np.uint64)
        t = pa.table({self.id_col: batch[self.id_col]})
        t = t.append_column("simhash", pa.array(arr.astype(np.int64), type=pa.int64()))
        for b in range(4):
            band = ((arr >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
            t = t.append_column(f"sh_band{b}", pa.array(band))
        return t


def simhash_signatures(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
                       concurrency: int = 4, batch_size: int = 2048) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a.astype(np.uint64) ^ b.astype(np.uint64)
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_near_dup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
                     max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dups by SimHash: 4-band bucketing (pigeonhole: any pair with
    Hamming ≤ 3 agrees on ≥ 1 of 4 bands) then exact Hamming verify.

    Single-shuffle shape: signatures explode to one row per (band_id,
    band_value) — 4 rows/doc — and ONE groupby finds co-bucketed docs.
    (An earlier 4-way union of per-band groupbys deadlocked the streaming
    executor and shuffled 4 separate times.)"""
    sigs = simhash_signatures(ds, text_col, id_col)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for b in range(4):
            parts.append(
                pa.table(
                    {
                        id_col: t[id_col],
                        "simhash": t["simhash"],
                        "band_id": pa.array(np.full(n, b, dtype=np.int32)),
                        "band_val": t[f"sh_band{b}"],
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        id_type = g.schema.field(id_col).type
        ids = np.asarray(g[id_col].to_pylist(), dtype=object)
        sh = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            if i + 1 < len(ids):
                hs = hamming64(np.repeat(sh[i], len(ids) - i - 1), sh[i + 1 :])
                for off in np.nonzero(hs <= max_hamming)[0]:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + off])
                    out_h.append(int(hs[off]))
        return pa.table({"id_a": pa.array(out_a, id_type), "id_b": pa.array(out_b, id_type),
                         "hamming": pa.array(out_h, pa.int64())})

    cand = exploded.groupby(["band_id", "band_val"]).map_groups(pairs, batch_format="pyarrow")
    return cand.groupby(["id_a", "id_b"]).map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")


# --------------------------------------------------------------- embeddings
def embedding_near_dup(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> ray.data.Dataset:
    """Cosine near-dup via random-hyperplane LSH bucketing + in-bucket
    verification. Pairs missed by bucketing are the LSH recall tradeoff
    (documented); n_planes=0 degenerates to one bucket = exact O(n²)."""
    if n_planes > 30:
        raise ValueError("n_planes must be <= 30 (bucket is an int32 bitmask)")

    def bucketize(t: pa.Table) -> pa.Table:
        emb = t[emb_col].combine_chunks()
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(emb), -1)
        if n_planes:
            planes = np.random.default_rng(seed).standard_normal((mat.shape[1], n_planes))
            sig = (mat @ planes > 0).astype(np.int64)
            bucket = (sig @ (1 << np.arange(n_planes, dtype=np.int64))).astype(np.int32)
        else:
            bucket = np.zeros(len(emb), dtype=np.int32)
        return t.append_column("_bucket", pa.array(bucket))

    def pairs(g: pa.Table) -> pa.Table:
        id_type = g.schema.field(id_col).type
        emb = g[emb_col].combine_chunks()
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(emb), -1)
        ids = np.asarray(g[id_col].to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        ids, mat = ids[order], mat[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1
        mat = mat / norms[:, None]
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[ia[keep]].tolist(), id_type),
                "id_b": pa.array(ids[ib[keep]].tolist(), id_type),
                "cosine": pa.array(np.round(sims[ia, ib][keep], 6), type=pa.float64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )


# ------------------------------------------------------------ ngram jaccard
def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    pairs: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> pa.Table:
    """Exact n-gram Jaccard for an explicit candidate-pair list: the
    texts of pair members are fetched via a broadcast-filtered pass (one
    scan), then scored driver-side (candidate sets are small by
    construction)."""
    wanted = sorted({i for p in pairs for i in p})

    def pick(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(wanted))
        return t.filter(mask).select([id_col, text_col])

    got = {}
    for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            got[r[id_col]] = r[text_col]
    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        out_a.append(a)
        out_b.append(b)
        out_j.append(round(jaccard(got.get(a, ""), got.get(b, ""), k=k), 6))
    return pa.table({"id_a": pa.array(out_a), "id_b": pa.array(out_b),
                     "jaccard": pa.array(out_j, pa.float64())})
