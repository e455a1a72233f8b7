"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container): ``DecodeImage(real=True)`` raises NotImplementedError
at the exact point a real decoder (PIL/libvips/ffmpeg) would be called,
while ``real=False`` produces deterministic fake features so the entire
Ray-side plumbing — schema, batch sizing, actor signatures, output
layout — is real and tested end-to-end.

Design notes for the real thing at scale: binary payloads make blocks
heavy → small ``batch_size`` (64-256) and a raised
``DataContext.target_max_block_size``; decode is CPU-bound → actor pool
with ``num_cpus=1`` per actor and ``concurrency`` sized to the node;
decoded features (small, fixed-width) flow on while payloads are
dropped as early as possible (select_columns before any shuffle).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        (
            "meta",
            pa.struct(
                [
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("sample_rate", pa.int32()),
                    ("n_frames", pa.int32()),
                    ("codec", pa.string()),
                ]
            ),
        ),
    ]
)


def attach_fake_media(ds: ray.data.Dataset, id_col: str = "doc_id", kind: str = "image",
                      payload_bytes: int = 512) -> ray.data.Dataset:
    """Deterministically synthesize a media column from row ids (test/
    bench substrate for the decode stages)."""

    def gen(t: pa.Table) -> pa.Table:
        ids = [str(v) for v in t[id_col].to_pylist()]
        payloads, metas = [], []
        for i in ids:
            seed = hashlib.md5(i.encode()).digest()
            reps = payload_bytes // len(seed) + 1
            payloads.append((seed * reps)[:payload_bytes])
            metas.append(
                {
                    "width": 16 + seed[0] % 64,
                    "height": 16 + seed[1] % 64,
                    "sample_rate": 16000,
                    "n_frames": 1 + seed[2] % 32,
                    "codec": "fake",
                }
            )
        return pa.table(
            {
                "media_id": pa.array(ids),
                "kind": pa.array([kind] * len(ids)),
                "payload": pa.array(payloads, type=pa.binary()),
                "meta": pa.array(metas, type=MEDIA_SCHEMA.field("meta").type),
            }
        )

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=256)


class DecodeImage:
    """Actor-pool decode stage. ``real=True`` marks where a real decoder
    plugs in; the fake path derives a deterministic feature vector from
    the payload hash (so downstream stages are testable)."""

    def __init__(self, real: bool = False, feature_dim: int = 8):
        self.real = real
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real image decode requires an image library (PIL/libvips) "
                "not present in this container; plug it in here"
            )
        feats = []
        for payload in batch["payload"].to_pylist():
            h = hashlib.sha256(bytes(payload)).digest()
            v = np.frombuffer(h[: self.feature_dim * 4], dtype=np.uint32).astype(np.float32)
            feats.append((v / np.float32(2**32)).tolist())
        out = batch.drop_columns(["payload"])  # drop heavy bytes ASAP
        return out.append_column("features", pa.array(feats, type=pa.list_(pa.float32())))


class ResizeImage:
    """Stub resize: updates meta dimensions (real kernel would transform
    payload); demonstrates struct-column rewrite plumbing."""

    def __init__(self, width: int = 224, height: int = 224, real: bool = False):
        self.width, self.height, self.real = width, height, real

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("real resize needs an image library")
        import pyarrow.compute as pc

        meta = batch["meta"].combine_chunks()
        names = [f.name for f in meta.type]
        fields = {n: meta.field(n) for n in names}
        n = batch.num_rows
        fields["width"] = pa.array(np.full(n, self.width, dtype=np.int32))
        fields["height"] = pa.array(np.full(n, self.height, dtype=np.int32))
        rebuilt = pa.StructArray.from_arrays(
            [fields[n_] for n_ in names],
            names=names,
            mask=pc.is_null(meta) if meta.null_count else None,
        )
        return batch.set_column(batch.column_names.index("meta"), "meta", rebuilt)


class SampleFrames:
    """Stub frame sampler for video rows: emits one row per sampled frame
    index (flat-map shape), payload dropped."""

    def __init__(self, every_n: int = 8, real: bool = False):
        self.every_n, self.real = every_n, real

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("real frame sampling needs ffmpeg")
        ids, frames = [], []
        metas = batch["meta"].to_pylist()
        for mid, m in zip(batch["media_id"].to_pylist(), metas):
            for f in range(0, int(m["n_frames"]), self.every_n):
                ids.append(mid)
                frames.append(f)
        return pa.table(
            {"media_id": pa.array(ids), "frame_idx": pa.array(frames, type=pa.int32())}
        )


def decode_features(ds: ray.data.Dataset, concurrency: int = 4,
                    batch_size: int = 128) -> ray.data.Dataset:
    """The canonical multimodal pipeline shape: small batches through an
    actor pool, heavy payloads dropped at the decode boundary."""
    return ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
