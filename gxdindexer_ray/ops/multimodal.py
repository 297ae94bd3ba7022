"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
environment — ``decode_image``/``decode_audio`` raise NotImplementedError
unless a deterministic fake is requested), but everything Ray-side is real
and tested: schema handling for binary columns, actor-pool stage signatures
(decoder state initialized once per actor), bytes-bounded batch sizing, and
the typed metadata output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

BLOB_META_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("n_bytes", pa.int64()),
        pa.field("content_hash", pa.string()),
        pa.field("fake_width", pa.int32()),
        pa.field("fake_height", pa.int32()),
    ]
)


def decode_image(blob: bytes):
    """Real image decode — requires a codec library this container lacks."""
    raise NotImplementedError(
        "image decode is stubbed in this environment; use ImageMetaStage(fake=True) "
        "for deterministic fake features, or plug a PIL/turbojpeg decoder here"
    )


def decode_audio(blob: bytes):
    raise NotImplementedError("audio decode is stubbed in this environment")


def fake_features(blob: bytes) -> tuple[str, int, int]:
    """Deterministic fake decode: content hash + pseudo-dimensions derived
    from it. Stands in for real decode in tests so the actor/batch plumbing
    is exercised end to end."""
    h = hashlib.blake2b(blob, digest_size=16).hexdigest()
    w = 64 + int(h[:4], 16) % 1920
    ht = 64 + int(h[4:8], 16) % 1080
    return h, w, ht


class ImageMetaStage:
    """Actor-pool map_batches stage: decoder state loads once per actor.

    Use small ``batch_size`` with binary payloads — batch bytes, not rows,
    bound worker heap (SURVEY.md §7.4 "wide records")."""

    def __init__(self, fake: bool = False):
        self.fake = fake  # a real build would load codec handles here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        blob_col = batch["blob"]
        if isinstance(blob_col, pa.ChunkedArray):
            blob_col = blob_col.combine_chunks()
        n = len(blob_col)
        n_bytes = np.empty(n, dtype=np.int64)
        hashes: list[str] = []
        widths = np.empty(n, dtype=np.int32)
        heights = np.empty(n, dtype=np.int32)
        for i, v in enumerate(blob_col):
            blob = bytes(v.as_buffer()) if v.is_valid else b""
            n_bytes[i] = len(blob)
            if self.fake:
                h, w, ht = fake_features(blob)
            else:
                h, w, ht = decode_image(blob)  # raises: stub
            hashes.append(h)
            widths[i] = w
            heights[i] = ht
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "content_hash": pa.array(hashes, pa.string()),
                "fake_width": pa.array(widths, pa.int32()),
                "fake_height": pa.array(heights, pa.int32()),
            },
            schema=BLOB_META_SCHEMA,
        )


def text_to_blob(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Manufacture an opaque binary column from text (the fixture path for
    multimodal plumbing: utf-8 bytes stand in for an image payload)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        blobs = [(t or "").encode("utf-8") for t in texts]
        return pa.table({"doc_id": batch[id_col], "blob": pa.array(blobs, pa.binary())})

    return ds.map_batches(f, batch_format="pyarrow")


def blob_metadata(ds, *, fake: bool = True, concurrency=(1, 4), batch_size: int = 256):
    return ds.map_batches(
        ImageMetaStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_image(blob: bytes, width: int, height: int):
    """Stub: real resize needs an image library this container lacks."""
    raise NotImplementedError("image resize is stubbed in this environment")


def sample_frames(blob: bytes, every_n: int = 30):
    """Stub: real video frame sampling needs a codec library."""
    raise NotImplementedError("video frame sampling is stubbed in this environment")


class FrameSampleStage:
    """Actor-pool stage signature for video payloads: emits one row per
    sampled frame index with deterministic fake frame hashes when
    ``fake=True`` (the Ray-side plumbing — fan-out rows per input row,
    schema, batch sizing — is real and tested; decode is not)."""

    def __init__(self, every_n: int = 30, fake: bool = False):
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        blob_col = batch["blob"]
        if isinstance(blob_col, pa.ChunkedArray):
            blob_col = blob_col.combine_chunks()
        doc_ids, frame_idx, frame_hash = [], [], []
        for i, v in enumerate(blob_col):
            blob = bytes(v.as_buffer()) if v.is_valid else b""
            if not self.fake:
                sample_frames(blob, self.every_n)  # raises: stub
            n_fake_frames = max(1, len(blob) // 1024)  # pretend 1 frame/KB
            did = batch["doc_id"][i].as_py()
            for f in range(0, n_fake_frames, self.every_n):
                h = hashlib.blake2b(blob + f.to_bytes(4, "big"), digest_size=8).hexdigest()
                doc_ids.append(did)
                frame_idx.append(f)
                frame_hash.append(h)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_hash": pa.array(frame_hash, pa.string()),
        })
