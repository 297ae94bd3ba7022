"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode step is REAL for binary netpbm images (P5 grayscale / P6
RGB), PCM WAV audio (RIFF format-1, 8/16-bit) and uncompressed
YUV4MPEG2 video (C420 frame walk) — all pure-numpy parses needing no
codec library — and STUBBED for compressed formats (JPEG/PNG/mp3/ogg/
mp4 need codec libraries this container lacks — those raise
NotImplementedError unless a deterministic fake is requested).
Everything Ray-side is real and tested either way:
schema handling for binary columns, actor-pool stage signatures (decoder
state initialized once per actor), bytes-bounded batch sizing, and the
typed metadata output layout.
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
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def encode_netpbm(arr: np.ndarray) -> bytes:
    """uint8 (h, w) -> binary PGM (P5); (h, w, 3) -> binary PPM (P6)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"expected (h, w) or (h, w, 3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f" {w} {h} 255\n".encode() + arr.tobytes()


def _netpbm_header(blob: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary netpbm header (magic, whitespace/comment-separated
    width height maxval, one whitespace byte, then raster). Returns
    (magic, width, height, maxval, raster offset)."""
    magic = blob[:2]
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    return magic, fields[0], fields[1], fields[2], pos + 1  # single ws byte


def decode_image(blob: bytes) -> np.ndarray:
    """Image decode: REAL for binary netpbm (P5 -> (h, w) uint8 grayscale,
    P6 -> (h, w, 3) uint8 RGB; a pure header parse + zero-copy frombuffer
    reshape). Compressed formats raise — plug a PIL/turbojpeg decoder in a
    container that has one, or use ImageMetaStage(fake=True)."""
    if blob[:2] in (b"P5", b"P6"):
        magic, w, h, maxval, off = _netpbm_header(blob)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm not supported")
        ch = 1 if magic == b"P5" else 3
        need = w * h * ch
        raster = np.frombuffer(blob, np.uint8, count=need, offset=off)
        return raster.reshape((h, w) if ch == 1 else (h, w, 3))
    raise NotImplementedError(
        "only binary netpbm (P5/P6) decodes in this environment; use "
        "ImageMetaStage(fake=True) for deterministic fake features, or plug "
        "a PIL/turbojpeg decoder here for compressed formats"
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 (n,) mono or (n, ch) multi-channel -> RIFF/WAVE PCM bytes
    (format 1, 16-bit little-endian) — pure struct/numpy, no codec lib."""
    import struct

    s = np.ascontiguousarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                    sample_rate * ch * 2, ch * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Audio decode: REAL for PCM WAV (RIFF format-1, 8- or 16-bit — a
    pure chunk-walk + zero-copy frombuffer, no codec library; same spirit
    as the netpbm image path). Returns ((n_samples, channels) array,
    sample_rate). Compressed audio (mp3/ogg/flac/aac) raises — plug a
    soundfile/ffmpeg decoder in a container that has one."""
    import struct

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise NotImplementedError(
            "only PCM WAV decodes in this environment; plug a "
            "soundfile/ffmpeg decoder here for compressed audio")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, _align, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV format {audio_fmt}")
    if ch < 1 or rate < 1:
        raise ValueError(
            f"malformed WAV fmt chunk: channels={ch}, sample_rate={rate}")
    if bits == 16:
        samples = np.frombuffer(data, "<i2", count=len(data) // 2)
    elif bits == 8:
        samples = np.frombuffer(data, np.uint8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n = (len(samples) // ch) * ch
    return samples[:n].reshape(-1, ch), rate


class AudioMetaStage:
    """Actor-pool map_batches stage for audio payloads: REAL PCM WAV
    parse per blob (decode_audio) -> (doc_id, sample_rate, channels,
    n_samples, duration_ms). Same bytes-bounded batch sizing contract as
    ImageMetaStage."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        blob_col = batch["blob"]
        if isinstance(blob_col, pa.ChunkedArray):
            blob_col = blob_col.combine_chunks()
        n = len(blob_col)
        rates = np.empty(n, np.int32)
        chans = np.empty(n, np.int32)
        nsamp = np.empty(n, np.int64)
        for i, v in enumerate(blob_col):
            blob = bytes(v.as_buffer()) if v.is_valid else b""
            if self.fake:
                h, w, _ht = fake_features(blob)
                rates[i], chans[i], nsamp[i] = 16000, 1, w
            else:
                samples, rate = decode_audio(blob)
                rates[i] = rate
                chans[i] = samples.shape[1]
                nsamp[i] = samples.shape[0]
        dur = nsamp * 1000 // rates
        return pa.table({
            "doc_id": batch["doc_id"],
            "sample_rate": pa.array(rates, pa.int32()),
            "channels": pa.array(chans, pa.int32()),
            "n_samples": pa.array(nsamp, pa.int64()),
            "duration_ms": pa.array(dur, pa.int64()),
        })


def text_to_wav(ds, *, id_col: str = "doc_id", text_col: str = "text",
                sample_rate: int = 16000):
    """Deterministic REAL audio payloads from text (the fixture path for
    the non-stubbed decode): one int16 sample per utf-8 byte, mono."""

    def f(batch: pa.Table) -> pa.Table:
        blobs = []
        for t in batch[text_col].to_pylist():
            b = (t or "").encode("utf-8")
            blobs.append(encode_wav(
                np.frombuffer(b, np.uint8).astype(np.int16), sample_rate))
        return pa.table({"doc_id": batch[id_col],
                         "blob": pa.array(blobs, pa.binary())})

    return ds.map_batches(f, batch_format="pyarrow")


def audio_metadata(ds, *, fake: bool = False, concurrency=(1, 4),
                   batch_size: int = 256):
    return ds.map_batches(
        AudioMetaStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


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
                img = decode_image(blob)  # real for netpbm; raises otherwise
                h = hashlib.blake2b(blob, digest_size=16).hexdigest()
                ht, w = img.shape[:2]
            hashes.append(h)
            widths[i] = w
            heights[i] = ht
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "content_hash": pa.array(hashes, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
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


def text_to_netpbm(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   width: int = 32):
    """Deterministic REAL image payloads from text (the fixture path for
    the non-stubbed decode): utf-8 bytes laid out row-major into a
    ``width``-column grayscale P5 raster, zero-padded to fill the last
    row; empty/null text becomes one zero row."""

    def f(batch: pa.Table) -> pa.Table:
        blobs = []
        for t in batch[text_col].to_pylist():
            b = (t or "").encode("utf-8")
            h = max(1, -(-len(b) // width))
            arr = np.zeros(h * width, dtype=np.uint8)
            arr[:len(b)] = np.frombuffer(b, np.uint8)
            blobs.append(encode_netpbm(arr.reshape(h, width)))
        return pa.table({"doc_id": batch[id_col],
                         "blob": pa.array(blobs, pa.binary())})

    return ds.map_batches(f, batch_format="pyarrow")


def blob_metadata(ds, *, fake: bool = True, concurrency=(1, 4), batch_size: int = 256):
    return ds.map_batches(
        ImageMetaStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_image(blob: bytes, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of a decodable (netpbm) payload — pure
    numpy index gather; compressed formats raise via decode_image."""
    img = decode_image(blob)
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[yi][:, xi]


def encode_y4m_frames(width: int, height: int, frames: list[bytes],
                      fps: int = 25) -> bytes:
    """Raw C420 frame byte strings -> YUV4MPEG2 container (plain-text
    stream header + FRAME markers + raw planes — no codec library)."""
    fsize = width * height * 3 // 2
    out = [f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420\n".encode()]
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame size {len(f)} != {fsize}")
        out.append(b"FRAME\n" + f)
    return b"".join(out)


def decode_video(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Video decode: REAL for uncompressed YUV4MPEG2/C420 (a plain-text
    header + FRAME-marker walk, no codec library — completing the
    netpbm/WAV trio). Returns (width, height, [raw C420 frame bytes]).
    Compressed video (mp4/webm/mkv) raises."""
    if not blob.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "only uncompressed YUV4MPEG2 decodes in this environment; plug "
            "an ffmpeg/pyav decoder here for compressed video")
    nl = blob.index(b"\n")
    width = height = None
    for tok in blob[:nl].split()[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C" and tok not in (b"C420", b"C420jpeg", b"C420mpeg2"):
            raise NotImplementedError(f"colorspace {tok!r} not supported")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    fsize = width * height * 3 // 2
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(blob):
        if blob[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        fnl = blob.index(b"\n", pos)
        frame = blob[fnl + 1:fnl + 1 + fsize]
        if len(frame) != fsize:
            raise ValueError(
                f"truncated Y4M frame at {pos}: {len(frame)}/{fsize} bytes")
        frames.append(frame)
        pos = fnl + 1 + fsize
    return width, height, frames


def sample_frames(blob: bytes, every_n: int = 30) -> list[tuple[int, bytes]]:
    """Every ``every_n``-th frame of a decodable (Y4M) payload as
    (frame_idx, raw frame bytes); compressed formats raise via
    decode_video."""
    _w, _h, frames = decode_video(blob)
    return [(i, frames[i]) for i in range(0, len(frames), every_n)]


class VideoMetaStage:
    """Actor-pool map_batches stage for video payloads: REAL Y4M parse ->
    per-doc (doc_id, width, height, n_frames, n_sampled) where n_sampled
    counts the every_n-th-frame samples FrameSampleStage would emit."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        blob_col = batch["blob"]
        if isinstance(blob_col, pa.ChunkedArray):
            blob_col = blob_col.combine_chunks()
        n = len(blob_col)
        ws = np.empty(n, np.int32)
        hs = np.empty(n, np.int32)
        nf = np.empty(n, np.int64)
        ns = np.empty(n, np.int64)
        for i, v in enumerate(blob_col):
            blob = bytes(v.as_buffer()) if v.is_valid else b""
            w, h, frames = decode_video(blob)
            ws[i], hs[i], nf[i] = w, h, len(frames)
            ns[i] = 0 if not frames else (len(frames) - 1) // self.every_n + 1
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nf, pa.int64()),
            "n_sampled": pa.array(ns, pa.int64()),
        })


def text_to_y4m(ds, *, id_col: str = "doc_id", text_col: str = "text",
                width: int = 16, height: int = 16):
    """Deterministic REAL video payloads from text: utf-8 bytes laid
    row-major into C420 frames (w*h*3/2 bytes each), zero-padded;
    empty/null text becomes one zero frame."""
    fsize = width * height * 3 // 2

    def f(batch: pa.Table) -> pa.Table:
        blobs = []
        for t in batch[text_col].to_pylist():
            b = (t or "").encode("utf-8")
            n_frames = max(1, -(-len(b) // fsize))
            buf = np.zeros(n_frames * fsize, np.uint8)
            buf[:len(b)] = np.frombuffer(b, np.uint8)
            frames = [buf[i * fsize:(i + 1) * fsize].tobytes()
                      for i in range(n_frames)]
            blobs.append(encode_y4m_frames(width, height, frames))
        return pa.table({"doc_id": batch[id_col],
                         "blob": pa.array(blobs, pa.binary())})

    return ds.map_batches(f, batch_format="pyarrow")


def video_metadata(ds, *, every_n: int = 30, concurrency=(1, 4),
                   batch_size: int = 64):
    return ds.map_batches(
        VideoMetaStage,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Actor-pool stage for video payloads: one row per sampled frame.
    ``fake=False`` (default) REALLY samples every_n-th frames of a Y4M
    payload (sample_frames) and hashes the raw frame bytes; ``fake=True``
    keeps the deterministic 1-frame-per-KB fake for plumbing tests with
    arbitrary blobs."""

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
            did = batch["doc_id"][i].as_py()
            if self.fake:
                n_fake_frames = max(1, len(blob) // 1024)  # 1 frame/KB
                for f in range(0, n_fake_frames, self.every_n):
                    h = hashlib.blake2b(blob + f.to_bytes(4, "big"),
                                        digest_size=8).hexdigest()
                    doc_ids.append(did)
                    frame_idx.append(f)
                    frame_hash.append(h)
                continue
            for f, frame in sample_frames(blob, self.every_n):
                doc_ids.append(did)
                frame_idx.append(f)
                frame_hash.append(
                    hashlib.blake2b(frame, digest_size=8).hexdigest())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_hash": pa.array(frame_hash, pa.string()),
        })
