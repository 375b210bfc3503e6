"""Multimodal columns: opaque binary payloads with typed metadata.

The engine's convention for image/audio/video at 100 TB: a struct
column ``{data: binary, mime: string, meta: map<string,string>}``
stored in Parquet (binary is chunked+compressed per row group; column
pruning means metadata-only queries never read payload bytes — the
property that matters at scale).

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so
payloads stream through Python in bounded batches instead of
per-row pickling. The real decoders (PIL/librosa/av) are not in this
container, so ``decode_batch`` dispatches: if a decoder import is
available it would be used; otherwise a clearly-marked deterministic
fake extracts structural features (byte length, prefix hex) — the
Spark-side plumbing (schema, batching, partitioning) is real and
tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, mime string, byte_len long, feat string"


def pack_multimodal(docs: DataFrame) -> DataFrame:
    """documents -> multimodal rows (payload = utf-8 bytes of the text,
    standing in for image/audio bytes)."""
    return docs.select(
        "doc_id",
        F.struct(
            F.encode("text", "utf-8").alias("data"),
            F.lit("text/plain").alias("mime"),
            F.create_map(F.lit("src"), F.col("source"), F.lit("lang"), F.col("lang")).alias(
                "meta"
            ),
        ).alias("blob"),
    )


def _decode_wav(data: bytes):
    """stdlib WAV/PCM decode (no pip dependency): returns (params,
    samples) where samples is an int64 numpy array of interleaved PCM
    sample values (8-bit PCM is unsigned per the WAV spec — recentered
    to signed around 0; 16/32-bit are little-endian signed)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        params = w.getparams()
        raw = w.readframes(params.nframes)
    if params.sampwidth == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    elif params.sampwidth == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    elif params.sampwidth == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.int64)
    else:
        raise ValueError(f"unsupported PCM sample width {params.sampwidth}")
    return params, samples


def _decode_real(data: bytes, mime: str) -> str:
    """Real-decoder dispatch. audio/wav is decoded IN-CONTAINER via the
    stdlib ``wave`` module (r12 — the gate is genuinely open for one
    real format); image/video formats still need PIL/av, absent here."""
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        p, samples = _decode_wav(data)
        return f"pcm:{p.framerate}:{p.nchannels}:{p.sampwidth * 8}:{p.nframes}"
    raise NotImplementedError(
        "real decoders for non-WAV media (PIL/librosa/av) are not installed "
        "in this environment; plug them in here — the mapInPandas plumbing "
        "is decoder-agnostic"
    )


def _decode_fake(data: bytes, mime: str) -> str:
    """Deterministic stand-in feature: first 8 payload bytes as hex."""
    return data[:8].hex()


def decode_features(packed: DataFrame, use_real: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the multimodal struct."""
    decode = _decode_real if use_real else _decode_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [b["mime"] for b in blobs],
                    "byte_len": [len(b["data"]) for b in blobs],
                    "feat": [decode(bytes(b["data"]), b["mime"]) for b in blobs],
                }
            )

    return packed.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, thumb binary"


def image_resize(packed: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Thumbnail/resize over the multimodal struct (1 row in -> 1 row
    out). Real path: PIL decode + resize inside the batch loop; here the
    deterministic stand-in emits the first width*height payload bytes as
    the 'thumbnail'. Batch shape and output schema are what a real
    decoder would use; payload bytes never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "thumb": [bytes(b["data"])[:n] for b in blobs],
                }
            )

    return packed.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_feat string"


def frame_sample(packed: DataFrame, every_n: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Video frame sampling (1 row in -> many rows out): mapInPandas is
    also the fan-out shape — each yielded batch may hold more rows than
    its input. Real path: av/ffmpeg keyframe iteration; the stand-in
    treats every ``frame_bytes`` slice of the payload as one frame and
    samples every ``every_n``-th, emitting its first-4-bytes hex as the
    frame feature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob["data"])
                n_frames = max(len(data) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    feats.append(data[fi * frame_bytes : fi * frame_bytes + 4].hex())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_feat": feats})

    return packed.mapInPandas(run, FRAME_SCHEMA)


ENERGY_SCHEMA = "doc_id long, frame_idx long, n_bytes long, energy long"


def audio_frame_energy(
    packed: DataFrame,
    frame_bytes: int = 32,
    max_frames: int = 16,
    use_real: bool = False,
) -> DataFrame:
    """Audio frame-energy extraction (the librosa/PCM shape): window
    the payload into fixed-size frames and emit one scalar per frame —
    energy = sum of squared sample values. The real path decodes PCM
    and squares amplitudes; the stand-in squares the raw payload BYTES,
    which is the identical windowed-aggregate computation over the
    identical batching, so the Spark-side plumbing (1 row -> N frame
    rows, bounded by ``max_frames``, exact integer sums) is fully
    exercised and oracle-checkable. Byte values and frame boundaries
    are engine-independent, so every emitted number is an exact
    BIGINT.

    The frame kernel is numpy-vectorized (frombuffer -> widen to int64
    -> zero-pad the ragged tail -> reshape(-1, frame_bytes) -> row
    square-sums): this is the hot loop of a real audio pass where
    payloads are MBs, and a per-byte Python loop would dominate the
    stage. Squares are <= 255^2 and a frame sum is <= frame_bytes *
    65025, so int64 arithmetic is exact — output is bit-identical to
    the scalar form (pinned by tests/test_operators.py's edge-case
    frame-boundary test).

    ``use_real=True`` (r12) opens the real-decoder gate for WAV
    payloads via the stdlib ``wave`` module — no pip dependency: the
    payload is parsed as a RIFF/WAV container, PCM samples are decoded
    (8/16/32-bit), and ``frame_bytes`` is reinterpreted as SAMPLES per
    frame. The windowed aggregate downstream of the decode is byte-
    for-byte the same kernel (widen to int64 -> pad -> reshape -> row
    square-sums; int16^2 * frame <= 2^35, exact), which is the point:
    only the decode step differs between stand-in and real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, engs = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if use_real:
                    _, samples = _decode_wav(bytes(blob["data"]))
                    n_frames = min(
                        (len(samples) + frame_bytes - 1) // frame_bytes, max_frames
                    )
                    if n_frames == 0:
                        continue
                    used = min(len(samples), n_frames * frame_bytes)
                    sq = samples[:used].copy()
                    sq *= sq
                    pad = -used % frame_bytes
                    if pad:
                        sq = np.concatenate([sq, np.zeros(pad, dtype=np.int64)])
                    energies = sq.reshape(n_frames, frame_bytes).sum(axis=1)
                    ids.extend([doc_id] * n_frames)
                    idxs.extend(range(n_frames))
                    lens.extend([frame_bytes] * (n_frames - 1))
                    lens.append(used - (n_frames - 1) * frame_bytes)
                    engs.extend(energies.tolist())
                    continue
                data = bytes(blob["data"])
                # empty payloads emit no frames (matching the oracle's
                # empty generate_series)
                n_frames = min((len(data) + frame_bytes - 1) // frame_bytes, max_frames)
                if n_frames == 0:
                    continue
                used = min(len(data), n_frames * frame_bytes)
                sq = np.frombuffer(data, dtype=np.uint8, count=used).astype(np.int64)
                sq *= sq
                pad = -used % frame_bytes
                if pad:
                    sq = np.concatenate([sq, np.zeros(pad, dtype=np.int64)])
                energies = sq.reshape(n_frames, frame_bytes).sum(axis=1)
                ids.extend([doc_id] * n_frames)
                idxs.extend(range(n_frames))
                lens.extend([frame_bytes] * (n_frames - 1))
                lens.append(used - (n_frames - 1) * frame_bytes)
                engs.extend(energies.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_bytes": lens, "energy": engs}
            )

    return packed.mapInPandas(run, ENERGY_SCHEMA)


AHASH_SCHEMA = "doc_id long, phash string"


def image_ahash(packed: DataFrame, side: int = 8, cell: int = 2) -> DataFrame:
    """Perceptual average-hash (aHash) over the multimodal struct —
    the image near-dup fingerprint (resize to a tiny grid, threshold
    each cell against the mean). Real path: PIL decode + grayscale +
    resize feeds the same thresholding; the deterministic stand-in
    treats the first ``(side*cell)^2`` payload bytes (zero-padded) as a
    square grayscale image. All-integer: cell value = SUM of its
    ``cell x cell`` bytes, bit = 1 iff ``cell_sum * n_cells >
    total_sum`` — no float mean, so the hash is bit-identical to the
    byte-level SQL oracle. Emitted as a ``side*side``-char bit string
    (a production deployment packs it into 8 bytes; the string keeps
    the differential hash-check trivially cross-engine).

    One Arrow-batched mapInPandas pass, 1 row -> 1 row, numpy block-sum
    per payload; payload bytes never leave the executor."""
    dim = side * cell
    n = dim * dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob["data"])[:n]
                arr = np.zeros(n, dtype=np.int64)
                if data:
                    buf = np.frombuffer(data, dtype=np.uint8)
                    arr[: len(buf)] = buf
                cells = (
                    arr.reshape(dim, dim)
                    .reshape(side, cell, side, cell)
                    .sum(axis=(1, 3))
                    .reshape(-1)
                )
                bits = cells * (side * side) > cells.sum()
                hashes.append("".join("1" if b else "0" for b in bits))
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return packed.mapInPandas(run, AHASH_SCHEMA)
