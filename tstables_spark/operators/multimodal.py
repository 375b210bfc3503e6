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


def _decode_bmp(data: bytes):
    """stdlib BMP decode (no pip dependency): uncompressed 24-bpp
    Windows BMP (BITMAPINFOHEADER, BI_RGB) -> (width, height, gray)
    where ``gray`` is an int64 numpy array of shape (height, width) in
    TOP-DOWN row order. Grayscale is the exact integer ITU-R 601 luma
    (299 R + 587 G + 114 B) // 1000 — no float enters, so every
    downstream feature is bit-reproducible. Rows are 4-byte padded per
    the format; positive biHeight means bottom-up storage (flipped
    here), negative means top-down."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    px_off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bpp BMP is decoded in-container "
            f"(got bpp={bpp}, compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        data, dtype=np.uint8, count=h * stride, offset=px_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    bgr = rows.astype(np.int64)
    gray = (299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0]) // 1000
    return w, h, gray


def _decode_ppm(data: bytes):
    """stdlib PPM/PGM decode (no pip dependency): binary P6 (RGB) and
    P5 (grayscale), maxval <= 255 -> (width, height, gray), same exact
    integer luma as _decode_bmp for P6. Header tokens may be separated
    by any whitespace and ``#`` comments per the netpbm spec."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload (P5/P6)")
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm rasters not decoded in-container")
    if data[:2] == b"P5":
        gray = (
            np.frombuffer(data, dtype=np.uint8, count=w * h, offset=i)
            .reshape(h, w)
            .astype(np.int64)
        )
    else:
        rgb = (
            np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
            .reshape(h, w, 3)
            .astype(np.int64)
        )
        gray = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    return w, h, gray


def _decode_png(data: bytes):
    """stdlib PNG decode (no pip dependency — zlib IS the PNG codec):
    8-bit non-interlaced grayscale (color type 0), RGB (2), palette
    (3, PLTE lookup) and RGBA (6), ALL FIVE scanline filters
    (None/Sub/Up/Average/Paeth per the
    spec's byte-wise recurrences) -> (width, height, gray) with the
    same exact integer ITU-R 601 luma as _decode_bmp (RGBA's alpha is
    ignored — luma is over the color channels). This opens the gate
    for the first COMPRESSED image format: unlike BMP/netpbm the
    raster is DEFLATE-streamed and filter-predicted, so a decoder bug
    in stride, filter order, or the Paeth tie-break corrupts pixels
    rather than shifting them — the property test drives all five
    filters over random dims. 16-bit and interlaced (Adam7) PNGs
    still raise (as does JPEG, whose codec is not in the stdlib)."""
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (missing signature)")
    i, idat, ihdr, plte = 8, [], None, None
    while i + 8 <= len(data):
        ln = int.from_bytes(data[i : i + 4], "big")
        typ = data[i + 4 : i + 8]
        if i + 8 + ln > len(data):
            # truncated payloads must fail with a labeled decode error,
            # not a raw zlib/numpy error deep in an executor (r13 advice)
            raise ValueError(
                f"truncated PNG chunk {typ!r}: declares {ln} bytes but "
                f"only {len(data) - i - 8} remain"
            )
        if typ == b"IHDR":
            ihdr = data[i + 8 : i + 8 + ln]
        elif typ == b"PLTE":
            plte = data[i + 8 : i + 8 + ln]
        elif typ == b"IDAT":
            idat.append(data[i + 8 : i + 8 + ln])
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + payload + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8 or ctype not in (0, 2, 3, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB/palette/RGBA PNG is "
            f"decoded in-container (got depth={depth}, color "
            f"type={ctype}, interlace={interlace})"
        )
    if ctype == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing or malformed PLTE chunk")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos
        ).astype(np.int64)
        pos += stride
        if ft == 0:
            cur = row
        elif ft == 2:  # Up: whole-row vectorizable (no intra-row dep)
            cur = (row + prev) % 256
        elif ft == 1:
            # Sub: Recon(x) = Filt(x) + Recon(x-ch) is a per-channel-
            # lane running sum — cumsum mod 256 per lane, vectorized
            # like Up (review r13: the per-byte loop made PNG orders
            # of magnitude slower than the BMP path)
            cur = row.reshape(-1, ch).cumsum(axis=0).reshape(-1) % 256
        elif ft in (3, 4):  # Average/Paeth: inherently sequential in x
            # the left-recurrence cannot be expressed as a numpy scan
            # (floor-halving / 3-way select break associativity), so
            # the loop stays python-int — but PER CHANNEL LANE with the
            # left recon (a) and left-up (c) CARRIED in locals and zip
            # iteration over pre-sliced lanes: no per-byte list index
            # arithmetic, no abs() calls (|p-a| = |b-c| etc. expand to
            # carried differences). Measured 1.42x the r13 flat loop
            # (331 -> 233 ms all-Paeth 512x512 RGBA; Average rows
            # 109 ms). Faster exact paths were tested and REJECTED: the
            # LOCO-I MED clamp is NOT Paeth (differs on 5.5M of 16M
            # byte triples) and a precomputed 511x511 sel(d=a-c,e=b-c)
            # table is timing-neutral (the lookup index math costs what
            # the predicted branches cost) — exact Paeth below ~50 ms
            # needs a C codec; PIL remains the production path.
            rl, pl = row.tolist(), prev.tolist()
            cl = [0] * stride
            for ci in range(ch):
                rlane, plane = rl[ci::ch], pl[ci::ch]
                lane = []
                ap = lane.append
                a = 0
                if ft == 3:
                    for r, b in zip(rlane, plane):
                        a = (r + ((a + b) >> 1)) & 255
                        ap(a)
                else:
                    c = 0
                    for r, b in zip(rlane, plane):
                        # p = a+b-c; pa=|p-a|=|b-c|, pb=|p-b|=|a-c|,
                        # pc=|p-c|=|a+b-2c|; spec tie-break a, b, c
                        d = a - c
                        pb = d if d >= 0 else -d
                        e = b - c
                        pa = e if e >= 0 else -e
                        s = d + e
                        pc = s if s >= 0 else -s
                        if pa <= pb and pa <= pc:
                            pred = a
                        elif pb <= pc:
                            pred = b
                        else:
                            pred = c
                        a = (r + pred) & 255
                        ap(a)
                        c = b
                cl[ci::ch] = lane
            cur = np.array(cl, dtype=np.int64)
        else:
            raise ValueError(f"bad PNG scanline filter {ft}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, ch)
    if ctype == 0:
        gray = px[:, :, 0]
    elif ctype == 3:
        # palette lookup: the raster holds 1-byte indices into the
        # PLTE RGB triples; index through the table then the same
        # exact-integer luma as every other path
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        if int(px[:, :, 0].max(initial=0)) >= len(pal):
            raise ValueError(
                f"palette index out of range: raster references entry "
                f">= PLTE size {len(pal)}"
            )
        rgb = pal[px[:, :, 0]]
        gray = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    else:
        gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    return w, h, gray


_IMAGE_DECODERS = {
    "image/bmp": _decode_bmp,
    "image/x-ms-bmp": _decode_bmp,
    "image/x-portable-pixmap": _decode_ppm,
    "image/x-portable-graymap": _decode_ppm,
    "image/png": _decode_png,
}


def _decode_real(data: bytes, mime: str) -> str:
    """Real-decoder dispatch. audio/wav (r12, stdlib ``wave``),
    BMP/PPM/PGM images (r13, stdlib byte parsing) and PNG (late r13,
    stdlib ``zlib`` + filter reconstruction) are decoded IN-CONTAINER
    — the gate is open for a real format per modality INCLUDING a
    compressed one; JPEG and video still need PIL/av, absent here."""
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        p, samples = _decode_wav(data)
        return f"pcm:{p.framerate}:{p.nchannels}:{p.sampwidth * 8}:{p.nframes}"
    if mime in _IMAGE_DECODERS:
        w, h, gray = _IMAGE_DECODERS[mime](data)
        return f"img:{w}:{h}:{int(gray.sum())}"
    raise NotImplementedError(
        "real decoders for compressed image formats and video (PIL/av) are "
        "not installed in this environment; plug them in here — the "
        "mapInPandas plumbing is decoder-agnostic"
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


def _ahash_bits(gray: "np.ndarray", side: int) -> str:
    """aHash thresholding over an int64 grayscale matrix with EXACT
    integer arithmetic: the image is split into a side x side grid on
    integer boundaries (i*h//side .. (i+1)*h//side — cells may hold
    unequal pixel counts on non-divisible dims), and bit = 1 iff the
    cell MEAN exceeds the global mean, compared by cross-multiplication
    (cell_sum * total_pixels > total_sum * cell_pixels) so no float
    division enters and the hash is bit-reproducible anywhere."""
    h, w = gray.shape
    total_sum = int(gray.sum())
    total_px = h * w
    bits = []
    for i in range(side):
        r0, r1 = i * h // side, (i + 1) * h // side
        for j in range(side):
            c0, c1 = j * w // side, (j + 1) * w // side
            cell = gray[r0:r1, c0:c1]
            bits.append(
                "1"
                if int(cell.sum()) * total_px > total_sum * cell.size
                else "0"
            )
    return "".join(bits)


def image_ahash(
    packed: DataFrame, side: int = 8, cell: int = 2, use_real: bool = False
) -> DataFrame:
    """Perceptual average-hash (aHash) over the multimodal struct —
    the image near-dup fingerprint (resize to a tiny grid, threshold
    each cell against the mean). ``use_real=True`` (r13) opens the
    real-decoder gate for BMP/PPM/PGM/PNG payloads via stdlib parsing
    (_decode_bmp/_decode_ppm/_decode_png — no pip dependency): decode
    to an exact
    integer-luma grayscale matrix, then the SAME integer thresholding
    (_ahash_bits, cross-multiplied means — no float). The
    deterministic stand-in treats the first ``(side*cell)^2`` payload
    bytes (zero-padded) as a square grayscale image. All-integer either
    way: the stand-in's cell value = SUM of its ``cell x cell`` bytes,
    bit = 1 iff ``cell_sum * n_cells > total_sum`` — bit-identical to
    the byte-level SQL oracle. Emitted as a ``side*side``-char bit
    string (a production deployment packs it into 8 bytes; the string
    keeps the differential hash-check trivially cross-engine).

    One Arrow-batched mapInPandas pass, 1 row -> 1 row, numpy block-sum
    per payload; payload bytes never leave the executor."""
    dim = side * cell
    n = dim * dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if use_real:
                    dec = _IMAGE_DECODERS.get(blob["mime"])
                    if dec is None:
                        # same explicit gate as _decode_real — an
                        # unknown mime must not surface as an opaque
                        # KeyError task failure
                        raise NotImplementedError(
                            f"no in-container real decoder for {blob['mime']!r}; "
                            "only BMP/PPM/PGM/PNG decode without PIL/av"
                        )
                    _, _, gray = dec(bytes(blob["data"]))
                    hashes.append(_ahash_bits(gray, side))
                    ids.append(doc_id)
                    continue
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
