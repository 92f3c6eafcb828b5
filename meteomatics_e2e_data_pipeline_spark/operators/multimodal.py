"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side mechanics are real and tested — schema, partitioning,
Arrow-batched ``mapInPandas`` signature, deterministic feature extraction.
The actual media *decode* (image/audio/video libraries are not in this
container) is stubbed behind clearly-marked ``NotImplementedError``
functions; swapping the stub for Pillow/torchaudio/pyav changes only the
inner loop of ``_feature_batches``, not the Spark plan.

Design for 100 TB: payloads never leave the executor as Python objects
row-by-row — ``mapInPandas`` moves whole Arrow batches, and the feature
schema is declared up front so downstream stages stay columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, payload_md5 string, fake_frames int"
)


def to_media_table(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   media_type: str = "image/fake") -> DataFrame:
    """Wrap a source column as an opaque binary payload with a typed
    metadata struct — the storage shape for any media modality. (Here the
    payload is the utf-8 text bytes; for real media it is the encoded
    image/audio/video blob, same schema.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("media_meta"),
    )


# ---------------------------------------------------------------------------
# Pure-stdlib BMP codec (24-bit uncompressed, BITMAPINFOHEADER) — the one
# format the decode path runs END-TO-END on real pixels without external
# libraries. Formats needing Pillow/pyav still raise NotImplementedError.
# ---------------------------------------------------------------------------

import struct


def _is_bmp(raw: bytes) -> bool:
    """Strict 24-bit-uncompressed-BMP validation — magic alone is not
    enough (a utf-8 text payload can legitimately start with "BM"), so
    the declared file size must equal the actual byte length and the
    header fields must be coherent before the real-pixel path engages."""
    if len(raw) < 54 or raw[:2] != b"BM":
        return False
    try:
        file_size = struct.unpack_from("<I", raw, 2)[0]
        data_offset = struct.unpack_from("<I", raw, 10)[0]
        hdr_size = struct.unpack_from("<I", raw, 14)[0]
        width = struct.unpack_from("<i", raw, 18)[0]
        height = struct.unpack_from("<i", raw, 22)[0]
        bpp = struct.unpack_from("<H", raw, 28)[0]
        compression = struct.unpack_from("<I", raw, 30)[0]
    except struct.error:
        return False
    return (file_size == len(raw) and hdr_size == 40 and bpp == 24
            and compression == 0 and width > 0 and height != 0
            and 54 <= data_offset < len(raw))


def _bmp_decode(raw: bytes):
    """(width, height, rows) from a 24-bit BMP; rows are top-down lists
    of (r, g, b) tuples (BMP stores bottom-up BGR with 4-byte row
    padding — both are undone here)."""
    if not _is_bmp(raw):
        raise ValueError("not a valid 24-bit uncompressed BMP")
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    width = struct.unpack_from("<i", raw, 18)[0]
    height = struct.unpack_from("<i", raw, 22)[0]
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = []
    for y in range(h):
        src_y = (h - 1 - y) if bottom_up else y
        off = data_offset + src_y * stride
        row = []
        for x in range(width):
            b, g, r = raw[off + 3 * x: off + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return width, h, rows


def _bmp_encode(rows) -> bytes:
    """24-bit bottom-up BMP bytes from top-down (r, g, b) rows."""
    h, w = len(rows), len(rows[0])
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    pix = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in rows[y]) + pad
        for y in range(h - 1, -1, -1))
    header = (struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix


def _nn_resize(rows, tw: int, th: int):
    """Nearest-neighbor resample of top-down pixel rows."""
    h, w = len(rows), len(rows[0])
    return [[rows[(y * h) // th][(x * w) // tw] for x in range(tw)]
            for y in range(th)]


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (8-bit RGB, all five scanline filters) — the
# second REAL image format. PNG's pixel stream is zlib-deflated, which
# the stdlib decompresses, so this is a full decode of genuinely
# compressed bytes; only palette/interlaced/16-bit variants still defer
# to Pillow's NotImplementedError seam.
# ---------------------------------------------------------------------------

import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _is_png(raw: bytes) -> bool:
    """Signature + an 8-bit RGB non-interlaced IHDR — the variant the
    stdlib codec fully handles."""
    if len(raw) < 33 or raw[:8] != _PNG_SIG or raw[12:16] != b"IHDR":
        return False
    depth, ctype, comp, filt, interlace = raw[24:29]
    return (depth, ctype, comp, filt, interlace) == (8, 2, 0, 0, 0)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_decode(raw: bytes):
    """(width, height, rows) from an 8-bit RGB PNG: chunk walk → IDAT
    concat → zlib inflate → per-scanline filter reconstruction (None /
    Sub / Up / Average / Paeth)."""
    if not _is_png(raw):
        raise ValueError("not an 8-bit RGB non-interlaced PNG")
    w = int.from_bytes(raw[16:20], "big")
    h = int.from_bytes(raw[20:24], "big")
    idat = bytearray()
    off = 8
    while off + 8 <= len(raw):
        ln = int.from_bytes(raw[off:off + 4], "big")
        ctype = raw[off + 4:off + 8]
        if ctype == b"IDAT":
            idat += raw[off + 8:off + 8 + ln]
        if ctype == b"IEND":
            break
        off += 12 + ln
    stream = zlib.decompress(bytes(idat))
    stride, bpp = w * 3, 3
    prior = bytearray(stride)
    rows = []
    for y in range(h):
        base = y * (stride + 1)
        filt = stream[base]
        line = bytearray(stream[base + 1: base + 1 + stride])
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if filt == 1:
                line[i] = (line[i] + a) & 0xFF
            elif filt == 2:
                line[i] = (line[i] + b) & 0xFF
            elif filt == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif filt == 4:
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
            elif filt != 0:
                raise ValueError(f"unknown PNG filter {filt}")
        rows.append([(line[3 * x], line[3 * x + 1], line[3 * x + 2])
                     for x in range(w)])
        prior = line
    return w, h, rows


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big"))


def _png_encode(rows, filter_of_row=None) -> bytes:
    """8-bit RGB PNG bytes from top-down (r, g, b) rows.
    ``filter_of_row(y)`` picks the scanline filter (default None/0);
    the synthetic tables rotate through all five so the decode path's
    filter reconstruction is genuinely exercised end-to-end."""
    h, w = len(rows), len(rows[0])
    stride, bpp = w * 3, 3
    raw_lines = [bytes(v for px in row for v in px) for row in rows]
    out = bytearray()
    prior = bytes(stride)
    for y, line in enumerate(raw_lines):
        filt = (filter_of_row(y) if filter_of_row else 0) % 5
        enc = bytearray(stride)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            pred = (0, a, b, (a + b) // 2, _paeth(a, b, c))[filt]
            enc[i] = (line[i] - pred) & 0xFF
        out += bytes([filt]) + enc
        prior = line
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def decode_image(payload: bytes):
    """Decode an image payload to (width, height, rows of (r, g, b)).

    REAL end-to-end for 24-bit uncompressed BMP, 8-bit RGB PNG (the
    codec inflates real zlib streams), and baseline JFIF JPEG (marker
    parse, Huffman entropy decode, dequant, numpy IDCT — see
    operators/jpegcodec.py); progressive JPEG and any format beyond
    these still requires Pillow, which is not in this container, and
    raises NotImplementedError — swapping the stub for PIL.Image.open
    changes only this function, not the Spark plan."""
    raw = bytes(payload)
    if _is_bmp(raw):
        return _bmp_decode(raw)
    if _is_png(raw):
        return _png_decode(raw)
    from .jpegcodec import is_jpeg, jpeg_decode
    if is_jpeg(raw):
        return jpeg_decode(raw)
    raise NotImplementedError(
        "only BMP / PNG / baseline JPEG decode without Pillow; "
        "not in container")


def sample_frames(payload: bytes, every_n: int):
    """Sample every ``every_n``-th frame of a video payload.

    REAL for MJPEG (concatenated baseline JPEG frames — the demux walks
    the marker structure, skipped frames are never entropy-decoded);
    compressed inter-frame video (h264/vp9) needs pyav, which is not in
    this container, and raises NotImplementedError."""
    from .jpegcodec import is_jpeg, jpeg_decode, mjpeg_split
    raw = bytes(payload)
    if is_jpeg(raw):
        frames = mjpeg_split(raw)
        return [(f_idx, jpeg_decode(frames[f_idx]))
                for f_idx in range(0, len(frames), every_n)]
    raise NotImplementedError("video decode requires pyav; not in container")


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction. Deterministic fake features stand
    in for the decode step (see module docstring); everything else — batch
    shape, schema, hashing — is exactly what a real extractor does."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": payloads.map(len).astype("int32"),
            "payload_md5": payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()),
            "fake_frames": payloads.map(lambda b: len(b) % 7).astype("int32"),
        })


def extract_features(media: DataFrame) -> DataFrame:
    """Run the (stubbed) extractor over Arrow batches. One narrow pass —
    no shuffle; parallelism is the input partitioning."""
    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string, frame_bytes int"


def extract_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling plumbing — the 1-to-N ``mapInPandas`` shape (one
    input payload → several frame rows), which is what a video sampler
    actually emits. The decode is the deterministic fake standing in for
    :func:`sample_frames` (pyav absent); frame count and per-frame bytes
    derive from the payload, so the Spark mechanics — batch iteration,
    row fan-out inside a batch, declared frame schema, downstream
    columnar shape — are fully real and tested. Row-local: no shuffle,
    fan-out happens inside the Arrow batch, never via explode of
    driver-built rows.
    """
    if every_n <= 0:
        raise ValueError("every_n must be positive")

    def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, md5s, sizes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                # fake "video": one frame per every_n * 16 bytes, ≥ 1
                n_frames = max(1, len(raw) // (every_n * 16))
                for i in range(n_frames):
                    chunk = raw[i * every_n * 16:(i + 1) * every_n * 16]
                    ids.append(doc_id)
                    idxs.append(i * every_n)
                    md5s.append(hashlib.md5(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_md5": pd.Series(md5s, dtype="object"),
                "frame_bytes": pd.Series(sizes, dtype="int32"),
            })

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_frame_batches, schema=FRAME_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload, returning the re-encoded bytes.

    REAL for 24-bit BMP: decode → nearest-neighbor resample → re-encode
    (pure stdlib, deterministic). Other formats raise
    NotImplementedError until Pillow is available."""
    w, h, rows = decode_image(payload)  # raises NotImplementedError if not BMP
    del w, h
    return _bmp_encode(_nn_resize(rows, width, height))


RESIZE_SCHEMA = ("doc_id bigint, payload binary, width int, height int, "
                 "n_bytes int")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize — the binary-in/binary-out ``mapInPandas`` shape:
    payload → decoded image → resized image → re-encoded payload, with
    the new dimensions carried as typed columns.

    Payloads that validate as 24-bit BMP (see :func:`_is_bmp` — strict
    header coherence, not just magic bytes) take the REAL pixel path:
    stdlib decode → nearest-neighbor resample → BMP re-encode. Anything
    else (including the driver's text-bytes payloads) keeps the
    deterministic fake: ``width*height//8`` bytes from an
    md5-in-counter-mode HEX stream seeded by (payload, target dims), so
    output size scales with the target roughly as a real re-encode
    does, and reruns are bit-identical. (Hex text rather than raw digest
    bytes so the DuckDB oracle — whose ``md5`` takes VARCHAR only — can
    rebuild the identical payload.) Everything Spark-side — Arrow
    batches both directions, binary columns in AND out, declared schema,
    row-local no-shuffle plan — is the same for both paths.
    """
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")
    n_out = max(1, width * height // 8)

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            outs, sizes = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if _is_bmp(raw):
                    out = resize_image(raw, width, height)
                else:
                    seed = hashlib.md5(
                        raw + f"|{width}x{height}".encode()).hexdigest()
                    # deterministic hex stream of the target size (md5 in
                    # counter mode) — the fake stand-in for the re-encode
                    stream = ""
                    ctr = 0
                    while len(stream) < n_out:
                        stream += hashlib.md5(
                            f"{seed}|{ctr}".encode()).hexdigest()
                        ctr += 1
                    out = stream[:n_out].encode()
                outs.append(out)
                sizes.append(len(out))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": pd.Series(outs, dtype="object"),
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "n_bytes": pd.Series(sizes, dtype="int32"),
            })

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-stdlib WAV codec (16-bit PCM mono) — the audio modality's
# end-to-end path, mirroring the BMP one: encode/decode run on real
# RIFF/WAVE bytes via the stdlib `wave` module, no torchaudio needed.
# ---------------------------------------------------------------------------

AUDIO_RATE = 16_000
AUDIO_SAMPLES = 160  # 10 ms probe clip per document


def synth_samples(doc_id: int, n: int = AUDIO_SAMPLES) -> list[int]:
    """Deterministic int16 test signal per document — pure integer
    formula, so the DuckDB oracle regenerates the identical samples and
    a lossy encode/decode path could never hash-match."""
    return [((doc_id * 31 + i * 17) % 65536) - 32768 for i in range(n)]


def encode_wav(samples, rate: int = AUDIO_RATE) -> bytes:
    """16-bit PCM mono RIFF/WAVE bytes via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_audio(payload: bytes):
    """Decode a WAV payload to (rate, samples). REAL end-to-end for
    16-bit PCM mono; compressed formats (mp3/opus/...) need external
    codecs not in this container and raise NotImplementedError —
    swapping this function for torchaudio/soundfile changes nothing in
    the Spark plan, exactly like the image decode seam."""
    import io
    import wave

    raw = bytes(payload)
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE decodes without external audio codecs")
    with wave.open(io.BytesIO(raw), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise NotImplementedError("only 16-bit PCM mono supported")
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return rate, list(struct.unpack(f"<{len(frames) // 2}h", frames))


AUDIO_SCHEMA = ("doc_id long, sample_rate int, n_samples long, "
                "duration_s double, rms double, peak long")


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over DECODED samples:
    duration, RMS energy, absolute peak — the triage features an audio
    data pipeline gates on (silence/clipping filters) before any model
    touches the clip. Row-local mapInPandas, no shuffle; RMS is emitted
    UNROUNDED (integer sum of squares is exact, one sqrt) and display
    rounding happens plan-side so cross-engine rounding conventions
    never meet python's banker's rounding."""
    import math

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "sample_rate", "n_samples",
                     "duration_s", "rms", "peak")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_audio(payload)
                n = len(samples)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_s"].append(n / float(rate))
                rows["rms"].append(
                    math.sqrt(sum(s * s for s in samples) / n) if n else 0.0)
                rows["peak"].append(max(abs(s) for s in samples) if n else 0)
            out = pd.DataFrame(rows)
            out["sample_rate"] = out["sample_rate"].astype("int32")
            yield out

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_batches, schema=AUDIO_SCHEMA)


def synth_wav_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of REAL WAV payloads (deterministic per-doc signal,
    stdlib-encoded) — the audio twin of ``to_media_table``'s text-byte
    fake: every payload is a decodable RIFF/WAVE file."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [encode_wav(synth_samples(int(d)))
                        for d in pdf[id_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    from .textops import spread_for_fanout
    return spread_for_fanout(docs.select(id_col), id_col) \
        .mapInPandas(_batches, schema="doc_id long, payload binary")


# ---------------------------------------------------------------------------
# PNG round-trip plumbing: a synthetic per-doc RGB image (pure integer
# pixel formula, so the DuckDB oracle regenerates the channel sums in
# closed form) encoded as a REAL zlib-deflated PNG with the scanline
# filter rotating through all five types — the decode path must undo
# Sub/Up/Average/Paeth reconstruction to hash-match.
# ---------------------------------------------------------------------------

PNG_W, PNG_H = 16, 12


def synth_pixels(doc_id: int, w: int = PNG_W, h: int = PNG_H):
    """Deterministic RGB grid per document — same role as
    ``synth_samples`` for audio: a pure integer formula both engines
    can evaluate."""
    return [[((doc_id * 31 + y * 7 + x * 3) % 256,
              (doc_id * 17 + y * 5 + x * 11) % 256,
              (doc_id * 13 + y * 3 + x * 7) % 256)
             for x in range(w)] for y in range(h)]


def synth_png_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of REAL PNG payloads (deterministic pixels, stdlib
    zlib-deflated, per-row filter = y % 5)."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _png_encode(synth_pixels(int(d)), filter_of_row=lambda y: y)
                for d in pdf[id_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    from .textops import spread_for_fanout
    return spread_for_fanout(docs.select(id_col), id_col) \
        .mapInPandas(_batches, schema="doc_id long, payload binary")


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Decode (any supported format) → nearest-neighbor resample →
    re-encode as PNG (filter 0) — the PNG counterpart of
    :func:`resize_image`'s BMP path."""
    _, _, rows = decode_image(payload)
    return _png_encode(_nn_resize(rows, width, height))


def png_resize_features(media: DataFrame, width: int,
                        height: int) -> DataFrame:
    """The full codec round trip under one query: decode the real PNG,
    nearest-neighbor resample, RE-ENCODE as PNG, decode THAT, and emit
    the resized image's exact channel sums — a defect anywhere in
    inflate, filter reconstruction, resampling, or deflate-encode
    breaks the closed-form oracle. Row-local mapInPandas."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height",
                                    "sum_r", "sum_g", "sum_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_image(resize_png(payload, width, height))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(sum(p[0] for r in px for p in r))
                rows["sum_g"].append(sum(p[1] for r in px for p in r))
                rows["sum_b"].append(sum(p[2] for r in px for p in r))
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_batches, schema=PNG_FEATURE_SCHEMA)


PNG_FEATURE_SCHEMA = ("doc_id long, width int, height int, "
                      "sum_r long, sum_g long, sum_b long")


def png_features(media: DataFrame) -> DataFrame:
    """Arrow-batched PNG decode + exact integer channel sums — the
    pixel-statistics profile an image-curation gate runs (dead/flat
    image detection). Row-local mapInPandas, no shuffle; all outputs
    are integers so the oracle comparison is exact."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height",
                                    "sum_r", "sum_g", "sum_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_image(payload)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(sum(p[0] for r in px for p in r))
                rows["sum_g"].append(sum(p[1] for r in px for p in r))
                rows["sum_b"].append(sum(p[2] for r in px for p in r))
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_batches, schema=PNG_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Concatenated-BMP container — the video modality's end-to-end path: a
# multi-frame payload whose frame boundaries are REALLY parsed (each
# frame's declared BMP file size) and whose sampled frames are really
# pixel-decoded. Compressed video (h264/vp9) still needs pyav and keeps
# the honest NotImplementedError stub in `sample_frames`.
# ---------------------------------------------------------------------------

VIDEO_FRAMES = 3
FRAME_W = FRAME_H = 2


def synth_frame_rows(doc_id: int, f: int):
    """Deterministic top-down (r, g, b) rows for frame ``f`` of a
    document's clip — integer formula the oracle regenerates."""
    return [[(((doc_id * 7 + f * 13 + y * 2 + x) % 256),
              ((doc_id * 7 + f * 13 + y * 2 + x) % 256 + 1) % 256,
              ((doc_id * 7 + f * 13 + y * 2 + x) % 256 + 2) % 256)
             for x in range(FRAME_W)] for y in range(FRAME_H)]


def synth_bmp_container(doc_id: int, n_frames: int = VIDEO_FRAMES) -> bytes:
    """Concatenated-BMP clip payload for one document."""
    return b"".join(_bmp_encode(synth_frame_rows(doc_id, f))
                    for f in range(n_frames))


def split_bmp_container(raw: bytes) -> list[bytes]:
    """REAL container demux: walk the payload slicing each frame at its
    declared BMP file size; anything that doesn't parse as wall-to-wall
    BMP frames needs pyav and raises, mirroring the other decode seams."""
    frames, off = [], 0
    raw = bytes(raw)
    while off < len(raw):
        if raw[off:off + 2] != b"BM" or off + 6 > len(raw):
            raise NotImplementedError(
                "not a concatenated-BMP container; video needs pyav")
        size = struct.unpack_from("<I", raw, off + 2)[0]
        if size < 54 or off + size > len(raw):
            raise NotImplementedError("corrupt container frame size")
        frames.append(raw[off:off + size])
        off += size
    return frames


FRAME_SAMPLE_SCHEMA = ("doc_id long, frame_idx int, width int, "
                       "height int, pixel_sum long")


def sample_container_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Frame sampling with REAL decode: demux the container, keep every
    ``every_n``-th frame, pixel-decode the kept frames only (the skip
    is the whole point — decode cost scales with the sample, not the
    clip), reduce each to its RGB pixel sum. Row-local mapInPandas
    fan-out, one output row per sampled frame, no shuffle."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "width",
                                    "height", "pixel_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = split_bmp_container(payload)
                for f_idx in range(0, len(frames), every_n):
                    w, h, px = _bmp_decode(frames[f_idx])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f_idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["pixel_sum"].append(
                        sum(r + g + b for row in px for (r, g, b) in row))
            out = pd.DataFrame(rows)
            for c in ("frame_idx", "width", "height"):
                out[c] = out[c].astype("int32")
            yield out

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_batches, schema=FRAME_SAMPLE_SCHEMA)


def synth_video_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of real concatenated-BMP clip payloads."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [synth_bmp_container(int(d)) for d in pdf[id_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    from .textops import spread_for_fanout
    return spread_for_fanout(docs.select(id_col), id_col) \
        .mapInPandas(_batches, schema="doc_id long, payload binary")


# ---------------------------------------------------------------------------
# Gzipped-text payloads — the compressed-text-lake modality: training
# corpora overwhelmingly arrive as gzip members (WARC/WET, .jsonl.gz);
# the decode step is therefore part of the measurement pass, not a
# separate pre-job. Deterministic framing: zlib's gzip encoder (wbits
# 16+15) writes MTIME=0 and a fixed OS byte, so payload bytes depend
# only on (text, level) — reproducible across runs and partitions.
# ---------------------------------------------------------------------------

GZIP_LEVEL = 6
_GZ_WBITS = 16 + 15   # RFC-1952 gzip framing on encode
_GUNZIP_WBITS = 32 + 15  # auto-detect gzip or raw zlib on decode


def gzip_bytes(text: str, level: int = GZIP_LEVEL) -> bytes:
    """One deterministic gzip member of the text's UTF-8 bytes."""
    co = zlib.compressobj(level, zlib.DEFLATED, _GZ_WBITS)
    return co.compress(text.encode("utf-8")) + co.flush()


def gunzip_text(payload: bytes) -> str:
    """Inflate one gzip (or raw zlib) member back to text."""
    return zlib.decompress(bytes(payload), _GUNZIP_WBITS).decode("utf-8")


def synth_gzip_table(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Compressed-text table (doc_id, payload binary): each document's
    text as a real gzip member — the ingest-side simulation feeding
    :func:`gzip_text_features`, same contract as ``synth_png_table``
    (real stdlib codec, deterministic bytes, row-local mapInPandas)."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [gzip_bytes(t) for t in pdf[text_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    from .textops import spread_for_fanout
    return (spread_for_fanout(docs.select(id_col, text_col), id_col)
            .mapInPandas(_batches, schema="doc_id long, payload binary"))


GZIP_FEATURE_SCHEMA = ("doc_id long, n_chars long, n_tokens long, "
                       "n_bytes_raw long, text_md5 string")


def gzip_text_features(media: DataFrame) -> DataFrame:
    """Decompress-and-measure in ONE pass over a compressed-text table:
    inflate each gzip payload and emit the decoded document's length,
    whitespace token count, raw byte size, and md5 — every output
    derives from the ROUND-TRIPPED text, so the oracle (the same
    measures computed from the uncompressed source column) fails on
    any inflate defect. Row-local mapInPandas, Arrow-batched; no
    shuffle — at 100 TB this runs as wide as the scan."""
    import hashlib
    import re

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_chars", "n_tokens",
                                    "n_bytes_raw", "text_md5")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                t = gunzip_text(payload)
                rows["doc_id"].append(doc_id)
                rows["n_chars"].append(len(t))
                # match regexp_split_to_array(trim(text), '\s+') exactly:
                # re.split on the trimmed text returns [''] for empty
                # input, length 1, as DuckDB/Spark do
                rows["n_tokens"].append(len(re.split(r"\s+", t.strip())))
                rows["n_bytes_raw"].append(len(t.encode("utf-8")))
                rows["text_md5"].append(
                    hashlib.md5(t.encode("utf-8")).hexdigest())
            yield pd.DataFrame(rows)

    from .textops import spread_for_fanout
    return (spread_for_fanout(media.select("doc_id", "payload"), "doc_id")
            .mapInPandas(_batches, schema=GZIP_FEATURE_SCHEMA))


# ---------------------------------------------------------------------------
# JPEG family (round 8): a REAL baseline JFIF codec (operators/
# jpegcodec.py) closes the "JPEG needs Pillow" gap. The oracle trick for
# a LOSSY codec: pixels constant within each 8x8 block have all AC
# coefficients exactly zero, and with the DC quant step at 8 the
# quantised DC is exactly v-128 — so encode→decode is bit-exact on this
# family and DuckDB regenerates the channel sums in closed form, while
# the decoder itself is fully general (random-image unit tests drive
# every Huffman category / AC run path).
# ---------------------------------------------------------------------------

JPEG_W = JPEG_H = 16  # 2x2 grid of 8x8 blocks: exercises DC-diff coding


def synth_jpeg_gray(doc_id: int, frame: int = 0,
                    w: int = JPEG_W, h: int = JPEG_H):
    """Block-constant grayscale plane: block (bx, by) of frame ``frame``
    has value (doc_id*37 + frame*19 + by*11 + bx*5) % 256 — the pure
    integer formula both engines evaluate."""
    import numpy as np
    plane = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            v = (doc_id * 37 + frame * 19 + by * 11 + bx * 5) % 256
            plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
    return plane


def synth_jpeg_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of REAL baseline JPEG payloads (Huffman entropy
    coding, Annex K tables, exact-DC quantisation)."""
    from .jpegcodec import EXACT_DC_QUANT, jpeg_encode

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [jpeg_encode([synth_jpeg_gray(int(d))],
                                    quant=EXACT_DC_QUANT)
                        for d in pdf[id_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    from .textops import spread_for_fanout
    return spread_for_fanout(docs.select(id_col), id_col) \
        .mapInPandas(_batches, schema="doc_id long, payload binary")


JPEG_FEATURE_SCHEMA = "doc_id long, width int, height int, sum_gray long"


def jpeg_features(media: DataFrame) -> DataFrame:
    """Arrow-batched JPEG decode + exact integer gray sum — same
    curation-gate profile as the PNG/BMP paths, through the full
    Huffman + dequant + IDCT pipeline. Row-local mapInPandas."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height",
                                    "sum_gray")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_image(payload)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_gray"].append(sum(p[0] for r in px for p in r))
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_batches, schema=JPEG_FEATURE_SCHEMA)


MJPEG_FRAMES = 3


def synth_mjpeg_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table of real MJPEG clips: ``MJPEG_FRAMES`` concatenated
    baseline JPEG frames per document."""
    from .jpegcodec import EXACT_DC_QUANT, jpeg_encode

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                b"".join(jpeg_encode([synth_jpeg_gray(int(d), frame=f)],
                                     quant=EXACT_DC_QUANT)
                         for f in range(MJPEG_FRAMES))
                for d in pdf[id_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    from .textops import spread_for_fanout
    return spread_for_fanout(docs.select(id_col), id_col) \
        .mapInPandas(_batches, schema="doc_id long, payload binary")


MJPEG_FEATURE_SCHEMA = ("doc_id long, frame_idx int, width int, "
                        "height int, sum_gray long")


def mjpeg_frame_features(media: DataFrame, every_n: int) -> DataFrame:
    """Video-modality JPEG path: structural MJPEG demux, sample every
    ``every_n``-th frame, entropy-decode ONLY the sampled frames
    (sampling exists to cut decode cost), reduce each to its exact gray
    sum. One output row per sampled frame; row-local mapInPandas."""
    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "width",
                                    "height", "sum_gray")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for f_idx, (w, h, px) in sample_frames(payload, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f_idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sum_gray"].append(
                        sum(p[0] for r in px for p in r))
            out = pd.DataFrame(rows)
            for c in ("frame_idx", "width", "height"):
                out[c] = out[c].astype("int32")
            yield out

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_batches, schema=MJPEG_FEATURE_SCHEMA)
