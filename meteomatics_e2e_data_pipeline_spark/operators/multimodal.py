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


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image decode (PIL.Image.open) — library not available in
    this environment. The Spark plumbing around it is real and tested."""
    raise NotImplementedError("image decode requires Pillow; not in container")


def sample_frames(payload: bytes, every_n: int):  # pragma: no cover - stub
    """STUB: real video frame sampling (pyav) — not in container."""
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


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover
    """STUB: real image resize (PIL.Image.resize) — library not in this
    container. The Spark plumbing around it is real and tested."""
    raise NotImplementedError("image resize requires Pillow; not in container")


RESIZE_SCHEMA = ("doc_id bigint, payload binary, width int, height int, "
                 "n_bytes int")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing — the binary-in/binary-out ``mapInPandas`` shape:
    payload → decoded image → resized image → re-encoded payload, with
    the new dimensions carried as typed columns. The decode/resize inner
    loop is the deterministic fake standing in for :func:`resize_image`
    (Pillow absent): the fake emits ``width*height//8`` bytes drawn from
    an md5-in-counter-mode HEX stream seeded by (payload, target dims),
    so output size scales with the target roughly as a real re-encode
    does, and reruns are bit-identical. (Hex text rather than raw digest
    bytes so the DuckDB oracle — whose ``md5`` takes VARCHAR only — can
    rebuild the identical payload.) Everything Spark-side — Arrow
    batches both directions, binary columns in AND out, declared schema,
    row-local no-shuffle plan — is exactly the real operator's shape.
    """
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")
    n_out = max(1, width * height // 8)

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            outs = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
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
                outs.append(stream[:n_out].encode())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": pd.Series(outs, dtype="object"),
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "n_bytes": pd.Series([n_out] * len(pdf), dtype="int32"),
            })

    from .textops import spread_for_fanout
    return spread_for_fanout(media.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)
