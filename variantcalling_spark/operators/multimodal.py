"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``BinaryType`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing (schema, partitioning, batch iteration, UDF
signatures) is real and tested; the actual media decoders are stubbed —
the image/audio libraries are not in this container — behind
``NotImplementedError`` with a deterministic byte-level featurizer
standing in so pipelines run end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, content binary"
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, first_byte int, "
    "last_byte int, byte_sum bigint"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media ingest: utf-8 bytes of the text as an opaque binary
    column. Real ingest would read image/audio bytes from object storage
    (binaryFile datasource) with the same downstream schema."""
    return df.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    )


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """STUB: image decode requires pillow/opencv (not in this container)."""
    raise NotImplementedError(
        "image decoding not available in this environment; "
        "plug a decoder into featurize_binary's batch loop"
    )


def decode_audio(content: bytes):  # pragma: no cover - stub by design
    """STUB: audio decode requires soundfile/ffmpeg (not in this container)."""
    raise NotImplementedError("audio decoding not available in this environment")


def featurize_binary(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Byte-level feature extraction over binary payloads via mapInPandas.

    The Arrow batch iterator is the real production shape: each pandas
    batch holds raw bytes; a decoder would run here (resize / frame
    sample / spectrogram). The deterministic byte features keep the
    pipeline testable without media libraries.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len).astype("int32"),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": content.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                    "byte_sum": content.map(lambda b: int(sum(b))).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, n_bytes int, checksum bigint"
_M31 = 2147483647


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 2
) -> DataFrame:
    """Frame sampling over binary payloads: split each payload into
    fixed-size frames, keep every ``every_n``-th, emit one row per kept
    frame with a rolling byte checksum — the video-frame-sampling shape
    (one input row -> many output rows) as an Arrow-batched mapInPandas
    stage. A real pipeline would decode/resize each kept frame in the
    same loop; the checksum stands in deterministically (and, for ASCII
    payloads, equals the char-fold the SQL oracle can compute)."""

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if not len(content):
                    continue
                n_frames = (len(content) - 1) // frame_bytes + 1
                for idx in range(0, n_frames, every_n):
                    frame = content[idx * frame_bytes : (idx + 1) * frame_bytes]
                    acc = 0
                    for byte in frame:
                        acc = (acc * 31 + byte) % _M31
                    ids.append(doc_id)
                    idxs.append(idx)
                    sizes.append(len(frame))
                    sums.append(acc)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "n_bytes": pd.array(sizes, dtype="int32"),
                    "checksum": pd.array(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(explode_frames, schema=FRAME_SCHEMA)
