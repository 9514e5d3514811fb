"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``BinaryType`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing (schema, partitioning, batch iteration, UDF
signatures) is real and tested. Media decode is flag-gated: with
``VCSPARK_REAL_DECODERS=1`` the real decoders (pillow / soundfile) run
and raise on undecodable payloads; by default a deterministic byte-level
fake with the identical array contract stands in, keeping q102/q103's
SQL value oracles bit-stable in every environment (the libraries are
not in this container).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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


IMG_W = 32
IMG_C = 3
_AUDIO_MUL = 37


def decode_image_fake(content: bytes) -> "np.ndarray":
    """Deterministic stand-in decoder: tile the payload bytes row-major
    into a (H, 32, 3) uint8 array, H = ceil(len/96) (1 for empty
    payloads). Every downstream stat is a pure function of the bytes, so
    the whole decode->featurize pipeline is oracle-checkable in SQL."""
    n = len(content)
    h = max(1, -(-n // (IMG_W * IMG_C)))
    total = h * IMG_W * IMG_C
    if n == 0:
        return np.zeros((h, IMG_W, IMG_C), dtype=np.uint8)
    buf = np.frombuffer(content, dtype=np.uint8)
    reps = -(-total // n)
    return np.tile(buf, reps)[:total].reshape(h, IMG_W, IMG_C)


def decode_audio_fake(content: bytes) -> "np.ndarray":
    """Deterministic stand-in decoder: one int16 sample per payload byte,
    ``(b * 37) % 256 - 128`` — sign-mixing so zero-crossing stats are
    nontrivial on ASCII payloads, and SQL-reproducible."""
    if not len(content):
        return np.zeros(0, dtype=np.int16)
    buf = np.frombuffer(content, dtype=np.uint8).astype(np.int64)
    return ((buf * _AUDIO_MUL) % 256 - 128).astype(np.int16)


def _real_decoders_enabled() -> bool:
    """Real decoders (pillow/soundfile) run only when explicitly opted in
    via ``VCSPARK_REAL_DECODERS=1``. The default is the deterministic
    fake: q102/q103's SQL oracles are pure byte functions, so an
    environment where pillow happens to decode a payload would silently
    change results (and a try/except fallback would also swallow genuine
    decode bugs). Opt-in keeps oracle-checked runs bit-stable everywhere
    while production can flip one env var to get real media decode."""
    import os

    return os.environ.get("VCSPARK_REAL_DECODERS", "") == "1"


def decode_image(content: bytes):
    """Decode an image payload to an (H, W, C) uint8 array.

    Under ``VCSPARK_REAL_DECODERS=1`` the real branch runs (raising on
    undecodable payloads rather than masking them): uncompressed 24-bit
    BMP decodes through the vendored stdlib codec
    (``operators/media_codecs.py`` — no dependency, so this REAL format
    round-trips in CI), every other format through pillow. Otherwise
    the deterministic fake — same array contract, so flipping the flag
    changes no downstream plumbing."""
    if _real_decoders_enabled():
        from variantcalling_spark.operators import media_codecs

        if media_codecs.is_bmp(content):
            try:
                return media_codecs.decode_bmp(content)
            except ValueError as codec_err:
                # BMP variant the vendored codec doesn't cover (palette,
                # 32-bit, top-down): fall through to pillow when present
                # rather than failing a payload the library branch could
                # decode; without pillow the codec's error stands
                try:
                    import PIL  # noqa: F401
                except ImportError:
                    raise codec_err
        import io  # pragma: no cover - pillow absent here

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    return decode_image_fake(content)


def decode_audio(content: bytes):
    """Decode an audio payload to a 1-D int16 sample array (stereo
    averaged to mono). Under ``VCSPARK_REAL_DECODERS=1``: RIFF/WAVE
    PCM-16 decodes through the vendored stdlib codec (CI-executable,
    no dependency), other formats through soundfile; otherwise the
    deterministic fake."""
    if _real_decoders_enabled():
        from variantcalling_spark.operators import media_codecs

        if media_codecs.is_wav(content):
            try:
                return media_codecs.decode_wav_pcm16(content)[0]
            except Exception as codec_err:
                # non-PCM-16 WAV (float/PCM-24/ADPCM): fall through to
                # soundfile when present (same rationale as decode_image);
                # without it the codec's error stands
                try:
                    import soundfile  # noqa: F401
                except ImportError:
                    raise codec_err
        import io  # pragma: no cover - soundfile absent here

        import soundfile

        data, _rate = soundfile.read(io.BytesIO(content), dtype="int16")
        return data if data.ndim == 1 else data.mean(axis=1).astype("int16")
    return decode_audio_fake(content)


def resize_nearest(img: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resize via pure numpy index maps (a real resize,
    not a stub): source row/col of output (y, x) is floor(y*H/out_h),
    floor(x*W/out_w)."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


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


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, height int, width int, mean_r double, mean_g double, "
    "mean_b double, resized_checksum bigint"
)
AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples int, rms double, n_zero_crossings int"
)


def image_features(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Decode -> per-channel stats -> nearest-neighbor resize -> resized
    checksum, as one Arrow-batched mapInPandas stage (the production
    image-featurization shape: decoder and resize run inside the batch
    loop, never row-at-a-time Python in the plan).

    With the deterministic fake decoder the means and checksum are pure
    byte functions, so the stage gets a full SQL value oracle (q102)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, mr, mg, mb, cks = [], [], [], [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                img = decode_image(content)
                h, w = img.shape[0], img.shape[1]
                means = img.reshape(-1, IMG_C).mean(axis=0, dtype=np.float64)
                resized = resize_nearest(img, out_h, out_w)
                acc = 0
                for v in resized.reshape(-1).astype(np.int64):
                    acc = (acc * 31 + int(v)) % _M31
                ids.append(doc_id)
                hs.append(h)
                ws.append(w)
                mr.append(means[0])
                mg.append(means[1])
                mb.append(means[2])
                cks.append(acc)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "height": pd.array(hs, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "mean_r": pd.array(mr, dtype="float64"),
                    "mean_g": pd.array(mg, dtype="float64"),
                    "mean_b": pd.array(mb, dtype="float64"),
                    "resized_checksum": pd.array(cks, dtype="int64"),
                }
            )

    return media.mapInPandas(extract, schema=IMAGE_FEATURE_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode audio -> sample count, RMS, zero-crossing count per payload
    (the spectrogram-prep shape) as one Arrow-batched mapInPandas stage.
    Deterministic fake decoder => full SQL value oracle (q103)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rms, zc = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                s = decode_audio(content).astype(np.int64)
                n = len(s)
                ids.append(doc_id)
                ns.append(n)
                rms.append(float(np.sqrt((s * s).sum() / n)) if n else 0.0)
                zc.append(int((s[:-1] * s[1:] < 0).sum()) if n > 1 else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "n_samples": pd.array(ns, dtype="int32"),
                    "rms": pd.array(rms, dtype="float64"),
                    "n_zero_crossings": pd.array(zc, dtype="int32"),
                }
            )

    return media.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


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


from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)
