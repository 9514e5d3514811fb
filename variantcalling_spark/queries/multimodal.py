"""Multimodal pipeline query: binary payload -> mapInPandas featurize.

The payload is the utf-8 encoding of document text (pure ASCII here), so
the byte features are independently computable in SQL — giving the
mapInPandas plumbing a real oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.operators.multimodal import attach_binary_payload, featurize_binary
from variantcalling_spark.queries import query
from variantcalling_spark.queries._helpers import cnt
from variantcalling_spark.sources import load_table


@query(
    "q70_multimodal_features",
    oracle="""
WITH f AS (
  SELECT doc_id, source,
         octet_length(encode(text)) AS n_bytes,
         ascii(substr(text, 1, 1)) AS first_byte,
         ascii(substr(text, length(text), 1)) AS last_byte
  FROM documents
)
SELECT source,
       COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(first_byte) AS INT) AS min_first_byte,
       CAST(MAX(last_byte) AS INT) AS max_last_byte
FROM f GROUP BY source
""",
)
def q70_multimodal_features(spark, sf_dir):
    """Binary-column pipeline: attach opaque payloads, extract byte-level
    features with an Arrow-batched mapInPandas stage (the slot where a
    real image/audio decoder runs — stubbed per environment), aggregate
    per source. The oracle recomputes the features from the text the
    payload was derived from."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    feats = featurize_binary(media)
    joined = feats.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        cnt("n_media"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.min("first_byte").alias("min_first_byte"),
        F.max("last_byte").alias("max_last_byte"),
    )


@query(
    "q93_frame_sampling",
    oracle="""
WITH f AS (
  SELECT doc_id, i AS frame_idx,
         substr(text, CAST(i * 256 + 1 AS BIGINT), 256) AS frame
  FROM documents,
       UNNEST(generate_series(0, CAST((length(text) - 1) // 256 AS BIGINT), 2)) t(i)
  WHERE length(text) > 0
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(length(frame) AS INT) AS n_bytes,
       list_reduce(list_transform(string_split(frame, ''), c -> CAST(ascii(c) AS BIGINT)),
                   (a, b) -> (a * 31 + b) % 2147483647) AS checksum
FROM f
""",
)
def q93_frame_sampling(spark, sf_dir):
    """Video-style frame sampling over binary payloads: 256-byte frames,
    every 2nd kept, rolling byte checksum per kept frame — a one-to-many
    Arrow-batched mapInPandas stage (the decoder/resize slot). Payloads
    are ASCII here, so the SQL oracle reproduces the checksums from the
    source text character-for-character; with real media the same stage
    would emit decoded-frame features instead."""
    from variantcalling_spark.operators.multimodal import (
        attach_binary_payload,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return sample_frames(media, frame_bytes=256, every_n=2)

@query(
    "q102_image_decode_features",
    oracle="""
WITH base AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)) AS cs,
         length(text) AS L,
         -- empty payloads decode to one all-zero row (height 1)
         CASE WHEN length(text) = 0 THEN 1
              ELSE (length(text) - 1) // 96 + 1 END AS H
  FROM documents
)
SELECT doc_id,
       CAST(H AS INT) AS height,
       CAST(32 AS INT) AS width,
       CASE WHEN L = 0 THEN 0.0 ELSE
         list_sum([cs[(p % L) + 1] for p in generate_series(0, H * 96 - 1, 3)])
           / CAST(H * 32 AS DOUBLE) END AS mean_r,
       CASE WHEN L = 0 THEN 0.0 ELSE
         list_sum([cs[(p % L) + 1] for p in generate_series(1, H * 96 - 1, 3)])
           / CAST(H * 32 AS DOUBLE) END AS mean_g,
       CASE WHEN L = 0 THEN 0.0 ELSE
         list_sum([cs[(p % L) + 1] for p in generate_series(2, H * 96 - 1, 3)])
           / CAST(H * 32 AS DOUBLE) END AS mean_b,
       CASE WHEN L = 0 THEN CAST(0 AS BIGINT) ELSE
         list_reduce(
           [cs[((((((p // 24) * H) // 8) * 32 + ((p % 24) // 3) * 4) * 3 + (p % 3)) % L) + 1]
            for p in generate_series(0, 191)],
           (a, b) -> (a * 31 + b) % 2147483647) END AS resized_checksum
FROM base
""",
)
def q102_image_decode_features(spark, sf_dir):
    """Image decode -> channel means -> nearest-neighbor 8x8 resize ->
    resized checksum, one Arrow mapInPandas stage (operators/
    multimodal.py::image_features). The deterministic tiling decoder
    (real-decoder drop-in, same array contract) makes every output a
    pure byte function, so the full decode/resize pipeline — not just
    the plumbing — is value-checked: the oracle recomputes the tiled
    pixels, the floor-index resize maps, and the mod-2^31-1 checksum
    from the source characters."""
    from variantcalling_spark.operators.multimodal import (
        attach_binary_payload,
        image_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return image_features(attach_binary_payload(docs), out_h=8, out_w=8)


@query(
    "q103_audio_features",
    oracle="""
WITH base AS (
  SELECT doc_id,
         list_transform(string_split(text, ''),
                        c -> (CAST(ascii(c) AS BIGINT) * 37) % 256 - 128) AS ss,
         length(text) AS L
  FROM documents
)
SELECT doc_id,
       CAST(L AS INT) AS n_samples,
       CASE WHEN L = 0 THEN 0.0
            ELSE sqrt(list_sum([x * x for x in ss]) / CAST(L AS DOUBLE)) END AS rms,
       CAST(COALESCE(list_sum([CASE WHEN ss[i] * ss[i + 1] < 0 THEN 1 ELSE 0 END
                               for i in generate_series(1, L - 1)]), 0) AS INT)
         AS n_zero_crossings
FROM base
""",
)
def q103_audio_features(spark, sf_dir):
    """Audio decode -> waveform stats (sample count, RMS, zero
    crossings), one Arrow mapInPandas stage (operators/multimodal.py::
    audio_features). The deterministic sign-mixing decoder gives the
    stage a full value oracle: integer square sums are exact, so the
    float64 RMS is bit-identical across engines."""
    from variantcalling_spark.operators.multimodal import (
        attach_binary_payload,
        audio_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return audio_features(attach_binary_payload(docs))


MCD_H, MCD_W, MCD_C = 8, 8, 3
MCD_GROUPS = 50
MCD_DOCS = 200
_MCD_XPPM_OFFSET = 14 + 24  # file header (14) + info-header offset of xppm


def _mcd_pixel(g: str, y: str, x: str, c: str) -> str:
    return f"(({g} * 7 + {y} * 13 + {x} * 5 + {c} * 31) % 256)"


@query(
    "q162_media_content_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id, doc_id % {MCD_GROUPS} AS g FROM documents
  WHERE doc_id < {MCD_DOCS}
),
keys AS (
  SELECT doc_id, g,
         md5(array_to_string(
           [{_mcd_pixel("g", f"(i // {MCD_W * MCD_C})",
                        f"((i % {MCD_W * MCD_C}) // {MCD_C})",
                        f"(i % {MCD_C})")}
            for i in generate_series(0, {MCD_H * MCD_W * MCD_C - 1})], '-'))
           AS content_key
  FROM d
)
SELECT content_key,
       COUNT(*) AS n_files,
       CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_byte_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM keys GROUP BY content_key
""",
)
def q162_media_content_dedup(spark, sf_dir):
    """CONTENT-level media dedup: files whose bytes differ (metadata
    headers vary) but whose decoded pixels are identical collapse to
    one canonical copy — the image-corpus analogue of near-dup text
    (re-encoded/re-tagged crawl images are the common case; byte-hash
    dedup misses them all). Pipeline: deterministic 8x8 RGB images
    (content keyed to doc_id % {MCD_GROUPS}) are ENCODED to real
    uncompressed BMPs with a doc-varying x-pixels-per-meter header
    field, then DECODED back by the stdlib codec and grouped by the md5
    of the canonical pixel string. The oracle reconstructs the pixel
    strings arithmetically — so equality proves the BMP decode inverts
    the encode for every byte of pixel data, engine-independently,
    while n_byte_variants > 1 within groups proves the byte-level
    hashes genuinely differed. Plan: two Arrow mapInPandas stages
    (encode, decode+canonicalize) with zero shuffle until the final
    content-key groupBy."""
    import pandas as pd

    from variantcalling_spark.operators.media_codecs import decode_bmp, encode_bmp

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < MCD_DOCS)
    )

    def encode(batches):
        import numpy as np
        import struct

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                g = int(doc_id) % MCD_GROUPS
                y, x, c = np.meshgrid(
                    np.arange(MCD_H), np.arange(MCD_W), np.arange(MCD_C),
                    indexing="ij",
                )
                img = ((g * 7 + y * 13 + x * 5 + c * 31) % 256).astype("uint8")
                raw = bytearray(encode_bmp(img))
                # metadata-only byte variation: x pixels-per-meter
                struct.pack_into("<i", raw, _MCD_XPPM_OFFSET, 2835 + int(doc_id) % 3)
                out.append(bytes(raw))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": out})

    media = base.mapInPandas(encode, schema="doc_id long, content binary")

    def decode(batches):
        for pdf in batches:
            keys = [
                "-".join(str(v) for v in decode_bmp(content).flatten())
                for content in pdf["content"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "pixel_str": keys,
                 "content": pdf["content"]}
            )

    decoded = media.mapInPandas(
        decode, schema="doc_id long, pixel_str string, content binary"
    )
    return (
        decoded.select(
            "doc_id",
            F.md5(F.encode("pixel_str", "utf-8")).alias("content_key"),
            F.md5("content").alias("byte_key"),
        )
        .groupBy("content_key")
        .agg(
            cnt("n_files"),
            F.count_distinct("byte_key").cast("bigint").alias("n_byte_variants"),
            F.min("doc_id").cast("bigint").alias("keep_id"),
        )
    )


ACD_N = 32
ACD_GROUPS = 40
ACD_DOCS = 160


def _acd_sample(g: str, i: str) -> str:
    return f"((({g}) * 31 + ({i}) * 17) % 2048 - 1024)"


@query(
    "q164_audio_content_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id, doc_id % {ACD_GROUPS} AS g FROM documents
  WHERE doc_id < {ACD_DOCS}
),
keys AS (
  SELECT doc_id, g,
         md5(array_to_string(
           [{_acd_sample("g", "i")} for i in generate_series(0, {ACD_N - 1})],
           '-')) AS content_key
  FROM d
)
SELECT content_key,
       COUNT(*) AS n_files,
       CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_byte_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM keys GROUP BY content_key
""",
)
def q164_audio_content_dedup(spark, sf_dir):
    """q162's content-level dedup for AUDIO: WAV files whose bytes
    differ (a LIST/INFO metadata chunk carries a per-file tag — the
    re-tagged-download case) but whose PCM samples are identical
    collapse to one canonical copy. The encode side writes real
    RIFF/WAVE PCM-16 via the stdlib codec, then splices a well-formed
    LIST chunk between fmt and data (RIFF size patched); the decode
    side's chunk walker skips it, recovering the exact int16 samples,
    which hash to the content key. The oracle rebuilds the sample
    sequence arithmetically, so the green hash proves WAV decode
    inverts encode through foreign metadata chunks — the second codec
    of the family, same two-mapInPandas zero-pre-shuffle plan."""
    import pandas as pd

    from variantcalling_spark.operators.media_codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < ACD_DOCS)
    )

    def encode(batches):
        import struct

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                g = int(doc_id) % ACD_GROUPS
                i = np.arange(ACD_N)
                samples = ((g * 31 + i * 17) % 2048 - 1024).astype("int16")
                raw = encode_wav_pcm16(samples)
                # splice a LIST/INFO chunk after fmt (ends at byte 36 in
                # the stdlib writer's fixed layout); readers skip it
                tag = f"tag{int(doc_id) % 3}".encode()
                payload = b"INFO" + tag + b"\0" * (len(tag) % 2)
                chunk = b"LIST" + struct.pack("<I", len(payload)) + payload
                patched = bytearray(raw[:36] + chunk + raw[36:])
                struct.pack_into(
                    "<I", patched, 4, struct.unpack_from("<I", raw, 4)[0] + len(chunk)
                )
                out.append(bytes(patched))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": out})

    media = base.mapInPandas(encode, schema="doc_id long, content binary")

    def decode(batches):
        for pdf in batches:
            keys = []
            for content in pdf["content"]:
                samples, _rate = decode_wav_pcm16(content)
                keys.append("-".join(str(int(v)) for v in samples))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sample_str": keys,
                 "content": pdf["content"]}
            )

    decoded = media.mapInPandas(
        decode, schema="doc_id long, sample_str string, content binary"
    )
    return (
        decoded.select(
            "doc_id",
            F.md5(F.encode("sample_str", "utf-8")).alias("content_key"),
            F.md5("content").alias("byte_key"),
        )
        .groupBy("content_key")
        .agg(
            cnt("n_files"),
            F.count_distinct("byte_key").cast("bigint").alias("n_byte_variants"),
            F.min("doc_id").cast("bigint").alias("keep_id"),
        )
    )


PHD_H, PHD_W, PHD_C = 8, 8, 3
PHD_GROUPS = 40
PHD_DOCS = 160


def _phd_base(g: str, y: str, x: str) -> str:
    # two-level pattern far from the mean threshold: perturbations of
    # up to +2 per channel can never flip an aHash bit
    return f"(CASE WHEN (({y}) * 8 + ({x}) + ({g})) % 3 = 0 THEN 240 ELSE 10 END)"


@query(
    "q393_perceptual_image_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id, doc_id % {PHD_GROUPS} AS g, doc_id % 3 AS p FROM documents
  WHERE doc_id < {PHD_DOCS}
),
gray AS (
  -- gray(y,x) = (r+g+b) DIV 3 = base + (2*base + base + p) ... with
  -- r = base + p, g = base, b = base: (3*base + p) DIV 3 = base for
  -- p < 3 — the perturbation vanishes in the integer division,
  -- exactly like the Spark-side decode path
  SELECT doc_id, g, p, i,
         {_phd_base("g", f"(i // {PHD_W})", f"(i % {PHD_W})")} AS gv
  FROM d, unnest(generate_series(0, {PHD_H * PHD_W - 1})) AS t(i)
),
tot AS (
  SELECT doc_id, g, p, CAST(SUM(gv) AS BIGINT) AS s FROM gray
  GROUP BY doc_id, g, p
),
bits AS (
  SELECT gray.doc_id, gray.p,
         string_agg(CASE WHEN gray.gv * {PHD_H * PHD_W} >= tot.s
                         THEN '1' ELSE '0' END, '' ORDER BY gray.i) AS ahash
  FROM gray JOIN tot ON tot.doc_id = gray.doc_id
  GROUP BY gray.doc_id, gray.p
)
SELECT ahash,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(COUNT(DISTINCT p) AS BIGINT) AS n_pixel_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM bits GROUP BY ahash
""",
)
def q393_perceptual_image_dedup(spark, sf_dir):
    """PERCEPTUAL IMAGE DEDUP (average-hash): images whose PIXELS
    differ (per-doc channel perturbation) but whose 8x8 gray
    mean-threshold fingerprint is identical collapse together — the
    step BEYOND q162's content-exact dedup (byte-hash misses
    re-encodes; pixel-hash misses re-compressions; aHash catches
    both). Pipeline: deterministic two-level 8x8 RGB patterns + a
    per-doc +p perturbation on the red channel are ENCODED to real
    BMPs and DECODED back by the stdlib codec; gray = (r+g+b) DIV 3
    absorbs the perturbation exactly; bit j = gray_j * 64 >= sum(gray)
    (integer cross-multiplication, no float threshold).

    The oracle reconstructs the decoded grays arithmetically, so
    equality proves decode-inverts-encode AND the hash arithmetic,
    engine-independently; n_pixel_variants > 1 inside groups proves
    pixel-exact dedup would have split them. Plan: two Arrow
    mapInPandas stages, zero shuffle until the final hash groupBy."""
    import pandas as pd

    from variantcalling_spark.operators.media_codecs import decode_bmp, encode_bmp

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < PHD_DOCS)
    )

    def encode(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                g = int(doc_id) % PHD_GROUPS
                p = int(doc_id) % 3
                y, x = np.meshgrid(
                    np.arange(PHD_H), np.arange(PHD_W), indexing="ij"
                )
                basev = np.where((y * 8 + x + g) % 3 == 0, 240, 10)
                img = np.stack(
                    [basev + p, basev, basev], axis=2
                ).astype("uint8")
                out.append(encode_bmp(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": out})

    media = base.mapInPandas(encode, schema="doc_id long, content binary")

    def decode(batches):
        for pdf in batches:
            hashes, pkeys = [], []
            for content in pdf["content"]:
                img = decode_bmp(content).astype("int64")
                gray = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                flat = gray.flatten()
                s = int(flat.sum())
                hashes.append(
                    "".join(
                        "1" if int(v) * flat.size >= s else "0" for v in flat
                    )
                )
                pkeys.append("-".join(str(v) for v in img.flatten()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": hashes,
                    "pixel_key": pkeys,
                }
            )

    decoded = media.mapInPandas(
        decode, schema="doc_id long, ahash string, pixel_key string"
    )
    return decoded.groupBy("ahash").agg(
        cnt("n_files"),
        F.count_distinct("pixel_key").cast("bigint").alias("n_pixel_variants"),
        F.min("doc_id").cast("bigint").alias("keep_id"),
    )


# queries in this module define worker-side closures inline (the BMP/WAV
# encode/decode stages); register by value so a fresh driver process
# without the repo on the WORKER path can still unpickle them — the
# round-6 sources/fastq.py lesson (see .claude/skills/verify/SKILL.md)
from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)
