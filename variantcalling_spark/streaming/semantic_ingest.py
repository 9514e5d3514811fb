"""Semantic dedup-at-ingest: an embedding stream probing a stored
hyperplane-band index — the COSINE-metric twin of
``streaming/ingest_dedup.py`` (text MinHash) and the streaming face of
q482.

Production shape for continuous corpus growth with embedded content:
- corpus build time: ``semantic_band_index`` over the quantized
  corpus → parquet index (signature slices + vector + norm);
- ingest time: each arriving batch maps through the SAME signature
  projection (one Arrow matmul per batch — stateless, no shuffle on
  the stream side beyond the probe join) and probes the static index
  with ``semantic_band_probe_between``; survivors are exact-cosine
  verified against the carried vectors.

Zero streaming state — batches are independent (a batch's near-dups
against the CORPUS don't depend on other batches; new x new dedup is
the self-join face, run at compaction). The static side re-plans per
micro-batch, so a refreshed index lands without a stream restart (the
ingest_dedup.py / q120 property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from variantcalling_spark.operators.similarity import (
    semantic_band_index,
    semantic_band_probe_between,
)


def build_semantic_index(
    vecs: DataFrame, n_planes: int = 32, n_bands: int = 4
) -> DataFrame:
    """Corpus-side index over QUANTIZED vectors (column ``v``):
    (vec_id, v, norm, slices). Written once at corpus build."""
    return semantic_band_index(vecs, n_planes=n_planes, n_bands=n_bands)


def streaming_semantic_probe(
    new_vecs: DataFrame,
    index: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 32,
    n_bands: int = 4,
) -> DataFrame:
    """Probe a (possibly streaming) quantized-vector batch against the
    stored index. Returns verified pairs (vec_new, vec_old, cosine >=
    threshold). Works identically on a batch frame and a stream — the
    signature projection is stateless per row, and the probe is a
    stream-static equi-join."""
    new_sig = semantic_band_index(new_vecs, n_planes=n_planes, n_bands=n_bands)
    return semantic_band_probe_between(new_sig, index, threshold=threshold)
