"""bigWig codec round-trips: distributed section packing -> single-file
assembly -> parallel scan must reproduce the input runs exactly, at
every structural configuration (compression on/off, single-leaf and
multi-level R-tree, empty file)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from variantcalling_spark.sources.bigwig import (
    assemble_bigwig,
    bigwig_scan,
    chrom_id_map,
    decode_section,
    encode_section,
    read_bigwig_index,
    to_bigwig_sections,
)

CHROM_SIZES = {"c0": 60000, "c1": 60000, "c2": 60000, "c3": 60000}


def _runs_df(spark, n=800):
    return spark.range(n).select(
        F.concat(F.lit("c"), (F.col("id") % 4).cast("string")).alias("chrom"),
        (F.col("id") * 50 % 50000).alias("start"),
        (F.col("id") * 50 % 50000 + 40).alias("end"),
        (F.col("id") % 7 + 1).cast("double").alias("depth"),
    )


def _write(spark, df, path, items_per_section=64, compress=True):
    secs = to_bigwig_sections(
        df, chrom_id_map(CHROM_SIZES), items_per_section, compress
    ).collect()
    return assemble_bigwig(secs, CHROM_SIZES, path, compress)


def _as_set(df):
    return {(r.chrom, r.start, r.end, r.value) for r in df.collect()}


def test_section_codec_is_exact():
    items = [(0, 10, 3.0), (10, 25, 1.0), (100, 160, 2.5)]
    for compress in (True, False):
        blob, raw = encode_section(7, items, compress)
        assert decode_section(blob, compress) == [(7, s, e, v) for s, e, v in items]
        assert raw == 24 + 12 * len(items)


def test_roundtrip_compressed(spark, tmp_path):
    path = os.path.join(tmp_path, "depth.bw")
    df = _runs_df(spark)
    summary = _write(spark, df, path)
    got = bigwig_scan(spark, path).select(
        "chrom", "start", "end", F.col("value").alias("value")
    )
    want = df.select("chrom", "start", "end", F.col("depth").alias("value"))
    assert _as_set(got) == _as_set(want)
    # base-weighted total summary matches a recomputation from the runs
    stats = df.agg(
        F.sum(F.col("end") - F.col("start")).alias("covered"),
        F.min("depth").alias("mn"),
        F.max("depth").alias("mx"),
        F.sum(F.col("depth") * (F.col("end") - F.col("start"))).alias("sd"),
    ).first()
    assert summary["validCount"] == stats.covered
    assert summary["minVal"] == stats.mn and summary["maxVal"] == stats.mx
    assert summary["sumData"] == pytest.approx(stats.sd)


def test_overlapping_run_section_bounds():
    """Section chromEnd must be the MAX run end: with overlapping runs
    an earlier long run extends past the last-by-start run, and
    understated bounds would let external region readers skip a block
    that overlaps their query window."""
    import struct
    import zlib

    items = [(100, 900, 1.0), (200, 300, 2.0)]  # first run is longest
    blob, _ = encode_section(0, items)
    # wig section header: chromId, chromStart, chromEnd, ...
    _, start, end = struct.unpack_from("<III", zlib.decompress(blob), 0)
    assert (start, end) == (100, 900)


def test_roundtrip_uncompressed(spark, tmp_path):
    path = os.path.join(tmp_path, "plain.bw")
    df = _runs_df(spark, n=300)
    _write(spark, df, path, compress=False)
    idx = read_bigwig_index(path)
    assert not idx["compressed"]
    got = bigwig_scan(spark, path)
    assert got.count() == 300


def test_multi_level_rtree(spark, tmp_path):
    """>256 sections forces an internal R-tree level; the scan must
    still enumerate every leaf through the child-offset walk."""
    path = os.path.join(tmp_path, "deep.bw")
    df = _runs_df(spark, n=1600)
    _write(spark, df, path, items_per_section=4)
    idx = read_bigwig_index(path)
    assert len(idx["sections"]) == 400  # 1600 runs / 4 per section
    got = bigwig_scan(spark, path)
    assert _as_set(got) == _as_set(
        df.select("chrom", "start", "end", F.col("depth").alias("value"))
    )


def test_empty_runs(spark, tmp_path):
    path = os.path.join(tmp_path, "empty.bw")
    empty = _runs_df(spark).where(F.lit(False))
    summary = _write(spark, empty, path)
    assert summary["validCount"] == 0
    idx = read_bigwig_index(path)
    assert idx["sections"] == [] and idx["n_sections"] == 0
    assert bigwig_scan(spark, path).count() == 0


def test_index_metadata(spark, tmp_path):
    path = os.path.join(tmp_path, "meta.bw")
    df = _runs_df(spark, n=200)
    _write(spark, df, path)
    idx = read_bigwig_index(path)
    # UCSC dataCount semantics: counts data SECTIONS, not intervals
    assert idx["n_sections"] == len(idx["sections"]) > 0
    assert {name for name, _ in idx["chroms"].values()} == set(CHROM_SIZES)
    assert all(size == 60000 for _, size in idx["chroms"].values())


def test_depth_runs_to_bigwig_integration(spark, sf_dir, tmp_path):
    """The reference boundary end-to-end: q105's depth runs written as a
    bigWig track and scanned back identically (coverage_analysis.py:
    686-714 did this via bedGraphToBigWig + pyBigWig)."""
    from variantcalling_spark.queries import all_queries

    runs = all_queries()["q105_depth_runs"].fn(spark, sf_dir)
    sizes = {f"c{i}": 51000 for i in range(4)}
    path = os.path.join(tmp_path, "q105.bw")
    from variantcalling_spark.sources.bigwig import (
        bigwig_zoom_scan,
        choose_zoom_reductions,
        to_zoom_sections,
        zoom_reduce,
    )

    r = runs.withColumn("depth", F.col("depth").cast("double"))
    ids = chrom_id_map(sizes)
    secs = to_bigwig_sections(r, ids, items_per_section=512).collect()
    reds = choose_zoom_reductions(r, sizes)
    zl = [(red, to_zoom_sections(r, ids, red).collect()) for red in reds]
    assemble_bigwig(secs, sizes, path, zoom_levels=zl)
    got = bigwig_scan(spark, path)
    want = runs.select(
        "chrom", "start", "end", F.col("depth").cast("double").alias("value")
    )
    assert _as_set(got) == _as_set(want)
    # zoom ladder written from the real depth runs and readable back:
    # level-0 window count matches a direct recomputation
    assert read_bigwig_index(path)["zoom_levels"] == len(reds) > 0
    assert (
        bigwig_zoom_scan(spark, path, level=0).count()
        == zoom_reduce(r, reds[0]).count()
    )


def test_pybigwig_cross_validation(tmp_path):
    """Contract test against the reference's own reader: runs wherever
    pyBigWig is installed (not in this container — same skip-marked
    pattern as the real media decoders)."""
    pbw = pytest.importorskip("pyBigWig")
    path = os.path.join(tmp_path, "cross.bw")
    secs = []
    items = [(100, 200, 2.0), (200, 350, 5.0)]
    blob, raw = encode_section(0, items)
    secs.append(
        {
            "chrom_id": 0,
            "start_bp": 100,
            "end_bp": 350,
            "n_items": 2,
            "raw_size": raw,
            "blob": blob,
            "valid_count": 250,
            "min_val": 2.0,
            "max_val": 5.0,
            "sum_data": 2.0 * 100 + 5.0 * 150,
            "sum_squares": 4.0 * 100 + 25.0 * 150,
        }
    )
    import struct as _struct
    import zlib as _zlib

    # one 4096-bp zoom level covering both runs (hand-built record)
    zraw = _struct.pack(
        "<IIIIffff", 0, 100, 350, 250, 2.0, 5.0, 950.0, 4150.0
    )
    zsec = {
        "chrom_id": 0,
        "start_bp": 100,
        "end_bp": 350,
        "n_items": 1,
        "raw_size": len(zraw),
        "blob": _zlib.compress(zraw),
    }
    assemble_bigwig(secs, {"chr1": 1000}, path, zoom_levels=[(4096, [zsec])])
    bw = pbw.open(path)
    assert bw.chroms() == {"chr1": 1000}
    assert bw.intervals("chr1") == ((100, 200, 2.0), (200, 350, 5.0))
    assert bw.header()["nLevels"] == 1
    # approximate stats route through the zoom level
    assert bw.stats("chr1", 0, 1000, exact=False)[0] == pytest.approx(
        950.0 / 250, rel=1e-6
    )
    bw.close()


def test_zoom_levels_roundtrip(spark, tmp_path):
    """Zoom levels written + read back: the level-0 records must equal a
    direct Spark recomputation of the window reduction from the runs
    (valid_count/extent exact; stats at float32 precision, as stored),
    and the header must advertise the level count."""
    from variantcalling_spark.sources.bigwig import (
        bigwig_zoom_scan,
        to_zoom_sections,
        zoom_reduce,
    )

    path = os.path.join(tmp_path, "zoomed.bw")
    df = _runs_df(spark, n=400)
    ids = chrom_id_map(CHROM_SIZES)
    secs = to_bigwig_sections(df, ids, 64).collect()
    reductions = [1024, 4096]
    zl = [(r, to_zoom_sections(df, ids, r).collect()) for r in reductions]
    assemble_bigwig(secs, CHROM_SIZES, path, zoom_levels=zl)

    idx = read_bigwig_index(path)
    assert idx["zoom_levels"] == 2
    assert [z["reduction"] for z in idx["zooms"]] == reductions
    for z in idx["zooms"]:
        assert z["n_records"] > 0 and z["sections"]

    got = {
        (r.chrom, r.start, r.end): r
        for r in bigwig_zoom_scan(spark, path, level=0).collect()
    }
    want = {
        (r.chrom, r.zstart, r.zend): r for r in zoom_reduce(df, 1024).collect()
    }
    assert set(got) == set(want) and len(got) > 4
    import numpy as np

    for k, g in got.items():
        w = want[k]
        assert g.valid_count == w.valid_count
        assert g.min_val == np.float32(w.min_val)
        assert g.max_val == np.float32(w.max_val)
        assert g.sum_data == np.float32(w.sum_data)
        assert g.sum_squares == np.float32(w.sum_squares)

    # full-resolution scan unaffected by the appended zoom blocks
    assert bigwig_scan(spark, path).count() == 400


def test_zoom_reduction_ladder_from_stats(spark):
    from variantcalling_spark.sources.bigwig import choose_zoom_reductions

    df = _runs_df(spark, n=100)  # 40 bp runs -> base 400
    reds = choose_zoom_reductions(df, CHROM_SIZES)
    assert reds and reds[0] == 400
    assert all(b == a * 4 for a, b in zip(reds, reds[1:]))
    assert reds[-1] <= max(CHROM_SIZES.values()) // 2
    # empty runs -> no levels, and assembly writes zoomLevels=0
    assert choose_zoom_reductions(df.where(F.lit(False)), CHROM_SIZES) == []


def test_zoom_multi_level_rtree(spark, tmp_path):
    """>256 zoom sections force an internal R-tree level on the ZOOM
    index path (same builder as the data index, different offset base);
    the zoom scan must enumerate every leaf and reproduce the
    reduction exactly."""
    from variantcalling_spark.sources.bigwig import (
        bigwig_zoom_scan,
        to_zoom_sections,
        zoom_reduce,
    )

    path = os.path.join(tmp_path, "zoomdeep.bw")
    df = _runs_df(spark, n=1600)
    ids = chrom_id_map(CHROM_SIZES)
    secs = to_bigwig_sections(df, ids, 512).collect()
    # reduction 64 -> many windows; 1 record/section -> >256 sections
    zs = to_zoom_sections(df, ids, 64, items_per_section=1).collect()
    assert len(zs) > 256
    assemble_bigwig(secs, CHROM_SIZES, path, zoom_levels=[(64, zs)])
    idx = read_bigwig_index(path)
    assert len(idx["zooms"][0]["sections"]) == len(zs)
    got = {
        (r.chrom, r.start, r.end, r.valid_count)
        for r in bigwig_zoom_scan(spark, path, 0).collect()
    }
    want = {
        (r.chrom, r.zstart, r.zend, r.valid_count)
        for r in zoom_reduce(df, 64).collect()
    }
    assert got == want


def test_zoom_reduce_drops_degenerate_runs(spark):
    """Zero/negative-length runs must emit NO windows (Spark's
    sequence() DESCENDS when end <= start, which used to fabricate
    spurious windows with negative clipped overlap)."""
    from variantcalling_spark.sources.bigwig import zoom_reduce

    df = spark.createDataFrame(
        [("chr1", 100, 100, 7), ("chr1", 300, 200, 9), ("chr1", 0, 10, 3)],
        ["chrom", "start", "end", "depth"],
    )
    rows = zoom_reduce(df, 64).collect()
    # only the one real run survives
    assert len(rows) == 1
    r = rows[0]
    assert (r.chrom, r.win, r.zstart, r.zend, r.valid_count) == ("chr1", 0, 0, 10, 10)
    assert r.min_val == 3.0 and r.max_val == 3.0 and r.sum_data == 30.0
