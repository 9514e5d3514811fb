"""bigWig sink/scan — the last alignment-adjacent format gap.

The reference compresses per-base depth bedgraphs to bigWig browser
tracks by shelling to UCSC ``bedGraphToBigWig``
(``ugvc/pipelines/coverage_analysis.py:686-714``) and reads values back
with pyBigWig (``coverage_analysis.py:771-786``). Spark-first
re-expression of the same boundary, from the public format description
(Kent et al., "BigWig and BigBed: enabling browsing of large
distributed datasets", Bioinformatics 26(17), 2010, and the UCSC
bbiFile layout it documents):

- **Section encoding is distributed**: ``to_bigwig_sections`` packs
  sorted depth runs into zlib-compressed bedGraph-type wig sections
  with one ``applyInPandas`` pass per chromosome — the expensive part
  (struct packing + compression) scales with the cluster, exactly like
  parquet page encoding.
- **File assembly is the single-writer boundary**: ``assemble_bigwig``
  is a pure-bytes function over already-materialized section records
  (header + chromosome B+ tree + data + R-tree index + total summary).
  A bigWig is ONE indexed binary file, so the final concatenation is
  inherently sequential — the callers that materialize sections live
  outside the engine package (``tools/make_bigwig.py``, tests), keeping
  every in-package operator driver-collect-free.
- **The scan is parallel again**: ``bigwig_scan`` parses the (tiny)
  R-tree on the driver and fans section decode out through
  ``mapInPandas`` — sections play the role of parquet row groups.

- **Zoom levels are real** (round 5): ``zoom_reduce`` computes each
  reduction level as one distributed explode+groupBy (map-side
  combinable), ``to_zoom_sections`` packs 32-byte bbi zoom records per
  chromosome, and assembly writes the zoom headers + per-level data and
  R-trees, so genome browsers render wide views from the precomputed
  summaries instead of full-resolution data. ``bigwig_zoom_scan`` reads
  a level back in parallel.

Caveat, stated honestly: cross-validation against pyBigWig is a
skip-marked test that activates wherever that library exists (this
container has none — the same contract-test pattern as the real media
decoders).
"""

from __future__ import annotations

import struct
import zlib

BIGWIG_MAGIC = 0x888FFC26
CHROM_TREE_MAGIC = 0x78CA4C91
RTREE_MAGIC = 0x2468ACE0
BBI_VERSION = 4

# struct layouts (all little-endian, per the bbiFile description).
# Format STRINGS, not struct.Struct objects: the scan/pack closures ship
# to executors by-value (cloudpickle), and Struct instances don't pickle.
_HEADER = "<IHHQQQHHQQIQ"  # 64 bytes
_TOTAL_SUMMARY = "<Qdddd"  # 40 bytes
_CHROM_TREE_HDR = "<IIIIQQ"  # 32 bytes
_NODE_HDR = "<BBH"  # 4 bytes
_RTREE_HDR = "<IIQIIIIQII"  # 48 bytes
_RTREE_LEAF_ITEM = "<IIIIQQ"  # 32 bytes
_RTREE_CHILD_ITEM = "<IIIIQ"  # 24 bytes
_WIG_SECTION_HDR = "<IIIIIBBH"  # 24 bytes
_BEDGRAPH_ITEM = "<IIf"  # 12 bytes
_ZOOM_HEADER = "<IIQQ"  # 24 bytes: reductionLevel, reserved, dataOffset, indexOffset
_ZOOM_RECORD = "<IIIIffff"  # 32 bytes: chromId, start, end, validCount, min, max, sumData, sumSquares

WIG_TYPE_BEDGRAPH = 1
RTREE_BLOCK_SIZE = 256


def chrom_id_map(chrom_sizes: dict[str, int]) -> dict[str, int]:
    """Chromosome ids in sorted-name order — the B+ tree key order, so
    ids ascend with keys and (chromIx, start) section order is the
    file's natural sort."""
    return {name: i for i, name in enumerate(sorted(chrom_sizes))}


def encode_section(
    chrom_id: int, items: list[tuple[int, int, float]], compress: bool = True
) -> tuple[bytes, int]:
    """One bedGraph-type wig section from sorted (start, end, value)
    runs. Returns (blob, uncompressed_size).

    The section chromEnd is the MAX run end, not the last-by-start run's
    end: with overlapping runs an earlier long run can extend past the
    last one, and understated bounds would let external region readers
    (pyBigWig.values) skip a block that actually overlaps the query."""
    start = items[0][0]
    end = max(e for _, e, _ in items)
    raw = struct.pack(_WIG_SECTION_HDR, 
        chrom_id, start, end, 0, 0, WIG_TYPE_BEDGRAPH, 0, len(items)
    ) + b"".join(struct.pack(_BEDGRAPH_ITEM, s, e, float(v)) for s, e, v in items)
    return (zlib.compress(raw) if compress else raw), len(raw)


def decode_section(blob: bytes, compressed: bool) -> list[tuple[int, int, int, float]]:
    """Inverse of ``encode_section``: (chrom_id, start, end, value) rows."""
    raw = zlib.decompress(blob) if compressed else blob
    chrom_id, _s, _e, _step, _span, typ, _r, n = struct.unpack_from(_WIG_SECTION_HDR, raw, 0)
    if typ != WIG_TYPE_BEDGRAPH:
        raise ValueError(f"unsupported wig section type {typ} (bedGraph only)")
    out = []
    off = struct.calcsize(_WIG_SECTION_HDR)
    for _ in range(n):
        s, e, v = struct.unpack_from(_BEDGRAPH_ITEM, raw, off)
        out.append((chrom_id, s, e, v))
        off += struct.calcsize(_BEDGRAPH_ITEM)
    return out


def to_bigwig_sections(
    runs,
    chrom_ids: dict[str, int],
    items_per_section: int = 512,
    compress: bool = True,
):
    """Distributed section packing: runs ``(chrom, start, end, depth)``
    -> one row per wig section, carrying the compressed blob plus the
    per-section summary contributions (base-weighted, per the bbi total
    summary definition) so assembly never re-reads the data.

    One ``applyInPandas`` per chromosome group; inside a group the runs
    are sorted by start and chunked. Output rows shuffle once on the
    chrom key — section payloads are already compressed when they move.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    ids = dict(chrom_ids)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("start")
        cid = ids[pdf["chrom"].iloc[0]]
        rows = []
        items = list(
            zip(
                pdf["start"].astype(int),
                pdf["end"].astype(int),
                pdf["depth"].astype(float),
            )
        )
        for i in range(0, len(items), items_per_section):
            chunk = items[i : i + items_per_section]
            blob, raw_size = encode_section(cid, chunk, compress)
            covered = sum(e - s for s, e, _ in chunk)
            rows.append(
                {
                    "chrom_id": cid,
                    "start_bp": chunk[0][0],
                    # max end, not last-by-start end: R-tree leaf bounds
                    # must cover every run even if runs overlap
                    "end_bp": max(e for _, e, _ in chunk),
                    "n_items": len(chunk),
                    "raw_size": raw_size,
                    "blob": bytearray(blob),
                    "valid_count": covered,
                    "min_val": min(v for _, _, v in chunk),
                    "max_val": max(v for _, _, v in chunk),
                    "sum_data": float(sum(v * (e - s) for s, e, v in chunk)),
                    "sum_squares": float(
                        sum(v * v * (e - s) for s, e, v in chunk)
                    ),
                }
            )
        return pd.DataFrame(rows)

    schema = (
        "chrom_id int, start_bp long, end_bp long, n_items int, raw_size int, "
        "blob binary, valid_count long, min_val double, max_val double, "
        "sum_data double, sum_squares double"
    )
    return (
        runs.select("chrom", "start", "end", "depth")
        .groupBy("chrom")
        .applyInPandas(pack, schema=schema)
    )


def zoom_reduce(runs, reduction: int):
    """Distributed zoom reduction: depth runs -> one summary row per
    ``reduction``-bp window (the bbi zoom record fields: covered bases,
    min/max depth, base-weighted sum and sum of squares). Pure
    DataFrame ops: runs explode to the windows they span (a run is
    typically much shorter than the reduction, so fan-out ~1), overlap
    arithmetic clips, and one map-side-combinable groupBy aggregates —
    the same shape at any scale. Zoom record start/end are the ACTUAL
    covered extent within the window (tight bounds for the R-tree)."""
    from pyspark.sql import functions as F

    red = int(reduction)
    # guard: a zero/negative-length run would make the sequence() below
    # DESCEND (floor((end-1)/red) < floor(start/red)) and emit spurious
    # windows with negative clipped overlap — public operator, so drop
    # degenerate runs instead of relying on callers
    runs = runs.where(F.col("end") > F.col("start"))
    w = runs.select(
        "chrom",
        "start",
        "end",
        F.col("depth").cast("double").alias("depth"),
        F.explode(
            F.sequence(
                F.floor(F.col("start") / red), F.floor((F.col("end") - 1) / red)
            )
        ).alias("win"),
    )
    ov_s = F.greatest(F.col("start"), F.col("win") * red)
    ov_e = F.least(F.col("end"), (F.col("win") + 1) * red)
    ov = ov_e - ov_s
    return w.groupBy("chrom", "win").agg(
        F.min(ov_s).cast("long").alias("zstart"),
        F.max(ov_e).cast("long").alias("zend"),
        F.sum(ov).cast("long").alias("valid_count"),
        F.min("depth").alias("min_val"),
        F.max("depth").alias("max_val"),
        F.sum(F.col("depth") * ov).alias("sum_data"),
        F.sum(F.col("depth") * F.col("depth") * ov).alias("sum_squares"),
    )


def to_zoom_sections(
    runs,
    chrom_ids: dict[str, int],
    reduction: int,
    items_per_section: int = 512,
    compress: bool = True,
):
    """``zoom_reduce`` packed into zlib-compressed zoom-record sections
    (32-byte bbi zoom records), one ``applyInPandas`` per chromosome —
    the zoom analog of ``to_bigwig_sections``."""
    import pandas as pd

    ids = dict(chrom_ids)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("zstart")
        cid = ids[pdf["chrom"].iloc[0]]
        recs = list(
            zip(
                pdf["zstart"].astype(int),
                pdf["zend"].astype(int),
                pdf["valid_count"].astype(int),
                pdf["min_val"].astype(float),
                pdf["max_val"].astype(float),
                pdf["sum_data"].astype(float),
                pdf["sum_squares"].astype(float),
            )
        )
        rows = []
        for i in range(0, len(recs), items_per_section):
            chunk = recs[i : i + items_per_section]
            raw = b"".join(
                struct.pack(_ZOOM_RECORD, cid, zs, ze, vc, mn, mx, sd, sq)
                for zs, ze, vc, mn, mx, sd, sq in chunk
            )
            rows.append(
                {
                    "chrom_id": cid,
                    "start_bp": chunk[0][0],
                    "end_bp": max(r[1] for r in chunk),
                    "n_items": len(chunk),
                    "raw_size": len(raw),
                    "blob": bytearray(zlib.compress(raw) if compress else raw),
                }
            )
        return pd.DataFrame(rows)

    schema = (
        "chrom_id int, start_bp long, end_bp long, n_items int, "
        "raw_size int, blob binary"
    )
    return zoom_reduce(runs, reduction).groupBy("chrom").applyInPandas(
        pack, schema=schema
    )


def choose_zoom_reductions(
    runs, chrom_sizes: dict[str, int], max_levels: int = 8
) -> list[int]:
    """UCSC-style reduction ladder from data statistics: initial level
    ~10x the mean run span (min 16), x4 per level, stopping once a
    level would exceed half the largest chromosome. One lightweight
    aggregate pass."""
    from pyspark.sql import functions as F

    row = runs.agg(
        F.avg(F.col("end") - F.col("start")).alias("mean_span")
    ).first()
    if row is None or row.mean_span is None:
        return []
    base = max(16, int(row.mean_span * 10))
    cap = max(chrom_sizes.values(), default=0) // 2
    levels = []
    red = base
    while len(levels) < max_levels and red <= cap:
        levels.append(red)
        red *= 4
    return levels


def _chrom_btree(chrom_sizes: dict[str, int], chrom_ids: dict[str, int]) -> bytes:
    names = sorted(chrom_sizes)
    key_size = max((len(n) for n in names), default=1)
    hdr = struct.pack(_CHROM_TREE_HDR, 
        CHROM_TREE_MAGIC, RTREE_BLOCK_SIZE, key_size, 8, len(names), 0
    )
    node = struct.pack(_NODE_HDR, 1, 0, len(names))
    items = b"".join(
        n.encode().ljust(key_size, b"\0")
        + struct.pack("<II", chrom_ids[n], chrom_sizes[n])
        for n in names
    )
    return hdr + node + items


def _build_rtree(leaf_items: list[tuple], block_size: int = RTREE_BLOCK_SIZE):
    """Nested node structure bottom-up. A leaf item is
    (start_cid, start, end_cid, end, offset, size); internal levels
    group block_size children."""
    level = [("leaf", leaf_items[i : i + block_size]) for i in range(0, len(leaf_items), block_size)]
    if not level:
        level = [("leaf", [])]
    while len(level) > 1:
        level = [
            ("node", level[i : i + block_size])
            for i in range(0, len(level), block_size)
        ]
    return level[0]


def _node_bounds(node):
    kind, children = node
    if kind == "leaf":
        if not children:
            return (0, 0, 0, 0)
        return (children[0][0], children[0][1], children[-1][2], children[-1][3])
    first = _node_bounds(children[0])
    last = _node_bounds(children[-1])
    return (first[0], first[1], last[2], last[3])


def _serialize_rtree(root, base_offset: int) -> bytes:
    """Pre-order layout: each internal node's child offsets are computed
    from the running cursor (parent precedes children, children written
    in order)."""

    def node_size(node):
        kind, children = node
        per = struct.calcsize(_RTREE_LEAF_ITEM) if kind == "leaf" else struct.calcsize(_RTREE_CHILD_ITEM)
        return struct.calcsize(_NODE_HDR) + len(children) * per

    out = bytearray()

    def write(node, offset):
        kind, children = node
        if kind == "leaf":
            out.extend(struct.pack(_NODE_HDR, 1, 0, len(children)))
            for sc, sb, ec, eb, off, size in children:
                out.extend(struct.pack(_RTREE_LEAF_ITEM, sc, sb, ec, eb, off, size))
            return offset + node_size(node)
        out.extend(struct.pack(_NODE_HDR, 0, 0, len(children)))
        child_off = offset + node_size(node)
        offs = []
        for ch in children:
            offs.append(child_off)
            child_off = _subtree_end(ch, child_off)
        for ch, off in zip(children, offs):
            sc, sb, ec, eb = _node_bounds(ch)
            out.extend(struct.pack(_RTREE_CHILD_ITEM, sc, sb, ec, eb, off))
        cur = offset + node_size(node)
        for ch in children:
            cur = write(ch, cur)
        return cur

    def _subtree_end(node, offset):
        kind, children = node
        end = offset + node_size(node)
        if kind == "node":
            for ch in children:
                end = _subtree_end(ch, end)
        return end

    write(root, base_offset)
    return bytes(out)


def assemble_bigwig(
    sections: list,
    chrom_sizes: dict[str, int],
    path: str,
    compress: bool = True,
    zoom_levels: list | None = None,
) -> dict:
    """Single-writer file assembly from materialized section records
    (dicts or Rows with the ``to_bigwig_sections`` schema). Pure bytes +
    local IO — no Spark objects, so the engine package never collects;
    callers hand in whatever iterator they materialized.

    ``zoom_levels``: optional ``[(reduction, zoom_section_records), ...]``
    pairs from ``to_zoom_sections`` (coarsest last, per UCSC
    convention of ascending reductionLevel). Each level gets its own
    data block + R-tree and a 24-byte zoom header after the common
    header; readers (genome browsers) pick the coarsest level finer
    than their pixel resolution instead of scanning full data.

    Returns the summary dict (validCount/min/max/sumData/sumSquares)
    for caller-side assertions.
    """
    secs = sorted(
        (dict(s.asDict()) if hasattr(s, "asDict") else dict(s) for s in sections),
        key=lambda s: (s["chrom_id"], s["start_bp"]),
    )
    zooms = []
    for red, zsecs in zoom_levels or []:
        zs = sorted(
            (dict(s.asDict()) if hasattr(s, "asDict") else dict(s) for s in zsecs),
            key=lambda s: (s["chrom_id"], s["start_bp"]),
        )
        if zs:  # empty levels are dropped, not written as dead headers
            zooms.append((int(red), zs))
    chrom_ids = chrom_id_map(chrom_sizes)
    btree = _chrom_btree(chrom_sizes, chrom_ids)

    header_size = struct.calcsize(_HEADER)
    zoom_hdr_bytes = len(zooms) * struct.calcsize(_ZOOM_HEADER)
    total_summary_offset = header_size + zoom_hdr_bytes
    chrom_tree_offset = total_summary_offset + struct.calcsize(_TOTAL_SUMMARY)
    full_data_offset = chrom_tree_offset + len(btree)

    cursor = full_data_offset + 8  # uint64 item count precedes sections
    leaf_items = []
    for s in secs:
        size = len(s["blob"])
        leaf_items.append(
            (
                s["chrom_id"],
                int(s["start_bp"]),
                s["chrom_id"],
                int(s["end_bp"]),
                cursor,
                size,
            )
        )
        cursor += size
    full_index_offset = cursor

    root = _build_rtree(leaf_items)
    sc, sb, ec, eb = _node_bounds(root)
    rtree_hdr = struct.pack(_RTREE_HDR, 
        RTREE_MAGIC,
        RTREE_BLOCK_SIZE,
        len(leaf_items),
        sc,
        sb,
        ec,
        eb,
        full_index_offset,
        min(len(leaf_items), RTREE_BLOCK_SIZE) or 1,
        0,
    )
    rtree = rtree_hdr + _serialize_rtree(root, full_index_offset + struct.calcsize(_RTREE_HDR))

    # zoom levels: per level, a u32 record count + sections + R-tree,
    # appended after the full-data index; offsets recorded in the zoom
    # headers written right after the common header
    cursor = full_index_offset + len(rtree)
    zoom_headers: list[tuple[int, int, int]] = []  # (reduction, data_off, index_off)
    zoom_blocks: list[bytes] = []
    for red, zs in zooms:
        data_off = cursor
        block = bytearray(struct.pack("<I", sum(int(s["n_items"]) for s in zs)))
        cursor += len(block)
        zleafs = []
        for s in zs:
            size = len(s["blob"])
            zleafs.append(
                (
                    s["chrom_id"],
                    int(s["start_bp"]),
                    s["chrom_id"],
                    int(s["end_bp"]),
                    cursor,
                    size,
                )
            )
            block += bytes(s["blob"])
            cursor += size
        index_off = cursor
        zroot = _build_rtree(zleafs)
        zsc, zsb, zec, zeb = _node_bounds(zroot)
        zhdr = struct.pack(_RTREE_HDR,
            RTREE_MAGIC,
            RTREE_BLOCK_SIZE,
            len(zleafs),
            zsc,
            zsb,
            zec,
            zeb,
            index_off,
            min(len(zleafs), RTREE_BLOCK_SIZE) or 1,
            0,
        )
        zrtree = zhdr + _serialize_rtree(zroot, index_off + struct.calcsize(_RTREE_HDR))
        block += zrtree
        cursor += len(zrtree)
        zoom_headers.append((red, data_off, index_off))
        zoom_blocks.append(bytes(block))

    valid = sum(int(s["valid_count"]) for s in secs)
    summary = {
        "validCount": valid,
        "minVal": min((s["min_val"] for s in secs), default=0.0),
        "maxVal": max((s["max_val"] for s in secs), default=0.0),
        "sumData": float(sum(s["sum_data"] for s in secs)),
        "sumSquares": float(sum(s["sum_squares"] for s in secs)),
    }
    raw_sizes = [int(s["raw_size"]) for s in secs] + [
        int(s["raw_size"]) for _, zs in zooms for s in zs
    ]
    uncompress_buf = max(raw_sizes, default=0) if compress else 0

    header = struct.pack(_HEADER,
        BIGWIG_MAGIC,
        BBI_VERSION,
        len(zooms),
        chrom_tree_offset,
        full_data_offset,
        full_index_offset,
        0,  # fieldCount (0 for bigWig)
        0,  # definedFieldCount
        0,  # autoSqlOffset
        total_summary_offset,
        uncompress_buf,
        0,  # extension/reserved
    )
    with open(path, "wb") as f:
        f.write(header)
        for red, data_off, index_off in zoom_headers:
            f.write(struct.pack(_ZOOM_HEADER, red, 0, data_off, index_off))
        f.write(
            struct.pack(_TOTAL_SUMMARY,
                summary["validCount"],
                summary["minVal"],
                summary["maxVal"],
                summary["sumData"],
                summary["sumSquares"],
            )
        )
        f.write(btree)
        # UCSC dataCount semantics: the uint64 at fullDataOffset is the
        # number of data SECTIONS for bigWig (what bedGraphToBigWig
        # writes and bbiItemCount/bigWigInfo primaryDataCount read),
        # not the total interval count.
        f.write(struct.pack("<Q", len(secs)))
        for s in secs:
            f.write(bytes(s["blob"]))
        f.write(rtree)
        for block in zoom_blocks:
            f.write(block)
    return summary


def read_bigwig_index(path: str):
    """Driver-side parse of the small metadata: header fields, chrom
    id -> (name, size), and the R-tree leaf (offset, size) list — the
    bigWig analog of reading a parquet footer."""
    with open(path, "rb") as f:
        buf = f.read()
    (
        magic,
        version,
        zoom_levels,
        chrom_tree_offset,
        full_data_offset,
        full_index_offset,
        _fc,
        _dfc,
        _auto,
        total_summary_offset,
        uncompress_buf,
        _ext,
    ) = struct.unpack_from(_HEADER, buf, 0)
    if magic != BIGWIG_MAGIC:
        raise ValueError(f"not a bigWig file (magic {magic:#x})")

    tmagic, _bs, key_size, _vs, n_chroms, _r = struct.unpack_from(_CHROM_TREE_HDR, 
        buf, chrom_tree_offset
    )
    if tmagic != CHROM_TREE_MAGIC:
        raise ValueError("bad chromosome B+ tree magic")
    off = chrom_tree_offset + struct.calcsize(_CHROM_TREE_HDR)
    is_leaf, _, count = struct.unpack_from(_NODE_HDR, buf, off)
    off += struct.calcsize(_NODE_HDR)
    chroms = {}
    if not is_leaf:
        # externally produced files with > blockSize contigs use a
        # multi-level chrom B+ tree; fail fast on the driver instead of
        # an opaque executor KeyError from an empty chrom map
        raise ValueError(
            "unsupported bigWig: multi-level chromosome B+ tree "
            f"({n_chroms} contigs, root is not a leaf); this reader "
            "handles single-leaf chrom trees (files written by "
            "write_bigwig, or external files with few contigs)"
        )
    for _ in range(count):
        name = buf[off : off + key_size].rstrip(b"\0").decode()
        cid, size = struct.unpack_from("<II", buf, off + key_size)
        chroms[cid] = (name, size)
        off += key_size + 8

    sections = _walk_rtree_sections(buf, full_index_offset)

    # zoom headers follow the common header; each level carries its own
    # u32 record count + sections + R-tree
    zooms = []
    zh = struct.calcsize(_HEADER)
    for _ in range(zoom_levels):
        red, _res, zdata_off, zindex_off = struct.unpack_from(_ZOOM_HEADER, buf, zh)
        zh += struct.calcsize(_ZOOM_HEADER)
        zooms.append(
            {
                "reduction": red,
                "n_records": struct.unpack_from("<I", buf, zdata_off)[0],
                "sections": _walk_rtree_sections(buf, zindex_off),
            }
        )

    # UCSC dataCount: number of data sections (primaryDataCount), not
    # the total interval count
    n_sections = struct.unpack_from("<Q", buf, full_data_offset)[0]
    return {
        "version": version,
        "zoom_levels": zoom_levels,
        "compressed": uncompress_buf > 0,
        "n_sections": n_sections,
        "summary": dict(
            zip(
                ("validCount", "minVal", "maxVal", "sumData", "sumSquares"),
                struct.unpack_from(_TOTAL_SUMMARY, buf, total_summary_offset),
            )
        ),
        "chroms": chroms,
        "sections": sections,
        "zooms": zooms,
    }


def _walk_rtree_sections(buf: bytes, index_offset: int) -> list[tuple[int, int]]:
    """Enumerate (offset, size) of every leaf block under an R-tree
    (full-data or zoom-level — same structure)."""
    rmagic = struct.unpack_from("<I", buf, index_offset)[0]
    if rmagic != RTREE_MAGIC:
        raise ValueError("bad R-tree magic")
    sections: list[tuple[int, int]] = []

    def walk(node_off):
        is_leaf, _, count = struct.unpack_from(_NODE_HDR, buf, node_off)
        item_off = node_off + struct.calcsize(_NODE_HDR)
        if is_leaf:
            for _ in range(count):
                *_bounds, doff, dsize = struct.unpack_from(_RTREE_LEAF_ITEM, buf, item_off)
                sections.append((doff, dsize))
                item_off += struct.calcsize(_RTREE_LEAF_ITEM)
        else:
            children = []
            for _ in range(count):
                *_bounds, coff = struct.unpack_from(_RTREE_CHILD_ITEM, buf, item_off)
                children.append(coff)
                item_off += struct.calcsize(_RTREE_CHILD_ITEM)
            for coff in children:
                walk(coff)

    n_leaf = struct.unpack_from(_RTREE_HDR, buf, index_offset)[2]
    if n_leaf:
        walk(index_offset + struct.calcsize(_RTREE_HDR))
    return sections


def bigwig_scan(spark, path: str):
    """Parallel bigWig read: the driver parses the index (small — same
    trust model as a parquet footer), then section decode fans out
    through ``mapInPandas``; every task seeks and reads only its own
    byte ranges. Returns ``(chrom, start, end, value)`` with chrom
    resolved through a broadcast id map."""
    import pandas as pd

    from pyspark.sql import functions as F

    idx = read_bigwig_index(path)
    compressed = idx["compressed"]
    names = {cid: name for cid, (name, _size) in idx["chroms"].items()}
    secs = spark.createDataFrame(
        [(o, s) for o, s in idx["sections"]], "offset long, size int"
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            with open(path, "rb") as f:
                for off, size in zip(pdf["offset"], pdf["size"]):
                    f.seek(int(off))
                    for cid, s, e, v in decode_section(f.read(int(size)), compressed):
                        rows.append((names[cid], s, e, float(v)))
            yield pd.DataFrame(
                rows, columns=["chrom", "start", "end", "value"]
            )

    return secs.mapInPandas(
        decode, schema="chrom string, start long, end long, value double"
    ).select(
        "chrom",
        F.col("start").cast("long"),
        F.col("end").cast("long"),
        "value",
    )


def decode_zoom_section(blob: bytes, compressed: bool):
    """Inverse of the ``to_zoom_sections`` packing: list of
    (chrom_id, start, end, valid_count, min, max, sum_data, sum_squares)."""
    raw = zlib.decompress(blob) if compressed else blob
    size = struct.calcsize(_ZOOM_RECORD)
    return [
        struct.unpack_from(_ZOOM_RECORD, raw, off)
        for off in range(0, len(raw), size)
    ]


def bigwig_zoom_scan(spark, path: str, level: int = 0):
    """Parallel read of one zoom level: same fan-out shape as
    ``bigwig_scan`` (driver parses the tiny index, executors seek their
    own byte ranges), yielding the precomputed window summaries a
    browser would render at wide zoom. Zoom record stats are float32 in
    the file; they surface as double."""
    import pandas as pd

    idx = read_bigwig_index(path)
    if level >= len(idx["zooms"]):
        raise ValueError(
            f"zoom level {level} not present ({len(idx['zooms'])} levels)"
        )
    z = idx["zooms"][level]
    compressed = idx["compressed"]
    names = {cid: name for cid, (name, _size) in idx["chroms"].items()}
    secs = spark.createDataFrame(
        [(o, s) for o, s in z["sections"]], "offset long, size int"
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            with open(path, "rb") as f:
                for off, size in zip(pdf["offset"], pdf["size"]):
                    f.seek(int(off))
                    for cid, s, e, vc, mn, mx, sd, sq in decode_zoom_section(
                        f.read(int(size)), compressed
                    ):
                        rows.append(
                            (names[cid], s, e, vc, float(mn), float(mx),
                             float(sd), float(sq))
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "chrom", "start", "end", "valid_count",
                    "min_val", "max_val", "sum_data", "sum_squares",
                ],
            )

    return secs.mapInPandas(
        decode,
        schema=(
            "chrom string, start long, end long, valid_count long, "
            "min_val double, max_val double, sum_data double, "
            "sum_squares double"
        ),
    )


# The scan/pack closures run on executors: register this module for
# by-value closure serialization so workers need no package install
# (same policy as the Arrow kernels, _serde.py).
from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)
