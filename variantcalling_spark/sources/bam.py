"""Binary BAM ingest: BGZF container + BAM record codec -> the same
typed alignment columns the text-SAM source emits.

The reference treats alignment decode as a ``samtools`` boundary (it
pipes text out of BAM/CRAM, ``ugvc/pipelines/coverage_analysis.py:
653-683``); round 4's text sources closed the text side of that pipe.
This module closes the BINARY side with a pure-Python implementation of
the public SAM/BAM spec (v1.6, section 4): BGZF is concatenated gzip
members with a BSIZE extra field, alignments are little-endian packed
records. No htslib, no samtools — ``gzip``/``struct`` from the stdlib
inside Arrow-batched ``mapInPandas``, one whole file (or one packed
blob) per batch row.

Decoded records surface EXACTLY the ``SAM_COLUMNS`` schema of
``sources/reads.py`` (qname, flag, chrom, pos 1-based, mapq, cigar), so
``sam_to_read_intervals`` -> ``reads_to_depth_runs`` and every other
downstream operator run unchanged on binary input — format parity by
construction, value-proven end-to-end by q118.

Scale shape: ``spark.read.format("binaryFile")`` distributes whole BAM
files across executors (the natural unit — BGZF blocks are not
independently locatable without a .bai index); a 100 TB ingest is many
files, so parallelism is file-count wide, the same sharding the
reference gets from per-sample/per-chromosome BAMs. Decode output lands
in parquet once; no query re-reads BAM.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BAM_MAGIC = b"BAM\x01"
CIGAR_OPS = "MIDNSHP=X"

# BGZF EOF marker: an empty gzip member with the BSIZE extra field
# (SAM spec section 4.1.2).
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_compress(data: bytes, block_size: int = 0xFF00) -> bytes:
    """Pack bytes into BGZF: gzip members of <= block_size uncompressed
    bytes, each carrying the BSIZE extra field, terminated by the EOF
    member. Used by the sink path and the test fixtures."""
    out = bytearray()
    for off in range(0, len(data), block_size):
        chunk = data[off : off + block_size]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = co.compress(chunk) + co.flush()
        # BSIZE = total block length - 1: header(10)+xlen(2)+extra(6)
        # + comp + crc(4)+isize(4), minus one (SAM spec 4.1.1).
        bsize = len(comp) + 25
        out += b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"  # gzip hdr, FEXTRA
        out += struct.pack("<H", 6)  # XLEN
        out += b"BC" + struct.pack("<HH", 2, bsize)
        out += comp
        out += struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
    out += BGZF_EOF
    return bytes(out)


def bgzf_decompress(data: bytes) -> bytes:
    """Inflate a BGZF stream (``gzip`` handles concatenated members; the
    EOF marker is just an empty member)."""
    return gzip.decompress(data)


def pack_bam(records: list[dict], refs: list[tuple[str, int]]) -> bytes:
    """Encode alignment dicts (qname, flag, chrom, pos 1-based, mapq,
    cigar) + reference dictionary into an uncompressed BAM byte stream
    (header + packed records). ``bgzf_compress`` wraps it into a valid
    .bam file. SEQ/QUAL are omitted (l_seq=0) — the depth/pileup inputs
    never carry them, mirroring how the reference's text pipes drop
    them at the samtools boundary."""
    ref_ids = {name: i for i, (name, _) in enumerate(refs)}
    text = "".join(f"@SQ\tSN:{n}\tLN:{ln}\n" for n, ln in refs).encode()
    out = bytearray()
    out += BAM_MAGIC
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", len(refs))
    for name, ln in refs:
        nb = name.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
    for r in records:
        qname = str(r["qname"]).encode() + b"\x00"
        cigar_ops = _encode_cigar(r.get("cigar", "*"))
        ref_id = ref_ids.get(r.get("chrom", "*"), -1)
        pos0 = int(r.get("pos", 0)) - 1  # BAM stores 0-based
        body = struct.pack(
            "<iiBBHHHiiii",
            ref_id,
            pos0,
            len(qname),
            int(r.get("mapq", 0)),
            0,  # bin (unused by this engine)
            len(cigar_ops),
            int(r.get("flag", 0)),
            0,  # l_seq
            -1,  # next_refID
            -1,  # next_pos
            0,  # tlen
        )
        body += qname
        for length, op in cigar_ops:
            body += struct.pack("<I", (length << 4) | CIGAR_OPS.index(op))
        out += struct.pack("<i", len(body)) + body
    return bytes(out)


def _encode_cigar(cigar: str) -> list[tuple[int, str]]:
    if not cigar or cigar == "*":
        return []
    ops, num = [], ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            ops.append((int(num), ch))
            num = ""
    return ops


def parse_bam_bytes(raw: bytes, *, compressed: bool = True) -> pd.DataFrame:
    """Decode one BAM payload into the ``SAM_COLUMNS`` frame (qname,
    flag, chrom, pos 1-based, mapq, cigar). Tolerates both BGZF files
    and raw uncompressed streams (``compressed=False``)."""
    data = bgzf_decompress(raw) if compressed else raw
    if data[:4] != BAM_MAGIC:
        raise ValueError("not a BAM stream (bad magic)")
    off = 4
    (l_text,) = struct.unpack_from("<i", data, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    ref_names: list[str] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4
        ref_names.append(data[off : off + l_name - 1].decode())
        off += l_name + 4  # name + l_ref
    qnames, flags, chroms, poss, mapqs, cigars = [], [], [], [], [], []
    n = len(data)
    while off + 4 <= n:
        (block_size,) = struct.unpack_from("<i", data, off)
        off += 4
        rec_end = off + block_size
        (
            ref_id,
            pos0,
            l_read_name,
            mapq,
            _bin,
            n_cigar,
            flag,
            l_seq,
            _next_ref,
            _next_pos,
            _tlen,
        ) = struct.unpack_from("<iiBBHHHiiii", data, off)
        p = off + 32
        qnames.append(data[p : p + l_read_name - 1].decode())
        p += l_read_name
        ops = struct.unpack_from(f"<{n_cigar}I", data, p)
        cigars.append(
            "".join(f"{v >> 4}{CIGAR_OPS[v & 0xF]}" for v in ops) if ops else "*"
        )
        flags.append(flag)
        chroms.append(ref_names[ref_id] if 0 <= ref_id < n_ref else "*")
        poss.append(pos0 + 1)  # surface 1-based like SAM text
        mapqs.append(mapq)
        off = rec_end
    return pd.DataFrame(
        {
            "qname": pd.array(qnames, dtype="str"),
            "flag": pd.array(flags, dtype="int32"),
            "chrom": pd.array(chroms, dtype="str"),
            "pos": pd.array(poss, dtype="int64"),
            "mapq": pd.array(mapqs, dtype="int32"),
            "cigar": pd.array(cigars, dtype="str"),
        }
    )


BAM_SCHEMA = "qname string, flag int, chrom string, pos long, mapq int, cigar string"


def read_bam(spark: SparkSession, path: str) -> DataFrame:
    """Distributed BAM scan: binaryFile source (one row per .bam) ->
    per-file decode inside an Arrow batch loop. Emits the text-SAM
    parser's schema, so every downstream alignment operator is
    format-agnostic."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                yield parse_bam_bytes(bytes(content))

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema=BAM_SCHEMA)


from variantcalling_spark._serde import register_module_by_value  # noqa: E402

register_module_by_value(__name__)
