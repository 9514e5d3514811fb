"""FASTQ source/sink (4-line records, Phred+33 qualities).

Closes the raw-reads leg of the alignment-format family: text SAM and
mpileup (``sources/reads.py``), binary BAM/BGZF (``sources/bam.py``),
and now the pre-alignment FASTQ the reference's pipelines consume
upstream of those (the reference shells out to aligners that read
FASTQ; here the format itself is a first-class scan/sink).

Sharded layout: a FASTQ "file" is a directory of RECORD-ALIGNED text
shards — the writer emits one whole record per DataFrame row through
Spark's distributed text sink, so every part-file holds complete
records and the reader parallelizes per shard without any
record-boundary scanning. This is the same shard discipline the
BGZF-member and bigWig-section codecs use: the only single-writer step
a monolithic .fastq would need (concatenation) is explicitly OUT of
the engine, exactly like ``tools/make_bigwig.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FASTQ_SCHEMA = "read_id string, seq string, qual string"
PHRED33 = 33


def format_fastq_records(
    df: DataFrame,
    id_col: str = "read_id",
    seq_col: str = "seq",
    qual_col: str = "qual",
) -> DataFrame:
    """One FASTQ record string per row (no trailing newline — the text
    sink adds the record separator). Pure projection: formats at scan
    speed on any number of executors."""
    return df.select(
        F.concat(
            F.lit("@"),
            F.col(id_col),
            F.lit("\n"),
            F.col(seq_col),
            F.lit("\n+\n"),
            F.col(qual_col),
        ).alias("value")
    )


def write_fastq(df: DataFrame, path: str, **kwargs) -> None:
    """Distributed FASTQ sink: record-aligned text shards under
    ``path`` (one part-file per partition, each a valid FASTQ
    fragment)."""
    format_fastq_records(df, **kwargs).write.mode("overwrite").text(path)


def parse_fastq_text(text: str) -> list[tuple[str, str, str]]:
    """Parse a record-aligned FASTQ fragment. Strict 4-line grammar:
    '@'-led header (id = first whitespace token), sequence, '+'
    separator (bare or repeating the id), quality of equal length.
    Raises on malformed input — a silent skip would fake coverage."""
    out: list[tuple[str, str, str]] = []
    lines = text.split("\n")
    # tolerate a trailing empty line from the final record separator
    if lines and lines[-1] == "":
        lines = lines[:-1]
    if len(lines) % 4:
        raise ValueError(f"FASTQ fragment has {len(lines)} lines (not 4-aligned)")
    for i in range(0, len(lines), 4):
        hdr, seq, plus, qual = lines[i : i + 4]
        if not hdr.startswith("@"):
            raise ValueError(f"record {i // 4}: header {hdr!r} lacks '@'")
        if not plus.startswith("+"):
            raise ValueError(f"record {i // 4}: separator {plus!r} lacks '+'")
        if len(seq) != len(qual):
            raise ValueError(
                f"record {i // 4}: seq/qual length mismatch {len(seq)}/{len(qual)}"
            )
        out.append((hdr[1:].split(" ")[0].split("\t")[0], seq, qual))
    return out


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """Parallel FASTQ scan: one task per record-aligned shard
    (``wholetext`` per part-file), parsed by the same grammar the
    in-pipeline codec uses — reader and round-trip query share bytes
    and parser."""
    shards = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, seqs, quals = [], [], []
            for text in pdf["value"]:
                for rid, seq, qual in parse_fastq_text(text):
                    ids.append(rid)
                    seqs.append(seq)
                    quals.append(qual)
            yield pd.DataFrame({"read_id": ids, "seq": seqs, "qual": quals})

    return shards.mapInPandas(parse, schema=FASTQ_SCHEMA)


def qual_to_phred(qual_col: str = "qual"):
    """JVM-side Phred+33 decode: array of integer qualities per read
    (no Python in the hot path)."""
    return F.expr(
        f"transform(sequence(1, length({qual_col})),"
        f" i -> ascii(substring({qual_col}, i, 1)) - {PHRED33})"
    )


# Worker-side closures (read_fastq's per-shard parser, q312's in-pipeline
# round trip) reference this module's functions: ship them by value so
# executors never need the package on PYTHONPATH (the _serde policy).
from variantcalling_spark._serde import register_module_by_value  # noqa: E402

register_module_by_value(__name__)
