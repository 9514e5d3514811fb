"""FASTA source -> reference-sequence chunk table (SURVEY.md §1.1
auxiliary data model): (chrom string, chunk_start long, seq string).

Replaces pysam/pyfaidx random access (`calibrate_bridging_snvs.py:28-30`,
`collect_hpol_table.py:93-97`) with an ingest job producing a table that
downstream operators JOIN against by range — the Spark-native shape for
"fetch reference context at (chrom, pos)". The chunk table for a full
human genome is ~3.1 Gbp / chunk_size rows and is either broadcast
(small chunk count) or range-joined via the bucketed interval join.

Parsing note: FASTA is line-oriented with order-dependent meaning (a
sequence line belongs to the most recent header), so the ingest uses
``zipWithIndex`` once to pin global line order — the one legitimately
RDD-touching ingest in the engine — then everything is DataFrame logic.
Contig tagging is a broadcast lookup against the (tiny, #contigs-row)
header table, and the within-contig offset is a two-level bucketed
cumulative sum — no window ever spans a whole file or contig, so the
ingest scales to any reference. Runs once per build; queries never
reparse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str, chunk_size: int = 10_000) -> DataFrame:
    """Parse FASTA text into (chrom, chunk_start, seq) chunks.

    chunk_start is the 0-based offset of the chunk's first base within
    its contig; chunks are exactly ``chunk_size`` bases except the last
    per contig.
    """
    lines = spark.read.text(path).rdd.zipWithIndex().map(
        lambda t: (t[0]["value"], t[1])
    )
    df = spark.createDataFrame(lines, "value string, line_no long")
    # contig tagging: a line belongs to the last preceding header. The
    # header table is #contigs rows — broadcast it as one sorted array
    # and resolve per line map-side (a global last-non-null window here
    # would funnel the whole file through one task).
    headers = df.where(F.col("value").startswith(">")).select(
        F.col("line_no").alias("h_line"),
        F.regexp_extract(F.col("value"), r">(\S+)", 1).alias("chrom"),
    )
    harr = headers.agg(
        F.array_sort(F.collect_list(F.struct("h_line", "chrom"))).alias("hs")
    )
    seq_lines = (
        df.where(~F.col("value").startswith(">") & (F.length("value") > 0))
        .crossJoin(F.broadcast(harr))
        .withColumn(
            "chrom",
            F.element_at(
                F.filter("hs", lambda h: h["h_line"] < F.col("line_no")), -1
            )["chrom"],
        )
        .drop("hs")
    )
    # within-contig base offset: two-level cumulative sum of line
    # lengths (within line-bucket window + per-contig bucket-prefix
    # join), same decomposition as operators/pileup.py — bounded
    # partitions at any contig length.
    lb_size = 4096
    t = seq_lines.withColumn("lb", F.floor(F.col("line_no") / lb_size))
    btot = t.groupBy("chrom", "lb").agg(F.sum(F.length("value")).alias("blen"))
    wb = Window.partitionBy("chrom").orderBy("lb")
    bpre = btot.select(
        "chrom",
        "lb",
        F.coalesce(
            F.sum("blen").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("bprefix"),
    )
    ww = Window.partitionBy("chrom", "lb").orderBy("line_no")
    with_off = (
        t.join(bpre, ["chrom", "lb"])
        .withColumn(
            "offset",
            F.coalesce(
                F.sum(F.length("value")).over(
                    ww.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.col("bprefix"),
        )
    )
    # re-chunk to fixed-size blocks: explode each line into the chunks it
    # overlaps, substring accordingly, then assemble per (chrom, chunk)
    first_chunk = F.floor(F.col("offset") / chunk_size)
    last_chunk = F.floor((F.col("offset") + F.length("value") - 1) / chunk_size)
    pieces = with_off.select(
        "chrom",
        "offset",
        "value",
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    ).select(
        "chrom",
        "chunk_id",
        F.col("offset").alias("piece_off"),
        F.expr(
            f"substr(value, greatest(chunk_id * {chunk_size} - offset, 0) + 1, "
            f"least((chunk_id + 1) * {chunk_size}, offset + length(value)) - "
            f"greatest(chunk_id * {chunk_size}, offset))"
        ).alias("piece"),
    )
    assembled = (
        pieces.groupBy("chrom", "chunk_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("piece_off", "piece")))["piece"]
            ).alias("seq")
        )
        .select(
            "chrom",
            (F.col("chunk_id") * chunk_size).alias("chunk_start"),
            "seq",
        )
    )
    return assembled


def fetch(chunks: DataFrame, regions: DataFrame, chunk_size: int = 10_000) -> DataFrame:
    """Fetch subsequences for (chrom, start, end) regions by range-joining
    the chunk table — the distributed `reference.fetch(contig, s, e)`.

    Assumes end - start spans at most 2 chunks per region boundary rule;
    general spans are handled by the chunk-range explode below.
    """
    r = regions.select(
        "chrom",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / chunk_size),
                F.floor((F.col("end") - 1) / chunk_size),
            )
        ).alias("chunk_id"),
    )
    j = r.join(
        chunks.withColumn("chunk_id", F.floor(F.col("chunk_start") / chunk_size)),
        ["chrom", "chunk_id"],
    )
    piece = F.expr(
        "substr(seq, greatest(start - chunk_start, 0) + 1, "
        "least(end, chunk_start + length(seq)) - greatest(start, chunk_start))"
    )
    return (
        j.select("chrom", "start", "end", F.col("chunk_start").alias("off"), piece.alias("piece"))
        .groupBy("chrom", "start", "end")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("off", "piece")))["piece"]
            ).alias("seq")
        )
    )
