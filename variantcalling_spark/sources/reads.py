"""Text-SAM and mpileup fixture sources -> the pileup operators' inputs.

The reference never parses alignments itself — it shells out to samtools
and consumes the TEXT it emits (``samtools depth | awk`` bed rows,
``ugvc/pipelines/coverage_analysis.py:653-683``; ``bcftools mpileup``
records, ``ugvc/comparison/variant_hit_fraction_caller.py:23-28``).
These sources close that ingest boundary for the text formats on the
pipe: SAM alignment lines become the half-open read intervals
``(chrom, start, end)`` that ``reads_to_depth_runs`` consumes, and
``samtools mpileup`` lines become the per-base observations
``(chrom, pos, is_alt)`` that ``pileup_call_variants`` consumes — the
two operators run UNCHANGED on parsed text (pinned in
tests/test_sources.py). Binary BAM/CRAM decode stays an ingest-job
boundary by design (SURVEY §2.1).

Both parsers are splittable line sources (``spark.read.text``): SAM
field/CIGAR handling is pure JVM expressions (split + regexp +
higher-order fold); only the mpileup base-string decode — a genuinely
sequential little grammar (``^X`` mapq prefixes, ``+N``/``-N`` inline
indels) — runs as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# CIGAR ops that consume reference bases (SAM spec section 1.4).
_REF_OPS = "MDN=X"

SAM_COLUMNS = ("qname", "flag", "chrom", "pos", "mapq", "cigar")
_FLAG_UNMAPPED = 4


def read_sam_flat(spark: SparkSession, path: str) -> DataFrame:
    """Read SAM text lines -> typed alignment columns (qname, flag,
    chrom, pos 1-based, mapq, cigar). ``@``-prefixed header lines are
    skipped; SEQ/QUAL/optional tags are not materialized (column
    pruning starts at the source: depth needs none of them)."""
    return parse_sam_lines(spark.read.text(path))


def parse_sam_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a DataFrame of SAM text lines (any line source: files,
    Kafka payloads, a constructed column) into alignment columns.
    ``try_element_at`` (not ``element_at``): Catalyst merges downstream
    predicates into this filter and conjunct order is not
    short-circuit-guaranteed, so field access must be total — short
    header/malformed lines parse to NULLs and fall out of any
    mapped-record filter instead of throwing under ANSI mode."""
    lines = lines.where(~F.col(value_col).startswith("@"))
    f = F.split(F.col(value_col), "\t")
    return lines.select(
        F.try_element_at(f, F.lit(1)).alias("qname"),
        F.try_element_at(f, F.lit(2)).cast("int").alias("flag"),
        F.try_element_at(f, F.lit(3)).alias("chrom"),
        F.try_element_at(f, F.lit(4)).cast("long").alias("pos"),
        F.try_element_at(f, F.lit(5)).cast("int").alias("mapq"),
        F.try_element_at(f, F.lit(6)).alias("cigar"),
    )


def cigar_reference_length(cigar):
    """Reference-consumed length of a CIGAR string as a JVM expression:
    tokenize with regexp_extract_all, fold token lengths over the ops
    that consume reference (MDN=X). ``*`` (unavailable) folds to 0."""
    col = F.col(cigar) if isinstance(cigar, str) else cigar
    tokens = F.regexp_extract_all(col, F.lit(r"(\d+)([MIDNSHPX=])"), F.lit(0))
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(
            F.right(t, F.lit(1)).isin(*list(_REF_OPS)),
            F.left(t, F.length(t) - 1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def sam_to_read_intervals(sam: DataFrame, min_mapq: int = 0) -> DataFrame:
    """Mapped SAM records -> half-open read intervals (chrom, start,
    end): start = POS - 1 (SAM is 1-based), end = start + CIGAR
    reference length. Unmapped records (flag 0x4 or ``chrom='*'``) and
    sub-``min_mapq`` alignments are dropped — the ``samtools depth``
    defaults the reference pipes through."""
    ref_len = cigar_reference_length("cigar")
    return (
        sam.where(
            (F.col("flag").bitwiseAND(_FLAG_UNMAPPED) == 0)
            & (F.col("chrom") != "*")
            & (F.col("mapq") >= min_mapq)
        )
        .select(
            "chrom",
            (F.col("pos") - 1).alias("start"),
            (F.col("pos") - 1 + ref_len).alias("end"),
        )
        .where(F.col("end") > F.col("start"))
    )


MPILEUP_SCHEMA = (
    "chrom string, pos long, ref string, dp int, bases string, quals string"
)


def read_mpileup(spark: SparkSession, path: str) -> DataFrame:
    """Read ``samtools mpileup`` text (chrom, 1-based pos, ref base,
    depth, base string, qual string) into typed columns."""
    lines = spark.read.text(path)
    f = F.split(F.col("value"), "\t")
    return lines.select(
        F.try_element_at(f, F.lit(1)).alias("chrom"),
        F.try_element_at(f, F.lit(2)).cast("long").alias("pos"),
        F.try_element_at(f, F.lit(3)).alias("ref"),
        F.try_element_at(f, F.lit(4)).cast("int").alias("dp"),
        F.try_element_at(f, F.lit(5)).alias("bases"),
        F.try_element_at(f, F.lit(6)).alias("quals"),
    )


_INDEL_RE = re.compile(r"[+-](\d+)")


def _decode_base_string(bases: str) -> list[bool]:
    """Decode one mpileup base string into per-observation is_alt flags.

    Grammar handled (samtools mpileup): ``.``/``,`` reference match,
    ``ACGTNacgtn`` mismatch, ``*``/``#`` deletion placeholder (counts as
    an alt-supporting observation), ``^X`` read-start marker (skip the
    mapq char), ``$`` read-end marker, ``+N<seq>``/``-N<seq>`` inline
    indel attached to the PREVIOUS observation (skipped: mpileup's DP
    does not count them)."""
    out: list[bool] = []
    i, n = 0, len(bases)
    while i < n:
        ch = bases[i]
        if ch == "^":
            i += 2  # caret + mapq char
            continue
        if ch == "$":
            i += 1
            continue
        if ch in "+-":
            m = _INDEL_RE.match(bases, i)
            if m:
                i = m.end() + int(m.group(1))
                continue
            i += 1
            continue
        if ch in ".,":
            out.append(False)
        elif ch in "ACGTNacgtn*#":
            out.append(True)
        i += 1
    return out


def mpileup_to_base_observations(mp: DataFrame) -> DataFrame:
    """mpileup rows -> one row per base observation (chrom, pos,
    is_alt), the ``pileup_call_variants`` input. The sequential base-
    string grammar runs once per position inside an Arrow batch loop
    (mapInPandas); the explode to observations is the same shape the
    binary decoder of a real ingest job would produce."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chroms: list[str] = []
            poss: list[int] = []
            alts: list[bool] = []
            for chrom, pos, bases in zip(pdf["chrom"], pdf["pos"], pdf["bases"]):
                for is_alt in _decode_base_string(bases or ""):
                    chroms.append(chrom)
                    poss.append(int(pos))
                    alts.append(is_alt)
            yield pd.DataFrame(
                {
                    "chrom": pd.array(chroms, dtype="str"),
                    "pos": pd.array(poss, dtype="int64"),
                    "is_alt": pd.array(alts, dtype="bool"),
                }
            )

    return mp.select("chrom", "pos", "bases").mapInPandas(
        decode, schema="chrom string, pos long, is_alt boolean"
    )


from variantcalling_spark._serde import register_module_by_value  # noqa: E402

register_module_by_value(__name__)
