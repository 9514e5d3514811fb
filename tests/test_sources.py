"""Round-trip tests for the VCF / BED / interval_list text sources."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from variantcalling_spark.sources.bed import read_bed, read_interval_list, to_bed_lines
from variantcalling_spark.sources.vcf import read_vcf, to_vcf_lines, vcf_header

VCF_BODY = "\n".join(
    [
        "chr1\t100\trs1\tA\tG\t50.5\tPASS\tDP=30;AF=0.5",
        "chr1\t200\t.\tC\tT,G\t.\t.\t.",
        "chr2\t5\t.\tGTT\tG\t10\tLowQual\tSVTYPE=DEL",
    ]
)


def _write(tmp_path, name, text):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write(text + "\n")
    return p


def test_vcf_parse_fixed_and_info(spark, tmp_path):
    p = _write(tmp_path, "t.vcf", vcf_header(["chr1", "chr2"]) + "\n" + VCF_BODY)
    df = read_vcf(spark, p, sample_format=False).orderBy("chrom", "pos")
    rows = df.collect()
    assert [r.chrom for r in rows] == ["chr1", "chr1", "chr2"]
    assert rows[0].alleles == ["A", "G"]
    assert rows[1].alleles == ["C", "T", "G"]  # multiallelic: REF first
    assert rows[1].qual is None and rows[1].id is None and rows[1].filter is None
    assert rows[0].info["DP"] == "30" and rows[0].info["AF"] == "0.5"
    assert rows[1].info == {}
    assert rows[2].info["SVTYPE"] == "DEL"


def test_vcf_sample_format_map(spark, tmp_path):
    body = "chr1\t10\t.\tA\tC\t5\tPASS\tDP=9\tGT:GQ:PL\t0/1:40:10,0,60"
    p = _write(tmp_path, "s.vcf", vcf_header(sample="s1") + "\n" + body)
    r = read_vcf(spark, p).first()
    assert r.fmt["GT"] == "0/1"
    assert r.fmt["PL"] == "10,0,60"


def test_vcf_round_trip(spark, tmp_path):
    p = _write(tmp_path, "rt.vcf", vcf_header() + "\n" + VCF_BODY)
    df = read_vcf(spark, p, sample_format=False)
    lines = {r.value for r in to_vcf_lines(df).collect()}
    # qual prints as double (50.5, 10.0) — compare the reparsed form
    p2 = os.path.join(str(tmp_path), "out.vcf")
    with open(p2, "w") as f:
        f.write("\n".join(sorted(lines)) + "\n")
    df2 = read_vcf(spark, p2, sample_format=False)
    key = lambda r: (r.chrom, r.pos, r.ref, tuple(r.alleles), r.filter)  # noqa: E731
    a = {key(r) for r in df.select("chrom", "pos", "ref", "alleles", "filter").collect()}
    b = {key(r) for r in df2.select("chrom", "pos", "ref", "alleles", "filter").collect()}
    assert a == b


def test_bed_read_and_headers(spark, tmp_path):
    text = "track name=x\n#comment\nchr1\t0\t100\tr1\nchr1\t150\t250\tr2\nchr2\t5\t9"
    p = _write(tmp_path, "a.bed", text)
    df = read_bed(spark, p).orderBy("chrom", "start")
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0].start == 0 and rows[0].end == 100 and rows[0].name == "r1"
    assert rows[2].name is None
    lines = to_bed_lines(df).collect()
    assert lines[0].value == "chr1\t0\t100"


def test_interval_list_converts_to_half_open(spark, tmp_path):
    text = "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\nchr1\t1\t100\t+\tr1\nchr1\t201\t300\t+\tr2"
    p = _write(tmp_path, "a.interval_list", text)
    rows = read_interval_list(spark, p).orderBy("start").collect()
    # 1-based closed [1,100] -> 0-based half-open [0,100)
    assert (rows[0].start, rows[0].end) == (0, 100)
    assert (rows[1].start, rows[1].end) == (200, 300)
    assert rows[1].name == "r2"


def test_fasta_chunks_and_fetch(spark, tmp_path):
    from variantcalling_spark.sources.fasta import fetch, read_fasta

    seq1 = "ACGTACGTAA" * 7  # 70 bases, uneven vs chunk 16
    seq2 = "GGGCCCTTTA" * 3  # 30 bases
    fasta = ">chr1 desc here\n" + "\n".join(
        seq1[i : i + 12] for i in range(0, len(seq1), 12)
    ) + "\n>chr2\n" + "\n".join(seq2[i : i + 9] for i in range(0, len(seq2), 9))
    p = _write(tmp_path, "ref.fa", fasta)
    chunks = read_fasta(spark, p, chunk_size=16)
    got1 = "".join(
        r.seq for r in chunks.where(F.col("chrom") == "chr1").orderBy("chunk_start").collect()
    )
    got2 = "".join(
        r.seq for r in chunks.where(F.col("chrom") == "chr2").orderBy("chunk_start").collect()
    )
    assert got1 == seq1 and got2 == seq2
    # every chunk except the last is exactly chunk_size
    for r in chunks.where(F.col("chrom") == "chr1").orderBy("chunk_start").collect()[:-1]:
        assert len(r.seq) == 16

    regions = spark.createDataFrame(
        [("chr1", 5, 25), ("chr1", 60, 70), ("chr2", 0, 30), ("chr1", 15, 17)],
        "chrom string, start long, end long",
    )
    out = {
        (r.chrom, r.start, r.end): r.seq
        for r in fetch(chunks, regions, chunk_size=16).collect()
    }
    assert out[("chr1", 5, 25)] == seq1[5:25]
    assert out[("chr1", 60, 70)] == seq1[60:70]
    assert out[("chr2", 0, 30)] == seq2
    assert out[("chr1", 15, 17)] == seq1[15:17]  # chunk-boundary crossing


def test_object_store_config_shapes():
    """Connector config maps (no network: pure dict contracts)."""
    from variantcalling_spark.session import normalize_cloud_uri, object_store_configs

    s3 = object_store_configs("s3a", anonymous=True, endpoint="http://minio:9000",
                              path_style_access=True)
    assert s3["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "AnonymousAWSCredentialsProvider"
    )
    assert s3["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert s3["spark.hadoop.fs.s3a.path.style.access"] == "true"

    gs = object_store_configs("gs", keyfile="/k.json")
    assert gs["spark.hadoop.google.cloud.auth.service.account.json.keyfile"] == "/k.json"
    # modern (hadoop3 2.2.x+) connector reads fs.gs.auth.type, not the
    # legacy google.cloud.auth.* keys — both generations must be present
    assert gs["spark.hadoop.fs.gs.auth.type"] == "SERVICE_ACCOUNT_JSON_KEYFILE"
    assert gs["spark.hadoop.fs.gs.auth.service.account.json.keyfile"] == "/k.json"
    gs_anon = object_store_configs("gs", anonymous=True)
    assert gs_anon["spark.hadoop.fs.gs.auth.type"] == "UNAUTHENTICATED"
    assert gs_anon["spark.hadoop.google.cloud.auth.null.enable"] == "true"

    ab = object_store_configs("abfss", account="acct", account_key="k")
    assert (
        ab["spark.hadoop.fs.azure.account.key.acct.dfs.core.windows.net"] == "k"
    )

    import pytest

    with pytest.raises(ValueError):
        object_store_configs("ftp")
    with pytest.raises(ValueError):
        object_store_configs("abfs")

    assert normalize_cloud_uri("s3://b/k.parquet") == "s3a://b/k.parquet"
    assert normalize_cloud_uri("gs://b/k") == "gs://b/k"
    assert normalize_cloud_uri("/local/p") == "/local/p"


def test_sam_flat_to_depth_runs(spark, tmp_path):
    """SAM text -> read intervals -> reads_to_depth_runs UNCHANGED:
    CIGAR reference length (M/D/N/=/X consume, I/S/H/P don't), 1-based
    POS, unmapped/low-mapq filtering, and the depth runs over the
    parsed intervals match hand-computed coverage."""
    from variantcalling_spark.operators.pileup import reads_to_depth_runs
    from variantcalling_spark.sources.reads import read_sam_flat, sam_to_read_intervals

    sam = "\n".join(
        [
            "@HD\tVN:1.6\tSO:coordinate",
            "@SQ\tSN:c1\tLN:10000",
            # POS 11 (1-based) -> start 10; 20M -> end 30
            "r1\t0\tc1\t11\t60\t20M\t*\t0\t0\tAAAA\tFFFF",
            # overlaps r1: start 20, 5M2D5M -> ref len 12 -> end 32
            "r2\t0\tc1\t21\t60\t5M2D5M\t*\t0\t0\tAAAA\tFFFF",
            # insertion + soft clip consume no reference: 3S10M2I -> len 10
            "r3\t0\tc1\t41\t60\t3S10M2I\t*\t0\t0\tAAAA\tFFFF",
            # unmapped: dropped
            "r4\t4\t*\t0\t0\t*\t*\t0\t0\tAAAA\tFFFF",
            # mapq 5 < min_mapq 10: dropped
            "r5\t0\tc1\t51\t5\t10M\t*\t0\t0\tAAAA\tFFFF",
        ]
    )
    p = tmp_path / "fixture.sam"
    p.write_text(sam + "\n")

    intervals = sam_to_read_intervals(read_sam_flat(spark, str(p)), min_mapq=10)
    got = {(r.chrom, r.start, r.end) for r in intervals.collect()}
    assert got == {("c1", 10, 30), ("c1", 20, 32), ("c1", 40, 50)}

    runs = {
        (r.chrom, r.start, r.end, r.depth)
        for r in reads_to_depth_runs(intervals).collect()
    }
    assert runs == {
        ("c1", 10, 20, 1),
        ("c1", 20, 30, 2),
        ("c1", 30, 32, 1),
        ("c1", 40, 50, 1),
    }


def test_mpileup_to_pileup_calls(spark, tmp_path):
    """mpileup text -> per-base observations -> pileup_call_variants
    UNCHANGED: the base-string grammar (^X read starts, $ ends, +N/-N
    inline indels, * deletions) decodes to the depth/alt counts
    samtools reports, and the AF filter emits the same calls."""
    from variantcalling_spark.operators.pileup import pileup_call_variants
    from variantcalling_spark.sources.reads import (
        _decode_base_string,
        mpileup_to_base_observations,
        read_mpileup,
    )

    # unit-level grammar pins
    assert _decode_base_string("..,,") == [False] * 4
    assert _decode_base_string("^F..$") == [False, False]
    assert _decode_base_string(".+2AG.") == [False, False]  # indel skipped
    assert _decode_base_string("AaT*") == [True, True, True, True]
    assert _decode_base_string(".-3NNNA") == [False, True]

    mp = "\n".join(
        [
            # 10 obs, 4 alt -> af 0.4 >= 0.25, dp >= 8: emitted
            "c1\t100\tA\t10\t..AA,,aa..\tFFFFFFFFFF",
            # 8 obs, 1 alt -> af 0.125 < 0.25: filtered
            "c1\t101\tC\t8\t.......T\tFFFFFFFF",
            # dp 4 < 8: filtered even though all alt
            "c1\t102\tG\t4\tTTTT\tFFFF",
            # read-start/end markers + indel don't inflate dp: 8 obs 4 alt
            "c2\t200\tT\t8\t^F.+1A.$..AAA*\tFFFFFFFF",
        ]
    )
    p = tmp_path / "fixture.pileup"
    p.write_text(mp + "\n")

    obs = mpileup_to_base_observations(read_mpileup(spark, str(p)))
    calls = {
        (r.chrom, r.pos, r.dp, r.ad, r.af)
        for r in pileup_call_variants(obs, min_af=0.25, min_dp=8).collect()
    }
    assert calls == {("c1", 100, 10, 4, 0.4), ("c2", 200, 8, 4, 0.5)}


def test_bam_binary_matches_sam_text(spark, tmp_path):
    """Binary BAM decode must be record-identical to the text-SAM parse
    of the same alignments (same schema, same values), and the depth
    pipeline must produce the same runs from either format."""
    from variantcalling_spark.operators.pileup import reads_to_depth_runs
    from variantcalling_spark.sources.bam import bgzf_compress, pack_bam, read_bam
    from variantcalling_spark.sources.reads import (
        parse_sam_lines,
        sam_to_read_intervals,
    )

    recs = [
        dict(qname="r1", flag=0, chrom="c1", pos=11, mapq=60, cigar="20M"),
        dict(qname="r2", flag=0, chrom="c1", pos=21, mapq=60, cigar="5M2D5M"),
        dict(qname="r3", flag=0, chrom="c1", pos=41, mapq=60, cigar="3S10M2I"),
        dict(qname="r5", flag=0, chrom="c1", pos=51, mapq=5, cigar="10M"),
    ]
    bam_path = tmp_path / "fixture.bam"
    bam_path.write_bytes(
        bgzf_compress(pack_bam(recs, refs=[("c1", 10000)]), block_size=128)
    )

    bam_df = read_bam(spark, str(bam_path))
    sam_lines = spark.createDataFrame(
        [
            (f"{r['qname']}\t{r['flag']}\t{r['chrom']}\t{r['pos']}"
             f"\t{r['mapq']}\t{r['cigar']}\t*\t0\t0\t*\t*",)
            for r in recs
        ],
        ["value"],
    )
    sam_df = parse_sam_lines(sam_lines)
    key = lambda r: (r.qname, r.flag, r.chrom, r.pos, r.mapq, r.cigar)  # noqa: E731
    assert sorted(map(key, bam_df.collect())) == sorted(map(key, sam_df.collect()))

    runs = {
        (r.chrom, r.start, r.end, r.depth)
        for r in reads_to_depth_runs(
            sam_to_read_intervals(bam_df, min_mapq=10)
        ).collect()
    }
    assert runs == {
        ("c1", 10, 20, 1),
        ("c1", 20, 30, 2),
        ("c1", 30, 32, 1),
        ("c1", 40, 50, 1),
    }


def test_bam_unmapped_and_multiblock(spark, tmp_path):
    """BGZF multi-member files decode whole; unmapped records surface
    with chrom='*' and are dropped by the interval filter."""
    from variantcalling_spark.sources.bam import bgzf_compress, pack_bam, read_bam
    from variantcalling_spark.sources.reads import sam_to_read_intervals

    recs = [dict(qname=f"r{i}", flag=(4 if i % 3 == 0 else 0), chrom="cX",
                 pos=100 + i, mapq=30, cigar="10M") for i in range(30)]
    p = tmp_path / "multi.bam"
    p.write_bytes(bgzf_compress(pack_bam(recs, refs=[("cX", 50000)]), block_size=64))
    df = read_bam(spark, str(p))
    assert df.count() == 30
    assert df.where("flag = 4").count() == 10
    assert sam_to_read_intervals(df).count() == 20


def test_fastq_file_roundtrip(spark, tmp_path):
    """write_fastq -> read_fastq over the sharded layout preserves
    every record; the scan is one task per shard and the header
    parser keeps only the id token."""
    from variantcalling_spark.sources.fastq import read_fastq, write_fastq

    rows = [
        ("r1 extra comment", "ACGT", "IIII"),
        ("r2", "GGCC", "!!!!"),
        ("r3", "A", "J"),
    ]
    df = spark.createDataFrame(rows, ["read_id", "seq", "qual"]).repartition(2)
    path = str(tmp_path / "reads_fastq")
    write_fastq(df, path)
    back = {r.read_id: r for r in read_fastq(spark, path).collect()}
    assert set(back) == {"r1", "r2", "r3"}  # id token only, comment dropped
    assert back["r2"].seq == "GGCC" and back["r2"].qual == "!!!!"
    assert back["r3"].seq == "A"


def test_fastq_parser_rejects_malformed():
    """Strict grammar: misaligned fragments and seq/qual mismatches
    raise instead of silently skipping."""
    import pytest

    from variantcalling_spark.sources.fastq import parse_fastq_text

    with pytest.raises(ValueError):
        parse_fastq_text("@r1\nACGT\n+\n")  # qual shorter than seq
    with pytest.raises(ValueError):
        parse_fastq_text("@r1\nACGT\n+\nIIII\nleftover")
    with pytest.raises(ValueError):
        parse_fastq_text("r1\nACGT\n+\nIIII")  # missing '@'
    assert parse_fastq_text("@r1\nACGT\n+r1\nIIII\n") == [("r1", "ACGT", "IIII")]


def test_gff_parser_grammar(spark):
    """GFF3 line grammar: pragmas/comments skipped, dot-null
    score/strand/phase, attribute map access, malformed short lines
    parse to NULLs (the try_element_at totality rule) instead of
    throwing under ANSI."""
    from variantcalling_spark.sources.gff import parse_gff_lines

    lines = spark.createDataFrame(
        [
            ("##gff-version 3",),
            ("# a comment",),
            ("chr1\tsrc\tgene\t100\t500\t0.9\t+\t.\tID=gene:1;Name=G1",),
            ("chr1\tsrc\texon\t100\t200\t.\t-\t2\tID=exon:1;Parent=gene:1",),
            ("broken line without tabs",),
            ("chr2\tsrc\tCDS\t5\t9\t.\t.\t0\tID=cds:1",),
        ],
        "value string",
    )
    rows = {r.ftype: r for r in parse_gff_lines(lines).collect() if r.ftype}
    g = rows["gene"]
    assert (g.seqid, g.start, g.end, g.score, g.strand, g.phase) == (
        "chr1", 100, 500, 0.9, "+", None
    )
    assert g.attributes["Name"] == "G1"
    e = rows["exon"]
    assert (e.score, e.strand, e.phase) == (None, "-", 2)
    assert e.attributes["Parent"] == "gene:1"
    c = rows["CDS"]
    assert (c.strand, c.phase) == (None, 0)
    # malformed line: all typed fields NULL, never an exception
    broken = [
        r for r in parse_gff_lines(lines).collect()
        if r.seqid == "broken line without tabs"
    ]
    assert broken and broken[0].start is None and broken[0].ftype is None
