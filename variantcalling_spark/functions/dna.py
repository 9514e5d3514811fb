"""DNA string functions (SURVEY.md §2.8 string family).

Reverse-complement, homopolymer runs, trinucleotide motif extraction —
the string kernels behind the reference's mutation-spectrum report
(`ugvc/pipelines/run_no_gt_report.py:90-172`) and homopolymer tooling
(`calibrate_bridging_snvs.py:9-66`, `collect_hpol_table.py:99-104`) —
as native Column expressions (translate / reverse / trim: all codegen'd).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def revcomp(seq: Column) -> Column:
    """Reverse complement: translate(reverse(s), ACGT->TGCA)
    (`revcomp` applied at `run_no_gt_report.py:165`)."""
    return F.translate(F.reverse(seq), "ACGTacgt", "TGCAtgca")


def hmer_run_length(seq: Column) -> Column:
    """Length of the homopolymer run at the start of ``seq``.

    Backreference-free (portable to RE2 engines): strip the leading run
    of the first character and diff the lengths — the flow-key RLE step
    (`collect_hpol_table.py:99-104`) and hmer detection
    (`calibrate_bridging_snvs.py:9-66`) reduce to this primitive applied
    along the sequence.
    """
    first = F.substring(seq, 1, 1)
    return F.length(seq) - F.length(F.ltrim(seq, first))


def trinuc_motif(seq: Column, pos: Column) -> Column:
    """3-mer context centered at 1-based ``pos``."""
    return F.substring(seq, pos - 1, 3)


def canonical_trinuc(motif: Column, alt: Column) -> tuple[Column, Column]:
    """Canonicalize a (trinucleotide, alt) pair to the 96-class spectrum.

    The reference reverse-complements motifs whose center base is a
    purine so every class is expressed with a C/T center
    (`snp_statistics`, `run_no_gt_report.py:90-172`, pinned
    `test_run_no_gt_report.py:100-110`).
    """
    center = F.substring(motif, 2, 1)
    is_purine = center.isin("A", "G")
    canon_motif = F.when(is_purine, revcomp(motif)).otherwise(motif)
    canon_alt = F.when(is_purine, F.translate(alt, "ACGTacgt", "TGCAtgca")).otherwise(alt)
    return canon_motif, canon_alt
