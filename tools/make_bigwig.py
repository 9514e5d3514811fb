"""depth-to-bigwig CLI: compress a depth-runs parquet table to a bigWig
track — the reference's ``depth_to_bigwig`` boundary
(``ugvc/pipelines/coverage_analysis.py:686-714``, which shells to UCSC
``bedGraphToBigWig``) as an in-engine tool.

Section packing (struct + zlib) runs distributed in Spark
(``sources/bigwig.py::to_bigwig_sections``); this CLI is the
single-writer endpoint that materializes the compressed section records
and assembles the one indexed binary file — the only place in the repo
a bigWig write touches the driver, kept outside the engine package on
purpose (every in-package operator stays collect-free).

Usage:
  python tools/make_bigwig.py <runs.parquet> <chrom_sizes.tsv> <out.bw>

``chrom_sizes.tsv``: two columns, chrom name and size (the UCSC
chrom.sizes format the reference passes to bedGraphToBigWig).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    runs_path, sizes_path, out_path = argv

    from pyspark.sql import functions as F

    from variantcalling_spark.session import get_spark
    from variantcalling_spark.sources.bigwig import (
        assemble_bigwig,
        choose_zoom_reductions,
        chrom_id_map,
        to_bigwig_sections,
        to_zoom_sections,
    )

    chrom_sizes = {}
    with open(sizes_path) as f:
        for line in f:
            if line.strip():
                name, size = line.split()[:2]
                chrom_sizes[name] = int(size)

    spark = get_spark("make_bigwig")
    runs = spark.read.parquet(runs_path).select(
        "chrom", "start", "end", F.col("depth").cast("double").alias("depth")
    )
    ids = chrom_id_map(chrom_sizes)
    sections = to_bigwig_sections(runs, ids).collect()
    # zoom ladder from data statistics (UCSC-style: ~10x mean span, x4
    # per level); each level is one distributed reduce + pack pass
    reductions = choose_zoom_reductions(runs, chrom_sizes)
    zoom_levels = [
        (red, to_zoom_sections(runs, ids, red).collect()) for red in reductions
    ]
    summary = assemble_bigwig(sections, chrom_sizes, out_path, zoom_levels=zoom_levels)
    print(
        f"{out_path}: {len(sections)} sections, {len(zoom_levels)} zoom "
        f"levels {reductions}, {summary['validCount']} bases covered, "
        f"max depth {summary['maxVal']:.0f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
