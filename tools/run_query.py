"""Run any registered query from the command line.

    python tools/run_query.py <query_name> [--sf DIR] [--out PATH]
                              [--format parquet|csv|json|show] [--limit N]
                              [--explain] [--list [SUBSTR]]

Examples:
    python tools/run_query.py --list dedup
    python tools/run_query.py q65_ngram_jaccard --sf /root/testdata/sf0.01
    python tools/run_query.py q99_data_curation_funnel --out /tmp/funnel \\
        --format parquet
    python tools/run_query.py q119_concordance_segmented_replay --explain

The reference exposes its pipelines as argparse CLIs (run_comparison.py,
coverage_analysis.py, ...); this is the engine-side equivalent: one entry
point over the whole registry, writing standard formats any downstream
tool reads.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("query", nargs="?", help="registered query name (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="data directory")
    ap.add_argument("--out", default=None, help="output path (directory for parquet/csv)")
    ap.add_argument(
        "--format",
        default="show",
        choices=("parquet", "csv", "json", "show"),
        help="output format; 'show' prints to stdout",
    )
    ap.add_argument("--limit", type=int, default=20, help="row cap for --format show")
    ap.add_argument("--explain", action="store_true", help="print the formatted plan")
    ap.add_argument(
        "--list",
        nargs="?",
        const="",
        default=None,
        metavar="SUBSTR",
        help="list registered queries (optionally filtered), then exit",
    )
    args = ap.parse_args()

    from variantcalling_spark.queries import all_queries

    registry = None
    if args.list is not None:
        from variantcalling_spark.queries import _REGISTRY, _load_all

        _load_all()
        for name, q in sorted(_REGISTRY.items()):
            if args.list in name:
                head = (q.doc or "").strip().splitlines()
                print(f"{name:42s} {head[0] if head else ''}")
        return 0

    if not args.query:
        ap.error("query name required (or --list)")

    from variantcalling_spark.session import get_spark

    spark = get_spark("run_query")
    registry = all_queries()
    if args.query not in registry:
        near = [n for n in registry if args.query in n]
        hint = f" Did you mean: {', '.join(near[:5])}?" if near else ""
        print(f"unknown query {args.query!r}.{hint}", file=sys.stderr)
        return 2

    df = registry[args.query].fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0

    t0 = time.time()
    if args.format == "show":
        # run ONCE: collect limit+1 rows to both display and report the
        # row count (a separate df.count() would re-execute the query,
        # doubling cost and skewing the printed elapsed time)
        rows = df.limit(args.limit + 1).collect()
        spark.createDataFrame(rows[: args.limit], df.schema).show(
            args.limit, truncate=False
        )
        n = (
            len(rows)
            if len(rows) <= args.limit
            else f">{args.limit} (limit+1 probe; exact count skipped)"
        )
    else:
        if not args.out:
            ap.error(f"--out is required for --format {args.format}")
        w = df.write.mode("overwrite")
        if args.format == "parquet":
            w.parquet(args.out)
        elif args.format == "csv":
            w.option("header", "true").csv(args.out)
        else:
            w.json(args.out)
        n = spark.read.format(args.format).load(args.out).count()
    print(
        f"{args.query}: {n} rows in {time.time() - t0:.2f}s"
        + (f" -> {args.out}" if args.out else ""),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
