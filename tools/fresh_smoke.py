"""Fresh-process driver smoke — the verify-skill checklist item 4.

Run from a cwd OUTSIDE the repo (the serde trap: with cwd=/root/repo
the repo lands on the workers' sys.path and masks missing
register_module_by_value calls):

    cd /tmp && python /root/repo/tools/fresh_smoke.py

Exercises the driver contract exactly as the harness does: a VANILLA
SparkSession (not get_spark — engine-required configs must be applied
by the engine at runtime), entry(), then a registry sample that always
includes at least one applyInPandas kernel (q52/q302/q315) and one
multimodal query (q393) — the two closure families whose serde
registration is most easily lost — plus any names passed as argv.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = [
    "q52_gvcf_compress",  # applyInPandas kernel
    "q315_viterbi_segments",  # applyInPandas sequential kernel
    "q393_perceptual_image_dedup",  # multimodal inline closures
    "q302_holt_linear",
]


def main() -> int:
    if os.path.abspath(os.getcwd()).startswith(REPO):
        print("WARNING: run from outside the repo for a honest serde check")
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import __spark_entry__ as e

    n = e.entry(spark).count()
    assert n > 0, "entry() must return rows"
    print(f"entry rows: {n}")
    qs = e.queries()
    names = DEFAULT + [a for a in sys.argv[1:] if a in qs]
    missing = [a for a in sys.argv[1:] if a not in qs]
    assert not missing, f"unknown queries: {missing}"
    for name in names:
        rows = qs[name](spark, "/root/testdata/sf0.01").count()
        print(f"{name} rows: {rows}")
    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
