"""Time arbitrary registered queries with the bench methodology.

    python tools/time_queries.py [--sf DIR] [--runs N] [--full-warmup]
                                 <query> [query ...]

Mirrors bench.py: one warm-up action per query (``limit(1).count()``,
or a full ``count()`` with --full-warmup), then best-of-N timed
``count()`` runs. Prints one line per query (best, spread) and a JSON
tail. For paired A/B decisions on non-headline queries — NOT a bench
replacement; it emits no driver-contract JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from variantcalling_spark.queries import all_queries  # noqa: E402
from variantcalling_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--full-warmup", action="store_true")
    args = ap.parse_args()

    spark = get_spark("time_queries")
    registry = all_queries()
    unknown = [n for n in args.queries if n not in registry]
    if unknown:
        print(f"ERROR: unknown queries {unknown}")
        return 2

    for n in args.queries:
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        q = registry[n].fn(spark, args.sf)
        if args.full_warmup:
            q.count()
        else:
            q.limit(1).count()

    out = {}
    for n in args.queries:
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed:{n}:{i}")
            t0 = time.time()
            registry[n].fn(spark, args.sf).count()
            times.append(time.time() - t0)
        best, spread = round(min(times), 3), round(max(times) - min(times), 3)
        out[n] = {"best": best, "spread": spread}
        print(f"{n}: best={best}s spread={spread}s")

    print(json.dumps({"sf": args.sf, "runs": args.runs, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
