"""Dump ``explain("formatted")`` for named queries to files.

    python tools/dump_plans.py <outdir> <suffix> <query> [query ...]
    python tools/dump_plans.py plans/r11 before q19_topk_per_group q122_incremental_dedup

Writes ``<outdir>/<query>_<suffix>.txt`` for each query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Plan construction
only — nothing executes beyond what building the DataFrame requires.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from variantcalling_spark.queries import all_queries  # noqa: E402
from variantcalling_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    registry = all_queries()
    rc = 0
    for name in names:
        if name not in registry:
            print(f"ERROR: unknown query {name}")
            rc = 2
            continue
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"wrote {path}  ({len(plan)} chars, {n_ex} Exchange)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
