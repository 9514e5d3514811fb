"""Plan-hygiene audit over the WHOLE query registry.

Builds the physical plan of every registered query (no execution beyond
what plan construction itself requires — the bounded iterative trainers)
and extracts the operators that matter at 100 TB:

  - n_exchange        shuffles in the plan
  - n_bhj / n_smj     broadcast-hash vs sort-merge joins
  - n_hashagg         hash aggregates (>=2 usually means partial+final)
  - n_batch_python    row-at-a-time Python UDF nodes — MUST be zero
  - n_arrow_python    Arrow-vectorized Python nodes (mapInPandas /
                      applyInPandas / pandas_udf) — the sanctioned path
  - n_codegen         WholeStageCodegen spans
  - pushed_scan       True if any parquet scan reports PushedFilters

Usage:  python tools/plan_audit.py [sf_dir] [out.json]

The per-query rows plus global totals land in one JSON document; the
global no-row-at-a-time-Python invariant is also pinned in
tests/test_plans.py::test_no_row_python_anywhere.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from variantcalling_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict:
    return {
        "n_exchange": plan.count("Exchange"),
        "n_bhj": plan.count("BroadcastHashJoin"),
        "n_smj": plan.count("SortMergeJoin"),
        "n_bnlj": plan.count("BroadcastNestedLoopJoin"),
        "n_hashagg": plan.count("HashAggregate"),
        "n_batch_python": plan.count("BatchEvalPython"),
        "n_arrow_python": (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        "n_codegen": plan.count("WholeStageCodegen"),
        "pushed_scan": "PushedFilters: [" in plan
        and bool(plan.split("PushedFilters: [", 1)[1].split("]", 1)[0].strip()),
    }


def run_audit(sf_dir: str) -> dict:
    from variantcalling_spark.queries import all_queries

    spark = get_spark("plan_audit")
    rows: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, q in all_queries().items():
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows[name] = audit_plan(plan)
        except Exception as e:  # pragma: no cover - surfaced in the report
            errors[name] = f"{type(e).__name__}: {e}"
    totals = {
        k: sum(r[k] for r in rows.values())
        for k in (
            "n_exchange",
            "n_bhj",
            "n_smj",
            "n_bnlj",
            "n_hashagg",
            "n_batch_python",
            "n_arrow_python",
            "n_codegen",
        )
    }
    totals["n_queries"] = len(rows)
    totals["n_errors"] = len(errors)
    totals["row_python_free"] = totals["n_batch_python"] == 0
    return {"totals": totals, "queries": rows, "errors": errors}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit.json"
    report = run_audit(sf_dir)
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    t = report["totals"]
    print(
        f"{t['n_queries']} plans audited | exchanges={t['n_exchange']} "
        f"bhj={t['n_bhj']} smj={t['n_smj']} hashagg={t['n_hashagg']} | "
        f"arrow_python={t['n_arrow_python']} "
        f"row_python={t['n_batch_python']} (must be 0) | errors={t['n_errors']}"
    )
    for name, err in report["errors"].items():
        print(f"ERROR {name}: {err}")
    return 0 if t["row_python_free"] and not report["errors"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
