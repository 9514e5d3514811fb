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

# Queries allowed to carry an ORDERED-BUT-UNPARTITIONED Window node
# (the single-partition-sort shape, SCALE.md:134-139) because the
# window's input is provably DOMAIN-bounded, not data-sized. Every
# entry names the bounded domain; anything not listed is a failure.
# Windows whose input subtree already carries a WindowGroupLimit /
# TakeOrderedAndProject / limit are auto-cleared (bounded by
# construction) and don't need an entry.
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    # two-level bucket-prefix decompositions (the r7 fix pattern):
    # the only global window left is the TINY bucket-relation prefix
    "q40_pr_curve": "score-bucket prefix of the two-level cumsum",
    "q225_vqsr_tranches": "score-bucket prefix of the bucketed rank pick",
    "q314_rfm_segmentation": "R/F/M bucket prefixes of distributed row numbers",
    "q333_shapley_importance": "value-bucket prefix of the bucketed median",
    "q195_pareto_concentration": "revenue-bucket prefix of the distributed rank",
    "q212_decile_lift": "GQ-bucket prefix + 10-row decile cumsum",
    "q237_prs_score": "PRS-bucket prefix of the distributed risk rank",
    "q244_bh_fdr": "p-bucket prefix/suffix of the two-phase BH step-up",
    "q363_qini_curve": "score-bucket prefix + 10-row decile table",
    "q394_oov_curve": "count-bucket prefix of the distributed frequency rank",
    "q414_best_f1_threshold": "score-bucket prefix of the bucketized pr_curve",
    "q417_median_ci": "value-bucket prefix of the bucketed rank picks",
    "q434_hosmer_lemeshow": "probability-bucket prefix of the distributed "
    "row number feeding ntile_expr (<=50 bucket rows)",
    # histogram / value-domain CDFs (bounded by the value grid, not rows)
    "q26_inverse_cdf_sample": "returnflag CDF domain (<=3 distinct values)",
    "q48_cumulative_coverage": "integer depth histogram domain",
    "q136_curriculum_phases": "quantile-bucket domain",
    "q171_ks_two_sample": "integer token-count histogram domain",
    "q413_cramer_von_mises": "integer token-count histogram domain",
    "q190_quantile_normalization": "pooled length-histogram CDF domain",
    "q316_best_split": "two-decimal value-grid histogram domain",
    "q196_skyline_2d": "distinct price-cents domain (pre-aggregated frontier)",
    "q222_isotonic_calibration": "integer score-bin domain (O(bins^2) pairs)",
    # survival-time histograms (integer days)
    "q206_kaplan_meier": "integer-day duration histogram domain",
    "q245_logrank_test": "integer-day duration histogram domain",
    "q286_nelson_aalen": "integer-day duration histogram domain",
    "q381_cox_score_test": "integer-day duration histogram domain",
    "q446_weibull_fit": "integer-day duration histogram domain (median-rank prefix)",
    "q453_competing_risks": "integer-day duration histogram domain (risk-set + CIF prefixes)",
    # value/multiplicity histogram domains (r8)
    "q461_kmer_error_valley": "k-mer multiplicity histogram domain (LAG/LEAD valley scan)",
    "q464_abc_classification": "revenue-bucket prefix of the two-level descending cumsum",
    "q465_join_skew_audit": "per-arm bucket prefixes inside value_at_rank_bucketed "
    "(key-count buckets; 6 arms x 2 nodes)",
    # tiny categorical domains
    "q273_event_funnel": "funnel-stage domain",
    "q263_kmv_distinct": "union of two 64-row KMV sketches (bottom-k merge)",
    "q377_motif_chains": "event-type code domain (series count)",
    "q292_bradley_terry": "item domain (event types)",
    "q299_jsd_source_drift": "source domain",
    "q385_unimax_allocation": "source domain (capacity-sorted waterfill prefix)",
    "q347_wasserstein_drift": "source domain",
    "q359_gsea_enrichment": "gene-model domain (broadcast gene panel)",
    "q433_paired_bootstrap_bleu": "bootstrap-replicate domain (aggregate over "
    "the 40-value rep range; CI rank pick over <=40 rows)",
    "q473_bootstrap_rouge_ci": "bootstrap-replicate domain (same q433 "
    "machinery: CI rank pick over <=40 replicate rows)",
    # round 10
    "q513_wasserstein_1d": "integer length-histogram CDF domain (merged "
    "support grid of two sources, same class as q171/q190)",
}

_BOUNDERS = ("WindowGroupLimit", "TakeOrderedAndProject", "CollectLimit", "GlobalLimit")


def _bracket_groups(rest: str) -> list[str]:
    groups, depth, cur = [], 0, []
    for ch in rest:
        if ch == "[":
            if depth == 0:
                cur = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _indent_of(line: str) -> int:
    for i, ch in enumerate(line):
        if ch not in " :+-|":
            return i
    return len(line)


def global_ordered_windows(plan: str) -> list[str]:
    """Plan lines whose Window node has an ORDER spec but NO partition
    spec — the shape that forces `Exchange SinglePartition` and sorts
    its whole input in one task. Partitioned windows (ordered or not),
    unordered global aggregate-window nodes rewritten away, and global
    windows whose input subtree is bounded by a group-limit /
    take-ordered / limit node are all excluded."""
    lines = plan.splitlines()
    hits = []
    for idx, line in enumerate(lines):
        s = line.strip(" :+-|")
        if not (s.startswith("Window ") and "windowspecdefinition" in s):
            continue
        groups = _bracket_groups(s[len("Window "):])
        if len(groups) >= 3:
            continue  # [exprs], [partition], [order]
        if len(groups) == 2 and not (" ASC" in groups[1] or " DESC" in groups[1]):
            continue  # [exprs], [partition] — partitioned, unordered
        my_ind = _indent_of(line)
        bounded = False
        # walk the window's DIRECT input chain: a bounder counts only if
        # it appears before the first barrier node (join / aggregate /
        # scan / generate / union) — a group-limit buried under a join's
        # other branch does NOT bound this window's input
        barriers = (
            "HashAggregate", "SortAggregate", "ObjectHashAggregate",
            "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct", "Union",
            "Generate", "Scan", "FileScan", "InMemoryTableScan",
            "FlatMapGroupsInPandas", "MapInPandas", "Range",
        )
        for j in range(idx + 1, len(lines)):
            if _indent_of(lines[j]) < my_ind:
                break
            t = lines[j].strip(" :+-|")
            if t.startswith("*(") and " " in t:  # WholeStageCodegen marker
                t = t.split(" ", 1)[1]
            if any(b in lines[j] for b in _BOUNDERS):
                bounded = True
                break
            if any(t.startswith(b) for b in barriers):
                break
        if not bounded:
            hits.append(s[:200])
    return hits


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
        "n_global_window": len(global_ordered_windows(plan)),
    }


def run_audit(sf_dir: str) -> dict:
    from variantcalling_spark.queries import all_queries

    spark = get_spark("plan_audit")
    rows: dict[str, dict] = {}
    errors: dict[str, str] = {}
    unlisted_global_windows: dict[str, int] = {}
    for name, q in all_queries().items():
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows[name] = audit_plan(plan)
            if rows[name]["n_global_window"] and name not in GLOBAL_WINDOW_ALLOWLIST:
                unlisted_global_windows[name] = rows[name]["n_global_window"]
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
    totals["n_unlisted_global_windows"] = len(unlisted_global_windows)
    # The r11 static-plan campaign standard: no query's plan should
    # carry ~100+ Exchange nodes (the unrolled-iteration / repeated-
    # subtree class — the checkpoint+memo recipe in the verify skill).
    top = sorted(rows.items(), key=lambda kv: -kv[1]["n_exchange"])[:5]
    totals["max_exchange"] = top[0][1]["n_exchange"] if top else 0
    totals["top_exchange"] = {n: r["n_exchange"] for n, r in top}
    return {
        "totals": totals,
        "queries": rows,
        "errors": errors,
        "unlisted_global_windows": unlisted_global_windows,
    }


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
        f"row_python={t['n_batch_python']} (must be 0) | "
        f"unlisted_global_windows={t['n_unlisted_global_windows']} (must be 0) | "
        f"errors={t['n_errors']} | max_exchange={t['max_exchange']} "
        f"(campaign standard <100) top={t['top_exchange']}"
    )
    for name, n in report["unlisted_global_windows"].items():
        print(f"GLOBAL-WINDOW {name}: {n} unpartitioned ordered Window node(s)")
    for name, err in report["errors"].items():
        print(f"ERROR {name}: {err}")
    return (
        0
        if t["row_python_free"]
        and not report["errors"]
        and not report["unlisted_global_windows"]
        else 1
    )


if __name__ == "__main__":
    raise SystemExit(main())
