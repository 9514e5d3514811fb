"""Pins for tools/check_correctness.py's comparator — specifically the
signed-zero class the r7 driver hash exposed (q207/q213): ``-0.0 ==
+0.0`` is True in IEEE/numpy, but the driver's byte-level value hash
sees the sign bit, so the local comparator must treat a signed-zero
disagreement as a hard mismatch."""

from __future__ import annotations

import importlib.util
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

_CC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "check_correctness.py",
)
_spec = importlib.util.spec_from_file_location("_cc_under_test", _CC_PATH)
cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and cc)


def test_planted_negative_zero_is_a_hard_fail():
    s = pd.DataFrame({"x": [0.0, 1.5, -2.0]})
    d = pd.DataFrame({"x": [-0.0, 1.5, -2.0]})
    problems = cc.compare("planted", s, d)
    hard = [p for p in problems if not p.startswith("DTYPE")]
    assert any("signed-zero" in p for p in hard), problems


def test_matching_zeros_and_nans_still_pass():
    s = pd.DataFrame({"x": [0.0, -0.0, float("nan"), 3.25]})
    d = pd.DataFrame({"x": [0.0, -0.0, float("nan"), 3.25]})
    assert cc.compare("ok", s, d) == []


def test_misinvocation_refused_before_any_work(monkeypatch):
    """r8 accident pin: a query name in the sf_dir slot must be refused
    (exit 2) instead of running every query against a nonexistent path
    and dumping a query-named error file."""
    monkeypatch.setattr(
        "sys.argv",
        ["check_correctness.py", "/no/such/sf_dir", "q01_pricing_summary"],
    )
    assert cc.main() == 2
    monkeypatch.setattr(
        "sys.argv", ["check_correctness.py", "q01_pricing_summary", "not_a_query"]
    )
    assert cc.main() == 2


def test_duckdb_round_propagates_negative_zero_and_plus_zero_fixes_it():
    """The engine fact the q207/q213 fix rests on: DuckDB's ROUND keeps
    the IEEE -0.0 produced by -ln(1), and adding +0.0 canonicalizes."""
    con = duckdb.connect()
    raw, fixed = con.execute(
        "SELECT ROUND(-ln(1.0), 6), ROUND(-ln(1.0), 6) + 0.0"
    ).fetchone()
    assert raw == 0.0 and math.copysign(1.0, raw) == -1.0
    assert math.copysign(1.0, fixed) == 1.0


@pytest.mark.parametrize(
    "qname",
    ["q207_mash_distance", "q213_fisher_strand", "q50_phred_math"],
)
def test_fixed_queries_emit_no_negative_zero_on_duckdb(qname, sf_dir):
    """Run the ORACLE side of the three fixed queries on DuckDB at
    sf0.001 and assert no -0.0 survives in any float column (the Spark
    side never emits one — Spark's ROUND normalizes)."""
    import __spark_entry__ as e

    sql = e.oracle_sql()[qname]
    con = cc.duck_con(sf_dir)
    pdf = con.execute(sql).fetchdf()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            a = pdf[c].to_numpy()
            neg_zero = (a == 0.0) & np.signbit(a)
            assert not neg_zero.any(), f"{qname}.{c} still emits -0.0"
