"""Pin the bench artifact protocol: the LAST stdout line must always be
a parseable, self-contained headline dict under the driver's ~4 KB tail
capture (BENCH_r09.json lost its headline to a >4 KB single line)."""

from __future__ import annotations

import json

import bench


def _fake_result(n_queries: int = 24) -> dict:
    qs = {f"q{i:03d}_some_operator_name_{i}": round(0.5 + i * 0.013, 3) for i in range(n_queries)}
    return {
        "metric": "headline_queries_total",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "spread": {k: 0.111 for k in qs},
        "spread_total": round(0.111 * n_queries, 3),
        "timing": "best_of_2",
        "sf": 0.1,
    }


def _fake_scale2(n_queries: int = 25) -> dict:
    qs = {f"q{i:03d}_scale2_entry_name_{i}": round(1.0 + i * 0.07, 3) for i in range(n_queries)}
    return {
        "sf": 1.0,
        "note": "10x sf0.1 replicas with key offsets (tools/make_scale.py)",
        "value": round(sum(qs.values()), 3),
        "fixed_set_value": round(sum(list(qs.values())[:20]), 3),
        "fixed_set_n": 20,
        "queries": qs,
        "spread": {k: 0.2 for k in qs},
    }


def test_last_line_parses_and_is_headline():
    lines = bench.emission_lines(_fake_result(), _fake_scale2(), None)
    assert len(lines) == 2
    last = json.loads(lines[-1])
    assert last["metric"] == "headline_queries_total"
    assert last["unit"] == "sec"
    assert len(last["queries"]) == 24
    # scale2 totals ride inline so the one-line record is complete
    assert last["scale2_fixed_set_value"] == _fake_scale2()["fixed_set_value"]
    assert last["scale2_fixed_set_n"] == 20


def test_last_line_fits_tail_capture():
    # worst realistic case: headline + scale2 + scale3 all present
    s3 = {"sf": 10.0, "note": "100x", "value": 120.5,
          "queries": {f"q{i}_scale3_name": 9.9 for i in range(9)},
          "spread": {f"q{i}_scale3_name": 0.3 for i in range(9)}}
    lines = bench.emission_lines(_fake_result(), _fake_scale2(), s3)
    assert len(lines[-1]) <= 4000
    parsed = json.loads(lines[-1])
    assert parsed["scale3_value"] == 120.5


def test_oversize_headline_drops_spread_not_queries():
    big = _fake_result(n_queries=60)
    # inflate names so the full record would exceed 4000 bytes
    big["queries"] = {k + "_" + "x" * 30: v for k, v in big["queries"].items()}
    big["spread"] = {k: 0.1 for k in big["queries"]}
    lines = bench.emission_lines(big, None, None)
    last = json.loads(lines[-1])
    assert len(lines[-1]) <= 4000
    assert last.get("spread_dropped") is True  # spread is the first sacrifice
    assert last["value"] == big["value"]       # totals always survive


def test_no_scale_phases_single_line():
    lines = bench.emission_lines(_fake_result(), None, None)
    assert len(lines) == 1
    assert json.loads(lines[0])["metric"] == "headline_queries_total"
