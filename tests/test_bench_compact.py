"""The bench stdout line is a driver contract: ONE JSON line whose last
2 KB must parse. `bench.shed_to_budget` owns fitting the line inside
that tail; these tests pin its priorities so a future key addition can
never decapitate BENCH_r{N}.json or silently drop a contract field.

No Spark session — the function is pure dict/JSON work.
"""

import json

from bench import shed_to_budget

RECEIPT_FIELDS = ("ann_phases", "median_sec_norm", "cold_sec", "bpe_phases")


def _dumps(d: dict) -> str:
    return json.dumps(d, separators=(",", ":"))


def _compact(n_keys: int, name_len: int = 20) -> dict:
    """A synthetic compact record shaped like bench.main()'s; key names
    padded to ``name_len`` (the real 61-key registry averages ~20)."""
    qs = {
        f"k{i:02d}_".ljust(name_len, "x"): round(1.0 + i * 0.013, 2)
        for i in range(n_keys)
    }
    return {
        "metric": "headline_queries_total",
        "value": 61.829,
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "median_sec": 67.916,
        "cold_sec": 110.585,
        "probe_load": 1.0,
        "sched_probe": 1.257,
        "sched_ref": 0.77,
        "clean_host": True,
        "median_sec_norm": 67.916,
        "ann_phases": {
            "pq_ann_topk": [1.24, 0.332],
            "ivfpq_ann_topk": [1.875, 0.501],
            "ivfpq_rerank_topk": [1.875, 0.359, 0.185],
        },
        "bpe_phases": [1.2, 0.8, 8, 3, 0.6, 2],
        "bulk_ratio": 0.027,
    }


def test_line_fits_and_parses_at_61_keys():
    out = shed_to_budget(_compact(61))
    line = _dumps(out)
    assert len(line) <= 2000
    assert json.loads(line) == out  # round-trips


def test_contract_fields_never_shed():
    out = shed_to_budget(_compact(61), budget=100)  # pathological squeeze
    for field in ("metric", "value", "unit", "queries", "sf",
                  "probe_load", "bulk_ratio"):
        assert field in out, field


def test_query_keys_never_dropped_only_precision():
    comp = _compact(61)
    keys_before = set(comp["queries"])
    out = shed_to_budget(comp, budget=100)
    assert set(out["queries"]) == keys_before


def test_weather_markers_outlive_per_query_precision():
    # Choose the budget from the fixture's own sizes so the test pins
    # PRIORITIES, not byte coincidences: exactly wide enough for the
    # receipt-shed + 1dp form (markers and median_sec retained), but
    # too narrow for the receipt-shed 2dp form.
    comp = _compact(61)
    no_receipts = {k: v for k, v in comp.items() if k not in RECEIPT_FIELDS}
    one_dp = dict(
        no_receipts,
        queries={k: round(v, 1) for k, v in no_receipts["queries"].items()},
    )
    budget = len(_dumps(one_dp))
    assert len(_dumps(no_receipts)) > budget  # 2dp must not fit
    out = shed_to_budget(_compact(61), budget=budget)
    assert out["sched_ref"] == 0.77
    assert out["clean_host"] is True
    assert out["sched_probe"] == 1.257
    assert out["median_sec"] == 67.916
    assert all(round(v, 1) == v for v in out["queries"].values())
    for dropped in RECEIPT_FIELDS:
        assert dropped not in out
    assert len(_dumps(out)) <= budget


def test_small_record_sheds_nothing():
    comp = _compact(20)
    before = json.loads(_dumps(comp))
    out = shed_to_budget(comp)
    assert out == before


def test_extreme_budget_still_valid_json_with_judged_metric():
    # Even when nothing sheddable remains, the result parses and keeps
    # the judged baseline metric and every query key.
    out = shed_to_budget(_compact(61), budget=100)
    json.loads(_dumps(out))
    assert out["bulk_ratio"] == 0.027
