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


def test_scalars_shed_before_per_query_precision():
    # r16 (VERDICT r15 #5): median_sec and sched_ref shed BEFORE the
    # per-query values demote to 1dp — 1dp quantization manufactured 6
    # phantom PERF_r15 regressions. Budget chosen from the fixture's own
    # sizes so the test pins PRIORITIES, not byte coincidences: wide
    # enough for the receipts+scalars-shed 2dp form, too narrow with
    # median_sec/sched_ref kept.
    comp = _compact(61)
    shed2 = {
        k: v
        for k, v in comp.items()
        if k not in RECEIPT_FIELDS + ("median_sec", "sched_ref")
    }
    budget = len(_dumps(shed2)) + 1
    no_receipts = {k: v for k, v in comp.items() if k not in RECEIPT_FIELDS}
    assert len(_dumps(no_receipts)) + 1 > budget
    out = shed_to_budget(_compact(61), budget=budget)
    assert "median_sec" not in out and "sched_ref" not in out
    assert out["clean_host"] is True
    assert out["sched_probe"] == 1.257
    # 2dp survived the squeeze
    assert any(round(v, 1) != v for v in out["queries"].values())
    for dropped in RECEIPT_FIELDS:
        assert dropped not in out
    assert len(_dumps(out)) + 1 <= budget


def test_weather_markers_outlive_per_query_precision():
    # the LIVE weather markers (clean_host, sched_probe) survive even
    # when precision must demote: budget = exactly the 1dp form's size.
    comp = _compact(61)
    kept = {
        k: v
        for k, v in comp.items()
        if k not in RECEIPT_FIELDS + ("median_sec", "sched_ref")
    }
    one_dp = dict(
        kept, queries={k: round(v, 1) for k, v in kept["queries"].items()}
    )
    budget = len(_dumps(one_dp)) + 1
    assert len(_dumps(kept)) + 1 > budget  # 2dp must not fit
    out = shed_to_budget(_compact(61), budget=budget)
    assert out["clean_host"] is True
    assert out["sched_probe"] == 1.257
    assert all(round(v, 1) == v for v in out["queries"].values())
    assert len(_dumps(out)) + 1 <= budget


def test_newline_counts_against_budget():
    # ADVICE r15: a line of exactly `budget` bytes plus print()'s
    # newline loses its first byte in a `budget`-byte tail capture — the
    # fit test must reserve one byte.
    comp = _compact(61)
    out = shed_to_budget(comp, budget=len(_dumps(_compact(61))))
    assert len(_dumps(out)) + 1 <= len(_dumps(_compact(61)))


def test_total_on_queryless_record():
    # ADVICE r15: the function must stay total for any dict input —
    # a record without a queries dict must not raise.
    out = shed_to_budget({"metric": "m", "value": 1.0}, budget=10)
    assert out == {"metric": "m", "value": 1.0}


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
